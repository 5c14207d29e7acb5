"""Cross-topology checkpoint restore: save under one mesh, resume under
another (the first thing a real pod user does — train on a slice, debug on
one chip, or scale a single-chip run out).

Params/opt-state/mvars are replicated over 'data', so a restore onto any
data-axis width must reproduce the exact same state; the assert is eval
EQUALITY (bit-identical per-task accuracies), plus buffer/acc_table
round-trip. Uses iCaRL so the restore covers the rehearsal family's full
surface: exemplar buffer arrays, NME class-mean mvars, teacher pytree.
"""

import numpy as np
import pytest

from libcontinual_tpu.core.trainer import Trainer


def _cfg(data_axis, ckdir):
    from libcontinual_tpu.config import Config

    return Config(overrides={
        "dataset": "synthetic", "data_root": "", "image_size": 32,
        "task_num": 2, "init_cls_num": 4, "inc_cls_num": 4,
        "epoch": 2, "batch_size": 16, "per_class": 16,
        "seed": 11, "val_per_epoch": 0, "testing_times": 1,
        "dtype": "float32",
        "mesh": {"data": data_axis, "model": 1},
        "backbone": {"name": "tiny_cnn", "kwargs": {}},
        "classifier": {"name": "ICarl", "kwargs": {
            "num_class": 8, "feat_dim": 32, "init_cls_num": 4,
            "inc_cls_num": 4, "task_num": 2}},
        "train_trfms": [{"Normalize": {"mean": [0.5] * 3, "std": [0.25] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [0.5] * 3, "std": [0.25] * 3}}],
        "buffer": {"name": "LinearHerdingBuffer",
                   "kwargs": {"buffer_size": 16, "batch_size": 16}},
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.05, "momentum": 0.9}},
        "lr_scheduler": {"name": "Constant"}, "warmup": 0,
        "checkpoint": {"enable": True, "dir": str(ckdir)},
    }).get_config_dict()


@pytest.mark.parametrize("save_mesh,restore_mesh", [(8, 1), (1, 4)])
def test_restore_across_topologies(tmp_path, save_mesh, restore_mesh):
    ckdir = tmp_path / f"ck_{save_mesh}to{restore_mesh}"
    tr = Trainer(_cfg(save_mesh, ckdir))
    overall = tr.train_loop()
    src_eval = tr._validate(1)
    src_buffer = (np.asarray(tr.buffer.images), np.asarray(tr.buffer.labels))

    tr2 = Trainer(_cfg(restore_mesh, ckdir))
    assert tr2._resume_from == 1, "restore did not pick up the checkpoint"
    # the restored state lives on the NEW mesh's sharding
    dst_eval = tr2._validate(1)
    assert src_eval["per_task_acc"] == dst_eval["per_task_acc"], (
        f"{save_mesh}-dev eval {src_eval} != "
        f"{restore_mesh}-dev eval {dst_eval}")
    np.testing.assert_array_equal(
        src_buffer[1], np.asarray(tr2.buffer.labels),
        err_msg="buffer labels did not round-trip")
    np.testing.assert_array_equal(
        src_buffer[0], np.asarray(tr2.buffer.images),
        err_msg="buffer pixels did not round-trip")
    np.testing.assert_array_equal(
        np.asarray(overall["acc_table"]), tr2.acc_table,
        err_msg="acc_table did not round-trip")
    # a resumed train_loop on the new mesh reports the restored metrics
    # without retraining (both tasks complete)
    overall2 = tr2.train_loop()
    assert overall2["last_avg_acc"] == overall["last_avg_acc"]
