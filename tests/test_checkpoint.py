"""Checkpoint/resume: state round-trips and resume skips completed tasks."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def test_checkpoint_resume(tiny_config, tmp_path):
    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 2
    cfg["checkpoint"] = {"enable": True, "dir": str(tmp_path / "ck")}
    tr = Trainer(cfg)
    res = tr.train_loop()

    # fresh trainer resumes after the final task: no training happens, the
    # acc table is restored
    tr2 = Trainer(cfg)
    assert tr2._resume_from == cfg["task_num"] - 1
    assert np.allclose(tr2.acc_table, tr.acc_table)
    import jax

    a = jax.tree_util.tree_leaves(tr.state.params)
    b = jax.tree_util.tree_leaves(tr2.state.params)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_resume_under_tp_mesh(tiny_config, tmp_path):
    """TP-sharded state must checkpoint and restore (orbax handles the
    shardings; restored leaves get re-placed by the trainer)."""
    cfg = copy.deepcopy(tiny_config)
    cfg["mesh"] = {"data": 2, "model": 2}
    cfg["batch_size"] = 16
    cfg["epoch"] = 2
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "L2P",
        "kwargs": {
            "num_class": 8, "feat_dim": 64, "init_cls_num": 4,
            "inc_cls_num": 4, "task_num": 2,
            "prompt_pool": 4, "prompt_length": 2, "top_k": 2,
        },
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    cfg["checkpoint"] = {"enable": True, "dir": str(tmp_path / "ck_tp")}
    tr = Trainer(cfg)
    tr.train_loop()

    tr2 = Trainer(cfg)
    assert tr2._resume_from == cfg["task_num"] - 1
    assert np.allclose(tr2.acc_table, tr.acc_table)


def test_checkpoint_keep_prunes_old_tasks(tiny_config, tmp_path):
    """checkpoint.keep must bound disk growth: only the newest `keep` task
    dirs survive (the setting used to be silently ignored)."""
    import copy
    import os

    from libcontinual_tpu.core.trainer import Trainer

    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 1
    cfg["task_num"] = 3
    cfg["init_cls_num"] = 3
    cfg["inc_cls_num"] = 3
    cfg["classifier"] = {"name": "Finetune",
                         "kwargs": {"num_class": 9, "feat_dim": 32}}
    cfg["checkpoint"] = {"enable": True, "dir": str(tmp_path / "ck"), "keep": 1}
    tr = Trainer(cfg)
    tr.train_loop()
    dirs = sorted(d for d in os.listdir(cfg["checkpoint"]["dir"])
                  if d.startswith("task_"))
    assert dirs == ["task_002"]
