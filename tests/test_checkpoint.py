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
