"""End-to-end 2-task micro-run: the acceptance test for the L1-L6 slice."""

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def test_finetune_two_tasks(tiny_config):
    tr = Trainer(tiny_config)
    result = tr.train_loop()
    acc = result["acc_table"]
    assert acc.shape == (2, 2)
    # trained on task 0: should beat chance (25% over 4 classes) clearly
    assert acc[0, 0] > 40.0
    # after task 1, task-1 accuracy should beat chance
    assert acc[1, 1] > 40.0
    # upper triangle untouched
    assert acc[0, 1] == 0.0
    assert np.isfinite(result["fps"]) and result["fps"] > 0


def test_finetune_buffer_replay(tiny_config):
    tiny_config["buffer"] = {
        "name": "LinearBuffer",
        "kwargs": {"buffer_size": 32, "batch_size": 16, "strategy": "random"},
    }
    tr = Trainer(tiny_config)
    result = tr.train_loop()
    assert len(tr.buffer) > 0
    assert tr.buffer.labels.max() >= 4  # task-1 exemplars present after run
    assert result["acc_table"][1, 0] >= 0.0
