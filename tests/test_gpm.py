import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def test_gpm_til(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "AlexNet_TRGP", "kwargs": {}}
    cfg["classifier"] = {
        "name": "GPM",
        "kwargs": {"num_class": 8, "feat_dim": 2048, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2},
    }
    cfg["setting"] = "task-aware"
    cfg["epoch"] = 3
    cfg["batch_size"] = 16
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # subspace grew after task 0 and projections became non-trivial
    assert len(tr.method._feature_list) == 5
    assert all(u.shape[1] > 0 for u in tr.method._feature_list)
    proj_norm = sum(float(np.abs(np.asarray(p)).sum()) for p in tr.state.mvars["proj"])
    assert proj_norm > 0
    # task-aware eval: accuracies above within-task chance region
    assert res["acc_table"][1].mean() > 20.0
