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


def test_trgp_til(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "AlexNet_TRGP", "kwargs": {}}
    cfg["classifier"] = {
        "name": "TRGP",
        "kwargs": {"num_class": 8, "feat_dim": 2048, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2},
    }
    cfg["setting"] = "task-aware"
    cfg["epoch"] = 2
    cfg["batch_size"] = 16
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # per-task subspaces recorded for both tasks
    assert tr.method._task_spaces[0][0].shape[1] > 0
    assert tr.method._task_spaces[1][0].shape[1] > 0


def test_api_til(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "AlexNet_TRGP", "kwargs": {}}
    cfg["classifier"] = {
        "name": "API",
        "kwargs": {"num_class": 8, "feat_dim": 2048, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, "lame": 1.0, "lamb": 0.97,
                   "stage1_epochs": 1},  # keep the warmup protocol short
    }
    cfg["setting"] = "task-aware"
    cfg["epoch"] = 2
    cfg["batch_size"] = 16
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert len(tr.method._project_type) == 5
    assert set(tr.method._project_type) <= {"remove", "retain"}
    # retain ratios were measured by the stage protocol
    assert np.all(np.isfinite(tr.method.per_layer_retain))
    # input expansion: ceil((0.5 - retain)*10) extras when retain < 0.5 —
    # counts recorded per (layer, slot) and the ws slab carries the SVD init
    counts = tr.method._ws_counts
    expected = [min(max(int(np.ceil((0.5 - r) * 10)), 0), b, 5)
                for r, b in zip(tr.method.per_layer_retain, [3, 64, 128, 1024, 2048])]
    assert [int(c[0]) for c in counts] == expected
    if any(expected):
        li = next(i for i, e in enumerate(expected) if e)
        slab = np.asarray(tr.state.params["backbone"][f"ws{li}"][0])
        assert np.abs(slab[:, :expected[li]]).sum() > 0
