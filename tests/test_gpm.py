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


def test_api_stage_protocol_freezes_prior_expansions(tiny_config):
    """The stage-1/2 measurement at task t must run with old_rows covering
    EVERY prior task's expansion rows (reference observe projects
    grad[:, :expand] where expand == self.expand[i][cur_task-1], rebuilt by
    after_task(t-1) to include task t-1's widening, api.py:93-94, 200-203) —
    regression for the one-task-stale mask."""
    import copy

    import jax

    from libcontinual_tpu.registry import METHODS

    cfg = copy.deepcopy(tiny_config)
    cfg["task_num"] = 3
    cfg["classifier"] = {
        "name": "API",
        "kwargs": {"num_class": 12, "feat_dim": 2048, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 3},
    }
    m = METHODS.get("API")(cfg)
    state = m.init_state(jax.random.PRNGKey(0), (32, 32, 3))

    # simulate task-1's expansion having widened layers by [1,2,0,3,1]
    m._ws_counts[:, 0] = [1, 2, 0, 3, 1]
    seen = {}

    def fake_protocol(st, task_data):
        seen["old_rows"] = [np.asarray(r) for r in st.mvars["old_rows"]]
        return st.params, np.full(5, 0.5)  # retain=step -> zero expansion

    m._run_stage_protocol = fake_protocol
    m._importance_ws = lambda st, td: [np.eye(b) for b in (3, 64, 128, 1024, 2048)]

    class _TD:  # before_task only touches task_data inside the stubs
        pass

    state = m.before_task(state, 2, _TD())
    want = m._row_masks(np.array(
        [[1, 0], [2, 0], [0, 0], [3, 0], [1, 0]], np.int64)[:, :m.backbone.slots])
    for got, exp in zip(seen["old_rows"], want):
        np.testing.assert_array_equal(got, exp)
