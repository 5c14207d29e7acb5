"""Micro-runs for the online-CL block (ER-ACE, ER-AML, OCM, PRAKA, DAP)."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def base_cfg(tiny_config, name, extra, backbone="tiny_cnn", feat_dim=32,
             buffer_size=64):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": backbone, "kwargs": {}}
    cfg["classifier"] = {
        "name": name,
        "kwargs": {"num_class": 8, "num_classes": 8, "feat_dim": feat_dim,
                   "init_cls_num": 4, "inc_cls_num": 4, "task_num": 2, **extra},
    }
    cfg["buffer"] = {"name": "ERBuffer",
                     "kwargs": {"buffer_size": buffer_size, "batch_size": 16}}
    cfg["epoch"] = 3
    return cfg


def run(cfg):
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    return tr, res


def test_erace(tiny_config):
    cfg = base_cfg(tiny_config, "ERACE", {"use_augs": False, "task_free": True})
    tr, res = run(cfg)
    buf = tr.state.mvars["buffer"]
    assert int(buf["n_seen"]) > 0
    # reservoir actually filled with real labels
    n = min(int(buf["n_seen"]), buf["by"].shape[0])
    assert np.asarray(buf["by"][:n]).max() >= 0


def test_eraml(tiny_config):
    cfg = base_cfg(tiny_config, "ERAML",
                   {"use_augs": False, "task_free": True,
                    "supcon_temperature": 0.1, "use_minimal_selection": False})
    tr, res = run(cfg)
    assert int(tr.state.mvars["buffer"]["n_seen"]) > 0


def test_eraml_head_trains_on_incremental_task(tiny_config):
    """The replay CE term (reference eraml.py:171-175) is the only loss
    component that reaches the classifier head once the supcon branch
    engages — task-1 head columns must move away from their values at the
    start of task 1."""
    import jax

    cfg = base_cfg(tiny_config, "ERAML",
                   {"use_augs": False, "task_free": False,
                    "supcon_temperature": 0.1, "use_minimal_selection": False})
    tr = Trainer(cfg)
    snaps = {}
    orig_before = tr.method.before_task

    def spy(state, task_idx, task_data):
        if task_idx == 1:
            snaps["head"] = jax.tree_util.tree_map(
                np.array, state.params["head"]
            )
        return orig_before(state, task_idx, task_data)

    tr.method.before_task = spy
    tr.train_loop()
    before = np.concatenate([
        x.ravel() for x in jax.tree_util.tree_leaves(snaps["head"])
    ])
    after = np.concatenate([
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(tr.state.params["head"])
    ])
    assert np.abs(after - before).max() > 1e-6, (
        "classifier head frozen during task 1 — replay CE missing"
    )


def test_ocm(tiny_config):
    cfg = base_cfg(tiny_config, "OCM", {"buffer_batch_size": 16, "feat_dim": 32})
    cfg["batch_size"] = 8  # 16x rotation expansion keeps the step small
    tr, res = run(cfg)
    assert int(tr.state.mvars["buffer"]["n_seen"]) > 0


def test_praka(tiny_config):
    cfg = base_cfg(tiny_config, "PRAKA", {"proto_batch": 16})
    tr, res = run(cfg)
    # prototypes recorded for all seen classes
    assert float(np.asarray(tr.state.mvars["proto_valid"]).sum()) == 8.0


def test_dap_imbalanced(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "DAP",
        "kwargs": {"num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, "length": 3, "top_k": 1},
    }
    cfg["imb_type"] = "exp"
    cfg["imb_factor"] = 0.1
    cfg["shuffle"] = False
    cfg["epoch"] = 3
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    tr, res = run(cfg)
    # long-tailed stream: task sizes unequal
    assert len(set(tr.method._task_counts)) > 1


def test_eraml_minimal_selection_and_balanced_buffer(tiny_config):
    cfg = base_cfg(tiny_config, "ERAML",
                   {"use_augs": False, "task_free": True,
                    "supcon_temperature": 0.1, "use_minimal_selection": True})
    cfg["buffer"]["kwargs"]["strategy"] = "balanced"
    cfg["buffer"]["kwargs"]["balanced_sampling"] = True
    tr, res = run(cfg)
    assert int(tr.state.mvars["buffer"]["n_seen"]) > 0
