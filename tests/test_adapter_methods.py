"""Micro-runs for RanPAC and DMNSP on the tiny test ViT."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def cfg_for(tiny_config, name, extra, backbone_kwargs=None):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test",
                       "kwargs": {"adapter_dim": 8, **(backbone_kwargs or {})}}
    cfg["classifier"] = {
        "name": name,
        "kwargs": {"num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, **extra},
    }
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    cfg["epoch"] = 4
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    return cfg


def test_ranpac(tiny_config):
    cfg = cfg_for(tiny_config, "RanPAC", {"M": 64})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert float(tr.state.mvars["rp_ready"]) == 1.0
    assert float(np.abs(np.asarray(tr.state.mvars["Wo"])).sum()) > 0
    # ridge classifier should be decent on seen classes of synthetic data
    assert res["acc_table"][1].mean() > 25.0


def test_dmnsp(tiny_config):
    cfg = cfg_for(tiny_config, "DMNSP", {"lamda_scale": 30.0, "embd_dim": 64})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # basis accumulated, projection active after task 0
    assert float(np.abs(np.asarray(tr.state.mvars["P"])).sum()) > 0
    assert float(tr.state.mvars["proj_on"]) == 1.0
