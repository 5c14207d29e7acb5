"""Micro-runs for the LoRA family on the tiny test ViT."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def lora_cfg(tiny_config, name, extra):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {"rank": 4, "embd_dim": 64}}
    cfg["classifier"] = {
        "name": name,
        "kwargs": {
            "num_class": 8, "feat_dim": 64, "init_cls_num": 4, "inc_cls_num": 4,
            "task_num": 2, **extra,
        },
    }
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    cfg["epoch"] = 6
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    return cfg


def test_inflora(tiny_config):
    cfg = lora_cfg(tiny_config, "InfLoRA",
                   {"lame": 1.0, "lamb": 0.95, "total_sessions": 2, "rank": 4})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # A factors were SVD-initialized (non-zero), B trained away from zero
    lora = tr.state.params["lora"]
    assert float(np.abs(np.asarray(lora["A_k"][0, 0])).sum()) > 0
    assert float(np.abs(np.asarray(lora["B_k"][0, 0])).sum()) > 0
    # DualGPM bookkeeping grew per-layer subspaces
    assert len(tr.method._feature_list) == tr.method.depth
    assert res["acc_table"][0, 0] > 40.0


def test_inflora_frozen_backbone_and_task_isolation(tiny_config):
    cfg = lora_cfg(tiny_config, "InfLoRA",
                   {"lame": 1.0, "lamb": 0.95, "total_sessions": 2, "rank": 4})
    cfg["epoch"] = 2
    tr = Trainer(cfg)
    res = tr.train_loop()
    lora = tr.state.params["lora"]
    # task-1 B factors for slot k are nonzero, task-0 B stayed as trained
    # during task 0 only (train_onehot masking): check task-1 rows moved
    assert float(np.abs(np.asarray(lora["B_v"][0, 1])).sum()) > 0


def test_sdlora(tiny_config):
    cfg = lora_cfg(tiny_config, "SD_LoRA", {
        "init_mag": 1.0,
        "rank_reduction": [True, 0, 1, 4, 2],
        "knowledge_dist": [True, 1e9],  # huge threshold -> always merges
    })
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # knowledge-dist merged task-1 into past magnitudes and zeroed factors
    assert float(np.abs(np.asarray(tr.state.params["lora"]["A_q"][0, 1])).sum()) == 0.0
    assert float(np.abs(np.asarray(tr.state.mvars["assim_q"])).sum()) > 0
