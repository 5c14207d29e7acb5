"""Micro-runs for LoRAsub-DRS, CL-LoRA, MInfLoRA, InfLoRA_OPT."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer
from tests.test_lora_methods import lora_cfg


def test_lorasub_drs(tiny_config):
    cfg = lora_cfg(tiny_config, "LoRAsub_DRS",
                   {"rank": 4, "thres": 0.95, "margin": 1.0})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # DRS transforms active from task 1, prototypes recorded
    assert float(tr.state.mvars["drs_on"]) == 1.0
    assert float(np.asarray(tr.state.mvars["proto_valid"]).sum()) == 8.0


def test_cl_lora(tiny_config):
    cfg = lora_cfg(tiny_config, "CL_LoRA", {"rank": 4})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # shared stream trained (nonzero B), block weights exist
    assert float(np.abs(np.asarray(tr.state.params["lora"]["sharedB_q"])).sum()) > 0
    assert tr.state.params["block_w"].shape[1] == 2


def test_minflora(tiny_config):
    cfg = lora_cfg(tiny_config, "MInfLoRA",
                   {"lame": 1.0, "lamb": 0.95, "total_sessions": 2, "rank": 4})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    g = np.asarray(tr.state.params["rank_gate"])
    # gates binarized for trained tasks
    assert set(np.unique(g[:, :2])) <= {-10.0, 10.0}


def test_inflora_opt(tiny_config):
    cfg = lora_cfg(tiny_config, "InfLoRA_OPT",
                   {"lame": 1.0, "lamb": 0.95, "total_sessions": 2, "rank": 4,
                    "ca_epochs": 1, "num_sampled_pcls": 16})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert tr.method._seen.sum() == 8
