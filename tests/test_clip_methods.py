"""Micro-runs for the CLIP block (MoE-Adapter4CL, RAPF) + tokenizer."""

import copy

import numpy as np

from libcontinual_tpu.core.trainer import Trainer
from libcontinual_tpu.models.tokenizer import tokenize


def test_tokenize_shapes():
    toks = tokenize(["a photo of a cat.", "a photo of a dog."])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] > 0).all()
    # deterministic
    assert (toks == tokenize(["a photo of a cat.", "a photo of a dog."])).all()


def clip_cfg(tiny_config, name, extra, backbone_kwargs=None):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "clip_tiny_test", "kwargs": backbone_kwargs or {}}
    cfg["classifier"] = {
        "name": name,
        "kwargs": {"num_class": 8, "feat_dim": 32, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, **extra},
    }
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    cfg["epoch"] = 3
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.005}}
    return cfg


def test_moe_adapter4cl(tiny_config):
    cfg = clip_cfg(tiny_config, "MOE_ADAPTER4CL", {},
                   backbone_kwargs={"moe_experts": 2})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # only MoE params train; trunk frozen
    import jax

    flat = jax.tree_util.tree_leaves(tr.state.params["clip"])
    assert len(flat) > 0


def test_rapf(tiny_config):
    cfg = clip_cfg(tiny_config, "RAPF", {"replay_batch": 8})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert float(np.asarray(tr.state.mvars["cls_valid"]).sum()) == 8.0
    # adapter moved from identity
    k = np.asarray(tr.state.params["adapter"]["kernel"])
    assert not np.allclose(k, np.eye(k.shape[0]))


def test_dmnsp_clip(tiny_config):
    cfg = clip_cfg(tiny_config, "DMNSP_CLIP", {"lamda_scale": 30.0},
                   backbone_kwargs={"adapter_dim": 8})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert float(np.abs(np.asarray(tr.state.mvars["P"])).sum()) > 0


def test_trgp_clip(tiny_config):
    cfg = clip_cfg(tiny_config, "TRGP_CLIP", {})
    cfg["setting"] = "task-aware"
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # weight deltas trained, GPM projection built, per-task subspaces stored
    assert float(np.abs(np.asarray(tr.state.params["qkv_delta"])).sum()) > 0
    assert float(np.abs(np.asarray(tr.state.mvars["proj"])).sum()) > 0
    assert tr.method._task_spaces[0][0].shape[1] > 0
