"""Micro-runs for the prompt family on a tiny ViT (frozen backbone)."""

import copy

import numpy as np
import pytest

from libcontinual_tpu.core.trainer import Trainer


def prompt_cfg(tiny_config, name, extra):
    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": name,
        "kwargs": {
            "num_class": 8,
            "feat_dim": 64,
            "init_cls_num": 4,
            "inc_cls_num": 4,
            "task_num": 2,
            **extra,
        },
    }
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}}
    cfg["epoch"] = 8
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    return cfg


def run(cfg):
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    return tr, res


def test_l2p(tiny_config):
    cfg = prompt_cfg(tiny_config, "L2P", {
        "prompt_length": 3, "pool_size": 6, "top_k": 2, "pull_constraint_coeff": 0.1,
    })
    tr, res = run(cfg)
    # frozen random ViT features are weak; assert task-0 learnability instead
    assert res["acc_table"][0, 0] > 40.0


def test_l2p_frozen_backbone(tiny_config):
    cfg = prompt_cfg(tiny_config, "L2P", {
        "prompt_length": 3, "pool_size": 6, "top_k": 2, "pull_constraint_coeff": 0.1,
    })
    cfg["epoch"] = 1
    tr = Trainer(cfg)
    import jax

    before = jax.tree_util.tree_map(np.array, tr.state.mvars["frozen"])
    tr.train_loop()
    after = tr.state.mvars["frozen"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), before, after
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_dualprompt(tiny_config):
    cfg = prompt_cfg(tiny_config, "DualPrompt", {
        "e_prompt_length": 4, "g_prompt_length": 4, "pool_size": 2,
    })
    tr, res = run(cfg)
    assert res["acc_table"][0, 0] > 40.0


def test_codaprompt(tiny_config):
    cfg = prompt_cfg(tiny_config, "CodaPrompt", {
        "prompt_length": 4, "pool_size": 4, "mu": 0.1,
    })
    tr, res = run(cfg)
    assert res["acc_table"][0, 0] > 40.0
