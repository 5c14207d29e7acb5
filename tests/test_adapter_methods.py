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


def test_ranpac_ridge_sweep_picks_interior_lambda():
    """On an overparameterised noisy fit split the sweep must NOT pick the
    smallest grid lambda (the round-1 degenerate behavior); it must minimise
    the held-out MSE, matching reference ranpac.py:253-263."""
    import jax.numpy as jnp

    from libcontinual_tpu.methods.ranpac import RIDGE_GRID, ridge_sweep

    rng = np.random.RandomState(0)
    M, C, nf, nh = 64, 4, 48, 200
    W = rng.randn(M, C) * 0.1
    Hf, Hh = rng.randn(nf, M), rng.randn(nh, M)
    Yf = Hf @ W + rng.randn(nf, C) * 2.0  # noisy fit split (nf < M: singular G)
    Yh = Hh @ W  # clean holdout
    Qf, Gf = Hf.T @ Yf, Hf.T @ Hf
    Qh, Gh = Hh.T @ Yh, Hh.T @ Hh
    lam, errs = ridge_sweep(
        jnp.asarray(Qf, jnp.float32), jnp.asarray(Gf, jnp.float32),
        jnp.asarray(Qh, jnp.float32), jnp.asarray(Gh, jnp.float32),
        jnp.float32((Yh**2).sum()), jnp.float32(nh), C,
    )
    assert lam == RIDGE_GRID[int(np.argmin(errs))]
    assert lam != RIDGE_GRID[0], "sweep degenerated to the smallest lambda"
    # closed-form holdout MSE == explicit prediction MSE (reference formula)
    i = RIDGE_GRID.index(lam)
    Wo = np.linalg.solve(Gf + lam * np.eye(M), Qf)
    explicit = float(((Hh @ Wo - Yh) ** 2).mean())
    assert abs(errs[i] - explicit) / max(explicit, 1e-9) < 1e-3


def test_moe_adapter4cl_vit_variant(tiny_config):
    """MOE_ADAPTER4CL dispatches to the ViT variant on non-clip backbones
    (reference moe_adapter4cl.py:70-98 + moe_adapter4cl_vit.yaml): MoE params
    + head train, trunk frozen."""
    cfg = cfg_for(tiny_config, "MOE_ADAPTER4CL", {},
                  backbone_kwargs={"experts_num": 2, "adapter_dim": 0})
    tr = Trainer(cfg)
    from libcontinual_tpu.methods.clip_methods import MoEAdapter4CLViT

    assert isinstance(tr.method, MoEAdapter4CLViT)
    import jax

    frozen_before = jax.tree_util.tree_map(
        np.asarray, tr.state.params["backbone"]["block_0"]["attn"]
    )
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    frozen_after = jax.tree_util.tree_map(
        np.asarray, tr.state.params["backbone"]["block_0"]["attn"]
    )
    for b, a in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(frozen_after)):
        assert np.allclose(b, a), "frozen trunk moved"
    assert res["acc_table"][1].mean() > 25.0


def test_dmnsp(tiny_config):
    cfg = cfg_for(tiny_config, "DMNSP", {"lamda_scale": 30.0, "embd_dim": 64})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # basis accumulated, projection active after task 0
    assert float(np.abs(np.asarray(tr.state.mvars["P"])).sum()) > 0
    assert float(tr.state.mvars["proj_on"]) == 1.0
