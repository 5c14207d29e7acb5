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
    # general (shared) stream trained: nonzero up factors
    assert float(np.abs(np.asarray(tr.state.params["gen_up_q"])).sum()) > 0
    # block weights: (3, n_specific) like the reference's (3, 6)
    assert tr.state.params["block_w"].shape[0] == 3
    # prototype bank filled for all seen classes
    assert float(np.asarray(tr.state.mvars["proto_valid"]).sum()) > 0


def test_minflora(tiny_config):
    cfg = lora_cfg(tiny_config, "MInfLoRA",
                   {"lame": 1.0, "lamb": 0.95, "rank": 4,
                    "probe_top_r": 16, "probe_energy": 0.2})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    lora = tr.state.params["lora"]
    # per-task A slots SVD-initialized from the probe grams, B trained
    assert float(np.abs(np.asarray(lora["A_k"][0, 1])).sum()) > 0
    assert float(np.abs(np.asarray(lora["B_k"][0, 0])).sum()) > 0
    # APPROX_FEAT feature list grew by rank per task
    assert tr.method._feature_list[0].shape[1] == 8
    assert res["acc_table"][0, 0] > 40.0


def test_minflora2(tiny_config):
    cfg = lora_cfg(tiny_config, "MInfLoRA2",
                   {"lame": 1.0, "lamb": 0.95, "rank": 4,
                    "scale_rank_cap": 8, "route_rank_cap": 16})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # merge_weight folded task deltas into the persistent merged delta
    md = np.asarray(tr.state.mvars["merged_delta"])
    assert float(np.abs(md).sum()) > 0
    # routing spaces saved for both tasks
    assert np.asarray(tr.state.mvars["route_mask"]).tolist() == [1.0, 1.0]
    assert res["acc_table"][0, 0] > 40.0


def test_minflora3(tiny_config):
    cfg = lora_cfg(tiny_config, "MInfLoRA3",
                   {"lame": 1.0, "lamb": 0.95, "rank": 4, "space_rank": 16})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    lora = tr.state.params["lora"]
    # A frozen at kaiming init (the reference's SVD write is dead code);
    # B of each trained task is nonzero
    assert float(np.abs(np.asarray(lora["B_k"][0, 0])).sum()) > 0
    # task-1 trust-region space set in before_task
    assert float(np.asarray(tr.state.mvars["space_mask"])[1]) == 1.0
    assert res["acc_table"][0, 0] > 40.0


def test_greedy_span_select():
    from libcontinual_tpu.methods.minflora import greedy_span_select

    rng = np.random.RandomState(0)
    # two dominant orthogonal directions + noise: the first two picks must
    # cover them
    base = np.zeros((20, 8))
    base[3, 0] = 10.0
    base[11, 1] = 9.0
    vecs = base + 0.01 * rng.randn(20, 8)
    idx = greedy_span_select(vecs, energy_threshold=0.9)
    assert idx[0] == 3 and idx[1] == 11


def test_weight_space_scale_identity():
    """Proj semantics (reference petl/proj.py:28-48): identity scale is a
    no-op; a scaled space direction changes only the in-space component."""
    import jax.numpy as jnp
    from libcontinual_tpu.methods.minflora import weight_space_scale

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(6, 4), jnp.float32)
    q, _ = np.linalg.qr(rng.randn(6, 2))
    space = jnp.asarray(q.T, jnp.float32)  # (2, 6) orthonormal rows
    eye = jnp.eye(2, dtype=jnp.float32)
    out = weight_space_scale(w, space, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(w), atol=1e-6)
    # doubling the scale: in-space component scales by (2I)(2I)^T = 4
    out2 = np.asarray(weight_space_scale(w, space, 2.0 * eye))
    proj = q @ (q.T @ np.asarray(w))
    np.testing.assert_allclose(out2, np.asarray(w) + 3.0 * proj, atol=1e-5)


def test_inflora_opt(tiny_config):
    cfg = lora_cfg(tiny_config, "InfLoRA_OPT",
                   {"lame": 1.0, "lamb": 0.95, "total_sessions": 2, "rank": 4,
                    "ca_epochs": 1, "num_sampled_pcls": 16})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert tr.method._seen.sum() == 8
