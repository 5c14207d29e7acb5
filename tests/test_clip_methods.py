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
    cfg = clip_cfg(tiny_config, "RAPF", {"beta": 0.5})
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert float(np.asarray(tr.state.mvars["cls_valid"]).sum()) == 8.0
    # bias-free adapter (reference rapf.py:84) actually trained: the final
    # kernel differs from the old_adapter snapshot only through mix_matrix
    k = np.asarray(tr.state.params["adapter"]["kernel"])
    assert set(tr.state.params["adapter"]) == {"kernel"}
    assert np.isfinite(k).all() and np.abs(k).max() > 0
    # per-class Cholesky factors are lower-triangular with positive diagonal
    L = np.asarray(tr.state.mvars["cls_chol"][0])
    assert np.allclose(L, np.tril(L))
    assert (np.diag(L) > 0).all()


def test_rapf_shrink_cov_and_sampling():
    """shrink_cov matches reference rapf.py:26-36; Cholesky sampling
    reproduces the full covariance (not just its diagonal)."""
    from libcontinual_tpu.methods.clip_methods import shrink_cov

    rng = np.random.RandomState(0)
    A = rng.randn(4, 4)
    cov = A @ A.T + 0.1 * np.eye(4)
    sc = shrink_cov(cov.copy())
    off = cov.copy()
    np.fill_diagonal(off, 0.0)
    exp = cov + np.mean(np.diag(cov)) * np.eye(4) + (
        off.sum() / (off != 0).sum()
    ) * (1 - np.eye(4))
    assert np.allclose(sc, exp)
    # sampling: z @ L^T + mu has covariance cov
    L = np.linalg.cholesky(cov)
    z = rng.randn(200000, 4)
    s = z @ L.T
    emp = np.cov(s.T)
    assert np.abs(emp - cov).max() < 0.15


def test_rapf_mix_matrix_rule():
    """Fusion follows reference mix_matrix (rapf.py:212-226)."""
    from libcontinual_tpu.methods.clip_methods import mix_matrix

    rng = np.random.RandomState(1)
    W_old = rng.randn(6, 6)
    # no drift -> fused equals the old weight exactly
    assert np.allclose(mix_matrix(W_old, W_old.copy(), 0.6), W_old, atol=1e-8)
    # mix_bias = 1 -> mask saturates everywhere -> fused equals the NEW weight
    W_new = W_old + rng.randn(6, 6)
    assert np.allclose(mix_matrix(W_old, W_new, 1.0), W_new, atol=1e-8)
    # intermediate bias -> fused strictly between old and new in the U basis
    fused = mix_matrix(W_old, W_new, 0.3)
    U, S, Vt = np.linalg.svd(W_old, full_matrices=False)
    P_f, P_o, P_n = U.T @ fused, np.diag(S) @ Vt, U.T @ W_new
    lo, hi = np.minimum(P_o, P_n) - 1e-9, np.maximum(P_o, P_n) + 1e-9
    assert ((P_f >= lo) & (P_f <= hi)).all()


def test_inflora_opt_on_clip(tiny_config):
    """InfLoRA_OPT dispatches to the CLIP variant when backbone is clip
    (reference config/InfLoRA_opt_clip.yaml:53-57) and learns task 0."""
    cfg = clip_cfg(tiny_config, "InfLoRA_OPT",
                   {"lame": 1.0, "lamb": 0.95, "rank": 4, "visual_only": True})
    tr = Trainer(cfg)
    from libcontinual_tpu.methods.inflora import InfLoRAOPTCLIP

    assert isinstance(tr.method, InfLoRAOPTCLIP)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    # current-task LoRA B factors trained; A set by SVD (non-zero)
    lora = tr.state.params["lora"]
    assert float(np.abs(np.asarray(lora["B_k"][:, 1])).sum()) > 0
    assert float(np.abs(np.asarray(lora["A_k"][:, 0])).sum()) > 0
    # learned something on task 0 (8-class tiny synthetic data)
    assert res["acc_table"][0, 0] > 25.0


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


def test_clip_torch_weight_import():
    """Synthetic OpenAI-format state dict loads through the key remap."""
    import jax
    import jax.numpy as jnp
    from libcontinual_tpu.registry import BACKBONES
    from libcontinual_tpu.models.clip import load_clip_torch_weights

    m = BACKBONES.get("clip_tiny_test")()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, toks, train=False)["params"]

    rng = np.random.RandomState(0)
    W, D, E = 64, 2, 32  # width, depth, embed of the tiny model
    sd = {
        "visual.proj": rng.randn(W, E).astype(np.float32),
        "text_projection": rng.randn(W, E).astype(np.float32),
        "logit_scale": np.float32(1.5),
        "token_embedding.weight": rng.randn(49408, W).astype(np.float32),
        "positional_embedding": rng.randn(77, W).astype(np.float32),
        "ln_final.weight": np.ones(W, np.float32),
        "ln_final.bias": np.zeros(W, np.float32),
        "visual.conv1.weight": rng.randn(W, 3, 8, 8).astype(np.float32),
        "visual.class_embedding": rng.randn(W).astype(np.float32),
        "visual.positional_embedding": rng.randn(17, W).astype(np.float32),
        "visual.ln_post.weight": np.ones(W, np.float32),
        "visual.ln_post.bias": np.zeros(W, np.float32),
    }
    for tower, prefix in (("visual", "visual.transformer"), ("text", "transformer")):
        for i in range(D):
            b = f"{prefix}.resblocks.{i}"
            sd[f"{b}.ln_1.weight"] = np.ones(W, np.float32)
            sd[f"{b}.ln_1.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.ln_2.weight"] = np.ones(W, np.float32)
            sd[f"{b}.ln_2.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.attn.in_proj_weight"] = rng.randn(3 * W, W).astype(np.float32)
            sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * W, np.float32)
            sd[f"{b}.attn.out_proj.weight"] = rng.randn(W, W).astype(np.float32)
            sd[f"{b}.attn.out_proj.bias"] = np.zeros(W, np.float32)
            sd[f"{b}.mlp.c_fc.weight"] = rng.randn(4 * W, W).astype(np.float32)
            sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * W, np.float32)
            sd[f"{b}.mlp.c_proj.weight"] = rng.randn(W, 4 * W).astype(np.float32)
            sd[f"{b}.mlp.c_proj.bias"] = np.zeros(W, np.float32)

    loaded = load_clip_torch_weights(params, sd)
    assert np.allclose(np.asarray(loaded["visual_projection"]), sd["visual.proj"])
    assert np.allclose(
        np.asarray(loaded["visual"]["block_0"]["attn"]["qkv"]["kernel"]),
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].T,
    )
    assert np.allclose(
        np.asarray(loaded["visual"]["patch_embed"]["kernel"]),
        sd["visual.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # model runs with the loaded weights
    out = m.apply({"params": loaded}, x, toks, train=False)
    assert np.isfinite(np.asarray(out["logits_per_image"])).all()
