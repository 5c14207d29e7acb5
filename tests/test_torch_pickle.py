"""Torch-free .pth reader: fabricate real torch checkpoints (torch is in the
test image only — the framework itself never imports it) and read them back
through utils.torch_pickle + the ViT/CLIP loaders."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from libcontinual_tpu.utils.torch_pickle import load_torch_state_dict


def roundtrip(tmp_path, obj, name="ckpt.pth"):
    p = tmp_path / name
    torch.save(obj, str(p))
    return load_torch_state_dict(str(p))


def test_state_dict_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    sd = {
        "a.weight": torch.from_numpy(rng.randn(4, 3).astype(np.float32)),
        "a.bias": torch.from_numpy(rng.randn(4).astype(np.float32)),
        "b.scalar": torch.tensor(2.5),
        "c.long": torch.arange(6, dtype=torch.int64).reshape(2, 3),
        "d.param": torch.nn.Parameter(torch.ones(2, 2)),
    }
    got = roundtrip(tmp_path, sd)
    for k, v in sd.items():
        assert k in got, k
        assert np.allclose(got[k], v.detach().numpy()), k
    assert got["b.scalar"].shape == ()


def test_half_and_noncontiguous(tmp_path):
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {
        "half": torch.randn(3, 3).half(),
        "strided": base.t(),  # non-contiguous view: stride handling
        "sliced": base[:, 1:4],  # offset + stride
    }
    got = roundtrip(tmp_path, sd)
    assert got["half"].dtype == np.float32  # upcast on read
    assert np.allclose(got["half"], sd["half"].float().numpy(), atol=1e-3)
    assert np.allclose(got["strided"], base.t().numpy())
    assert np.allclose(got["sliced"], base[:, 1:4].numpy())


def test_bfloat16_storage(tmp_path):
    sd = {"w": torch.randn(5, 5).bfloat16()}
    got = roundtrip(tmp_path, sd)
    assert np.allclose(got["w"], sd["w"].float().numpy(), atol=1e-2)


def test_wrapped_state_dict(tmp_path):
    sd = {"state_dict": {"x": torch.ones(2)}}
    got = roundtrip(tmp_path, sd)
    assert np.allclose(got["x"], 1.0)


def test_refuses_arbitrary_globals(tmp_path):
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    p = tmp_path / "evil.pth"
    torch.save({"e": Evil()}, str(p), pickle_protocol=2)
    with pytest.raises(Exception):
        load_torch_state_dict(str(p))


def test_load_timm_torch_weights(tmp_path):
    """A fabricated timm-format ViT .pth loads through the key remap
    (reference vit.py:63-84) into the tiny test ViT."""
    import jax
    import jax.numpy as jnp

    from libcontinual_tpu.models.vit import load_timm_weights
    from libcontinual_tpu.registry import BACKBONES

    m = BACKBONES.get("vit_tiny_test")()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)[
        "params"
    ]
    D, depth, patch = 64, 4, 8
    g = torch.Generator().manual_seed(0)
    sd = {
        "cls_token": torch.randn(1, 1, D, generator=g),
        "pos_embed": torch.randn(*np.asarray(params["pos_embed"]).shape, generator=g),
        "patch_embed.proj.weight": torch.randn(D, 3, patch, patch, generator=g),
        "patch_embed.proj.bias": torch.randn(D, generator=g),
        "norm.weight": torch.ones(D),
        "norm.bias": torch.zeros(D),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": torch.ones(D),
            f"blocks.{i}.norm1.bias": torch.zeros(D),
            f"blocks.{i}.norm2.weight": torch.ones(D),
            f"blocks.{i}.norm2.bias": torch.zeros(D),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D, generator=g),
            f"blocks.{i}.attn.qkv.bias": torch.zeros(3 * D),
            f"blocks.{i}.attn.proj.weight": torch.randn(D, D, generator=g),
            f"blocks.{i}.attn.proj.bias": torch.zeros(D),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * D, D, generator=g),
            f"blocks.{i}.mlp.fc1.bias": torch.zeros(4 * D),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(D, 4 * D, generator=g),
            f"blocks.{i}.mlp.fc2.bias": torch.zeros(D),
        })
    p = tmp_path / "vit.pth"
    torch.save(sd, str(p))
    loaded = load_timm_weights(params, str(p))
    assert np.allclose(
        np.asarray(loaded["block_0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].numpy().T,
    )
    assert np.allclose(
        np.asarray(loaded["patch_embed"]["kernel"]),
        sd["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0),
    )
    out = m.apply({"params": loaded}, jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.isfinite(np.asarray(out["features"])).all()


def test_load_clip_pth_path(tmp_path):
    """load_clip_torch_weights accepts a .pth *path* with no torch import in
    the library (reference clip.py:418-498)."""
    import jax
    import jax.numpy as jnp

    from libcontinual_tpu.models.clip import load_clip_torch_weights
    from libcontinual_tpu.registry import BACKBONES

    m = BACKBONES.get("clip_tiny_test")()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, toks, train=False)["params"]
    W, E = 64, 32
    sd = {
        "visual.proj": torch.randn(W, E),
        "text_projection": torch.randn(W, E),
        "logit_scale": torch.tensor(1.5),
    }
    p = tmp_path / "clip.pth"
    torch.save(sd, str(p))
    loaded = load_clip_torch_weights(params, str(p))
    assert np.allclose(np.asarray(loaded["visual_projection"]), sd["visual.proj"].numpy())
    assert float(np.asarray(loaded["logit_scale"])) == pytest.approx(1.5)


def test_load_npz_weights_including_top_level_arrays(tmp_path):
    """npz (augreg) loading must install cls_token and pos_embed — the
    top-level array keys (regression: the shape-validation wrapper rebound
    the params dict locally and silently dropped exactly those two, leaving
    a 'pretrained' backbone with random cls/pos embeddings)."""
    import jax
    import jax.numpy as jnp

    from libcontinual_tpu.models.vit import load_timm_weights
    from libcontinual_tpu.registry import BACKBONES

    m = BACKBONES.get("vit_tiny_test")()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                    train=False)["params"]
    D, depth, patch = 64, 4, 8
    rng = np.random.RandomState(0)
    raw = {
        "cls": rng.randn(*np.asarray(params["cls_token"]).shape).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.randn(*np.asarray(params["pos_embed"]).shape).astype(np.float32),
        "embedding/kernel": rng.randn(patch, patch, 3, D).astype(np.float32),
        "embedding/bias": rng.randn(D).astype(np.float32),
        "Transformer/encoder_norm/scale": np.ones(D, np.float32),
        "Transformer/encoder_norm/bias": np.zeros(D, np.float32),
    }
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}"
        raw[f"{b}/LayerNorm_0/scale"] = np.ones(D, np.float32)
        raw[f"{b}/LayerNorm_0/bias"] = np.zeros(D, np.float32)
        raw[f"{b}/LayerNorm_2/scale"] = np.ones(D, np.float32)
        raw[f"{b}/LayerNorm_2/bias"] = np.zeros(D, np.float32)
        att = f"{b}/MultiHeadDotProductAttention_1"
        for n in ("query", "key", "value"):
            raw[f"{att}/{n}/kernel"] = rng.randn(D, 4, D // 4).astype(np.float32)
            raw[f"{att}/{n}/bias"] = np.zeros((4, D // 4), np.float32)
        raw[f"{att}/out/kernel"] = rng.randn(4, D // 4, D).astype(np.float32)
        raw[f"{att}/out/bias"] = np.zeros(D, np.float32)
        mlp = f"{b}/MlpBlock_3"
        raw[f"{mlp}/Dense_0/kernel"] = rng.randn(D, 4 * D).astype(np.float32)
        raw[f"{mlp}/Dense_0/bias"] = np.zeros(4 * D, np.float32)
        raw[f"{mlp}/Dense_1/kernel"] = rng.randn(4 * D, D).astype(np.float32)
        raw[f"{mlp}/Dense_1/bias"] = np.zeros(D, np.float32)
    p = tmp_path / "vit.npz"
    np.savez(str(p), **raw)
    loaded = load_timm_weights(params, str(p))
    assert np.allclose(np.asarray(loaded["cls_token"]), raw["cls"])
    assert np.allclose(
        np.asarray(loaded["pos_embed"]),
        raw["Transformer/posembed_input/pos_embedding"])
    assert np.allclose(
        np.asarray(loaded["patch_embed"]["kernel"]), raw["embedding/kernel"])
    # wrong-geometry npz must fail loudly
    import pytest

    bad = dict(raw)
    bad["Transformer/encoderblock_0/LayerNorm_0/scale"] = np.ones(D + 1, np.float32)
    p2 = tmp_path / "vit_bad.npz"
    np.savez(str(p2), **bad)
    with pytest.raises(ValueError, match="geometry"):
        load_timm_weights(params, str(p2))
