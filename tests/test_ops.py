import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.ops.attention import _xla_attention, fused_attention


def test_fused_attention_matches_reference_math():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 3, 9, 8), jnp.float32)
    k = jnp.asarray(rng.randn(2, 3, 13, 8), jnp.float32)  # prefix-extended kv
    v = jnp.asarray(rng.randn(2, 3, 13, 8), jnp.float32)
    out = fused_attention(q, k, v, None)
    ref = _xla_attention(q, k, v, 1.0 / np.sqrt(8))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_grad_matches_autodiff():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 5, 4), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 7, 4), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 7, 4), jnp.float32)
    s = 0.5

    f_custom = lambda q, k, v: jnp.sum(fused_attention(q, k, v, s) ** 2)
    f_ref = lambda q, k, v: jnp.sum(_xla_attention(q, k, v, s) ** 2)
    g_c = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_c, g_r):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_qkv_attention_matches_split_form():
    from libcontinual_tpu.ops.attention import fused_qkv_attention

    rng = np.random.RandomState(2)
    b, s, h, hd = 2, 9, 3, 8
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    scale = 1.0 / np.sqrt(hd)
    out = fused_qkv_attention(qkv, scale, h)
    q = np.asarray(qkv[..., :d]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = np.asarray(qkv[..., d:2 * d]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = np.asarray(qkv[..., 2 * d:]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, d)
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_fused_qkv_attention_grad_matches_autodiff():
    from libcontinual_tpu.ops.attention import fused_qkv_attention, _qkv_attention_xla

    rng = np.random.RandomState(3)
    b, s, h, hd = 1, 6, 2, 4
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    scale = 0.37

    g_c = jax.grad(lambda x: jnp.sum(fused_qkv_attention(x, scale, h) ** 2))(qkv)
    g_r = jax.grad(lambda x: jnp.sum(_qkv_attention_xla(x, scale, h) ** 2))(qkv)
    assert np.allclose(np.asarray(g_c), np.asarray(g_r), atol=1e-4)


def test_fused_prefix_attention_matches_concat_form():
    from libcontinual_tpu.ops.attention import fused_prefix_attention

    rng = np.random.RandomState(4)
    b, s, p, h, hd = 2, 7, 3, 2, 8
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    pk = jnp.asarray(rng.randn(b, p, d), jnp.float32)
    pv = jnp.asarray(rng.randn(b, p, d), jnp.float32)
    scale = 1.0 / np.sqrt(hd)
    out = fused_prefix_attention(qkv, pk, pv, scale, h)

    q = np.asarray(qkv[..., :d]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    kf = np.concatenate([np.asarray(pk), np.asarray(qkv[..., d:2 * d])], axis=1)
    vf = np.concatenate([np.asarray(pv), np.asarray(qkv[..., 2 * d:])], axis=1)
    k = kf.reshape(b, s + p, h, hd).transpose(0, 2, 1, 3)
    v = vf.reshape(b, s + p, h, hd).transpose(0, 2, 1, 3)
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, d)
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_fused_prefix_attention_grads_match_autodiff():
    from libcontinual_tpu.ops.attention import fused_prefix_attention, _pqkv_xla

    rng = np.random.RandomState(5)
    b, s, p, h, hd = 1, 5, 2, 2, 4
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    pk = jnp.asarray(rng.randn(b, p, d), jnp.float32)
    pv = jnp.asarray(rng.randn(b, p, d), jnp.float32)
    scale = 0.41

    g_c = jax.grad(
        lambda a, x, y: jnp.sum(fused_prefix_attention(a, x, y, scale, h) ** 2),
        argnums=(0, 1, 2),
    )(qkv, pk, pv)
    g_r = jax.grad(
        lambda a, x, y: jnp.sum(_pqkv_xla(a, x, y, scale, h) ** 2),
        argnums=(0, 1, 2),
    )(qkv, pk, pv)
    for a, bb in zip(g_c, g_r):
        assert np.allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


def test_fused_masked_qkv_attention_matches_xla():
    from libcontinual_tpu.ops.attention import (
        fused_masked_qkv_attention, _mqkv_xla)

    rng = np.random.RandomState(6)
    b, s, h, hd = 2, 6, 2, 8
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)  # causal
    scale = 1.0 / np.sqrt(hd)
    out = fused_masked_qkv_attention(qkv, mask, scale, h)
    ref = _mqkv_xla(qkv, mask, scale, h)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # causality: row 0 attends only to itself -> output equals v head slice
    v0 = np.asarray(qkv[:, 0, 2 * d:])
    assert np.allclose(np.asarray(out[:, 0]), v0, atol=1e-5)


def test_fused_masked_qkv_attention_grad_matches_autodiff():
    from libcontinual_tpu.ops.attention import (
        fused_masked_qkv_attention, _mqkv_xla)

    rng = np.random.RandomState(7)
    b, s, h, hd = 1, 5, 2, 4
    d = h * hd
    qkv = jnp.asarray(rng.randn(b, s, 3 * d), jnp.float32)
    mask = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)
    scale = 0.29

    g_c = jax.grad(
        lambda x: jnp.sum(fused_masked_qkv_attention(x, mask, scale, h) ** 2)
    )(qkv)
    g_r = jax.grad(lambda x: jnp.sum(_mqkv_xla(x, mask, scale, h) ** 2))(qkv)
    assert np.allclose(np.asarray(g_c), np.asarray(g_r), atol=1e-4)


# --------------------------------------------------------------- conv3x3


class TestConv3x3:
    """ops/conv.py — the flag-gated implicit-GEMM conv (a measured
    rejection on TPU, see its docstring; kept correct + differentiable).
    CPU runs the Pallas interpreter via LIBCONTINUAL_CONV=fused."""

    def _force(self, monkeypatch):
        monkeypatch.setenv("LIBCONTINUAL_CONV", "fused")

    def test_fwd_matches_xla(self, monkeypatch):
        self._force(monkeypatch)
        from libcontinual_tpu.ops.conv import conv3x3, _xla_conv3x3, conv3x3_ok

        rng = np.random.RandomState(0)
        for b, h, w, c, o in [(4, 8, 8, 16, 32), (8, 16, 16, 8, 16)]:
            x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
            k = jnp.asarray(rng.randn(3, 3, c, o) * 0.1, jnp.float32)
            assert conv3x3_ok(x.shape)
            assert np.allclose(np.asarray(conv3x3(x, k)),
                               np.asarray(_xla_conv3x3(x, k)), atol=1e-4)

    def test_grads_match_autodiff(self, monkeypatch):
        self._force(monkeypatch)
        from libcontinual_tpu.ops.conv import conv3x3, _xla_conv3x3

        rng = np.random.RandomState(1)
        b, h, w, c, o = 4, 8, 8, 16, 32
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, c, o) * 0.1, jnp.float32)
        g = jnp.asarray(rng.randn(b, h, w, o), jnp.float32)
        dx, dk = jax.grad(lambda x, k: jnp.sum(conv3x3(x, k) * g), (0, 1))(x, k)
        dx0, dk0 = jax.grad(
            lambda x, k: jnp.sum(_xla_conv3x3(x, k) * g), (0, 1))(x, k)
        assert np.allclose(np.asarray(dx), np.asarray(dx0), atol=1e-3)
        assert np.allclose(np.asarray(dk), np.asarray(dk0), atol=1e-3)

    def test_cpu_defaults_to_xla(self, monkeypatch):
        monkeypatch.delenv("LIBCONTINUAL_CONV", raising=False)
        from libcontinual_tpu.ops.conv import conv3x3_ok

        assert not conv3x3_ok((4, 8, 8, 16))

    def test_xla_fallback_grads_match_autodiff(self, monkeypatch):
        """The non-fused branch of _conv3x3_bwd (hand-written
        conv_general_dilated dx/dw) — the path every CPU/default run takes."""
        monkeypatch.delenv("LIBCONTINUAL_CONV", raising=False)
        from libcontinual_tpu.ops.conv import conv3x3, conv3x3_ok, _xla_conv3x3

        rng = np.random.RandomState(2)
        b, h, w, c, o = 4, 8, 8, 16, 32
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, c, o) * 0.1, jnp.float32)
        g = jnp.asarray(rng.randn(b, h, w, o), jnp.float32)
        assert not conv3x3_ok(x.shape)  # custom-vjp fallback branch active
        dx, dk = jax.grad(lambda x, k: jnp.sum(conv3x3(x, k) * g), (0, 1))(x, k)
        dx0, dk0 = jax.grad(
            lambda x, k: jnp.sum(_xla_conv3x3(x, k) * g), (0, 1))(x, k)
        assert np.allclose(np.asarray(dx), np.asarray(dx0), atol=1e-3)
        assert np.allclose(np.asarray(dk), np.asarray(dk0), atol=1e-3)
