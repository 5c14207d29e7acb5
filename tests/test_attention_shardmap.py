"""Fused attention ops under shard_map on a multi-device mesh.

Round-2 verdict: the fused kernels gated OFF whenever the mesh spanned more
than one device, silently dropping the flagship perf feature on DP/TP runs.
Now they shard_map over the mesh's 'data' axis. These tests check, on the
8-device CPU mesh: numerical equivalence vs the plain XLA path (forward AND
gradients), the non-divisible-batch fallback, and the gate defaulting ON.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

A = importlib.import_module("libcontinual_tpu.ops.attention")
from libcontinual_tpu.parallel.mesh import make_mesh


@pytest.fixture
def mesh8():
    """Pure-DP 8x1 mesh — the configuration where the fused kernels engage
    through shard_map (TP meshes route attention to the GSPMD path with
    head-sharding constraints instead; see test_tp_mesh_* below)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    ctx = make_mesh(8, 1)
    A.set_active_mesh(ctx.mesh)
    A.set_active_mesh_devices(8)
    yield ctx
    A.set_active_mesh(None)
    A.set_active_mesh_devices(None)


@pytest.fixture
def mesh4x2():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    ctx = make_mesh(4, 2)
    A.set_active_mesh(ctx.mesh)
    A.set_active_mesh_devices(8)
    yield ctx
    A.set_active_mesh(None)
    A.set_active_mesh_devices(None)


def test_tp_mesh_routes_to_gspmd_attention(mesh4x2):
    """Under TP the fused shard_map path yields to the XLA path with
    head-sharding constraints — and that path stays numerically exact."""
    assert A._shard_mesh() is None
    assert A.tp_model_size() == 2
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(8, 10, 4, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(8, 10, 4, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(8, 10, 4, 8).astype(np.float32))
    got = A.attention_bshd(q, k, v, 0.25)
    A.set_active_mesh(None)
    want = A.attention_bshd(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _qkv(b=8, s=10, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, s, 3 * d).astype(np.float32))


def test_gate_on_under_mesh(mesh8):
    assert A.fused_kernels_ok()


def test_qkv_shardmap_matches_xla(mesh8):
    qkv = _qkv()
    want = A._qkv_attention_xla(qkv, 0.25, 4)
    got = A.fused_qkv_attention(qkv, 0.25, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_qkv_shardmap_grads_match(mesh8):
    qkv = _qkv(seed=1)

    def loss_fused(x):
        return jnp.sum(A.fused_qkv_attention(x, 0.25, 4) ** 2)

    def loss_xla(x):
        return jnp.sum(A._qkv_attention_xla(x, 0.25, 4) ** 2)

    gf = jax.grad(loss_fused)(qkv)
    gx = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_prefix_shardmap_matches_xla(mesh8):
    rng = np.random.RandomState(2)
    qkv = _qkv(seed=2)
    pk = jnp.asarray(rng.randn(8, 6, 32).astype(np.float32))
    pv = jnp.asarray(rng.randn(8, 6, 32).astype(np.float32))
    want = A._pqkv_xla(qkv, pk, pv, 0.25, 4)
    got = A.fused_prefix_attention(qkv, pk, pv, 0.25, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda x: jnp.sum(
        A.fused_prefix_attention(x, pk, pv, 0.25, 4) ** 2))(qkv)
    gx = jax.grad(lambda x: jnp.sum(
        A._pqkv_xla(x, pk, pv, 0.25, 4) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_masked_shardmap_matches_xla(mesh8):
    rng = np.random.RandomState(3)
    qkv = _qkv(seed=3)
    s = qkv.shape[1]
    mask = jnp.asarray(np.triu(np.full((s, s), -1e9, np.float32), k=1))
    want = A._mqkv_xla(qkv, mask, 0.25, 4)
    got = A.fused_masked_qkv_attention(qkv, mask, 0.25, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_nondivisible_batch_falls_back(mesh8):
    qkv = _qkv(b=6, seed=4)  # 6 % 4 != 0 -> XLA fallback, still correct
    want = A._qkv_attention_xla(qkv, 0.25, 4)
    got = A.fused_qkv_attention(qkv, 0.25, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shardmap_inside_jit_with_sharded_inputs(mesh8):
    """The real usage: the op appears inside a jitted step whose inputs are
    GSPMD-sharded along the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    qkv = _qkv(seed=5)
    sharded = jax.device_put(
        qkv, NamedSharding(mesh8.mesh, P("data", None, None)))

    @jax.jit
    def step(x):
        return jnp.sum(A.fused_qkv_attention(x, 0.25, 4) ** 2)

    got = float(step(sharded))
    want = float(jnp.sum(A._qkv_attention_xla(qkv, 0.25, 4) ** 2))
    assert abs(got - want) <= 1e-3 * max(1.0, abs(want))
