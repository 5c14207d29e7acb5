"""Fused multi-head attention for the ViT/CLIP stack.

The reference's hot path is torch ``softmax(QK^T/sqrt(d))V`` with prompt
prefixes concatenated onto K/V (reference backbone/transformer.py:169-197,
prefix concat :175-180). Here:

  * prompt-prefix concat happens outside the kernel (XLA fuses the concat
    into the producing ops; prefix lengths are static per method/config);
  * the attention itself is a Pallas TPU kernel that keeps the (Sq, Skv)
    score tile entirely in VMEM — the (B, H, S, S) score tensor never
    round-trips to HBM (ViT-B sequences are ~197-230 tokens, so a whole
    (S, S) f32 tile is ~200 KB: far under the 16 MB VMEM budget; no online
    softmax needed at these lengths);
  * grid = (batch, heads): each program computes one head's attention with
    two MXU matmuls + a VPU softmax;
  * backward runs through a custom VJP with the same tiling (dQ/dK/dV each
    one kernel), so training also avoids materializing scores in HBM;
  * on CPU (tests) the same math runs as plain XLA ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _xla_attention(q, k, v, scale):
    # Score-accumulation dtype: measured in ISOLATION, bf16 scores beat f32
    # (1.30 vs 1.61 ms/layer at ViT-B/L2P shapes — halves the (B,H,Sq,Skv)
    # logits HBM traffic), but in the FULL L2P train step they regress
    # throughput 626->586 img/s (fusion interaction with the surrounding
    # pass; measured on v5e, tools/bench_attention.py + bench.py). Default
    # stays f32; bf16 remains selectable for other workloads.
    import os

    pet = (
        jnp.bfloat16
        if (q.dtype == jnp.bfloat16
            and os.environ.get("LIBCONTINUAL_ATTN_SCORES") == "bf16")
        else jnp.float32
    )
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=pet)
    p = jax.nn.softmax(s.astype(jnp.float32) * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ---------------------------------------------------------------- fused qkv


# How many devices the active computation spans, and the Mesh itself. The
# trainer records both so (a) a single-device run on an 8-chip host still
# gets the Pallas kernels directly, and (b) multi-device meshes keep them
# through shard_map: the batch grid is embarrassingly parallel over the
# 'data' axis, so each device runs the kernel on its local batch shard
# (pallas_call itself has no GSPMD partitioning rule).
_ACTIVE_MESH_DEVICES = None
_ACTIVE_MESH = None


def set_active_mesh_devices(n) -> None:
    global _ACTIVE_MESH_DEVICES
    _ACTIVE_MESH_DEVICES = None if n is None else int(n)


def set_active_mesh(mesh) -> None:
    """Register the active ``jax.sharding.Mesh`` so the fused attention ops
    can shard_map themselves over its 'data' axis."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def _shard_mesh():
    """Mesh to shard_map the fused kernels over, or None for direct call."""
    import os

    env = os.environ.get("LIBCONTINUAL_ATTN_SHARDMAP")
    if env == "off":
        return None
    m = _ACTIVE_MESH
    if m is None or "data" not in m.axis_names:
        return None
    # "force" keeps shard_map even on a single-device mesh: that is how the
    # pallas_call-inside-shard_map lowering is executed on a real chip when
    # only one is attached (tests/test_tpu_kernels.py).
    if m.size <= 1 and env != "force":
        return None
    if "model" in m.axis_names and m.shape["model"] > 1:
        # under tensor parallelism attention takes the GSPMD XLA path with
        # head-sharding constraints (_tp_head_constraint) — per-rank FLOPs
        # split beats the fused kernel running replicated over 'model'
        return None
    return m


def fused_kernels_ok() -> bool:
    """True when the packed-qkv Pallas kernels may be used: the computation
    spans one device, or an active mesh is registered (the ops shard_map
    over its 'data' axis). ``LIBCONTINUAL_ATTN=fused/xla`` force/disable."""
    import os

    env = os.environ.get("LIBCONTINUAL_ATTN")
    if env == "fused":
        return True
    if env == "xla":
        return False
    if _shard_mesh() is not None:
        return True
    n = _ACTIVE_MESH_DEVICES
    if n is None:
        n = jax.device_count()
    return n == 1


def _shard_batchwise(fn, n_batch_args, n_replicated_args=0):
    """shard_map ``fn`` over the active mesh's 'data' axis: the first
    ``n_batch_args`` arguments split on axis 0, the rest are replicated.
    Mesh axes not named in the specs (e.g. 'model') replicate the compute —
    attention activations are not tensor-parallel (parallel/tp.py)."""
    shard_map = jax.shard_map  # jax>=0.8 spelling (experimental alias removed)
    from jax.sharding import PartitionSpec as P

    mesh = _shard_mesh()
    batch = P("data", *([None] * 2))
    in_specs = tuple([batch] * n_batch_args + [P(None, None)] * n_replicated_args)
    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=batch, check_vma=False
    )


def _batch_tile(b: int, per_image_bytes: int, budget: int = 8 * 2**20) -> int:
    """Images per kernel program: 2 when a pair fits the VMEM budget
    (block in/out + f32 score tiles, dtype-aware), else 1."""
    return 2 if (b % 2 == 0 and 2 * per_image_bytes <= budget) else 1


def _qkv_kernel(qkv_ref, o_ref, *, scale, heads, bt):
    """One program: ``bt`` images, all heads. The head split is a set of
    STATIC LANE SLICES of the packed (S, 3*D) qkv block — the (b,s,h,hd)
    reshape that XLA materializes as a 64-lane relayout copy (~14 ms/step
    at ViT-B/L2P shapes) never exists here, and the (S, S) score tile stays
    in VMEM (no f32 score round-trip)."""
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    for b in range(bt):
        x = qkv_ref[b]  # (S, 3D)
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _qkv_attention_pallas(qkv, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, s * (d3 + d) * it + 2 * s * s * 4)
    return pl.pallas_call(
        functools.partial(_qkv_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * s * s * (d // heads),
            bytes_accessed=b * s * 4 * d * 2,
            transcendentals=b * heads * s * s,
        ),
    )(qkv)


def _qkv_attention_xla(qkv, scale, heads):
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = qkv[..., d:2 * d].reshape(b, s, heads, hd)
    v = qkv[..., 2 * d:].reshape(b, s, heads, hd)
    return _xla_attention_bshd(q, k, v, scale).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv_attention_core(qkv, scale, heads):
    """Self-attention straight off the packed qkv tensor:
    ``(B, S, 3*D) -> (B, S, D)`` with the head axis split in-kernel.

    Forward is the Pallas kernel on TPU (measured 2.67 vs 3.40 ms/layer
    for XLA's slice+reshape+einsum chain at ViT-B/L2P shapes, ~22% —
    it also subsumes the relayout copies XLA emits around the reshape);
    plain XLA on CPU. Backward recomputes probabilities via XLA einsums
    (flash-style; nothing S x S is saved), so the op is safe to
    differentiate anywhere. Pure self-attention only — prefix-KV goes
    through :func:`fused_prefix_attention` and additive masks through
    :func:`fused_masked_qkv_attention`; `attention_bshd` remains the
    GSPMD-partitionable multi-device path."""
    if _on_tpu():
        return _qkv_attention_pallas(qkv, scale, heads)
    return _qkv_attention_xla(qkv, scale, heads)


def _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, scale, heads, bt):
    """Flash-style backward: recompute the (S, S) probabilities in VMEM and
    emit dqkv in the packed layout — the score/probability tensors and the
    (b,s,h,hd) relayouts never touch HBM (the XLA einsum backward measured
    ~5.7 ms/layer in-context at ViT-B/L2P shapes; this kernel ~1.7 ms)."""
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    for b in range(bt):
        x = qkv_ref[b]   # (S, 3D)
        go = g_ref[b]    # (S, D)
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            gh = go[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Sq, Sk) f32
            pb = p.astype(x.dtype)
            dp = jax.lax.dot_general(
                gh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Sq, Sk)
            dv = jax.lax.dot_general(
                pb, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Sk, hd)
            dl = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
                x.dtype)
            dq = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                dl, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[b, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, d + h * hd:d + (h + 1) * hd] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, 2 * d + h * hd:2 * d + (h + 1) * hd] = dv.astype(
                dqkv_ref.dtype)


def _qkv_bwd_pallas(qkv, g, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, s * (2 * d3 + d) * it + 2 * s * s * 4)
    return pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * s * s * (d // heads),
            bytes_accessed=2 * b * s * d3 * 2 + b * s * d * 2,
            transcendentals=b * heads * s * s,
        ),
    )(qkv, g)


def _fused_qkv_fwd(qkv, scale, heads):
    return _qkv_attention_core(qkv, scale, heads), qkv


def _fused_qkv_bwd(scale, heads, qkv, g):
    if _on_tpu():
        return (_qkv_bwd_pallas(qkv, g, scale, heads),)
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = qkv[..., d:2 * d].reshape(b, s, heads, hd)
    v = qkv[..., 2 * d:].reshape(b, s, heads, hd)
    go = g.reshape(b, s, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = go.astype(jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32).astype(v.dtype)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", dl, k.astype(jnp.float32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bqhd->bkhd", dl, q.astype(jnp.float32)) * scale).astype(k.dtype)
    dqkv = jnp.concatenate(
        [dq.reshape(b, s, d), dk.reshape(b, s, d), dv.reshape(b, s, d)], axis=-1
    )
    return (dqkv,)


_qkv_attention_core.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def fused_qkv_attention(qkv, scale, heads):
    """Public entry: direct kernel on a single device; shard_map over the
    active mesh's 'data' axis otherwise (batch is embarrassingly parallel).
    Batches not divisible by the data axis take the GSPMD-partitionable XLA
    path instead."""
    mesh = _shard_mesh()
    if mesh is None:
        return _qkv_attention_core(qkv, scale, heads)
    if qkv.shape[0] % mesh.shape["data"] != 0:
        return _qkv_attention_xla(qkv, scale, heads)
    return _shard_batchwise(
        lambda x: _qkv_attention_core(x, scale, heads), 1
    )(qkv)


# ------------------------------------------------------- fused qkv + prefix


def _pqkv_kernel(qkv_ref, pk_ref, pv_ref, o_ref, *, scale, heads, bt):
    """Prefix-KV self-attention (DualPrompt/CODA/DAP hot path). The prompt
    block is handled as a SECOND score matmul with a jointly-normalized
    softmax (no K/V concat — Mosaic can't relayout sublane concats of
    misaligned tiles, and the (B, P+S, H, hd) concatenated tensors plus the
    (S, P+S) scores never exist in HBM)."""
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    for b in range(bt):
        x = qkv_ref[b]    # (S, 3D)
        pkb = pk_ref[b]   # (P, D)
        pvb = pv_ref[b]
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            pk = pkb[:, h * hd:(h + 1) * hd]  # (P, hd)
            pv = pvb[:, h * hd:(h + 1) * hd]
            sp = jax.lax.dot_general(
                q, pk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (S, P)
            sx = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (S, S)
            m = jnp.maximum(
                jnp.max(sp, axis=-1, keepdims=True),
                jnp.max(sx, axis=-1, keepdims=True),
            )
            ep = jnp.exp(sp - m)
            ex = jnp.exp(sx - m)
            den = jnp.sum(ep, axis=-1, keepdims=True) + jnp.sum(
                ex, axis=-1, keepdims=True)
            pp = (ep / den).astype(x.dtype)
            px = (ex / den).astype(x.dtype)
            o = jax.lax.dot_general(
                pp, pv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                px, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _pqkv_bwd_kernel(qkv_ref, pk_ref, pv_ref, g_ref, dqkv_ref, dpk_ref,
                     dpv_ref, *, scale, heads, bt):
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    for b in range(bt):
        x = qkv_ref[b]
        pkb = pk_ref[b]
        pvb = pv_ref[b]
        go = g_ref[b]
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            pk = pkb[:, h * hd:(h + 1) * hd]
            pv = pvb[:, h * hd:(h + 1) * hd]
            gh = go[:, h * hd:(h + 1) * hd]
            sp = jax.lax.dot_general(
                q, pk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            sx = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.maximum(
                jnp.max(sp, axis=-1, keepdims=True),
                jnp.max(sx, axis=-1, keepdims=True),
            )
            ep = jnp.exp(sp - m)
            ex = jnp.exp(sx - m)
            den = jnp.sum(ep, axis=-1, keepdims=True) + jnp.sum(
                ex, axis=-1, keepdims=True)
            pp = ep / den  # (S, P) f32
            px = ex / den  # (S, S) f32
            dpp = jax.lax.dot_general(
                gh, pv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpx = jax.lax.dot_general(
                gh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c = jnp.sum(dpp * pp, axis=-1, keepdims=True) + jnp.sum(
                dpx * px, axis=-1, keepdims=True)
            dlp = (pp * (dpp - c)).astype(x.dtype)
            dlx = (px * (dpx - c)).astype(x.dtype)
            dq = (jax.lax.dot_general(
                dlp, pk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                dlx, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )) * scale
            dk = jax.lax.dot_general(
                dlx, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dv = jax.lax.dot_general(
                px.astype(x.dtype), gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpk_h = jax.lax.dot_general(
                dlp, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dpv_h = jax.lax.dot_general(
                pp.astype(x.dtype), gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[b, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, d + h * hd:d + (h + 1) * hd] = dk.astype(
                dqkv_ref.dtype)
            dqkv_ref[b, :, 2 * d + h * hd:2 * d + (h + 1) * hd] = dv.astype(
                dqkv_ref.dtype)
            dpk_ref[b, :, h * hd:(h + 1) * hd] = dpk_h.astype(dpk_ref.dtype)
            dpv_ref[b, :, h * hd:(h + 1) * hd] = dpv_h.astype(dpv_ref.dtype)


def _pqkv_pallas(qkv, pk, pv, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    plen = pk.shape[1]
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, (s * (d3 + d) + 2 * plen * d) * it + 2 * s * (s + plen) * 4)
    return pl.pallas_call(
        functools.partial(_pqkv_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * s * (s + plen) * (d // heads),
            bytes_accessed=b * (s * 4 * d + 2 * plen * d) * 2,
            transcendentals=b * heads * s * (s + plen),
        ),
    )(qkv, pk, pv)


def _pqkv_bwd_pallas(qkv, pk, pv, g, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    plen = pk.shape[1]
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, (s * (2 * d3 + d) + 4 * plen * d) * it + 2 * s * (s + plen) * 4)
    return pl.pallas_call(
        functools.partial(_pqkv_bwd_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, plen, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d3), qkv.dtype),
            jax.ShapeDtypeStruct((b, plen, d), pk.dtype),
            jax.ShapeDtypeStruct((b, plen, d), pv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * s * (s + plen) * (d // heads),
            bytes_accessed=b * (2 * s * d3 + s * d + 4 * plen * d) * 2,
            transcendentals=b * heads * s * (s + plen),
        ),
    )(qkv, pk, pv, g)


def _pqkv_xla(qkv, pk, pv, scale, heads):
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = jnp.concatenate([pk, qkv[..., d:2 * d]], axis=1).reshape(
        b, -1, heads, hd)
    v = jnp.concatenate([pv, qkv[..., 2 * d:]], axis=1).reshape(
        b, -1, heads, hd)
    return _xla_attention_bshd(q, k, v, scale).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _prefix_attention_core(qkv, pk, pv, scale, heads):
    """Prefix-KV self-attention off the packed qkv tensor:
    ``(B,S,3D), (B,P,D), (B,P,D) -> (B,S,D)``.

    Same design as :func:`fused_qkv_attention`, plus the prompt K/V concat
    done per head in VMEM — the concatenated (B, P+S, ...) K/V tensors that
    XLA materializes (reference prefix concat: transformer.py:175-180)
    never exist in HBM. Pallas on TPU, XLA elsewhere; flash-style backward
    emits dqkv packed plus dpk/dpv for the (trainable) prompts."""
    if _on_tpu():
        return _pqkv_pallas(qkv, pk, pv, scale, heads)
    return _pqkv_xla(qkv, pk, pv, scale, heads)


def _pqkv_fwd(qkv, pk, pv, scale, heads):
    return _prefix_attention_core(qkv, pk, pv, scale, heads), (qkv, pk, pv)


def _pqkv_bwd(scale, heads, res, g):
    qkv, pk, pv = res
    if _on_tpu():
        return _pqkv_bwd_pallas(qkv, pk, pv, g, scale, heads)
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    plen = pk.shape[1]
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = jnp.concatenate([pk, qkv[..., d:2 * d]], axis=1).reshape(
        b, -1, heads, hd)
    v = jnp.concatenate([pv, qkv[..., 2 * d:]], axis=1).reshape(
        b, -1, heads, hd)
    go = g.reshape(b, s, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = go.astype(jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    dvf = jnp.einsum("bhqk,bqhd->bkhd", p, g32)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", dl, k.astype(jnp.float32))
          * scale).astype(qkv.dtype)
    dkf = (jnp.einsum("bhqk,bqhd->bkhd", dl, q.astype(jnp.float32)) * scale)
    dqkv = jnp.concatenate([
        dq.reshape(b, s, d),
        dkf[:, plen:].astype(qkv.dtype).reshape(b, s, d),
        dvf[:, plen:].astype(qkv.dtype).reshape(b, s, d),
    ], axis=-1)
    dpk = dkf[:, :plen].astype(pk.dtype).reshape(b, plen, d)
    dpv = dvf[:, :plen].astype(pv.dtype).reshape(b, plen, d)
    return (dqkv, dpk, dpv)


_prefix_attention_core.defvjp(_pqkv_fwd, _pqkv_bwd)


def fused_prefix_attention(qkv, pk, pv, scale, heads):
    """Public entry: see fused_qkv_attention; pk/pv are per-image prompts so
    they shard along batch with the qkv tensor."""
    mesh = _shard_mesh()
    if mesh is None:
        return _prefix_attention_core(qkv, pk, pv, scale, heads)
    if qkv.shape[0] % mesh.shape["data"] != 0:
        return _pqkv_xla(qkv, pk, pv, scale, heads)
    return _shard_batchwise(
        lambda x, a, b: _prefix_attention_core(x, a, b, scale, heads), 3
    )(qkv, pk, pv)


# ------------------------------------------------------- fused qkv + mask


def _mqkv_kernel(qkv_ref, mask_ref, o_ref, *, scale, heads, bt):
    """Additive-mask self-attention (CLIP text tower causal mask): the mask
    tile is added to the VMEM-resident scores — the (B, H, S, S) masked
    score tensor never exists in HBM."""
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    mask = mask_ref[...]  # (S, S) f32 additive
    for b in range(bt):
        x = qkv_ref[b]
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _mqkv_bwd_kernel(qkv_ref, mask_ref, g_ref, dqkv_ref, *, scale, heads, bt):
    d = qkv_ref.shape[2] // 3
    hd = d // heads
    mask = mask_ref[...]
    for b in range(bt):
        x = qkv_ref[b]
        go = g_ref[b]
        for h in range(heads):
            q = x[:, h * hd:(h + 1) * hd]
            k = x[:, d + h * hd:d + (h + 1) * hd]
            v = x[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
            gh = go[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = p.astype(x.dtype)
            dp = jax.lax.dot_general(
                gh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(
                pb, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dl = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
                x.dtype)
            dq = jax.lax.dot_general(
                dl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                dl, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[b, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, d + h * hd:d + (h + 1) * hd] = dk.astype(
                dqkv_ref.dtype)
            dqkv_ref[b, :, 2 * d + h * hd:2 * d + (h + 1) * hd] = dv.astype(
                dqkv_ref.dtype)


def _mqkv_pallas(qkv, mask, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, s * (d3 + d) * it + 3 * s * s * 4)
    return pl.pallas_call(
        functools.partial(_mqkv_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * s * s * (d // heads),
            bytes_accessed=b * s * 4 * d * 2 + s * s * 4,
            transcendentals=b * heads * s * s,
        ),
    )(qkv, mask)


def _mqkv_bwd_pallas(qkv, mask, g, scale, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d3 = qkv.shape
    d = d3 // 3
    it = qkv.dtype.itemsize
    bt = _batch_tile(b, s * (2 * d3 + d) * it + 3 * s * s * 4)
    return pl.pallas_call(
        functools.partial(_mqkv_bwd_kernel, scale=scale, heads=heads, bt=bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, s), lambda i: (0, 0)),
            pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, s, d3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * s * s * (d // heads),
            bytes_accessed=2 * b * s * d3 * 2 + b * s * d * 2 + s * s * 4,
            transcendentals=b * heads * s * s,
        ),
    )(qkv, mask, g)


def _mqkv_xla(qkv, mask, scale, heads):
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = qkv[..., d:2 * d].reshape(b, s, heads, hd)
    v = qkv[..., 2 * d:].reshape(b, s, heads, hd)
    sarr = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale + mask[None, None]
    p = jax.nn.softmax(sarr, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _masked_qkv_attention_core(qkv, mask, scale, heads):
    """Additive-mask self-attention off the packed qkv tensor:
    ``(B,S,3D), (S,S) -> (B,S,D)`` — the CLIP text tower's causal path
    (reference clip.py build_attention_mask). Pallas on TPU, XLA elsewhere;
    the mask is a shared static tile (no gradient)."""
    if _on_tpu():
        return _mqkv_pallas(qkv, mask.astype(jnp.float32), scale, heads)
    return _mqkv_xla(qkv, mask, scale, heads)


def _mqkv_fwd(qkv, mask, scale, heads):
    return _masked_qkv_attention_core(qkv, mask, scale, heads), (qkv, mask)


def _mqkv_bwd(scale, heads, res, g):
    qkv, mask = res
    if _on_tpu():
        return (_mqkv_bwd_pallas(qkv, mask.astype(jnp.float32), g, scale,
                                 heads), None)
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q = qkv[..., :d].reshape(b, s, heads, hd)
    k = qkv[..., d:2 * d].reshape(b, s, heads, hd)
    v = qkv[..., 2 * d:].reshape(b, s, heads, hd)
    go = g.reshape(b, s, heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale + mask[None, None]
    p = jax.nn.softmax(logits, axis=-1)
    g32 = go.astype(jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32).astype(v.dtype)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", dl, k.astype(jnp.float32))
          * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bqhd->bkhd", dl, q.astype(jnp.float32))
          * scale).astype(k.dtype)
    dqkv = jnp.concatenate(
        [dq.reshape(b, s, d), dk.reshape(b, s, d), dv.reshape(b, s, d)],
        axis=-1,
    )
    return (dqkv, None)


_masked_qkv_attention_core.defvjp(_mqkv_fwd, _mqkv_bwd)


def fused_masked_qkv_attention(qkv, mask, scale, heads):
    """Public entry: see fused_qkv_attention; the (S, S) additive mask is
    replicated across the mesh."""
    mesh = _shard_mesh()
    if mesh is None:
        return _masked_qkv_attention_core(qkv, mask, scale, heads)
    if qkv.shape[0] % mesh.shape["data"] != 0:
        return _mqkv_xla(qkv, mask, scale, heads)
    return _shard_batchwise(
        lambda x, mk: _masked_qkv_attention_core(x, mk, scale, heads),
        1, n_replicated_args=1,
    )(qkv, mask)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    import jax.experimental.pallas as pl  # noqa: F401

    q = q_ref[0].astype(jnp.float32)  # (Sq, D)
    k = k_ref[0].astype(jnp.float32)  # (Skv, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Sq, Skv)
    # mask out padded KV columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    # pad sequence dims to sublane multiples (f32 tile = (8, 128))
    qf, _ = _pad_to(qf, 1, 8)
    kf, kv_pad = _pad_to(kf, 1, 8)
    vf, _ = _pad_to(vf, 1, 8)
    sq_p, skv_p = qf.shape[1], kf.shape[1]

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, kv_len=skv),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * skv * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
    )(qf, kf, vf)
    return out[:, :sq, :].reshape(b, h, sq, d)


def attention(q, k, v, scale: Optional[float] = None):
    """softmax(q k^T * scale) v over (B, H, S, D) tensors — the framework
    entry point. ``k``/``v`` may be longer than ``q`` (prompt prefixes).

    Backward: XLA's native autodiff by default — it saves the (bf16)
    probability tensor from forward and fuses the backward chain better than
    a rematerializing custom VJP (measured on v5e, full L2P step: 670 vs
    626 img/s). ``LIBCONTINUAL_ATTN_VJP=remat`` selects the flash-style
    recompute VJP instead (lower peak memory: nothing S x S is saved), for
    memory-constrained regimes."""
    import os

    if os.environ.get("LIBCONTINUAL_ATTN_VJP") == "remat":
        return fused_attention(q, k, v, scale)
    return _attention_impl(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: Optional[float] = None):
    """softmax(q k^T * scale) v with a rematerializing custom VJP."""
    return _attention_impl(q, k, v, scale)


def _attention_impl(q, k, v, scale):
    scale = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    # Measured on v5e at ViT-B shapes (B=128, H=12, S=197+20, D=64): XLA's
    # batched attention hits ~15 TFLOP/s vs ~9 for the per-(b,h) Pallas
    # kernel — head_dim 64 wastes half the MXU lanes in a hand-tiled kernel,
    # while XLA folds B*H into the batch dim of one big contraction. Default
    # to XLA; the Pallas kernel stays selectable for long-sequence regimes.
    import os

    if _on_tpu() and os.environ.get("LIBCONTINUAL_ATTN") == "pallas":
        return _pallas_attention(q, k, v, scale)
    return _xla_attention(q, k, v, scale)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _xla_attention_bshd(q, k, v, scale):
    """Attention with q/k/v in (B, S, H, D) layout — no (B,H,S,D) transpose.

    Profiled on v5e (ViT-B shapes, B=128, S=222): the classic
    ``reshape(b,s,3,h,d).transpose`` layout forces XLA to materialize
    ping-pong layout copies of the qkv tensor (~0.5 ms each, ~32 ms/step
    across the L2P train step — 17% of the step). Feeding the dots straight
    from the (b,s,h,d) view lets XLA fold the head split into the einsum
    operand layouts: measured 5.35 -> 3.66 ms/layer fwd (9.16 -> 6.92
    fwd+bwd) for the qkv->attention->proj block, bit-identical output.
    """
    import os

    pet = (
        jnp.bfloat16
        if (q.dtype == jnp.bfloat16
            and os.environ.get("LIBCONTINUAL_ATTN_SCORES") == "bf16")
        else jnp.float32
    )
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=pet)
    p = jax.nn.softmax(s.astype(jnp.float32) * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def tp_model_size() -> int:
    """Size of the active mesh's 'model' axis (1 when no mesh/TP)."""
    m = _ACTIVE_MESH
    if m is None or "model" not in m.axis_names:
        return 1
    return int(m.shape["model"])


def _tp_head_constraint(*tensors):
    """Megatron-style attention TP: constrain (B, S, H, hd) tensors to shard
    the HEAD axis over the mesh's 'model' axis so XLA partitions the score /
    softmax / value einsums per head group (each rank computes its heads;
    the only collective is the psum after the row-sharded out-projection,
    parallel/tp.py). No-op when heads don't divide or TP is off."""
    tp = tp_model_size()
    if tp <= 1 or any(t.shape[2] % tp for t in tensors):
        return tensors
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(_ACTIVE_MESH, P(None, None, "model", None))
    return tuple(jax.lax.with_sharding_constraint(t, sh) for t in tensors)


def attention_bshd(q, k, v, scale: Optional[float] = None):
    """softmax(q k^T * scale) v over (B, S, H, D) tensors (sequence-major
    layout — the framework's hot path; see ``_xla_attention_bshd``).
    ``k``/``v`` may be longer than ``q`` along S (prompt prefixes).

    ``LIBCONTINUAL_ATTN_VJP=remat`` selects a flash-style recompute VJP
    (nothing S x S saved) for memory-constrained regimes."""
    import os

    scale = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    q, k, v = _tp_head_constraint(q, k, v)
    if os.environ.get("LIBCONTINUAL_ATTN_VJP") == "remat":
        o = fused_attention_bshd(q, k, v, scale)
    else:
        o = _xla_attention_bshd(q, k, v, scale)
    (o,) = _tp_head_constraint(o)
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_bshd(q, k, v, scale):
    return _xla_attention_bshd(q, k, v, scale)


def _fwd_bshd(q, k, v, scale):
    return _xla_attention_bshd(q, k, v, scale), (q, k, v)


def _bwd_bshd(scale, res, g):
    q, k, v = res
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32).astype(v.dtype)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", dlogits, k.astype(jnp.float32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bqhd->bkhd", dlogits, q.astype(jnp.float32)) * scale).astype(k.dtype)
    return dq, dk, dv


fused_attention_bshd.defvjp(_fwd_bshd, _bwd_bshd)


def _fwd(q, k, v, scale):
    o = _attention_impl(q, k, v, scale)
    return o, (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    s = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    # recompute probabilities (flash-style rematerialization)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * s
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32).astype(v.dtype)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bhkd->bhqd", dlogits, k.astype(jnp.float32)) * s).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bhqd->bhkd", dlogits, q.astype(jnp.float32)) * s).astype(k.dtype)
    return dq, dk, dv


fused_attention.defvjp(_fwd, _bwd)
