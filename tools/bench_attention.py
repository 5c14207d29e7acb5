#!/usr/bin/env python
"""Attention kernel shoot-out at ViT-B/L2P shapes (B=128, H=12, S=197+20,
D=64, bf16) on the real TPU.

Times each candidate with an in-graph lax.scan (amortizes the ~35 ms axon
dispatch) and a scalar fetch (block_until_ready does not sync through the
axon tunnel). Prints ms/call and TFLOP/s per candidate.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timed_print, timed_chain  # noqa: E402


def timeit(fn, args, iters=30):
    return timed_chain(fn, args, iters=iters)


def xla_attn(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, g, subtract_max):
    for i in range(g):
        q = q_ref[i]  # (Sq_p, D) bf16 — matmul runs at bf16 MXU rate
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
        if subtract_max:
            s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[i] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_fast(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, g, bf16_sm):
    """No max-subtract, exp2 with the scale folded in, approx reciprocal."""
    log2e = 1.4426950408889634
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * log2e)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
        if bf16_sm:
            e = jnp.exp2(s.astype(jnp.bfloat16))
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            p = (e.astype(jnp.float32) * pl.reciprocal(denom, approx=True)).astype(
                q_ref.dtype
            )
        else:
            e = jnp.exp2(s)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = (e * pl.reciprocal(denom, approx=True)).astype(q_ref.dtype)
        o_ref[i] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_fast(q, k, v, scale, g=8, bf16_sm=False, smult=16):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = pad_to(q.reshape(b * h, sq, d), 1, smult)
    kf = pad_to(k.reshape(b * h, skv, d), 1, smult)
    vf = pad_to(v.reshape(b * h, skv, d), 1, smult)
    sq_p, skv_p = qf.shape[1], kf.shape[1]
    bh = b * h
    out = pl.pallas_call(
        functools.partial(
            _kernel_fast, scale=scale, kv_len=skv, g=g, bf16_sm=bf16_sm
        ),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * sq_p * skv_p * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=bh * sq_p * skv_p,
        ),
    )(qf, kf, vf)
    return out[:, :sq, :].reshape(b, h, sq, d)


def _kernel_mmonly(q_ref, k_ref, v_ref, o_ref, *, g):
    """Diagnostic: the two attention matmuls with NO softmax — isolates
    matmul/layout cost from VPU cost."""
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[i] = jnp.dot(
            s.astype(q_ref.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def pallas_mmonly(q, k, v, scale, g=8, smult=16):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = pad_to(q.reshape(b * h, sq, d), 1, smult)
    kf = pad_to(k.reshape(b * h, skv, d), 1, smult)
    vf = pad_to(v.reshape(b * h, skv, d), 1, smult)
    sq_p, skv_p = qf.shape[1], kf.shape[1]
    bh = b * h
    out = pl.pallas_call(
        functools.partial(_kernel_mmonly, g=g),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
    )(qf, kf, vf)
    return out[:, :sq, :].reshape(b, h, sq, d)


def _kernel_qblock(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    """One (b,h) per program but full-width ops: grid iterates (bh,) with
    2D refs — lets Mosaic pick layouts without the leading block dim."""
    log2e = 1.4426950408889634
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * log2e)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -1e30)
    e = jnp.exp2(s)
    p = (e * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=True)).astype(
        q_ref.dtype
    )
    o_ref[:] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_2d(q, k, v, scale, smult=16):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = pad_to(q.reshape(b * h, sq, d), 1, smult)
    kf = pad_to(k.reshape(b * h, skv, d), 1, smult)
    vf = pad_to(v.reshape(b * h, skv, d), 1, smult)
    sq_p, skv_p = qf.shape[1], kf.shape[1]
    bh = b * h
    out = pl.pallas_call(
        functools.partial(_kernel_qblock, scale=scale, kv_len=skv),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((None, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
    )(qf, kf, vf)
    return out[:, :sq, :].reshape(b, h, sq, d)


def xla_manual(q, k, v, scale, nomax=False, bf16_scores=False):
    pet = jnp.bfloat16 if bf16_scores else jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=pet)
    s = s.astype(jnp.float32) * scale
    if not nomax:
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def pad_to(x, axis, mult):
    # single copy lives in ops/attention.py (returns (padded, pad))
    from libcontinual_tpu.ops.attention import _pad_to

    return _pad_to(x, axis, mult)[0]


def pallas_v2(q, k, v, scale, g=8, subtract_max=True, smult=16):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = pad_to(q.reshape(b * h, sq, d), 1, smult)
    kf = pad_to(k.reshape(b * h, skv, d), 1, smult)
    vf = pad_to(v.reshape(b * h, skv, d), 1, smult)
    sq_p, skv_p = qf.shape[1], kf.shape[1]
    bh = b * h
    assert bh % g == 0
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, scale=scale, kv_len=skv, g=g, subtract_max=subtract_max
        ),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, skv_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, sq_p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * sq_p * skv_p * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=bh * sq_p * skv_p,
        ),
    )(qf, kf, vf)
    return out[:, :sq, :].reshape(b, h, sq, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--h", type=int, default=12)
    ap.add_argument("--sq", type=int, default=217)
    ap.add_argument("--skv", type=int, default=217)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    shp_q = (args.b, args.h, args.sq, args.d)
    shp_kv = (args.b, args.h, args.skv, args.d)
    q = jnp.asarray(rng.randn(*shp_q), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shp_kv), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shp_kv), jnp.bfloat16)
    scale = 1.0 / np.sqrt(args.d)
    flops = 2 * 2 * args.b * args.h * args.sq * args.skv * args.d

    cands = {
        "xla": lambda q, k, v: xla_attn(q, k, v, scale),
        "pallas_g8": lambda q, k, v: pallas_v2(q, k, v, scale, g=8),
        "pallas_g16": lambda q, k, v: pallas_v2(q, k, v, scale, g=16),
        "pallas_g4": lambda q, k, v: pallas_v2(q, k, v, scale, g=4),
        "pallas_g8_nomax": lambda q, k, v: pallas_v2(
            q, k, v, scale, g=8, subtract_max=False
        ),
        "pallas_g8_fast": lambda q, k, v: pallas_fast(q, k, v, scale, g=8),
        "pallas_g8_bf16sm": lambda q, k, v: pallas_fast(
            q, k, v, scale, g=8, bf16_sm=True
        ),
        "xla_nomax": lambda q, k, v: xla_manual(q, k, v, scale, nomax=True),
        "xla_bf16scores": lambda q, k, v: xla_manual(
            q, k, v, scale, nomax=True, bf16_scores=True
        ),
        "pallas_mmonly_g8": lambda q, k, v: pallas_mmonly(q, k, v, scale, g=8),
        "pallas_2d": lambda q, k, v: pallas_2d(q, k, v, scale),
    }
    ref = np.asarray(xla_attn(q, k, v, scale), np.float32)
    for name, fn in cands.items():
        if args.only and args.only not in name:
            continue
        try:
            if "mmonly" in name:
                err = float("nan")  # diagnostic only, not attention math
            else:
                got = np.asarray(fn(q, k, v), np.float32)
                err = float(np.max(np.abs(got - ref)))
            dt = timeit(fn, (q, k, v), iters=args.iters)
            print(
                f"{name:18s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.2f} TF/s  maxerr {err:.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
