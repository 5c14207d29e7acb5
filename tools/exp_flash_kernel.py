#!/usr/bin/env python
"""Prototype: short-sequence fused attention kernel for ViT shapes.

Finding so far: at B=128,H=12,S~220,D=64 every XLA attention op is
HBM-bandwidth-bound (~310 GB/s effective on this chip) — the (B,H,S,S)
score tensor round-trip dominates. A fused kernel's floor is the q/k/v/o
traffic (~87MB -> ~0.3ms/layer).

V2: no external padding (pallas takes full-dim unaligned blocks), grid over
(B*H/G) slabs of G heads, whole (S,S) f32 score tile in VMEM, parallel grid.
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from libcontinual_tpu.ops.attention import _xla_attention  # noqa: E402


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timed_print, timed_chain  # noqa: E402


def timed(name, fn, x0, iters=20):
    return timed_print(name, fn, (x0,), iters=iters)


def fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, g):
    for i in range(g):
        q = q_ref[i]  # (S, D) bf16
        k = k_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[i] = jax.lax.dot_general(
            p, v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def make_flash(G=8):
    def flash(q, k, v, scale):
        b, h, s, d = q.shape
        bh = b * h
        qf = q.reshape(bh, s, d)
        kf = k.reshape(bh, s, d)
        vf = v.reshape(bh, s, d)
        out = pl.pallas_call(
            functools.partial(fwd_kernel, scale=scale, g=G),
            grid=(bh // G,),
            in_specs=[
                pl.BlockSpec((G, s, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, s, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, s, d), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((G, s, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * bh * s * s * d,
                bytes_accessed=4 * bh * s * d * 2,
                transcendentals=bh * s * s,
            ),
        )(qf, kf, vf)
        return out.reshape(b, h, s, d)

    return flash


def main():
    B, H, D = 128, 12, 64
    for S in (197, 222):
        scale = 1.0 / np.sqrt(D)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        print(f"--- S={S} ---")
        timed("xla fwd", lambda qq: _xla_attention(qq, k, v, scale), q)
        o1 = _xla_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), scale)
        for G in (2, 4, 8, 12, 16):
            fl = make_flash(G)
            o2 = fl(q, k, v, scale)
            err = float(jnp.max(jnp.abs(o1 - o2.astype(jnp.float32))))
            timed(f"pallas slab G={G} (err {err:.4f})",
                  lambda qq, fl=fl: fl(qq, k, v, scale), q)


if __name__ == "__main__":
    main()
