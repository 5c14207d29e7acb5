#!/usr/bin/env python
"""Quantify the tensor-parallel tax on one chip (VERDICT r3 item 4).

Under ``model>1`` this framework (a) keeps the packed-qkv projection
replicated — its [q|k|v] column layout is not head-contiguous, so a column
shard would mis-align with the head split (parallel/tp.py) — and (b) drops
the fused Pallas attention kernels for the GSPMD XLA path
(ops/attention.py:_shard_mesh). Neither cost had been measured. This tool
times the transformer-block hot path (attention: qkv proj + core + out
proj; MLP: fc1/fc2) forward+backward at ViT-B/L2P geometry on the single
real chip, for three per-rank configurations:

  A. pure-DP rank (the flagship layout): full block, fused Pallas kernel;
  B. TP=tp rank as shipped: FULL qkv matmul (replicated), XLA attention on
     H/tp heads, row-sharded out-proj + column/row-sharded MLP (per-rank
     shapes, collectives excluded — one chip);
  C. TP=tp rank with a hypothetical head-contiguous column-sharded qkv:
     per-rank qkv matmul of D x 3D/tp — what the repacking would buy.

The per-image TP tax is B's per-rank time vs A/tp (perfect scaling);
C isolates the replicated-qkv share of that tax. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=197)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--tp", type=int, default=2)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from libcontinual_tpu.utils import jaxcache

    jaxcache.enable()
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    A = importlib.import_module("libcontinual_tpu.ops.attention")

    B, S, D, H, tp = args.batch, args.seq, args.dim, args.heads, args.tp
    hd = D // H
    scale = 1.0 / np.sqrt(hd)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, S, D) * 0.02, dt)
    Wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, dt)
    Wproj = jnp.asarray(rng.randn(D, D) * 0.02, dt)
    W1 = jnp.asarray(rng.randn(D, 4 * D) * 0.02, dt)
    W2 = jnp.asarray(rng.randn(4 * D, D) * 0.02, dt)

    def mlp(h, w1, w2):
        return jax.nn.gelu(h @ w1) @ w2

    def block_dp(x, wqkv, wproj, w1, w2):
        qkv = x @ wqkv
        o = A._qkv_attention_core(qkv, scale, H)
        return mlp(o @ wproj + x, w1, w2)

    def block_tp_shipped(x, wqkv, wproj, w1, w2):
        # per-rank compute at model=tp: FULL qkv (replicated weight), XLA
        # attention on the local H/tp head group, row-sharded out-proj
        # (input slice), column/row-sharded MLP
        qkv = x @ wqkv  # replicated: full 3D^2 FLOPs on every rank
        h_loc = H // tp
        q = qkv[..., : D // tp].reshape(B, S, h_loc, hd)
        k = qkv[..., D: D + D // tp].reshape(B, S, h_loc, hd)
        v = qkv[..., 2 * D: 2 * D + D // tp].reshape(B, S, h_loc, hd)
        o = A._xla_attention_bshd(q, k, v, scale).reshape(B, S, D // tp)
        y = o @ wproj[: D // tp] + x  # (+psum on real mesh)
        return mlp(y, w1[:, : 4 * D // tp], w2[: 4 * D // tp])

    def block_tp_packed(x, wqkv_loc, wproj, w1, w2):
        # hypothetical head-contiguous packing: qkv column-shards, each rank
        # computes only its head group's q/k/v (D x 3D/tp matmul)
        qkv = x @ wqkv_loc  # (B, S, 3D/tp), local heads only
        h_loc = H // tp
        d_loc = D // tp
        q = qkv[..., :d_loc].reshape(B, S, h_loc, hd)
        k = qkv[..., d_loc:2 * d_loc].reshape(B, S, h_loc, hd)
        v = qkv[..., 2 * d_loc:].reshape(B, S, h_loc, hd)
        o = A._xla_attention_bshd(q, k, v, scale).reshape(B, S, d_loc)
        y = o @ wproj[:d_loc] + x
        return mlp(y, w1[:, : 4 * D // tp], w2[: 4 * D // tp])

    def timed(fn, fn_args, iters):
        def loop(*a):
            def body(c, _):
                g = jax.grad(
                    lambda t: jnp.sum(fn(t, *a[1:]) ** 2).astype(jnp.float32)
                )(a[0] + (0 * c).astype(a[0].dtype))
                return c + jnp.mean(g).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

        jl = jax.jit(loop)
        float(jl(*fn_args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jl(*fn_args))
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    ms_dp = timed(block_dp, (x, Wqkv, Wproj, W1, W2), args.iters)
    ms_tp = timed(block_tp_shipped, (x, Wqkv, Wproj, W1, W2), args.iters)
    Wqkv_loc = jnp.concatenate(
        [Wqkv[:, : D // tp], Wqkv[:, D: D + D // tp],
         Wqkv[:, 2 * D: 2 * D + D // tp]], axis=1)
    ms_tpp = timed(block_tp_packed, (x, Wqkv_loc, Wproj, W1, W2), args.iters)

    ideal = ms_dp / tp
    out = {
        "geometry": {"B": B, "S": S, "D": D, "H": H, "tp": tp},
        "ms_dp_rank_fused": round(ms_dp, 3),
        "ms_tp_rank_shipped": round(ms_tp, 3),
        "ms_tp_rank_packed_qkv": round(ms_tpp, 3),
        "ideal_ms_per_rank": round(ideal, 3),
        "tp_tax_shipped": round(ms_tp / ideal, 3),
        "tp_tax_packed": round(ms_tpp / ideal, 3),
        "replicated_qkv_share_ms": round(ms_tp - ms_tpp, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
