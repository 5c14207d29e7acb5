#!/usr/bin/env python
"""Compare XLA attention vs jax.experimental.pallas.ops.tpu.flash_attention
at the bench.py L2P shapes (B=128, H=12, S in {197, 222}, D=64).

Padding scheme for flash: S pads to a multiple of 128 (here 256); padded KV
columns are masked via segment_ids (kv_seg=0 for pad), padded Q rows compute
garbage that is sliced off.

Timing: scan-chained with a runtime-zero perturbation (axon tunnel: fetch a
scalar to sync — block_until_ready does not).
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from libcontinual_tpu.ops.attention import _xla_attention  # noqa: E402


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timed_print, timed_chain  # noqa: E402


def timed(name, fn, x0, iters=20):
    return timed_print(name, fn, (x0,), iters=iters)


def main():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, H, D = 128, 12, 64
    for S in (197, 222):
        SP = ((S + 127) // 128) * 128
        scale = 1.0 / np.sqrt(D)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

        kv_seg = jnp.asarray(
            (np.arange(SP) < S).astype(np.float32)[None].repeat(B, 0), jnp.float32
        )
        q_seg = jnp.ones((B, SP), jnp.float32)
        seg = fa.SegmentIds(q=q_seg, kv=kv_seg)

        def flash(qq, kk=k, vv=v):
            pad = [(0, 0), (0, 0), (0, SP - S), (0, 0)]
            qp, kp, vp = (jnp.pad(t, pad) for t in (qq, kk, vv))
            o = fa.flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale)
            return o[:, :, :S, :]

        def xla(qq):
            return _xla_attention(qq, k, v, scale)

        print(f"--- S={S} (pad {SP}) ---")
        timed("xla fwd", xla, q)
        timed("flash fwd", flash, q)

        def grad_all(f):
            def g(qq):
                def loss(args):
                    return jnp.sum(f(*args).astype(jnp.float32))

                gq, gk, gv = jax.grad(loss)((qq, k, v))
                return gq + gk + gv

            return g

        timed("xla fwd+bwd(q,k,v)", grad_all(lambda qq, kk, vv: _xla_attention(qq, kk, vv, scale)), q)
        timed("flash fwd+bwd(q,k,v)", grad_all(lambda qq, kk, vv: flash(qq, kk, vv)), q)

        # correctness
        o1 = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), scale)
        o2 = flash(q)
        err = jnp.max(jnp.abs(o1 - o2.astype(jnp.float32)))
        print(f"max abs err flash vs f32 ref: {float(err):.4f}")


if __name__ == "__main__":
    main()
