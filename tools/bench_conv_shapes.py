#!/usr/bin/env python
"""Per-shape conv microbenchmark at the resnet18/resnet20 CIFAR geometries
(the conv-bound workloads: OCM joint step, iCaRL). Measures XLA's
fwd and fwd+bwd time and achieved TFLOP/s per conv shape to locate the
lane-padding losses before building a Pallas conv kernel. One JSON line
per shape.
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
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from libcontinual_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = args.batch
    # (label, H=W, Cin, Cout, stride)
    SHAPES = [
        ("stem 3->64 s1 32x32", 32, 3, 64, 1),
        ("l1 64->64 s1 32x32", 32, 64, 64, 1),
        ("l2 64->128 s2 32x32", 32, 64, 128, 2),
        ("l2 128->128 s1 16x16", 16, 128, 128, 1),
        ("l3 128->256 s2 16x16", 16, 128, 256, 2),
        ("l3 256->256 s1 8x8", 8, 256, 256, 1),
        ("l4 256->512 s2 8x8", 8, 256, 512, 2),
        ("l4 512->512 s1 4x4", 4, 512, 512, 1),
        ("r20 16->16 s1 32x32", 32, 16, 16, 1),
        ("r20 32->32 s1 16x16", 16, 32, 32, 1),
        ("r20 64->64 s1 8x8", 8, 64, 64, 1),
    ]
    rng = np.random.RandomState(0)

    def timed(jl, fn_args, iters):
        float(jl(*fn_args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jl(*fn_args))
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    for label, hw, cin, cout, stride in SHAPES:
        x = jnp.asarray(rng.randn(B, hw, hw, cin) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.bfloat16)

        def conv(x, w):
            # no preferred_element_type: an f32 output makes the bwd
            # transpose-conv mix f32 cotangents with bf16 weights (TypeError);
            # XLA still accumulates bf16 convs in f32 on the MXU
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def loop_f(x, w):
            def body(c, _):
                o = conv(x + (0 * c).astype(x.dtype), w)
                return c + jnp.mean(o).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)[0]

        def loop_fb(x, w):
            def body(c, _):
                g = jax.grad(
                    lambda t: jnp.sum(conv(t, w) ** 2).astype(jnp.float32)
                )(x + (0 * c).astype(x.dtype))
                return c + jnp.mean(g).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)[0]

        ms_f = timed(jax.jit(loop_f), (x, w), args.iters)
        ms_fb = timed(jax.jit(loop_fb), (x, w), args.iters)
        out_hw = hw // stride
        flops = 2 * B * out_hw * out_hw * 9 * cin * cout
        print(json.dumps({
            "shape": label, "ms_fwd": round(ms_f, 4),
            "ms_fwd_bwd": round(ms_fb, 4),
            "tflops_fwd": round(flops / ms_f / 1e9, 1),
            "tflops_fwd_bwd": round(3 * flops / ms_fb / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
