#!/usr/bin/env python
"""Per-shape conv throughput probe for the conv-bound workload floor.

BASELINE.md records resnet rehearsal workloads at 20-28 TFLOP/s vs the
chip's measured 128 TFLOP/s matmul ceiling. Before writing any Pallas conv
kernel, this tool answers WHERE the gap is:

  1. raw XLA conv TFLOP/s for every distinct (C_in, C_out, H, W, stride)
     in the resnet18-CIFAR stack, bf16, batch 128;
  2. the same conv with the BN+ReLU epilogue (does XLA fuse it for free?);
  3. im2col matmul equivalents — the implicit-GEMM ceiling;
  4. the full backbone fwd / fwd+bwd — end-to-end attribution.

Timing pitfalls this tool had to learn (axon tunnel, small ops):
  * one dispatch costs ~26 ms through the tunnel — a 50-iteration scan of
    a ~40 us op measures the TUNNEL (a uniform ~520 us/iter floor), so the
    scan length must put device time well above 26 ms;
  * the scan body MUST depend on the carry — a loop-invariant body is
    hoisted by XLA and the "scan" times one iteration (first attempt
    reported 768 TF/s, above hardware peak). The carry is folded into the
    small operand (weights), which adds one cheap elementwise op per
    iteration.

Usage: python tools/profile_conv.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_body(body, *args, n=2000):
    """body(c, *args) -> array; returns seconds/iteration. ``c`` is the f32
    scan carry — fold it into a small operand to defeat loop hoisting."""

    @jax.jit
    def run(*a):
        def step(c, _):
            out = body(c, *a)
            return jnp.sum(out).astype(jnp.float32) * 1e-12, None

        tot, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return tot

    float(run(*args))  # compile + warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        dt = min(dt, time.perf_counter() - t0)
    return dt / n


# resnet18-CIFAR conv shapes: (cin, cout, h_in, w_in, stride, k)
SHAPES = [
    ("stem", 3, 64, 32, 32, 1, 3),
    ("l1", 64, 64, 32, 32, 1, 3),
    ("l2.down", 64, 128, 32, 32, 2, 3),
    ("l2", 128, 128, 16, 16, 1, 3),
    ("l3.down", 128, 256, 16, 16, 2, 3),
    ("l3", 256, 256, 8, 8, 1, 3),
    ("l4.down", 256, 512, 8, 8, 2, 3),
    ("l4", 512, 512, 4, 4, 1, 3),
]


def conv_flops(b, cin, cout, h, w, stride, k):
    ho, wo = h // stride, w // stride
    return 2 * b * ho * wo * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip-raw", action="store_true")
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)
    print(f"platform: {jax.devices()[0].platform} batch {B} dtype bf16")

    if not args.skip_raw:
        print("\n-- raw conv (and +BN+ReLU epilogue) --", flush=True)
        for name, cin, cout, h, w, s, k in SHAPES:
            x = jnp.asarray(rng.randn(B, h, w, cin), jnp.bfloat16)
            kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)
            scale = jnp.asarray(rng.rand(cout), jnp.bfloat16)
            bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.bfloat16)

            def conv(c, x, kern):
                return jax.lax.conv_general_dilated(
                    x, kern + c.astype(kern.dtype), (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)

            def conv_bn_relu(c, x, kern, scale, bias):
                y = conv(c, x, kern)
                return jnp.maximum(y * scale + bias, 0)

            fl = conv_flops(B, cin, cout, h, w, s, k)
            t0 = time_body(conv, x, kern)
            t1 = time_body(conv_bn_relu, x, kern, scale, bias)
            print(f"{name:8s} {cin:3d}->{cout:3d} @{h}x{w}/{s} "
                  f"conv {fl/t0/1e12:6.1f} TF/s ({t0*1e6:7.1f} us) | "
                  f"+bn+relu {fl/t1/1e12:6.1f} TF/s ({t1*1e6:7.1f} us)",
                  flush=True)

        print("\n-- im2col matmul equivalents (M=B*Ho*Wo, K=9*Cin, N=Cout) --",
              flush=True)
        for name, cin, cout, h, w, s, k in SHAPES:
            ho = h // s
            M, K, N = B * ho * ho, k * k * cin, cout
            a = jnp.asarray(rng.randn(M, K) * 0.05, jnp.bfloat16)
            bmat = jnp.asarray(rng.randn(K, N) * 0.05, jnp.bfloat16)

            def mm(c, a, bmat):
                return jnp.dot(a, bmat + c.astype(bmat.dtype),
                               preferred_element_type=jnp.bfloat16)

            fl = 2 * M * K * N
            t = time_body(mm, a, bmat)
            print(f"{name:8s} ({M:6d},{K:4d},{N:3d}) {fl/t/1e12:6.1f} TF/s "
                  f"({t*1e6:7.1f} us)", flush=True)

    # full backbone fwd / train-step attribution
    print("\n-- end-to-end resnet18 --", flush=True)
    from libcontinual_tpu.models import get_backbone

    bb = get_backbone({"backbone": {"name": "resnet18", "kwargs": {}},
                       "dtype": "bfloat16", "dataset": "cifar100"})
    x = jnp.asarray(rng.randn(B, 32, 32, 3), jnp.bfloat16)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def fwd_eval(c, params, bstats, x):
        return bb.apply({"params": params, "batch_stats": bstats},
                        x + c.astype(x.dtype), train=False)["features"]

    def fwd_train(c, params, bstats, x):
        out, _ = bb.apply({"params": params, "batch_stats": bstats},
                          x + c.astype(x.dtype), train=True,
                          mutable=["batch_stats"])
        return out["features"]

    def loss_fn(params, bstats, x):
        out, _ = bb.apply({"params": params, "batch_stats": bstats}, x,
                          train=True, mutable=["batch_stats"])
        return jnp.sum(out["features"].astype(jnp.float32) ** 2)

    def train_like(c, params, bstats, x):
        g = jax.grad(loss_fn)(params, bstats, x + c.astype(x.dtype))
        # fold EVERY grad leaf into the result — returning just one leaf
        # lets XLA dead-code-eliminate the other layers' weight-grad matmuls
        return jnp.stack([jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(g)])

    tot = 0
    mult = {"stem": 1, "l1": 4, "l2.down": 1, "l2": 3, "l3.down": 1,
            "l3": 3, "l4.down": 1, "l4": 3}
    # plus 1x1 downsample shortcut convs (k=1) per transition stage
    for name, cin, cout, h, w, s, k in SHAPES:
        tot += mult[name] * conv_flops(B, cin, cout, h, w, s, k)
    for cin, cout, h, s in ((64, 128, 32, 2), (128, 256, 16, 2),
                            (256, 512, 8, 2)):
        tot += conv_flops(B, cin, cout, h, h, s, 1)

    t = time_body(fwd_eval, params, bstats, x, n=400)
    print(f"fwd eval : {t*1e3:7.2f} ms  {tot/t/1e12:6.1f} TF/s  "
          f"{B/t:8.0f} img/s", flush=True)
    t = time_body(fwd_train, params, bstats, x, n=400)
    print(f"fwd train: {t*1e3:7.2f} ms  {tot/t/1e12:6.1f} TF/s  "
          f"{B/t:8.0f} img/s", flush=True)
    t = time_body(train_like, params, bstats, x, n=400)
    print(f"fwd+bwd  : {t*1e3:7.2f} ms  {3*tot/t/1e12:6.1f} TF/s  "
          f"{B/t:8.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
