#!/usr/bin/env python
"""Measure ops/conv.py (implicit-GEMM Pallas conv) against XLA's conv on
the real chip, per resnet18-CIFAR stage shape, fwd and fwd+bwd.

Context: tools/profile_conv.py (corrected timing) shows XLA's stride-1 3x3
convs already sustain 127-148 TF/s at these shapes — the Pallas kernel is
kept only if it measures at least even. See docs/performance.md for the
verdict this tool produced.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

from profile_conv import SHAPES, conv_flops, time_body
from libcontinual_tpu.ops import conv as C


def main():
    B = 128
    rng = np.random.RandomState(0)
    print(f"platform: {jax.devices()[0].platform} batch {B} bf16")
    print(f"{'shape':24s} {'xla fwd':>10s} {'pallas fwd':>11s} "
          f"{'xla f+b':>10s} {'pallas f+b':>11s}")
    for name, cin, cout, h, w, s, k in SHAPES:
        if s != 1 or cin < 8:
            continue
        x = jnp.asarray(rng.randn(B, h, w, cin), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        fl = conv_flops(B, cin, cout, h, w, 1, 3)

        def xla_f(c, x, kern):
            return C._xla_conv3x3(x, kern + c.astype(kern.dtype))

        def pl_f(c, x, kern):
            k9 = (kern + c.astype(kern.dtype)).reshape(9, cin, cout)
            return C._pallas_conv3x3(x, k9)

        def mk_fb(fwd):
            def fb(c, x, kern):
                def loss(x, kern):
                    return jnp.sum(fwd(c, x, kern).astype(jnp.float32) ** 2)
                dx, dk = jax.grad(loss, (0, 1))(x, kern)
                return jnp.stack([jnp.sum(dx.astype(jnp.float32)),
                                  jnp.sum(dk.astype(jnp.float32))])
            return fb

        def pl_custom(c, x, kern):
            return C.conv3x3(x, kern + c.astype(kern.dtype))

        t_xf = time_body(xla_f, x, kern)
        t_pf = time_body(pl_f, x, kern)
        t_xb = time_body(mk_fb(xla_f), x, kern, n=1000)
        t_pb = time_body(mk_fb(pl_custom), x, kern, n=1000)
        print(f"{name:6s} {cin:3d}->{cout:3d} @{h:2d}x{w:2d}   "
              f"{fl/t_xf/1e12:7.1f} TF {fl/t_pf/1e12:8.1f} TF "
              f"{3*fl/t_xb/1e12:7.1f} TF {3*fl/t_pb/1e12:8.1f} TF",
              flush=True)


if __name__ == "__main__":
    main()
