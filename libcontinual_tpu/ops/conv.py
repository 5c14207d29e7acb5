"""Implicit-GEMM 3x3 convolution (Pallas) — a MEASURED REJECTION, kept as
a flag-gated experiment; nothing in the model stack calls it by default.

History: BASELINE.md round-3 recorded conv-bound workloads at "20-28
TFLOP/s", and this kernel was built to attack that floor. Correcting the
measurement methodology (tools/profile_conv.py: a ~26 ms tunnel dispatch
floor plus XLA loop-invariant hoisting had invalidated the per-op table)
showed XLA's conv emitter already sustains 127-148 TF/s on every stride-1
resnet18 stage shape at batch 128 bf16 — at the chip's measured matmul
ceiling. Head-to-head (tools/bench_conv_kernel.py, same protocol):

    shape                  xla fwd  pallas fwd   xla f+b  pallas f+b
    l1  64->64  @32x32    126.7 TF    27.4 TF   116.7 TF    32.2 TF
    l2 128->128 @16x16    148.3 TF   107.9 TF   159.9 TF   119.3 TF
    l3 256->256 @ 8x 8    151.9 TF   125.7 TF   162.0 TF   142.0 TF
    l4 512->512 @ 4x 4    147.1 TF   121.3 TF   159.3 TF   135.6 TF

XLA wins every shape (the tap-accumulated kernel pays 9 under-sized K=C
dots where XLA's emitter pipelines the full contraction), so the resnet
stack keeps jax.lax conv. The op remains correct, differentiable, and
tested (tests/test_ops.py::TestConv3x3 runs it through the Pallas
interpreter on CPU; forcing is LIBCONTINUAL_CONV=fused).

Design (TPU, NHWC, 3x3, stride 1, SAME):
  * the input is padded once by XLA, then each Pallas program takes a
    (TB, H+2, W+2, C) block — whole padded images, so no halo exchange and
    no overlapping BlockSpecs;
  * the kernel runs 9 shifted MXU dots, one per filter tap:
    ``acc[M, O] += x[:, dh:dh+H, dw:dw+W, :].reshape(M, C) @ w[tap]``
    with M = TB*H*W rows and f32 accumulation — the im2col patch matrix is
    never materialized (a materialized one costs 9x activation HBM traffic,
    which is exactly why the round-3 im2col stem measured null);
  * TB is chosen so M lands near 512-1024 rows (small-spatial stages batch
    several images per program) and the whole working set fits VMEM;
  * backward reuses the same kernel: dx is a 3x3 conv of dy with the
    rotated/transposed kernel, and dw is a tap-wise (C, M) @ (M, O)
    accumulation over image blocks (grid-accumulated in f32).

Strided (3x3/2) and 1x1 convs stay on XLA: together they are a small
fraction of stack FLOPs and their shapes change the tiling story.
On CPU (tests) the same math runs as a plain XLA conv — bit-compatible
semantics, so the op is safe everywhere and differentiable anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _pick_tb(b: int, h: int, w: int, c: int, o: int) -> int:
    """Images per program: target ~512+ GEMM rows, bounded by VMEM."""
    target = max(1, 512 // (h * w))
    tb = min(target, b)
    while tb > 1 and b % tb:
        tb -= 1
    # VMEM estimate: padded input + f32 acc + output + full weights
    def vmem(tb):
        m = tb * h * w
        return ((tb * (h + 2) * (w + 2) * c) * 2 + m * o * 4 + m * o * 2
                + 9 * c * o * 2)

    while tb > 1 and vmem(tb) > 12 * 2**20:
        tb -= 1
        while tb > 1 and b % tb:
            tb -= 1
    return tb


def conv3x3_ok(x_shape, enabled_env: bool = True) -> bool:
    """Whether the fused kernel engages for this input shape."""
    import os

    env = os.environ.get("LIBCONTINUAL_CONV")
    if env == "xla":
        return False
    if not (_on_tpu() or env == "fused"):
        return False
    b, h, w, c = x_shape
    if h < 3 or w < 3 or h * w > 64 * 64:
        return False
    return b % _pick_tb(b, h, w, c, c) == 0


def _fwd_kernel(xp_ref, w_ref, out_ref, acc, *, h, w, tb):
    # xp_ref: (TB, H+2, W+2, C); w_ref: (9, C, O); out_ref: (TB*H*W, O)
    c = xp_ref.shape[-1]
    o = w_ref.shape[-1]
    m = tb * h * w
    acc[:] = jnp.zeros_like(acc)
    for dh in range(3):
        for dw in range(3):
            xs = xp_ref[:, dh:dh + h, dw:dw + w, :].reshape(m, c)
            acc[:] += jax.lax.dot_general(
                xs, w_ref[dh * 3 + dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc[:].astype(out_ref.dtype)


def _interpret() -> bool:
    # CPU correctness tests force the kernel with LIBCONTINUAL_CONV=fused
    # and run it through the Pallas interpreter
    return not _on_tpu()


def _pallas_conv3x3(x, w9):
    """x: (B, H, W, C) already in compute dtype; w9: (9, C, O)."""
    b, h, wd, c = x.shape
    o = w9.shape[-1]
    tb = _pick_tb(b, h, wd, c, o)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = tb * h * wd
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=wd, tb=tb),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h + 2, wd + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m, o), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h * wd, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, o), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(xp, w9)
    return out.reshape(b, h, wd, o)


def _dw_kernel(xp_ref, g_ref, dw_ref, *, h, w, tb):
    # xp_ref: (TB, H+2, W+2, C); g_ref: (TB*H*W, O); dw_ref: (9, C, O) f32.
    # The single f32 output block doubles as the accumulator — a separate
    # scratch would put two (9, C, O) f32 buffers in VMEM, which overflows
    # at C=O=512.
    c = xp_ref.shape[-1]
    m = tb * h * w
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for dh in range(3):
        for dw_ in range(3):
            xs = xp_ref[:, dh:dh + h, dw_:dw_ + w, :].reshape(m, c)
            dw_ref[dh * 3 + dw_] += jax.lax.dot_general(
                xs, g_ref[:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _pallas_conv3x3_dw(x, g):
    """Weight gradient: x (B, H, W, C), g (B, H, W, O) -> (9, C, O) f32."""
    b, h, wd, c = x.shape
    o = g.shape[-1]
    tb = _pick_tb(b, h, wd, c, o)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = tb * h * wd
    return pl.pallas_call(
        functools.partial(_dw_kernel, h=h, w=wd, tb=tb),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h + 2, wd + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((m, o), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((9, c, o), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, c, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # grid accumulates into one output block: iterations must run
            # in order on one core
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(xp, g.reshape(b * h * wd, o))


@jax.custom_vjp
def conv3x3(x, w):
    """3x3 stride-1 SAME conv, NHWC x (B,H,W,C) @ w (3,3,C,O)."""
    if conv3x3_ok(x.shape):
        return _pallas_conv3x3(x, w.reshape(9, *w.shape[2:]))
    return _xla_conv3x3(x, w)


def _conv3x3_fwd(x, w):
    return conv3x3(x, w), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    if conv3x3_ok(x.shape):
        # dx: conv of dy with the spatially-rotated, C<->O-transposed kernel
        w_rot = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (3,3,O,C)
        dx = _pallas_conv3x3(g, w_rot.reshape(9, *w_rot.shape[2:]))
        dw = _pallas_conv3x3_dw(x, g).reshape(3, 3, *w.shape[2:])
        return dx, dw.astype(w.dtype)
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=g.dtype,
    )
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3)
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
