"""Shared scan-chained timing harness for the bench tools.

On the axon TPU tunnel ``block_until_ready`` does not actually synchronize,
so wall-clock timing must force a scalar fetch. All bench tools therefore
time ``iters`` iterations chained through one ``lax.scan`` inside a single
jitted program:

  * each iteration perturbs the first input by the carry (a runtime-zero
    value XLA cannot prove is zero), so the chain is neither CSE'd nor
    reordered;
  * the iteration output feeds the next carry via ``sum(out) * 1e-30``
    (underflows to 0 at runtime in low precision — again unprovable at
    compile time);
  * one ``float()`` on the final carry is the only host sync.

This module is the single copy of that protocol (it used to be pasted into
four tools with drifting variants — non-float handling, iters defaults).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_chain(fn, args, iters: int = 20) -> float:
    """Seconds per iteration of ``fn(*args)``, scan-chained and scalar-fetch
    synced. ``fn`` may return an array or a tuple (first element is used for
    the chain). Non-float first inputs (e.g. uint8 images) are perturbed
    through a float cast that truncates back to the same values at runtime.
    """
    args = tuple(args)

    @jax.jit
    def run(c0, *a):
        def body(c, _):
            a0 = a[0]
            if jnp.issubdtype(a0.dtype, jnp.floating):
                ap = a0 + c.astype(a0.dtype)
            else:
                ap = (a0.astype(jnp.float32) + c).astype(a0.dtype)
            out = fn(ap, *a[1:])
            first = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(first.astype(jnp.float32)) * 1e-30, None

        s, _ = jax.lax.scan(body, c0, None, length=iters)
        return s

    float(run(jnp.float32(0), *args))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))  # forced fetch = real sync on axon
    return (time.perf_counter() - t0) / iters


def timed_print(name: str, fn, args, iters: int = 20) -> float:
    """timed_chain + the standard one-line report used by the bench tools."""
    dt = timed_chain(fn, args, iters=iters)
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt
