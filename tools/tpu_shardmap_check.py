#!/usr/bin/env python
"""Execute the Pallas kernels INSIDE shard_map on a real TPU backend.

The multi-device perf story composes ``pallas_call`` with ``shard_map``
over the mesh's 'data' axis (ops/attention.py). On the CPU test platform
the kernels fall back to XLA by design, and a plain single-chip run takes
the direct-call path — so that composition never lowers on TPU unless
forced. This script registers a 1-device mesh with
``LIBCONTINUAL_ATTN_SHARDMAP=force`` so shard_map stays on, runs all three
fused entries (packed-qkv, prefix-KV, masked) forward + backward, checks
them against the XLA reference path, and times shard_map vs direct call.

Prints one JSON line:
  {"ok": bool, "max_err": {...}, "ms_direct": x, "ms_shardmap": y}
or {"ok": false, "error": "NO_TPU"} when no TPU backend is reachable.

Run via tests/test_tpu_kernels.py (subprocess; the in-process test platform
is CPU) or standalone for the BASELINE.md numbers.
"""

import json
import os
import sys
import time

os.environ["LIBCONTINUAL_ATTN_SHARDMAP"] = "force"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        devs = jax.devices()
        if not any(d.platform.startswith("tpu") or "TPU" in str(d)
                   for d in devs):
            print(json.dumps({"ok": False, "error": "NO_TPU"}))
            return 0
    except Exception as e:  # backend init failed: no tunnel
        print(json.dumps({"ok": False, "error": "NO_TPU", "detail": str(e)[:200]}))
        return 0

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import importlib

    from libcontinual_tpu.utils import jaxcache
    jaxcache.enable()
    # the ops package re-exports `attention` (the function), shadowing the
    # submodule attribute — resolve the module itself
    A = importlib.import_module("libcontinual_tpu.ops.attention")

    mesh = Mesh(np.asarray(devs[:1]).reshape(1, 1), ("data", "model"))
    A.set_active_mesh_devices(1)
    A.set_active_mesh(mesh)
    assert A._shard_mesh() is not None, "force mode failed to keep shard_map"

    B, S, H, hd = 32, 200, 12, 64
    D = H * hd
    P = 8  # prefix tokens
    scale = 1.0 / np.sqrt(hd)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, S, 3 * D), jnp.bfloat16)
    pk = jnp.asarray(rng.randn(B, P, D), jnp.bfloat16)
    pv = jnp.asarray(rng.randn(B, P, D), jnp.bfloat16)
    # (S, S) additive causal mask — the CLIP text tower shape
    mask = jnp.asarray(np.triu(np.full((S, S), -1e9, np.float32), 1))

    errs = {}

    def check(name, fused_fn, xla_fn, args):
        # forward + a scalar-loss gradient through the custom VJP, both
        # inside shard_map (fused) and on the reference XLA path
        f_fused = jax.jit(lambda *a: fused_fn(*a))
        f_xla = jax.jit(lambda *a: xla_fn(*a))
        o1 = np.asarray(f_fused(*args), np.float32)
        o2 = np.asarray(f_xla(*args), np.float32)
        g_fused = jax.jit(jax.grad(lambda *a: jnp.sum(fused_fn(*a) ** 2).astype(jnp.float32)))
        g_xla = jax.jit(jax.grad(lambda *a: jnp.sum(xla_fn(*a) ** 2).astype(jnp.float32)))
        d1 = np.asarray(g_fused(*args), np.float32)
        d2 = np.asarray(g_xla(*args), np.float32)
        errs[name] = {
            "fwd": float(np.max(np.abs(o1 - o2))),
            "bwd": float(np.max(np.abs(d1 - d2))),
            "fwd_scale": float(np.max(np.abs(o2))),
            "bwd_scale": float(np.max(np.abs(d2))),
        }

    check("qkv", lambda x: A.fused_qkv_attention(x, scale, H),
          lambda x: A._qkv_attention_xla(x, scale, H), (qkv,))
    check("prefix", lambda x: A.fused_prefix_attention(x, pk, pv, scale, H),
          lambda x: A._pqkv_xla(x, pk, pv, scale, H), (qkv,))
    check("masked", lambda x: A.fused_masked_qkv_attention(x, mask, scale, H),
          lambda x: A._mqkv_xla(x, mask, scale, H), (qkv,))

    # timing: shard_map(1-device) vs direct kernel call, fwd+bwd of qkv.
    # Tunnel-safe protocol: time a scalar fetch after an N-iteration scan.
    def timed(fn, iters=30):
        def loop(x):
            def body(c, _):
                g = jax.grad(lambda t: jnp.sum(fn(t) ** 2).astype(jnp.float32))(x + (0 * c).astype(x.dtype))
                return c + jnp.mean(g).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

        jl = jax.jit(loop)
        float(jl(qkv))  # compile + warm
        t0 = time.perf_counter()
        float(jl(qkv))
        return (time.perf_counter() - t0) / iters * 1e3

    ms_shard = timed(lambda x: A.fused_qkv_attention(x, scale, H))
    A.set_active_mesh(None)  # direct path
    ms_direct = timed(lambda x: A._qkv_attention_core(x, scale, H))

    tol = 0.04  # bf16 inputs, f32 accumulation; fwd magnitudes O(10)
    ok = all(e["fwd"] <= tol * max(1.0, e["fwd_scale"])
             and e["bwd"] <= tol * max(1.0, e["bwd_scale"]) for e in errs.values())
    print(json.dumps({"ok": bool(ok), "err": errs,
                      "ms_shardmap": round(ms_shard, 3),
                      "ms_direct": round(ms_direct, 3)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
