#!/usr/bin/env python
"""Multi-workload step-throughput bench: one row per method family at its
shipped geometry, on the real TPU chip.

The headline bench (bench.py) measures L2P only; this table demonstrates the
framework's perf across the zoo: prompt methods (L2P / DualPrompt / CODA),
CLIP both-towers contrastive (MoE-Adapter4CL), ResNet rehearsal (iCaRL),
and OCM's 16x-expanded online step — the suspected worst case.

Timing protocol (axon tunnel): scalar fetch after a 50-step lax.scan,
best of 3 — block_until_ready does not synchronize through the tunnel,
and each jitted-program dispatch costs ~26 ms through it (measured,
round 4), so short scans under-report real training throughput (the
trainer scans WHOLE epochs, paying dispatch once per epoch).

Usage: python tools/bench_workloads.py [--only NAME]
Appends a markdown table to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build_method(name, classifier_kwargs, backbone, extra_cfg=None,
                 batch_size=128, num_class=100, image_size=32):
    from libcontinual_tpu.utils import jaxcache

    jaxcache.enable()
    import libcontinual_tpu.methods  # noqa: F401
    from libcontinual_tpu.config import Config
    from libcontinual_tpu.registry import METHODS

    cfg = Config(overrides={
        "dataset": "synthetic",
        "data_root": "",
        "image_size": image_size,
        "task_num": 10,
        "init_cls_num": num_class // 10,
        "inc_cls_num": num_class // 10,
        "epoch": 1,
        "batch_size": batch_size,
        "seed": 1993,
        "dtype": "bfloat16",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": backbone[0], "kwargs": backbone[1]},
        "classifier": {
            "name": name,
            "kwargs": {
                "num_class": num_class, "feat_dim": backbone[2],
                "init_cls_num": num_class // 10,
                "inc_cls_num": num_class // 10, "task_num": 10,
                **classifier_kwargs,
            },
        },
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
        "lr_scheduler": {"name": "Constant"},
        **(extra_cfg or {}),
    }).get_config_dict()
    return METHODS.get(name)(cfg), cfg


def program_flops(jitted, *args):
    """XLA's own FLOP count for the compiled program (cost analysis) —
    the denominator for achieved-TFLOP/s accounting. None when the
    backend doesn't expose it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def time_step(method, cfg, task_idx=0, n_steps=50):
    bs = cfg["batch_size"]
    rng = np.random.RandomState(0)
    state = method.init_state(jax.random.PRNGKey(0), (32, 32, 3))
    lo = 0 if task_idx == 0 else cfg["init_cls_num"] + (task_idx - 1) * cfg["inc_cls_num"]
    hi = lo + (cfg["init_cls_num"] if task_idx == 0 else cfg["inc_cls_num"])
    state = method.start_task(state, task_idx, lo, hi)
    images = jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rng.randint(lo, hi, (bs,), np.int32))
    weight = jnp.ones((bs,), jnp.float32)
    lr = jnp.float32(1e-3)
    tx = method._tx_for_task(task_idx)

    @jax.jit
    def run(state):
        def body(st, _):
            batch = {"image": images, "label": labels, "weight": weight}
            st, m = method.train_step(st, batch, lr, tx=tx)
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, None, length=n_steps)
        return st, jnp.sum(losses)

    # XLA's cost analysis counts a lax.scan BODY ONCE regardless of trip
    # count (verified: a 10-iteration matmul scan reports 1x the matmul),
    # so the executed total is ~ n_steps x the counted program; the
    # once-executed prologue inflates this by at most 1/n_steps (2%)
    flops = program_flops(run, state)
    state, s = run(state)
    float(s)  # compile + warm
    dt = float("inf")
    for _ in range(3):  # best-of-3: tunnel dispatch noise is ~ms-scale
        t0 = time.perf_counter()
        state, s = run(state)
        float(s)
        dt = min(dt, time.perf_counter() - t0)
    ips = n_steps * bs / dt
    tflops = (flops * n_steps / dt / 1e12) if flops else None
    return ips, tflops


def _ocm_incremental(method):
    method._cur_task = 1  # incremental branch (joint replay forward)


def run_workload(spec):
    """Build + time one WORKLOADS entry; the per-workload geometry
    (task_idx, post-build setup) lives in the spec itself so callers
    (main below, bench.py) never match on names. Returns
    (cfg, img/s, achieved TFLOP/s or None)."""
    method, cfg = spec["build"]()
    setup = spec.get("setup")
    if setup is not None:
        setup(method)
    ips, tflops = time_step(method, cfg, task_idx=spec.get("task_idx", 0))
    return cfg, ips, tflops


# Each entry: build() -> (method, cfg); task_idx = which task's train_step
# geometry to bench; setup = optional post-build mutation.
WORKLOADS = {
    # prompt family, ViT-B/16, CIFAR-100 b10-inc10 shipped geometry
    "L2P": {"build": lambda: build_method(
        "L2P", {"prompt_length": 5, "pool_size": 10, "top_k": 5,
                "pull_constraint_coeff": 0.1},
        ("ViTZoo", {}, 768))},
    "DualPrompt": {"build": lambda: build_method(
        "DualPrompt", {"e_prompt_length": 20, "g_prompt_length": 6,
                       "pool_size": 10},
        ("ViTZoo", {}, 768))},
    "CODAPrompt": {"build": lambda: build_method(
        "CodaPrompt", {"prompt_length": 8, "pool_size": 100, "mu": 0.0},
        ("ViTZoo", {}, 768))},
    # CLIP contrastive, both towers + MoE adapters (b10-10-10 geometry).
    # image_size=224 is load-bearing: the clip transform preset resizes to
    # the configured image_size, so the default 32 would bench a 5-token
    # degenerate tower (caught by the XLA flop accounting in round 5 —
    # earlier rounds' 3200 img/s row was this wrong geometry)
    "MoE_Adapter4CL": {"build": lambda: build_method(
        "MOE_ADAPTER4CL", {}, ("clip", {"moe_experts": 2}, 512),
        batch_size=64, image_size=224)},
    # ResNet rehearsal (cifar stem), iCaRL b10-inc10 geometry
    "iCaRL_resnet18": {"build": lambda: build_method(
        "ICarl", {}, ("resnet18", {}, 512),
        extra_cfg={"dataset": "cifar100"})},
    # online: 16x rotation expansion + simclr aug + joint replay forward —
    # measured at the incremental-task shape (the expensive one)
    "OCM_resnet18": {"build": lambda: build_method(
        "OCM", {"feat_dim": 512}, ("resnet18", {}, 512),
        extra_cfg={"dataset": "cifar100",
                   "buffer": {"name": "OnlineBuffer",
                              "kwargs": {"buffer_size": 1000}}},
        batch_size=10, num_class=100),
        "task_idx": 1, "setup": _ocm_incremental},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    rows = []
    for name, spec in WORKLOADS.items():
        if args.only and args.only.lower() not in name.lower():
            continue
        cfg, ips, tflops = run_workload(spec)
        rows.append((name, cfg["batch_size"], round(ips, 1),
                     round(tflops, 1) if tflops else None))
        print(json.dumps({"workload": name, "batch": cfg["batch_size"],
                          "img_per_sec": round(ips, 1),
                          "achieved_tflops": round(tflops, 1) if tflops else None,
                          "pct_of_128tf_ceiling":
                              round(100 * tflops / 128, 1) if tflops else None}),
              flush=True)
    print("\n| Workload | Batch | img/s | TF/s (XLA-counted) |")
    print("|---|---|---|---|")
    for name, bs, ips, tf in rows:
        print(f"| {name} | {bs} | {ips} | {tf if tf else '-'} |")


if __name__ == "__main__":
    main()
