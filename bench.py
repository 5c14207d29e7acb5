#!/usr/bin/env python
"""Headline benchmark: images/sec/chip for the ViT-B/16 L2P train step
(CIFAR-100 b10-inc10 geometry: 100-class head, 32x32 uint8 inputs resized
in-graph to 224, batch 128, bf16).

This is the BASELINE.json north-star metric. The measured program is the real
training path: in-graph resize+augment of uint8 batches, frozen-ViT query
pass, prompt-pool selection, prompted forward, CE + pull-constraint loss,
backward over prompts+head, optimizer update — all inside one lax.scan, as
the trainer runs it.

``vs_baseline`` divides by 186 img/s — an UPPER BOUND on the reference
implementation on an A100. Derivation: the reference trains eager fp32 with
no TF32/AMP anywhere (grep-verified: no autocast/allow_tf32/half in its
tree; torch disables TF32 matmuls by default), the L2P step is ~13.4 TFLOP
per 128 images (frozen-query fwd + prompted fwd + activation-grad backward
~= 3 ViT-B fwd equivalents), and A100 fp32 peak is 19.5 TFLOP/s — so even
at 100% FLOP utilization with free data loading the reference cannot exceed
128 x 19.5e12 / 13.4e12 = 186 img/s. vs_baseline is therefore a LOWER bound
on the true speedup; >= 3.0 meets BASELINE.json's ">=3x A100-class" goal.
(The reference publishes no throughput numbers of its own — reproduce
READMEs are accuracy-only.)

Timing note: on the axon TPU tunnel, ``block_until_ready`` does not actually
synchronize — we force a scalar fetch instead.

Besides the headline metric, the emitted JSON line carries a ``workloads``
map with one img/s row per method family at its shipped geometry
(DualPrompt / CODA-Prompt / CLIP-MoE / iCaRL-resnet18 / OCM — the
tools/bench_workloads.py table), so the per-round bench artifact records
the breadth claim, not just L2P. Each row is individually guarded: a
workload failure records an error string without losing the headline.
Set BENCH_WORKLOADS=0 to emit the headline only.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from libcontinual_tpu.utils import jaxcache

    jaxcache.enable()
    import libcontinual_tpu.methods  # noqa: F401 — populates the registry
    from libcontinual_tpu.config import Config
    from libcontinual_tpu.registry import METHODS

    cfg = Config(overrides={
        "dataset": "synthetic",
        "data_root": "",
        "image_size": 32,
        "task_num": 10,
        "init_cls_num": 10,
        "inc_cls_num": 10,
        "epoch": 1,
        "batch_size": 128,
        "seed": 1993,
        "dtype": "bfloat16",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "ViTZoo", "kwargs": {}},
        "classifier": {
            "name": "L2P",
            "kwargs": {
                "num_class": 100, "feat_dim": 768,
                "init_cls_num": 10, "inc_cls_num": 10, "task_num": 10,
                "prompt_length": 5, "pool_size": 10, "top_k": 5,
                "pull_constraint_coeff": 0.1,
            },
        },
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001875}},
        "lr_scheduler": {"name": "Constant"},
    }).get_config_dict()
    method = METHODS.get("L2P")(cfg)
    rng = jax.random.PRNGKey(0)
    state = method.init_state(rng, (32, 32, 3))
    return method, state, cfg


def _require_devices(timeout_s: float = 600.0):
    """Fail fast (with a parseable JSON line) when the TPU tunnel is down.

    ``jax.devices()`` on the axon tunnel can block indefinitely during an
    outage; probe it from a daemon thread so the driver records an explicit
    error instead of hanging the whole round."""
    import os
    import threading

    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", timeout_s))
    found = []
    probe = threading.Thread(target=lambda: found.extend(jax.devices()),
                             daemon=True)
    probe.start()
    probe.join(timeout_s)
    if probe.is_alive() or not found:
        print(json.dumps({
            "metric": "images/sec/chip (ViT-B/16 L2P train step, "
                      "CIFAR-100 b10-inc10 geometry)",
            "value": None,
            "unit": "images/sec/chip",
            "error": f"device backend unreachable after {timeout_s:.0f}s "
                     "(TPU tunnel outage) — no measurement taken",
        }), flush=True)
        sys.stdout.flush()
        os._exit(2)  # skips cleanup; stdout flushed above so the driver
        # still captures the error record through a pipe
    return found


def main():
    _require_devices()
    method, state, cfg = build()
    bs = cfg["batch_size"]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rng.randint(0, 10, (bs,), np.int32))
    weight = jnp.ones((bs,), jnp.float32)
    lr = jnp.float32(1e-3)

    n_steps = 50

    @jax.jit
    def run(state):
        def body(st, _):
            batch = {"image": images, "label": labels, "weight": weight}
            st, m = method.train_step(st, batch, lr)
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, None, length=n_steps)
        return st, jnp.sum(losses)

    # XLA's own flop count for the program (scan body counted once —
    # see tools/bench_workloads.py) cross-checks the analytic 13.4 TFLOP
    # estimate below
    xla_flops = None
    try:
        ca = run.lower(state).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # compile + warm
    state, s = run(state)
    float(s)
    dt = float("inf")
    for _ in range(3):  # best-of-3: each dispatch through the tunnel costs
        # ~26 ms (measured round 4); 50 steps amortize it to <0.5%, matching
        # production (the trainer scans whole epochs in one program)
        t0 = time.perf_counter()
        state, s = run(state)
        float(s)  # forced fetch = real sync on the axon tunnel
        dt = min(dt, time.perf_counter() - t0)

    ips = n_steps * bs / dt
    baseline = 186.0  # A100 fp32-peak bound on the reference (see docstring)
    # ~13.4 TFLOP per 128-image L2P step (frozen-query fwd + prompted fwd +
    # activation-grad bwd ~= 3 ViT-B fwd equivalents; BASELINE.md:92-102)
    flop_per_image = 13.4e12 / 128
    achieved = ips * flop_per_image
    record = {
        "metric": "images/sec/chip (ViT-B/16 L2P train step, CIFAR-100 b10-inc10 geometry)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 3),
        # self-contained context: what the ratio divides by and how close the
        # step runs to the chip
        "baseline_basis": "186 img/s = A100 fp32-peak upper bound on the "
                          "eager-fp32 reference L2P step (BASELINE.md:60-71)",
        "achieved_tflops": round(achieved / 1e12, 1),
        "mfu_vs_197tflops_peak": round(achieved / 197e12, 3),
        "mfu_vs_128tflops_measured_ceiling": round(achieved / 128e12, 3),
    }
    if xla_flops:
        # independent cross-check of the analytic FLOP model: XLA-counted
        # program flops x n_steps / wall (scan body counted once)
        record["xla_counted_tflops"] = round(
            xla_flops * n_steps / dt / 1e12, 1)
    record["workloads"] = _workload_rows()
    record["end_to_end"] = _end_to_end_block()
    print(json.dumps(record))


def _end_to_end_block():
    """Whole-run wall-clock + retrace audit: a FULL 10-task iCaRL run
    through the real Trainer (synthetic CIFAR geometry), with
    jax.monitoring compile counters. The steady-state step benches above
    never see compile time — a per-task retrace regression (O(tasks)
    compilations instead of O(1) per program) would ship invisibly without
    this block. Set BENCH_E2E=0 to skip."""
    import os

    if os.environ.get("BENCH_E2E", "1") == "0":
        return {"skipped": "BENCH_E2E=0"}
    try:
        from libcontinual_tpu.utils import jaxcache

        jaxcache.install_counters()
        base = jaxcache.counters_snapshot()
        from libcontinual_tpu.config import Config
        from libcontinual_tpu.core.trainer import Trainer

        cfg = Config(overrides={
            "dataset": "synthetic", "data_root": "", "image_size": 32,
            "task_num": 10, "init_cls_num": 10, "inc_cls_num": 10,
            "epoch": 2, "batch_size": 128, "per_class": 60, "seed": 1993,
            "val_per_epoch": 0, "testing_times": 1, "dtype": "bfloat16",
            "mesh": {"data": 1, "model": 1},
            # the shipped cifar recipe's transform stack, stated explicitly
            # (the synthetic source doesn't trigger the cifar preset)
            "train_trfms": [
                {"RandomCrop": {"size": 32, "padding": 4}},
                {"RandomHorizontalFlip": {}},
                {"ColorJitter": {"brightness": 63 / 255}},
                {"Normalize": {"mean": [0.5071, 0.4865, 0.4409],
                               "std": [0.2673, 0.2564, 0.2762]}},
            ],
            "test_trfms": [
                {"Normalize": {"mean": [0.5071, 0.4865, 0.4409],
                               "std": [0.2673, 0.2564, 0.2762]}},
            ],
            "backbone": {"name": "resnet18", "kwargs": {}},
            "classifier": {"name": "ICarl", "kwargs": {
                "num_class": 100, "feat_dim": 512, "init_cls_num": 10,
                "inc_cls_num": 10, "task_num": 10}},
            "buffer": {"name": "LinearHerdingBuffer",
                       "kwargs": {"buffer_size": 200, "batch_size": 128}},
            "optimizer": {"name": "SGD",
                          "kwargs": {"lr": 0.05, "momentum": 0.9}},
            "lr_scheduler": {"name": "Constant"}, "warmup": 0,
        }).get_config_dict()
        t0 = time.perf_counter()
        tr = Trainer(cfg)
        overall = tr.train_loop()
        wall = time.perf_counter() - t0
        snap = jaxcache.counters_snapshot()
        programs = len(tr._jit_cache)
        traces = sum(
            f._cache_size() for f in tr._jit_cache.values()
            if hasattr(f, "_cache_size"))
        # O(1) compilations per program family, NOT O(tasks): equal task
        # sizes + a quota-stable buffer give each trainer program <= 2
        # distinct shapes (task-0 size, incremental+buffer size); a
        # per-task retrace would put traces near 10x programs
        retrace_ok = traces <= 2 * programs + 4
        return {
            "protocol": "10-task iCaRL resnet18, 60 img/class synthetic "
                        "CIFAR geometry, 2 epochs/task, herding buffer 200",
            "wall_clock_s": round(wall, 1),
            "train_time_s": round(float(overall["time_sec"]), 1),
            "compiles": snap["compiles"] - base["compiles"],
            "compile_secs": round(snap["compile_secs"] - base["compile_secs"], 2),
            "persistent_cache_hits": snap["cache_hits"] - base["cache_hits"],
            "trainer_programs": programs,
            "trainer_traces": traces,
            "retrace_ok": bool(retrace_ok),
        }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}


def _workload_rows():
    """img/s per method family (tools/bench_workloads.py), each row guarded
    so one workload's failure can't cost the headline record."""
    import os

    if os.environ.get("BENCH_WORKLOADS", "1") == "0":
        return {"skipped": "BENCH_WORKLOADS=0"}
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import bench_workloads as bw
    except Exception as e:  # tools/ missing or import-broken
        return {"error": f"{type(e).__name__}: {e}"}
    rows = {}
    for name, spec in bw.WORKLOADS.items():
        if name == "L2P":
            continue  # the headline metric above IS the L2P step
        try:
            wcfg, ips, tflops = bw.run_workload(spec)
            rows[name] = {"batch": wcfg["batch_size"],
                          "img_per_sec": round(ips, 1)}
            if tflops:
                rows[name]["achieved_tflops"] = round(tflops, 1)
                rows[name]["pct_of_128tf_ceiling"] = round(
                    100 * tflops / 128, 1)
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
    return rows


if __name__ == "__main__":
    main()
