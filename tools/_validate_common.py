"""Shared runner for the synthetic-dynamics validation tools
(validate_classic.py / validate_modern.py).

Adds the two axes the VALIDATION.md tables need beyond a single run:
  --dtype  float32|bfloat16   — the production default is bfloat16
                                (core/method.py); the tables must exist at
                                BOTH precisions so the shipped configuration
                                has end-to-end accuracy evidence.
  --seeds  N                  — mean +- spread over N seeds (7, 8, ...);
                                single-seed tables are seed-noise lottery
                                (measured: WA last-avg 56.2/64.8/69.5 over
                                seeds 7/8/9 at f32).
"""
from __future__ import annotations

import argparse

import numpy as np


def cli_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of seeds (seed, seed+1, ...)")
    ap.add_argument("--seed0", type=int, default=7)
    ap.add_argument("--only", default=None,
                    help="substring filter on the method label")
    return ap.parse_args(argv)


def run_row(label, cfg, seeds, seed0):
    """Run one method config over `seeds` seeds; print a markdown row of
    mean+-spread (spread = max-min over seeds) for last-avg / task-avg /
    forgetting / BWT, plus the per-seed last-avg list."""
    from libcontinual_tpu.core.trainer import Trainer

    stats = {"last": [], "avg": [], "frgt": [], "bwt": []}
    last_row = None
    try:
        for s in range(seeds):
            cfg = dict(cfg)
            cfg["seed"] = seed0 + s
            res = Trainer(cfg).train_loop()
            at = np.asarray(res["acc_table"])
            last_row = at[-1]
            stats["last"].append(float(at[-1].mean()))
            stats["avg"].append(float(res["task_ovr_avg_acc"]))
            stats["frgt"].append(float(res["ovr_frgt"]))
            stats["bwt"].append(float(res["ovr_bwt"]))
    except Exception as e:  # one bad seed fails the row loudly
        row = f"| {label} | FAIL {type(e).__name__}: {str(e)[:80]} |"
        print(row, flush=True)
        return row

    def fmt(vals):
        if len(vals) == 1:
            return f"{vals[0]:.1f}"
        return f"{np.mean(vals):.1f}±{(max(vals) - min(vals)) / 2:.1f}"

    tail = (np.round(stats["last"], 1).tolist() if seeds > 1
            else np.round(last_row, 1).tolist())
    row = (f"| {label} | {fmt(stats['last'])} | {fmt(stats['avg'])} | "
           f"{fmt(stats['frgt'])} | {fmt(stats['bwt'])} | {tail} |")
    print(row, flush=True)
    return row


def header(seeds):
    tail = ("per-seed last-avg" if seeds > 1 else "per-task last acc")
    print(f"| Method | last-avg | task-avg | frgt | bwt | {tail} |")
    print("|---|---|---|---|---|---|")
