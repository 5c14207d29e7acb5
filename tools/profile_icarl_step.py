#!/usr/bin/env python
"""Attribute the iCaRL train-step cost on the real chip.

tools/profile_conv.py (corrected timing) shows the resnet18 backbone
sustains 43k img/s fwd+bwd at batch 128, yet the full iCaRL method step
measures ~15k img/s (tools/bench_workloads.py). This tool breaks the
difference down by timing, with identical inputs/batch:

  augment only       the uint8 -> normalized-float input pipeline
  Finetune step      backbone fwd+bwd + head, masked CE, SGD update, metrics
  ICarl step         + the KD teacher forward (train-mode BN) + kd loss

Timing protocol: scan with carry-dependent inputs (see profile_conv.py's
docstring for the two artifacts this avoids), scalar fetch, best of 3.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

from bench_workloads import build_method
from profile_conv import time_body


def step_time(method, cfg, n=200):
    bs = cfg["batch_size"]
    rng = np.random.RandomState(0)
    state = method.init_state(jax.random.PRNGKey(0), (32, 32, 3))
    state = method.start_task(state, 0, 0, cfg["init_cls_num"])
    images = jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rng.randint(0, cfg["init_cls_num"], (bs,), np.int32))
    weight = jnp.ones((bs,), jnp.float32)
    tx = method._tx_for_task(0)

    # NOTE: state is passed as a constant (not threaded) — each iteration
    # re-runs the step from the same state, but the carry-dependent labels
    # defeat hoisting. This times ONE step's work, not training dynamics.
    # Folding every UPDATED param leaf into the result keeps the backward
    # pass + optimizer update alive (returning just the loss lets XLA
    # dead-code-eliminate the whole gradient: first attempt measured a
    # "train step" 15x faster than its own forward).
    def body(c, state):
        batch = {"image": images,
                 "label": labels + (c > 1e9).astype(jnp.int32),
                 "weight": weight}
        st, m = method.train_step(state, batch, jnp.float32(1e-3), tx=tx)
        upd = jnp.stack([jnp.sum(l.astype(jnp.float32))
                         for l in jax.tree_util.tree_leaves(st.params)])
        return jnp.concatenate([upd, m["loss"][None]])

    t = time_body(body, state, n=n)
    return bs / t, t


def main():
    icarl, cfg = build_method("ICarl", {}, ("resnet18", {}, 512),
                              extra_cfg={"dataset": "cifar100"})
    ft, cfg_ft = build_method("Finetune", {}, ("resnet18", {}, 512),
                              extra_cfg={"dataset": "cifar100"})
    bs = cfg["batch_size"]
    print(f"platform: {jax.devices()[0].platform} batch {bs}")

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8))

    def aug_eval(c, images):
        x = ft.augment(None, images, train=False)
        return x + c.astype(x.dtype)

    def aug_train(c, images):
        # the cifar train preset: RandomCrop(pad 4) + flip + normalize
        rng = jax.random.PRNGKey(0)
        rng = jax.random.fold_in(rng, (c > 1e9).astype(jnp.int32))
        x = ft.augment(rng, images, train=True)
        return x

    t = time_body(aug_eval, images, n=2000)
    print(f"augment eval         : {t*1e3:7.3f} ms  {bs/t:8.0f} img/s",
          flush=True)
    t = time_body(aug_train, images, n=2000)
    print(f"augment train        : {t*1e3:7.3f} ms  {bs/t:8.0f} img/s",
          flush=True)
    for name, m, c in (("Finetune step        ", ft, cfg_ft),
                       ("ICarl step           ", icarl, cfg)):
        try:
            ips, t = step_time(m, c)
            print(f"{name}: {t*1e3:7.2f} ms  {ips:8.0f} img/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
