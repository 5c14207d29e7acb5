#!/usr/bin/env python
"""Where does the L2P train step spend its time? Times each stage of the
bench.py step in isolation.

Harness notes (axon tunnel):
  * a lax.scan amortizes the ~35 ms per-dispatch cost, BUT the loop body
    must form a genuine dependency chain or XLA hoists it (loop-invariant
    code motion) and you time one call; we chain iteration i+1's input on a
    runtime-zero perturbation derived from iteration i's output;
  * block_until_ready does not sync through the tunnel — fetch a scalar.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timed_print, timed_chain  # noqa: E402


def timed(name, fn, x0, iters=10):
    return timed_print(name, fn, (x0,), iters=iters)


def main():
    method, state, cfg = bench.build()
    bs = cfg["batch_size"]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (bs, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rng.randint(0, 10, (bs,), np.int32))
    weight = jnp.ones((bs,), jnp.float32)
    lr = jnp.float32(1e-3)
    akey = jax.random.PRNGKey(1)
    x = jax.block_until_ready(method.augment(akey, images, train=True))
    print("augmented input:", x.shape, x.dtype, flush=True)
    frozen = state.mvars["frozen"]
    prompts = jnp.zeros((bs, method.top_k * method.length, method.embed_dim), x.dtype)

    timed("augment(train)",
          lambda im: method.augment(akey, im, train=True), images)
    timed("frozen fwd (pass 1)",
          lambda xp: method.vit_apply(frozen, xp, train=False)["features"], x)
    timed("prompted fwd (pass 2)",
          lambda xp: method.vit_apply(
              frozen, xp, train=True, prepend_tokens=prompts,
              feature_mode="prompt_mean")["features"], x)
    timed("forward_logits (1+2)",
          lambda xp: method.forward_logits(state.params, state, xp, train=True,
                                           weight=weight)[0], x)

    def loss_grad(xp):
        batch = {"x": xp, "label": labels, "weight": weight}

        def lfn(p):
            return method.loss(p, state, batch, akey)[0]

        l, g = jax.value_and_grad(lfn)(state.params)
        return l[None] + jnp.sum(
            g["head"]["Dense_0"]["kernel"].astype(jnp.float32)
        )

    timed("loss + grad", loss_grad, x)

    def full_step(im):
        batch = {"image": im, "label": labels, "weight": weight}
        st, m = method.train_step(state, batch, lr)
        return m["loss"][None]

    timed("full train_step", full_step, images)


if __name__ == "__main__":
    main()
