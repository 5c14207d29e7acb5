"""The explicit training state pytree.

Everything the reference keeps as mutable ``nn.Module`` attributes (growing
heads, Fisher matrices, frozen teachers, prompt pools, replay slabs,
reference core/model/*.py) lives here as fixed-shape arrays inside one
pytree, so a single compiled ``train_step`` serves every task:

  * ``task`` / ``seen_mask`` / ``prev_mask`` are device scalars/vectors, not
    Python ints — changing task does not retrace;
  * ``mvars`` is the method-owned pytree (teacher params, buffers,
    projection bases, ...), with a constant structure across tasks.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    mvars: Any
    rng: jax.Array
    step: jax.Array  # int32 global step
    task: jax.Array  # int32 current task index
    seen_mask: jax.Array  # (num_class,) f32 — classes seen incl. current task
    prev_mask: jax.Array  # (num_class,) f32 — classes seen before current task


def make_masks(num_class: int, class_lo: int, class_hi: int):
    """seen/prev masks when training the task covering [class_lo, class_hi)."""
    idx = jnp.arange(num_class)
    seen = (idx < class_hi).astype(jnp.float32)
    prev = (idx < class_lo).astype(jnp.float32)
    return seen, prev
