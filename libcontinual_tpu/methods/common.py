"""Shared losses/utilities for the CL method zoo."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def kd_loss(
    pred_logits: jax.Array,
    soft_logits: jax.Array,
    T: float = 2.0,
    class_mask: Optional[jax.Array] = None,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Hinton KD as the reference computes it (reference lwf.py:74-77,
    icarl.py:199-207): softmax over the (masked) class set, sum over classes,
    mean over batch — no T^2 rescale."""
    if class_mask is not None:
        pred_logits = jnp.where(class_mask[None, :] > 0, pred_logits, -1e30)
        soft_logits = jnp.where(class_mask[None, :] > 0, soft_logits, -1e30)
    p = jax.nn.log_softmax(pred_logits / T, axis=1)
    s = jax.nn.softmax(soft_logits / T, axis=1)
    if class_mask is not None:
        s = s * (class_mask[None, :] > 0)
    per = -jnp.sum(s * p, axis=1)
    if weight is None:
        return jnp.mean(per)
    return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def select_mask(task, task0_mask, later_mask):
    """Pick a class mask by task scalar without retracing."""
    return jnp.where(task > 0, later_mask, task0_mask)


def head_kernel(params):
    return params["head"]["Dense_0"]["kernel"]


def set_head_kernel(params, kernel):
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    params["head"] = dict(params["head"])
    params["head"]["Dense_0"] = dict(params["head"]["Dense_0"])
    params["head"]["Dense_0"]["kernel"] = kernel
    return params


def copy_tree(tree):
    return jax.tree_util.tree_map(jnp.array, tree)


def zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def normalized(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def batch_iter(images: np.ndarray, labels: np.ndarray, batch_size: int):
    """Padded host batches (uint8) for task-boundary passes; yields
    (images, labels, weight)."""
    n = len(labels)
    steps = -(-n // batch_size)
    for s in range(steps):
        lo = s * batch_size
        chunk_im = images[lo : lo + batch_size]
        chunk_lb = labels[lo : lo + batch_size]
        pad = batch_size - len(chunk_lb)
        w = np.ones(batch_size, np.float32)
        if pad:
            chunk_im = np.concatenate([chunk_im, np.repeat(chunk_im[-1:], pad, 0)])
            chunk_lb = np.concatenate([chunk_lb, np.repeat(chunk_lb[-1:], pad, 0)])
            w[batch_size - pad :] = 0.0
        yield jnp.asarray(chunk_im), jnp.asarray(chunk_lb.astype(np.int32)), jnp.asarray(w)
