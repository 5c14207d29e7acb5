"""Tensor-parallel parameter sharding (megatron-style MLP split).

The reference has no tensor parallelism at all (SURVEY §2.6: models are
≤ ViT-B, single GPU); here the ``model`` mesh axis is made real the TPU way:
column-shard ``fc1`` and row-shard ``fc2`` of every transformer MLP via
``NamedSharding`` annotations and let XLA's SPMD partitioner insert the one
``psum`` after ``fc2``. Attention is tensor-parallel too: the head axis of
the (B, S, H, hd) activations is constrained to the 'model' axis
(ops/attention.py ``_tp_head_constraint``) and the out-projection kernel is
row-sharded here, so each rank computes its own head group and the psum
after ``attn/proj`` is the block's only collective. The packed qkv kernel
itself stays replicated — its [q|k|v] column layout is not head-contiguous,
so a column shard would mis-align with the head split (documented in
docs/performance.md).

Rules are applied by *path suffix + shape divisibility*, so they cover the
plain ViT, the CLIP towers, and stacked/vmap'd parameter trees (leading axes
get ``None``) without per-method wiring. Optimizer moments (Adam mu/nu) have
the same path suffixes and shapes as their parameters, so they shard
identically for free.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover
            parts.append(str(k))
    return "/".join(parts)


def tp_spec(path_str: str, shape, model: int) -> P:
    """PartitionSpec for one leaf under ``model``-way tensor parallelism."""
    if model <= 1 or not shape:
        return P()
    nd = len(shape)
    if path_str.endswith("fc1/kernel") and nd >= 2 and shape[-1] % model == 0:
        return P(*([None] * (nd - 1)), "model")
    if path_str.endswith("fc1/bias") and shape[-1] % model == 0:
        return P(*([None] * (nd - 1)), "model")
    if path_str.endswith("fc2/kernel") and nd >= 2 and shape[-2] % model == 0:
        return P(*([None] * (nd - 2)), "model", None)
    # attention out-projection: row-shard to consume the head-sharded
    # attention output (ops/attention.py _tp_head_constraint) — the psum
    # XLA inserts after it is the attention block's only TP collective
    if path_str.endswith("attn/proj/kernel") and nd >= 2 and shape[-2] % model == 0:
        return P(*([None] * (nd - 2)), "model", None)
    return P()


def sharding_tree(ctx, tree: Any) -> Any:
    """Per-leaf ``NamedSharding`` tree for ``jax.device_put(state, ...)``."""
    model = ctx.mesh.shape["model"]

    def leaf_sharding(path, leaf):
        spec = tp_spec(_path_str(path), getattr(leaf, "shape", ()), model)
        return NamedSharding(ctx.mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)
