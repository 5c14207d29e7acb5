"""Serving export — ahead-of-time compiled inference artifacts.

The reference (RL-VIG/LibContinual) has no deployment story: inference is
the torch eval loop inside its Trainer. On TPU the natural production path
is ahead-of-time lowering: ``jax.export`` serializes the jitted inference
program (StableHLO + weights) into a single self-contained blob that a
serving process can ``deserialize().call()`` without any framework, method,
or config code — and, with ``platforms=("tpu", "cpu")``, the same artifact
runs on either target.

Two artifact flavors:

  * **baked** (default): the trained ``TrainState`` is closed over, so the
    blob embeds the weights — one file, copy-and-serve;
  * **weights-as-args**: ``bake_weights=False`` exports a function of
    ``(state, images)`` for weight-hot-swap serving (the caller feeds a
    freshly restored state; shapes/dtypes must match the export-time state).

Batch handling: a fixed ``batch_size`` exports a static program (fastest);
``batch_size=None`` uses a symbolic batch dimension, letting one artifact
serve any batch size XLA can compile at load time.

The exported computation is the method's ``eval_step`` minus the final
argmax: in-graph test-time preprocessing (resize + normalize, the method's
``augment(train=False)``) followed by ``eval_logits`` with the seen-class
mask — exactly what the Trainer's validation path runs
(core/method.py:397-400, reference core/trainer.py inference).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _infer_fn(method, state, task_id: int):
    """Logits function for serving: preprocess + eval_logits (no argmax, so
    downstream consumers can calibrate / top-k)."""

    def run(st, images):
        x = method.augment(None, images, train=False)
        return method.eval_logits(st, x, task_id)

    return run


def export_inference(
    method,
    state,
    *,
    image_hw: Sequence[int],
    batch_size: Optional[int] = 32,
    task_id: int = -1,
    bake_weights: bool = True,
    platforms: Sequence[str] = ("tpu", "cpu"),
    in_dtype=jnp.float32,
) -> bytes:
    """Serialize the inference program to a StableHLO artifact.

    ``image_hw``: (H, W, C) of the RAW input images (pre-resize — the
    in-graph eval transforms handle resize/normalize).  Returns the
    serialized bytes; write them to disk for deployment.
    """
    h, w, c = image_hw
    bdim = (
        jax_export.symbolic_shape("b")[0] if batch_size is None else batch_size
    )
    img_spec = jax.ShapeDtypeStruct((bdim, h, w, c), in_dtype)
    run = _infer_fn(method, state, task_id)

    if bake_weights:
        fn = jax.jit(lambda images: run(state, images))
        exp = jax_export.export(fn, platforms=tuple(platforms))(img_spec)
    else:
        # the TrainState dataclass isn't registered for export
        # serialization — ship the function over its flattened leaves (a
        # plain tuple pytree) and rebuild the state inside the program
        leaves, treedef = jax.tree_util.tree_flatten(state)
        leaf_spec = tuple(
            jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
            for x in leaves
        )

        def fn(leaf_tuple, images):
            st = jax.tree_util.tree_unflatten(treedef, list(leaf_tuple))
            return run(st, images)

        exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
            leaf_spec, img_spec
        )
    return bytes(exp.serialize())


@dataclasses.dataclass
class ServingModel:
    """Thin wrapper over a deserialized artifact: ``model(images)`` (baked)
    or ``model(state, images)`` (weights-as-args) -> logits."""

    exported: Any

    @classmethod
    def load(cls, blob: bytes) -> "ServingModel":
        return cls(jax_export.deserialize(blob))

    def __call__(self, *args):
        if len(args) == 2:  # weights-as-args artifact: (state, images)
            state, images = args
            leaves = tuple(jax.tree_util.tree_leaves(state))
            return self.exported.call(leaves, images)
        return self.exported.call(*args)

    @property
    def platforms(self):
        return self.exported.platforms


def export_from_trainer(trainer, **kw) -> bytes:
    """Convenience: export the trainer's current method/state.

    ``image_hw`` defaults to the dataset's STORED geometry (what the live
    eval path feeds the in-graph transforms — trainer.py reads
    ``train_stream.task(0).images.shape[1:]``), not the post-resize
    ``image_size`` target: a ViT-on-CIFAR config stores 32x32 and resizes
    to 224 inside the graph, so the artifact must accept 32x32.
    """
    cfg = trainer.config
    hw = kw.pop("image_hw", None)
    if hw is None:
        stream = getattr(trainer, "train_stream", None)
        if stream is not None:
            hw = tuple(int(d) for d in stream.task(0).images.shape[1:])
        else:  # config-only fallback
            hw = (int(cfg["image_size"]), int(cfg["image_size"]), 3)
    return export_inference(trainer.method, trainer.state, image_hw=hw, **kw)
