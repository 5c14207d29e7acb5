"""Backbone factory (explicit-registry replacement for reference
core/model/backbone/__init__.py:13-30's ``eval``-based lookup)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from libcontinual_tpu.registry import BACKBONES

# importing modules populates the registry
from libcontinual_tpu.models import resnet as _resnet  # noqa: F401
from libcontinual_tpu.models import vit as _vit  # noqa: F401
from libcontinual_tpu.models import alexnet as _alexnet  # noqa: F401
from libcontinual_tpu.models import clip as _clip  # noqa: F401


def get_backbone(config: Dict[str, Any]):
    """Build the backbone module from ``config['backbone']`` = {name, kwargs}."""
    node = config["backbone"]
    name = node["name"]
    kwargs = dict(node.get("kwargs") or {})
    kwargs.pop("num_classes", None)  # heads are owned by methods, not backbones
    dtype = jnp.bfloat16 if str(config.get("dtype", "bfloat16")) == "bfloat16" else jnp.float32
    kwargs.setdefault("dataset", config.get("dataset", ""))
    try:
        return BACKBONES.get(name)(dtype=dtype, **kwargs)
    except TypeError:
        return BACKBONES.get(name)(**kwargs)


def backbone_feat_dim(config: Dict[str, Any]) -> int:
    """Feature dim: from classifier kwargs (the reference's contract) or the
    known table."""
    cls_kwargs = (config.get("classifier") or {}).get("kwargs") or {}
    if "feat_dim" in cls_kwargs:
        return int(cls_kwargs["feat_dim"])
    name = config["backbone"]["name"]
    from libcontinual_tpu.models.resnet import FEATURE_DIMS

    if name in FEATURE_DIMS:
        return FEATURE_DIMS[name]
    raise ValueError(f"cannot infer feat_dim for backbone '{name}'")
