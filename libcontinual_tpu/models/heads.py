"""Classifier heads: Linear, CosineLinear (+ learnable sigma), distLinear,
BiasLayer — the head zoo of reference core/model/backbone/resnet.py:418-620.

All heads are allocated at full ``num_class`` width up front; task growth is
expressed by masking logits, never by re-allocating parameters (this is what
makes the whole task sequence one compiled program).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearHead(nn.Module):
    num_class: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        return nn.Dense(
            self.num_class,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_uniform(),
        )(feats)


class CosineLinear(nn.Module):
    """Cosine-similarity classifier with learnable scale sigma
    (reference backbone/resnet.py:418-441, used by LUCIR/ICarl variants)."""

    num_class: int
    sigma: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        w = self.param(
            "kernel",
            nn.initializers.kaiming_uniform(),
            (feats.shape[-1], self.num_class),
        )
        f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        wn = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
        out = jnp.dot(f.astype(self.dtype), wn.astype(self.dtype))
        if self.sigma:
            s = self.param("sigma", nn.initializers.ones, ())
            out = out * s
        return out.astype(jnp.float32)


class DistLinear(nn.Module):
    """ER-ACE/ER-AML's ``distLinear`` cosine head with fixed scale 10 when
    class-wise norm is disabled (reference core/model/erace.py:19-37)."""

    num_class: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, feats):
        w = self.param(
            "kernel",
            nn.initializers.kaiming_uniform(),
            (feats.shape[-1], self.num_class),
        )
        f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-5)
        wn = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-5)
        return self.scale * jnp.dot(f, wn)


def bias_correct(logits: jax.Array, alphas: jax.Array, betas: jax.Array,
                 task_of_class: jax.Array) -> jax.Array:
    """Apply BiC per-task bias layers ``alpha * logit + beta``
    (reference backbone/resnet.py:579-587) with per-class task assignment."""
    a = alphas[task_of_class]  # (num_class,)
    b = betas[task_of_class]
    return logits * a + b
