"""ResNet with CBAM channel+spatial attention
(reference core/model/backbone/resnet_cbam.py:31-275), Flax re-design."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ChannelGate(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp = nn.Sequential([nn.Dense(c // self.reduction), nn.relu, nn.Dense(c)])
        scale = nn.sigmoid(mlp(avg) + mlp(mx))
        return x * scale[:, None, None, :]


class SpatialGate(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([mx, avg], axis=-1)
        s = nn.Conv(1, (7, 7), use_bias=False)(s)
        # batch stats in training, running stats at eval — same as every
        # other BN in this file (reference BasicConv's BatchNorm2d)
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9)(s)
        return x * nn.sigmoid(s)


class CBAMBasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9)
        conv = partial(nn.Conv, use_bias=False)
        residual = x
        y = conv(self.filters, (3, 3), (self.strides, self.strides))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3))(y)
        y = norm()(y)
        y = ChannelGate()(y)
        y = SpatialGate()(y, train=train)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), (self.strides, self.strides))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class CBAMResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_filters: int = 64
    cifar_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9)
        x = x.astype(jnp.float32)
        if self.cifar_stem:
            x = nn.Conv(self.num_filters, (3, 3), use_bias=False)(x)
        else:
            x = nn.Conv(self.num_filters, (7, 7), (2, 2), use_bias=False)(x)
        x = norm()(x)
        x = nn.relu(x)
        if not self.cifar_stem:
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = CBAMBasicBlock(self.num_filters * 2**i, strides)(x, train=train)
        return {"features": jnp.mean(x, axis=(1, 2))}
