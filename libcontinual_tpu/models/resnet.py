"""Flax ResNet family.

Re-design of reference core/model/backbone/resnet.py (778 LoC of torchvision
forks) as parameterized Flax modules:

  * ``ResNet``: torchvision-style resnet18/34/50 with a CIFAR stem option
    (3x3 stride-1 conv, no maxpool) selected by the ``dataset`` arg, as the
    reference does for 32x32 inputs;
  * ``CifarResNet``: the depth-(6n+2) CIFAR architecture behind
    cifar_resnet20/32 (reference resnet.py:755-772), feat_dim 64;
  * ``last_relu=False`` reproduces LUCIR's ``modified_ResNet`` whose final
    block omits the last ReLU so cosine features keep sign information
    (reference resnet.py:473-577);
  * ``width`` scales channels: ResNet_AML's 20-filter slim net
    (reference resnet.py:690-753) is ``width=20/64``.

TPU notes: NHWC layout (XLA's native conv layout), bf16 compute / f32 params
and batch-norm statistics, a single fused forward per block. Backbones return
``{"features": ...}`` dicts, matching the reference's consumption contract
(``backbone(x)['features']``, reference finetune.py:19).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from libcontinual_tpu.registry import BACKBONES

ModuleDef = Any


def _torch_pad(kernel):
    """Symmetric (k-1)//2 padding — torch's ``padding=k//2`` convention.
    Flax's default ``SAME`` pads asymmetrically under stride 2 (0 before,
    1 after), which diverges from the reference on every strided conv."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


def _conv_factory(dtype):
    def conv(features, kernel, strides=(1, 1), **kw):
        kw.setdefault("padding", _torch_pad(kernel))
        return nn.Conv(
            features, kernel, strides, use_bias=False, dtype=dtype,
            kernel_init=nn.initializers.kaiming_normal(), **kw,
        )
    return conv


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    last_relu: bool = True
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm(scale_init=nn.initializers.ones)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides), name="downsample"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        y = y + residual
        return nn.relu(y) if self.last_relu else y


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    last_relu: bool = True
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.ones)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), (self.strides, self.strides), name="downsample"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        y = y + residual
        return nn.relu(y) if self.last_relu else y


class _Im2ColStem(nn.Module):
    """3x3 stride-1 pad-1 conv expressed as im2col + one dense matmul —
    bit-identical math, same param path/shape (``kernel`` (3,3,C,F)) as the
    nn.Conv form, so checkpoints are interchangeable."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(), (3, 3, c, self.features)
        )
        pat = jax.lax.conv_general_dilated_patches(
            x.astype(self.dtype), (3, 3), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H, W, C*9) channel-major feature order
        b, h, w, f = pat.shape
        kf = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(f, self.features)
        out = pat.reshape(-1, f) @ kf.astype(self.dtype)
        return out.reshape(b, h, w, self.features)


class ResNet(nn.Module):
    """torchvision-style ResNet with optional CIFAR stem."""

    stage_sizes: Sequence[int]
    block: Any = BasicBlock
    num_filters: int = 64
    cifar_stem: bool = False
    last_relu: bool = True  # False => LUCIR modified_ResNet final block
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = _conv_factory(self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        if self.cifar_stem:
            import os

            if os.environ.get("LIBCONTINUAL_STEM") == "matmul":
                # exact im2col form of the 3x3 stride-1 stem: the 3-channel
                # input pads 3->8 sublanes in conv form; as a (B*H*W, 27)
                # @ (27, 64) matmul the rows are dense (A/B-able lever for
                # the conv-bound resnet workloads; see BASELINE.md round-3).
                # Same param path/shape (conv_stem/kernel) as the conv form.
                x = _Im2ColStem(
                    self.num_filters, dtype=self.dtype, name="conv_stem"
                )(x)
            else:
                x = conv(self.num_filters, (3, 3), name="conv_stem")(x)
            x = norm(name="bn_stem")(x)
            x = nn.relu(x)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2), name="conv_stem")(x)
            x = norm(name="bn_stem")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                is_last = i == len(self.stage_sizes) - 1 and j == n_blocks - 1
                x = self.block(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    last_relu=self.last_relu or not is_last,
                    conv=conv,
                    norm=norm,
                )(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return {"features": feats}


class CifarResNet(nn.Module):
    """Depth-(6n+2) CIFAR ResNet (cifar_resnet20/32), feat_dim 64."""

    depth: int = 32
    num_filters: int = 16
    last_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = (self.depth - 2) // 6
        conv = _conv_factory(self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(self.num_filters, (3, 3), name="conv_stem")(x)
        x = norm(name="bn_stem")(x)
        x = nn.relu(x)
        for i in range(3):
            for j in range(n):
                strides = 2 if i > 0 and j == 0 else 1
                is_last = i == 2 and j == n - 1
                x = BasicBlock(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    last_relu=self.last_relu or not is_last,
                    conv=conv,
                    norm=norm,
                )(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return {"features": feats}


def _is_cifar(kwargs) -> bool:
    args = kwargs.get("args") or {}
    ds = str(args.get("dataset", kwargs.get("dataset", "")))
    return "cifar" in ds


def _resnet(stage_sizes, block, kwargs, **over):
    return ResNet(
        stage_sizes=stage_sizes,
        block=block,
        cifar_stem=_is_cifar(kwargs),
        dtype=kwargs.get("dtype", jnp.bfloat16),
        **over,
    )


@BACKBONES.register("resnet18")
def resnet18(**kwargs):
    return _resnet([2, 2, 2, 2], BasicBlock, kwargs)


@BACKBONES.register("resnet34")
def resnet34(**kwargs):
    return _resnet([3, 4, 6, 3], BasicBlock, kwargs)


@BACKBONES.register("resnet50")
def resnet50(**kwargs):
    return _resnet([3, 4, 6, 3], Bottleneck, kwargs)


@BACKBONES.register("resnet18_lucir")
def resnet18_lucir(**kwargs):
    """LUCIR's modified resnet: no ReLU after the last block
    (reference resnet.py:473-577)."""
    return _resnet([2, 2, 2, 2], BasicBlock, kwargs, last_relu=False)


@BACKBONES.register("resnet18_AML", aliases=("resnet18_aml",))
def resnet18_aml(**kwargs):
    """Slim 20-filter resnet18 used by ER-ACE/ER-AML
    (reference resnet.py:690-753), feat_dim 160."""
    return _resnet([2, 2, 2, 2], BasicBlock, dict(kwargs, args={"dataset": "cifar"}),
                   num_filters=20)


@BACKBONES.register("cifar_resnet20")
def cifar_resnet20(**kwargs):
    return CifarResNet(depth=20, dtype=kwargs.get("dtype", jnp.bfloat16))


@BACKBONES.register("cifar_resnet32")
def cifar_resnet32(**kwargs):
    return CifarResNet(depth=32, dtype=kwargs.get("dtype", jnp.bfloat16))


@BACKBONES.register("cifar_resnet32_lucir", aliases=("resnet32_V2",))
def cifar_resnet32_lucir(**kwargs):
    """resnet32_V2 is the reference's LUCIR factory (resnet.py:769-773):
    modified_ResNet with no ReLU after the last block."""
    return CifarResNet(
        depth=32, last_relu=False, dtype=kwargs.get("dtype", jnp.bfloat16)
    )


@BACKBONES.register("resnet18_cbam")
def resnet18_cbam(**kwargs):
    from libcontinual_tpu.models.cbam import CBAMResNet

    return CBAMResNet(stage_sizes=[2, 2, 2, 2], cifar_stem=_is_cifar(kwargs))


class PreActBasicBlock(nn.Module):
    """Pre-activation block (bn-relu-conv twice, conv-only shortcut from the
    raw input) — reference BasicBlock2 (resnet.py:589-620)."""

    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.norm()(x)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides),
                name="downsample",
            )(x)
        return y + residual


class PreActCifarResNet(nn.Module):
    """BIC's pre-activation CIFAR ResNet — reference ResNet_BIC
    (resnet.py:622-688): bare conv stem, BasicBlock2 stages, one final
    bn+relu before global average pooling. feat_dim 64."""

    depth: int = 32
    num_filters: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = (self.depth - 2) // 6
        conv = _conv_factory(self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(self.num_filters, (3, 3), name="conv_stem")(x)
        for i in range(3):
            for j in range(n):
                x = PreActBasicBlock(
                    filters=self.num_filters * 2**i,
                    strides=2 if i > 0 and j == 0 else 1,
                    conv=conv,
                    norm=norm,
                )(x)
        x = norm(name="bn_final")(x)
        x = nn.relu(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return {"features": feats}


@BACKBONES.register("cifar_resnet32_V2", aliases=("cifar_resnet32_bic",))
def cifar_resnet32_bic(**kwargs):
    """cifar_resnet32_V2 is the reference's BIC factory (resnet.py:765-767)
    building the pre-activation ResNet_BIC; the bias-correction layers live
    in our bic method."""
    return PreActCifarResNet(depth=32, dtype=kwargs.get("dtype", jnp.bfloat16))


class TinyCNN(nn.Module):
    """Minimal conv net for fast unit tests (not part of the reference zoo)."""

    num_filters: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_filters, (3, 3), (2, 2), use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_filters * 2, (3, 3), (2, 2), use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return {"features": feats}


@BACKBONES.register("tiny_cnn")
def tiny_cnn(**kwargs):
    return TinyCNN(dtype=kwargs.get("dtype", jnp.float32))


FEATURE_DIMS = {
    "tiny_cnn": 32,
    "AlexNet_TRGP": 2048,
    "alexnet_trgp": 2048,
    "ViTZoo": 768,
    "ViT_in21k_adapter": 768,
    "vit_tiny_test": 64,
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet18_lucir": 512,
    "resnet18_AML": 160,
    "cifar_resnet20": 64,
    "cifar_resnet32": 64,
    "cifar_resnet32_V2": 64,
    "cifar_resnet32_bic": 64,
    "cifar_resnet32_lucir": 64,
    "resnet32_V2": 64,
    "resnet18_cbam": 512,
    "vit_pt_imnet": 768,
    "vit_cl_lora": 768,
    "ViT_CL_LoRA": 768,
    "SiNet_vit": 768,
    "vit_inflora": 768,
    # registry aliases and remaining registered names, so feat_dim inference
    # works for every spelling a config may use
    "vit_base_patch16_224": 768,
    "vit-b-16": 768,
    "vit_pt_imnet_dap": 768,
    "vit_ssf": 768,
    "vit_vpt": 768,
    "resnet18_aml": 160,
    "AlexNet": 2048,
    "AlexNet_API": 2048,
    "alexnet_api": 2048,
    "clip": 512,
    "Clip": 512,
    "CLIP": 512,
    "clip_tiny_test": 32,
}
