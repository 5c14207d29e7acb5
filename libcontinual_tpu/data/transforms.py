"""In-graph, batched image transforms (the TPU-native data augmentation path).

The reference runs torchvision transforms per-sample on CPU workers
(reference core/data/dataloader.py:17-38, core/data/data.py). Here every
transform is a pure JAX op over a whole uint8 NHWC batch, so augmentation
fuses into the jitted train step and runs on the VPU — no host preprocessing,
no transfer of float images (uint8 goes over PCIe, 4x smaller).

Transform math mirrors torchvision semantics (RandomCrop padding, a
RandomResizedCrop with log-uniform aspect + uniform-area sampling, ColorJitter
brightness/contrast/saturation factors), and the normalization constants come
from the reference's preset tables (reference core/data/data.py:4-340).

Documented distribution-level deviations from torchvision (round-3 audit;
all are sampling-noise-scale, none change the transform family):
  * RandomResizedCrop samples ONE box (clamped-fit fallback) where
    torchvision rejection-samples up to 10 times then center-crops
    (~2-3% of draws differ in box distribution at the shipped
    scale/ratio), keeps continuous box sizes where torchvision rounds to
    integer pixels, and resamples with exact 2-tap bilinear where PIL
    antialiases when downscaling;
  * ColorJitter applies brightness->contrast->saturation->hue in fixed
    order with one final clamp, where torchvision permutes the op order
    per call and clamps after each op — every shipped config uses a
    single jitter component (PRAKA: brightness only), where order cannot
    matter;
  * hue shifts rotate in YIQ space rather than PIL's HSV round-trip (no
    shipped config uses hue).

A pipeline is compiled from a YAML list (the ``train_trfms:``/``test_trfms:``
schema of reference core/data/dataloader.py:17-38) into a single
``fn(rng, uint8_images) -> float_images`` callable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
TransformFn = Callable[[Array, Array], Array]  # (rng, images NHWC f32) -> images

# Normalization presets, mirroring reference core/data/data.py.
NORM_PRESETS = {
    "cifar": ([0.5071, 0.4866, 0.4409], [0.2675, 0.2565, 0.2761]),
    "imagenet": ([0.4914, 0.4822, 0.4465], [0.2023, 0.1994, 0.2010]),
    "none": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    "alexnet_cifar": (
        [125.3 / 255, 123.0 / 255, 113.9 / 255],
        [63.0 / 255, 62.1 / 255, 66.7 / 255],
    ),
    "clip": (
        [0.48145466, 0.4578275, 0.40821073],
        [0.26862954, 0.26130258, 0.27577711],
    ),
    "imagenet_default": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
}


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


# ------------------------------------------------------------------ primitives


def resize(images: Array, size, method: str = "bilinear") -> Array:
    h, w = _pair(size)
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, h, w, c), method=method, antialias=True)


def center_crop(images: Array, size) -> Array:
    th, tw = _pair(size)
    _, h, w, _ = images.shape
    if h < th or w < tw:
        images = _pad_to(images, max(h, th), max(w, tw))
        _, h, w, _ = images.shape
    i, j = (h - th) // 2, (w - tw) // 2
    return images[:, i : i + th, j : j + tw, :]


def _pad_to(images: Array, h: int, w: int) -> Array:
    b, ih, iw, c = images.shape
    ph, pw = max(0, h - ih), max(0, w - iw)
    return jnp.pad(
        images, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    )


def random_crop(rng: Array, images: Array, size, padding: int = 0) -> Array:
    """torchvision RandomCrop(size, padding): zero-pad then random offset.

    The offset selection runs as two one-hot einsums on the MXU rather than
    a vmapped dynamic_slice: batched slices lower to gathers, which
    measured 3.2 ms for a 128x(32x32) crop on the chip — costlier than the
    entire resnet18 fwd+bwd (2.96 ms) and the dominant term of the
    rehearsal-family train step (tools/profile_icarl_step.py). The einsums
    are ~70 MFLOP and bit-exact (one-hot selectors, HIGHEST precision),
    same trick crop_and_resize already uses for its bilinear taps."""
    th, tw = _pair(size)
    if padding:
        images = jnp.pad(
            images, ((0, 0), (padding, padding), (padding, padding), (0, 0))
        )
    b, h, w, c = images.shape
    k1, k2 = jax.random.split(rng)
    ys = jax.random.randint(k1, (b,), 0, h - th + 1)
    xs = jax.random.randint(k2, (b,), 0, w - tw + 1)
    dt = images.dtype
    sel_y = (
        jnp.arange(h)[None, None, :]
        == ys[:, None, None] + jnp.arange(th)[None, :, None]
    ).astype(dt)
    sel_x = (
        jnp.arange(w)[None, None, :]
        == xs[:, None, None] + jnp.arange(tw)[None, :, None]
    ).astype(dt)
    hi = jax.lax.Precision.HIGHEST  # exact f32: selection must be lossless
    rows = jnp.einsum("bih,bhwc->biwc", sel_y, images, precision=hi)
    return jnp.einsum("bjw,biwc->bijc", sel_x, rows, precision=hi)


def random_hflip(rng: Array, images: Array, p: float = 0.5) -> Array:
    b = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (b,))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


def crop_and_resize(images: Array, boxes: Array, out_size: Tuple[int, int]) -> Array:
    """Bilinear crop-and-resize with per-example boxes (y0, x0, h, w) in pixels.

    The static-shape equivalent of torchvision's variable-size crops: sample a
    (th, tw) grid inside each box and gather with bilinear interpolation.
    """
    b, h, w, c = images.shape
    th, tw = out_size
    y0, x0, bh, bw = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ty = jnp.linspace(0.0, 1.0, th)
    tx = jnp.linspace(0.0, 1.0, tw)
    # per-example source coordinates
    ys = y0[:, None] + ty[None, :] * (bh[:, None] - 1.0)  # (B, th)
    xs = x0[:, None] + tx[None, :] * (bw[:, None] - 1.0)  # (B, tw)

    # Bilinear sampling as two batched matmuls with per-example
    # interpolation matrices (each row has the two taps (1-w, w)):
    # out = Ry @ img @ Rx^T. The separable form is algebraically identical
    # to the 4-tap gather but runs on the MXU instead of as vector gathers
    # (measured ~6x faster at 32->224/B=128 on v5e; gathers dominate the
    # augment stage otherwise).
    def interp_matrix(coords, src):
        c0 = jnp.floor(coords)
        frac = coords - c0
        i0 = jnp.clip(c0.astype(jnp.int32), 0, src - 1)
        i1 = jnp.clip(i0 + 1, 0, src - 1)
        oh0 = jax.nn.one_hot(i0, src, dtype=jnp.float32)  # (B, t, src)
        oh1 = jax.nn.one_hot(i1, src, dtype=jnp.float32)
        return oh0 * (1.0 - frac)[..., None] + oh1 * frac[..., None]

    ry = interp_matrix(ys, h)  # (B, th, h)
    rx = interp_matrix(xs, w)  # (B, tw, w)
    imgs = images if jnp.issubdtype(images.dtype, jnp.floating) else images.astype(jnp.float32)
    t = jnp.einsum("bqh,bhwc->bqwc", ry, imgs)
    return jnp.einsum("bqwc,bpw->bqpc", t, rx).astype(imgs.dtype)


def random_resized_crop(
    rng: Array,
    images: Array,
    size,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Array:
    """torchvision RandomResizedCrop: uniform area in ``scale``, log-uniform
    aspect in ``ratio``; fall back to center crop when the box doesn't fit."""
    th, tw = _pair(size)
    b, h, w, _ = images.shape
    area = float(h * w)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    target_area = area * jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    bw = jnp.sqrt(target_area * aspect)
    bh = jnp.sqrt(target_area / aspect)
    ok = (bw <= w) & (bh <= h)
    # fallback: clamp to fit, centered (torchvision center-crops on failure)
    bw = jnp.where(ok, bw, jnp.minimum(float(w), float(h) * aspect))
    bh = jnp.where(ok, bh, jnp.minimum(float(h), float(w) / aspect))
    y0max = jnp.maximum(h - bh, 0.0)
    x0max = jnp.maximum(w - bw, 0.0)
    y0 = jax.random.uniform(k3, (b,)) * y0max
    x0 = jax.random.uniform(k4, (b,)) * x0max
    y0 = jnp.where(ok, y0, y0max / 2.0)
    x0 = jnp.where(ok, x0, x0max / 2.0)
    boxes = jnp.stack([y0, x0, bh, bw], axis=1)
    return crop_and_resize(images, boxes, (th, tw))


def _rgb_to_gray(images: Array) -> Array:
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def color_jitter(
    rng: Array,
    images: Array,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
) -> Array:
    """torchvision ColorJitter with factor sampling in [max(0,1-v), 1+v]."""
    b = images.shape[0]
    keys = jax.random.split(rng, 4)

    def factor(key, v):
        return jax.random.uniform(
            key, (b, 1, 1, 1), minval=max(0.0, 1.0 - v), maxval=1.0 + v
        )

    if brightness:
        images = images * factor(keys[0], brightness)
    if contrast:
        mean = jnp.mean(_rgb_to_gray(images), axis=(1, 2, 3), keepdims=True)
        images = (images - mean) * factor(keys[1], contrast) + mean
    if saturation:
        gray = _rgb_to_gray(images)
        f = factor(keys[2], saturation)
        images = gray + (images - gray) * f
    if hue:
        theta = jax.random.uniform(
            keys[3], (b, 1, 1), minval=-hue, maxval=hue
        ) * (2.0 * jnp.pi)
        # hue rotation in YIQ space
        y = _rgb_to_gray(images)[..., 0]
        r, g, bl = images[..., 0], images[..., 1], images[..., 2]
        i = 0.596 * r - 0.274 * g - 0.322 * bl
        q = 0.211 * r - 0.523 * g + 0.312 * bl
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i2 = i * cos - q * sin
        q2 = i * sin + q * cos
        r2 = y + 0.956 * i2 + 0.621 * q2
        g2 = y - 0.272 * i2 - 0.647 * q2
        b2 = y - 1.106 * i2 + 1.703 * q2
        images = jnp.stack([r2, g2, b2], axis=-1)
    return jnp.clip(images, 0.0, 1.0)


def random_grayscale(rng: Array, images: Array, p: float = 0.1) -> Array:
    b = images.shape[0]
    on = jax.random.bernoulli(rng, p, (b,))[:, None, None, None]
    gray = jnp.broadcast_to(_rgb_to_gray(images), images.shape)
    return jnp.where(on, gray, images)


def normalize(images: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


# ----------------------------------------------------------------- compilation


class Pipeline:
    """A compiled transform pipeline: ``(rng, uint8 NHWC) -> float NHWC``."""

    def __init__(self, steps: List[Tuple[str, Dict[str, Any]]], out_size=None):
        self.steps = steps
        self.out_size = out_size  # (h, w) after the pipeline, if known

    def __call__(self, rng: Optional[Array], images: Array) -> Array:
        x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images
        n_random = sum(1 for name, _ in self.steps if name.startswith("Random") or name == "ColorJitter")
        keys = (
            list(jax.random.split(rng, max(n_random, 1))) if rng is not None else []
        )
        ki = 0

        def next_key():
            nonlocal ki
            if not keys:
                raise ValueError("random transform in a deterministic pipeline")
            k = keys[ki]
            ki += 1
            return k

        for name, kw in self.steps:
            if name == "Resize":
                x = resize(x, kw.get("size"), kw.get("method", "bilinear"))
            elif name == "CenterCrop":
                x = center_crop(x, kw.get("size"))
            elif name == "RandomCrop":
                if rng is None:
                    x = center_crop(
                        jnp.pad(x, ((0, 0),) + ((kw.get("padding", 0),) * 2,) * 2 + ((0, 0),))
                        if kw.get("padding", 0)
                        else x,
                        kw.get("size"),
                    )
                else:
                    x = random_crop(next_key(), x, kw.get("size"), kw.get("padding", 0))
            elif name == "RandomHorizontalFlip":
                if rng is not None:
                    x = random_hflip(next_key(), x, kw.get("p", 0.5))
            elif name == "RandomResizedCrop":
                if rng is None:
                    x = resize(x, kw.get("size"))
                else:
                    x = random_resized_crop(
                        next_key(),
                        x,
                        kw.get("size"),
                        tuple(kw.get("scale", (0.08, 1.0))),
                        tuple(kw.get("ratio", (0.75, 4.0 / 3.0))),
                    )
            elif name == "ColorJitter":
                if rng is not None:
                    x = color_jitter(
                        next_key(),
                        x,
                        kw.get("brightness", 0.0),
                        kw.get("contrast", 0.0),
                        kw.get("saturation", 0.0),
                        kw.get("hue", 0.0),
                    )
            elif name == "RandomGrayscale":
                if rng is not None:
                    x = random_grayscale(next_key(), x, kw.get("p", 0.1))
            elif name == "Normalize":
                x = normalize(x, kw["mean"], kw["std"])
            elif name in ("ToTensor", "_convert_to_rgb", "_convert_image_to_rgb"):
                pass  # storage is already RGB float NHWC at this point
            else:
                raise ValueError(f"unknown transform '{name}'")
        return x


def build_transform(
    spec: Optional[List[Dict[str, Dict[str, Any]]]] = None,
    *,
    dataset: str = "cifar",
    backbone: str = "resnet",
    mode: str = "train",
    image_size: int = 32,
) -> Pipeline:
    """Build a pipeline from a ``train_trfms``-style YAML list, or from the
    reference's per-dataset x per-backbone presets (reference
    core/data/data.py:4-340, dataloader.py:57-74) when no list is given."""
    if spec is not None:
        steps = []
        for item in spec:
            for name, params in item.items():
                steps.append((name, dict(params or {})))
        return Pipeline(steps)

    rng_steps: List[Tuple[str, Dict[str, Any]]] = []
    ds = "cifar" if "cifar" in dataset else dataset
    if backbone == "vit":
        mean, std = NORM_PRESETS["none"]
        if mode == "train":
            rng_steps = [
                ("RandomResizedCrop", {"size": 224}),
                ("RandomHorizontalFlip", {}),
                ("Normalize", {"mean": mean, "std": std}),
            ]
        else:
            rng_steps = [
                ("Resize", {"size": 224}),
                ("Normalize", {"mean": mean, "std": std}),
            ]
            if ds != "cifar":
                rng_steps = [
                    ("Resize", {"size": 256}),
                    ("CenterCrop", {"size": 224}),
                    ("Normalize", {"mean": mean, "std": std}),
                ]
    elif backbone == "alexnet":
        mean, std = NORM_PRESETS["alexnet_cifar"]
        rng_steps = [("Normalize", {"mean": mean, "std": std})]
    elif backbone == "clip":
        mean, std = NORM_PRESETS["clip"]
        rng_steps = [
            ("Resize", {"size": image_size}),
            ("CenterCrop", {"size": image_size}),
            ("Normalize", {"mean": mean, "std": std}),
        ]
    else:  # resnet-style CNNs
        # dataset-specific stats mirror reference core/data/data.py exactly:
        # ImageNet/ImageNet-R use the CIFAR-10-like stats (reference
        # ImageNetTransform/ImageNetRTransform quirk, data.py:70,122);
        # tiny-imagenet uses the true ImageNet stats (data.py:193)
        if ds == "cifar":
            preset = "cifar"
        elif ds == "tiny-imagenet":
            preset = "imagenet_default"
        else:
            preset = "imagenet"
        mean, std = NORM_PRESETS[preset]
        if ds == "cifar":
            if mode == "train":
                rng_steps = [
                    ("RandomCrop", {"size": 32, "padding": 4}),
                    ("RandomHorizontalFlip", {}),
                    ("ColorJitter", {"brightness": 63 / 255}),
                    ("Normalize", {"mean": mean, "std": std}),
                ]
            else:
                rng_steps = [("Normalize", {"mean": mean, "std": std})]
        else:
            if mode == "train":
                rng_steps = [
                    ("RandomResizedCrop", {"size": 224}),
                    ("RandomHorizontalFlip", {}),
                    ("ColorJitter", {"brightness": 63 / 255}),
                    ("Normalize", {"mean": mean, "std": std}),
                ]
            else:
                rng_steps = [
                    ("Resize", {"size": 256}),
                    ("CenterCrop", {"size": 224}),
                    ("Normalize", {"mean": mean, "std": std}),
                ]
    return Pipeline(rng_steps)
