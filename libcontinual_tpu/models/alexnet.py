"""AlexNet backbones for the gradient-projection family (GPM/TRGP/API).

Re-design of reference core/model/backbone/alexnet.py: a 3-conv/2-fc AlexNet
(64k4, 128k3, 256k2 valid convs + 2048-2048 fc; batch-norm WITHOUT running
stats — the reference uses batch statistics even at eval,
``track_running_stats=False``, alexnet.py:102-113).

TPU re-design decisions:
  * activation capture for the GPM SVD is a forward flag that returns every
    projected layer's *input* alongside features (the reference stashes them
    on module attributes, alexnet.py:36-38,84-86);
  * TRGP's trust-region scales are expressed OUTSIDE the module: methods
    compute an effective weight ``W_eff = W + W_eff @ U (Q - I) U^T`` per
    selected subspace (reference alexnet.py:40-56) and pass the five layer
    weights in explicitly via ``weight_override``. This keeps one compiled
    forward for all tasks (spaces/Q are fixed-shape padded arrays).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from libcontinual_tpu.registry import BACKBONES

# layer geometry for 32x32 inputs (reference gpm.py:146-149)
CONV_SPECS = [
    dict(features=64, kernel=4, in_ch=3, out_hw=29),
    dict(features=128, kernel=3, in_ch=64, out_hw=12),
    dict(features=256, kernel=2, in_ch=128, out_hw=5),
]
FC_SPECS = [dict(features=2048, in_dim=1024), dict(features=2048, in_dim=2048)]
LAYER_IN_FLAT = [3 * 16, 64 * 9, 128 * 4, 1024, 2048]


class _BatchStatsNorm(nn.Module):
    """BatchNorm that always uses batch statistics (track_running_stats=False)."""

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class AlexNetTRGP(nn.Module):
    """Returns {'features', 'layer_inputs'}; layer_inputs are the inputs of
    the 5 projected layers (for GPM activation SVDs)."""

    dropout1: float = 0.2
    dropout2: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = True,
        capture: bool = False,
        weight_override: Optional[List[jax.Array]] = None,
    ):
        captured = []
        wo = weight_override

        def conv(i, x, spec):
            k = spec["kernel"]
            kernel = self.param(
                f"conv{i}_kernel",
                nn.initializers.kaiming_normal(),
                (k, k, spec["in_ch"], spec["features"]),
            )
            if wo is not None and wo[i] is not None:
                kernel = wo[i].reshape(kernel.shape)
            if capture:
                captured.append(x)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fc(i, x, spec):
            kernel = self.param(
                f"fc{i}_kernel",
                nn.initializers.kaiming_normal(),
                (spec["in_dim"], spec["features"]),
            )
            if wo is not None and wo[i] is not None:
                kernel = wo[i].reshape(kernel.shape)
            if capture:
                captured.append(x)
            return x.astype(self.dtype) @ kernel.astype(self.dtype)

        # dropout active only when a 'dropout' rng is provided at train time
        has_drop = train and self.has_rng("dropout")
        for i, spec in enumerate(CONV_SPECS):
            x = conv(i, x, spec)
            x = _BatchStatsNorm(name=f"bn{i}")(x)
            x = nn.relu(x)
            rate = self.dropout1 if i < 2 else self.dropout2
            x = nn.Dropout(rate, deterministic=not has_drop, name=f"drop{i}")(x)
            x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        for j, spec in enumerate(FC_SPECS):
            x = fc(3 + j, x, spec)
            x = _BatchStatsNorm(name=f"bn{3 + j}")(x)
            x = nn.relu(x)
            x = nn.Dropout(
                self.dropout2, deterministic=not has_drop, name=f"drop{3 + j}"
            )(x)
        out = {"features": x.astype(jnp.float32)}
        if capture:
            out["layer_inputs"] = captured
        return out


@BACKBONES.register("AlexNet_TRGP", aliases=("alexnet_trgp", "AlexNet"))
def alexnet_trgp(**kwargs):
    # dropout rates are ctor args upstream too (reference alexnet.py:96
    # dropout_rate_1/dropout_rate_2) — accept both spellings
    return AlexNetTRGP(
        dtype=kwargs.get("dtype", jnp.float32),
        dropout1=float(kwargs.get("dropout1", kwargs.get("dropout_rate_1", 0.2))),
        dropout2=float(kwargs.get("dropout2", kwargs.get("dropout_rate_2", 0.5))),
    )


class AlexNetAPI(nn.Module):
    """API's input-expandable AlexNet (reference alexnet.py:100-303).

    The reference grows each projected layer's INPUT side: forward
    concatenates ``[x] + [x @ w_t for t in expansions]`` where each ``w_t``
    is a learnable channel-mix matrix initialized from the top singular
    vectors of a channel-importance matrix, and ``duplicate`` widens the
    layer weight's input dimension (Conv2d_API/Linear_API, alexnet.py
    :160-232). Output widths never change.

    Fixed-shape TPU formulation: every kernel is preallocated with
    ``base_in + slots*k_slot`` input dims and ``extra_ws`` is a per-layer
    ``(slots, base_in, k_slot)`` parameter slab; ``ws_mask`` (one
    ``(slots, k_slot)`` float array per layer, passed as input) gates which
    extra inputs exist, so expansion is a mask flip + slab write and one
    compiled step serves the whole run. Inactive extras are exactly zero,
    so their kernel columns receive zero gradient until activated.
    """

    slots: int = 9  # task_num - 1 expansion slots
    k_slot: int = 5  # max extras per task: ceil(step*K), 5 at the
    # reference's hardcoded step=0.5, K=10 (api.py:60-61); sized from the
    # method config by alexnet_api()
    dropout1: float = 0.2
    dropout2: float = 0.5
    dtype: Any = jnp.float32

    BASE_IN = (3, 64, 128, 1024, 2048)

    @property
    def extra_in(self) -> int:
        return self.slots * self.k_slot

    def in_flats(self):
        E = self.extra_in
        return [
            (3 + E) * 16, (64 + E) * 9, (128 + E) * 4,
            1024 + E, 2048 + E,
        ]

    @nn.compact
    def __call__(self, x, ws_mask, train: bool = True, capture: bool = False):
        captured = []
        E = self.extra_in
        has_drop = train and self.has_rng("dropout")

        def expanded(i, x):
            """cat([x] + masked channel-mixes) along the feature axis."""
            base = self.BASE_IN[i]
            ws = self.param(
                f"ws{i}", nn.initializers.zeros,
                (self.slots, base, self.k_slot),
            )
            m = ws_mask[i]  # (slots, k_slot)
            if x.ndim == 4:
                ex = jnp.einsum(
                    "bhwc,scj->bhwsj", x.astype(self.dtype),
                    ws.astype(self.dtype),
                )
                ex = ex * m[None, None, None, :, :].astype(self.dtype)
                ex = ex.reshape(x.shape[0], x.shape[1], x.shape[2], E)
            else:
                ex = jnp.einsum(
                    "bc,scj->bsj", x.astype(self.dtype), ws.astype(self.dtype)
                )
                ex = ex * m[None, :, :].astype(self.dtype)
                ex = ex.reshape(x.shape[0], E)
            return jnp.concatenate([x.astype(self.dtype), ex], axis=-1)

        for i, spec in enumerate(CONV_SPECS):
            k = spec["kernel"]
            x = expanded(i, x)
            kernel = self.param(
                f"conv{i}_kernel", nn.initializers.kaiming_normal(),
                (k, k, self.BASE_IN[i] + E, spec["features"]),
            )
            if capture:
                captured.append(x)
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = _BatchStatsNorm(name=f"bn{i}")(x)
            x = nn.relu(x)
            rate = self.dropout1 if i < 2 else self.dropout2
            x = nn.Dropout(rate, deterministic=not has_drop, name=f"drop{i}")(x)
            x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*256) = (B, 1024)
        for j in range(2):
            x = expanded(3 + j, x)
            kernel = self.param(
                f"fc{3 + j}_kernel", nn.initializers.kaiming_normal(),
                (self.BASE_IN[3 + j] + E, FC_SPECS[j]["features"]),
            )
            if capture:
                captured.append(x)
            x = x @ kernel.astype(self.dtype)
            x = _BatchStatsNorm(name=f"bn{3 + j}")(x)
            x = nn.relu(x)
            x = nn.Dropout(
                self.dropout2, deterministic=not has_drop, name=f"drop{3 + j}"
            )(x)
        out = {"features": x.astype(jnp.float32)}
        if capture:
            out["layer_inputs"] = captured
        return out


@BACKBONES.register("AlexNet_API", aliases=("alexnet_api",))
def alexnet_api(**kwargs):
    return AlexNetAPI(
        slots=int(kwargs.get("task_num", 10)) - 1,
        k_slot=int(kwargs.get("k_slot", 5)),
        dtype=kwargs.get("dtype", jnp.float32),
    )


def conv_patches(x: jax.Array, kernel: int) -> jax.Array:
    """im2col: (B, H, W, C) -> (B*out_h*out_w, kh*kw*C) valid patches, in the
    SAME flattening order as the flax conv kernel (kh, kw, C) so the GPM
    projection bases match the flattened weight-gradient rows (the
    reference's nested python loops, gpm.py:156-166, as one XLA op)."""
    c = x.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (kernel, kernel), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, oh, ow, C*kh*kw) with channel-major feature order
    b, oh, ow, _ = patches.shape
    patches = patches.reshape(b, oh, ow, c, kernel, kernel)
    patches = patches.transpose(0, 1, 2, 4, 5, 3)  # -> (..., kh, kw, C)
    return patches.reshape(-1, kernel * kernel * c)
