"""Flax Vision Transformer — the engine behind the prompt/LoRA/adapter method
families (re-design of reference core/model/backbone/transformer.py:1276-2300
and vit.py:47-127).

One parameterized module covers the reference's zoo of transformer variants:

  * ``prepend_tokens``: L2P-style prompt tokens concatenated in front of
    [cls; patches] at layer 0 (reference transformer.py:2006-2018, 2238-2259);
  * ``prefix_kv``: per-layer prefix-tuning K/V prompts concatenated onto the
    attention keys/values after the qkv projection
    (reference transformer.py:175-180) — the concat is fused by XLA into the
    Pallas attention kernel's inputs;
  * ``qkv_delta``: per-layer additive deltas on the q/k/v projection weights
    — the single injection point through which every LoRA variant
    (InfLoRA/SD-LoRA/LoRA-Sub/CL-LoRA, reference transformer.py:199-530)
    expresses itself: the method computes the merged low-rank delta
    ``sum_t B_t A_t`` (a dim x dim matrix per projection) and the backbone
    applies it, keeping the MXU matmuls large and static;
  * ``adapter_dim``: parallel bottleneck adapters on the MLP ("adaptmlp",
    reference transformer.py:1372-1395) used by DMNSP/RanPAC/MoE methods;
  * ``feature_mode``: 'cls' (token 0) or 'prompt_mean' (mean over the
    prepended prompt positions, L2P's readout, transformer.py:2253-2256).

TPU notes: bf16 activations, f32 LayerNorm/params, fused Pallas attention,
static shapes per prompt configuration.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from libcontinual_tpu.ops.attention import (
    attention_bshd,
    fused_kernels_ok,
    fused_masked_qkv_attention,
    fused_prefix_attention,
    fused_qkv_attention,
)
from libcontinual_tpu.registry import BACKBONES


class MLP(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.act == "quick_gelu":
            # OpenAI CLIP's QuickGELU x*sigmoid(1.702x) (reference
            # clip.py QuickGELU) — imported CLIP weights expect it
            x = x * jax.nn.sigmoid(1.702 * x)
        elif self.act == "gelu_tanh":
            x = nn.gelu(x, approximate=True)
        elif self.dtype == jnp.bfloat16:
            # torch nn.GELU() (reference Mlp, transformer.py:1255-1273) is
            # exact-erf GELU. At bf16 working precision the tanh form IS the
            # erf form: max |tanh-erf| deviation is 4.7e-4 (at x=2.70, where
            # the bf16 quantization step is 1.56e-2 — 33x coarser), so every
            # bf16 output rounds identically almost everywhere while erf's
            # rational polynomial costs ~15% step throughput (measured:
            # 1076.9 -> 915.6 img/s on the L2P bench).
            x = nn.gelu(x, approximate=True)
        else:
            # f32 path (differential parity tests, CPU): exact erf, matching
            # torch bit-for-bit within float tolerance
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Adapter(nn.Module):
    """Parallel bottleneck adapter (reference petl/adapter.py:14-73):
    ``scale * up(dropout(relu(down(ln_in))))`` added to the MLP output.
    The bottleneck dropout (reference adapter.py:60, p=0.1 in the adapter
    transformer blocks) fires only when a ``dropout`` rng collection is
    provided at apply time — deterministic otherwise."""

    dim: int
    bottleneck: int
    scale: float = 0.1
    dtype: Any = jnp.bfloat16
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.bottleneck, dtype=self.dtype, name="down",
            kernel_init=nn.initializers.kaiming_uniform(),
        )(x)
        h = nn.relu(h)
        if self.dropout_rate > 0.0 and self.has_rng("dropout"):
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, h.shape)
            h = h * mask.astype(h.dtype) / keep
        h = nn.Dense(
            self.dim, dtype=self.dtype, name="up",
            kernel_init=nn.initializers.zeros_init(),
        )(h)
        return h * self.scale


class SSF(nn.Module):
    """Scale-Shift feature modulation (reference
    petl/vision_transformer_ssf.py:378-396): ``x * gamma + beta`` with
    per-channel learnable parameters — the PETL method that tunes only these
    modulations on a frozen ViT."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.normal(0.02), (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        return x * (1.0 + gamma).astype(x.dtype) + beta.astype(x.dtype)


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, prefix_kv=None, qkv_delta=None, attn_mask=None):
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        if qkv_delta is not None:
            # qkv_delta: (d, 3d) additive weight delta (merged LoRA)
            qkv = qkv + jnp.einsum(
                "bsd,de->bse", x, qkv_delta.astype(self.dtype)
            )
        # pallas_call has no SPMD partitioning rule, so the fused kernels
        # engage only when the active mesh spans one device (the trainer
        # records its mesh size; LIBCONTINUAL_ATTN=fused/xla overrides) —
        # multi-chip meshes take the XLA path, which GSPMD partitions fine
        fused_ok = fused_kernels_ok()
        if prefix_kv is None and attn_mask is None and d % h == 0 \
                and fused_ok:
            # pure self-attention: fused path straight off the packed qkv
            # tensor (Pallas kernel on TPU — head split as in-kernel lane
            # slices, VMEM score tile; see ops/attention.py)
            o = fused_qkv_attention(qkv, 1.0 / np.sqrt(hd), h)
            return nn.Dense(d, dtype=self.dtype, name="proj")(o)
        if prefix_kv is not None and attn_mask is None and d % h == 0 \
                and fused_ok:
            # prefix-KV (DualPrompt/CODA/DAP): prompt concat done per head
            # in VMEM inside the same fused kernel family
            pk, pv = prefix_kv
            o = fused_prefix_attention(
                qkv, pk.astype(self.dtype), pv.astype(self.dtype),
                1.0 / np.sqrt(hd), h,
            )
            return nn.Dense(d, dtype=self.dtype, name="proj")(o)
        if prefix_kv is None and attn_mask is not None and d % h == 0 \
                and attn_mask.ndim == 2 and fused_ok:
            # additive-mask path (CLIP text tower causal mask) through the
            # fused kernel family — masked scores stay in VMEM
            o = fused_masked_qkv_attention(
                qkv, attn_mask, 1.0 / np.sqrt(hd), h
            )
            return nn.Dense(d, dtype=self.dtype, name="proj")(o)
        # Sequence-major (B, S, H, hd) layout throughout: the head split is
        # a pair of contiguous slices + free reshapes, so XLA never
        # materializes a transposed copy of the qkv tensor (profiled: the
        # (b,s,3,h,hd).transpose layout cost ~32 ms/step in ping-pong layout
        # copies at ViT-B/L2P shapes on v5e; this form is bit-identical and
        # ~1.7 ms/layer faster fwd, ~2.2 ms/layer fwd+bwd).
        q = qkv[..., :d].reshape(b, s, h, hd)
        k = qkv[..., d:2 * d].reshape(b, s, h, hd)
        v = qkv[..., 2 * d:].reshape(b, s, h, hd)
        if prefix_kv is not None:
            pk, pv = prefix_kv  # (B, P, D) token-space prompts
            pk = pk.astype(self.dtype).reshape(b, -1, h, hd)
            pv = pv.astype(self.dtype).reshape(b, -1, h, hd)
            k = jnp.concatenate([pk, k], axis=1)
            v = jnp.concatenate([pv, v], axis=1)
        if attn_mask is not None:
            # additive mask path (CLIP text tower causal mask)
            sarr = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(hd)
            if attn_mask.shape[-1] != k.shape[1]:
                # prefix_kv widened the key axis: prefix positions attend
                # freely (left-pad zeros), the causal part keeps its mask
                pad = k.shape[1] - attn_mask.shape[-1]
                attn_mask = jnp.pad(attn_mask, ((0, 0), (pad, 0)))
            sarr = sarr + attn_mask[None, None, :, :]
            p = jax.nn.softmax(sarr, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        else:
            o = attention_bshd(q, k, v, 1.0 / np.sqrt(hd))
        o = o.reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(o)


class MoEMLP(nn.Module):
    """Mixture-of-adapter-experts MLP add-on (reference
    transformer.py:1461-1658: noisy top-k gating + cv^2 load-balancing over
    small bottleneck experts). Experts are computed densely and mixed by the
    (top-k-sparsified) gate — at 2-4 tiny experts, a dense einsum beats
    dispatch on TPU (SURVEY.md §2.6).

    Routing: ``route="image"`` gates each IMAGE once on its token-0 (CLS/EOT)
    vector and sends the whole token sequence through the chosen experts —
    the reference's SparseDispatcher semantics (transformer.py:1640-1650
    routes ``x[:, 0, :]``). ``route="token"`` gates per token (the usual MoE
    granularity, kept as an option)."""

    dim: int
    num_experts: int = 4
    top_k: int = 2
    bottleneck: int = 64
    route: str = "image"
    scale: float = 0.1  # Adapter(adapter_scalar=0.1), transformer.py:1520-1524
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, gate_noise_rng=None, gate_vec=None, dropout_rng=None):
        b, s, d = x.shape
        wg = self.param("w_gate", nn.initializers.zeros, (d, self.num_experts))
        wn = self.param("w_noise", nn.initializers.zeros, (d, self.num_experts))
        down = self.param(
            "down", nn.initializers.kaiming_uniform(),
            (self.num_experts, d, self.bottleneck),
        )
        down_b = self.param(
            "down_b", nn.initializers.zeros, (self.num_experts, self.bottleneck)
        )
        up = self.param(
            "up", nn.initializers.zeros_init(), (self.num_experts, self.bottleneck, d)
        )
        up_b = self.param("up_b", nn.initializers.zeros, (self.num_experts, d))
        if self.route == "image":
            gx = (gate_vec if gate_vec is not None else x[:, 0, :]).astype(jnp.float32)
        else:
            gx = x.astype(jnp.float32)  # (B, S, D): per-token
        clean = gx @ wg
        if gate_noise_rng is not None:
            # noisy top-k gating (reference transformer.py:1603-1636)
            noise_std = jax.nn.softplus(gx @ wn) + 1e-2
            logits = clean + jax.random.normal(gate_noise_rng, clean.shape) * noise_std
        else:
            logits = clean
        # exact-k selection (reference transformer.py:1627-1633): softmax over
        # the k SELECTED logits, scattered back — a >=threshold mask would
        # admit every tied expert (all of them at zero-init routers)
        k = min(self.top_k, self.num_experts)
        topv, topi = jax.lax.top_k(logits, k)
        gk = jax.nn.softmax(topv, axis=-1)
        onehot = jax.nn.one_hot(topi, self.num_experts, dtype=jnp.float32)
        gates = jnp.einsum("...k,...ke->...e", gk, onehot)  # (B, E) or (B, S, E)
        h = jnp.einsum("bsd,edk->bsek", x.astype(self.dtype), down.astype(self.dtype))
        h = h + down_b.astype(self.dtype)[None, None, :, :]
        h = nn.relu(h)
        if dropout_rng is not None and self.dropout_rate > 0.0:
            # expert-internal dropout (reference adapter.py:60, train mode)
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0).astype(self.dtype)
        y = jnp.einsum("bsek,ekd->bsed", h, up.astype(self.dtype))
        y = (y + up_b.astype(self.dtype)[None, None, :, :]) * self.scale
        if self.route == "image":
            out = jnp.einsum("be,bsed->bsd", gates.astype(self.dtype), y)
        else:
            out = jnp.einsum("bse,bsed->bsd", gates.astype(self.dtype), y)
        # cv^2 load-balancing loss over gate importance (transformer.py:1540;
        # dead code in the reference — its `load` computation is commented
        # out — so methods weight this by 0.0 unless configured otherwise)
        importance = jnp.sum(gates.reshape(-1, self.num_experts), axis=0)
        cv2 = jnp.var(importance) / (jnp.mean(importance) ** 2 + 1e-10)
        return out, cv2


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    adapter_dim: int = 0
    adapter_scale: float = 0.1
    moe_experts: int = 0
    moe_top_k: int = 2
    ssf: bool = False
    dtype: Any = jnp.bfloat16
    act: str = "gelu"
    # torch nn.LayerNorm default 1e-5 for the reference's CLIP-style
    # ResidualAttentionBlock family (transformer.py:1289); timm ViTs use 1e-6
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, prefix_kv=None, qkv_delta=None, attn_mask=None,
                 moe_rng=None, gate_index=0, capture=False, gate_pos=None,
                 x2=None, delta2_fn=None):
        # bf16 residual stream; LayerNorm statistics still accumulate in f32
        # internally (flax upcasts), halving HBM traffic vs an f32 stream
        ln1_mod = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")
        attn_mod = ViTAttention(self.dim, self.num_heads, self.dtype,
                                name="attn")
        ln2_mod = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_2")
        mlp_mod = MLP(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                      act=self.act, name="mlp")
        ln1 = ln1_mod(x)
        if self.ssf:
            ln1 = SSF(self.dim, name="ssf_1")(ln1)
        x = x + attn_mod(
            ln1, prefix_kv=prefix_kv, qkv_delta=qkv_delta, attn_mask=attn_mask
        )
        if x2 is not None:
            # dual-stream ("Bi") mode: stream 2 shares every module but gets
            # its own runtime qkv delta, computed from stream 1's NORMALIZED
            # attention input — the reference routes trust-region experts on
            # the (B, N, C) tensor its attention receives, i.e. ln_1(x)
            # (transformer.py:1928-1932 permutes ln_1 outputs into the attn,
            # whose eval branch Grams that x, :813-829)
            delta2 = delta2_fn(ln1.astype(jnp.float32))
            x2 = x2 + attn_mod(
                ln1_mod(x2), prefix_kv=prefix_kv, qkv_delta=delta2,
                attn_mask=attn_mask,
            )
            x2 = x2 + mlp_mod(ln2_mod(x2))
        ln2 = ln2_mod(x)
        if self.ssf:
            ln2 = SSF(self.dim, name="ssf_2")(ln2)
        y = mlp_mod(ln2)
        aux = 0.0
        if self.adapter_dim > 0:
            # adapters consume the RAW post-attention residual, not ln_2(x):
            # every reference adapter block feeds `x` straight to adaptmlp
            # (transformer.py:1390-1395, 1453-1455; petl
            # vision_transformer_adapter.py:167-168 runs it before norm2)
            y = y + Adapter(
                self.dim, self.adapter_dim, self.adapter_scale, self.dtype,
                name="adaptmlp",
            )(x)
        if self.moe_experts > 0:
            # routing input = post-attention residual CLS/EOT token
            # (reference transformer.py:1640-1644 gates on x[:, 0, :])
            if gate_pos is not None:
                # per-sample routing position (text tower EOT opt-in; the
                # reference gates text on token 0, which is input-independent
                # under the causal mask — see PARITY.md)
                gvec = jnp.take_along_axis(
                    x, gate_pos[:, None, None], axis=1
                )[:, 0, :]
            else:
                gvec = x[:, gate_index, :]
            if moe_rng is not None:
                noise_rng, drop_rng = jax.random.split(moe_rng)
            else:
                noise_rng = drop_rng = None
            moe_out, aux = MoEMLP(
                self.dim, self.moe_experts, self.moe_top_k, dtype=self.dtype,
                name="moe",
            )(x, gate_noise_rng=noise_rng, gate_vec=gvec, dropout_rng=drop_rng)
            y = y + moe_out
        out = x + y
        if x2 is not None and capture:
            return out, x2, (ln1.astype(jnp.float32), x.astype(jnp.float32))
        if x2 is not None:
            return out, x2
        if capture:
            # capture both method-relevant streams: the LoRA delta applies to
            # the post-ln_1 activations (reference vit_inflora.py:294), while
            # the adaptmlp adapters consume the raw post-attention residual
            # (DMNSP's input-matrix capture runs inside adaptmlp on that
            # stream, transformer.py:1453-1455); the caller picks its point
            return out, (ln1.astype(jnp.float32), x.astype(jnp.float32))
        if self.moe_experts > 0:
            return out, aux
        return out


class VisionTransformer(nn.Module):
    """ViT-B/16 by default; returns ``{"features", "tokens"}``."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    adapter_dim: int = 0
    adapter_scale: float = 0.1
    moe_experts: int = 0
    moe_top_k: int = 2
    ssf: bool = False
    vpt_len: int = 0  # deep visual-prompt-tuning tokens per layer
    dtype: Any = jnp.bfloat16
    ln_pre: bool = False  # OpenAI-CLIP visual stem LayerNorm before blocks
    act: str = "gelu"  # "quick_gelu" for CLIP towers
    # the reference's transformer.py VisionTransformer is MIXED-eps: CLIP-style
    # blocks at torch-default 1e-5 but a timm-style final norm at 1e-6
    # (transformer.py:1289 vs :2203); both knobs default to the timm 1e-6
    block_ln_eps: float = 1e-6
    final_ln_eps: float = 1e-6

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = True,
        prepend_tokens: Optional[jax.Array] = None,
        prefix_kv: Optional[Dict[int, Any]] = None,
        qkv_deltas: Optional[Dict[int, jax.Array]] = None,
        feature_mode: str = "cls",
        capture: bool = False,
        capture_point: str = "attn",  # "attn" (ln_1) or "mlp" (ln_2)
        dual_delta_fn: Optional[Any] = None,
        num_blocks: Optional[int] = None,
    ):
        """``dual_delta_fn``: enables the dual-stream ("Bi") mode of the
        reference's ResidualAttentionBiBlock + Transformer_Proj (reference
        backbone/transformer.py:1887-1946, 2020-2043): a second stream x2
        flows through the SAME blocks (shared weights) but with its own
        per-layer qkv weight delta, computed at runtime by
        ``dual_delta_fn(i, ln1) -> (d, 3d) | None`` from stream 1's ln_1
        output — the (B, N, C) tensor the reference's attention receives
        and its eval routing Grams (transformer.py:1928-1932, 813-829) —
        not the pre-norm block input. Returns stream-2 features as ``features`` (the
        reference's Transformer_Proj returns x_proj) plus stream-1 features
        as ``features_x``."""
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dim)
        n_patches = x.shape[1]

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(self.dtype), x], axis=1)
        x = x + pos.astype(self.dtype)
        if self.ln_pre:
            # OpenAI CLIP normalizes the embedded sequence before the blocks
            # (reference clip.py VisualTransformer ln_pre)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre_n")(x)

        n_prompt = 0
        if prepend_tokens is not None:
            n_prompt = prepend_tokens.shape[1]
            x = jnp.concatenate([prepend_tokens.astype(self.dtype), x], axis=1)

        if self.moe_experts > 0 and (capture or dual_delta_fn is not None):
            # the MoE block path threads neither capture nor the dual stream;
            # failing loudly beats returning empty attn_inputs / raw-embedding
            # "features" (no shipped config pairs MoE with these methods)
            raise NotImplementedError(
                "moe_experts > 0 does not support capture/dual_delta_fn"
            )
        attn_inputs = []
        moe_aux = 0.0
        x2 = x if dual_delta_fn is not None else None
        if self.vpt_len > 0:
            # VPT-deep (reference petl/vpt.py:6-144): per-layer prompt tokens
            # prepended before each block and replaced at the next
            vpt = self.param(
                "vpt_prompts",
                nn.initializers.uniform(scale=0.1),
                (self.depth, self.vpt_len, self.embed_dim),
            )
        # partial-depth forward (CL-LoRA's 6-block general-stream KD,
        # reference transformer.py forward_general_cls)
        run_depth = self.depth if num_blocks is None else int(num_blocks)
        for i in range(run_depth):
            pkv = prefix_kv.get(i) if prefix_kv else None
            delta = qkv_deltas.get(i) if qkv_deltas else None
            block = ViTBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.adapter_dim,
                self.adapter_scale,
                self.moe_experts,
                self.moe_top_k,
                self.ssf,
                self.dtype,
                act=self.act,
                ln_eps=self.block_ln_eps,
                name=f"block_{i}",
            )
            if self.vpt_len > 0:
                toks = jnp.broadcast_to(
                    vpt[i][None].astype(self.dtype), (b, self.vpt_len, self.embed_dim)
                )
                if i == 0:
                    x = jnp.concatenate([toks, x], axis=1)
                    n_prompt += self.vpt_len
                else:
                    x = jnp.concatenate([toks, x[:, self.vpt_len :]], axis=1)
            if self.moe_experts > 0:
                moe_rng = (
                    self.make_rng("moe") if train and self.has_rng("moe") else None
                )
                x, aux = block(
                    x, prefix_kv=pkv, qkv_delta=delta, moe_rng=moe_rng,
                    gate_index=n_prompt,  # CLS sits after any prepended prompts
                )
                moe_aux = moe_aux + aux
            else:
                if x2 is not None:
                    # second ("Bi") stream runs INSIDE the block — shared
                    # modules, own qkv delta computed from stream 1's ln_1
                    # output (the tensor the reference's routing Grams)
                    d2fn = (lambda ln1, i=i: dual_delta_fn(i, ln1))
                    if capture:
                        x, x2, (ln1, adapt_in) = block(
                            x, prefix_kv=pkv, qkv_delta=delta, capture=True,
                            x2=x2, delta2_fn=d2fn,
                        )
                        attn_inputs.append(
                            adapt_in if capture_point == "mlp" else ln1
                        )
                    else:
                        x, x2 = block(
                            x, prefix_kv=pkv, qkv_delta=delta,
                            x2=x2, delta2_fn=d2fn,
                        )
                elif capture:
                    # input-covariance capture: ln_1 (the tensor the qkv
                    # delta multiplies — LoRA/GPM family) or the raw
                    # post-attention residual (the adaptmlp input — DMNSP)
                    # per ``capture_point``
                    x, (ln1, adapt_in) = block(
                        x, prefix_kv=pkv, qkv_delta=delta, capture=True
                    )
                    attn_inputs.append(
                        adapt_in if capture_point == "mlp" else ln1
                    )
                else:
                    x = block(x, prefix_kv=pkv, qkv_delta=delta)

        final_norm = nn.LayerNorm(epsilon=self.final_ln_eps, dtype=jnp.float32, name="norm")
        x = final_norm(x.astype(jnp.float32))
        if feature_mode == "prompt_mean" and n_prompt > 0:
            feats = jnp.mean(x[:, :n_prompt], axis=1)
        else:
            feats = x[:, n_prompt, :]  # cls token position
        out = {"features": feats.astype(jnp.float32), "tokens": x}
        if x2 is not None:
            # Transformer_Proj semantics: the scaled stream is the output
            x2 = final_norm(x2.astype(jnp.float32))
            out["features_x"] = out["features"]
            out["features"] = x2[:, n_prompt, :].astype(jnp.float32)
        if capture:
            out["attn_inputs"] = attn_inputs
        if self.moe_experts > 0:
            out["moe_aux"] = moe_aux
        return out


# --------------------------------------------------------------- timm import


def maybe_load_pretrained(vit_params: Dict, config: Dict) -> Dict:
    """Load timm weights into a ViT param tree when the config names an
    existing local checkpoint (``backbone.kwargs.pretrained_path``); random
    init otherwise (zero-egress image)."""
    path = ((config.get("backbone") or {}).get("kwargs") or {}).get(
        "pretrained_path"
    )
    if path:
        import os

        if os.path.exists(path):
            return load_timm_weights(vit_params, path)
    return vit_params


def load_timm_weights(params: Dict, path: str) -> Dict:
    """Load a timm ViT-B/16 checkpoint into our param tree, gated on file
    existence (capability parity with reference vit.py:63-84's key remap; no
    network access assumed). Accepts ``.npz`` (jax-format augreg weights) or
    a torch ``.pth``/``.pt``/``.bin`` state dict, read without torch via
    ``utils.torch_pickle``."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    params = jax.tree_util.tree_map(np.asarray, params)
    if path.endswith(".npz"):
        raw = dict(np.load(path, allow_pickle=False))
        _load_npz_into(params, raw)
    else:
        from libcontinual_tpu.utils.torch_pickle import load_torch_state_dict

        _load_timm_torch_into(params, load_torch_state_dict(path))
    return jax.tree_util.tree_map(jnp.asarray, params)


def _load_timm_torch_into(params: Dict, sd: Dict):
    """Map timm torch state-dict names (blocks.i.norm1/attn.qkv/mlp.fc1...)
    into ours — the remap the reference does at vit.py:69-84 plus the
    torch->flax layout transposes."""
    problems = []

    def put(dst, key, value):
        if key not in dst:
            return  # param not present in this variant (e.g. no adapter)
        if dst[key].shape != value.shape:
            problems.append(f"{key}: checkpoint {value.shape} vs model {dst[key].shape}")
            return
        dst[key] = value.astype(dst[key].dtype)

    if "patch_embed.proj.weight" in sd:
        put(params["patch_embed"], "kernel",
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        put(params["patch_embed"], "bias", sd["patch_embed.proj.bias"])
    if "cls_token" in sd:
        put(params, "cls_token", sd["cls_token"])
    if "pos_embed" in sd:
        put(params, "pos_embed", sd["pos_embed"])
    if "norm.weight" in sd:
        put(params["norm"], "scale", sd["norm.weight"])
        put(params["norm"], "bias", sd["norm.bias"])
    depth = len([k for k in params if k.startswith("block_")])
    for i in range(depth):
        b = f"blocks.{i}"
        if f"{b}.norm1.weight" not in sd:
            continue
        p = params[f"block_{i}"]
        put(p["ln_1"], "scale", sd[f"{b}.norm1.weight"])
        put(p["ln_1"], "bias", sd[f"{b}.norm1.bias"])
        put(p["ln_2"], "scale", sd[f"{b}.norm2.weight"])
        put(p["ln_2"], "bias", sd[f"{b}.norm2.bias"])
        put(p["attn"]["qkv"], "kernel", sd[f"{b}.attn.qkv.weight"].T)
        put(p["attn"]["qkv"], "bias", sd[f"{b}.attn.qkv.bias"])
        put(p["attn"]["proj"], "kernel", sd[f"{b}.attn.proj.weight"].T)
        put(p["attn"]["proj"], "bias", sd[f"{b}.attn.proj.bias"])
        put(p["mlp"]["fc1"], "kernel", sd[f"{b}.mlp.fc1.weight"].T)
        put(p["mlp"]["fc1"], "bias", sd[f"{b}.mlp.fc1.bias"])
        put(p["mlp"]["fc2"], "kernel", sd[f"{b}.mlp.fc2.weight"].T)
        put(p["mlp"]["fc2"], "bias", sd[f"{b}.mlp.fc2.bias"])
    if problems:
        # a silent partial load leaves critical params at random init — the
        # run would "train" on a half-random backbone with no error
        raise ValueError(
            "timm checkpoint does not match this model's geometry: "
            + "; ".join(problems)
        )


def _load_npz_into(params: Dict, raw: Dict):
    """Map timm/augreg npz names (Transformer/encoderblock_i/...) into ours.

    Shapes are validated on assignment: a wrong-geometry npz used to install
    mismatched arrays directly and fail only later inside apply() with an
    unrelated-looking shape error.
    """
    def get(name):
        return raw[name] if name in raw else None

    class _Checked:
        def __init__(self, dst, path):
            self._dst, self._path = dst, path

        def __setitem__(self, key, value):
            old = self._dst[key]
            if tuple(old.shape) != tuple(np.shape(value)):
                raise ValueError(
                    f"npz checkpoint does not match this model's geometry: "
                    f"{self._path}/{key}: checkpoint {np.shape(value)} vs "
                    f"model {old.shape}"
                )
            self._dst[key] = value

        def __getitem__(self, key):
            v = self._dst[key]
            if isinstance(v, dict):
                return _Checked(v, f"{self._path}/{key}")
            return v

    # top-level ARRAY keys (cls_token/pos_embed) must be written into the
    # CALLER'S dict — rebinding a wrapped copy here would drop them while
    # nested writes still flow through the shared sub-dicts
    orig = params
    params = {
        k: (_Checked(v, k) if isinstance(v, dict) else v)
        for k, v in params.items()
    }

    if (v := get("embedding/kernel")) is not None:
        params["patch_embed"]["kernel"] = v
        params["patch_embed"]["bias"] = raw["embedding/bias"]
    if (v := get("cls")) is not None:
        if tuple(orig["cls_token"].shape) != tuple(np.shape(v)):
            raise ValueError(
                f"npz cls_token {np.shape(v)} vs model {orig['cls_token'].shape}")
        orig["cls_token"] = v
    if (v := get("Transformer/posembed_input/pos_embedding")) is not None:
        if tuple(orig["pos_embed"].shape) != tuple(np.shape(v)):
            raise ValueError(
                f"npz pos_embed {np.shape(v)} vs model {orig['pos_embed'].shape}")
        orig["pos_embed"] = v
    if (v := get("Transformer/encoder_norm/scale")) is not None:
        params["norm"]["scale"] = v
        params["norm"]["bias"] = raw["Transformer/encoder_norm/bias"]
    depth = len([k for k in params if k.startswith("block_")])
    for i in range(depth):
        p = params[f"block_{i}"]
        b = f"Transformer/encoderblock_{i}"
        if f"{b}/LayerNorm_0/scale" not in raw:
            continue
        p["ln_1"]["scale"] = raw[f"{b}/LayerNorm_0/scale"]
        p["ln_1"]["bias"] = raw[f"{b}/LayerNorm_0/bias"]
        p["ln_2"]["scale"] = raw[f"{b}/LayerNorm_2/scale"]
        p["ln_2"]["bias"] = raw[f"{b}/LayerNorm_2/bias"]
        att = f"{b}/MultiHeadDotProductAttention_1"
        d = p["ln_1"]["scale"].shape[0]
        qkv_k = np.concatenate(
            [raw[f"{att}/{n}/kernel"].reshape(d, d) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [raw[f"{att}/{n}/bias"].reshape(d) for n in ("query", "key", "value")]
        )
        p["attn"]["qkv"]["kernel"] = qkv_k
        p["attn"]["qkv"]["bias"] = qkv_b
        p["attn"]["proj"]["kernel"] = raw[f"{att}/out/kernel"].reshape(d, d)
        p["attn"]["proj"]["bias"] = raw[f"{att}/out/bias"]
        mlp = f"{b}/MlpBlock_3"
        p["mlp"]["fc1"]["kernel"] = raw[f"{mlp}/Dense_0/kernel"]
        p["mlp"]["fc1"]["bias"] = raw[f"{mlp}/Dense_0/bias"]
        p["mlp"]["fc2"]["kernel"] = raw[f"{mlp}/Dense_1/kernel"]
        p["mlp"]["fc2"]["bias"] = raw[f"{mlp}/Dense_1/bias"]


@BACKBONES.register(
    "ViTZoo",
    aliases=(
        "vit_base_patch16_224",
        "vit-b-16",
        # reference backbone names that map onto the unified ViT here:
        "SiNet_vit",        # InfLoRA's per-task-head wrapper (reference SiNet.py)
        "vit_inflora",      # reference vit_inflora.py timm fork
        "vit_pt_imnet_dap",  # reference vit_dap.py entry (dap prompts live in the method)
        "ViT_CL_LoRA",      # reference vit.py:206
        "vit_cl_lora",      # zz_CL-LoRA config spelling
        "vit_pt_imnet",     # reference L2P/DualPrompt/CODA config backbone name
    ),
)
def vitzoo(**kwargs):
    # reference configs name the torch activation class (act_layer:
    # QuickGELU, e.g. dmnsp_vit.yaml)
    act = str(kwargs.get("act_layer", kwargs.get("act", "gelu")))
    return VisionTransformer(
        img_size=int(kwargs.get("img_size", 224)),
        adapter_dim=int(kwargs.get("adapter_dim", 0)),
        # MoE-adapter experts (reference moe_adapter4cl_vit.yaml `experts_num`)
        moe_experts=int(kwargs.get("moe_experts", kwargs.get("experts_num", 0)) or 0),
        moe_top_k=int(kwargs.get("moe_top_k", 2)),
        dtype=kwargs.get("dtype", jnp.bfloat16),
        act="quick_gelu" if act.lower() in ("quickgelu", "quick_gelu") else "gelu",
        block_ln_eps=float(kwargs.get("block_ln_eps", 1e-6)),
        final_ln_eps=float(kwargs.get("final_ln_eps", 1e-6)),
    )


@BACKBONES.register("ViT_in21k_adapter")
def vit_in21k_adapter(**kwargs):
    """RanPAC's adapter ViT (reference vit.py:140-205): frozen ViT with
    parallel MLP adapters."""
    return VisionTransformer(
        img_size=int(kwargs.get("img_size", 224)),
        adapter_dim=int(kwargs.get("ffn_num", kwargs.get("adapter_dim", 64))),
        dtype=kwargs.get("dtype", jnp.bfloat16),
    )


@BACKBONES.register("vit_ssf")
def vit_ssf(**kwargs):
    """SSF PETL ViT (reference petl/vision_transformer_ssf.py)."""
    return VisionTransformer(
        img_size=int(kwargs.get("img_size", 224)), ssf=True,
        dtype=kwargs.get("dtype", jnp.bfloat16),
    )


@BACKBONES.register("vit_vpt")
def vit_vpt(**kwargs):
    """VPT-deep PETL ViT (reference petl/vpt.py)."""
    return VisionTransformer(
        img_size=int(kwargs.get("img_size", 224)),
        vpt_len=int(kwargs.get("vpt_len", 5)),
        dtype=kwargs.get("dtype", jnp.bfloat16),
    )


@BACKBONES.register("vit_tiny_test")
def vit_tiny_test(**kwargs):
    """Small ViT for unit tests (32x32/patch 8, 4 blocks)."""
    return VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        adapter_dim=int(kwargs.get("adapter_dim", 0)),
        ssf=bool(kwargs.get("ssf", False)),
        vpt_len=int(kwargs.get("vpt_len", 0)),
        dtype=kwargs.get("dtype", jnp.float32),
        block_ln_eps=float(kwargs.get("block_ln_eps", 1e-6)),
        final_ln_eps=float(kwargs.get("final_ln_eps", 1e-6)),
    )
