"""Flax CLIP — dual-tower contrastive model (re-design of reference
core/model/backbone/clip.py:267-498).

Both towers reuse the framework's transformer block
(:class:`libcontinual_tpu.models.vit.ViTBlock`), so every CL injection point
— MLP adapters, MoE-adapter experts, LoRA qkv deltas, prefix prompts — works
identically in the visual and text streams (the reference parameterizes its
CLIP by block/attn class names for the same reason, clip.py:267-416).

ViT-B/16 visual tower geometry by default (224/16, width 768 -> embed 512)
and the standard CLIP text tower (49408 vocab, 77 context, width 512).
OpenAI checkpoint import is gated on a local file (zero-egress image).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from libcontinual_tpu.models.vit import ViTBlock, VisionTransformer
from libcontinual_tpu.registry import BACKBONES


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    depth: int = 12
    num_heads: int = 8
    embed_dim: int = 512
    adapter_dim: int = 0
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_text_gate: str = "sot"  # "sot" = reference-exact; "eot" = opt-in
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, train: bool = True):
        b, s = tokens.shape
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01), (self.context_length, self.width)
        )
        x = emb[tokens].astype(self.dtype) + pos[None, :s].astype(self.dtype)
        causal = jnp.triu(jnp.full((s, s), -1e30, jnp.float32), k=1)
        # MoE routing vector: the reference gates text on token 0 — the SOT
        # position, which under the causal mask only sees itself and is
        # therefore input-independent (transformer.py:1640-1644); "eot"
        # routes on the EOT token instead (per-prompt routing, PARITY.md)
        eot_pos = jnp.argmax(tokens, axis=-1)
        gate_pos = eot_pos if self.moe_text_gate == "eot" else None
        moe_aux = 0.0
        for i in range(self.depth):
            block = ViTBlock(
                self.width, self.num_heads,
                adapter_dim=self.adapter_dim,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                dtype=self.dtype, act="quick_gelu",
                ln_eps=1e-5,  # OpenAI CLIP = torch LayerNorm default
                name=f"block_{i}",
            )
            if self.moe_experts > 0:
                moe_rng = (
                    self.make_rng("moe") if train and self.has_rng("moe") else None
                )
                x, aux = block(
                    x, attn_mask=causal, gate_pos=gate_pos, moe_rng=moe_rng
                )
                moe_aux = moe_aux + aux
            else:
                x = block(x, attn_mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(
            x.astype(jnp.float32)
        )
        # features at the EOT token (highest token id, reference clip.py:380;
        # eot_pos above is the same argmax)
        feats = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (self.width, self.embed_dim)
        )
        out = {"features": feats @ proj}
        if self.moe_experts > 0:
            out["moe_aux"] = moe_aux
        return out


class CLIP(nn.Module):
    """Dual towers + logit scale; `__call__(images, tokens)` returns
    normalized features and contrastive logits (reference clip.py:267-416)."""

    embed_dim: int = 512
    image_size: int = 224
    vision_width: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    patch_size: int = 16
    text_width: int = 512
    text_depth: int = 12
    text_heads: int = 8
    adapter_dim: int = 0
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_text_gate: str = "sot"
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.visual = VisionTransformer(
            img_size=self.image_size,
            patch_size=self.patch_size,
            embed_dim=self.vision_width,
            depth=self.vision_depth,
            num_heads=self.vision_heads,
            adapter_dim=self.adapter_dim,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            dtype=self.dtype,
            ln_pre=True,  # OpenAI visual stem LayerNorm
            act="quick_gelu",
            block_ln_eps=1e-5,  # OpenAI CLIP = torch LayerNorm default
            final_ln_eps=1e-5,  # ln_post
            name="visual",
        )
        self.text = TextTransformer(
            width=self.text_width,
            depth=self.text_depth,
            num_heads=self.text_heads,
            embed_dim=self.embed_dim,
            adapter_dim=self.adapter_dim,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_text_gate=self.moe_text_gate,
            dtype=self.dtype,
            name="text",
        )
        self.visual_projection = self.param(
            "visual_projection",
            nn.initializers.normal(0.02),
            (self.vision_width, self.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.asarray(np.log(1 / 0.07), jnp.float32), ()
        )

    def encode_image(self, images, train: bool = True, **kw):
        out = self.visual(images, train=train, **kw)
        feats = out["features"] @ self.visual_projection
        return feats, out

    def encode_text(self, tokens, train: bool = True):
        out = self.text(tokens, train=train)
        return out["features"], out

    def __call__(self, images, tokens, train: bool = True, **kw):
        img_f, v_out = self.encode_image(images, train=train, **kw)
        txt_f, t_out = self.encode_text(tokens, train=train)
        img_n = img_f / (jnp.linalg.norm(img_f, axis=-1, keepdims=True) + 1e-8)
        txt_n = txt_f / (jnp.linalg.norm(txt_f, axis=-1, keepdims=True) + 1e-8)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img_n @ txt_n.T
        out = {
            "image_features": img_n,
            "text_features": txt_n,
            "logits_per_image": logits_per_image,
            "logits_per_text": logits_per_image.T,
            "moe_aux": (v_out.get("moe_aux", 0.0) + t_out.get("moe_aux", 0.0)),
        }
        return out


# ----------------------------------------------------------- weight import


def load_clip_torch_weights(params, source) -> dict:
    """Load an OpenAI-CLIP torch state dict into our param tree (behavioral
    port of reference clip.py:418-498's key remap). ``source`` is a path to a
    torch checkpoint (file-gated; zero-egress image) or an already-loaded
    ``dict`` of numpy arrays. Unknown/missing keys are left at init."""
    import numpy as np

    if isinstance(source, (str,)):
        import os

        if not os.path.exists(source):
            raise FileNotFoundError(source)
        from libcontinual_tpu.utils.torch_pickle import load_torch_state_dict

        sd = load_torch_state_dict(source)
    else:
        sd = {k: np.asarray(v) for k, v in source.items()}

    import jax

    p = jax.tree_util.tree_map(np.array, params)

    # towers' top-level tensors
    if "visual.proj" in sd and p["visual_projection"].shape == sd["visual.proj"].shape:
        p["visual_projection"][...] = sd["visual.proj"]
    if "text_projection" in sd and p["text"]["text_projection"].shape == sd["text_projection"].shape:
        p["text"]["text_projection"][...] = sd["text_projection"]
    if "logit_scale" in sd:
        p["logit_scale"][...] = sd["logit_scale"]
    if "token_embedding.weight" in sd:
        p["text"]["token_embedding"][...] = sd["token_embedding.weight"]
    if "positional_embedding" in sd:
        p["text"]["pos_embed"][...] = sd["positional_embedding"]
    if "ln_final.weight" in sd:
        p["text"]["ln_final"]["scale"][...] = sd["ln_final.weight"]
        p["text"]["ln_final"]["bias"][...] = sd["ln_final.bias"]
    # visual stem
    if "visual.conv1.weight" in sd:
        # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
        p["visual"]["patch_embed"]["kernel"][...] = sd[
            "visual.conv1.weight"
        ].transpose(2, 3, 1, 0)
    if "visual.class_embedding" in sd:
        p["visual"]["cls_token"][...] = sd["visual.class_embedding"].reshape(
            p["visual"]["cls_token"].shape
        )
    if "visual.positional_embedding" in sd:
        p["visual"]["pos_embed"][...] = sd["visual.positional_embedding"][None]
    if "visual.ln_pre.weight" in sd:
        p["visual"]["ln_pre_n"]["scale"][...] = sd["visual.ln_pre.weight"]
        p["visual"]["ln_pre_n"]["bias"][...] = sd["visual.ln_pre.bias"]
    if "visual.ln_post.weight" in sd:
        p["visual"]["norm"]["scale"][...] = sd["visual.ln_post.weight"]
        p["visual"]["norm"]["bias"][...] = sd["visual.ln_post.bias"]

    def load_block(dst, prefix):
        m = {
            "ln_1": ("ln_1.weight", "ln_1.bias"),
            "ln_2": ("ln_2.weight", "ln_2.bias"),
        }
        for ours, (wk, bk) in m.items():
            if f"{prefix}.{wk}" in sd:
                dst[ours]["scale"][...] = sd[f"{prefix}.{wk}"]
                dst[ours]["bias"][...] = sd[f"{prefix}.{bk}"]
        if f"{prefix}.attn.in_proj_weight" in sd:
            dst["attn"]["qkv"]["kernel"][...] = sd[
                f"{prefix}.attn.in_proj_weight"
            ].T
            dst["attn"]["qkv"]["bias"][...] = sd[f"{prefix}.attn.in_proj_bias"]
        if f"{prefix}.attn.out_proj.weight" in sd:
            dst["attn"]["proj"]["kernel"][...] = sd[
                f"{prefix}.attn.out_proj.weight"
            ].T
            dst["attn"]["proj"]["bias"][...] = sd[f"{prefix}.attn.out_proj.bias"]
        if f"{prefix}.mlp.c_fc.weight" in sd:
            dst["mlp"]["fc1"]["kernel"][...] = sd[f"{prefix}.mlp.c_fc.weight"].T
            dst["mlp"]["fc1"]["bias"][...] = sd[f"{prefix}.mlp.c_fc.bias"]
            dst["mlp"]["fc2"]["kernel"][...] = sd[f"{prefix}.mlp.c_proj.weight"].T
            dst["mlp"]["fc2"]["bias"][...] = sd[f"{prefix}.mlp.c_proj.bias"]

    vdepth = len([k for k in p["visual"] if k.startswith("block_")])
    for i in range(vdepth):
        load_block(p["visual"][f"block_{i}"], f"visual.transformer.resblocks.{i}")
    tdepth = len([k for k in p["text"] if k.startswith("block_")])
    for i in range(tdepth):
        load_block(p["text"][f"block_{i}"], f"transformer.resblocks.{i}")
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, p)


@BACKBONES.register("clip", aliases=("Clip", "CLIP"))
def clip(**kwargs):
    return CLIP(
        image_size=int(kwargs.get("img_size", kwargs.get("image_size", 224))),
        adapter_dim=int(kwargs.get("adapter_dim", 0)),
        moe_experts=int(kwargs.get("moe_experts", kwargs.get("experts_num", 0)) or 0),
        moe_top_k=int(kwargs.get("moe_top_k", kwargs.get("top_k", 2))),
        moe_text_gate=str(kwargs.get("moe_text_gate", "sot")),
        dtype=kwargs.get("dtype", jnp.bfloat16),
    )


@BACKBONES.register("clip_tiny_test")
def clip_tiny_test(**kwargs):
    """Small CLIP for unit tests (32px/patch 8, 2+2 blocks, dim 64)."""
    return CLIP(
        embed_dim=32,
        image_size=32,
        vision_width=64,
        vision_depth=2,
        vision_heads=4,
        patch_size=8,
        text_width=64,
        text_depth=2,
        text_heads=4,
        adapter_dim=int(kwargs.get("adapter_dim", 0)),
        moe_experts=int(kwargs.get("moe_experts", 0)),
        moe_top_k=int(kwargs.get("moe_top_k", kwargs.get("top_k", 2))),
        moe_text_gate=str(kwargs.get("moe_text_gate", "sot")),
        dtype=kwargs.get("dtype", jnp.float32),
    )
