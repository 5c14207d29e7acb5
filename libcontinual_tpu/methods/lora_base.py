"""Shared machinery for LoRA-on-frozen-ViT continual methods
(InfLoRA / InfLoRA_OPT / SD-LoRA / LoRAsub / CL-LoRA).

The reference implements a zoo of attention subclasses holding per-task
``nn.ModuleList``s of A/B pairs (reference backbone/transformer.py:199-530,
vit_inflora.py:186-246). TPU re-design: LoRA factors are STACKED fixed-shape
params — per layer, ``A: (T, r, d)`` and ``B: (T, d, r)`` for each injected
projection — and the backbone consumes only the *merged* delta
``sum_t active_t B_t A_t`` (one (d, 3d) matrix per layer). Benefits:

  * one compiled train step across all tasks (the active-task mask is data);
  * the merge is a tiny einsum (T*r*d^2 FLOPs), after which the qkv matmul
    stays a single large MXU op — the reference re-materializes merged
    weights per forward too (transformer.py:248-253);
  * task-boundary ops (SVD inits, covariance accumulation, DualGPM) work on
    the stacked arrays in place.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.common import batch_iter


class LoRAViTMethod(Method):
    """Frozen ViT + stacked per-task LoRA factors on chosen qkv slots."""

    concat_buffer = False
    lora_slots = ("k", "v")  # which of q/k/v get LoRA (InfLoRA: k,v)
    #: block LayerNorm epsilon injected into vit.py backbones: most of this
    #: family's reference backbones are transformer.py's CLIP-style
    #: ResidualAttentionBlock (torch-default eps 1e-5, transformer.py:1289);
    #: InfLoRA-plain overrides to the timm 1e-6 (vit_inflora.py:375)
    block_ln_eps = 1e-5

    def __init__(self, config, mesh_ctx=None):
        bname = str((config.get("backbone") or {}).get("name", ""))
        if "clip" not in bname.lower():
            bk = config["backbone"].setdefault("kwargs", {})
            if bk is None:
                bk = config["backbone"]["kwargs"] = {}
            bk.setdefault("block_ln_eps", self.block_ln_eps)
        super().__init__(config, mesh_ctx)
        bk = (config["backbone"].get("kwargs") or {})
        self.rank = int(bk.get("rank", self.kwargs.get("rank", 10)))
        self.embed_dim = int(bk.get("embd_dim", self.kwargs.get("feat_dim", 768)))
        self.depth = getattr(self.backbone, "depth", 12)

    # ------------------------------------------------------------------ state

    def init_lora_params(self, rng) -> Dict[str, Any]:
        d, r, T, L = self.embed_dim, self.rank, self.task_num, self.depth
        params = {}
        for slot in self.lora_slots:
            params[f"A_{slot}"] = jnp.zeros((L, T, r, d), jnp.float32)
            params[f"B_{slot}"] = jnp.zeros((L, T, d, r), jnp.float32)
        return params

    def extra_params(self, rng) -> Dict[str, Any]:
        return {}

    def extra_mvars(self) -> Dict[str, Any]:
        return {}

    def init_state(self, rng, sample_input_hw):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        dummy = self.model_input(sample_input_hw)
        vit_vars = dict(self.backbone.init(k1, dummy, train=False))
        from libcontinual_tpu.models.vit import maybe_load_pretrained

        vit_vars["params"] = maybe_load_pretrained(vit_vars["params"], self.config)
        from libcontinual_tpu.models.heads import LinearHead

        # honor the head_module() hook (CL-LoRA's CosineLinear, reference
        # CosineLinearFeature); plain linear otherwise
        self._head = self.head_module() or LinearHead(self.num_class)
        head_params = self._head.init(
            k2, jnp.zeros((2, self.embed_dim), jnp.float32)
        )["params"]
        params = {"head": head_params, "lora": self.init_lora_params(k3)}
        params.update(self.extra_params(k5))
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        frozen = jax.tree_util.tree_map(
            lambda p: p.astype(self.dtype), vit_vars["params"]
        )
        mvars = {
            "model_state": {},
            "frozen": frozen,
            "active": jnp.zeros((self.task_num,), jnp.float32).at[0].set(1.0),
            "train_onehot": jnp.zeros((self.task_num,), jnp.float32).at[0].set(1.0),
        }
        mvars.update(self.extra_mvars())
        return TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
            rng=k4,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["active"] = (jnp.arange(self.task_num) < task_idx + 1).astype(jnp.float32)
        mvars["train_onehot"] = (
            jnp.arange(self.task_num) == task_idx
        ).astype(jnp.float32)
        return state.replace(mvars=mvars)

    # ---------------------------------------------------------------- forward

    def qkv_deltas(self, lora, active) -> Dict[int, jax.Array]:
        """Merged per-layer (d, 3d) additive deltas: sum_t active_t B_t A_t."""
        d = self.embed_dim
        deltas = {}
        slot_off = {"q": 0, "k": 1, "v": 2}
        for layer in range(self.depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot in self.lora_slots:
                A = lora[f"A_{slot}"][layer]  # (T, r, d)
                B = lora[f"B_{slot}"][layer]  # (T, d, r)
                # sum over active tasks -> (d_out, d_in), torch-orientation
                dw = jnp.einsum("t,tdr,tre->de", active, B, A)
                off = slot_off[slot] * d
                delta = delta.at[:, off : off + d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def vit_features(self, params, mvars, x, train, capture=False):
        deltas = self.qkv_deltas(params["lora"], mvars["active"])
        out = self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=deltas, capture=capture,
        )
        return out

    def cov_features(self, state, x):
        """Forward used by the input-covariance pass; LoRAsub overrides this
        with its subtraction forward."""
        return self.vit_features(
            state.params, state.mvars, x, train=False, capture=True
        )

    def forward_logits(self, params, state, x, train):
        out = self.vit_features(params, state.mvars, x, train)
        return self._head.apply({"params": params["head"]}, out["features"])

    # ------------------------------------------------------------------ train

    def loss(self, params, state, batch, rng):
        logits = self.forward_logits(params, state, batch["x"], train=True)
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def trainable_lora(self) -> Tuple[str, ...]:
        """Which factor kinds receive gradients ('A', 'B')."""
        return ("A", "B")

    def _mask_lora_tree(self, tree, state):
        onehot = state.mvars["train_onehot"]  # (T,)
        tree = jax.tree_util.tree_map(lambda x: x, tree)
        lora = dict(tree["lora"])
        kinds = self.trainable_lora()
        for key in list(lora.keys()):
            kind = key.split("_")[0]
            if kind not in ("A", "B"):
                continue  # non-stacked streams (e.g. CL-LoRA shared) untouched
            g = lora[key]
            if kind not in kinds:
                lora[key] = jnp.zeros_like(g)
            else:
                mask = onehot.reshape((1, -1) + (1,) * (g.ndim - 2))
                lora[key] = g * mask
        tree["lora"] = lora
        return tree

    def transform_grads(self, grads, state):
        return self._mask_lora_tree(grads, state)

    def transform_updates(self, updates, state):
        # optimizer weight decay (add_decayed_weights inside tx.update) would
        # otherwise re-introduce wd*param updates for past-task LoRA factors
        # AFTER the gradient mask — the reference freezes old adapters via
        # requires_grad_(False), so they must stay bit-frozen here too (same
        # leak class as DER's frozen-extractor decay). Delegating to the
        # subclass's own transform_grads reuses its masking semantics; every
        # override in this family is an idempotent elementwise mask.
        return self.transform_grads(updates, state)

    # ------------------------------------------------------------- cov accum

    def input_covariances(self, state, task_data, max_batches: int = 0) -> List[np.ndarray]:
        """Per-layer (d, d) attention-input covariances over the task data
        (reference InfLoRA.py:152-160, vit_inflora.py:222-228 — the reference
        iterates the ENTIRE task loader; ``max_batches`` (0 = all) exists for
        tests only)."""
        bs = int(self.config["batch_size"])
        covs = [np.zeros((self.embed_dim, self.embed_dim), np.float64)
                for _ in range(self.depth)]

        @jax.jit
        def cov_step(state, images, weight):
            x = self.augment(None, images, train=False)
            out = self.cov_features(state, x)
            return [
                jnp.einsum(
                    "bsd,bse->de",
                    a * weight[:, None, None], a,
                    preferred_element_type=jnp.float32,
                )
                for a in out["attn_inputs"]
            ]

        n = 0
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            outs = cov_step(state, im, w)
            for i, c in enumerate(outs):
                covs[i] += np.asarray(c, np.float64)
            n += 1
            if max_batches and n >= max_batches:
                break
        return covs

    # ------------------------------------------------------------------ eval

    def eval_logits(self, state, x, task_id):
        logits = self.forward_logits(state.params, state, x, train=False)
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
