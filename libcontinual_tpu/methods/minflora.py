"""MInfLoRA / MInfLoRA2 / MInfLoRA3 — the reference authors' experimental
masked multi-LoRA variants (reference core/model/MInfLoRA*.py, masked
attention machinery in backbone/transformer.py:529-1254).

These are unpublished experiments (no reproduce README); the capability
surface preserved here is the masked-LoRA idea: InfLoRA's SVD-initialized
per-task branches plus a learnable per-rank gate on the current task's
factors (soft mask, trained jointly), with the mask binarized and frozen at
task end. MInfLoRA2/3 additionally disable in-epoch validation (reference
trainer.py:367-377) and vary the gated slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.methods.inflora import InfLoRA
from libcontinual_tpu.registry import METHODS


@METHODS.register("MInfLoRA")
class MInfLoRA(InfLoRA):
    def extra_params(self, rng):
        # per-layer, per-task, per-rank gate logits
        return {
            "rank_gate": jnp.ones(
                (self.depth, self.task_num, self.rank), jnp.float32
            )
        }

    def trainable_lora(self):
        return ("B",)

    def _gated_lora(self, params, task_or_all="all"):
        lora = dict(params["lora"])
        gate = jax.nn.sigmoid(4.0 * params["rank_gate"])  # (L, T, r)
        for slot in self.lora_slots:
            lora[f"A_{slot}"] = lora[f"A_{slot}"] * gate[..., None]
        return lora

    def qkv_deltas(self, lora, active):
        raise NotImplementedError  # gating needs params; see vit_features

    def vit_features(self, params, mvars, x, train, capture=False):
        lora = self._gated_lora(params)
        deltas = self._merged_deltas(lora, mvars["active"])
        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=deltas, capture=capture,
        )

    def _merged_deltas(self, lora, active):
        d = self.embed_dim
        deltas = {}
        slot_off = {"q": 0, "k": 1, "v": 2}
        for layer in range(self.depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot in self.lora_slots:
                dw = jnp.einsum(
                    "t,tdr,tre->de", active,
                    lora[f"B_{slot}"][layer], lora[f"A_{slot}"][layer],
                )
                off = slot_off[slot] * d
                delta = delta.at[:, off : off + d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)
        # gate trains only for the current task's slice
        onehot = state.mvars["train_onehot"]
        grads["rank_gate"] = grads["rank_gate"] * onehot[None, :, None]
        return grads

    def after_task(self, state, task_idx, task_data):
        state = super().after_task(state, task_idx, task_data)
        # binarize + freeze the trained task's gate
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        g = np.array(params["rank_gate"])
        g[:, task_idx] = np.where(g[:, task_idx] > 0.0, 10.0, -10.0)
        params["rank_gate"] = jnp.asarray(g)
        return state.replace(params=params)


@METHODS.register("MInfLoRA2")
class MInfLoRA2(MInfLoRA):
    validate_enabled = False
    lora_slots = ("k", "v")


@METHODS.register("MInfLoRA3")
class MInfLoRA3(MInfLoRA):
    validate_enabled = False
    lora_slots = ("q", "k", "v")
