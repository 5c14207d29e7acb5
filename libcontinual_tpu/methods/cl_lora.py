"""CL-LoRA — continual LoRA with task-shared + task-specific adapters and
learnable block weights (reference core/model/cl_lora.py +
backbone/vit.py:206-296, transformer.py:2302-...).

Parity:
  * two adapter streams per attention layer: a task-SHARED LoRA pair trained
    across all tasks and task-SPECIFIC stacked pairs trained only on their
    task (cl_lora.py:53-113);
  * learnable per-block routing weights mix the two streams'
    weight deltas;
  * cosine-similarity classifier head; CE over the current task's classes;
  * validation disabled during training (reference trainer.py:367-377).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS


@METHODS.register("CL_LoRA")
class CLLoRA(LoRAViTMethod):
    lora_slots = ("q", "v")
    validate_enabled = False

    def init_lora_params(self, rng):
        params = super().init_lora_params(rng)  # task-specific stacks
        d, r, L = self.embed_dim, self.rank, self.depth
        keys = jax.random.split(rng, 2 * len(self.lora_slots))
        for i, slot in enumerate(self.lora_slots):
            params[f"sharedA_{slot}"] = (
                jax.random.normal(keys[2 * i], (L, r, d)) / np.sqrt(d)
            )
            params[f"sharedB_{slot}"] = jnp.zeros((L, d, r), jnp.float32)
        return params

    def extra_params(self, rng):
        return {"block_w": jnp.zeros((self.depth, 2), jnp.float32)}

    def head_module(self):
        from libcontinual_tpu.models.heads import CosineLinear

        return CosineLinear(self.num_class)

    def qkv_deltas(self, lora, active):
        raise NotImplementedError  # needs block weights; see _deltas

    def _deltas(self, params, mvars):
        d = self.embed_dim
        lora = params["lora"]
        active = mvars["active"]
        bw = jax.nn.softmax(params["block_w"], axis=-1)  # (L, 2)
        deltas = {}
        slot_off = {"q": 0, "k": 1, "v": 2}
        for layer in range(self.depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot in self.lora_slots:
                spec = jnp.einsum(
                    "t,tdr,tre->de", active,
                    lora[f"B_{slot}"][layer], lora[f"A_{slot}"][layer],
                )
                shared = lora[f"sharedB_{slot}"][layer] @ lora[f"sharedA_{slot}"][layer]
                dw = bw[layer, 0] * shared + bw[layer, 1] * spec
                off = slot_off[slot] * d
                delta = delta.at[:, off : off + d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def vit_features(self, params, mvars, x, train, capture=False):
        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=self._deltas(params, mvars), capture=capture,
        )

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)  # specific: cur task only
        return grads  # shared streams + block weights train every task

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        lora = {k: np.array(v) for k, v in params["lora"].items()}
        rng = np.random.RandomState(100 + task_idx)
        for slot in self.lora_slots:
            a = (rng.randn(self.rank, self.embed_dim) / np.sqrt(self.embed_dim)).astype(np.float32)
            for layer in range(self.depth):
                lora[f"A_{slot}"][layer, task_idx] = a
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        return state.replace(params=params)

    def loss(self, params, state, batch, rng):
        out = self.vit_features(params, state.mvars, batch["x"], train=True)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        masked = jnp.where(cur_mask[None] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def forward_logits(self, params, state, x, train):
        out = self.vit_features(params, state.mvars, x, train)
        return self._head.apply({"params": params["head"]}, out["features"])

    def eval_logits(self, state, x, task_id):
        logits = self.forward_logits(state.params, state, x, train=False)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
