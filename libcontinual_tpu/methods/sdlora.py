"""SD-LoRA — Scalable Decoupled LoRA (reference core/model/sd_lora.py +
backbone/transformer.py:276-357).

Decouples each task's LoRA update into a *normalized direction*
``(B_t A_t) / (|B_t||A_t|)`` and a *learnable magnitude* shared across
blocks; supports a rank-reduction schedule and post-task knowledge-dist
merging (least-squares fit of the newest direction onto previous ones; on a
good fit the solution is assimilated into past magnitudes and the new
factors are zeroed, reference sd_lora.py:142-207).

TPU re-design: directions come from the stacked factors at forward time (the
norms are cheap reductions); magnitudes are a (T,) param vector; assimilated
magnitudes are per-layer (L, T) mvars folded into the merge einsum.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS


@METHODS.register("SD_LoRA")
class SDLoRA(LoRAViTMethod):
    lora_slots = ("q", "v")

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.init_mag = float(self.kwargs.get("init_mag", 1.0))
        rr = self.kwargs.get("rank_reduction", [False, 0, 0, 0, 0])
        self.rank_reduction = rr
        kd = self.kwargs.get("knowledge_dist", [False, 0.0])
        self.knowledge_dist = kd
        self._cur_rank = self.rank

    def extra_params(self, rng):
        # per-LAYER per-task magnitudes: each reference attention module owns
        # its own mag_lora list (transformer.py:276-330)
        return {"mag": jnp.full((self.depth, self.task_num), self.init_mag,
                                jnp.float32)}

    def extra_mvars(self):
        return {
            "assim_q": jnp.zeros((self.depth, self.task_num), jnp.float32),
            "assim_v": jnp.zeros((self.depth, self.task_num), jnp.float32),
        }

    def qkv_deltas(self, lora, active):
        # overridden by full-state version below; base signature kept for API
        raise NotImplementedError("SD-LoRA deltas need mag/assim state")

    def _deltas(self, params, mvars) -> Dict[int, jax.Array]:
        d = self.embed_dim
        active = mvars["active"]
        onehot = mvars["train_onehot"]
        deltas = {}
        for layer in range(self.depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            mag = params["mag"][layer]  # (T,)
            for slot, off, assim_key in (("q", 0, "assim_q"), ("v", 2, "assim_v")):
                A = params["lora"][f"A_{slot}"][layer]  # (T, r, d)
                B = params["lora"][f"B_{slot}"][layer]  # (T, d, r)
                # eps INSIDE the sqrt: at B=0 (fresh task) sqrt' would be inf
                nA = jnp.sqrt(jnp.sum(A**2, axis=(1, 2)) + 1e-12)  # (T,)
                nB = jnp.sqrt(jnp.sum(B**2, axis=(1, 2)) + 1e-12)
                # reference transformer.py:317-330: the CURRENT task trains
                # mag[-1] * B A with NO norm division; only PAST tasks become
                # normalized directions scaled by (mag_i + assim_i)
                past = (mag + mvars[assim_key][layer]) / (nA * nB)
                coeff = active * jnp.where(onehot > 0, mag, past)
                dw = jnp.einsum("t,tdr,tre->de", coeff, B, A)
                delta = delta.at[:, off * d : (off + 1) * d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def vit_features(self, params, mvars, x, train, capture=False):
        deltas = self._deltas(params, mvars)
        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=deltas, capture=capture,
        )

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        # rank-reduction schedule (sd_lora.py:111-119)
        rr = self.rank_reduction
        if rr and rr[0]:
            if task_idx == rr[1]:
                self._cur_rank = int(rr[3])
            elif task_idx == rr[2]:
                self._cur_rank = int(rr[4])
        # fresh magnitudes each task (sd_lora.py:121-124) + init current A/B
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        params["mag"] = jnp.full((self.depth, self.task_num), self.init_mag,
                                 jnp.float32)
        lora = {k: np.array(v) for k, v in params["lora"].items()}
        rng = np.random.RandomState(task_idx)
        r = self._cur_rank
        # torch Linear kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
        # drawn independently per attention module (transformer.py:298-301)
        bound = 1.0 / np.sqrt(self.embed_dim)
        for slot in self.lora_slots:
            for layer in range(self.depth):
                a = np.zeros((self.rank, self.embed_dim), np.float32)
                a[:r] = rng.uniform(
                    -bound, bound, size=(r, self.embed_dim)
                ).astype(np.float32)
                lora[f"A_{slot}"][layer, task_idx] = a
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        return state.replace(params=params)

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)  # masks A/B to cur task
        return grads  # mag stays fully trainable

    def loss(self, params, state, batch, rng):
        logits = self.forward_logits(params, state, batch["x"], train=True)
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        return ce, {"logits": jnp.where(cur_mask[None] > 0, logits, -1e30),
                    "model_state": {}}

    def after_task(self, state, task_idx, task_data):
        if not (self.knowledge_dist and self.knowledge_dist[0]) or task_idx == 0:
            return state
        thresh = float(self.knowledge_dist[1])
        lora = {k: np.array(v) for k, v in state.params["lora"].items()}
        assim = {
            "q": np.array(state.mvars["assim_q"]),
            "v": np.array(state.mvars["assim_v"]),
        }
        for layer in range(self.depth):
            for slot in self.lora_slots:
                dirs = []
                for t in range(task_idx + 1):
                    B = lora[f"B_{slot}"][layer, t]
                    A = lora[f"A_{slot}"][layer, t]
                    nb, na = np.linalg.norm(B), np.linalg.norm(A)
                    d = B @ A
                    if nb > 0 and na > 0:
                        d = d / (nb * na)
                    dirs.append(d.flatten())
                last = np.stack(dirs[-1:], axis=-1)
                prev = np.stack(dirs[:-1], axis=-1)
                sol, res, _, _ = np.linalg.lstsq(prev, last, rcond=None)
                residual = float(res[0]) if len(res) else np.inf
                if residual < thresh:
                    assim[slot][layer, :task_idx] += sol[:, 0]
                    lora[f"A_{slot}"][layer, task_idx] = 0.0
                    lora[f"B_{slot}"][layer, task_idx] = 0.0
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        mvars = dict(state.mvars)
        mvars["assim_q"] = jnp.asarray(assim["q"])
        mvars["assim_v"] = jnp.asarray(assim["v"])
        return state.replace(params=params, mvars=mvars)

    def eval_logits(self, state, x, task_id):
        logits = self.forward_logits(state.params, state, x, train=False)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
