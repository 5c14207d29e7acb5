"""LoRAsub-DRS — LoRA subtraction with a Drift-Resistant Space
(reference core/model/lora_sub.py).

Parity:
  * per-task LoRA on the attention projections of a frozen ViT;
  * the custom DRS-Adam: the *Adam update* (not the gradient) is projected
    onto the normalized principal subspace of each LoRA layer's input
    features, ``transform = V V^T / ||V V^T||`` from an SVD with energy
    threshold ``thres`` (lora_sub.py:159-233) — realized here through the
    ``transform_updates`` hook, so the optax Adam stays stock;
  * augmented triplet loss: hardest-positive/hardest-negative margin ranking
    where old-class feature prototypes also serve as negatives
    (lora_sub.py:27-68);
  * method-owned optimizer/schedule override: Adam + CosineSchedule(K=epoch)
    (reference trainer.py:324-327).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.core.optim import ScheduleController
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS


def augmented_triplet_loss(feats, labels, weight, protos, proto_valid, margin=1.0):
    """Hardest-pos/neg margin ranking + prototype negatives
    (lora_sub.py:27-68)."""
    n = feats.shape[0]
    d = jnp.sum(feats**2, axis=1)
    dist = jnp.sqrt(
        jnp.maximum(d[:, None] + d[None, :] - 2 * feats @ feats.T, 1e-12)
    )
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    if weight is not None:
        pairw = weight[:, None] * weight[None, :]
        same = same * pairw
        diff_valid = (1 - (labels[:, None] == labels[None, :]).astype(jnp.float32)) * pairw
    else:
        diff_valid = 1 - same
    dist_ap = jnp.max(dist * same, axis=1)
    dist_an = jnp.min(jnp.where(diff_valid > 0, dist, jnp.inf), axis=1)
    dist_an = jnp.where(jnp.isfinite(dist_an), dist_an, dist_ap + margin)
    # prototype negatives
    pn = protos / (jnp.linalg.norm(protos, axis=1, keepdims=True) + 1e-12)
    dp = jnp.sqrt(
        jnp.maximum(
            jnp.sum((feats[:, None, :] - pn[None, :, :]) ** 2, axis=-1), 1e-12
        )
    )
    dp = jnp.where(proto_valid[None, :] > 0, dp, jnp.inf)
    dp_min = jnp.min(dp, axis=1)
    dist_an = jnp.minimum(dist_an, jnp.where(jnp.isfinite(dp_min), dp_min, dist_an))
    viol = jnp.maximum(margin - (dist_an - dist_ap), 0.0)
    if weight is not None:
        return jnp.sum(viol * weight) / jnp.maximum(jnp.sum(weight), 1.0)
    return jnp.mean(viol)


@METHODS.register("LoRAsub_DRS", aliases=("LoRAsub",))
class LoRAsubDRS(LoRAViTMethod):
    # reference MultiHeadAttention_LoRA_Sub adapts k and v
    # (transformer.py:359-424 "Attention module with lora, apply to k, v")
    lora_slots = ("k", "v")
    validate_enabled = False  # reference trainer.py:367-377

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        # reference kwarg names: margin_inter / lambada / fc_lrate
        # (lora_sub.py:281-283, zz_LoRA-Sub-DRS configs)
        self.margin = float(
            self.kwargs.get("margin_inter", self.kwargs.get("margin", 1.0))
        )
        # the DRS-Adam reserves basis with thres=0.99 per param group
        # (lora_sub.py:418-419)
        self.thres = float(self.kwargs.get("thres", 0.99))
        self.triplet_weight = float(
            self.kwargs.get("lambada", self.kwargs.get("triplet_weight", 1.0))
        )
        # the classifier trains at its own lr (fc_lrate, lora_sub.py:413-421);
        # realized as a per-group scale on the head's Adam updates
        base_lr = float(
            (self.config.get("optimizer", {}).get("kwargs") or {}).get("lr", 1e-3)
        )
        fc_lr = float(self.kwargs.get("fc_lrate", base_lr))
        self._head_lr_scale = fc_lr / max(base_lr, 1e-12)
        self.tx = optax.scale_by_adam()  # DRS projection composes on top
        self.init_tx = None

    def override_schedule(self, task_idx, steps_per_epoch, epochs):
        lr = float(self.config["optimizer"]["kwargs"].get("lr", 1e-3))
        return ScheduleController(
            {"lr_scheduler": {"name": "CosineSchedule", "kwargs": {"K": epochs}}},
            lr, steps_per_epoch, epochs,
        )

    def extra_mvars(self):
        d = self.embed_dim
        return {
            "drs": jnp.zeros((self.depth, d, d), jnp.float32),
            "drs_on": jnp.zeros((), jnp.float32),
            "protos": jnp.zeros((self.num_class, self.embed_dim), jnp.float32),
            "proto_valid": jnp.zeros((self.num_class,), jnp.float32),
        }

    def transform_updates(self, updates, state):
        # mask frozen-task factors first (weight-decay leak guard), then
        # apply the DRS projection to the surviving current-task A updates
        updates = super().transform_updates(updates, state)
        on = state.mvars["drs_on"]
        updates = jax.tree_util.tree_map(lambda x: x, updates)
        lora = dict(updates["lora"])
        for slot in self.lora_slots:
            # A: (L, T, r, d) — project along the feature dim with the
            # layer's drift-resistant transform (reference lora_sub.py:362-365
            # registers the transform for BOTH lora_A and lora_B; Adam applies
            # update_A @ T and T @ update_B)
            A = lora[f"A_{slot}"]
            proj = jnp.einsum("ltrd,lde->ltre", A, state.mvars["drs"])
            lora[f"A_{slot}"] = jnp.where(on > 0, proj, A)
            # B: (L, T, d, r) — project along the output-feature dim
            B = lora[f"B_{slot}"]
            projB = jnp.einsum("lde,lter->ltdr", state.mvars["drs"], B)
            lora[f"B_{slot}"] = jnp.where(on > 0, projB, B)
        updates["lora"] = lora
        # per-group classifier lr (reference fc_lrate, lora_sub.py:413-421)
        if self._head_lr_scale != 1.0:
            updates["head"] = jax.tree_util.tree_map(
                lambda u: u * self._head_lr_scale, updates["head"]
            )
        return updates

    def cov_features(self, state, x):
        # LoRA SUBTRACTION (the method's namesake): the DRS input-matrix pass
        # forwards with W0 - sum(prev deltas) on k/v — reference
        # transformer.py:407-413 (compute_input_matrix uses
        # k_weight - prev_k_weight). At before_task time the new task's B is
        # zero, so the active merged delta IS the previous-task sum.
        deltas = self.qkv_deltas(state.params["lora"], state.mvars["active"])
        neg = {k: -v for k, v in deltas.items()}
        return self.backbone.apply(
            {"params": state.mvars["frozen"]}, x, train=False,
            qkv_deltas=neg, capture=True,
        )

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        # fresh random A, zero B for the new task
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        lora = {k: np.array(v) for k, v in params["lora"].items()}
        rng = np.random.RandomState(task_idx)
        for slot in self.lora_slots:
            a = (rng.randn(self.rank, self.embed_dim) / np.sqrt(self.embed_dim)).astype(np.float32)
            for layer in range(self.depth):
                lora[f"A_{slot}"][layer, task_idx] = a
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        state = state.replace(params=params)
        if task_idx == 0:
            return state
        # DRS transforms from per-layer input-feature SVDs (lora_sub.py:159+)
        covs = self.input_covariances(state, task_data)
        drs = np.zeros((self.depth, self.embed_dim, self.embed_dim), np.float32)
        for li, cov in enumerate(covs):
            w, v = np.linalg.eigh(cov)
            w, v = w[::-1], v[:, ::-1]
            csum = np.cumsum(w) / max(np.sum(w), 1e-12)
            k = int(np.searchsorted(csum, self.thres)) + 1
            basis = v[:, :k]
            t = basis @ basis.T
            drs[li] = (t / max(np.linalg.norm(t), 1e-12)).astype(np.float32)
        mvars = dict(state.mvars)
        mvars["drs"] = jnp.asarray(drs)
        mvars["drs_on"] = jnp.ones((), jnp.float32)
        return state.replace(mvars=mvars)

    def loss(self, params, state, batch, rng):
        out = self.vit_features(params, state.mvars, batch["x"], train=True)
        feats = out["features"]
        logits = self._head.apply({"params": params["head"]}, feats)
        w = batch.get("weight")
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], w, cur_mask)
        fn = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
        tri = augmented_triplet_loss(
            fn, batch["label"], w,
            state.mvars["protos"], state.mvars["proto_valid"] * state.prev_mask,
            self.margin,
        )
        masked = jnp.where(cur_mask[None] > 0, logits, -1e30)
        return ce + self.triplet_weight * tri, {"logits": masked, "model_state": {}}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        protos = np.array(state.mvars["protos"])
        valid = np.array(state.mvars["proto_valid"])

        @jax.jit
        def feat(state, images):
            x = self.augment(None, images, train=False)
            return self.vit_features(state.params, state.mvars, x, train=False)["features"]

        feats_all, labels_all = [], []
        for im, lb, wt in batch_iter(task_data.images, task_data.labels, bs):
            f = np.asarray(feat(state, im))
            keep = np.asarray(wt) > 0
            feats_all.append(f[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all)
        labels = np.concatenate(labels_all)
        for c in np.unique(labels):
            protos[c] = feats[labels == c].mean(0)
            valid[c] = 1.0
        mvars = dict(state.mvars)
        mvars["protos"] = jnp.asarray(protos)
        mvars["proto_valid"] = jnp.asarray(valid)
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        # reference inference is nearest-class-mean over NORMALIZED
        # prototypes (lora_sub.py inference(): argmin ||f/|f| - p/|p|||^2);
        # head logits are only the task-0 fallback before any prototypes
        # exist (mid-task validation)
        out = self.vit_features(state.params, state.mvars, x, train=False)
        f = out["features"]
        fn = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-8)
        pn = state.mvars["protos"] / (
            jnp.linalg.norm(state.mvars["protos"], axis=1, keepdims=True) + 1e-8
        )
        d2 = jnp.sum((fn[:, None, :] - pn[None, :, :]) ** 2, axis=-1)
        valid = state.mvars["proto_valid"] * state.seen_mask
        ncm = jnp.where(valid[None, :] > 0, -d2, -1e30)
        head = self._head.apply({"params": state.params["head"]}, f)
        head = jnp.where(state.seen_mask[None, :] > 0, head, -1e30)
        return jnp.where(jnp.sum(valid) > 0, ncm, head)
