"""PRAKA — Prototype Reminiscence and Augmented Asymmetric Knowledge
Aggregation (Shi & Ye, ICCV 2023), non-exemplar class-incremental CL.

Parity with reference core/model/praka.py:
  * joint self-supervised head over ``4 * num_class`` rotation-classes: each
    batch trains on all 4 global rotations with labels ``4*y + rot``
    (praka.py:26-44);
  * prototype reminiscence: per-class feature prototypes saved after each
    task; on later tasks, old prototypes (plus Gaussian jitter = "augmented
    prototypes") replay through the classifier (praka.py:114-...);
  * feature KD: MSE between current and frozen-previous features on the
    incoming batch.

TPU re-design: rotations are layout ops inside the jitted step; prototypes
are a fixed (num_class, feat_dim) array with a validity mask; prototype
replay is a fixed-size Gumbel draw over valid classes — scan-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter, copy_tree
from libcontinual_tpu.registry import METHODS


@METHODS.register("PRAKA")
class PRAKA(Method):
    validate_enabled = False  # reference trainer.py:367-377
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.proto_bs = int(self.kwargs.get("proto_batch", 64))
        self.kd_weight = float(self.kwargs.get("kd_weight", 10.0))
        self.proto_weight = float(self.kwargs.get("proto_weight", 10.0))

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class * 4)

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
            "protos": jnp.zeros((self.num_class, self.feat_dim), jnp.float32),
            "proto_valid": jnp.zeros((self.num_class,), jnp.float32),
            "proto_radius": jnp.ones((), jnp.float32),
        }

    def loss(self, params, state, batch, rng):
        x, y, w = batch["x"], batch["label"], batch.get("weight")
        b = x.shape[0]
        xs = jnp.concatenate([jnp.rot90(x, k, axes=(1, 2)) for k in range(4)], axis=0)
        ys = jnp.concatenate([4 * y + k for k in range(4)], axis=0)
        ws = jnp.tile(w, 4) if w is not None else None

        logits, feats, new_ms = self.forward(
            params, state.mvars["model_state"], xs, train=True
        )
        joint_mask = jnp.repeat(state.seen_mask, 4)
        ce = masked_cross_entropy(logits, ys, ws, joint_mask)

        # feature KD on the un-rotated batch (rows 0..b)
        t_out, _ = self.apply_backbone(
            state.mvars["teacher"], state.mvars["teacher_state"], x, train=False
        )
        kd = jnp.mean(
            (feats[:b] - jax.lax.stop_gradient(t_out["features"])) ** 2
        )

        # prototype replay: draw proto_bs old-class prototypes + jitter
        k1, k2 = jax.random.split(rng)
        old_valid = state.mvars["proto_valid"] * state.prev_mask
        g = jax.random.gumbel(k1, (self.proto_bs, self.num_class))
        cls = jnp.argmax(jnp.log(old_valid[None, :] + 1e-30) + g, axis=1)
        noise = jax.random.normal(k2, (self.proto_bs, self.feat_dim))
        pf = state.mvars["protos"][cls] + noise * state.mvars["proto_radius"]
        p_logits = self._head.apply({"params": params["head"]}, pf)
        p_ce = masked_cross_entropy(p_logits, 4 * cls, None, joint_mask)

        on = jnp.where((state.task > 0) & (jnp.sum(old_valid) > 0), 1.0, 0.0)
        loss = ce + on * (self.kd_weight * kd + self.proto_weight * p_ce)
        eval_logits = logits[:b, 0::4]
        return loss, {"logits": eval_logits, "model_state": new_ms}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        protos = np.array(state.mvars["protos"])
        valid = np.array(state.mvars["proto_valid"])
        feats_all, labels_all = [], []

        @jax.jit
        def feat(state, images):
            x = self.augment(None, images, train=False)
            out, _ = self.apply_backbone(
                state.params, state.mvars["model_state"], x, train=False
            )
            return out["features"]

        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            f = np.asarray(feat(state, im))
            keep = np.asarray(w) > 0
            feats_all.append(f[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all)
        labels = np.concatenate(labels_all)
        radii = []
        for c in np.unique(labels):
            fc = feats[labels == c]
            protos[c] = fc.mean(0)
            valid[c] = 1.0
            radii.append(np.mean(np.var(fc, axis=0)))
        mvars = dict(state.mvars)
        mvars["protos"] = jnp.asarray(protos)
        mvars["proto_valid"] = jnp.asarray(valid)
        mvars["proto_radius"] = jnp.asarray(np.sqrt(np.mean(radii)), jnp.float32)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        cls_logits = logits[:, 0::4]  # rotation-0 slots
        return jnp.where(state.seen_mask[None, :] > 0, cls_logits, -1e30)
