"""iCaRL — Incremental Classifier and Representation Learning
(Rebuffi et al., CVPR 2017).

Parity with reference core/model/icarl.py:
  * training loss: CE over seen classes + T=2 KD of old-class logits against
    the frozen post-previous-task network (reference icarl.py:197-221);
  * herding exemplar buffer (trainer-managed with the device herding kernel,
    see core/buffer.py);
  * nearest-mean-of-exemplars (NME) inference once class means exist:
    argmin Euclidean distance to normalized exemplar class means
    (reference icarl.py:122-152, means recomputed post-buffer-update
    :226-287).

TPU re-design: class means are a fixed (num_class, feat_dim) array in
``mvars`` with a validity flag; the eval step computes both the logit and
NME predictions and selects by flag — one compiled eval program for the
whole run.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import copy_tree, kd_loss
from libcontinual_tpu.registry import METHODS


@METHODS.register("ICarl")
class ICarl(Method):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.T = float(self.kwargs.get("T", 2.0))

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
            "class_means": jnp.zeros((self.num_class, self.feat_dim), jnp.float32),
            "nme_ready": jnp.zeros((), jnp.float32),
            "mean_valid": jnp.zeros((self.num_class,), jnp.float32),
        }

    def loss(self, params, state, batch, rng):
        logits, _, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        ce = masked_cross_entropy(
            logits, batch["label"], batch.get("weight"), state.seen_mask
        )
        # the reference trainer calls model.train() at the start of every
        # training epoch (trainer.py:575), recursively flipping the frozen
        # teacher back to train mode — its targets use the current batch's
        # BN statistics at training time; mirrored here (state discarded)
        t_logits, _, _ = self.forward(
            state.mvars["teacher"], state.mvars["teacher_state"], batch["x"], train=self.teacher_train
        )
        safe_prev = jnp.where(
            state.task > 0, state.prev_mask, jnp.ones_like(state.prev_mask)
        )
        kd = kd_loss(
            logits, t_logits, T=self.T, class_mask=safe_prev,
            weight=batch.get("weight"),
        )
        loss = ce + jnp.where(state.task > 0, kd, 0.0)
        return loss, {"logits": logits, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def on_buffer_updated(self, state, task_idx, buffer):
        """Recompute exemplar class means (reference icarl.py:226-287)."""
        if buffer.labels is None or len(buffer.labels) == 0:
            return state
        # features of all exemplars through the current backbone
        from libcontinual_tpu.methods.common import batch_iter

        feats_all, labels_all = [], []
        bs = int(self.config["batch_size"])
        for im, lb, w in batch_iter(buffer.images, buffer.labels, bs):
            x = self.augment(None, im, train=False)
            out, _ = self.apply_backbone(
                state.params, state.mvars["model_state"], x, train=False
            )
            f = np.asarray(out["features"], np.float32)
            keep = np.asarray(w) > 0
            feats_all.append(f[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all)
        feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
        labels = np.concatenate(labels_all)
        means = np.zeros((self.num_class, self.feat_dim), np.float32)
        valid = np.zeros((self.num_class,), np.float32)
        for c in np.unique(labels):
            m = feats[labels == c].mean(0)
            means[c] = m / (np.linalg.norm(m) + 1e-12)
            valid[c] = 1.0
        mvars = dict(state.mvars)
        mvars["class_means"] = jnp.asarray(means)
        mvars["nme_ready"] = jnp.ones((), jnp.float32)
        mvars["mean_valid"] = jnp.asarray(valid)
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        out, _ = self.apply_backbone(
            state.params, state.mvars["model_state"], x, train=False
        )
        feats = out["features"]
        logits = self._head.apply({"params": state.params["head"]}, feats)
        logits = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        # NME scores: negative squared distance to class means
        d = jnp.sum(
            (feats[:, None, :] - state.mvars["class_means"][None, :, :]) ** 2, axis=-1
        )
        nme = jnp.where(state.seen_mask[None, :] > 0, -d, -1e30)
        # NME only once means cover EVERY seen class — mid-task validation of
        # a new task would otherwise score its classes against zero vectors
        # (reference icarl.py:100-117 falls back to logit inference)
        covered = jnp.min(
            jnp.where(state.seen_mask > 0, state.mvars["mean_valid"], 1.0)
        )
        use_nme = (state.mvars["nme_ready"] > 0) & (covered > 0)
        return jnp.where(use_nme, nme, logits)
