"""WA — Weight Aligning (Zhao et al., CVPR 2020, "Maintaining Discrimination
and Fairness in Class Incremental Learning").

Parity with reference core/model/wa.py:
  * train loss ``(1-lam)*CE + lam*KD`` with ``lam = known/total``
    (reference wa.py:162-178);
  * after each incremental task, rescale the new-class classifier rows by
    ``gamma = mean||w_old|| / mean||w_new||`` (reference wa.py:96-109);
  * herding exemplar buffer (trainer-managed).

TPU re-design: the weight-align step is a pure column-masked rescale of the
fixed-shape head kernel; the teacher is a frozen pytree.
"""

from __future__ import annotations

import jax.numpy as jnp

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import copy_tree, head_kernel, kd_loss, set_head_kernel
from libcontinual_tpu.registry import METHODS


@METHODS.register("WA")
class WA(Method):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.T = float(self.kwargs.get("T", 2.0))

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
        }

    def loss(self, params, state, batch, rng):
        logits, _, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        # reference wa.py:166: CE over the logits as-is (full allocated head
        # there = classes up to current task; here = masked to seen classes)
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
        known = jnp.sum(state.prev_mask)
        total = jnp.maximum(jnp.sum(state.seen_mask), 1.0)
        lam = jnp.where(state.task > 0, known / total, 0.0)
        loss = (1.0 - lam) * ce + lam * kd
        # metric logits masked to seen classes: never-trained future columns
        # would otherwise corrupt the train-accuracy argmax
        masked = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        lo, hi = self._class_range(task_idx)
        if task_idx > 0:
            k = head_kernel(state.params)  # (feat, num_class)
            norms = jnp.linalg.norm(k, axis=0)
            cols = jnp.arange(k.shape[1])
            new_sel = (cols >= lo) & (cols < hi)
            old_sel = cols < lo
            gamma = jnp.mean(norms, where=old_sel) / jnp.maximum(
                jnp.mean(norms, where=new_sel), 1e-12
            )
            k = jnp.where(new_sel[None, :], k * gamma, k)
            state = state.replace(params=set_head_kernel(state.params, k))
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def _class_range(self, t):
        lo = 0 if t == 0 else self.init_cls_num + (t - 1) * self.inc_cls_num
        hi = lo + (self.init_cls_num if t == 0 else self.inc_cls_num)
        return lo, hi

    def eval_logits(self, state, x, task_id):
        logits = super().eval_logits(state, x, task_id)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
