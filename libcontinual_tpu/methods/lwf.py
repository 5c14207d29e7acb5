"""LwF — Learning without Forgetting (Li & Hoiem, 2016).

Parity with reference core/model/lwf.py: on task > 0, CE over the current
task's classes plus ``3 x`` T=2 distillation of the old-class logits against
a frozen pre-task teacher (reference lwf.py:52-70; the ``lamda = 3`` is
hardcoded there, :65, and overridable here via kwargs).

TPU re-design: the teacher is a second frozen param pytree in ``mvars`` (the
reference deepcopies modules, lwf.py:33,48); both student and teacher run in
the same jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import copy_tree, kd_loss
from libcontinual_tpu.registry import METHODS


@METHODS.register("LWF")
class LWF(Method):
    # CE is current-task-only (distillation covers old classes); replayed
    # old-class samples would hit the -inf mask — no replay, as in the
    # reference's shipped config
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.lamda = float(self.kwargs.get("lamda", 3.0))
        self.T = float(self.kwargs.get("T", 2.0))

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
        }

    def before_task(self, state, task_idx, task_data):
        if task_idx > 0:
            mvars = dict(state.mvars)
            mvars["teacher"] = copy_tree(state.params)
            mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
            state = state.replace(mvars=mvars)
        return state

    def loss(self, params, state, batch, rng):
        logits, feats, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        cur_mask = state.seen_mask - state.prev_mask
        # task 0: the reference head is Linear(feat, init_cls_num) (lwf.py:14)
        # — CE spans only the seen classes, not the full fixed-width head
        mask = jnp.where(state.task > 0, cur_mask, state.seen_mask)
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), mask)

        # the reference trainer calls model.train() at the start of every
        # training epoch (trainer.py:575), recursively flipping the frozen
        # teacher back to train mode — its targets use the current batch's
        # BN statistics at training time; mirrored here (state discarded)
        t_logits, _, _ = self.forward(
            state.mvars["teacher"], state.mvars["teacher_state"], batch["x"], train=self.teacher_train
        )
        # keep the masked softmax finite on task 0 (prev_mask is empty there;
        # the kd term is zeroed by the `where` below anyway)
        safe_prev = jnp.where(state.task > 0, state.prev_mask, jnp.ones_like(state.prev_mask))
        kd = kd_loss(
            logits, t_logits, T=self.T,
            class_mask=safe_prev, weight=batch.get("weight"),
        )
        loss = ce + jnp.where(state.task > 0, self.lamda * kd, 0.0)
        return loss, {"logits": logits, "model_state": new_model_state}

    def eval_logits(self, state, x, task_id):
        """The reference head only spans the classes seen so far (grown per
        task, lwf.py:28-40), so its eval argmax cannot select an unseen
        class — mask the fixed-width head's unseen columns to match."""
        logits = super().eval_logits(state, x, task_id)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
