"""EWC — Elastic Weight Consolidation (Kirkpatrick et al., 2016).

Capability parity with reference core/model/ewc.py:
  * quadratic Fisher penalty ``lamda/2 * sum F (p - p*)^2`` on task > 0
    (reference ewc.py:207-225, applied at observe :41);
  * CE restricted to the current task's classes on task > 0, full head on
    task 0 (reference ewc.py:27-41);
  * diagonal Fisher estimated over the task's data after each task, merged
    with growing ``alpha = 1 - inc_cls_num/num_class``
    (reference ewc.py:129-133, 147-205).

TPU re-design: the Fisher/reference-params live as pytrees in ``mvars`` (no
head re-allocation — fixed-shape head + class masks), the penalty fuses into
the jitted train step, and Fisher estimation is a jitted grad^2 accumulation
scanned over device batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter, copy_tree, zeros_like_tree
from libcontinual_tpu.registry import METHODS


def ewc_penalty(fisher, params, ref_params):
    """Quadratic Fisher penalty ``1/2 * sum F (p - p*)^2``
    (reference ewc.py:207-225; the lamda factor is applied by the caller)."""
    return jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda f, p, r: jnp.sum(f * (p - r) ** 2), fisher, params, ref_params
        ),
    ) / 2.0


@METHODS.register("EWC")
class EWC(Method):
    # CE is current-task-only by design (reference ewc.py:92-99 trains
    # logit[:, old:] on y - old); replayed old-class samples would hit the
    # -inf mask and blow the loss up — the reference's shipped config has no
    # buffer, and its label rebase would crash on replay anyway
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.lamda = float(self.kwargs.get("lamda", 1000.0))
        self._fisher_step = jax.jit(self._fisher_step_impl)

    def init_mvars(self, rng, params, model_state):
        return {
            "fisher": zeros_like_tree(params),
            "ref_params": copy_tree(params),
        }

    def loss(self, params, state, batch, rng):
        logits, feats, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        cur_mask = state.seen_mask - state.prev_mask
        # task 0: the reference head is Linear(feat, init_cls_num) (ewc.py:60)
        # — CE spans only the seen classes, not the full fixed-width head
        mask = jnp.where(state.task > 0, cur_mask, state.seen_mask)
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), mask)

        penalty = ewc_penalty(state.mvars["fisher"], params, state.mvars["ref_params"])
        loss = ce + jnp.where(state.task > 0, self.lamda * penalty, 0.0)
        return loss, {"logits": logits, "model_state": new_model_state}

    # ----------------------------------------------------------- fisher accum

    def _fisher_step_impl(self, state, fisher, images, labels, weight):
        def lfn(p):
            x = self.augment(None, images, train=False)
            logits, _, _ = self.forward(p, state.mvars["model_state"], x, train=False)
            return masked_cross_entropy(logits, labels, weight, state.seen_mask)

        grads = jax.grad(lfn)(state.params)
        n = jnp.sum(weight)
        return jax.tree_util.tree_map(
            lambda f, g: f + (g**2) * n, fisher, grads
        )

    def after_task(self, state, task_idx, task_data):
        fisher = zeros_like_tree(state.params)
        count = 0
        bs = int(self.config["batch_size"])
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            fisher = self._fisher_step(state, fisher, im, lb, w)
            count += int(jnp.sum(w))
        fisher = jax.tree_util.tree_map(lambda f: f / max(count, 1), fisher)
        # GROWING-alpha merge (reference ewc.py:129-133): out_features is the
        # class count seen so far, so alpha = 0 after task 0 (new Fisher
        # replaces the zero init entirely), 0.5 after task 1, ... — a
        # constant alpha would underweight early-task Fisher 10x
        seen_classes = self.init_cls_num + task_idx * self.inc_cls_num
        alpha = 1.0 - self.inc_cls_num / seen_classes
        if task_idx == 0:
            # first Fisher: stored as-is (reference merge loop runs over an
            # empty dict at task 0)
            merged = fisher
        else:
            merged = jax.tree_util.tree_map(
                lambda old, new: alpha * old + (1 - alpha) * new,
                state.mvars["fisher"], fisher,
            )
        mvars = dict(state.mvars)
        mvars["fisher"] = merged
        mvars["ref_params"] = copy_tree(state.params)
        return state.replace(mvars=mvars)
