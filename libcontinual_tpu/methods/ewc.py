"""EWC — Elastic Weight Consolidation (Kirkpatrick et al., 2016).

Capability parity with reference core/model/ewc.py:
  * quadratic Fisher penalty ``lamda/2 * sum F (p - p*)^2`` on task > 0
    (reference ewc.py:207-225, applied at observe :41);
  * CE restricted to the current task's classes on task > 0, full head on
    task 0 (reference ewc.py:27-41);
  * diagonal Fisher estimated over the task's data after each task — in
    TRAIN mode as the reference does (batch-stat BN gradients, running
    stats mutated by the passes, train transforms; ewc.py:160-199),
    normalized by the padded loader count (ewc.py:200-204) — merged with
    growing ``alpha = 1 - inc_cls_num/num_class`` over pre-existing rows
    only (new head rows keep their full new Fisher, ewc.py:129-133).

TPU re-design: the Fisher/reference-params live as pytrees in ``mvars`` (no
head re-allocation — fixed-shape head + class masks; "row existed before"
becomes a class-axis mask), the penalty fuses into the jitted train step,
and Fisher estimation is a jitted grad^2 accumulation over device batches.
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

    def eval_logits(self, state, x, task_id):
        """The reference head only spans the classes seen so far (grown per
        task, ewc.py:72-80), so its eval argmax (ewc.py:136-145) cannot
        select an unseen class — mask the fixed-width head's unseen columns
        to match."""
        logits = super().eval_logits(state, x, task_id)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)

    # ----------------------------------------------------------- fisher accum

    def _fisher_step_impl(self, state, fisher, model_state, images, labels, weight, rng):
        """One Fisher accumulation batch, reference ewc.py:160-199.

        Reference-exact details: the network runs in TRAIN mode
        (``self.network.train()``, ewc.py:181) — BatchNorm uses batch
        statistics for the gradients AND its running stats mutate across the
        estimation passes (the mutated stats are what later inference sees);
        the batch is train-transformed (the reference iterates the trainer's
        train_loader). The reference draws its augmentation randomness from
        the torch loader's live RNG, which is unmirrorable — here the stream
        is a deterministic fold of ``state.rng``; under randomness-free
        transforms the two coincide exactly (lockstep-tested).

        Documented approximation: when the task size does not divide the
        batch size, ``batch_iter`` pads the final batch by duplicating rows
        with weight 0. The weights zero those rows out of the CE (so the
        Fisher gradients match the reference's smaller final batch), but the
        duplicated rows still enter the TRAIN-mode BatchNorm batch statistics
        — the batch-stat denominators and the mutated running stats differ
        slightly from the reference's short batch. All shipped EWC configs
        and the lockstep tests use divisible sizes, where this vanishes.
        """

        def lfn(p):
            x = self.augment(rng, images, train=True)
            logits, _, new_ms = self.forward(p, model_state, x, train=True)
            ce = masked_cross_entropy(logits, labels, weight, state.seen_mask)
            return ce, new_ms

        grads, new_ms = jax.grad(lfn, has_aux=True)(state.params)
        n = jnp.sum(weight)
        fisher = jax.tree_util.tree_map(
            lambda f, g: f + (g**2) * n, fisher, grads
        )
        return fisher, new_ms

    def after_task(self, state, task_idx, task_data):
        fisher = zeros_like_tree(state.params)
        ms = state.mvars["model_state"]
        bs = int(self.config["batch_size"])
        steps = 0
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            rng = jax.random.fold_in(state.rng, 0x5EC0 + steps)
            fisher, ms = self._fisher_step(state, fisher, ms, im, lb, w, rng)
            steps += 1
        # normalize by batch_size * len(loader) — the reference divides by
        # the PADDED count when the task size doesn't divide (drop_last=False
        # loaders, ewc.py:200-204), not by the sample count
        fisher = jax.tree_util.tree_map(
            lambda f: f / max(bs * steps, 1), fisher)
        # GROWING-alpha merge (reference ewc.py:129-133): out_features is the
        # class count seen so far, so alpha = 0 after task 0 (new Fisher
        # replaces the zero init entirely), 0.5 after task 1, ... — a
        # constant alpha would underweight early-task Fisher 10x
        seen_classes = self.init_cls_num + task_idx * self.inc_cls_num
        alpha = 1.0 - self.inc_cls_num / seen_classes
        # The merge runs at task 0 too: reference ``self.fisher`` is
        # ZERO-initialized over the init_cls_num head in __init__
        # (ewc.py:67-68), not empty — so the task-0 Fisher comes out scaled
        # by (1-alpha) = inc/init (a no-op only when init == inc).
        merged = jax.tree_util.tree_map(
            lambda old, new: alpha * old + (1 - alpha) * new,
            state.mvars["fisher"], fisher,
        )
        # the reference merges only the rows that existed in the OLD
        # fisher (``new_fisher[n][:len(old)] = ...``, ewc.py:131-133):
        # head rows added by the current task keep their full new Fisher,
        # unmerged. Backbone leaves all pre-exist (same shapes), so only
        # the class axis of the head needs the split. At task 0 the
        # __init__ fisher already spans the init_cls_num head, so all
        # task-0 head rows merge.
        old_classes = self.init_cls_num if task_idx == 0 else seen_classes - self.inc_cls_num
        keep = jnp.arange(self.num_class) < old_classes
        hd_new = fisher["head"]["Dense_0"]
        hd_mrg = merged["head"]["Dense_0"]
        merged["head"]["Dense_0"] = {
            "kernel": jnp.where(keep[None, :], hd_mrg["kernel"], hd_new["kernel"]),
            "bias": jnp.where(keep, hd_mrg["bias"], hd_new["bias"]),
        }
        mvars = dict(state.mvars)
        mvars["fisher"] = merged
        mvars["ref_params"] = copy_tree(state.params)
        mvars["model_state"] = ms  # BN running stats mutated by the passes
        return state.replace(mvars=mvars)
