"""BiC — Bias Correction for large-scale incremental learning
(Wu et al., CVPR 2019).

Parity with reference core/model/bic.py + the trainer's stage-2 loop
(reference trainer.py:421-455):
  * stage 1: ``alpha*KD*T^2 + (1-alpha)*CE`` with ``alpha = old/seen``
    (bic.py:193-217), logits passed through per-task bias layers;
  * per-task bias layers ``alpha_t * logit + beta_t`` applied to that task's
    class slice (backbone/resnet.py:579-587, bic.py:125-153); only the
    current task's (alpha, beta) train in stage 2 on a held-out split of the
    exemplar buffer (bic.py:219-232);
  * the trainer's per-task optimizer override
    ``SGD(lr=0.1, momentum=0.9, wd=2e-4*task_num/(t+1))``
    (trainer.py:297-300) — realized here as a weight-decay *array* in mvars
    folded into ``transform_grads`` so no recompilation per task.

TPU re-design: bias layers are two (task_num,) vectors in ``mvars``; stage 2
is a method-owned extra phase (``extra_phases``) with its own tiny jitted
Adam step over just those two vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.optim import ScheduleController
from libcontinual_tpu.methods.common import batch_iter, copy_tree, kd_loss
from libcontinual_tpu.registry import METHODS


@METHODS.register("bic")
class BiC(Method):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.T = float(self.kwargs.get("T", 2.0))
        self.stage2_epoch = int(config.get("stage2_epoch", self.kwargs.get("stage2_epoch", 50)))
        self.split_ratio = float(self.kwargs.get("split_ratio", 0.1))
        # task id of every class column (static)
        toc = np.zeros((self.num_class,), np.int32)
        for t in range(self.task_num):
            lo = 0 if t == 0 else self.init_cls_num + (t - 1) * self.inc_cls_num
            hi = lo + (self.init_cls_num if t == 0 else self.inc_cls_num)
            toc[lo:hi] = t
        self._task_of_class = jnp.asarray(toc)
        self._bias_tx = optax.adam(1e-3)
        self._stage2_step = jax.jit(self._stage2_step_impl)
        # reference trainer.py:297-300 replaces the config optimizer outright
        self.tx = optax.trace(decay=0.9)
        self.init_tx = None

    def build_train_data(self, task_data, buffer, task_idx):
        """Held-out stage-2 protocol (reference bic.py spilt_and_update):
        classwise 90/10 split of the task data; the buffer likewise splits
        into train/val exemplar parts. Stage 1 trains on 90% task + buffer
        train part; stage 2's bias training sees ONLY the held-out 10% +
        buffer val part — data stage 1 never fit."""
        from libcontinual_tpu.data.continual import TaskData

        rng = np.random.RandomState(
            int(self.config.get("seed", 0)) * 1000 + task_idx
        )
        imgs, labels = task_data.images, task_data.labels
        tr_idx, va_idx = [], []
        for c in np.unique(labels):
            idx = np.nonzero(labels == c)[0]
            rng.shuffle(idx)
            n_val = max(1, int(len(idx) * self.split_ratio)) if len(idx) > 1 else 0
            va_idx.append(idx[:n_val])
            tr_idx.append(idx[n_val:])
        tr_idx = np.concatenate(tr_idx)
        va_idx = np.concatenate(va_idx) if va_idx else np.zeros((0,), np.int64)

        def mk(i):
            if len(i) == 0:
                return None
            return TaskData(
                images=imgs[i], labels=labels[i],
                class_lo=task_data.class_lo, class_hi=task_data.class_hi,
            )

        train = mk(tr_idx)
        val = mk(va_idx)
        buf_split = getattr(buffer, "split", None)
        if buf_split is not None and buffer.buffer_size > 0 and task_idx > 0 \
                and len(buffer) > 0:
            btr, bva = buffer.split(
                seed=int(self.config.get("seed", 0)) + task_idx
            )
            if btr is not None:
                train = train.concat(btr) if train is not None else btr
            if bva is not None:
                val = val.concat(bva) if val is not None else bva
        self._stage2_data = val
        return train

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
            "alphas": jnp.ones((self.task_num,), jnp.float32),
            "betas": jnp.zeros((self.task_num,), jnp.float32),
            "wd": jnp.asarray(2e-4 * self.task_num, jnp.float32),
        }

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["wd"] = jnp.asarray(2e-4 * self.task_num / (task_idx + 1), jnp.float32)
        # new task's bias layer starts at identity
        mvars["alphas"] = mvars["alphas"].at[task_idx].set(1.0)
        mvars["betas"] = mvars["betas"].at[task_idx].set(0.0)
        return state.replace(mvars=mvars)

    def transform_grads(self, grads, state):
        # per-task weight decay folded into the gradient (torch-SGD coupled)
        return jax.tree_util.tree_map(
            lambda g, p: g + state.mvars["wd"] * p, grads, state.params
        )

    def _bias_forward(self, logits, alphas, betas):
        from libcontinual_tpu.models.heads import bias_correct

        return bias_correct(logits, alphas, betas, self._task_of_class)

    def loss(self, params, state, batch, rng):
        logits, _, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        p = self._bias_forward(logits, state.mvars["alphas"], state.mvars["betas"])
        w = batch.get("weight")
        ce = masked_cross_entropy(p, batch["label"], w, state.seen_mask)

        # the reference never calls previous_model.eval() (bic.py:110-117
        # deepcopies + freezes grads only), so the frozen teacher runs in
        # TRAIN mode — its distillation targets use the current batch's BN
        # statistics, not running averages; mirrored here
        t_logits, _, _ = self.forward(
            state.mvars["teacher"], state.mvars["teacher_state"], batch["x"], train=self.teacher_train
        )
        tp = self._bias_forward(t_logits, state.mvars["alphas"], state.mvars["betas"])
        safe_prev = jnp.where(
            state.task > 0, state.prev_mask, jnp.ones_like(state.prev_mask)
        )
        kd = kd_loss(p, tp, T=self.T, class_mask=safe_prev, weight=w)

        seen = jnp.maximum(jnp.sum(state.seen_mask), 1.0)
        old = jnp.sum(state.prev_mask)
        alpha = old / seen
        loss = jnp.where(
            state.task > 0,
            alpha * kd * self.T**2 + (1.0 - alpha) * ce,
            ce,
        )
        return loss, {"logits": p, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    # ----------------------------------------------------------- stage 2

    def _stage2_step_impl(self, state, ab, opt_state, images, labels, weight):
        def lfn(ab_):
            x = self.augment(None, images, train=False)
            logits, _, _ = self.forward(
                state.params, state.mvars["model_state"], x, train=False
            )
            onehot = (
                jnp.arange(self.task_num) == state.task
            ).astype(jnp.float32)
            alphas = state.mvars["alphas"] * (1 - onehot) + ab_[0] * onehot
            betas = state.mvars["betas"] * (1 - onehot) + ab_[1] * onehot
            p = self._bias_forward(logits, alphas, betas)
            return masked_cross_entropy(p, labels, weight, state.seen_mask)

        loss, g = jax.value_and_grad(lfn)(ab)
        updates, opt_state = self._bias_tx.update(g, opt_state, ab)
        return optax.apply_updates(ab, updates), opt_state, loss

    def extra_phases(self, trainer, state, task_idx, task_data):
        """Stage-2 bias training on the HELD-OUT split stashed by
        build_train_data — data stage 1 never trained on (reference
        trainer.py:421-455, bic.py:219-232, spilt_and_update)."""
        if task_idx == 0:
            return state
        rng = np.random.RandomState(int(self.config.get("seed", 0)) + task_idx)
        held = getattr(self, "_stage2_data", None)
        if held is None or len(held) == 0:
            return state
        vi, vl = held.images, held.labels

        ab = jnp.asarray(
            [float(state.mvars["alphas"][task_idx]), float(state.mvars["betas"][task_idx])]
        )
        opt_state = self._bias_tx.init(ab)
        # the reference's stage-2 val loader hardcodes batch_size=100
        # (bic.py:292); the forward runs in eval mode so the padded tail
        # (weight 0) is exact
        bs = int(self.kwargs.get("stage2_batch_size", 100))
        self._stage2_losses = []  # diagnostics (read by the lockstep test)
        for _ in range(self.stage2_epoch):
            order = rng.permutation(len(vl))
            for im, lb, w in batch_iter(vi[order], vl[order], bs):
                ab, opt_state, ls = self._stage2_step(state, ab, opt_state, im, lb, w)
                self._stage2_losses.append(float(ls))
        mvars = dict(state.mvars)
        mvars["alphas"] = mvars["alphas"].at[task_idx].set(ab[0])
        mvars["betas"] = mvars["betas"].at[task_idx].set(ab[1])
        return state.replace(mvars=mvars)

    def override_schedule(self, task_idx, steps_per_epoch, epochs):
        """SGD lr 0.1, MultiStepLR [100,150,200] gamma 0.1
        (reference trainer.py:297-301)."""
        cfg = {
            "lr_scheduler": {
                "name": "MultiStepLR",
                "kwargs": {"milestones": [100, 150, 200], "gamma": 0.1},
            }
        }
        return ScheduleController(cfg, 0.1, steps_per_epoch, epochs)

    def eval_logits(self, state, x, task_id):
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        p = self._bias_forward(logits, state.mvars["alphas"], state.mvars["betas"])
        return jnp.where(state.seen_mask[None, :] > 0, p, -1e30)
