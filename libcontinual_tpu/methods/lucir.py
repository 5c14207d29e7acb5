"""LUCIR — Learning a Unified Classifier Incrementally via Rebalancing
(Hou et al., CVPR 2019).

Parity with reference core/model/lucir.py:
  * cosine classifier with learnable sigma (reference backbone/resnet.py:418);
  * task > 0 loss = CE(sigma-scaled cos logits)
    + cur_lamda * less-forget cosine-embedding loss between current and
      reference backbone features (reference lucir.py:175-186), with
      ``cur_lamda = lamda * sqrt(n_old / inc_cls_num)`` (lucir.py:94-112);
  * margin-ranking loss on pre-sigma scores: for old-class samples, the
    ground-truth score must beat the top-K novel scores by ``dist``
    (lucir.py:188-203), weighted ``lw_mr``;
  * novel-class weight imprinting from normalized class-mean features scaled
    by the average old embedding norm (lucir.py:134-159);
  * old-class head columns frozen on incremental tasks (lucir.py:232-238).

TPU re-design: no forward hooks — the loss computes raw cosine scores
directly from the fixed-shape head kernel; freezing is a column mask on the
head gradient; imprinting is a batched feature pass + masked column write.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy, weighted_accuracy
from libcontinual_tpu.methods.common import batch_iter, copy_tree, normalized
from libcontinual_tpu.registry import METHODS


def margin_ranking(scores, labels, prev_mask, seen_mask, K, dist, weight=None):
    """LUCIR margin-ranking on pre-sigma cosine scores (reference
    lucir.py:188-203): for each OLD-class sample, the ground-truth score must
    beat each of the top-K novel-class scores by ``dist``; hinge violations
    averaged over (old samples x K)."""
    n_old = jnp.sum(prev_mask)
    gt = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    new_mask = (seen_mask - prev_mask)[None, :] > 0
    novel_scores = jnp.where(new_mask, scores, -jnp.inf)
    topk = jax.lax.top_k(novel_scores, K)[0]  # (B, K)
    viol = jnp.maximum(dist - (gt[:, None] - topk), 0.0)
    hard = (labels < n_old).astype(jnp.float32)
    if weight is not None:
        hard = hard * weight
    return jnp.sum(viol * hard[:, None]) / jnp.maximum(jnp.sum(hard) * K, 1.0)


@METHODS.register("LUCIR")
class LUCIR(Method):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.K = int(self.kwargs.get("K", 2))
        self.lw_mr = float(self.kwargs.get("lw_mr", 1.0))
        self.dist = float(self.kwargs.get("dist", 0.5))
        self.lamda_base = float(self.kwargs.get("lamda", 5.0))

    def head_module(self):
        from libcontinual_tpu.models.heads import CosineLinear

        return CosineLinear(self.num_class)

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
            "cur_lamda": jnp.zeros((), jnp.float32),
            "head_col_mask": jnp.ones((self.num_class,), jnp.float32),
        }

    # ----------------------------------------------------------------- hooks

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        if task_idx > 0:
            n_old = self.init_cls_num + (task_idx - 1) * self.inc_cls_num
            mvars["cur_lamda"] = jnp.asarray(
                self.lamda_base * math.sqrt(n_old / self.inc_cls_num), jnp.float32
            )
            # freeze old head columns (reference lucir.py:232-238)
            cols = np.ones((self.num_class,), np.float32)
            cols[:n_old] = 0.0
            mvars["head_col_mask"] = jnp.asarray(cols)
            state = state.replace(mvars=mvars)
            state = self._imprint(state, task_idx, task_data, n_old)
        else:
            mvars["cur_lamda"] = jnp.asarray(self.lamda_base, jnp.float32)
            state = state.replace(mvars=mvars)
        return state

    def _imprint(self, state, task_idx, task_data, n_old):
        """Init new columns from class-mean features (lucir.py:134-159)."""
        k = state.params["head"]["kernel"]  # (feat, num_class)
        old_norm = jnp.mean(jnp.linalg.norm(k[:, :n_old], axis=0))
        new_k = np.array(k, np.float32)  # writable copy
        bs = int(self.config["batch_size"])
        if not hasattr(self, "_imprint_feat_jit"):
            # jit the feature pass: ~tens of eager backbone dispatches per
            # task boundary otherwise
            @jax.jit
            def _feat(state, images):
                x = self.augment(None, images, train=False)
                out, _ = self.apply_backbone(
                    state.params, state.mvars["model_state"], x, train=False
                )
                return out["features"]

            self._imprint_feat_jit = _feat
        for c in range(task_data.class_lo, task_data.class_hi):
            sel = np.nonzero(task_data.labels == c)[0]
            if not len(sel):
                continue
            feats = []
            for im, lb, w in batch_iter(task_data.images[sel], task_data.labels[sel], bs):
                f = np.asarray(self._imprint_feat_jit(state, im), np.float32)
                feats.append(f[np.asarray(w) > 0])
            f = np.concatenate(feats)
            f = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
            emb = f.mean(0)
            emb = emb / (np.linalg.norm(emb) + 1e-12)
            new_k[:, c] = emb * float(old_norm)
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        params["head"] = dict(params["head"])
        params["head"]["kernel"] = jnp.asarray(new_k)
        return state.replace(params=params)

    def trainable_mask(self, state):
        """Freeze old head columns on incremental tasks as an UPDATE mask:
        the reference pins fc1 with an lr=0, weight_decay=0 param group
        (lucir.py:232-238), so the frozen embeddings receive NO update —
        a gradient-only gate would still let the optax chain's coupled
        weight decay (5e-4 at the shipped configs) shrink them."""
        col = state.mvars["head_col_mask"]
        mask = jax.tree_util.tree_map(jnp.ones_like, state.params)
        mask["head"] = dict(mask["head"])
        mask["head"]["kernel"] = jnp.ones_like(
            state.params["head"]["kernel"]) * col[None, :]
        return mask

    # ------------------------------------------------------------------ loss

    def _cosine_scores(self, params, feats):
        k = params["head"]["kernel"]
        return jnp.dot(normalized(feats), normalized(k, axis=0))

    def loss(self, params, state, batch, rng):
        out, new_model_state = self.apply_backbone(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        feats = out["features"]
        scores = self._cosine_scores(params, feats)  # pre-sigma
        sigma = params["head"]["sigma"]
        logits = scores * sigma
        logits = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        w = batch.get("weight")
        ce = masked_cross_entropy(logits, batch["label"], w, state.seen_mask)

        # less-forget: 1 - cos(cur_feat, ref_feat) (lucir.py:183-186)
        # the reference trainer calls model.train() at the start of every
        # training epoch (trainer.py:575), recursively flipping the frozen
        # teacher back to train mode — its targets use the current batch's
        # BN statistics at training time; mirrored here (state discarded)
        ref_out, _ = self.apply_backbone(
            state.mvars["teacher"], state.mvars["teacher_state"], batch["x"], train=self.teacher_train
        )
        lf = 1.0 - jnp.sum(
            normalized(feats) * normalized(jax.lax.stop_gradient(ref_out["features"])),
            axis=1,
        )
        lf = jnp.sum(lf * w) / jnp.maximum(jnp.sum(w), 1.0) if w is not None else jnp.mean(lf)

        # margin ranking on pre-sigma scores (lucir.py:188-203)
        mr = margin_ranking(
            scores, batch["label"], state.prev_mask, state.seen_mask,
            self.K, self.dist, w,
        )

        inc = jnp.where(state.task > 0, 1.0, 0.0)
        loss = ce + inc * (state.mvars["cur_lamda"] * lf + self.lw_mr * mr)
        return loss, {"logits": logits, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        out, _ = self.apply_backbone(
            state.params, state.mvars["model_state"], x, train=False
        )
        logits = self._cosine_scores(state.params, out["features"]) * state.params[
            "head"
        ]["sigma"]
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
