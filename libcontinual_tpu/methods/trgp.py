"""TRGP — Trust Region Gradient Projection (Lin et al., ICLR 2022).

Parity with reference core/model/trgp.py:
  * GPM-style gradient projection out of the accumulated overall subspace,
    with TRGP's delta/sigma-ranked subspace growth (trgp.py:381-427);
  * trust-region selection before each task: from one 125-sample gradient,
    pick the top-2 past tasks whose subspace captures > eps of the gradient
    norm per layer (trgp.py:296-318);
  * learnable scale matrices Q on the selected subspaces re-parameterize the
    weight: ``W_eff = W + W_eff @ U (Q - I) U^T`` applied sequentially
    (reference alexnet.py:40-56);
  * per-task saved scales/spaces reconstruct that task's effective weights at
    (task-aware) inference (trgp.py:322-331).

TPU re-design: spaces/scales are fixed-shape padded stacks
(``(T, 2, in_flat, R)`` / ``(T, 2, R, R)``); selecting a task's weights is a
``jnp.take`` on the task scalar, so train and eval each compile once.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.methods.gpm import GPM, PROJ_LAYERS
from libcontinual_tpu.models.alexnet import CONV_SPECS, LAYER_IN_FLAT, conv_patches
from libcontinual_tpu.registry import METHODS


@METHODS.register("TRGP")
def make_trgp(config, mesh_ctx=None):
    """Backbone dispatch (the reference TRGP class branches on its backbone,
    reference trgp.py:89-121): ``backbone: clip`` configs (zz_TRGP/trgp_cil-
    clip-*.yaml) run the CLIP variant."""
    if "clip" in str(config["backbone"]["name"]).lower():
        from libcontinual_tpu.methods.trgp_clip import TRGPCLIP

        return TRGPCLIP(config, mesh_ctx)
    return TRGP(config, mesh_ctx)


class TRGP(GPM):
    validate_enabled = False  # reference trainer.py:367-377 disables it
    R_CAP = 128  # padded trust-region rank cap per (task, layer, slot)
    EPSILON = 0.5

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        # reference observe applies label smoothing (trgp.py:152)
        self.label_smoothing = float(self.kwargs.get("label_smoothing", 0.0))
        # per-task per-layer subspaces (host mirror, padded copies in mvars)
        self._task_spaces: List[List[np.ndarray]] = [
            [np.zeros((d, 0)) for d in LAYER_IN_FLAT] for _ in range(self.task_num)
        ]

    def init_mvars(self, rng, params, model_state):
        mv = super().init_mvars(rng, params, model_state)
        T, R = self.task_num, self.R_CAP
        mv["tr_space"] = [
            jnp.zeros((T, 2, d, R), jnp.float32) for d in LAYER_IN_FLAT
        ]
        mv["scale_trainable"] = jnp.zeros((), jnp.float32)
        return mv

    def init_state(self, rng, sample_input_hw):
        state = super().init_state(rng, sample_input_hw)
        # trainable scale stacks live in params
        T, R = self.task_num, self.R_CAP
        params = dict(state.params)
        params["tr_scale"] = [
            jnp.broadcast_to(jnp.eye(R, dtype=jnp.float32), (T, 2, R, R))
            for _ in LAYER_IN_FLAT
        ]
        return state.replace(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
        )

    # ---------------------------------------------------------------- forward

    def _effective_weights(self, params, mvars, task):
        """Per-layer flattened effective kernels with trust-region scaling."""
        weights = []
        for li, name in enumerate(PROJ_LAYERS):
            w = params["backbone"][name]
            wf = w.reshape(-1, w.shape[-1]).T  # (out, in_flat), torch layout
            U2 = jnp.take(mvars["tr_space"][li], task, axis=0)  # (2, d, R)
            Q2 = jnp.take(params["tr_scale"][li], task, axis=0)  # (2, R, R)
            for j in range(2):
                U = U2[j]
                Q = Q2[j]
                wf = wf + (wf @ U) @ (Q - jnp.eye(self.R_CAP)) @ U.T
            weights.append(wf.T.reshape(w.shape))
        return weights

    def _forward_logits(self, params, state, x, train, capture=False, rng=None):
        wo = self._effective_weights(params, state.mvars, state.task)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        out = self.backbone.apply(
            {"params": params["backbone"], **state.mvars["model_state"]},
            x, train=train, capture=capture, weight_override=wo, rngs=rngs,
        )
        logits = self._head.apply({"params": params["head"]}, out["features"])
        return logits, out

    def loss(self, params, state, batch, rng):
        logits, out = self._forward_logits(
            params, state, batch["x"], train=True, rng=rng
        )
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"),
                                  cur_mask, self.label_smoothing)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)  # GPM projection + BN freeze
        # scale grads: only the current task's slice trains
        onehot = (jnp.arange(self.task_num) == state.task).astype(jnp.float32)
        grads["tr_scale"] = [
            g * onehot[:, None, None, None] for g in grads["tr_scale"]
        ]
        return grads

    # ----------------------------------------------------------------- hooks

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        if task_idx == 0:
            return state
        # trust-region selection from one 125-sample gradient (trgp.py:270-318)
        rng = np.random.RandomState(task_idx)
        idx = rng.permutation(len(task_data))[:125]
        im = jnp.asarray(task_data.images[idx])
        lb = jnp.asarray(task_data.labels[idx].astype(np.int32))

        def lfn(p):
            x = self.augment(None, im, train=False)
            logits, _ = self._forward_logits(p, state, x, train=False)
            cur_mask = state.seen_mask - state.prev_mask
            return masked_cross_entropy(logits, lb, None, cur_mask)

        g = jax.grad(lfn)(state.params)
        tr_space = [np.array(s) for s in state.mvars["tr_space"]]
        for li, name in enumerate(PROJ_LAYERS):
            gm = np.asarray(g["backbone"][name], np.float64)
            gm = gm.reshape(-1, gm.shape[-1]).T  # (out, in_flat)
            gnorm = np.linalg.norm(gm)
            cands = []
            for t in range(task_idx):
                U = self._task_spaces[t][li]
                if U.shape[1] == 0:
                    continue
                pn = np.linalg.norm((gm @ U) @ U.T)
                if pn > self.EPSILON * gnorm:
                    cands.append((pn, t))
            cands.sort(reverse=True)
            sel = [t for _, t in cands[:2]]
            block = np.zeros((2, LAYER_IN_FLAT[li], self.R_CAP), np.float32)
            for j, t in enumerate(sel):
                U = self._task_spaces[t][li][:, : self.R_CAP]
                block[j, :, : U.shape[1]] = U
            tr_space[li][task_idx] = block
        mvars = dict(state.mvars)
        mvars["tr_space"] = [jnp.asarray(s) for s in tr_space]
        # reset current task's scales to identity
        params = dict(state.params)
        params["tr_scale"] = [
            jnp.asarray(
                np.array(s).copy()
            ).at[task_idx].set(jnp.eye(self.R_CAP))
            for s in params["tr_scale"]
        ]
        return state.replace(params=params, mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        """TRGP subspace growth (delta/sigma ranked, trgp.py:381-427)."""
        mats = self._activation_mats(state, task_data)
        threshold = 0.97 + task_idx * 0.003
        if task_idx == 0:
            self._feature_list = []
            for li, act in enumerate(mats):
                u, s, _ = np.linalg.svd(act, full_matrices=False)
                ratio = np.cumsum(s**2) / np.sum(s**2)
                r = int(np.sum(ratio < threshold))
                self._feature_list.append(u[:, :r])
                self._task_spaces[0][li] = u[:, :r]
        else:
            for li, act in enumerate(mats):
                _, s_all, _ = np.linalg.svd(act, full_matrices=False)
                sval_total = float(np.sum(s_all**2))
                F = self._feature_list[li]
                delta = np.diag(F.T @ act @ act.T @ F)
                act_hat = act - F @ (F.T @ act)
                u, s, _ = np.linalg.svd(act_hat, full_matrices=False)
                sigma = s**2
                stack = np.hstack([delta, sigma])
                order = np.argsort(stack)[::-1]
                sorted_stack = np.sort(stack)[::-1]
                if threshold * sval_total <= 0:
                    r = 0
                else:
                    r = min(
                        int(np.sum(np.cumsum(sorted_stack) < threshold * sval_total)) + 1,
                        act.shape[0],
                    )
                ui = np.hstack([F, u])
                sel_each = order[:r]
                sel_overall = sel_each[sel_each >= len(delta)]
                self._feature_list[li] = np.hstack([F, ui[:, sel_overall]])
                self._task_spaces[task_idx][li] = ui[:, sel_each]
        mvars = dict(state.mvars)
        mvars["proj"] = [
            jnp.asarray((u @ u.T).astype(np.float32)) if u.size
            else jnp.zeros((d, d), jnp.float32)
            for u, d in zip(self._feature_list, LAYER_IN_FLAT)
        ]
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ eval

    def eval_logits(self, state, x, task_id):
        t = jnp.where(task_id < 0, state.task, task_id)
        wo = self._effective_weights(state.params, state.mvars, t)
        out = self.backbone.apply(
            {"params": state.params["backbone"], **state.mvars["model_state"]},
            x, train=False, weight_override=wo,
        )
        logits = self._head.apply({"params": state.params["head"]}, out["features"])
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
