"""GPM — Gradient Projection Memory (Saha et al., ICLR 2021).

Parity with reference core/model/gpm.py:
  * task-incremental multi-head training: CE over the current task's head
    (gpm.py:66-74 — here: fixed-shape head + task class masks);
  * after ``loss.backward()``, gradients of the 5 AlexNet layers are
    projected out of the accumulated activation subspace:
    ``g <- g - g @ (U U^T)`` (gpm.py:78-81) — here an in-graph
    ``transform_grads`` so the projection fuses into the update step;
  * post-task subspace growth: activations of 125 samples, conv inputs
    im2col'd, SVD with energy threshold ``0.97 + 0.003 t``
    (gpm.py:131-204);
  * batch-norm parameters frozen on incremental tasks (gpm.py:134-138).

TPU re-design: im2col is one XLA op (``conv_patches``); SVDs run on device
in f64-free fp32 via ``jnp.linalg.svd`` on host CPU backend for parity-grade
numerics; projection matrices are fixed-shape mvars arrays so the train step
never retraces.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.models.alexnet import CONV_SPECS, LAYER_IN_FLAT, conv_patches
from libcontinual_tpu.registry import METHODS

PROJ_LAYERS = ["conv0_kernel", "conv1_kernel", "conv2_kernel", "fc3_kernel", "fc4_kernel"]


@METHODS.register("GPM")
class GPM(Method):
    supports_task_aware = True
    n_sample = 125
    conv_batch = [24, 100, 100]  # reference gpm.py:146 ("2*12", 100, 100)

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self._feature_list: List[np.ndarray] = []

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class, use_bias=False)

    def init_mvars(self, rng, params, model_state):
        return {
            "proj": [jnp.zeros((d, d), jnp.float32) for d in LAYER_IN_FLAT],
            "bn_trainable": jnp.ones((), jnp.float32),
        }

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["bn_trainable"] = jnp.asarray(0.0 if task_idx > 0 else 1.0)
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ loss

    def loss(self, params, state, batch, rng):
        logits, feats, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True, rng=rng
        )
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": new_model_state}

    def transform_grads(self, grads, state):
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        bb = dict(grads["backbone"])
        for name, proj in zip(PROJ_LAYERS, state.mvars["proj"]):
            g = bb[name]
            shape = g.shape
            gf = g.reshape(-1, shape[-1])  # (in_flat, out)
            bb[name] = (gf - proj @ gf).reshape(shape)
        grads["backbone"] = bb
        return grads

    def trainable_mask(self, state):
        """Freeze BN on incremental tasks (reference gpm.py:134-138 sets
        requires_grad False) — as an update mask, not a grad gate, so a
        configured weight_decay cannot leak into the frozen parameters
        through the optax chain (torch's frozen params receive NO update)."""
        bnt = state.mvars["bn_trainable"]

        def leaf_mask(path, p):
            keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
            frozen = any(str(k).startswith("bn") for k in keys)
            return jnp.full_like(p, jnp.where(frozen, bnt, 1.0)) if frozen \
                else jnp.ones_like(p)

        return jax.tree_util.tree_map_with_path(leaf_mask, state.params)

    # ------------------------------------------------------- subspace growth

    def _activation_mats(self, state, task_data) -> List[np.ndarray]:
        # capture with the RAW base weights (no TRGP scale reparameterization):
        # the reference disables scale params BEFORE its representation pass
        # (reference trgp.py:326-328 disable_scale -> capture; alexnet.py:29-32
        # drops scales without merging), so raw-weight activations are the
        # parity-correct input to the subspace SVDs
        rng = np.random.RandomState(int(self.config.get("seed", 0)))
        idx = rng.permutation(len(task_data))[: self.n_sample]
        images = jnp.asarray(task_data.images[idx])
        x = self.augment(None, images, train=False)
        out = self.backbone.apply(
            {"params": state.params["backbone"], **state.mvars["model_state"]},
            x, train=False, capture=True,
        )
        mats = []
        for i, inp in enumerate(out["layer_inputs"]):
            if i < len(CONV_SPECS):
                sub = inp[: self.conv_batch[i]]
                patches = conv_patches(sub, CONV_SPECS[i]["kernel"])
                mats.append(np.asarray(patches, np.float64).T)  # (in_flat, cols)
            else:
                mats.append(np.asarray(inp, np.float64).T)
        return mats

    def after_task(self, state, task_idx, task_data):
        mats = self._activation_mats(state, task_data)
        threshold = 0.97 + task_idx * 0.003
        if task_idx == 0:
            self._feature_list = []
            for act in mats:
                u, s, _ = np.linalg.svd(act, full_matrices=False)
                ratio = np.cumsum(s**2) / np.sum(s**2)
                r = int(np.sum(ratio < threshold))
                self._feature_list.append(u[:, :r])
        else:
            for i, act in enumerate(mats):
                _, s_all, _ = np.linalg.svd(act, full_matrices=False)
                sval_total = float(np.sum(s_all**2))
                U_old = self._feature_list[i]
                act_hat = act - U_old @ (U_old.T @ act)
                u, s, _ = np.linalg.svd(act_hat, full_matrices=False)
                sval_hat = float(np.sum(s**2))
                accumulated = (sval_total - sval_hat) / sval_total
                if accumulated >= threshold:
                    continue  # reference: "Skip updating GPM for layer"
                ratio = (s**2) / sval_total
                r = int(np.sum(np.cumsum(ratio) + accumulated < threshold)) + 1
                ui = np.hstack([U_old, u[:, :r]])
                self._feature_list[i] = ui[:, : min(ui.shape)]
        mvars = dict(state.mvars)
        mvars["proj"] = [
            jnp.asarray(
                (u @ u.T).astype(np.float32)
                if u.size
                else np.zeros((d, d), np.float32)
            )
            for u, d in zip(self._feature_list, LAYER_IN_FLAT)
        ]
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ eval

    def eval_logits(self, state, x, task_id):
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
