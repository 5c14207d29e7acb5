"""TRGP on CLIP (reference core/model/trgp.py's CLIP branch:
trgp.py:89-121, 284-331, 341-356).

Visual-tower TRGP: the trainable quantity is an additive per-layer qkv
weight delta (the TPU-native equivalent of training the attention weights —
injected through the backbone's ``qkv_deltas`` port), whose gradients are
GPM-projected out of the accumulated attention-input subspace; per-task
trust-region scale matrices Q on the top-2 most-related past subspaces
re-parameterize the effective weight
``K_eff = K + U (Q - I) U^T K`` (reference alexnet.py:40-56 applied to the
CLIP blocks). Classification is image-text contrastive against the class
names (trgp.py:284-290), task-incremental evaluation.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.clip_methods import CLIPMethod
from libcontinual_tpu.registry import METHODS


@METHODS.register("TRGP_CLIP")
class TRGPCLIP(CLIPMethod):
    validate_enabled = False  # reference trainer.py:367-377
    R_CAP = 64
    EPSILON = 0.5

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        # reference observe applies label smoothing (trgp.py:138)
        self.label_smoothing = float(self.kwargs.get("label_smoothing", 0.0))
        self.depth = self.backbone.vision_depth
        self.width = self.backbone.vision_width
        self._feature_list: List[np.ndarray] = []
        self._task_spaces = [
            [np.zeros((self.width, 0))] * self.depth for _ in range(self.task_num)
        ]

    def init_state(self, rng, sample_input_hw):
        k1, k2 = jax.random.split(rng)
        dummy = self.model_input(sample_input_hw)
        toks = jnp.zeros((2, 77), jnp.int32)
        clip_params = self.clip_init_params(k1, dummy, toks)
        d, L, T, R = self.width, self.depth, self.task_num, self.R_CAP
        params = {
            "qkv_delta": jnp.zeros((L, d, 3 * d), jnp.float32),
            "tr_scale": jnp.broadcast_to(
                jnp.eye(R, dtype=jnp.float32), (L, T, 2, R, R)
            ),
        }
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        return TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars={
                "model_state": {},
                "frozen": clip_params,
                "task_tokens": self.class_tokens(0, self.num_class),
                "proj": jnp.zeros((L, d, d), jnp.float32),
                "tr_space": jnp.zeros((L, T, 2, d, R), jnp.float32),
            },
            rng=k2,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    # ---------------------------------------------------------------- forward

    def _deltas(self, params, mvars, task):
        """Effective per-layer qkv deltas: trained delta + trust-region
        scaling of (frozen + delta)."""
        deltas = {}
        eye = jnp.eye(self.R_CAP)
        for l in range(self.depth):
            k_frozen = mvars["frozen"]["visual"][f"block_{l}"]["attn"]["qkv"]["kernel"]
            k_eff = k_frozen.astype(jnp.float32) + params["qkv_delta"][l]
            U2 = jnp.take(mvars["tr_space"][l], task, axis=0)  # (2, d, R)
            Q2 = jnp.take(params["tr_scale"][l], task, axis=0)  # (2, R, R)
            for j in range(2):
                U, Q = U2[j], Q2[j]
                k_eff = k_eff + U @ ((Q - eye) @ (U.T @ k_eff))
            deltas[l] = k_eff - k_frozen.astype(jnp.float32)
        return deltas

    def _apply(self, params, mvars, images, tokens, train, task, capture=False):
        deltas = self._deltas(params, mvars, task)
        full = mvars["frozen"]
        img_out = self.backbone.apply(
            {"params": full},
            method=lambda m, im: m.encode_image(
                im, train=train, qkv_deltas=deltas, capture=capture
            ),
            im=images,
        )
        img_f, v_out = img_out
        txt_out = self.backbone.apply(
            {"params": full},
            method=lambda m, t: m.encode_text(t, train=False),
            t=tokens,
        )
        txt_f = jax.lax.stop_gradient(txt_out[0])
        img_n = img_f / (jnp.linalg.norm(img_f, axis=-1, keepdims=True) + 1e-8)
        txt_n = txt_f / (jnp.linalg.norm(txt_f, axis=-1, keepdims=True) + 1e-8)
        logits = 100.0 * img_n @ txt_n.T
        return logits, v_out

    def loss(self, params, state, batch, rng):
        logits, _ = self._apply(
            params, state.mvars, batch["x"], state.mvars["task_tokens"], True,
            state.task,
        )
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"),
                                  cur_mask, self.label_smoothing)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def transform_grads(self, grads, state):
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        # GPM projection of the weight-delta grads (in-dim side)
        g = grads["qkv_delta"]  # (L, d, 3d)
        grads["qkv_delta"] = g - jnp.einsum("lde,leg->ldg", state.mvars["proj"], g)
        # only the current task's scales train
        onehot = (jnp.arange(self.task_num) == state.task).astype(jnp.float32)
        grads["tr_scale"] = grads["tr_scale"] * onehot[None, :, None, None, None]
        return grads

    # ----------------------------------------------------------------- hooks

    def _covs(self, state, task_data):
        # seeded RANDOM sample, like trgp.py's permutation[:125] probe —
        # the first rows of class-ordered task data would be one class
        bs = min(int(self.config["batch_size"]), len(task_data))
        rng = np.random.RandomState(int(self.config.get("seed", 0)))
        idx = rng.permutation(len(task_data))[:bs]
        im = jnp.asarray(task_data.images[idx])
        x = self.augment(None, im, train=False)
        _, v_out = self._apply(
            state.params, state.mvars, x, state.mvars["task_tokens"], False,
            state.task, capture=True,
        )
        return [np.asarray(jnp.einsum("bsd,bse->de", a, a), np.float64)
                for a in v_out["attn_inputs"]]

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["task_tokens"] = self.class_tokens(0, self.num_class)
        state = state.replace(mvars=mvars)
        if task_idx == 0:
            return state
        # top-2 trust regions from one-batch qkv_delta gradient (trgp.py:296-318)
        task_arr = jnp.asarray(task_idx, jnp.int32)
        bs = min(int(self.config["batch_size"]), len(task_data))
        prng = np.random.RandomState(task_idx)  # trgp.py:134-136 protocol
        pidx = prng.permutation(len(task_data))[:bs]
        im = jnp.asarray(task_data.images[pidx])
        lb = jnp.asarray(task_data.labels[pidx].astype(np.int32))

        def lfn(p):
            x = self.augment(None, im, train=False)
            logits, _ = self._apply(
                p, state.mvars, x, state.mvars["task_tokens"], False, task_arr
            )
            cur = state.seen_mask - state.prev_mask
            return masked_cross_entropy(logits, lb, None, cur)

        g = np.asarray(jax.grad(lfn)(state.params)["qkv_delta"], np.float64)
        tr_space = np.array(state.mvars["tr_space"])
        for l in range(self.depth):
            gm = g[l]  # (d, 3d), in-dim rows
            gnorm = np.linalg.norm(gm)
            cands = []
            for t in range(task_idx):
                U = self._task_spaces[t][l]
                if U.shape[1] == 0:
                    continue
                pn = np.linalg.norm(U @ (U.T @ gm))
                if pn > self.EPSILON * gnorm:
                    cands.append((pn, t))
            cands.sort(reverse=True)
            block = np.zeros((2, self.width, self.R_CAP), np.float32)
            for j, (_, t) in enumerate(cands[:2]):
                U = self._task_spaces[t][l][:, : self.R_CAP]
                block[j, :, : U.shape[1]] = U
            tr_space[l, task_idx] = block
        mvars = dict(state.mvars)
        mvars["tr_space"] = jnp.asarray(tr_space)
        return state.replace(mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        covs = self._covs(state, task_data)
        threshold = 0.97 + task_idx * 0.003
        proj = np.array(state.mvars["proj"])
        for l, act in enumerate(covs):
            u, s, _ = np.linalg.svd(act)
            ratio = np.cumsum(s) / max(np.sum(s), 1e-12)
            r_own = max(int(np.sum(ratio < threshold)), 1)
            # this task's own subspace (for future trust-region selection)
            self._task_spaces[task_idx][l] = u[:, : min(r_own, self.R_CAP)]
            # grow the overall GPM space (projection of weight-delta grads)
            if task_idx == 0:
                self._feature_list.append(u[:, :r_own])
            else:
                # GPM growth criterion with the already-captured energy
                # offset (gpm.py:128-137, reference GPM update): without it
                # every residual direction passes the threshold and the
                # basis blows up to full rank, making proj ~ identity and
                # zeroing all qkv_delta learning from task 2 on
                F = self._feature_list[l]
                _, s_all, _ = np.linalg.svd(act, full_matrices=False)
                sval_total = max(float(np.sum(s_all**2)), 1e-12)
                act_hat = act - F @ (F.T @ act)
                u2, s2, _ = np.linalg.svd(act_hat, full_matrices=False)
                sval_hat = float(np.sum(s2**2))
                accumulated = (sval_total - sval_hat) / sval_total
                if accumulated < threshold:
                    ratio2 = (s2**2) / sval_total
                    r = int(np.sum(np.cumsum(ratio2) + accumulated < threshold)) + 1
                    self._feature_list[l] = np.hstack(
                        [F, u2[:, :r]]
                    )[:, : self.width]
            U = self._feature_list[l]
            proj[l] = (U @ U.T).astype(np.float32)
        mvars = dict(state.mvars)
        mvars["proj"] = jnp.asarray(proj)
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        t = jnp.where(task_id < 0, state.task, task_id)
        logits, _ = self._apply(
            state.params, state.mvars, x, state.mvars["task_tokens"], False, t
        )
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
