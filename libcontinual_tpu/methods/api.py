"""API — Adaptive Plasticity Improvement (Liang & Li, CVPR 2023).

Re-derivation of reference core/model/api.py + backbone/alexnet.py
(Conv2d_API/Linear_API):

  * task-incremental multi-head AlexNet with DualGPM gradient projection —
    'remove' layers subtract the old-space component, 'retain' layers get
    their OLD input columns frozen outright (the reference precomputes a
    ZERO feature_mat for retain layers, api.py:293-297, so
    ``grad[:, :expand] @ 0 = 0`` — a reference quirk mirrored here);
  * plasticity measurement protocol (api.py:139-170): before each
    incremental task, 5 "stage-1" epochs of SGD(lr=0.01) train the network
    (BatchNorm and the expansion mixes frozen) with projected gradients,
    accumulating ``||projected grad|| / ||raw grad||`` per layer every
    step, plus one accumulate-only "stage-2" epoch; the average over
    ``(5+1)*steps`` iterations is the per-layer retain ratio;
  * ADAPTIVE INPUT EXPANSION (api.py:175-190): each layer grows
    ``ceil((step - retain) * K)`` (step=0.5, K=10, clamped to the base
    channel count) extra INPUT features, realized as learnable channel
    mixes of the base input whose matrices are initialized from the top
    singular vectors of a channel-importance matrix (per-channel spectral
    norms of sampled activation patches, api.py:168-175);
  * after each task, the DualGPM spaces are updated from 125 sampled
    activation matrices; newly expanded dims enter a 'retain' layer's
    space as identity directions first (api.py:205-222).

TPU re-design: all capacity is preallocated (models/alexnet.py AlexNetAPI);
expansion flips a ``ws_mask`` and writes one slab slot; the GPM projection,
retain-freeze, and BN freeze are array masks inside the one compiled step.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.methods.inflora import dual_gpm_update
from libcontinual_tpu.models.alexnet import CONV_SPECS, conv_patches
from libcontinual_tpu.registry import METHODS

LAYER_KERNELS = ["conv0_kernel", "conv1_kernel", "conv2_kernel", "fc3_kernel", "fc4_kernel"]
BASE_IN = (3, 64, 128, 1024, 2048)
KSIZE = (4, 3, 2, 1, 1)


@METHODS.register("API")
class API(Method):
    supports_task_aware = True
    n_sample = 125
    conv_batch = [24, 100, 100]
    host_state_attrs = ("_feature_list", "_project_type", "_ws_counts")

    def __init__(self, config, mesh_ctx=None):
        bb_kwargs = dict((config.get("backbone") or {}).get("kwargs") or {})
        ck = (config.get("classifier") or {}).get("kwargs") or {}
        bb_kwargs["task_num"] = int(ck.get("task_num") or config["task_num"])
        # slab width = the per-task expansion ceiling ceil(step*K): retain
        # ratios are >= 0 so expand_dim <= step*K (reference hardcodes
        # step=0.5, K=10, api.py:60-61; here they are config-overridable and
        # the slab must be sized to match)
        _step = float(ck.get("step", 0.5))
        _K = int(ck.get("K", 10))
        bb_kwargs["k_slot"] = int(max(np.ceil(max(_step, 0.0) * _K), 1))
        config["backbone"] = {"name": "AlexNet_API", "kwargs": bb_kwargs}
        super().__init__(config, mesh_ctx)
        self.lame = float(self.kwargs.get("lame", 1.0))
        self.lamb = float(self.kwargs.get("lamb", 0.97))
        self.step_c = float(self.kwargs.get("step", 0.5))  # api.py:60
        self.K = int(self.kwargs.get("K", 10))
        self.stage1_epochs = int(self.kwargs.get("stage1_epochs", 5))
        self.stage1_lr = float(self.kwargs.get("stage1_lr", 0.01))
        self._feature_list: List[np.ndarray] = []
        self._project_type: List[str] = []
        # per (layer, slot) active extra count — host mirror of ws_mask
        self._ws_counts = np.zeros((5, self.backbone.slots), np.int64)
        self.in_flats = self.backbone.in_flats()
        self.feat_dim = 2048

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class, use_bias=False)

    # ------------------------------------------------------------------ state

    def init_state(self, rng, sample_input_hw):
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = self.model_input(sample_input_hw)
        mask0 = self._ws_mask_arrays()
        variables = self.backbone.init(k1, dummy, mask0, train=False)
        params = {"backbone": variables["params"]}
        self._head = self.head_module()
        params["head"] = self._head.init(
            k2, jnp.zeros((2, self.feat_dim), jnp.float32)
        )["params"]
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        mvars = {
            "model_state": {},
            "ws_mask": mask0,
            "proj": [jnp.zeros((d, d), jnp.float32) for d in self.in_flats],
            "proj_sign": jnp.ones((len(LAYER_KERNELS),), jnp.float32),
            # input dims active BEFORE the current task's expansion — the
            # reference projects grad[:, :expand] only (api.py:92-99)
            "old_rows": [jnp.asarray(m, jnp.float32)
                         for m in self._row_masks(self._ws_counts)],
        }
        return TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
            rng=k3,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def _ws_mask_arrays(self, counts=None):
        counts = self._ws_counts if counts is None else counts
        ks = self.backbone.k_slot
        out = []
        for li in range(5):
            m = (np.arange(ks)[None, :] < counts[li][:, None]).astype(np.float32)
            out.append(jnp.asarray(m))
        return out

    def _row_masks(self, counts):
        """Flat-row masks (per layer) of the ACTIVE input dims given per-slot
        extra counts; kernel rows are flattened (kh, kw, C_full)."""
        ks = self.backbone.k_slot
        masks = []
        for li in range(5):
            base = BASE_IN[li]
            E = self.backbone.extra_in
            ch = np.zeros(base + E, np.float32)
            ch[:base] = 1.0
            for s in range(self.backbone.slots):
                n = int(counts[li][s])
                ch[base + s * ks: base + s * ks + n] = 1.0
            k = KSIZE[li]
            masks.append(np.tile(ch, k * k))  # (kh,kw,C) flat order
        return masks

    # ---------------------------------------------------------------- forward

    def _apply(self, params, mvars, x, train, capture=False, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.backbone.apply(
            {"params": params["backbone"]}, x, mvars["ws_mask"],
            train=train, capture=capture, rngs=rngs,
        )

    def loss(self, params, state, batch, rng):
        out = self._apply(params, state.mvars, batch["x"], True, rng=rng)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def _project_grads(self, grads_bb, mvars):
        """DualGPM projection on the OLD input rows of each layer kernel:
        remove -> g - P g; retain -> P g with P = 0 (reference freeze,
        api.py:293-297). New rows (this task's expansion) train free."""
        bb = dict(grads_bb)
        for li, name in enumerate(LAYER_KERNELS):
            g = bb[name]
            shape = g.shape
            gf = g.reshape(-1, shape[-1])
            proj = mvars["proj"][li]
            old = mvars["old_rows"][li][:, None]
            sign = mvars["proj_sign"][li]
            projected = proj @ gf
            eff = jnp.where(sign > 0, gf - projected, projected)
            bb[name] = (old * eff + (1.0 - old) * gf).reshape(shape)
        return bb

    def transform_grads(self, grads, state):
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        grads["backbone"] = self._project_grads(grads["backbone"], state.mvars)
        return grads

    def trainable_mask(self, state):
        """BatchNorm trains only on task 0 (reference api.py:148-152)."""
        frozen_bn = jnp.where(state.task > 0, 0.0, 1.0)

        def leaf_mask(path, leaf):
            keys = [getattr(p, "key", "") for p in path]
            if any(str(k).startswith("bn") for k in keys):
                return jnp.broadcast_to(frozen_bn, leaf.shape)
            return jnp.ones_like(leaf)

        return jax.tree_util.tree_map_with_path(leaf_mask, state.params)

    # --------------------------------------------------- stage-1/2 protocol

    def _stage_step_fn(self):
        if hasattr(self, "_stage_step"):
            return self._stage_step

        @jax.jit
        def stage_step(params, mvars, seen, prev, images, labels, weight, lr):
            def lfn(p):
                x = self.augment(None, images, train=False)
                out = self._apply(p, mvars, x, True)
                logits = self._head.apply({"params": p["head"]}, out["features"])
                cur = seen - prev
                return masked_cross_entropy(logits, labels, weight, cur)

            grads = jax.grad(lfn)(params)
            raw = [jnp.linalg.norm(grads["backbone"][n]) for n in LAYER_KERNELS]
            gbb = self._project_grads(grads["backbone"], mvars)
            ratios = jnp.stack([
                jnp.linalg.norm(gbb[n]) / jnp.maximum(r, 1e-12)
                for n, r in zip(LAYER_KERNELS, raw)
            ])
            # stage-1 SGD(0.01): kernels + head only — bn and the expansion
            # mixes are excluded (api.py:148-152, get_parameters additional)
            params = dict(params)
            bb = dict(params["backbone"])
            for n in LAYER_KERNELS:
                bb[n] = bb[n] - lr * gbb[n]
            params["backbone"] = bb
            head = jax.tree_util.tree_map(
                lambda p, g: p - lr * g, params["head"], grads["head"]
            )
            params["head"] = head
            return params, ratios

        self._stage_step = stage_step
        return stage_step

    def _run_stage_protocol(self, state, task_data):
        """5 stage-1 training epochs + 1 stage-2 accumulation pass
        (reference before_task, api.py:154-170). Returns (params, retain)."""
        step = self._stage_step_fn()
        bs = int(self.config["batch_size"])
        params = state.params
        total = np.zeros(5)
        n_iter = 0
        for ep in range(self.stage1_epochs + 1):
            lr = self.stage1_lr if ep < self.stage1_epochs else 0.0
            for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
                params, ratios = step(
                    params, state.mvars, state.seen_mask, state.prev_mask,
                    im, lb.astype(np.int32), w, jnp.float32(lr),
                )
                total += np.asarray(ratios)
                n_iter += 1
        return params, total / max(n_iter, 1)

    # ------------------------------------------------------------- expansion

    def _importance_ws(self, state, task_data):
        """Per-layer channel-importance SVD bases U (base_in, base_in)
        (api.py:168-181): spectral norm of each base channel's activation
        patch window, over 125 sampled patches/rows."""
        mats = self._activation_mats(state, task_data)
        out = []
        for li, mat in enumerate(mats):
            base, k = BASE_IN[li], KSIZE[li]
            # mat: (flat_rows, n_cols) in (kh, kw, C_full) row order; the
            # reference reduces only the BASE channel block (api.py:170)
            n_cols = mat.shape[1]
            full_c = mat.shape[0] // (k * k)
            m = mat.reshape(k, k, full_c, n_cols)[:, :, :base, :]
            m = np.transpose(m, (3, 2, 0, 1))  # (cols, base, k, k)
            imp = np.linalg.norm(m, ord=2, axis=(2, 3)).T  # (base, cols)
            u, _, _ = np.linalg.svd(imp, full_matrices=False)
            out.append(u)
        return out

    def before_task(self, state, task_idx, task_data):
        if task_idx == 0:
            return state
        # The reference's stage-1/2 observes project grad[:, :expand] where
        # ``expand`` spans EVERY prior task's expansion (api.py:93-94 asserts
        # expand == self.expand[i][cur_task-1], rebuilt by after_task(t-1)) —
        # so task t-1's new rows are frozen/projected during measurement too.
        # Refresh old_rows from the CURRENT counts before the protocol; the
        # stale mask from before_task(t-1) excludes task t-1's rows.
        mvars = dict(state.mvars)
        mvars["old_rows"] = [
            jnp.asarray(m, jnp.float32) for m in self._row_masks(self._ws_counts)
        ]
        state = state.replace(mvars=mvars)
        params, retain = self._run_stage_protocol(state, task_data)
        state = state.replace(params=params)
        self.per_layer_retain = retain  # diagnostic
        u_list = self._importance_ws(state, task_data)

        ks = self.backbone.k_slot
        slot = task_idx - 1
        counts = self._ws_counts.copy()
        new_ws = {}
        for li in range(5):
            expand_dim = max((self.step_c - retain[li]) * self.K, 0.0)
            size = int(max(min(int(np.ceil(expand_dim)), BASE_IN[li]), 0))
            size = min(size, ks)
            counts[li][slot] = size
            if size:
                w = np.zeros((BASE_IN[li], ks), np.float32)
                w[:, :size] = u_list[li][:, :size]
                new_ws[li] = w
        # write slab slots + flip masks
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        bb = dict(params["backbone"])
        for li, w in new_ws.items():
            slab = np.array(bb[f"ws{li}"])
            slab[slot] = w
            bb[f"ws{li}"] = jnp.asarray(slab)
        params["backbone"] = bb
        self._ws_counts = counts
        mvars = dict(state.mvars)
        mvars["ws_mask"] = self._ws_mask_arrays(counts)
        # old_rows stays at the PRE-expansion dims for this task's training
        prev_counts = counts.copy()
        prev_counts[:, slot:] = 0
        mvars["old_rows"] = [
            jnp.asarray(m, jnp.float32) for m in self._row_masks(prev_counts)
        ]
        return state.replace(params=params, mvars=mvars)

    # ---------------------------------------------------------------- dualgpm

    def _activation_mats(self, state, task_data):
        rng = np.random.RandomState(int(self.config.get("seed", 0)))
        idx = rng.permutation(len(task_data))[: self.n_sample]
        images = jnp.asarray(task_data.images[idx])
        x = self.augment(None, images, train=False)
        out = self._apply(state.params, state.mvars, x, False, capture=True)
        mats = []
        for i, inp in enumerate(out["layer_inputs"]):
            if i < len(CONV_SPECS):
                sub = inp[: self.conv_batch[i]]
                patches = conv_patches(sub, CONV_SPECS[i]["kernel"])
                mats.append(np.asarray(patches, np.float64).T)
            else:
                mats.append(np.asarray(inp, np.float64).T)
        return mats

    def after_task(self, state, task_idx, task_data):
        mats = self._activation_mats(state, task_data)
        # newly expanded dims of THIS task enter a retain layer's space as
        # identity directions (api.py:205-216); for remove layers the
        # full-width zero rows are already implicit
        if task_idx > 0 and self._feature_list:
            slot = task_idx - 1
            ks = self.backbone.k_slot
            for li in range(5):
                n = int(self._ws_counts[li][slot])
                if n == 0 or self._project_type[li] != "retain":
                    continue
                k = KSIZE[li]
                D = self.in_flats[li]
                full_c = D // (k * k)
                new_dims = []
                c0 = BASE_IN[li] + slot * ks
                for kk in range(k * k):
                    for c in range(c0, c0 + n):
                        new_dims.append(kk * full_c + c)
                eye = np.zeros((D, len(new_dims)))
                eye[new_dims, np.arange(len(new_dims))] = 1.0
                self._feature_list[li] = np.hstack(
                    [self._feature_list[li], eye]
                )
        threshold = (self.lame - self.lamb) * task_idx / self.task_num + self.lamb
        dual_gpm_update(self._feature_list, self._project_type, mats, threshold)
        signs = np.asarray(
            [1.0 if t == "remove" else -1.0 for t in self._project_type], np.float32
        )
        mvars = dict(state.mvars)
        # feature_mat per reference api.py:293-297: remove -> U U^T,
        # retain -> ZEROS (old rows freeze)
        mvars["proj"] = [
            jnp.asarray((u @ u.T).astype(np.float32))
            if (u.size and t == "remove")
            else jnp.zeros((d, d), jnp.float32)
            for u, t, d in zip(
                self._feature_list, self._project_type, self.in_flats
            )
        ]
        mvars["proj_sign"] = jnp.asarray(signs)
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ eval

    def eval_logits(self, state, x, task_id):
        out = self._apply(state.params, state.mvars, x, False)
        logits = self._head.apply({"params": state.params["head"]}, out["features"])
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
