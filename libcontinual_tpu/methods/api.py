"""API — Adaptive Plasticity Improvement (Liang & Li, CVPR 2023).

Parity with reference core/model/api.py:
  * task-incremental multi-head AlexNet training with DualGPM gradient
    projection (remove/retain per layer, api.py:90-108);
  * plasticity measurement: the per-layer ratio of projected-to-raw gradient
    norms (``per_layer_retain``, api.py:103-104);
  * ADAPTIVE CHANNEL EXPANSION (reference alexnet.py:160-303's
    ``duplicate``/``expand``): when a layer's retained gradient fraction
    drops below ``expand_thres``, the layer grows by ``expand_step``
    channels before the new task;
  * DualGPM subspace update at task boundaries.

TPU re-design of the growth (the "per-task parameter growth under jit" hard
case, SURVEY.md §7): every layer is preallocated at ``base + extra`` width;
an active-channel mask per layer gates computation, and expansion is a mask
flip + a host-side function-preserving weight duplication (new channel
copies a high-norm source channel; the next layer's incoming weights for
source and copy are halved — the network function is unchanged at the
moment of expansion, mirroring the reference's duplicate trick). Shapes
never change; one compiled step serves the whole run.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.inflora import dual_gpm_update
from libcontinual_tpu.models.alexnet import CONV_SPECS, conv_patches
from libcontinual_tpu.registry import METHODS

LAYER_KERNELS = ["conv0_kernel", "conv1_kernel", "conv2_kernel", "fc3_kernel", "fc4_kernel"]


@METHODS.register("API")
class API(Method):
    supports_task_aware = True
    n_sample = 125
    conv_batch = [24, 100, 100]

    def __init__(self, config, mesh_ctx=None):
        config["backbone"] = {
            "name": "AlexNet_API",
            "kwargs": (config.get("backbone") or {}).get("kwargs") or {},
        }
        super().__init__(config, mesh_ctx)
        self.extra = self.backbone.extra
        self.lame = float(self.kwargs.get("lame", 1.0))
        self.lamb = float(self.kwargs.get("lamb", 0.97))
        self.expand_thres = float(self.kwargs.get("expand_thres", 0.4))
        self.expand_step = int(self.kwargs.get("expand_step", 16))
        self._feature_list: List[np.ndarray] = []
        self._project_type: List[str] = []
        self.widths = self.backbone.widths()
        self.in_flats = self.backbone.in_flats()
        self.base_widths = [s["features"] for s in CONV_SPECS] + [2048, 2048]
        self.feat_dim = self.widths[-1]

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class, use_bias=False)

    # ------------------------------------------------------------------ state

    def init_state(self, rng, sample_input_hw):
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = self.model_input(sample_input_hw)
        active0 = [
            jnp.asarray((np.arange(w) < b).astype(np.float32))
            for w, b in zip(self.widths, self.base_widths)
        ]
        variables = self.backbone.init(k1, dummy, active0, train=False)
        params = {"backbone": variables["params"]}
        self._head = self.head_module()
        params["head"] = self._head.init(
            k2, jnp.zeros((2, self.feat_dim), jnp.float32)
        )["params"]
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        mvars = {
            "model_state": {},
            "active": active0,
            "proj": [jnp.zeros((d, d), jnp.float32) for d in self.in_flats],
            "proj_sign": jnp.ones((len(LAYER_KERNELS),), jnp.float32),
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

    # ---------------------------------------------------------------- forward

    def _apply(self, params, mvars, x, train, capture=False, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.backbone.apply(
            {"params": params["backbone"]}, x, mvars["active"],
            train=train, capture=capture, rngs=rngs,
        )

    def loss(self, params, state, batch, rng):
        out = self._apply(params, state.mvars, batch["x"], True, rng=rng)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"), cur_mask)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def transform_grads(self, grads, state):
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        bb = dict(grads["backbone"])
        for li, (name, proj) in enumerate(zip(LAYER_KERNELS, state.mvars["proj"])):
            g = bb[name]
            shape = g.shape
            gf = g.reshape(-1, shape[-1])
            projected = proj @ gf
            sign = state.mvars["proj_sign"][li]
            bb[name] = jnp.where(sign > 0, gf - projected, projected).reshape(shape)
        grads["backbone"] = bb
        return grads

    # ------------------------------------------------------------- expansion

    def _retain_ratios(self, state, task_data) -> np.ndarray:
        """||DualGPM-projected grad|| / ||grad|| per layer from one batch
        (the reference accumulates this per step, api.py:103-104)."""
        bs = min(int(self.config["batch_size"]), len(task_data))
        im = jnp.asarray(task_data.images[:bs])
        lb = jnp.asarray(task_data.labels[:bs].astype(np.int32))

        def lfn(p):
            x = self.augment(None, im, train=False)
            out = self._apply(p, state.mvars, x, False)
            logits = self._head.apply({"params": p["head"]}, out["features"])
            cur = state.seen_mask - state.prev_mask
            return masked_cross_entropy(logits, lb, None, cur)

        g = jax.grad(lfn)(state.params)
        ratios = np.zeros(len(LAYER_KERNELS))
        for li, name in enumerate(LAYER_KERNELS):
            gm = np.asarray(g["backbone"][name], np.float64)
            gf = gm.reshape(-1, gm.shape[-1])
            proj = np.asarray(state.mvars["proj"][li], np.float64)
            sign = float(state.mvars["proj_sign"][li])
            eff = gf - proj @ gf if sign > 0 else proj @ gf
            ratios[li] = np.linalg.norm(eff) / max(np.linalg.norm(gf), 1e-12)
        return ratios

    def _expand_layer(self, params_np, active_np, li, n_new, rng):
        """Function-preserving channel duplication into masked capacity."""
        act = active_np[li]
        inactive = np.nonzero(act == 0)[0]
        if len(inactive) == 0:
            return 0
        n_new = min(n_new, len(inactive))
        kname = LAYER_KERNELS[li]
        kern = params_np["backbone"][kname]
        active_idx = np.nonzero(act > 0)[0]
        norms = np.linalg.norm(kern.reshape(-1, kern.shape[-1])[:, active_idx], axis=0)
        sources = active_idx[np.argsort(norms)[::-1][: max(n_new, 1)]]
        for j in range(n_new):
            dst = inactive[j]
            src = sources[j % len(sources)]
            kern[..., dst] = kern[..., src] + rng.randn(*kern[..., src].shape) * 1e-3
            # bn params follow the source channel
            bn = params_np["backbone"][f"bn{li}"]
            bn["scale"][dst] = bn["scale"][src]
            bn["bias"][dst] = bn["bias"][src]
            act[dst] = 1.0
            # halve + copy the next layer's incoming weights (duplicate trick)
            if li < 2:  # conv -> conv: kernel (k, k, in, out)
                nxt = params_np["backbone"][LAYER_KERNELS[li + 1]]
                nxt[:, :, src, :] = nxt[:, :, src, :] / 2.0
                nxt[:, :, dst, :] = nxt[:, :, src, :]
            elif li == 2:  # conv3 -> fc3: rows are NHWC-flattened (2, 2, C)
                nxt = params_np["backbone"]["fc3_kernel"]
                C = self.widths[2]
                for h in range(2):
                    for w in range(2):
                        r_src = h * 2 * C + w * C + src
                        r_dst = h * 2 * C + w * C + dst
                        nxt[r_src, :] = nxt[r_src, :] / 2.0
                        nxt[r_dst, :] = nxt[r_src, :]
            elif li == 3:  # fc3 -> fc4
                nxt = params_np["backbone"]["fc4_kernel"]
                nxt[src, :] = nxt[src, :] / 2.0
                nxt[dst, :] = nxt[src, :]
            else:  # fc4 -> head
                head = params_np["head"]["Dense_0"]["kernel"]
                head[src, :] = head[src, :] / 2.0
                head[dst, :] = head[src, :]
        return n_new

    def before_task(self, state, task_idx, task_data):
        if task_idx == 0:
            return state
        ratios = self._retain_ratios(state, task_data)
        if np.all(ratios >= self.expand_thres):
            return state
        params_np = jax.tree_util.tree_map(
            lambda x: np.array(x), state.params
        )
        active_np = [np.array(a) for a in state.mvars["active"]]
        rng = np.random.RandomState(task_idx)
        grown = []
        for li, r in enumerate(ratios):
            if r < self.expand_thres:
                n = self._expand_layer(params_np, active_np, li, self.expand_step, rng)
                if n:
                    grown.append((li, n))
        if not grown:
            return state
        mvars = dict(state.mvars)
        mvars["active"] = [jnp.asarray(a) for a in active_np]
        params = jax.tree_util.tree_map(jnp.asarray, params_np)
        state = state.replace(params=params, mvars=mvars)
        return state

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
        threshold = (self.lame - self.lamb) * task_idx / self.task_num + self.lamb
        dual_gpm_update(self._feature_list, self._project_type, mats, threshold)
        signs = np.asarray(
            [1.0 if t == "remove" else -1.0 for t in self._project_type], np.float32
        )
        mvars = dict(state.mvars)
        mvars["proj"] = [
            jnp.asarray((u @ u.T).astype(np.float32)) if u.size
            else jnp.zeros((d, d), jnp.float32)
            for u, d in zip(self._feature_list, self.in_flats)
        ]
        mvars["proj_sign"] = jnp.asarray(signs)
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ eval

    def eval_logits(self, state, x, task_id):
        out = self._apply(state.params, state.mvars, x, False)
        logits = self._head.apply({"params": state.params["head"]}, out["features"])
        mask = self.task_range_mask(task_id) * state.seen_mask
        return jnp.where(mask[None, :] > 0, logits, -1e30)
