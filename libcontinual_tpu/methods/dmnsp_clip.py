"""DMNSP on CLIP — the reference's dual-modality variant
(reference core/model/dmnsp.py with a CLIP backbone: adapters in both towers,
image-text contrastive classification against the current task's class-name
tokens, null-space projection of the VISUAL adapters' gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.clip_methods import CLIPMethod
from libcontinual_tpu.methods.dmnsp import smoothed_ce
from libcontinual_tpu.registry import METHODS


@METHODS.register("DMNSP_CLIP", aliases=("TRGP_CLIP_DMNSP",))
class DMNSPCLIP(CLIPMethod):
    per_iter_scheduler = True

    def __init__(self, config, mesh_ctx=None):
        bk = config["backbone"].setdefault("kwargs", {})
        bk.setdefault("adapter_dim", 64)
        super().__init__(config, mesh_ctx)
        self.label_smoothing = float(self.kwargs.get("label_smoothing", 0.0))
        self.lamda_scale = float(self.kwargs.get("lamda_scale", 30.0))
        self.vision_width = 768 if "tiny" not in config["backbone"]["name"] else 64
        self.depth = self.backbone.vision_depth

    def init_state(self, rng, sample_input_hw):
        k1, k2 = jax.random.split(rng)
        dummy = self.model_input(sample_input_hw)
        toks = jnp.zeros((2, 77), jnp.int32)
        clip_params = self.clip_init_params(k1, dummy, toks)

        def split(tree, path=()):
            train_t, frozen_t = {}, {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    t, f = split(v, path + (k,))
                    if t:
                        train_t[k] = t
                    if f:
                        frozen_t[k] = f
                else:
                    if any("adaptmlp" in p for p in path):
                        train_t[k] = v
                    else:
                        frozen_t[k] = v
            return train_t, frozen_t

        trainable, frozen = split(clip_params)
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        d = self.vision_width
        return TrainState(
            params={"clip": trainable},
            opt_state=self._tx_for_task(0).init({"clip": trainable}),
            mvars={
                "model_state": {},
                "frozen": frozen,
                "task_tokens": self.class_tokens(0, self.num_class),
                "basis": jnp.zeros((self.depth, d, d), jnp.float32),
                "basis_n": jnp.zeros((self.depth,), jnp.int32),
                "P": jnp.zeros((self.depth, d, d), jnp.float32),
                "lam": jnp.ones((self.depth,), jnp.float32),
                "proj_on": jnp.zeros((), jnp.float32),
            },
            rng=k2,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def _merge(self, trainable, frozen):
        def merge(a, b):
            out = dict(b)
            for k, v in a.items():
                out[k] = merge(v, b.get(k, {})) if isinstance(v, dict) else v
            return out

        return merge(trainable, frozen)

    def _apply(self, params, mvars, images, tokens, train, rng=None):
        full = self._merge(params["clip"], mvars["frozen"])
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.backbone.apply(
            {"params": full}, images, tokens, train=train, rngs=rngs
        )

    def loss(self, params, state, batch, rng):
        out = self._apply(params, state.mvars, batch["x"],
                          state.mvars["task_tokens"], True, rng=rng)
        logits = out["logits_per_image"]
        cur_mask = state.seen_mask - state.prev_mask
        ce = smoothed_ce(
            logits, batch["label"], batch.get("weight"), cur_mask,
            self.label_smoothing,
        )
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": {}}

    def transform_grads(self, grads, state):
        on = state.mvars["proj_on"]
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        clip_g = dict(grads["clip"])
        visual = dict(clip_g.get("visual", {}))
        for blk, sub in visual.items():
            i = int(blk.split("_")[1])
            P = state.mvars["P"][i]
            lam = state.mvars["lam"][i]
            sub = jax.tree_util.tree_map(lambda x: x, sub)
            ad = sub["adaptmlp"]
            gd = ad["down"]["kernel"]
            gu = ad["up"]["kernel"]
            ad["down"]["kernel"] = jnp.where(on > 0, (P @ gd) * lam, gd)
            ad["up"]["kernel"] = jnp.where(on > 0, (gu @ P) * lam, gu)
            visual[blk] = sub
        clip_g["visual"] = visual
        grads["clip"] = clip_g
        return grads

    def _visual_covs(self, state, task_data):
        # seeded random batch (reference uses the first batch of a SHUFFLED
        # loader); the protected stream is the adapter OUTPUT (reference
        # lora_feature = adapt_x, transformer.py:1390-1399): capture the raw
        # post-attention residual and re-apply each block's adapter
        from libcontinual_tpu.methods.dmnsp import adapter_outputs

        bs = min(int(self.config["batch_size"]), len(task_data))
        rng = np.random.RandomState(int(self.config.get("seed", 0)))
        idx = rng.permutation(len(task_data))[:bs]
        im = jnp.asarray(task_data.images[idx])
        x = self.augment(None, im, train=False)
        full = self._merge(state.params["clip"], state.mvars["frozen"])
        out = self.backbone.apply(
            {"params": full},
            method=lambda m, xx: m.visual(
                xx, train=False, capture=True, capture_point="mlp"
            ),
            xx=x,
        )
        adapters = {
            blk: sub["adaptmlp"]
            for blk, sub in full["visual"].items()
            if isinstance(sub, dict) and "adaptmlp" in sub
        }
        scale = 0.1
        outs = adapter_outputs(out["attn_inputs"], adapters, scale)
        return [np.asarray(jnp.einsum("bsd,bse->de", o, o)) for o in outs]

    def before_task(self, state, task_idx, task_data):
        from libcontinual_tpu.methods.dmnsp import nsp_lambda

        mvars = dict(state.mvars)
        mvars["task_tokens"] = self.class_tokens(0, self.num_class)
        if task_idx > 0:
            covs = self._visual_covs(state, task_data)
            lam = nsp_lambda(
                np.array(state.mvars["basis"]), np.array(state.mvars["basis_n"]),
                covs, self.depth, self.lamda_scale,
            )
            mvars["lam"] = jnp.asarray(lam)
            mvars["proj_on"] = jnp.ones((), jnp.float32)
        return state.replace(mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        from libcontinual_tpu.methods.dmnsp import nsp_extend_basis

        covs = self._visual_covs(state, task_data)
        basis, counts, P = nsp_extend_basis(
            state.mvars["basis"], state.mvars["basis_n"], covs, self.depth
        )
        mvars = dict(state.mvars)
        mvars["basis"] = jnp.asarray(basis)
        mvars["basis_n"] = jnp.asarray(counts)
        mvars["P"] = jnp.asarray(P)
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        out = self._apply(state.params, state.mvars, x, state.mvars["task_tokens"], False)
        logits = out["logits_per_image"]
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
