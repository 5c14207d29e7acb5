"""CLIP-based CL methods: MoE-Adapter4CL and RAPF.

MoE-Adapter4CL (reference core/model/moe_adapter4cl.py + the MoE machinery in
backbone/transformer.py:27-127, 1461-1658):
  * frozen CLIP with mixture-of-adapter-experts blocks in both towers
    (noisy top-k gating, cv^2 load-balancing loss);
  * per-task image-text contrastive training against the tokenized class
    names of the current task (moe_adapter4cl.py:61-118);
  * inference: similarity against all seen class names' text features.

RAPF (reference core/model/rapf.py): frozen CLIP + a bias-free linear
adapter over image features trained contrastively against class-name text
features (one CE over current images + Gaussian-replayed old features,
rapf.py:335-353); "hard" old/new class pairs whose text features sit closer
than ``threshold`` (rapf.py:179-192) contribute a hinge loss pushing
old-class edge samples toward their own text feature and away from the
near new class (rapf.py:341-348); after each task, per-class
full-covariance Gaussian statistics are recorded (cov + 1e-4 I,
rapf.py:198-211, optionally shrunk per rapf.py:26-36) and old-class features
are replayed by Cholesky sampling (rapf.py:37-44), a few round-robin classes
per batch (rapf.py:305-321); post-task SVD parameter fusion re-expresses the
new adapter in the old adapter's left-singular basis and blends by
normalized drift + mix_bias (``mix_matrix``, rapf.py:212-226).

Note the shipped reference RAPF configs request
``block_layer: ResidualAttentionBlock_MoE_MLP`` (with 1 frozen expert),
which cannot execute upstream — that block's ``__init__`` drops a
positional slot and passes the tower-kind string as ``attn_mask``
(transformer.py:1485-1498 vs 1289-1291, see PARITY.md) — so this framework
runs RAPF on the plain CLIP tower the method actually trains against.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.common import batch_iter, copy_tree, normalized
from libcontinual_tpu.models.tokenizer import tokenize
from libcontinual_tpu.registry import METHODS


class CLIPMethod(Method):
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.prompt_template = self.kwargs.get("prompt_template", "a photo of a {}.")
        self.class_names: List[str] = []

    def _backbone_kind(self):
        return "clip"

    def clip_init_params(self, rng, dummy, toks):
        """Init CLIP params, loading a local OpenAI checkpoint when
        ``backbone.kwargs.pretrained_path`` names an existing file."""
        import os

        variables = self.backbone.init(rng, dummy, toks, train=False)
        params = variables["params"]
        path = ((self.config.get("backbone") or {}).get("kwargs") or {}).get(
            "pretrained_path"
        )
        if path and os.path.exists(path):
            from libcontinual_tpu.models.clip import load_clip_torch_weights

            params = load_clip_torch_weights(params, path)
        return params

    def class_tokens(self, lo: int, hi: int) -> jnp.ndarray:
        names = [
            self.class_names[c] if c < len(self.class_names) and self.class_names[c]
            else f"class {c}"
            for c in range(lo, hi)
        ]
        return jnp.asarray(tokenize([self.prompt_template.format(n) for n in names]))


@METHODS.register("MOE_ADAPTER4CL", aliases=("MoE_Adapter4CL",))
def make_moe_adapter4cl(config, mesh_ctx=None):
    """Backbone dispatch (reference moe_adapter4cl.py:68-98 branches on
    CLIP vs ViTZoo): the ViT variant trains MoE adapters + a per-task-masked
    linear head instead of text contrast."""
    if "clip" in str(config["backbone"]["name"]).lower():
        return MoEAdapter4CL(config, mesh_ctx)
    return MoEAdapter4CLViT(config, mesh_ctx)


class MoEAdapter4CLViT(Method):
    """MoE-Adapter on a frozen ViT (reference moe_adapter4cl.py:70-98 VIT
    branch + moe_adapter4cl_vit.yaml): only the MoE-adapter experts and the
    classifier train; CE over the current task's classes; inference over all
    seen heads."""

    concat_buffer = False
    per_iter_scheduler = True  # CosineAnnealingWarmUp steps per iteration

    def __init__(self, config, mesh_ctx=None):
        bk = config["backbone"].setdefault("kwargs", {})
        bk.setdefault("moe_experts", bk.get("experts_num", 2))
        super().__init__(config, mesh_ctx)
        self.label_smoothing = float(self.kwargs.get("label_smoothing", 0.0))
        # the reference never applies its cv^2 load-balancing loss (the MoE
        # block's `load` computation is commented out, transformer.py:1634-1637)
        # so the aux term defaults OFF; opt in via load_balance_weight
        self.aux_weight = float(self.kwargs.get("load_balance_weight", 0.0))

    def init_state(self, rng, sample_input_hw):
        state = super().init_state(rng, sample_input_hw)

        def mask_tree(tree, path=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = mask_tree(v, path + (k,))
                else:
                    train = any("moe" in p or "adaptmlp" in p for p in path + (k,))
                    out[k] = jnp.asarray(1.0 if train else 0.0)
            return out

        mvars = dict(state.mvars)
        mvars["trainable_mask"] = {
            "backbone": mask_tree(state.params["backbone"]),
            "head": jax.tree_util.tree_map(
                lambda p: jnp.asarray(1.0), state.params["head"]
            ),
        }
        return state.replace(mvars=mvars)

    def loss(self, params, state, batch, rng):
        out, new_model_state = self.apply_backbone(
            params, state.mvars["model_state"], batch["x"], train=True, rng=rng
        )
        logits = self._head.apply({"params": params["head"]}, out["features"])
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"),
                                  cur_mask, self.label_smoothing)
        loss = ce + self.aux_weight * out.get("moe_aux", 0.0)
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": new_model_state}

    def eval_logits(self, state, x, task_id):
        out, _ = self.apply_backbone(
            state.params, state.mvars["model_state"], x, train=False
        )
        logits = self._head.apply({"params": state.params["head"]}, out["features"])
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)


class MoEAdapter4CL(CLIPMethod):
    def __init__(self, config, mesh_ctx=None):
        bk = config["backbone"].setdefault("kwargs", {})
        bk.setdefault("moe_experts", bk.get("experts_num", 4))
        super().__init__(config, mesh_ctx)
        self.label_smoothing = float(self.kwargs.get("label_smoothing", 0.0))
        self.aux_weight = float(self.kwargs.get("load_balance_weight", 0.0))

    def init_state(self, rng, sample_input_hw):
        k1, k2 = jax.random.split(rng)
        dummy = self.model_input(sample_input_hw)
        toks = jnp.zeros((2, 77), jnp.int32)
        clip_params = self.clip_init_params(k1, dummy, toks)
        # split: MoE/adapter params train, CLIP trunk frozen
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
                    if any("moe" in p or "adaptmlp" in p for p in path) or "logit_scale" in k:
                        train_t[k] = v
                    else:
                        frozen_t[k] = v
            return train_t, frozen_t

        trainable, frozen = split(clip_params)
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        return TrainState(
            params={"clip": trainable},
            opt_state=self._tx_for_task(0).init({"clip": trainable}),
            mvars={
                "model_state": {},
                "frozen": frozen,
                "task_tokens": self.class_tokens(0, self.num_class),
            },
            rng=k2,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def before_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["task_tokens"] = self.class_tokens(0, self.num_class)
        return state.replace(mvars=mvars)

    def _merge(self, trainable, frozen):
        def merge(a, b):
            out = dict(b)
            for k, v in a.items():
                out[k] = merge(v, b.get(k, {})) if isinstance(v, dict) else v
            return out

        return merge(trainable, frozen)

    def _apply(self, params, mvars, images, tokens, train, rng=None):
        full = self._merge(params["clip"], mvars["frozen"])
        rngs = {"moe": rng} if (train and rng is not None) else None
        return self.backbone.apply(
            {"params": full}, images, tokens, train=train, rngs=rngs
        )

    def loss(self, params, state, batch, rng):
        out = self._apply(
            params, state.mvars, batch["x"], state.mvars["task_tokens"], True, rng
        )
        logits = out["logits_per_image"]  # (B, num_class) vs all class texts
        cur_mask = state.seen_mask - state.prev_mask
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"),
                                  cur_mask, self.label_smoothing)
        loss = ce + self.aux_weight * out["moe_aux"]
        masked = jnp.where(cur_mask[None, :] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": {}}

    def eval_logits(self, state, x, task_id):
        out = self._apply(state.params, state.mvars, x, state.mvars["task_tokens"], False)
        logits = out["logits_per_image"]
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)


def shrink_cov(cov: np.ndarray) -> np.ndarray:
    """Covariance shrinkage (reference rapf.py:26-36): add the mean diagonal
    to the diagonal and the mean off-diagonal to the off-diagonal."""
    d = cov.shape[0]
    diag_mean = float(np.mean(np.diagonal(cov)))
    off = cov.copy()
    np.fill_diagonal(off, 0.0)
    mask = off != 0.0
    off_mean = float(off[mask].sum() / max(mask.sum(), 1))
    iden = np.eye(d)
    return cov + diag_mean * iden + off_mean * (1.0 - iden)


def mix_matrix(W_old: np.ndarray, W_new: np.ndarray, mix_bias: float) -> np.ndarray:
    """Reference RAPF parameter fusion (rapf.py:212-226), torch weight layout
    (out, in): express W_new in W_old's left-singular basis, blend each
    coefficient toward the old one by (1 - normalized drift - mix_bias)."""
    U, S, Vt = np.linalg.svd(W_old, full_matrices=False)
    P_new = U.T @ W_new
    SV = np.diag(S) @ Vt
    drift = np.abs(P_new - SV)
    mask = np.minimum(drift / max(drift.max(), 1e-12) + mix_bias, 1.0)
    return U @ (P_new * mask + SV * (1.0 - mask))


@METHODS.register("RAPF")
class RAPF(CLIPMethod):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.embed_dim = int(self.kwargs.get("embed_dim", 512))
        self.beta = float(self.kwargs.get("beta", 2.0))
        self.shrinkage = bool(self.kwargs.get("shrinkage", False))
        self.threshold = float(self.kwargs.get("threshold", 0.55))
        self.mix_bias = float(self.kwargs.get("mix_bias", 0.6))
        # classes replayed per batch (reference rapf.py:311-315)
        self.replay_cpb = 4 if self.inc_cls_num == 5 else 2
        self.replay_per_cls = int(10 * self.beta)
        # edge samples drawn per hard (old, new) pair (rapf.py:329)
        self.edge_per_pair = int(20 * self.beta)
        # static capacity for the per-task hard-pair set (the reference's
        # tensor is dynamically sized, rapf.py:188-192; threshold 0.55 on
        # normalized CLIP text features keeps real counts far below this)
        self.hard_cap = int(self.kwargs.get("hard_pairs_cap", 32))

    def init_state(self, rng, sample_input_hw):
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = self.model_input(sample_input_hw)
        toks = jnp.zeros((2, 77), jnp.int32)
        clip_params = self.clip_init_params(k1, dummy, toks)
        d = self.backbone.embed_dim
        self.embed_dim = d
        # bias-free Linear(d, d) with torch's default kaiming-uniform init
        # (reference rapf.py:84 nn.Linear(512, 512, bias=False)): U(+-1/sqrt(d))
        bound = 1.0 / float(np.sqrt(d))
        adapter = {
            "kernel": jax.random.uniform(
                k2, (d, d), jnp.float32, minval=-bound, maxval=bound
            ),
        }
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        return TrainState(
            params={"adapter": adapter},
            opt_state=self._tx_for_task(0).init({"adapter": adapter}),
            mvars={
                "model_state": {},
                "frozen": clip_params,
                "text_feats": jnp.zeros((self.num_class, d), jnp.float32),
                "cls_mean": jnp.zeros((self.num_class, d), jnp.float32),
                # Cholesky factors of the (optionally shrunk) per-class
                # covariances (reference rapf.py:37-44 samples vec @ chol.T);
                # identity init = unit-Gaussian prior (never sampled before
                # cls_valid flips, but keeps replay features non-degenerate —
                # a zero vector would NaN the normalization gradient)
                "cls_chol": jnp.broadcast_to(
                    jnp.eye(d, dtype=jnp.float32), (self.num_class, d, d)
                ),
                "cls_valid": jnp.zeros((self.num_class,), jnp.float32),
                # round-robin replay order over old classes (rapf.py:266-269)
                "replay_order": jnp.zeros((self.num_class,), jnp.int32),
                "replay_len": jnp.ones((), jnp.int32),
                # padded hard (old, new) text-feature pairs (rapf.py:179-192)
                "hard_old": jnp.zeros((self.hard_cap,), jnp.int32),
                "hard_new": jnp.zeros((self.hard_cap,), jnp.int32),
                "hard_valid": jnp.zeros((self.hard_cap,), jnp.float32),
                "old_adapter": {
                    "kernel": jnp.zeros((d, d), jnp.float32),
                },
            },
            rng=k3,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def before_task(self, state, task_idx, task_data):
        # (re)compute text features of all classes through the frozen tower
        toks = self.class_tokens(0, self.num_class)

        @jax.jit
        def text_feats(frozen, toks):
            out = self.backbone.apply(
                {"params": frozen}, method=lambda m, t: m.encode_text(t, train=False),
                t=toks,
            )
            f = out[0]
            return normalized(f, eps=1e-8)

        mvars = dict(state.mvars)
        mvars["text_feats"] = text_feats(state.mvars["frozen"], toks)
        if task_idx > 0:
            # shuffled old-class list for round-robin replay (rapf.py:266-269)
            n_old = self.init_cls_num + (task_idx - 1) * self.inc_cls_num
            rng = np.random.RandomState(int(self.config.get("seed", 0)) + task_idx)
            order = rng.permutation(n_old)
            pad = np.resize(order, self.num_class)  # cycle-pad to fixed shape
            mvars["replay_order"] = jnp.asarray(pad.astype(np.int32))
            mvars["replay_len"] = jnp.asarray(n_old, jnp.int32)
            # hard (old, new) pairs: euclidean distance between normalized
            # class-name text features below threshold (rapf.py:179-192);
            # row-major over (old, new) like torch.nonzero
            tf = np.asarray(mvars["text_feats"], np.float32)
            n_new = min(self.inc_cls_num, self.num_class - n_old)
            diff = np.linalg.norm(
                tf[n_old:n_old + n_new][None, :, :] - tf[:n_old][:, None, :],
                axis=-1,
            )
            ko, kn = np.nonzero(diff < self.threshold)
            if len(ko) > self.hard_cap:
                self.logger_warn(
                    f"RAPF: {len(ko)} hard pairs exceed hard_pairs_cap="
                    f"{self.hard_cap}; truncating"
                )
                ko, kn = ko[: self.hard_cap], kn[: self.hard_cap]
            hard_old = np.zeros((self.hard_cap,), np.int32)
            hard_new = np.zeros((self.hard_cap,), np.int32)
            hard_valid = np.zeros((self.hard_cap,), np.float32)
            hard_old[: len(ko)] = ko
            hard_new[: len(ko)] = n_old + kn
            hard_valid[: len(ko)] = 1.0
            mvars["hard_old"] = jnp.asarray(hard_old)
            mvars["hard_new"] = jnp.asarray(hard_new)
            mvars["hard_valid"] = jnp.asarray(hard_valid)
        return state.replace(mvars=mvars)

    def logger_warn(self, msg):
        import logging

        logging.getLogger("libcontinual_tpu").warning(msg)

    def _image_feats(self, mvars, x):
        out = self.backbone.apply(
            {"params": mvars["frozen"]},
            method=lambda m, im: m.encode_image(im, train=False),
            im=x,
        )
        return jax.lax.stop_gradient(out[0])

    def _adapted(self, params, f):
        return normalized(f @ params["adapter"]["kernel"], eps=1e-8)

    def loss(self, params, state, batch, rng):
        """One CE over [current images; Gaussian-replayed old features]
        (a single mean, reference rapf.py:339-349) + the hard-pair hinge
        over edge samples drawn from the old class of each pair
        (rapf.py:324-348)."""
        f = self._image_feats(state.mvars, batch["x"])
        k_replay, k_edge = jax.random.split(
            rng if rng is not None else jax.random.PRNGKey(0)
        )
        tf = state.mvars["text_feats"]
        scale = jnp.exp(state.mvars["frozen"]["logit_scale"])

        # Gaussian replay of old classes: a few round-robin classes per batch,
        # sampled from the full-covariance Gaussian via its Cholesky factor
        # (reference rapf.py:305-321, 37-44). The reference indexes its
        # shuffled class list by the per-epoch batch id; state.step carries
        # the same round-robin across epoch boundaries (documented phase
        # deviation — both traverse every old class uniformly).
        cpb, n_per = self.replay_cpb, self.replay_per_cls
        slot = state.step * cpb + jnp.arange(cpb)
        pos = jnp.mod(slot, jnp.maximum(state.mvars["replay_len"], 1))
        cls = state.mvars["replay_order"][pos]  # (cpb,)
        noise = jax.random.normal(k_replay, (cpb, n_per, self.embed_dim))
        L = state.mvars["cls_chol"][cls]  # (cpb, d, d) lower factors
        rf = state.mvars["cls_mean"][cls][:, None, :] + jnp.einsum(
            "cnd,ced->cne", noise, L
        )
        rf = rf.reshape(cpb * n_per, self.embed_dim)
        r_targets = jnp.repeat(cls, n_per, total_repeat_length=cpb * n_per)

        g_all = self._adapted(params, jnp.concatenate([f, rf], axis=0))
        logits_all = scale * g_all @ tf.T
        targets_all = jnp.concatenate([batch["label"], r_targets])
        w_img = batch.get("weight")
        if w_img is None:
            w_img = jnp.ones((f.shape[0],), jnp.float32)
        replay_on = jnp.where(state.task > 0, 1.0, 0.0)
        w_all = jnp.concatenate(
            [w_img, replay_on * jnp.ones((rf.shape[0],), jnp.float32)]
        )
        ce = masked_cross_entropy(logits_all, targets_all, w_all, state.seen_mask)

        # hinge on edge samples from each hard pair's OLD-class Gaussian:
        # relu(-(e . t_old) + (e . t_new) + 0.1) (rapf.py:341-348)
        P, ne = self.hard_cap, self.edge_per_pair
        ecls = state.mvars["hard_old"]
        enoise = jax.random.normal(k_edge, (P, ne, self.embed_dim))
        eL = state.mvars["cls_chol"][ecls]
        ef = state.mvars["cls_mean"][ecls][:, None, :] + jnp.einsum(
            "pnd,ped->pne", enoise, eL
        )
        eg = self._adapted(params, ef.reshape(P * ne, self.embed_dim))
        t_old = tf[jnp.repeat(ecls, ne, total_repeat_length=P * ne)]
        t_new = tf[jnp.repeat(state.mvars["hard_new"], ne,
                              total_repeat_length=P * ne)]
        h = jax.nn.relu(
            -jnp.sum(eg * jax.lax.stop_gradient(t_old), axis=-1)
            + jnp.sum(eg * jax.lax.stop_gradient(t_new), axis=-1)
            + 0.1
        )
        ev = jnp.repeat(state.mvars["hard_valid"], ne,
                        total_repeat_length=P * ne)
        hinge = jnp.sum(h * ev) / jnp.maximum(jnp.sum(ev), 1.0)
        has_edge = jnp.where(jnp.sum(state.mvars["hard_valid"]) > 0, 1.0, 0.0)
        loss = ce + has_edge * hinge
        logits = logits_all[: f.shape[0]]
        masked = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": {}}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        mean = np.array(state.mvars["cls_mean"])
        chol = np.array(state.mvars["cls_chol"])
        valid = np.array(state.mvars["cls_valid"])
        feats_all, labels_all = [], []

        # the reference gathers stats by iterating its train_loader
        # (rapf.py:273-281) — train-time augmentation included
        aug_rng = jax.random.PRNGKey(int(self.config.get("seed", 0)) + task_idx)

        @jax.jit
        def feat(state, rng, images):
            x = self.augment(rng, images, train=True)
            return self._image_feats(state.mvars, x)

        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            aug_rng, sub = jax.random.split(aug_rng)
            fl = np.asarray(feat(state, sub, im))
            keep = np.asarray(w) > 0
            feats_all.append(fl[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all).astype(np.float64)
        labels = np.concatenate(labels_all)
        d = feats.shape[1]
        for c in np.unique(labels):
            fc = feats[labels == c]
            mean[c] = fc.mean(0)
            # full covariance + 1e-4 I (reference rapf.py:205), optionally
            # shrunk (rapf.py:26-36 when `shrinkage`), stored as its Cholesky
            # factor so the in-graph sampler is a single matmul
            cov = np.cov(fc.T) + 1e-4 * np.eye(d) if len(fc) > 1 else 1e-4 * np.eye(d)
            if self.shrinkage:
                cov = shrink_cov(cov)
            chol[c] = np.linalg.cholesky(cov).astype(np.float32)
            valid[c] = 1.0

        # SVD parameter fusion (reference mix_matrix, rapf.py:212-226):
        # express the new adapter in the old adapter's left-singular basis,
        # blend each coefficient by its normalized drift + mix_bias
        if task_idx > 0:
            # torch Linear weight (out,in) == our kernel transposed
            W_old = np.array(state.mvars["old_adapter"]["kernel"]).T
            W_new = np.array(state.params["adapter"]["kernel"]).T
            fused = mix_matrix(W_old, W_new, self.mix_bias)
            params = jax.tree_util.tree_map(lambda x: x, state.params)
            params["adapter"] = dict(params["adapter"])
            params["adapter"]["kernel"] = jnp.asarray(fused.T.astype(np.float32))
            state = state.replace(params=params)

        mvars = dict(state.mvars)
        mvars["cls_mean"] = jnp.asarray(mean.astype(np.float32))
        mvars["cls_chol"] = jnp.asarray(chol.astype(np.float32))
        mvars["cls_valid"] = jnp.asarray(valid)
        mvars["old_adapter"] = copy_tree(state.params["adapter"])
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        f = self._image_feats(state.mvars, x)
        g = self._adapted(state.params, f)
        scale = jnp.exp(state.mvars["frozen"]["logit_scale"])
        logits = scale * g @ state.mvars["text_feats"].T
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
