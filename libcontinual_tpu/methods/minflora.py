"""MInfLoRA / MInfLoRA2 / MInfLoRA3 — the reference authors' experimental
masked multi-LoRA attention machinery, faithfully re-derived for TPU.

Reference sources (unpublished variants, no reproduce README):
  * methods:   core/model/MInfLoRA.py, MInfLoRA2.py, MInfLoRA3.py
  * attention: backbone/transformer.py:608-764 (MaskedLoRA1),
               :767-894 (MultiMaskedLoRA), :1051-1251 (MultiMaskedLoRA3)
  * dual-stream block/transformer: transformer.py:1887-1946 (BiBlock),
               :2020-2043 (Transformer_Proj)
  * weight-space scaling: petl/proj.py:6-91 (Proj/Proj2 — two identical
    modules; the same transform appears inline in the attention forwards)

What is live in the reference (vs large commented/dead regions) and is
reproduced here:

MInfLoRA (v1, MaskedLoRA1):
  * per-task K/V LoRA expert lists; forward merges the SUM of all created
    experts' B@A into the k/v weights (transformer.py:698-703);
  * A is SVD-initialized from a PROBE-SELECTED input Gram (greedy span
    selection, MInfLoRA.py:131-228 with GREEDY=True, energy 0.01,
    top_r=128, called at :406-410), projected against the accumulated
    feature list for task>0 (:424-435); B (current task) + current head
    train (:517-522);
  * after_task extends the feature list with the lstsq approximation of
    the projected probe-Gram SVD onto the task's A (APPROX_FEAT=True,
    :556-565);
  * quirks preserved by NOT replicating them: the per-step probe forward
    in observe (:353-354) only feeds the drift-rebase branch gated on
    batch>128 (transformer.py:654), which the 128-sample probe never
    triggers — dead compute, documented here instead of re-run; the
    ``use_ca`` class-alignment fields (:338-345) are initialized but never
    used by any live path.

MInfLoRA2 (v2, MultiMaskedLoRA + BiBlock/Transformer_Proj):
  * ONE K/V LoRA pair, SVD-rebased per task from the (DualGPM-projected)
    input covariance (MInfLoRA2.py:212-236) and FOLDED into the base qkv
    weight after each task (merge_weight, transformer.py:228-234);
  * dual streams through shared blocks: x (plain) and x_proj
    (trust-region-scaled); features come from x_proj
    (transformer.py:2036-2043);
  * trust regions: TRGP-style top-1 prior task by projection norm with
    Epsilon=0.5 (MInfLoRA2.py:193-210); the scaled stream's k/v weights get
    W <- W + W S^T (QQ^T - I) S per enabled space, with Q a trainable
    per-task scale cropped to the space rank (transformer.py:859-872 =
    petl/proj.py:28-43);
  * eval-time per-layer expert routing: batch Gram of the plain stream
    projected onto each task's saved space, softmax over norms, argmax
    (transformer.py:813-829);
  * saved spaces: after-task SVD of the input covariance at threshold
    ``lamb``, zero-padded to a common rank (MInfLoRA2.py:255-280);
  * DualGPM feature-list update, delta-stack variant (:283-372);
  * trainables per task: current head, all lora_B, current scale_param
    (:238-241).

MInfLoRA3 (v3, MultiMaskedLoRA3):
  * per-task K/V LoRA lists (sum over created, transformer.py:1187-1189)
    PLUS per-task full-rank trust-region scaling with a *diagonal* trainable
    scale: W <- W - W S^T S + W S^T diag(q) S (:1204-1222, last-assignment
    semantics of the scalee ladder);
  * spaces from SVD of (F F^T - W_k F F^T) at task boundaries, full 768
    columns scaled by 1/sqrt(3) (MInfLoRA3.py before_task) — with S =
    U^T/sqrt3 and U orthogonal this reduces to
    W' = (2/3) W + (1/3) W U diag(q) U^T (identity-init => W' = W);
  * reference quirk preserved: before_task writes its SVD init into the
    parent class's UNUSED single lora_A (MInfLoRA3.py:193-197 writes
    ``module.lora_A_k`` while forward reads ``lora_A_k_list[ii]``,
    transformer.py:1188) — so the per-task A factors remain at their
    kaiming init and stay frozen; we initialize A the same way and do not
    apply the dead SVD write;
  * trainables per task: current head, current lora_B_k/v, current
    scale_param (MInfLoRA3.py:249-253).

TPU re-design notes: per-task module lists become stacked fixed-shape
arrays; trust-region spaces/scales are rank-capped stacked mvars/params
(the reference zero-pads spaces to a common rank too, MInfLoRA2.py:269-278;
caps are config knobs ``scale_rank_cap``/``route_rank_cap``); eval routing
and the weight transforms run in-graph (one compiled step for the whole
task sequence); per-task classifier pools are expressed as the masked
growing head (training CE is masked to the current task's classes and
inference logits to seen classes — exactly the reference's train-one-block
/ concat-seen-blocks behavior).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS


# --------------------------------------------------------------------------
# host-side numerics (task boundaries only)
# --------------------------------------------------------------------------


def greedy_span_select(vectors: np.ndarray, energy_threshold: float = 0.01,
                       max_select: int | None = None) -> np.ndarray:
    """Greedy span probe selection (reference MInfLoRA.py:131-228,
    ``select_probe_greedy_span_unified_normalized_high_precision`` with
    GREEDY=True). ``vectors``: (N, D) projected per-sample Gram features.

    Reference quirks kept: the pick maximizes the *residual* energy but the
    coverage counter accumulates the picked sample's *original* energy
    (MInfLoRA.py:203,214)."""
    vectors = np.asarray(vectors, np.float64)
    n = vectors.shape[0]
    residual = vectors.copy()
    orig_energy = np.sum(vectors ** 2, axis=1)
    total = float(np.sum(orig_energy)) + 1e-12
    selected: List[int] = []
    current = 0.0
    mask = np.ones(n, bool)
    limit = n if max_select is None else min(n, max_select)
    while current / total < energy_threshold and len(selected) < limit:
        gains = np.sum(residual ** 2, axis=1)
        gains[~mask] = -np.inf
        best = int(np.argmax(gains))
        selected.append(best)
        mask[best] = False
        v = residual[best]
        v = v / (np.linalg.norm(v) + 1e-8)
        current += float(orig_energy[best])
        residual = residual - (residual @ v)[:, None] * v[None, :]
    return np.asarray(selected, np.int64)


def masked_gpm_update(feature_list: List[np.ndarray],
                      project_type: List[str],
                      mat_list: List[np.ndarray],
                      threshold: float):
    """DualGPM update, delta-stack variant (reference MInfLoRA2.py:283-372;
    identical body in MInfLoRA3). Returns the per-task new directions
    (``feature_list_each_tasks`` row) per layer."""
    each_task: List[np.ndarray] = []
    if not feature_list:
        for act in mat_list:
            u, s, _ = np.linalg.svd(act, full_matrices=False)
            ratio = np.cumsum(s ** 2) / np.sum(s ** 2)
            r = max(int(np.sum(ratio < threshold)), 1)
            feature_list.append(u[:, :r])
            project_type.append("remove")
            each_task.append(u[:, :r])
        return each_task
    for i, act in enumerate(mat_list):
        _, s1, _ = np.linalg.svd(act, full_matrices=False)
        sval_total = float(np.sum(s1 ** 2)) + 1e-12
        U = feature_list[i]
        if project_type[i] == "remove":
            act_hat = act - U @ (U.T @ act)
            u, s, _ = np.linalg.svd(act_hat, full_matrices=False)
            sigma = s ** 2
            delta = np.diagonal(U.T @ act @ act.T @ U)
            stack = np.hstack([delta, sigma])
            order = np.argsort(stack)[::-1]
            stack_sorted = np.sort(stack)[::-1]
            if threshold * sval_total <= 0:
                r = 0
            else:
                r = min(int(np.sum(np.cumsum(stack_sorted) < threshold * sval_total)) + 1,
                        act.shape[0])
            ui = np.hstack([U, u])
            sel_each = order[:r]
            sel_overall = sel_each[sel_each >= len(delta)]
            feature_list[i] = np.hstack([U, ui[:, sel_overall]])
            each_task.append(ui[:, sel_each] if r > 0 else np.zeros((act.shape[0], 0)))
        else:
            act_hat = U @ (U.T @ act)
            u, s, _ = np.linalg.svd(act_hat, full_matrices=False)
            sval_hat = float(np.sum(s ** 2))
            ratio = (s ** 2) / sval_total
            accumulated = sval_hat / sval_total
            if accumulated < 1 - threshold:
                each_task.append(np.zeros((act.shape[0], 0)))
                continue
            r = int(np.sum(accumulated - np.cumsum(ratio) >= 1 - threshold)) + 1
            act_feature = U - u[:, :r] @ (u[:, :r].T @ U)
            uu, _, _ = np.linalg.svd(act_feature)
            feature_list[i] = uu[:, : U.shape[1] - r]
            each_task.append(u[:, :r])
    return each_task


def _pad_cols(mat: np.ndarray, cols: int) -> np.ndarray:
    """Zero-pad/crop columns to a fixed count (reference pads saved spaces
    to a common rank, MInfLoRA2.py:269-278)."""
    d, r = mat.shape
    out = np.zeros((d, cols), mat.dtype)
    out[:, : min(r, cols)] = mat[:, : min(r, cols)]
    return out


def weight_space_scale(w: jnp.ndarray, space: jnp.ndarray,
                       scale: jnp.ndarray) -> jnp.ndarray:
    """Proj/Proj2 + MultiMaskedLoRA weight-space scaling, jax orientation.

    torch (reference petl/proj.py:40-43, transformer.py:871-872):
        W <- W + W @ S^T @ (Q Q^T - I_r) @ S       with W (out, in)
    Here weights are (in, out) (x @ W), and M = S^T (QQ^T - I) S is
    symmetric in input space, so:  W' = W + M @ W.
    ``space``: (r, d) rows spanning the trust region; ``scale``: (r, r).
    """
    q = scale @ scale.T
    m = space.T @ (q - jnp.eye(space.shape[0], dtype=space.dtype)) @ space
    return w + m.astype(w.dtype) @ w


# --------------------------------------------------------------------------
# shared probe/Gram machinery
# --------------------------------------------------------------------------


class _MaskedLoRABase(LoRAViTMethod):
    lora_slots = ("k", "v")

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.lame = float(self.kwargs.get("lame", 1.0))
        self.lamb = float(self.kwargs.get("lamb", 0.95))
        self._feature_list: List[np.ndarray] = []
        self._project_type: List[str] = []

    def trainable_lora(self):
        return ("B",)

    def _layer_grams(self, state, images, weight=None):
        """Per-layer attention-input Gram SUMS over a batch (device).
        Matches the reference's cur_matrix accumulation up to a global
        scale (transformer.py:809-810 keeps a running mean; every consumer
        is scale-invariant — SVD bases, singular-value ratios, norm
        ratios)."""
        x = self.augment(None, images, train=False)
        out = self.vit_features(state.params, state.mvars, x, train=False,
                                capture=True)
        w = weight[:, None, None] if weight is not None else 1.0
        return [
            jnp.einsum("bsd,bse->de", a * w, a,
                       preferred_element_type=jnp.float32)
            for a in out["attn_inputs"]
        ]

    def task_grams(self, state, task_data) -> List[np.ndarray]:
        bs = int(self.config["batch_size"])
        covs = None
        fn = getattr(self, "_task_grams_jit", None)
        if fn is None:
            # jitted once per instance — a fresh jit(lambda) per call would
            # recompile the full capture forward at every task boundary
            fn = jax.jit(lambda st, im, w: self._layer_grams(st, im, w))
            self._task_grams_jit = fn
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            outs = fn(state, im, w)
            if covs is None:
                covs = [np.zeros(o.shape, np.float64) for o in outs]
            for i, c in enumerate(outs):
                covs[i] += np.asarray(c, np.float64)
        return covs


# --------------------------------------------------------------------------
# MInfLoRA (v1)
# --------------------------------------------------------------------------


@METHODS.register("MInfLoRA")
class MInfLoRA(_MaskedLoRABase):
    """Per-task K/V LoRA experts + probe-span SVD init (reference
    MInfLoRA.py + transformer.py:608-764)."""

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.probe_top_r = int(self.kwargs.get("probe_top_r", 128))
        self.probe_energy = float(self.kwargs.get("probe_energy", 0.01))
        self.probe_max = self.kwargs.get("probe_max", 512)

    # -- probe selection ----------------------------------------------------

    def _probe_features(self, state, task_data):
        """Two device passes: (1) global normalized-Gram covariance ->
        top_r SVD basis U; (2) per-sample projected Gram features
        U^T (sum_l G_l/||G_l||) U flattened (reference MInfLoRA.py:150-174).
        """
        bs = int(self.config["batch_size"])
        d = self.embed_dim

        cached = getattr(self, "_norm_gram_jit", None)

        @jax.jit
        def norm_gram_sum(st, im):
            x = self.augment(None, im, train=False)
            out = self.vit_features(st.params, st.mvars, x, train=False,
                                    capture=True)
            acc = jnp.zeros((im.shape[0], d, d), jnp.float32)
            for a in out["attn_inputs"]:
                g = jnp.einsum("bsd,bse->bde", a, a,
                               preferred_element_type=jnp.float32)
                nrm = jnp.sqrt(jnp.sum(g * g, axis=(1, 2), keepdims=True))
                acc = acc + g / (nrm + 1e-8)
            return acc

        # one jit per instance, not per task boundary
        if cached is not None:
            norm_gram_sum = cached
        else:
            self._norm_gram_jit = norm_gram_sum

        c_global = np.zeros((d, d), np.float64)
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            acc = norm_gram_sum(state, im)
            c_global += np.asarray(
                jnp.sum(acc * np.asarray(w)[:, None, None], axis=0), np.float64
            )
        u, _, _ = np.linalg.svd(c_global)
        top_r = min(self.probe_top_r, d)
        u = jnp.asarray(u[:, :top_r], jnp.float32)

        # second streaming pass: recompute batch Grams and project
        # immediately — retaining every per-sample (d, d) Gram for the whole
        # task (~2.4 MB/sample at d=768) would OOM the device. PAD rows
        # (weight 0, batch_iter repeats) are dropped so returned row indices
        # align with task_data.
        proj = jax.jit(
            lambda acc, uu: jnp.einsum("dr,bde,es->brs", uu, acc, uu)
        )
        feats = []
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            acc = norm_gram_sum(state, im)
            f = np.asarray(proj(acc, u)).reshape(acc.shape[0], -1)
            feats.append(f[np.asarray(w) > 0])
        return np.concatenate(feats, axis=0)

    def _probe_gram_sums(self, state, task_data, probe_idx) -> List[np.ndarray]:
        """RAW per-layer Gram sums over the probe set / 512 (reference
        MInfLoRA.py:418,429,552 hardcodes the 512 divisor)."""
        images = task_data.images[probe_idx]
        # probe sets are small (energy 0.01): run them as one device batch
        outs = jax.jit(lambda st, im: self._layer_grams(st, im))(
            state, jnp.asarray(images))
        return [np.asarray(o, np.float64) / 512.0 for o in outs]

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        feats = self._probe_features(state, task_data)
        probe_idx = greedy_span_select(
            feats, self.probe_energy,
            None if self.probe_max is None else int(self.probe_max))
        self._probe_idx = probe_idx
        grams = self._probe_gram_sums(state, task_data, probe_idx)
        lora = {k: np.array(v) for k, v in state.params["lora"].items()}
        for layer in range(self.depth):
            act = grams[layer]
            if task_idx > 0:
                fl = self._feature_list[layer]
                act = act - (fl @ fl.T) @ act  # MInfLoRA.py:429-430
            u, _, _ = np.linalg.svd(act, full_matrices=False)
            a = (u[:, : self.rank].T / math.sqrt(3)).astype(np.float32)
            for slot in self.lora_slots:
                lora[f"A_{slot}"][layer, task_idx] = a
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params = dict(state.params)
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        return state.replace(params=params)

    def after_task(self, state, task_idx, task_data):
        grams = self._probe_gram_sums(state, task_data, self._probe_idx)
        lora = state.params["lora"]
        for layer in range(self.depth):
            act = grams[layer]
            if task_idx > 0:
                fl = self._feature_list[layer]
                act = act - (fl @ fl.T) @ act
            u, _, _ = np.linalg.svd(act, full_matrices=False)
            true_u = u[:, : self.rank]
            # APPROX_FEAT=True (MInfLoRA.py:556-565): approximate the new
            # directions inside span(A_task) by least squares
            a_t = np.asarray(lora["A_k"][layer, task_idx], np.float64).T * math.sqrt(3)
            sol, *_ = np.linalg.lstsq(a_t, true_u, rcond=None)
            approx_u = a_t @ sol
            if task_idx == 0:
                self._feature_list.append(approx_u)
                self._project_type.append("remove")
            else:
                self._feature_list[layer] = np.hstack(
                    [self._feature_list[layer], approx_u])
        return state


# --------------------------------------------------------------------------
# MInfLoRA2 (v2)
# --------------------------------------------------------------------------

EPSILON = 0.5  # reference MInfLoRA2.py:20


@METHODS.register("MInfLoRA2")
class MInfLoRA2(_MaskedLoRABase):
    """Rebased single LoRA + dual-stream trust-region scaling + eval-time
    per-layer expert routing (reference MInfLoRA2.py + MultiMaskedLoRA)."""

    # reference trainer disables in-epoch val for v2/v3 (trainer.py:367-377)
    validate_enabled = False
    # cross-task host state read back in before_task — must survive resume
    host_state_attrs = ("_feature_each_task",)

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.scale_rank_cap = int(self.kwargs.get("scale_rank_cap", 64))
        self.route_rank_cap = int(self.kwargs.get("route_rank_cap", 128))
        self._feature_each_task: List[List[np.ndarray]] = []

    # -- params/mvars ---------------------------------------------------------

    def init_lora_params(self, rng) -> Dict[str, Any]:
        d, r, L = self.embed_dim, self.rank, self.depth
        p = {}
        for slot in self.lora_slots:
            p[f"A_{slot}"] = jnp.zeros((L, r, d), jnp.float32)
            p[f"B_{slot}"] = jnp.zeros((L, d, r), jnp.float32)
        return p

    def extra_params(self, rng):
        L, T, rc = self.depth, self.task_num, self.scale_rank_cap
        # per-layer per-task 2-slot trust-region scale, identity-init
        # (reference scale_param = eye(768) per task; cropped [:r,:r] at use,
        # transformer.py:864-867 — identity crop == cropped identity)
        eye = jnp.broadcast_to(jnp.eye(rc, dtype=jnp.float32), (L, T, 2, rc, rc))
        return {"scale": eye}

    def extra_mvars(self):
        d, L, T = self.embed_dim, self.depth, self.task_num
        rc, rr = self.scale_rank_cap, self.route_rank_cap
        return {
            "merged_delta": jnp.zeros((L, d, 3 * d), jnp.float32),
            "tr_space": jnp.zeros((L, T, 2, rc, d), jnp.float32),
            "tr_mask": jnp.zeros((L, T, 2), jnp.float32),
            "route_space": jnp.zeros((L, T, d, rr), jnp.float32),
            "route_mask": jnp.zeros((T,), jnp.float32),
            "cur_expert": jnp.zeros((), jnp.int32),
        }

    def transform_grads(self, grads, state):
        # single (rebased) A/B pair: A frozen, B fully trainable every task
        # (reference unfreezes every "lora_B" name, MInfLoRA2.py:238-241);
        # scale trains only for the current task
        grads = jax.tree_util.tree_map(lambda x: x, grads)
        lora = dict(grads["lora"])
        for key in list(lora.keys()):
            if key.startswith("A_"):
                lora[key] = jnp.zeros_like(lora[key])
        grads["lora"] = lora
        onehot = state.mvars["train_onehot"]
        grads["scale"] = grads["scale"] * onehot[None, :, None, None, None]
        return grads

    # -- forward ----------------------------------------------------------------

    def _plain_deltas(self, lora, mvars):
        """Stream-1 deltas: folded past tasks + current B@A on k/v
        (transformer.py:831-835 with merged base)."""
        d = self.embed_dim
        deltas = {}
        slot_off = {"q": 0, "k": 1, "v": 2}
        for layer in range(self.depth):
            delta = mvars["merged_delta"][layer]
            for slot in self.lora_slots:
                dw = (lora[f"B_{slot}"][layer] @ lora[f"A_{slot}"][layer]).T
                off = slot_off[slot] * d
                delta = delta.at[:, off:off + d].add(dw)
            deltas[layer] = delta
        return deltas

    def _scaled_delta(self, params, mvars, layer, expert, base_delta):
        """Stream-2 delta: apply the expert's enabled trust-region scalings
        to the (base + lora) k/v weights (transformer.py:859-872)."""
        d = self.embed_dim
        frozen_qkv = mvars["frozen"][f"block_{layer}"]["attn"]["qkv"][
            "kernel"].astype(jnp.float32)  # (d, 3d)
        w_full = frozen_qkv + base_delta
        out = base_delta
        for slot, off in (("k", d), ("v", 2 * d)):
            w = w_full[:, off:off + d]
            for si in range(2):
                space = jnp.take(mvars["tr_space"][layer, :, si], expert, axis=0)
                scale = jnp.take(params["scale"][layer, :, si], expert, axis=0)
                on = jnp.take(mvars["tr_mask"][layer, :, si], expert)
                w2 = weight_space_scale(w, space, scale)
                w = jnp.where(on > 0, w2, w)
            out = out.at[:, off:off + d].add(w - w_full[:, off:off + d])
        return out

    def _route_expert(self, mvars, layer, x):
        """Eval-time per-layer routing (transformer.py:813-829): argmax
        over ||saved_space_t^T Gram(x)|| across created tasks."""
        xs = jax.lax.stop_gradient(x).astype(jnp.float32)
        gram = jnp.einsum("bsd,bse->de", xs, xs) / (x.shape[0] * x.shape[1])
        spaces = mvars["route_space"][layer]  # (T, d, rr)
        proj = jnp.einsum("tdr,de->tre", spaces, gram)
        norms = jnp.sqrt(jnp.sum(proj * proj, axis=(1, 2)))
        norms = jnp.where(mvars["route_mask"] > 0, norms, -jnp.inf)
        return jnp.argmax(norms)

    def vit_features(self, params, mvars, x, train, capture=False):
        deltas = self._plain_deltas(params["lora"], mvars)
        cur = mvars["cur_expert"]

        def delta2_fn(layer, xs):
            if train:
                expert = cur  # observe() passes the current task id
            else:
                expert = self._route_expert(mvars, layer, xs)
            return self._scaled_delta(params, mvars, layer, expert,
                                      deltas[layer])

        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=deltas, capture=capture, dual_delta_fn=delta2_fn,
        )

    # -- task boundaries ---------------------------------------------------------

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        mvars = dict(state.mvars)
        mvars["cur_expert"] = jnp.asarray(task_idx, jnp.int32)
        state = state.replace(mvars=mvars)
        covs = self.task_grams(state, task_data)

        # TRGP top-1 trust region among prior tasks (MInfLoRA2.py:193-210)
        tr_space = np.array(state.mvars["tr_space"])
        tr_mask = np.array(state.mvars["tr_mask"])
        for layer in range(self.depth):
            mat = covs[layer]
            mat_norm = np.linalg.norm(mat)
            best, best_norm = -1, -np.inf
            for t in range(task_idx):
                f = self._feature_each_task[t][layer]
                if f.size == 0:
                    continue
                pn = np.linalg.norm(f @ (f.T @ mat))
                if pn > EPSILON * mat_norm and pn > best_norm:
                    best, best_norm = t, pn
            if best >= 0:
                f = self._feature_each_task[best][layer]
                tr_space[layer, task_idx, 0] = _pad_cols(
                    f, self.scale_rank_cap).T
                tr_mask[layer, task_idx, 0] = 1.0

        # rebase A from the DualGPM-projected covariance (MInfLoRA2.py:212-236)
        lora = {k: np.array(v) for k, v in state.params["lora"].items()}
        for layer in range(self.depth):
            cur = covs[layer]
            if task_idx > 0:
                fl = self._feature_list[layer]
                m = fl @ fl.T
                cur = cur - m @ cur if self._project_type[layer] == "remove" else m @ cur
            u, _, _ = np.linalg.svd(cur, full_matrices=False)
            a = (u[:, : self.rank].T / math.sqrt(3)).astype(np.float32)
            for slot in self.lora_slots:
                lora[f"A_{slot}"][layer] = a
                lora[f"B_{slot}"][layer] = 0.0
        params = dict(state.params)
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        mvars = dict(state.mvars)
        mvars["tr_space"] = jnp.asarray(tr_space)
        mvars["tr_mask"] = jnp.asarray(tr_mask)
        return state.replace(params=params, mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        # merge_weight: fold B@A into the persistent delta
        # (transformer.py:228-234 folds into qkv.weight)
        lora = {k: np.array(v) for k, v in state.params["lora"].items()}
        merged = np.array(state.mvars["merged_delta"])
        d = self.embed_dim
        slot_off = {"k": d, "v": 2 * d}
        for layer in range(self.depth):
            for slot in self.lora_slots:
                dw = (lora[f"B_{slot}"][layer] @ lora[f"A_{slot}"][layer]).T
                off = slot_off[slot]
                merged[layer, :, off:off + d] += dw
                lora[f"B_{slot}"][layer] = 0.0
        params = dict(state.params)
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        mvars = dict(state.mvars)
        mvars["merged_delta"] = jnp.asarray(merged)
        state = state.replace(params=params, mvars=mvars)

        # DualGPM feature update (delta-stack variant) + per-task directions
        covs = self.task_grams(state, task_data)
        threshold = (self.lame - self.lamb) * task_idx / self.task_num + self.lamb
        each = masked_gpm_update(self._feature_list, self._project_type,
                                 covs, threshold)
        self._feature_each_task.append(each)

        # saved routing spaces at threshold lamb (MInfLoRA2.py:255-280) —
        # reuse covs: masked_gpm_update does not mutate the Gram list, so a
        # second full-dataset pass would be bit-identical
        route = np.array(state.mvars["route_space"])
        rmask = np.array(state.mvars["route_mask"])
        for layer in range(self.depth):
            u, s, _ = np.linalg.svd(covs[layer], full_matrices=False)
            ratio = np.cumsum(s ** 2) / np.sum(s ** 2)
            r = max(int(np.sum(ratio < self.lamb)), 1)
            route[layer, task_idx] = _pad_cols(u[:, :r], self.route_rank_cap)
        rmask[task_idx] = 1.0
        mvars = dict(state.mvars)
        mvars["route_space"] = jnp.asarray(route)
        mvars["route_mask"] = jnp.asarray(rmask)
        return state.replace(mvars=mvars)


# --------------------------------------------------------------------------
# MInfLoRA3 (v3)
# --------------------------------------------------------------------------


@METHODS.register("MInfLoRA3")
class MInfLoRA3(_MaskedLoRABase):
    """Per-task K/V LoRA lists + per-task diagonal trust-region scaling
    (reference MInfLoRA3.py + MultiMaskedLoRA3)."""

    validate_enabled = False  # reference trainer.py:367-377

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.space_rank = int(self.kwargs.get("space_rank", self.embed_dim))

    def init_lora_params(self, rng) -> Dict[str, Any]:
        d, r, T, L = self.embed_dim, self.rank, self.task_num, self.depth
        p = {}
        # kaiming_uniform(a=sqrt(5)) on a (r, d) linear weight == U(-b, b),
        # b = sqrt(6 / ((1+5) * d)) = 1/sqrt(d) (transformer.py:1072-1075);
        # the reference's SVD re-init lands in an unused twin module, so the
        # kaiming values are what the forward actually uses (see module
        # docstring)
        ks = jax.random.split(rng, 2 * len(self.lora_slots))
        bound = 1.0 / math.sqrt(d)
        for i, slot in enumerate(self.lora_slots):
            p[f"A_{slot}"] = jax.random.uniform(
                ks[i], (L, T, r, d), jnp.float32, -bound, bound)
            p[f"B_{slot}"] = jnp.zeros((L, T, d, r), jnp.float32)
        return p

    def extra_params(self, rng):
        L, T, rs = self.depth, self.task_num, self.space_rank
        # diagonal of the per-task scale (the live scalee ladder ends at
        # Q-diagonal scaling, transformer.py:1204-1207; identity init)
        return {"scale_diag": jnp.ones((L, T, rs), jnp.float32)}

    def extra_mvars(self):
        d, L, T, rs = self.embed_dim, self.depth, self.task_num, self.space_rank
        return {
            "space_k": jnp.zeros((L, T, rs, d), jnp.float32),
            "space_v": jnp.zeros((L, T, rs, d), jnp.float32),
            "space_mask": jnp.zeros((T,), jnp.float32),
        }

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)
        onehot = state.mvars["train_onehot"]
        grads["scale_diag"] = grads["scale_diag"] * onehot[None, :, None]
        return grads

    def qkv_deltas(self, lora, active):
        raise NotImplementedError  # needs scale params; see vit_features

    def vit_features(self, params, mvars, x, train, capture=False):
        lora, active = params["lora"], mvars["active"]
        d = self.embed_dim
        frozen = mvars["frozen"]
        deltas = {}
        for layer in range(self.depth):
            base = frozen[f"block_{layer}"]["attn"]["qkv"]["kernel"].astype(
                jnp.float32)
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot, off, sp_key in (("k", d, "space_k"), ("v", 2 * d, "space_v")):
                # running weight: base + sum of active experts' B@A, with the
                # per-task scaling applied INSIDE the task loop
                # (transformer.py:1187-1222: k_weight evolves task by task)
                w = base[:, off:off + d]

                def body(t, w):
                    dw = (lora[f"B_{slot}"][layer, t] @ lora[f"A_{slot}"][layer, t]).T
                    w = w + active[t] * dw
                    s = mvars[sp_key][layer, t]          # (rs, d)
                    q = params["scale_diag"][layer, t]    # (rs,)
                    # W' = W - W S^T S + W S^T diag(q) S  (torch orient.)
                    #   => jax orient.: W' = W + S^T (diag(q) - I) S @ W
                    m = s.T @ ((q - 1.0)[:, None] * s)
                    on = active[t] * mvars["space_mask"][t]
                    return jnp.where(on > 0, w + m @ w, w)

                w = jax.lax.fori_loop(0, self.task_num, body, w)
                delta = delta.at[:, off:off + d].set(w - base[:, off:off + d])
            deltas[layer] = delta
        return self.backbone.apply(
            {"params": frozen}, x, train=train,
            qkv_deltas=deltas, capture=capture,
        )

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        # (no covariance pass here: the space init below uses only the
        # accumulated feature list + frozen weights — the reference's
        # consumer of a before-task covariance is the dead SVD write
        # documented in the module docstring)
        if task_idx > 0:
            # spaces from SVD(F F^T - W F F^T) per slot (MInfLoRA3.py
            # before_task; target_shape=768, /sqrt(3))
            frozen = state.mvars["frozen"]
            sk = np.array(state.mvars["space_k"])
            sv = np.array(state.mvars["space_v"])
            d = self.embed_dim
            for layer in range(self.depth):
                fl = self._feature_list[layer]
                fm = fl @ fl.T
                qkv = np.asarray(
                    frozen[f"block_{layer}"]["attn"]["qkv"]["kernel"],
                    np.float32).astype(np.float64)
                for slot, off, arr in (("k", d, sk), ("v", 2 * d, sv)):
                    w_t = qkv[:, off:off + d].T  # torch orientation (out, in)
                    mat = fm - w_t @ fm
                    u, _, _ = np.linalg.svd(mat, full_matrices=False)
                    arr[layer, task_idx] = (
                        u[:, : self.space_rank].T / math.sqrt(3)
                    ).astype(np.float32)
            mvars = dict(state.mvars)
            mvars["space_k"] = jnp.asarray(sk)
            mvars["space_v"] = jnp.asarray(sv)
            mask = np.array(state.mvars["space_mask"])
            mask[task_idx] = 1.0
            mvars["space_mask"] = jnp.asarray(mask)
            state = state.replace(mvars=mvars)
        return state

    def after_task(self, state, task_idx, task_data):
        covs = self.task_grams(state, task_data)
        threshold = (self.lame - self.lamb) * task_idx / self.task_num + self.lamb
        masked_gpm_update(self._feature_list, self._project_type, covs,
                          threshold)
        return state
