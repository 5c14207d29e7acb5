"""Prompt-based CL methods on a frozen ViT: L2P, DualPrompt, CODA-Prompt.

Capability parity:
  * L2P (reference core/model/l2p.py + backbone/prompt.py:346-406): top-k
    key-matched prompt pool with batchwise-majority selection, prompts
    prepended at layer 0, prompt-mean readout, CE masked to the current
    task's classes minus ``pull_constraint_coeff * reduce_sim``, grad-norm
    clip 1.0;
  * DualPrompt (reference dualprompt.py + prompt.py:231-345): shared
    g-prompts (layers 0-1) + task-keyed e-prompts (layers 2-4) as prefix
    K/V, task-id bootstrapped at train with matching loss
    ``sum(1 - cos_sim[:, task])``, top-1 key match at eval;
  * CODA-Prompt (reference codaprompt.py + prompt.py:37-229):
    attention-composed prompt components over layers 0-4 with per-task
    Gram-Schmidt re-orthogonalized slices, past components frozen by
    stop-gradient, ortho penalty ``mu``.

TPU re-design: the frozen ViT's parameters live in ``mvars`` (no gradients
allocated for 86M frozen weights — only prompts + head train); pool selection
is one-hot/top-k arithmetic (no host sync); CODA's past-component freeze is a
mask + ``stop_gradient`` blend so the whole task sequence reuses one compiled
train step; Gram-Schmidt runs host-side at task boundaries (numpy QR).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.methods.common import normalized
from libcontinual_tpu.registry import METHODS


class PromptViTMethod(Method):
    """Shared machinery: frozen ViT in mvars, trainable head + prompt params,
    grad clip 1.0 (reference l2p.py:104)."""

    concat_buffer = False
    #: the reference prompt ViT (backbone/vit.py ViTZoo) is built on
    #: transformer.py's CLIP-style ResidualAttentionBlock — torch-default
    #: LayerNorm eps 1e-5 in blocks (final norm stays timm 1e-6);
    #: DAP overrides to 1e-6 (its reference vit_dap.py is a timm fork)
    block_ln_eps = 1e-5

    def __init__(self, config, mesh_ctx=None):
        bk = config["backbone"].setdefault("kwargs", {})
        if bk is None:
            bk = config["backbone"]["kwargs"] = {}
        bk.setdefault("block_ln_eps", self.block_ln_eps)
        super().__init__(config, mesh_ctx)
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), self.tx)
        if self.init_tx is not None:
            self.init_tx = optax.chain(optax.clip_by_global_norm(1.0), self.init_tx)
        self.embed_dim = int(self.kwargs.get("feat_dim", 768))

    def init_prompt_params(self, rng) -> Dict[str, Any]:
        raise NotImplementedError

    def init_state(self, rng, sample_input_hw):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        dummy = self.model_input(sample_input_hw)
        vit_vars = dict(self.backbone.init(k1, dummy, train=False))
        from libcontinual_tpu.models.vit import maybe_load_pretrained

        vit_vars["params"] = maybe_load_pretrained(vit_vars["params"], self.config)
        from libcontinual_tpu.models.heads import LinearHead

        self._head = LinearHead(self.num_class)
        head_params = self._head.init(
            k2, jnp.zeros((2, self.embed_dim), jnp.float32)
        )["params"]
        params = {"head": head_params, "prompt": self.init_prompt_params(k3)}
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        # frozen weights never update: store them in the compute dtype (bf16)
        # to kill the per-step f32->bf16 casts and halve weight HBM traffic
        frozen = jax.tree_util.tree_map(
            lambda p: p.astype(self.dtype), vit_vars["params"]
        )
        mvars = {"model_state": {}, "frozen": frozen}
        mvars.update(self.extra_mvars())
        return TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
            rng=k4,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    def extra_mvars(self) -> Dict[str, Any]:
        return {}

    def vit_apply(self, frozen_params, x, **kw):
        return self.backbone.apply({"params": frozen_params}, x, **kw)

    def frozen_query(self, frozen_params, x):
        """First pass: cls feature of the un-prompted frozen ViT
        (reference vit.py:104-106, stop-gradient)."""
        out = self.vit_apply(frozen_params, x, train=False)
        return jax.lax.stop_gradient(out["features"])

    def cur_class_mask(self, state):
        return state.seen_mask - state.prev_mask

    def eval_logits(self, state, x, task_id):
        out = self.forward_logits(state.params, state, x, train=False)
        # subclasses return either bare logits (DAP) or (logits, aux);
        # indexing a bare array with [0] would silently take batch row 0
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)

    def forward_logits(self, params, state, x, train):
        raise NotImplementedError


# --------------------------------------------------------------------- L2P


def l2p_pool_forward(pool, cls_feat, top_k, weight=None):
    """Reference prompt.py:369-406: top-k key match + batchwise-majority
    prompt selection; returns (batched_prompt (B, k*len, D), reduce_sim)."""
    keys_n = normalized(pool["key"])  # (M, D)
    q_n = normalized(cls_feat)  # (B, D)
    sim = q_n @ keys_n.T  # (B, M)
    _, idx = jax.lax.top_k(sim, top_k)  # (B, k)
    onehot = jax.nn.one_hot(idx, pool["key"].shape[0])  # (B, k, M)
    if weight is not None:
        onehot = onehot * weight[:, None, None]
    counts = jnp.sum(onehot, axis=(0, 1))  # (M,)
    _, major = jax.lax.top_k(counts, top_k)  # (k,)
    sel = pool["prompt"][major]  # (k, len, D)
    b = cls_feat.shape[0]
    batched = jnp.broadcast_to(
        sel.reshape(1, -1, sel.shape[-1]), (b, top_k * sel.shape[1], sel.shape[-1])
    )
    key_sel = keys_n[major]  # (k, D)
    pull = jnp.sum(key_sel[None, :, :] * q_n[:, None, :], axis=-1)  # (B, k)
    if weight is not None:
        reduce_sim = jnp.sum(pull * weight[:, None]) / jnp.maximum(jnp.sum(weight), 1.0)
    else:
        reduce_sim = jnp.sum(pull) / b
    return batched, reduce_sim


@METHODS.register("L2P")
class L2P(PromptViTMethod):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.pool_size = int(self.kwargs.get("pool_size", 10))
        self.length = int(self.kwargs.get("prompt_length", 5))
        self.top_k = int(self.kwargs.get("top_k", 5))
        self.coeff = float(self.kwargs.get("pull_constraint_coeff", 0.1))

    def init_prompt_params(self, rng):
        k1, k2 = jax.random.split(rng)
        init = jax.nn.initializers.uniform(scale=1.0)
        return {
            "prompt": init(k1, (self.pool_size, self.length, self.embed_dim)),
            "key": init(k2, (self.pool_size, self.embed_dim)),
        }

    def forward_logits(self, params, state, x, train, weight=None):
        frozen = state.mvars["frozen"]
        cls_feat = self.frozen_query(frozen, x)
        prompts, reduce_sim = l2p_pool_forward(
            params["prompt"], cls_feat, self.top_k, weight
        )
        out = self.vit_apply(
            frozen, x, train=train, prepend_tokens=prompts, feature_mode="prompt_mean"
        )
        logits = self._head.apply({"params": params["head"]}, out["features"])
        return logits, reduce_sim

    def loss(self, params, state, batch, rng):
        w = batch.get("weight")
        logits, reduce_sim = self.forward_logits(
            params, state, batch["x"], train=True, weight=w
        )
        masked = jnp.where(self.cur_class_mask(state)[None, :] > 0, logits, -jnp.inf)
        ce = masked_cross_entropy(masked, batch["label"], w)
        return ce - self.coeff * reduce_sim, {"logits": masked, "model_state": {}}


# --------------------------------------------------------------- DualPrompt


@METHODS.register("DualPrompt")
class DualPrompt(PromptViTMethod):
    G_LAYERS = (0, 1)
    E_LAYERS = (2, 3, 4)

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.e_len = int(self.kwargs.get("e_prompt_length", 20))
        self.g_len = int(self.kwargs.get("g_prompt_length", 6))
        self.pool_size = int(self.kwargs.get("pool_size", 10))
        # prompts split into k/v halves (reference prompt.py:300 does the
        # same int(length/2) split); odd lengths would give mismatched
        # prefix-K/V token counts there too
        if self.e_len % 2 or self.g_len % 2:
            raise ValueError(
                "DualPrompt e_prompt_length/g_prompt_length must be even "
                f"(got e={self.e_len}, g={self.g_len}): each prompt is "
                "split into equal K and V halves"
            )

    def init_prompt_params(self, rng):
        init = jax.nn.initializers.uniform(scale=1.0)
        keys = jax.random.split(rng, len(self.G_LAYERS) + 2 * len(self.E_LAYERS))
        p: Dict[str, Any] = {}
        ki = 0
        for g in self.G_LAYERS:
            p[f"g_p_{g}"] = init(keys[ki], (self.g_len, self.embed_dim))
            ki += 1
        for e in self.E_LAYERS:
            p[f"e_p_{e}"] = init(keys[ki], (self.pool_size, self.e_len, self.embed_dim))
            p[f"e_k_{e}"] = init(keys[ki + 1], (self.pool_size, self.embed_dim))
            ki += 2
        return p

    def _prefixes(self, prompt, q, task, train, weight=None):
        """Build per-layer (pk, pv) prefixes + matching loss
        (reference prompt.py:269-345)."""
        b = q.shape[0]
        prefix_kv = {}
        match_loss = 0.0
        q_n = jax.lax.stop_gradient(normalized(q))
        for g in self.G_LAYERS:
            gp = prompt[f"g_p_{g}"]  # (g_len, D)
            half = self.g_len // 2
            gk = jnp.broadcast_to(gp[None, :half], (b, half, self.embed_dim))
            gv = jnp.broadcast_to(gp[None, half:], (b, self.g_len - half, self.embed_dim))
            prefix_kv[g] = (gk, gv)
        for e in self.E_LAYERS:
            K = prompt[f"e_k_{e}"]
            P = prompt[f"e_p_{e}"]
            cos = q_n @ normalized(K).T  # (B, pool)
            if train:
                sel = jnp.take(P, task, axis=0)  # (e_len, D)
                selP = jnp.broadcast_to(sel[None], (b,) + sel.shape)
                per = 1.0 - cos[:, :]  # (B, pool)
                picked = jnp.take_along_axis(
                    per, jnp.full((b, 1), task, jnp.int32), axis=1
                )[:, 0]
                if weight is not None:
                    match_loss = match_loss + jnp.sum(picked * weight)
                else:
                    match_loss = match_loss + jnp.sum(picked)
            else:
                idx = jnp.argmax(cos, axis=1)  # (B,)
                selP = jnp.take(P, idx, axis=0)  # (B, e_len, D)
            half = self.e_len // 2
            prefix_kv[e] = (selP[:, :half], selP[:, half:])
        return prefix_kv, match_loss

    def forward_logits(self, params, state, x, train, weight=None):
        frozen = state.mvars["frozen"]
        q = self.frozen_query(frozen, x)
        prefix_kv, match_loss = self._prefixes(
            params["prompt"], q, state.task, train, weight
        )
        out = self.vit_apply(frozen, x, train=train, prefix_kv=prefix_kv)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        return logits, match_loss

    def loss(self, params, state, batch, rng):
        w = batch.get("weight")
        logits, match_loss = self.forward_logits(
            params, state, batch["x"], train=True, weight=w
        )
        masked = jnp.where(state.prev_mask[None, :] > 0, -jnp.inf, logits)
        ce = masked_cross_entropy(masked, batch["label"], w, state.seen_mask)
        return ce + match_loss, {"logits": masked, "model_state": {}}


# -------------------------------------------------------------- CODA-Prompt


def _gram_schmidt_block(mat: np.ndarray, s: int, f: int, rng: np.random.RandomState):
    """Re-init rows [s:f) orthonormal to rows [0:s) (reference
    prompt.py:100-156, which redraws random vectors and orthogonalizes)."""
    m = mat.reshape(mat.shape[0], -1).astype(np.float64)
    for k in range(s, f):
        while True:
            v = rng.randn(m.shape[1])
            for j in range(k):
                u = m[j]
                den = u @ u
                if den > 1e-8:
                    v = v - (v @ u) / den * u
            n = np.linalg.norm(v)
            if n > 1e-8:
                m[k] = v / n
                break
    return m.reshape(mat.shape).astype(np.float32)


@METHODS.register("CodaPrompt")
class CodaPrompt(PromptViTMethod):
    E_LAYERS = (0, 1, 2, 3, 4)

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.pool_size = int(self.kwargs.get("pool_size", 100))
        self.length = int(self.kwargs.get("prompt_length", 8))
        self.mu = float(self.kwargs.get("mu", 0.0))
        self.key_d = self.embed_dim
        if self.length % 2:
            raise ValueError(
                f"CodaPrompt prompt_length must be even (got {self.length}): "
                "composed prompts split into equal K and V halves "
                "(reference prompt.py:199)"
            )

    def init_prompt_params(self, rng):
        p: Dict[str, Any] = {}
        r = np.random.RandomState(0)
        for e in self.E_LAYERS:
            p[f"e_p_{e}"] = jnp.asarray(
                _gram_schmidt_block(
                    r.randn(self.pool_size, self.length, self.embed_dim).astype(np.float32),
                    0, self.pool_size // self.task_num, r,
                )
            )
            p[f"e_k_{e}"] = jnp.asarray(
                _gram_schmidt_block(
                    r.randn(self.pool_size, self.key_d).astype(np.float32),
                    0, self.pool_size // self.task_num, r,
                )
            )
            p[f"e_a_{e}"] = jnp.asarray(
                _gram_schmidt_block(
                    r.randn(self.pool_size, self.key_d).astype(np.float32),
                    0, self.pool_size // self.task_num, r,
                )
            )
        return p

    def before_task(self, state, task_idx, task_data):
        if task_idx == 0:
            return state
        pt = self.pool_size // self.task_num
        s, f = task_idx * pt, (task_idx + 1) * pt
        rng = np.random.RandomState(task_idx)
        prompt = dict(state.params["prompt"])
        for e in self.E_LAYERS:
            for nm in (f"e_p_{e}", f"e_k_{e}", f"e_a_{e}"):
                prompt[nm] = jnp.asarray(
                    _gram_schmidt_block(np.array(prompt[nm]), s, f, rng)
                )
        params = dict(state.params)
        params["prompt"] = prompt
        return state.replace(params=params)

    def _component_masks(self, task):
        pt = self.pool_size // self.task_num
        idx = jnp.arange(self.pool_size)
        s = task * pt
        f = (task + 1) * pt
        frozen = (idx < s).astype(jnp.float32)  # stop-grad components
        valid = (idx < f).astype(jnp.float32)
        return frozen[:, None], valid[:, None], f.astype(jnp.float32)

    def _layer_prompt(self, prompt, e, q, frozen_m, valid_m, train):
        K = prompt[f"e_k_{e}"]
        A = prompt[f"e_a_{e}"]
        P = prompt[f"e_p_{e}"]
        if train:
            blend = lambda t: jax.lax.stop_gradient(t) * frozen_m.reshape(
                (-1,) + (1,) * (t.ndim - 1)
            ) + t * (1 - frozen_m.reshape((-1,) + (1,) * (t.ndim - 1)))
            K, A, P = blend(K), blend(A), blend(P)
        a_query = jnp.einsum("bd,kd->bkd", q, A)
        aq_k = jnp.einsum("bkd,kd->bk", normalized(a_query, axis=2), normalized(K))
        aq_k = aq_k * valid_m[:, 0][None, :]
        P_ = jnp.einsum("bk,kld->bld", aq_k, P)
        half = self.length // 2
        return (P_[:, :half], P_[:, half:]), (K, A, P)

    def _ortho(self, M, valid_m, f):
        Mv = M.reshape(M.shape[0], -1) * valid_m
        G = Mv @ Mv.T
        I = jnp.diag(valid_m[:, 0])
        return jnp.sum((G - I) ** 2) / jnp.maximum(f * f, 1.0)

    def forward_logits(self, params, state, x, train, weight=None):
        frozen = state.mvars["frozen"]
        q = self.frozen_query(frozen, x)
        frozen_m, valid_m, f = self._component_masks(state.task)
        prefix_kv = {}
        ortho = 0.0
        for e in self.E_LAYERS:
            pkv, (K, A, P) = self._layer_prompt(
                params["prompt"], e, q, frozen_m, valid_m, train
            )
            prefix_kv[e] = pkv
            if train and self.mu > 0:
                ortho = ortho + self.mu * (
                    self._ortho(K, valid_m, f)
                    + self._ortho(A, valid_m, f)
                    + self._ortho(P, valid_m, f)
                )
        out = self.vit_apply(frozen, x, train=train, prefix_kv=prefix_kv)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        return logits, ortho

    def loss(self, params, state, batch, rng):
        w = batch.get("weight")
        logits, ortho = self.forward_logits(
            params, state, batch["x"], train=True, weight=w
        )
        masked = jnp.where(state.prev_mask[None, :] > 0, -jnp.inf, logits)
        ce = masked_cross_entropy(masked, batch["label"], w, state.seen_mask)
        return ce + ortho, {"logits": masked, "model_state": {}}
