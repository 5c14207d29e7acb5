"""DAP — Dynamically Anchored Prompting for task-imbalanced CL
(Hong et al., IJCAI 2024).

Parity with reference core/model/dap.py + backbone/prompt.py:409-497:
  * per-task prompts + one general prompt prepended to the frozen ViT's
    tokens (prompt.py:428-497);
  * the general prompt is anchored between the newest task prompt
    (plasticity term, ``1 - cos(g, t_cur)``) and a data-count-weighted
    prompt center (stability term), mixed by
    ``alpha = (n_last - n_min)/(n_max - n_min)`` (dap.py:88-103, 151-199);
  * CE masked to the current task's classes (dap.py:77-85); inference uses
    the general prompt (dap.py:119-131);
  * trained on long-tailed task streams (``imb_type``/``imb_factor`` configs,
    handled by the data pipeline's ImbalancedDatasets equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.methods.prompt_methods import PromptViTMethod
from libcontinual_tpu.registry import METHODS


@METHODS.register("DAP")
class DAP(PromptViTMethod):
    block_ln_eps = 1e-6  # reference vit_dap.py is a timm fork

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.length = int(self.kwargs.get("length", 5))
        self.top_k = int(self.kwargs.get("top_k", 1))
        self._task_counts = []

    def init_prompt_params(self, rng):
        k1, k2 = jax.random.split(rng)
        init = jax.nn.initializers.uniform(scale=2.0)
        p = self.top_k * self.length
        return {
            "taskprompt": init(k1, (self.task_num, p, self.embed_dim)) - 1.0,
            "generalprompt": init(k2, (p, self.embed_dim)) - 1.0,
        }

    def extra_mvars(self):
        return {"alpha": jnp.zeros((), jnp.float32),
                "prompt_center": jnp.zeros((self.top_k * self.length * self.embed_dim,), jnp.float32)}

    def before_task(self, state, task_idx, task_data):
        self._task_counts.append(len(task_data))
        counts = np.asarray(self._task_counts, np.float64)
        alpha = (counts[-1] - counts.min()) / (counts.max() - counts.min() + 1e-10)
        mvars = dict(state.mvars)
        mvars["alpha"] = jnp.asarray(alpha, jnp.float32)
        # data-count-weighted prompt center over past task prompts
        # (reference dap.py:163-178)
        if task_idx > 0:
            w = 1.0 / counts[:task_idx]
            w = w / w.sum()
            tp = np.asarray(state.params["prompt"]["taskprompt"][:task_idx])
            center = np.einsum("t,tpd->pd", w, tp).reshape(-1)
            mvars["prompt_center"] = jnp.asarray(center, jnp.float32)
        return state.replace(mvars=mvars)

    def _prompted(self, params, frozen, x, prompt_tokens, train):
        b = x.shape[0]
        toks = jnp.broadcast_to(prompt_tokens[None], (b,) + prompt_tokens.shape)
        out = self.vit_apply(
            frozen, x, train=train, prepend_tokens=toks, feature_mode="prompt_mean"
        )
        return self._head.apply({"params": params["head"]}, out["features"])

    def forward_logits(self, params, state, x, train):
        frozen = state.mvars["frozen"]
        tp = jnp.take(params["prompt"]["taskprompt"], state.task, axis=0)
        return self._prompted(params, frozen, x, tp, train)

    def loss(self, params, state, batch, rng):
        w = batch.get("weight")
        frozen = state.mvars["frozen"]
        cur_mask = self.cur_class_mask(state)

        t_logits = self.forward_logits(params, state, batch["x"], train=True)
        t_masked = jnp.where(cur_mask[None, :] > 0, t_logits, -jnp.inf)
        ce_t = masked_cross_entropy(t_masked, batch["label"], w)

        g_logits = self._prompted(
            params, frozen, batch["x"], params["prompt"]["generalprompt"], True
        )
        g_masked = jnp.where(cur_mask[None, :] > 0, g_logits, -jnp.inf)
        ce_g = masked_cross_entropy(g_masked, batch["label"], w)

        # anchoring terms (dap.py:88-103)
        g = params["prompt"]["generalprompt"].reshape(-1)
        t_cur = jax.lax.stop_gradient(
            jnp.take(params["prompt"]["taskprompt"], state.task, axis=0)
        ).reshape(-1)

        def cos_dist(a, b):
            na = jnp.linalg.norm(a) + 1e-8
            nb = jnp.linalg.norm(b) + 1e-8
            return 1.0 - jnp.dot(a, b) / (na * nb)

        pla = cos_dist(g, t_cur)
        center = state.mvars["prompt_center"]
        sta = jnp.where(state.task > 0, cos_dist(g, center), 0.0)
        alpha = state.mvars["alpha"]

        loss = ce_t + ce_g + alpha * sta + (1 - alpha) * pla
        return loss, {"logits": t_masked, "model_state": {}}

    def eval_logits(self, state, x, task_id):
        logits = self._prompted(
            state.params, state.mvars["frozen"], x,
            state.params["prompt"]["generalprompt"], False,
        )
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
