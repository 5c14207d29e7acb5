"""RanPAC — Random Projections and Pre-trained Models for CL
(McDonnell et al., NeurIPS 2023).

Parity with reference core/model/ranpac.py:
  * frozen pretrained ViT with parallel MLP adapters, trained only in the
    first session (ranpac.py:176-180);
  * after every task, features of the task's data pass through a frozen
    random projection ``h = relu(f @ W_rand)`` (M = 10000) and accumulate the
    Gram/label statistics ``G += h h^T``, ``Q += h y^T`` (ranpac.py:218-227);
  * ridge parameter swept over ``10**np.arange(-8, 9)`` by held-out
    validation MSE on the current task's features: fit on the first 80 %,
    score MSE on the remaining 20 % (ranpac.py:253-263); classifier
    ``Wo = (G + lam I)^-1 Q`` with the accumulated stats (ranpac.py:265-266);
    inference is ``h @ Wo``.

TPU re-design: accumulation is a jitted einsum pass; the M x M solve uses
``jnp.linalg.solve`` on device.  The 80/20 sweep never materialises the
feature matrix: the held-out MSE is closed-form in second-moment statistics,
``mean((H_ho Wo - Y_ho)^2) = (tr(Wo^T G_ho Wo) - 2 tr(Wo^T Q_ho)
+ ||Y_ho||^2) / (n_ho * C)``, so the pass accumulates (Q_fit, G_fit) and
(Q_ho, G_ho, ||Y_ho||^2, n_ho) alongside the global (Q, G).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.registry import METHODS

RIDGE_GRID = tuple(10.0**p for p in range(-8, 9))  # reference ranpac.py:253


@jax.jit
def _holdout_mse(lam, Qf, Gf, Qh, Gh, ysq, n_ho, num_class):
    eye = jnp.eye(Gf.shape[0], dtype=Gf.dtype)
    Wo = jnp.linalg.solve(Gf + lam * eye, Qf)
    sse = jnp.sum((Gh @ Wo) * Wo) - 2.0 * jnp.sum(Wo * Qh) + ysq
    return sse / jnp.maximum(n_ho * num_class, 1.0)


@jax.jit
def _ridge_solve(G, Q, lam):
    return jnp.linalg.solve(G + lam * jnp.eye(G.shape[0], dtype=G.dtype), Q)


def ridge_sweep(Qf, Gf, Qh, Gh, ysq, n_ho, num_class):
    """Pick the ridge lambda by held-out MSE (reference ranpac.py:253-263).

    Fits ``Wo = (G_fit + lam I)^-1 Q_fit`` per lambda and scores the held-out
    split via the closed form
    ``mean((H_ho Wo - Y_ho)^2) = (tr(Wo^T G_ho Wo) - 2 tr(Wo^T Q_ho)
    + ||Y_ho||^2) / (n_ho * C)`` — identical to the reference's explicit
    prediction MSE, without materialising features.  Returns (lam, errs).
    The jitted solver is module-level, so the M x M programs compile once
    per process, not once per task.
    """
    errs = [
        float(_holdout_mse(
            jnp.float32(lam), Qf, Gf, Qh, Gh, ysq, n_ho,
            jnp.float32(num_class),
        ))
        for lam in RIDGE_GRID
    ]
    return RIDGE_GRID[int(np.argmin(errs))], errs


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
        # first-session-only training; first_session_epochs overrides the
        # trainer's epoch count for session 0 (reference ranpac.py:176-180)
        return self.first_session_epochs if task_idx == 0 else 0

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
            params, state.mvars["model_state"], batch["x"], train=True, rng=rng
        )
        ce = masked_cross_entropy(
            logits, batch["label"], batch.get("weight"), state.seen_mask
        )
        masked = jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
        return ce, {"logits": masked, "model_state": new_model_state}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        M, C = self.M, self.num_class
        zQ = jnp.zeros((M, C), jnp.float32)
        zG = jnp.zeros((M, M), jnp.float32)
        # (Q_fit, G_fit, Q_ho, G_ho, ||Y_ho||^2, n_ho) for the current task
        carry = (zQ, zG, zQ, zG, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

        accum = getattr(self, "_accum_jit", None)
        if accum is None:
            # jitted once per method instance — the M x M Gram einsum would
            # otherwise recompile at every task boundary

            @jax.jit
            def accum(state, carry, images, labels, weight, offset):
                Qf, Gf, Qh, Gh, ysq, nh = carry
                x = self.augment(None, images, train=False)
                out, _ = self.apply_backbone(
                    state.params, state.mvars["model_state"], x, train=False
                )
                h = (jax.nn.relu(out["features"] @ state.mvars["W_rand"])
                     * weight[:, None])
                y = jax.nn.one_hot(labels, C) * weight[:, None]
                # 80/20 fit/held-out split by global sample position (the
                # reference splits the shuffled loader order 80/20,
                # ranpac.py:254-258 — position-hashing is the same statistics
                # without materialising the feature matrix)
                idx = offset + jnp.arange(h.shape[0])
                hold = ((idx % 5) == 0).astype(jnp.float32) * weight
                fit = weight - hold
                hf, yf = h * fit[:, None], y * fit[:, None]
                hh, yh = h * hold[:, None], y * hold[:, None]
                return (
                    Qf + hf.T @ yf,
                    Gf + hf.T @ hf,
                    Qh + hh.T @ yh,
                    Gh + hh.T @ hh,
                    ysq + jnp.sum(yh**2),
                    nh + jnp.sum(hold),
                )

            self._accum_jit = accum

        offset = 0
        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            carry = accum(state, carry, im, lb, w, jnp.int32(offset))
            offset += int(im.shape[0])

        Qf, Gf, Qh, Gh, ysq, nh = carry
        Q = state.mvars["Q"] + Qf + Qh
        G = state.mvars["G"] + Gf + Gh

        best_lam, _ = ridge_sweep(Qf, Gf, Qh, Gh, ysq, nh, C)

        mvars = dict(state.mvars)
        mvars["Q"], mvars["G"] = Q, G
        mvars["Wo"] = _ridge_solve(G, Q, jnp.float32(best_lam))
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
