"""CL-LoRA — continual LoRA with task-shared + task-specific adapters and
learnable block weights (reference core/model/cl_lora.py +
backbone/vit.py:206-296, transformer.py:2302-...).

Parity:
  * two adapter streams per attention layer: a task-SHARED LoRA pair trained
    across all tasks and task-SPECIFIC stacked pairs trained only on their
    task (cl_lora.py:53-113); learnable per-block routing weights mix the
    two streams' weight deltas;
  * knowledge distillation (T=2, ratio 5) between the current shared stream
    and the previous task's frozen shared snapshot (cl_lora.py:229-242),
    with the reference's row-norm gradient reweighting of the shared A
    factor applied to the KD gradient only (cl_lora.py:244-250) via a
    custom-VJP row scaler;
  * orthogonality penalty 1e-4 between the current block weights and every
    previous task's stored block weights (cl_lora.py:32-51, 252-253);
  * block-diagonal inference: per-task forwards through that task's frozen
    shared snapshot + its specific adapter, each feature scored only
    against its own task's classes with a normalized cosine product and the
    head's sigma scale (cl_lora.py:88-113, forward_diagonal);
  * cosine-similarity classifier head; CE over the current task's classes;
  * validation disabled during training (reference trainer.py:367-377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _scale_grad_rows(A, w):
    """Identity forward; backward multiplies dA's rows by ``w``. Reproduces
    the reference's in-place KD-gradient reweighting
    (cl_lora.py:244-250: grad_A *= n * |A_old rows| / sum) without a second
    backward pass."""
    return A


def _sgr_fwd(A, w):
    return A, w


def _sgr_bwd(w, g):
    return (g * w[..., :, None], jnp.zeros_like(w))


_scale_grad_rows.defvjp(_sgr_fwd, _sgr_bwd)


def _kd_loss(pred, soft, T=2.0):
    """-softmax(soft/T) . log_softmax(pred/T), summed / batch
    (reference cl_lora.py:27-30)."""
    logp = jax.nn.log_softmax(pred / T, axis=1)
    q = jax.nn.softmax(jax.lax.stop_gradient(soft) / T, axis=1)
    return -jnp.sum(q * logp) / pred.shape[0]


@METHODS.register("CL_LoRA")
class CLLoRA(LoRAViTMethod):
    lora_slots = ("q", "v")
    validate_enabled = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.kd_ratio = float(self.kwargs.get("kd_ratio", 5.0))
        self.kd_T = float(self.kwargs.get("kd_T", 2.0))
        self.ortho_coeff = float(self.kwargs.get("ortho_coeff", 1e-4))

    def init_lora_params(self, rng):
        params = super().init_lora_params(rng)  # task-specific stacks
        d, r, L = self.embed_dim, self.rank, self.depth
        keys = jax.random.split(rng, 2 * len(self.lora_slots))
        for i, slot in enumerate(self.lora_slots):
            params[f"sharedA_{slot}"] = (
                jax.random.normal(keys[2 * i], (L, r, d)) / np.sqrt(d)
            )
            params[f"sharedB_{slot}"] = jnp.zeros((L, d, r), jnp.float32)
        return params

    def extra_params(self, rng):
        return {"block_w": jnp.zeros((self.depth, 2), jnp.float32)}

    def extra_mvars(self):
        d, r, L, T = self.embed_dim, self.rank, self.depth, self.task_num
        hist = {}
        for slot in self.lora_slots:
            hist[f"histA_{slot}"] = jnp.zeros((T, L, r, d), jnp.float32)
            hist[f"histB_{slot}"] = jnp.zeros((T, L, d, r), jnp.float32)
        hist["block_w_hist"] = jnp.zeros((T, self.depth, 2), jnp.float32)
        hist["n_hist"] = jnp.zeros((), jnp.float32)
        return hist

    def head_module(self):
        from libcontinual_tpu.models.heads import CosineLinear

        return CosineLinear(self.num_class)

    def qkv_deltas(self, lora, active):
        raise NotImplementedError  # needs block weights; see _deltas

    def _stream_deltas(self, lora, block_w, active, shared_A=None,
                       shared_B=None, shared_only=False, grad_row_w=None):
        """Merged per-layer deltas. ``shared_A/B`` override the live shared
        pair (teacher snapshots); ``shared_only`` drops the specific stream
        (KD general-stream forward); ``grad_row_w`` applies the KD gradient
        row reweighting to the shared A factor."""
        d = self.embed_dim
        bw = jax.nn.softmax(block_w, axis=-1)  # (L, 2)
        deltas = {}
        slot_off = {"q": 0, "k": 1, "v": 2}
        for layer in range(self.depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot in self.lora_slots:
                sA = (shared_A or {}).get(slot, lora[f"sharedA_{slot}"])[layer]
                sB = (shared_B or {}).get(slot, lora[f"sharedB_{slot}"])[layer]
                if grad_row_w is not None:
                    sA = _scale_grad_rows(sA, grad_row_w[slot][layer])
                shared = sB @ sA
                if shared_only:
                    dw = bw[layer, 0] * shared
                else:
                    spec = jnp.einsum(
                        "t,tdr,tre->de", active,
                        lora[f"B_{slot}"][layer], lora[f"A_{slot}"][layer],
                    )
                    dw = bw[layer, 0] * shared + bw[layer, 1] * spec
                off = slot_off[slot] * d
                delta = delta.at[:, off : off + d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def _deltas(self, params, mvars):
        return self._stream_deltas(
            params["lora"], params["block_w"], mvars["active"]
        )

    def vit_features(self, params, mvars, x, train, capture=False):
        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=self._deltas(params, mvars), capture=capture,
        )

    def transform_grads(self, grads, state):
        grads = super().transform_grads(grads, state)  # specific: cur task only
        return grads  # shared streams + block weights train every task

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        if task_idx > 0:
            # snapshot the shared stream + block weights the previous task
            # trained (reference add_adapter_to_list / block_weight_list)
            mvars = dict(state.mvars)
            for slot in self.lora_slots:
                mvars[f"histA_{slot}"] = mvars[f"histA_{slot}"].at[
                    task_idx - 1
                ].set(params["lora"][f"sharedA_{slot}"])
                mvars[f"histB_{slot}"] = mvars[f"histB_{slot}"].at[
                    task_idx - 1
                ].set(params["lora"][f"sharedB_{slot}"])
            mvars["block_w_hist"] = mvars["block_w_hist"].at[task_idx - 1].set(
                params["block_w"]
            )
            mvars["n_hist"] = jnp.asarray(float(task_idx), jnp.float32)
            state = state.replace(mvars=mvars)
        lora = {k: np.array(v) for k, v in params["lora"].items()}
        rng = np.random.RandomState(100 + task_idx)
        for slot in self.lora_slots:
            a = (rng.randn(self.rank, self.embed_dim) / np.sqrt(self.embed_dim)).astype(np.float32)
            for layer in range(self.depth):
                lora[f"A_{slot}"][layer, task_idx] = a
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        return state.replace(params=params)

    def after_task(self, state, task_idx, task_data):
        # also snapshot the CURRENT task's shared stream so block-diagonal
        # inference can rebuild every past per-task configuration
        mvars = dict(state.mvars)
        params = state.params
        for slot in self.lora_slots:
            mvars[f"histA_{slot}"] = mvars[f"histA_{slot}"].at[task_idx].set(
                params["lora"][f"sharedA_{slot}"]
            )
            mvars[f"histB_{slot}"] = mvars[f"histB_{slot}"].at[task_idx].set(
                params["lora"][f"sharedB_{slot}"]
            )
        mvars["block_w_hist"] = mvars["block_w_hist"].at[task_idx].set(
            params["block_w"]
        )
        return state.replace(mvars=mvars)

    def loss(self, params, state, batch, rng):
        out = self.vit_features(params, state.mvars, batch["x"], train=True)
        logits = self._head.apply({"params": params["head"]}, out["features"])
        cur_mask = state.seen_mask - state.prev_mask
        w = batch.get("weight")
        ce = masked_cross_entropy(logits, batch["label"], w, cur_mask)
        loss = ce

        on_kd = jnp.where(
            (state.task > 0) & (state.mvars["n_hist"] > 0), 1.0, 0.0
        )
        # KD between the current shared (general) stream and the previous
        # task's frozen shared snapshot, both through the same head
        # (reference forward_kd + _KD_loss, T=2, ratio 5). The shared-A
        # gradient rows are reweighted by the teacher A's row norms
        # (cl_lora.py:244-250) via the custom-VJP scaler.
        t_prev = jnp.maximum(state.task - 1, 0)
        teacherA = {s: state.mvars[f"histA_{s}"][t_prev] for s in self.lora_slots}
        teacherB = {s: state.mvars[f"histB_{s}"][t_prev] for s in self.lora_slots}
        row_w = {}
        for s in self.lora_slots:
            norms = jnp.linalg.norm(teacherA[s], axis=-1)  # (L, r)
            row_w[s] = (
                norms.shape[-1] * norms
                / jnp.maximum(jnp.sum(norms, axis=-1, keepdims=True), 1e-8)
            )
        new_deltas = self._stream_deltas(
            params["lora"], params["block_w"], state.mvars["active"],
            shared_only=True, grad_row_w=row_w,
        )
        teach_deltas = self._stream_deltas(
            params["lora"], state.mvars["block_w_hist"][t_prev],
            state.mvars["active"], shared_A=teacherA, shared_B=teacherB,
            shared_only=True,
        )
        f_new = self.backbone.apply(
            {"params": state.mvars["frozen"]}, batch["x"], train=False,
            qkv_deltas=new_deltas,
        )["features"]
        f_teach = self.backbone.apply(
            {"params": state.mvars["frozen"]}, batch["x"], train=False,
            qkv_deltas=jax.tree_util.tree_map(
                jax.lax.stop_gradient, teach_deltas
            ),
        )["features"]
        l_new = self._head.apply({"params": params["head"]}, f_new)
        l_teach = self._head.apply({"params": params["head"]}, f_teach)
        kd = _kd_loss(l_new, l_teach, self.kd_T)
        loss = loss + on_kd * self.kd_ratio * kd

        # orthogonality of block weights vs every stored previous task's
        # (reference compute_orthogonality_loss, coeff 1e-4)
        cur = params["block_w"].reshape(-1)
        # eps INSIDE the sqrt: block_w starts at zeros and norm() has a NaN
        # gradient at the origin
        cur = cur / jnp.sqrt(jnp.sum(cur**2) + 1e-12)
        hist = state.mvars["block_w_hist"].reshape(self.task_num, -1)
        hn = hist / jnp.sqrt(
            jnp.sum(hist**2, axis=1, keepdims=True) + 1e-12
        )
        prev_mask = (
            jnp.arange(self.task_num) < state.mvars["n_hist"]
        ).astype(jnp.float32)
        dots = jnp.abs(hn @ cur) * prev_mask
        ortho = jnp.sum(dots) / jnp.maximum(state.mvars["n_hist"], 1.0)
        loss = loss + on_kd * self.ortho_coeff * ortho

        masked = jnp.where(cur_mask[None] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": {}}

    def forward_logits(self, params, state, x, train):
        out = self.vit_features(params, state.mvars, x, train)
        return self._head.apply({"params": params["head"]}, out["features"])

    def eval_logits(self, state, x, task_id):
        """Block-diagonal inference (reference forward_diagonal): task t's
        feature — computed under task t's frozen shared snapshot + its
        specific adapter — is scored ONLY against task t's class rows with
        a normalized cosine product and the head's sigma scale."""
        params = state.params
        kernel = params["head"]["kernel"]  # (d, C)
        sigma = params["head"].get("sigma", jnp.ones(()))
        logits = jnp.full((x.shape[0], self.num_class), -1e30, jnp.float32)
        done = jnp.zeros((self.num_class,), jnp.float32)
        for t in range(self.task_num):
            onehot = (jnp.arange(self.task_num) == t).astype(jnp.float32)
            sharedA = {s: state.mvars[f"histA_{s}"][t] for s in self.lora_slots}
            sharedB = {s: state.mvars[f"histB_{s}"][t] for s in self.lora_slots}
            deltas = self._stream_deltas(
                params["lora"], state.mvars["block_w_hist"][t], onehot,
                shared_A=sharedA, shared_B=sharedB,
            )
            f = self.backbone.apply(
                {"params": state.mvars["frozen"]}, x, train=False,
                qkv_deltas=deltas,
            )["features"]
            fn = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
            kn = kernel / (jnp.linalg.norm(kernel, axis=0, keepdims=True) + 1e-12)
            cos = (fn @ kn) * sigma
            lo = self.init_cls_num + max(0, t - 1) * self.inc_cls_num if t > 0 else 0
            hi = lo + (self.inc_cls_num if t > 0 else self.init_cls_num)
            rng_mask = (
                (jnp.arange(self.num_class) >= lo)
                & (jnp.arange(self.num_class) < hi)
            ).astype(jnp.float32)
            # only tasks whose snapshot exists (trained or current) score;
            # the trainer evaluates tasks 0..cur, so untrained slots' -1e30
            # rows never win
            have = jnp.where(
                (jnp.arange(self.task_num) <= state.task)[t], 1.0, 0.0
            )
            use = rng_mask * have
            logits = jnp.where(use[None, :] > 0, cos, logits)
            done = jnp.maximum(done, use)
        # current task's shared pair may not be snapshotted yet mid-task:
        # fall back to the live merged forward for class rows not covered
        live = self.forward_logits(params, state, x, train=False)
        logits = jnp.where(done[None, :] > 0, logits, live)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
