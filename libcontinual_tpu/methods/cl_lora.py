"""CL-LoRA — task-shared (general) + task-specific LoRA blocks with
learnable block weights (reference core/model/cl_lora.py +
backbone/vit.py:206-296, transformer.py:446-527, 2045-2083, 2302-2690).

Reference architecture (cfg hardcoded at transformer.py:2406-2422):
  * 12 adapter positions; blocks 0-5 are GENERAL, 6-11 are SPECIFIC;
    each position holds a q-adapter and a v-adapter (msa=[1,0,1]) of the
    Adapter_lora form ``up(down(x))`` — down (r x d) qr-orthonormal init,
    up (d x r) zero init (transformer.py:2308-2343);
  * general adapters persist across tasks; after task 0 their DOWN factor
    freezes and only the up factor keeps training
    (get_new_adapter_msa, transformer.py:2680-2689);
  * specific adapters are re-created per task and the old ones snapshotted
    per task (add_adapter_to_list, transformer.py:2639-2659);
  * ``block_weight`` (3, 6), uniform(0.5, 1.5) init and re-randomized each
    task, scales the q ([0]) and v ([2]) adapter outputs of the SPECIFIC
    blocks only (MultiHeadAttention_CL_LoRA.forward, transformer.py:495-504);
    row 1 (the k slot) never enters the forward but DOES enter the
    orthogonality penalty through ``flatten()`` — kept for parity;
  * loss: CE on a fresh per-task cosine head (CosineLinearFeature,
    cl_lora.py:53-86) + 1e-4 * orthogonality between the current block
    weights and every stored previous task's (cl_lora.py:32-51, 250-251);
  * knowledge distillation (T=2, ratio 5) between the 6-block general
    stream under the current adapters and under the previous task's frozen
    snapshot, through the same head (cl_lora.py:227-248,
    forward_general_cls); the general UP factors' KD gradient rows are
    reweighted by the teacher up-factor row norms (cl_lora.py:240-246);
  * inference: for each past task config (its specific adapters + its
    block weights + the CURRENT general adapters) compute features and
    score them against that task's class PROTOTYPES by cosine
    (replace_fc + forward_diagonal, cl_lora.py:88-112, 315-338).

Documented deviations:
  * the reference's KD is a SEPARATE Adam step inside observe (its own
    zero_grad/backward/step, cl_lora.py:237-248) followed by the trainer's
    step on CE+ortho — two sequential optimizer steps per batch. One optax
    step on the combined loss applies the same gradient sum with shared
    Adam moments; the KD-only row reweighting is reproduced exactly via a
    custom-VJP scaler.
  * reference forward_general_cls feeds [B, N, C] tensors to blocks that
    expect [N, B, C] (transformer.py:2592-2607 has no permute, unlike every
    other forward), so upstream KD attention mixes over the BATCH axis at
    fixed token position; this framework distills the intended general-
    stream CLS features (proper layout).
  * the reference's ``init_proto`` head (cl_lora.py:148-155) is created
    and marked trainable but appears in no loss — dead weight, omitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter
from libcontinual_tpu.methods.lora_base import LoRAViTMethod
from libcontinual_tpu.registry import METHODS

N_GENERAL = 6  # general_pos = [0..5]; specific_pos = [6..11] (ViT-B/16)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _scale_grad_rows(A, w):
    """Identity forward; backward multiplies dA's d-rows by ``w``.
    Reproduces the reference's in-place KD-gradient reweighting
    (cl_lora.py:240-246: grad_up *= d * |teacher up rows| / sum) without a
    second backward pass."""
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


def _qr_down(rng, r, d):
    """torch: q, _ = qr(rand(d, r)); down.weight <- q.T  (orthonormal rows,
    transformer.py:2325-2328). Returns the (r, d) down factor."""
    q, _ = np.linalg.qr(rng.uniform(0.0, 1.0, size=(d, r)))
    return np.ascontiguousarray(q.T, dtype=np.float32)


@METHODS.register("CL_LoRA")
class CLLoRA(LoRAViTMethod):
    lora_slots = ("q", "v")
    validate_enabled = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        # general blocks = first half of the stack (reference hardcodes
        # [0..5] of 12, transformer.py:2410-2412); scales to shallow test ViTs
        self.n_general = min(N_GENERAL, self.depth // 2)
        self.kd_ratio = float(self.kwargs.get("kd_ratio", 5.0))
        self.kd_T = float(self.kwargs.get("kd_T", 2.0))
        self.ortho_coeff = float(self.kwargs.get("ortho_coeff", 1e-4))

    def head_module(self):
        from libcontinual_tpu.models.heads import CosineLinear

        return CosineLinear(self.num_class)

    def extra_params(self, rng):
        d, r = self.embed_dim, self.rank
        p = {"block_w": jnp.ones((3, self.depth - self.n_general), jnp.float32)}
        for slot in self.lora_slots:
            p[f"gen_down_{slot}"] = jnp.zeros((self.n_general, r, d), jnp.float32)
            p[f"gen_up_{slot}"] = jnp.zeros((self.n_general, d, r), jnp.float32)
        return p

    def extra_mvars(self):
        d, r, T = self.embed_dim, self.rank, self.task_num
        mv = {
            "block_w_hist": jnp.zeros((T, 3, self.depth - self.n_general), jnp.float32),
            "n_hist": jnp.zeros((), jnp.float32),
            "protos": jnp.zeros((self.num_class, d), jnp.float32),
            "proto_valid": jnp.zeros((self.num_class,), jnp.float32),
        }
        for slot in self.lora_slots:
            # teacher snapshots of the general adapters (end of each task)
            mv[f"hist_gen_down_{slot}"] = jnp.zeros(
                (T, self.n_general, r, d), jnp.float32
            )
            mv[f"hist_gen_up_{slot}"] = jnp.zeros(
                (T, self.n_general, d, r), jnp.float32
            )
        return mv

    # ---------------------------------------------------------------- deltas

    def _deltas(self, params, spec_coeff, block_w, gen_down=None, gen_up=None,
                gen_row_w=None, num_blocks=None):
        """Per-layer (d, 3d) qkv deltas. Layers < 6: the general adapters
        (coef 1). Layers >= 6: the ``spec_coeff``-selected specific stack
        scaled by block_w ([0]=q, [2]=v). ``gen_down/up`` override the live
        general factors (teacher); ``gen_row_w`` applies the KD row
        reweighting to the general up factors."""
        d = self.embed_dim
        slot_off = {"q": 0, "v": 2}
        deltas = {}
        depth = self.depth if num_blocks is None else num_blocks
        for layer in range(depth):
            delta = jnp.zeros((d, 3 * d), jnp.float32)
            for slot in self.lora_slots:
                if layer < self.n_general:
                    down = (gen_down or {}).get(
                        slot, params[f"gen_down_{slot}"]
                    )[layer]
                    up = (gen_up or {}).get(slot, params[f"gen_up_{slot}"])[layer]
                    if gen_row_w is not None:
                        up = _scale_grad_rows(up, gen_row_w[slot][layer])
                    dw = up @ down
                else:
                    j = layer - self.n_general
                    A = params["lora"][f"A_{slot}"][layer]  # (T, r, d) down
                    B = params["lora"][f"B_{slot}"][layer]  # (T, d, r) up
                    dw = jnp.einsum("t,tdr,tre->de", spec_coeff, B, A)
                    dw = dw * block_w[slot_off[slot], j]
                off = slot_off[slot] * d
                delta = delta.at[:, off : off + d].add(dw.T)
            deltas[layer] = delta
        return deltas

    def vit_features(self, params, mvars, x, train, capture=False):
        deltas = self._deltas(params, mvars["train_onehot"], params["block_w"])
        return self.backbone.apply(
            {"params": mvars["frozen"]}, x, train=train,
            qkv_deltas=deltas, capture=capture,
        )

    def forward_logits(self, params, state, x, train):
        out = self.vit_features(params, state.mvars, x, train)
        return self._head.apply({"params": params["head"]}, out["features"])

    # ------------------------------------------------------------------ train

    def transform_grads(self, grads, state):
        grads = self._mask_lora_tree(grads, state)  # specific: cur task only
        # general DOWN factors freeze after task 0
        # (get_new_adapter_msa, transformer.py:2683-2689)
        first = jnp.where(state.task == 0, 1.0, 0.0)
        grads = dict(grads)
        for slot in self.lora_slots:
            grads[f"gen_down_{slot}"] = grads[f"gen_down_{slot}"] * first
        return grads

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
        # KD: 6-block general stream, current adapters vs the previous
        # task's frozen snapshot, both through the (masked) cosine head
        # (reference forward_general_cls + _KD_loss, T=2, ratio 5)
        t_prev = jnp.maximum(state.task - 1, 0)
        teacher_down = {
            s: state.mvars[f"hist_gen_down_{s}"][t_prev]
            for s in self.lora_slots
        }
        teacher_up = {
            s: state.mvars[f"hist_gen_up_{s}"][t_prev] for s in self.lora_slots
        }
        # grad rows of the general up factors reweighted by the TEACHER up
        # factors' per-row norms, scaled x d / sum (cl_lora.py:240-246)
        row_w = {}
        for s in self.lora_slots:
            norms = jnp.linalg.norm(teacher_up[s], axis=-1)  # (6, d)
            row_w[s] = (
                norms.shape[-1] * norms
                / jnp.maximum(jnp.sum(norms, axis=-1, keepdims=True), 1e-8)
            )
        zero_bw = jnp.zeros((3, self.depth - self.n_general), jnp.float32)
        stu_deltas = self._deltas(
            params, state.mvars["train_onehot"], zero_bw,
            gen_row_w=row_w, num_blocks=self.n_general,
        )
        tea_deltas = self._deltas(
            params, state.mvars["train_onehot"], zero_bw,
            gen_down=teacher_down, gen_up=teacher_up, num_blocks=self.n_general,
        )
        f_stu = self.backbone.apply(
            {"params": state.mvars["frozen"]}, batch["x"], train=False,
            qkv_deltas=stu_deltas, num_blocks=self.n_general,
        )["features"]
        f_tea = self.backbone.apply(
            {"params": state.mvars["frozen"]}, batch["x"], train=False,
            qkv_deltas=jax.tree_util.tree_map(
                jax.lax.stop_gradient, tea_deltas
            ),
            num_blocks=self.n_general,
        )["features"]
        l_stu = self._head.apply({"params": params["head"]}, f_stu)
        l_tea = self._head.apply({"params": params["head"]}, f_tea)
        l_stu = jnp.where(cur_mask[None, :] > 0, l_stu, -1e30)
        l_tea = jnp.where(cur_mask[None, :] > 0, l_tea, -1e30)
        kd = _kd_loss(l_stu, l_tea, self.kd_T)
        loss = loss + on_kd * self.kd_ratio * kd

        # orthogonality of the flattened (3, 6) block weights vs every
        # stored previous task's (compute_orthogonality_loss, cl_lora.py:32-51)
        cur = params["block_w"].reshape(-1)
        cur = cur / (jnp.linalg.norm(cur) + 1e-8)
        hist = state.mvars["block_w_hist"].reshape(self.task_num, -1)
        hn = hist / (
            jnp.linalg.norm(hist, axis=1, keepdims=True) + 1e-8
        )
        prev_mask = (
            jnp.arange(self.task_num) < state.mvars["n_hist"]
        ).astype(jnp.float32)
        dots = jnp.abs(hn @ cur) * prev_mask
        ortho = jnp.sum(dots) / jnp.maximum(state.mvars["n_hist"], 1.0)
        loss = loss + on_kd * self.ortho_coeff * ortho

        masked = jnp.where(cur_mask[None] > 0, logits, -1e30)
        return loss, {"logits": masked, "model_state": {}}

    # ----------------------------------------------------------------- hooks

    def before_task(self, state, task_idx, task_data):
        state = super().before_task(state, task_idx, task_data)
        self._known_tasks = task_idx + 1  # bounds the eval fan-out
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        mvars = dict(state.mvars)
        rng = np.random.RandomState(100 + task_idx)
        d, r = self.embed_dim, self.rank
        if task_idx == 0:
            # general adapters: qr-orthonormal down, zero up
            for slot in self.lora_slots:
                down = np.stack(
                    [_qr_down(rng, r, d) for _ in range(self.n_general)]
                )
                params[f"gen_down_{slot}"] = jnp.asarray(down)
                params[f"gen_up_{slot}"] = jnp.zeros(
                    (self.n_general, d, r), jnp.float32
                )
        else:
            # snapshot previous task (add_adapter_to_list): teacher general
            # adapters + its block weights
            for slot in self.lora_slots:
                mvars[f"hist_gen_down_{slot}"] = mvars[
                    f"hist_gen_down_{slot}"
                ].at[task_idx - 1].set(params[f"gen_down_{slot}"])
                mvars[f"hist_gen_up_{slot}"] = mvars[
                    f"hist_gen_up_{slot}"
                ].at[task_idx - 1].set(params[f"gen_up_{slot}"])
            mvars["block_w_hist"] = mvars["block_w_hist"].at[task_idx - 1].set(
                params["block_w"]
            )
            mvars["n_hist"] = jnp.asarray(float(task_idx), jnp.float32)
        # fresh block weights each task: uniform(0.5, 1.5)
        # (transformer.py:2450-2452, 2649-2651)
        params["block_w"] = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(3, self.depth - self.n_general)).astype(np.float32)
        )
        # fresh specific adapters for this task at blocks 6-11
        lora = {k: np.array(v) for k, v in params["lora"].items()}
        for slot in self.lora_slots:
            for layer in range(self.n_general, self.depth):
                lora[f"A_{slot}"][layer, task_idx] = _qr_down(rng, r, d)
                lora[f"B_{slot}"][layer, task_idx] = 0.0
        params["lora"] = {k: jnp.asarray(v) for k, v in lora.items()}
        # fresh per-task cosine head: current columns re-drawn uniform
        # (CosineLinearFeature.reset_parameters, cl_lora.py:67-71), sigma 1
        lo = 0 if task_idx == 0 else (
            self.init_cls_num + (task_idx - 1) * self.inc_cls_num
        )
        hi = self.init_cls_num if task_idx == 0 else lo + self.inc_cls_num
        head = {k: np.array(v) for k, v in params["head"].items()}
        stdv = 1.0 / np.sqrt(d)
        head["kernel"][:, lo:hi] = rng.uniform(
            -stdv, stdv, size=(d, hi - lo)
        ).astype(np.float32)
        head["sigma"] = np.ones((), np.float32)
        params["head"] = {k: jnp.asarray(v) for k, v in head.items()}
        return state.replace(params=params, mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        """Prototype bank (replace_fc, cl_lora.py:315-338): current task's
        class means under the CURRENT config, computed with test transforms
        (the reference swaps loader trfms, cl_lora.py:310). Also snapshot
        this task's block weights so eval can rebuild its config."""
        params = state.params
        mvars = dict(state.mvars)
        mvars["block_w_hist"] = mvars["block_w_hist"].at[task_idx].set(
            params["block_w"]
        )
        for slot in self.lora_slots:
            mvars[f"hist_gen_down_{slot}"] = mvars[
                f"hist_gen_down_{slot}"
            ].at[task_idx].set(params[f"gen_down_{slot}"])
            mvars[f"hist_gen_up_{slot}"] = mvars[f"hist_gen_up_{slot}"].at[
                task_idx
            ].set(params[f"gen_up_{slot}"])
        state = state.replace(mvars=mvars)

        bs = int(self.config["batch_size"])
        protos = np.array(state.mvars["protos"])
        valid = np.array(state.mvars["proto_valid"])

        @jax.jit
        def feat(state, images):
            x = self.augment(None, images, train=False)
            return self.vit_features(
                state.params, state.mvars, x, train=False
            )["features"]

        feats_all, labels_all = [], []
        for im, lb, wt in batch_iter(task_data.images, task_data.labels, bs):
            f = np.asarray(feat(state, im))
            keep = np.asarray(wt) > 0
            feats_all.append(f[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all)
        labels = np.concatenate(labels_all)
        for c in np.unique(labels):
            protos[c] = feats[labels == c].mean(0)
            valid[c] = 1.0
        mvars = dict(state.mvars)
        mvars["protos"] = jnp.asarray(protos)
        mvars["proto_valid"] = jnp.asarray(valid)
        return state.replace(mvars=mvars)

    # ------------------------------------------------------------------ eval

    def _eval_tasks(self) -> int:
        """Trace-time bound on the per-task diagonal forwards: tasks learned
        so far (set by before_task; falls back to the full task_num, which is
        always correct — e.g. pre-resume)."""
        return int(getattr(self, "_known_tasks", self.task_num))

    def eval_jit_key(self):
        return self._eval_tasks()

    def eval_logits(self, state, x, task_id):
        """Block-diagonal inference (forward_diagonal + replace_fc): task
        t's features — current GENERAL adapters + task t's specific
        adapters and block weights — scored by cosine against task t's
        class prototypes. Zero (not-yet-filled) prototype rows score 0,
        matching the reference's zero-initialized fc rows. The loop runs
        only over tasks learned so far (one full ViT forward each — the
        reference's forward_diagonal is the same per-learned-task loop);
        the trainer retraces per task via eval_jit_key."""
        params = state.params
        protos = state.mvars["protos"]
        pn = protos / (jnp.linalg.norm(protos, axis=1, keepdims=True) + 1e-12)
        logits = jnp.full((x.shape[0], self.num_class), -1e30, jnp.float32)
        for t in range(self._eval_tasks()):
            onehot = (jnp.arange(self.task_num) == t).astype(jnp.float32)
            bw = jnp.where(
                state.task == t, params["block_w"],
                state.mvars["block_w_hist"][t],
            )
            deltas = self._deltas(params, onehot, bw)
            f = self.backbone.apply(
                {"params": state.mvars["frozen"]}, x, train=False,
                qkv_deltas=deltas,
            )["features"]
            fn = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
            cos = fn @ pn.T
            lo = 0 if t == 0 else (
                self.init_cls_num + (t - 1) * self.inc_cls_num
            )
            hi = self.init_cls_num if t == 0 else lo + self.inc_cls_num
            rng_mask = (
                (jnp.arange(self.num_class) >= lo)
                & (jnp.arange(self.num_class) < hi)
            ).astype(jnp.float32)
            have = jnp.where(t <= state.task, 1.0, 0.0)
            use = rng_mask * have
            logits = jnp.where(use[None, :] > 0, cos, logits)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
