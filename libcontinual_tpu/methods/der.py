"""DER — Dynamically Expandable Representation (Yan et al., CVPR 2021).

Parity with reference core/model/der.py:
  * a new feature extractor per task, old extractors frozen; the classifier
    sees the concatenation of all extractors' features (der.py:90-134);
  * auxiliary head on the newest extractor's features with remapped targets
    ``old -> 0, new -> y - known + 1`` (der.py:119-129);
  * herding exemplar replay (trainer-managed);
  * ``weight_align`` (der.py:184-192) is DEAD CODE in the reference — defined
    but never invoked (after_task inherits Finetune's no-op, finetune.py:44-45,
    and the trainer has no DER special case; the PyCIL original this file was
    adapted from does call it post-task). Exposed here as the opt-in kwarg
    ``weight_align: true``; the default matches the executing reference (off).

TPU re-design (the "per-task parameter growth under jit" hard case,
SURVEY.md §7): extractors are ONE stacked param pytree with leading dim
``task_num`` applied via ``jax.vmap`` — the active tasks' convnets run as a
single batched XLA program.  The TRAIN step slices the stack to the active
prefix ``[: task_idx + 1]`` at trace time (``jit_key`` forces one retrace per
task, each cached), so task-t compute scales with t+1 extractors exactly like
the reference's growing net list (reference der.py:90-134) instead of always
paying for ``task_num``.  Eval/herding keep the full masked stack (those fns
are jitted once at trainer init); the gradient mask trains only the newest
extractor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.models import get_backbone
from libcontinual_tpu.models.heads import LinearHead
from libcontinual_tpu.registry import METHODS


@METHODS.register("DER")
class DER(Method):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.aux_classes = self.inc_cls_num + 1
        self.weight_align = bool(self.kwargs.get("weight_align", False))

    def head_module(self):
        return None  # heads are built in init_state over concat features

    def init_state(self, rng, sample_input_hw):
        keys = jax.random.split(rng, self.task_num + 3)
        dummy = self.model_input(sample_input_hw)

        # stacked extractor params: init each task's net with its own key,
        # then stack leaves along a leading task axis
        per_task = [get_backbone(self.config).init(keys[i], dummy, train=False)
                    for i in range(self.task_num)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_task)
        bb_params = stacked["params"]
        bb_state = {k: v for k, v in stacked.items() if k != "params"}

        concat_dim = self.feat_dim * self.task_num
        self._fc = LinearHead(self.num_class)
        self._aux = LinearHead(self.aux_classes)
        fc_params = self._fc.init(keys[-1], jnp.zeros((2, concat_dim)))["params"]
        aux_params = self._aux.init(keys[-2], jnp.zeros((2, self.feat_dim)))["params"]
        params = {"backbone": bb_params, "head": fc_params, "aux": aux_params}

        from libcontinual_tpu.core.state import TrainState, make_masks

        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        mvars = {
            "model_state": bb_state,
            "active": jnp.zeros((self.task_num,), jnp.float32).at[0].set(1.0),
        }
        return TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
            rng=keys[-3],
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )

    # ------------------------------------------------------------ forward

    def _stack_apply(self, bb_params, bb_state, x, train: bool):
        """Run all task extractors via vmap; returns (B, T, D) features and
        the updated stacked batch stats."""
        backbone = self.backbone

        if train and bb_state:
            def one(p, s):
                out, new_s = backbone.apply(
                    {"params": p, **s}, x, train=True, mutable=list(s.keys())
                )
                return out["features"], new_s

            feats, new_state = jax.vmap(one)(bb_params, bb_state)
        else:
            def one(p, s):
                out = backbone.apply({"params": p, **s}, x, train=False)
                return out["features"]

            feats = jax.vmap(one)(bb_params, bb_state)
            new_state = bb_state
        return jnp.transpose(feats, (1, 0, 2)), new_state  # (B, T, D)


    def _n_active(self) -> int:
        """Trace-time count of created extractors (set by before_task; falls
        back to the full stack, which is always correct, e.g. pre-resume)."""
        return int(getattr(self, "_active_count", self.task_num))

    def jit_key(self):
        return self._n_active()

    def loss(self, params, state, batch, rng):
        n = self._n_active()
        # slice the extractor stack to the active prefix — compute scales
        # with the number of created nets (reference der.py:90-134)
        bb = jax.tree_util.tree_map(lambda p: p[:n], params["backbone"])
        bst = jax.tree_util.tree_map(lambda s: s[:n], state.mvars["model_state"])
        if n > 1:
            # the reference trainer's per-epoch model.train() (trainer.py:575)
            # undoes freeze_convnets' .eval(), so the frozen old extractors
            # compute with the current batch's BN statistics during training
            # (their running stats stay frozen here — the reference lets them
            # drift as a side effect, documented in PARITY.md); only the
            # newest extractor's running stats advance (post_update)
            old_bb = jax.tree_util.tree_map(lambda p: p[: n - 1], bb)
            old_bst = jax.tree_util.tree_map(lambda s: s[: n - 1], bst)
            new_bb = jax.tree_util.tree_map(lambda p: p[n - 1 : n], bb)
            new_bst = jax.tree_util.tree_map(lambda s: s[n - 1 : n], bst)
            old_feats, _ = self._stack_apply(
                old_bb, old_bst, batch["x"], train=self.teacher_train
            )
            new_feats, new_tail_state = self._stack_apply(
                new_bb, new_bst, batch["x"], train=True
            )
            feats = jnp.concatenate([old_feats, new_feats], axis=1)  # (B,n,D)
            new_model_state = jax.tree_util.tree_map(
                lambda old, tail: jnp.concatenate([old, tail], axis=0),
                old_bst, new_tail_state,
            )
        else:
            feats, new_model_state = self._stack_apply(
                bb, bst, batch["x"], train=True
            )
        flat = feats.reshape(feats.shape[0], -1)  # (B, n*D)
        flat = jnp.pad(flat, ((0, 0), (0, (self.task_num - n) * self.feat_dim)))
        logits = self._fc.apply({"params": params["head"]}, flat)
        w = batch.get("weight")
        ce = masked_cross_entropy(logits, batch["label"], w, state.seen_mask)

        loss = ce
        if n > 1:
            # aux loss on the newest extractor's features (der.py:119-129)
            cur_feats = feats[:, n - 1, :]
            aux_logits = self._aux.apply({"params": params["aux"]}, cur_feats)
            known = jnp.sum(state.prev_mask).astype(jnp.int32)
            aux_t = jnp.maximum(batch["label"] - known + 1, 0)
            loss = ce + masked_cross_entropy(aux_logits, aux_t, w)
        return loss, {"logits": logits, "model_state": new_model_state}

    def post_update(self, state, batch, aux):
        if "model_state" in aux:
            n = self._n_active()
            mvars = dict(state.mvars)
            # only the newest extractor's batch stats may advance; the update
            # carries the sliced prefix, scattered back into the full stack
            mvars["model_state"] = jax.tree_util.tree_map(
                lambda new, old: old.at[n - 1].set(new[n - 1]),
                aux["model_state"], state.mvars["model_state"],
            )
            state = state.replace(mvars=mvars)
        return state

    def _stack_onehot_mask(self, tree):
        onehot = (
            jnp.arange(self.task_num) == (self._n_active() - 1)
        ).astype(jnp.float32)
        return jax.tree_util.tree_map(
            lambda g: g * onehot.reshape((-1,) + (1,) * (g.ndim - 1)), tree
        )

    def transform_grads(self, grads, state):
        grads = dict(grads)
        grads["backbone"] = self._stack_onehot_mask(grads["backbone"])
        return grads

    def transform_updates(self, updates, state):
        # weight decay (optax.add_decayed_weights inside the tx chain) adds
        # wd*param to EVERY update after the grad mask — without this mask the
        # frozen old extractors would decay toward zero over a task's steps
        # (the reference never touches frozen nets, der.py:90-134)
        updates = dict(updates)
        updates["backbone"] = self._stack_onehot_mask(updates["backbone"])
        return updates

    # ------------------------------------------------------------- hooks

    def before_task(self, state, task_idx, task_data):
        self._active_count = task_idx + 1
        mvars = dict(state.mvars)
        mvars["active"] = (
            jnp.arange(self.task_num) < task_idx + 1
        ).astype(jnp.float32)
        params = state.params
        if task_idx > 0:
            params = jax.tree_util.tree_map(lambda x: x, state.params)
            # warm-start the new extractor from the previous one — reference
            # update_fc copies the last convnet's state_dict into the new
            # net (der.py:152-154), params AND BatchNorm running stats
            params["backbone"] = jax.tree_util.tree_map(
                lambda p: p.at[task_idx].set(p[task_idx - 1]),
                params["backbone"],
            )
            mvars["model_state"] = jax.tree_util.tree_map(
                lambda s: s.at[task_idx].set(s[task_idx - 1]),
                state.mvars["model_state"],
            )
            # fresh aux head each task (reference regenerates aux_fc,
            # der.py:172)
            params["aux"] = self._aux.init(
                jax.random.fold_in(state.rng, 1000 + task_idx),
                jnp.zeros((2, self.feat_dim), jnp.float32),
            )["params"]
        return state.replace(params=params, mvars=mvars)

    def after_task(self, state, task_idx, task_data):
        """Optional weight align of new rows (der.py:184-192, WA-style) —
        off by default: the reference never calls its weight_align (see the
        module docstring), so the shipped behavior is the Finetune no-op."""
        if task_idx == 0 or not self.weight_align:
            return state
        lo = self.init_cls_num + (task_idx - 1) * self.inc_cls_num
        hi = lo + self.inc_cls_num
        k = state.params["head"]["Dense_0"]["kernel"]
        norms = jnp.linalg.norm(k, axis=0)
        cols = jnp.arange(k.shape[1])
        new_sel = (cols >= lo) & (cols < hi)
        old_sel = cols < lo
        gamma = jnp.mean(norms, where=old_sel) / jnp.maximum(
            jnp.mean(norms, where=new_sel), 1e-12
        )
        k = jnp.where(new_sel[None, :], k * gamma, k)
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        params["head"] = {"Dense_0": dict(params["head"]["Dense_0"])}
        params["head"]["Dense_0"]["kernel"] = k
        return state.replace(params=params)

    def eval_jit_key(self):
        # eval/herding run only the created extractors (trace-time bound);
        # the trainer retraces its eval programs when the count grows
        return self._n_active()

    def _bounded_flat(self, state, x):
        """Concat features of the ACTIVE extractor prefix, zero-padded to the
        full (B, T*D) width. Numerically identical to the masked full-stack
        concat (``mvars['active']`` zeroes the same blocks) but runs n
        forwards instead of task_num — eval after task 0 of a 10-task run is
        10x cheaper. The active mask still applies for the pre-resume
        fallback (n == task_num with fewer created extractors)."""
        n = self._n_active()
        bb = jax.tree_util.tree_map(lambda p: p[:n], state.params["backbone"])
        bst = jax.tree_util.tree_map(
            lambda s: s[:n], state.mvars["model_state"]
        )
        feats, _ = self._stack_apply(bb, bst, x, train=False)
        feats = feats * state.mvars["active"][None, :n, None]
        flat = feats.reshape(feats.shape[0], -1)  # (B, n*D)
        return jnp.pad(
            flat, ((0, 0), (0, (self.task_num - n) * self.feat_dim))
        )

    def eval_logits(self, state, x, task_id):
        flat = self._bounded_flat(state, x)
        logits = self._fc.apply({"params": state.params["head"]}, flat)
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)

    def herding_features(self, state, x):
        return self._bounded_flat(state, x)
