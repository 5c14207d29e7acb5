"""PRAKA — Prototype Reminiscence and Augmented Asymmetric Knowledge
Aggregation (Shi & Ye, ICCV 2023), non-exemplar class-incremental CL.

Parity with reference core/model/praka.py:
  * TWO heads: a joint self-supervised head over ``4 * num_class``
    rotation-classes and a single ``num_class`` classifier
    (joint_network, praka.py:25-44); every batch trains on all 4 global
    rotations with labels ``4*y + rot``; CEs are temperature-scaled
    (praka.py:205-215, temp=0.1);
  * asymmetric self-distillation: KL between the single head's log-softmax
    and the rotation-aggregated joint predictions (praka.py:209-215);
  * prototype reminiscence: per-class feature prototypes saved after each
    task; replayed prototypes are MIXED with random current-batch features
    using a Beta(0.5,0.5) coefficient and a random sign
    (``(1±lam)*proto ∓ lam*feat``, praka.py:226-244) — not Gaussian jitter;
    the augmented prototypes pass through both heads + the aggregation
    distillation (praka.py:246-255);
  * feature KD: the L2 NORM (torch.dist) between current and
    frozen-previous features on the incoming batch (praka.py:223);
  * inference uses the SINGLE head (praka.py:36-43, 175).

TPU re-design: rotations are layout ops inside the jitted step; prototypes
are a fixed (num_class, feat_dim) array with a validity mask; prototype
replay is a fixed-size Gumbel draw over valid classes — scan-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.methods.common import batch_iter, copy_tree
from libcontinual_tpu.registry import METHODS


def _masked_log_softmax(logits, mask):
    ml = jnp.where(mask[None, :] > 0, logits, -1e30)
    return jax.nn.log_softmax(ml, axis=-1)


@METHODS.register("PRAKA")
class PRAKA(Method):
    validate_enabled = False  # reference trainer.py:367-377
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.kd_weight = float(self.kwargs.get("kd_weight", 15.0))
        self.proto_weight = float(
            self.kwargs.get("protoAug_weight", self.kwargs.get("proto_weight", 15.0))
        )
        self.temp = float(self.kwargs.get("temp", 0.1))

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class * 4)  # joint rotation head

    def init_state(self, rng, sample_input_hw):
        state = super().init_state(rng, sample_input_hw)
        from libcontinual_tpu.models.heads import LinearHead

        self._single = LinearHead(self.num_class)
        sp = self._single.init(
            jax.random.fold_in(rng, 7), jnp.zeros((2, self.feat_dim), jnp.float32)
        )["params"]
        params = dict(state.params)
        params["single"] = sp
        # keep the teacher pytree structurally identical to params (it is
        # refreshed from params at every task boundary)
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(params)
        return state.replace(
            params=params, mvars=mvars,
            opt_state=self._tx_for_task(0).init(params),
        )

    def init_mvars(self, rng, params, model_state):
        return {
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
            "protos": jnp.zeros((self.num_class, self.feat_dim), jnp.float32),
            "proto_valid": jnp.zeros((self.num_class,), jnp.float32),
        }

    def loss(self, params, state, batch, rng):
        x, y, w = batch["x"], batch["label"], batch.get("weight")
        b = x.shape[0]
        T = self.temp
        xs = jnp.concatenate([jnp.rot90(x, k, axes=(1, 2)) for k in range(4)], axis=0)
        ys = jnp.concatenate([4 * y + k for k in range(4)], axis=0)
        ws = jnp.tile(w, 4) if w is not None else None

        logits, feats, new_ms = self.forward(
            params, state.mvars["model_state"], xs, train=True
        )
        joint_mask = jnp.repeat(state.seen_mask, 4)
        joint_ce = masked_cross_entropy(logits / T, ys, ws, joint_mask)

        single = self._single.apply({"params": params["single"]}, feats[:b])
        single_ce = masked_cross_entropy(single / T, y, w, state.seen_mask)

        # rotation-aggregated joint predictions -> class space: rotation-k
        # rows score their k::4 label slots (reference praka.py:209-212)
        agg = sum(logits[k * b : (k + 1) * b, k::4] for k in range(4)) / 4.0
        distill = jnp.sum(
            jax.nn.softmax(
                jnp.where(state.seen_mask[None, :] > 0,
                          jax.lax.stop_gradient(agg), -1e30), axis=-1
            ) * (
                jax.nn.log_softmax(
                    jnp.where(state.seen_mask[None, :] > 0,
                              jax.lax.stop_gradient(agg), -1e30), axis=-1
                ) - _masked_log_softmax(single, state.seen_mask)
            )
        ) / b

        loss = joint_ce + single_ce + distill

        # ---- replay branch (old_class > 0; weighted off at task 0) ----
        # reference old_model.eval() is undone each epoch by the trainer's
        # model.train() (trainer.py:575) — the teacher computes with the
        # current batch's BN statistics during training
        # the reference distills over the WHOLE rotated stack:
        # feature_old = old_model.feature(imgs) with imgs = all 4 rotations
        # (praka.py:221-223)
        t_out, _ = self.apply_backbone(
            state.mvars["teacher"], state.mvars["teacher_state"], xs, train=self.teacher_train
        )
        # torch.dist(a, b, 2): the L2 NORM of the difference (praka.py:223)
        kd = jnp.sqrt(
            jnp.sum((feats - jax.lax.stop_gradient(t_out["features"])) ** 2)
            + 1e-12
        )

        # prototype reminiscence: mix old prototypes with random current
        # features, lam ~ Beta(0.5, 0.5) clamped, random sign
        # (praka.py:226-244)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        n_rep = b  # reference: feature.shape[0] // 4 with 4b rows = b
        old_valid = state.mvars["proto_valid"] * state.prev_mask
        g = jax.random.gumbel(k1, (n_rep, self.num_class))
        cls = jnp.argmax(jnp.log(old_valid[None, :] + 1e-30) + g, axis=1)
        lam = jax.random.beta(k2, 0.5, 0.5, (n_rep, 1))
        lam = jnp.where(lam > 0.6, lam * 0.6, lam)
        row = jax.random.randint(k3, (n_rep,), 0, 4 * b)
        f_mix = jax.lax.stop_gradient(feats[row])
        sign = jax.random.bernoulli(k4, 0.5, (n_rep, 1))
        proto = state.mvars["protos"][cls]
        pf = jnp.where(
            sign, (1 + lam) * proto - lam * f_mix, (1 - lam) * proto + lam * f_mix
        )
        aug_single = self._single.apply({"params": params["single"]}, pf)
        aug_joint = self._head.apply({"params": params["head"]}, pf)
        aug_ce1 = masked_cross_entropy(aug_single / T, cls, None, state.seen_mask)
        aug_ce2 = masked_cross_entropy(aug_joint / T, 4 * cls, None, joint_mask)
        agg_aug = jax.lax.stop_gradient(aug_joint[:, 0::4])
        aug_distill = jnp.sum(
            jax.nn.softmax(
                jnp.where(state.seen_mask[None, :] > 0, agg_aug, -1e30), axis=-1
            ) * (
                jax.nn.log_softmax(
                    jnp.where(state.seen_mask[None, :] > 0, agg_aug, -1e30),
                    axis=-1,
                ) - _masked_log_softmax(aug_single, state.seen_mask)
            )
        ) / n_rep
        loss_proto = aug_ce1 + aug_ce2 + aug_distill

        on = jnp.where((state.task > 0) & (jnp.sum(old_valid) > 0), 1.0, 0.0)
        loss = loss + on * (
            self.proto_weight * loss_proto + self.kd_weight * kd
        )
        eval_logits = jnp.where(state.seen_mask[None, :] > 0, single, -1e30)
        return loss, {"logits": eval_logits, "model_state": new_ms}

    def after_task(self, state, task_idx, task_data):
        bs = int(self.config["batch_size"])
        protos = np.array(state.mvars["protos"])
        valid = np.array(state.mvars["proto_valid"])
        feats_all, labels_all = [], []

        # reference protoSave iterates the train_loader (train-time
        # augmentation) but runs the model in eval() (praka.py:281-309)
        aug_rng = jax.random.PRNGKey(int(self.config.get("seed", 0)) + task_idx)

        @jax.jit
        def feat(state, rng, images):
            x = self.augment(rng, images, train=True)
            out, _ = self.apply_backbone(
                state.params, state.mvars["model_state"], x, train=False
            )
            return out["features"]

        for im, lb, w in batch_iter(task_data.images, task_data.labels, bs):
            aug_rng, sub = jax.random.split(aug_rng)
            f = np.asarray(feat(state, sub, im))
            keep = np.asarray(w) > 0
            feats_all.append(f[keep])
            labels_all.append(np.asarray(lb)[keep])
        feats = np.concatenate(feats_all)
        labels = np.concatenate(labels_all)
        for c in np.unique(labels):
            fc = feats[labels == c]
            protos[c] = fc.mean(0)
            valid[c] = 1.0
        mvars = dict(state.mvars)
        mvars["protos"] = jnp.asarray(protos)
        mvars["proto_valid"] = jnp.asarray(valid)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def eval_logits(self, state, x, task_id):
        # reference inference runs the SINGLE classifier (praka.py:36-43)
        _, feats, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        single = self._single.apply({"params": state.params["single"]}, feats)
        return jnp.where(state.seen_mask[None, :] > 0, single, -1e30)
