"""ER-ACE and ER-AML — online continual learning with experience replay
(Caccia et al., ICLR 2022: "New Insights on Reducing Abrupt Representation
Change in Online CL").

Parity with reference core/model/erace.py / eraml.py / buffer/erbuffer.py:
  * ER-ACE: asymmetric CE — incoming batch's logits masked to the classes
    seen from this task on (erace.py:76-83); replay batch (10 samples) gets
    plain CE (erace.py:88-95); ``distLinear`` cosine head (erace.py:19-37);
  * ER-AML: SupCon loss over positive/negative pairs mined from the buffer /
    batch with invalid-index fallback (eraml.py:74-160,
    buffer/erbuffer.py:196-350); plain CE on task 0;
  * reservoir buffer updated AFTER the optimizer step
    (reference trainer.py:608-609).

TPU re-design: the buffer is device-resident uint8 slabs inside ``mvars``
(capacity-padded); reservoir add is an in-graph ``fori_loop``; positive /
negative mining is Gumbel-argmax over masked candidate sets — fully batched,
no host round-trips, scan-safe.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy, weighted_accuracy
from libcontinual_tpu.registry import METHODS


def reservoir_add(buf: Dict, images, labels, tasks, weight, rng):
    """In-graph reservoir sampling (reference erbuffer.py:52-84)."""
    cap = buf["by"].shape[0]

    def body(i, carry):
        bx, by, bt, n_seen, key = carry
        key, k1 = jax.random.split(key)
        place = jnp.where(
            n_seen < cap, n_seen, jax.random.randint(k1, (), 0, n_seen + 1)
        )
        do_add = (weight[i] > 0) & (place < cap)
        idx = jnp.clip(place, 0, cap - 1)

        bx = jnp.where(do_add, bx.at[idx].set(images[i]), bx)
        by = jnp.where(do_add, by.at[idx].set(labels[i]), by)
        bt = jnp.where(do_add, bt.at[idx].set(tasks[i]), bt)
        n_seen = n_seen + (weight[i] > 0).astype(jnp.int32)
        return bx, by, bt, n_seen, key

    bx, by, bt, n_seen, _ = jax.lax.fori_loop(
        0, images.shape[0], body,
        (buf["bx"], buf["by"], buf["bt"], buf["n_seen"], rng),
    )
    return dict(bx=bx, by=by, bt=bt, n_seen=n_seen)


def balanced_add(buf: Dict, images, labels, tasks, weight, rng, num_class: int):
    """Class-balanced insertion (reference erbuffer.py:86-137): when full,
    replace a random slot of the currently most-represented class instead of
    reservoir-evicting uniformly."""
    cap = buf["by"].shape[0]

    def body(i, carry):
        bx, by, bt, n_seen, key = carry
        key, k1 = jax.random.split(key)
        filled = jnp.minimum(n_seen, cap)
        slot_valid = jnp.arange(cap) < filled
        counts = jnp.sum(
            jax.nn.one_hot(by, num_class) * slot_valid[:, None].astype(jnp.float32),
            axis=0,
        )
        majority = jnp.argmax(counts)
        is_major = (by == majority) & slot_valid
        g = jax.random.gumbel(k1, (cap,))
        evict = jnp.argmax(jnp.log(is_major.astype(jnp.float32) + 1e-30) + g)
        place = jnp.where(n_seen < cap, n_seen, evict)
        do_add = weight[i] > 0
        idx = jnp.clip(place, 0, cap - 1)
        bx = jnp.where(do_add, bx.at[idx].set(images[i]), bx)
        by = jnp.where(do_add, by.at[idx].set(labels[i]), by)
        bt = jnp.where(do_add, bt.at[idx].set(tasks[i]), bt)
        n_seen = n_seen + do_add.astype(jnp.int32)
        return bx, by, bt, n_seen, key

    bx, by, bt, n_seen, _ = jax.lax.fori_loop(
        0, images.shape[0], body,
        (buf["bx"], buf["by"], buf["bt"], buf["n_seen"], rng),
    )
    return dict(bx=bx, by=by, bt=bt, n_seen=n_seen)


def sample_random(buf, rng, amt):
    n = jnp.minimum(buf["n_seen"], buf["by"].shape[0])
    idx = jax.random.randint(rng, (amt,), 0, jnp.maximum(n, 1))
    w = (jnp.arange(amt) < n).astype(jnp.float32)  # zero weight when empty
    return buf["bx"][idx], buf["by"][idx], w


def sample_balanced(buf, rng, amt, num_class: int):
    """Class-balanced sampling (reference erbuffer.py:175-194): draw classes
    uniformly over those present, then a random exemplar of each."""
    cap = buf["by"].shape[0]
    valid = (jnp.arange(cap) < buf["n_seen"]).astype(jnp.float32)
    present = jnp.sum(
        jax.nn.one_hot(buf["by"], num_class) * valid[:, None], axis=0
    ) > 0
    k1, k2 = jax.random.split(rng)
    gc = jax.random.gumbel(k1, (amt, num_class))
    cls = jnp.argmax(jnp.log(present.astype(jnp.float32)[None] + 1e-30) + gc, axis=1)
    match = (buf["by"][None, :] == cls[:, None]).astype(jnp.float32) * valid[None, :]
    gs = jax.random.gumbel(k2, (amt, cap))
    idx = jnp.argmax(jnp.log(match + 1e-30) + gs, axis=1)
    w = (jnp.max(match, axis=1) > 0).astype(jnp.float32)
    return buf["bx"][idx], buf["by"][idx], w


class _ERBase(Method):
    concat_buffer = False

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        buf_kwargs = (config.get("buffer") or {}).get("kwargs") or {}
        self.capacity = int(buf_kwargs.get("buffer_size", 1000))
        self.replay_amt = 10  # reference erace.py:63-66
        self.use_augs = bool(self.kwargs.get("use_augs", False))
        # reference erace.py:87-88, 93: with task_free the masked/asymmetric
        # losses and buffer replay engage from task 0
        self.task_free = bool(self.kwargs.get("task_free", False))
        # 'reservoir' (default) or 'balanced' insertion; 'balanced' sampling
        self.buffer_add = str(buf_kwargs.get("strategy", "reservoir"))
        self.balanced_sampling = bool(buf_kwargs.get("balanced_sampling", False))

    def head_module(self):
        from libcontinual_tpu.models.heads import DistLinear

        return DistLinear(self.num_class)

    def init_mvars(self, rng, params, model_state):
        h = int(self.config.get("image_size", 32))
        return {
            "buffer": {
                "bx": jnp.zeros((self.capacity, h, h, 3), jnp.uint8),
                "by": jnp.zeros((self.capacity,), jnp.int32),
                "bt": jnp.zeros((self.capacity,), jnp.int32),
                "n_seen": jnp.zeros((), jnp.int32),
            },
            "seen_so_far": jnp.zeros((), jnp.int32),
        }

    def augment(self, rng, images, train=True):
        # reference erace.py:113-116: without use_augs the train transform is
        # replaced by the test transform
        if train and not self.use_augs:
            return self.test_pipeline(None, images)
        return super().augment(rng, images, train)

    def after_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["seen_so_far"] = jnp.asarray(
            self.init_cls_num + self.inc_cls_num * task_idx, jnp.int32
        )
        return state.replace(mvars=mvars)

    def post_update(self, state, batch, aux):
        state = super().post_update(state, batch, aux)
        rng, sub = jax.random.split(state.rng)
        mvars = dict(state.mvars)
        add = balanced_add if self.buffer_add == "balanced" else None
        if add is not None:
            mvars["buffer"] = add(
                mvars["buffer"], batch["image"], batch["label"],
                jnp.full_like(batch["label"], state.task),
                batch.get("weight", jnp.ones_like(batch["label"], jnp.float32)),
                sub, self.num_class,
            )
        else:
            mvars["buffer"] = reservoir_add(
                mvars["buffer"], batch["image"],
                batch["label"], jnp.full_like(batch["label"], state.task),
                batch.get("weight", jnp.ones_like(batch["label"], jnp.float32)),
                sub,
            )
        return state.replace(mvars=mvars, rng=rng)

    def sample_replay(self, buf, rng, amt):
        if self.balanced_sampling:
            return sample_balanced(buf, rng, amt, self.num_class)
        return sample_random(buf, rng, amt)

    def eval_logits(self, state, x, task_id):
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        return logits  # reference evaluates the full head (erace.py:101-110)


@METHODS.register("ERACE")
class ERACE(_ERBase):
    def loss(self, params, state, batch, rng):
        logits, _, new_ms = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        w = batch.get("weight")
        # mask incoming logits to classes >= seen_so_far (erace.py:76-83)
        cls = jnp.arange(self.num_class)
        new_mask = (cls >= state.mvars["seen_so_far"]).astype(jnp.float32)
        ce = masked_cross_entropy(logits, batch["label"], w, new_mask)

        # replay CE (10 random buffer samples, plain CE)
        k1, k2 = jax.random.split(rng)
        rx, ry, rw = self.sample_replay(state.mvars["buffer"], k1, self.replay_amt)
        rx = self.augment(k2, rx, train=True)
        r_logits, _, _ = self.forward(params, state.mvars["model_state"], rx, train=True)
        # reference erace.py:93: replay needs buffer content AND
        # (task > 0 or task_free)
        gate = jnp.where(state.task > 0, 1.0, 1.0 if self.task_free else 0.0)
        replay_on = gate * (
            state.mvars["buffer"]["n_seen"] > 0
        ).astype(jnp.float32)
        re_ce = masked_cross_entropy(r_logits, ry, rw)
        loss = ce + replay_on * re_ce
        return loss, {"logits": logits, "model_state": new_ms}


@METHODS.register("ERAML")
class ERAML(_ERBase):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        self.temperature = float(self.kwargs.get("supcon_temperature", 0.1))
        self.use_minimal = bool(self.kwargs.get("use_minimal_selection", False))

    def _mine(self, buf, labels, task, rng):
        """Positive from buffer (same class), negative from buffer (same task,
        different class); Gumbel-argmax over masked candidates
        (reference erbuffer.py:196-256)."""
        b = labels.shape[0]
        cap = buf["by"].shape[0]
        valid = (jnp.arange(cap) < buf["n_seen"]).astype(jnp.float32)
        k1, k2 = jax.random.split(rng)

        same_class = (buf["by"][None, :] == labels[:, None]).astype(jnp.float32) * valid
        g1 = jax.random.gumbel(k1, (b, cap))
        pos_idx = jnp.argmax(jnp.log(same_class + 1e-30) + g1, axis=1)
        pos_ok = jnp.max(same_class, axis=1) > 0

        diff_class = (buf["by"][None, :] != labels[:, None]).astype(jnp.float32) * valid
        same_task = (buf["bt"][None, :] == task).astype(jnp.float32)
        neg_mask = diff_class * same_task
        g2 = jax.random.gumbel(k2, (b, cap))
        neg_idx = jnp.argmax(jnp.log(neg_mask + 1e-30) + g2, axis=1)
        neg_ok = jnp.max(neg_mask, axis=1) > 0

        ok = (pos_ok & neg_ok).astype(jnp.float32)
        return pos_idx, neg_idx, ok

    def _mine_minimal(self, images, labels, weight, rng):
        """Pos/neg from the incoming batch itself (reference
        erbuffer.py:258-350's forward-pass-minimizing selection).

        The reference restricts negatives to ``same_task`` candidates
        (erbuffer.py:290-303). Here every in-batch candidate IS current-task
        by construction — ER methods never concat replay into the incoming
        batch (``concat_buffer = False``) — so the restriction is satisfied
        without an explicit task mask."""
        b = labels.shape[0]
        k1, k2 = jax.random.split(rng)
        valid = weight > 0 if weight is not None else jnp.ones((b,), bool)
        not_self = ~jnp.eye(b, dtype=bool)
        same = (labels[:, None] == labels[None, :]) & not_self & valid[None, :]
        diff = (labels[:, None] != labels[None, :]) & valid[None, :]
        g1 = jax.random.gumbel(k1, (b, b))
        g2 = jax.random.gumbel(k2, (b, b))
        pos_idx = jnp.argmax(jnp.log(same.astype(jnp.float32) + 1e-30) + g1, axis=1)
        neg_idx = jnp.argmax(jnp.log(diff.astype(jnp.float32) + 1e-30) + g2, axis=1)
        ok = (jnp.max(same, axis=1) & jnp.max(diff, axis=1)).astype(jnp.float32)
        return images[pos_idx], labels[pos_idx], images[neg_idx], labels[neg_idx], ok

    def loss(self, params, state, batch, rng):
        logits, feats, new_ms = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True
        )
        w = batch.get("weight")
        ce = masked_cross_entropy(logits, batch["label"], w, state.seen_mask)

        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        buf = state.mvars["buffer"]
        pos_idx, neg_idx, ok = self._mine(buf, batch["label"], state.task, k1)
        pos_src, pos_y_src = buf["bx"][pos_idx], buf["by"][pos_idx]
        neg_src, neg_y_src = buf["bx"][neg_idx], buf["by"][neg_idx]
        if self.use_minimal:
            # prefer in-batch pairs; fall back to the buffer where invalid
            mpx, mpy, mnx, mny, mok = self._mine_minimal(
                batch["image"], batch["label"], w, k4
            )
            use = mok[:, None, None, None] > 0
            pos_src = jnp.where(use, mpx, pos_src)
            neg_src = jnp.where(use, mnx, neg_src)
            pos_y_src = jnp.where(mok > 0, mpy, pos_y_src)
            neg_y_src = jnp.where(mok > 0, mny, neg_y_src)
            ok = jnp.maximum(ok, mok)
        px = self.augment(k2, pos_src, train=True)
        nx = self.augment(k3, neg_src, train=True)
        # ONE forward over [pos; neg] — the reference concatenates them into a
        # single batch (eraml.py:131-133 ``all_xs = torch.cat((pos_x, neg_x))``)
        # so BatchNorm statistics are shared across the pair sets
        b = px.shape[0]
        _, pn_h, _ = self.forward(
            params, state.mvars["model_state"],
            jnp.concatenate([px, nx], axis=0), train=True,
        )
        pos_h, neg_h = pn_h[:b], pn_h[b:]

        def norm(z):
            return z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-5)

        anchor = norm(feats)
        pos_h, neg_h = norm(pos_h), norm(neg_h)
        pos_y = pos_y_src
        neg_y = neg_y_src
        if w is not None:
            ok = ok * w
        # SupCon over {pos, neg} contrast set (eraml.py:75-110)
        contrast = jnp.concatenate([pos_h, neg_h], axis=0)  # (2B, D)
        contrast_y = jnp.concatenate([pos_y, neg_y], axis=0)
        anchors = jnp.concatenate([anchor, anchor], axis=0)
        anchor_y = jnp.concatenate([batch["label"], batch["label"]], axis=0)
        ok2 = jnp.concatenate([ok, ok], axis=0)
        sim = anchors @ contrast.T / self.temperature
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
        mask_pos = (anchor_y[:, None] == contrast_y[None, :]).astype(jnp.float32)
        mask_valid = ok2[None, :] * ok2[:, None]
        logexp = sim - jnp.log(
            jnp.sum(jnp.exp(sim) * mask_valid + 1e-30, axis=1, keepdims=True)
        )
        denom = jnp.maximum(jnp.sum(mask_pos * mask_valid, axis=1), 1.0)
        mlpp = jnp.sum(mask_pos * mask_valid * logexp, axis=1) / denom
        supcon = -(self.temperature / 0.07) * mlpp
        supcon = jnp.sum(supcon * ok2) / jnp.maximum(jnp.sum(ok2), 1.0)

        has_buf = (state.mvars["buffer"]["n_seen"] > 0).astype(jnp.float32)
        # reference eraml.py:122: supcon branch when t > 0 or
        # (task_free and buffer non-empty)
        task_gate = jnp.where(state.task > 0, 1.0, 0.0)
        use_supcon = (
            jnp.maximum(task_gate, has_buf) if self.task_free
            else task_gate * has_buf
        )
        loss = jnp.where(use_supcon > 0, supcon, ce)

        # replay CE on a random buffer sample — the ONLY term training the
        # classifier head once the supcon branch engages
        # (reference eraml.py:171-175: loss += F.cross_entropy(re_logits, y))
        rx, ry, rw = self.sample_replay(state.mvars["buffer"], k5, self.replay_amt)
        rx = self.augment(k6, rx, train=True)
        r_logits, _, _ = self.forward(
            params, state.mvars["model_state"], rx, train=True
        )
        re_ce = masked_cross_entropy(r_logits, ry, rw)
        replay_gate = jnp.where(state.task > 0, 1.0,
                                1.0 if self.task_free else 0.0)
        loss = loss + replay_gate * has_buf * re_ce
        return loss, {"logits": logits, "model_state": new_ms}
