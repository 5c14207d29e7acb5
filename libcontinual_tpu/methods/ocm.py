"""OCM — Online Continual learning through Mutual Information maximization
(Guo et al., ICML 2022).

Parity with reference core/model/ocm.py (1018 LoC):
  * 16x rotation-family expansion: 4 inner half-image rotations x 4 global
    rot90s, with label offsets ``+1000*i`` building rotation-aware classes
    for the contrastive loss (ocm.py:685-715);
  * SimCLR-style in-graph augmentation of the expanded batch (the reference
    implements rotation/flip/jitter/crop as nn.Modules, ocm.py:105-531 — here
    they are the framework's native jax batch transforms);
  * supervised NT-Xent over [views; augmented views] with a random
    feature-map slice added into the similarity matrix (ocm.py:738-816);
  * incremental tasks: replay from a reservoir buffer + NT-Xent on replay +
    distillation against the frozen previous model (cosine contrast with the
    previous model's projections + MSE on old-class logits,
    ocm.py:939-986);
  * reservoir ``OnlineBuffer`` (reference buffer/onlinebuffer.py) as
    device-resident slabs in ``mvars``.

TPU notes: the 16x expansion is pure reshapes/rot90s (layout ops, VPU-cheap);
everything stays in one jitted step, scan-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.method import Method, masked_cross_entropy
from libcontinual_tpu.data import transforms as T
from libcontinual_tpu.methods.common import copy_tree
from libcontinual_tpu.methods.er import reservoir_add, sample_random
from libcontinual_tpu.registry import METHODS


def rot_inner_all(x):
    """4 half-image inner rotations (reference ocm.py:685-701). x: NHWC."""
    n, h, w, c = x.shape
    a = jnp.transpose(x, (0, 2, 1, 3))  # swap H/W like reference permute
    a = a.reshape(n, 2, h // 2, w, c)
    s1, s2 = a[:, 0], a[:, 1]  # halves
    rot2 = lambda z: jnp.rot90(z, 2, axes=(1, 2))
    variants = [
        (s1, s2),
        (rot2(s1), s2),
        (rot2(s1), rot2(s2)),
        (s1, rot2(s2)),
    ]
    outs = []
    for top, bot in variants:
        v = jnp.stack([top, bot], axis=1).reshape(n, h, w, c)
        outs.append(jnp.transpose(v, (0, 2, 1, 3)))
    # ordering mirrors reference: original, s1-rot, both-rot, s2-rot
    return jnp.concatenate([outs[0], outs[1], outs[2], outs[3]], axis=0)


def rotation_expand(x, y):
    """16x expansion with rotation-distinct labels (ocm.py:704-711)."""
    n = x.shape[0]
    X = rot_inner_all(x)  # 4n
    Xs = [X] + [jnp.rot90(X, k, axes=(1, 2)) for k in (1, 2, 3)]
    X16 = jnp.concatenate(Xs, axis=0)  # 16n
    y16 = jnp.tile(y, 16)
    offsets = jnp.repeat(jnp.arange(16) * 1000, n)
    return X16, y16 + offsets


def _nt_logm(sim_matrix, temperature, exclude_diag):
    """-log softmax-similarity matrix shared by all NT-Xent variants
    (reference ocm.py:748-755)."""
    sim_matrix = sim_matrix - jax.lax.stop_gradient(
        jnp.max(sim_matrix, axis=1, keepdims=True)
    )
    e = jnp.exp(sim_matrix / temperature)
    if exclude_diag:
        e = e * (1 - jnp.eye(sim_matrix.shape[0]))
    denom = jnp.sum(e, axis=1, keepdims=True)
    return -jnp.log(e / (denom + 1e-8) + 1e-8)


def _label_mask(labels1):
    mask = (labels1[:, None] == labels1[None, :]).astype(jnp.float32)
    return mask / (jnp.sum(mask, axis=1, keepdims=True) + 1e-8)


def nt_xent(sim_matrix, labels, temperature=0.07, mode="n"):
    """Supervised NT-Xent variants (reference ocm.py:738-785). ``labels`` has
    rows/2 entries (the aug pair repeats them).

    ``n`` (ocm.py:738-759): diagonal-EXCLUDED softmax; doubled label-mask sum
    plus the aug-pair positive diagonals.
    ``uni`` (ocm.py:762-780): diagonal KEPT; single label-mask sum, no
    positive term.
    """
    b = sim_matrix.shape[0] // 2
    labels1 = jnp.concatenate([labels, labels])
    mask = _label_mask(labels1)
    if mode == "uni":
        logm = _nt_logm(sim_matrix, temperature, exclude_diag=False)
        return jnp.sum(mask * logm) / (2 * b)
    logm = _nt_logm(sim_matrix, temperature, exclude_diag=True)
    loss1 = 2 * jnp.sum(mask * logm) / (2 * b)
    pos = jnp.sum(jnp.diag(logm[:b, b:]) + jnp.diag(logm[b:, :b])) / (2 * b)
    return pos + loss1


def nt_xent_pre(sim_matrix, labels, temperature=0.07):
    """Distillation NT-Xent against the previous model (ocm.py:787-811):
    label-masked like ``uni`` but with UNREPEATED labels (rows == len(labels))
    and the diagonal kept."""
    b = sim_matrix.shape[0] // 2
    logm = _nt_logm(sim_matrix, temperature, exclude_diag=False)
    return jnp.sum(_label_mask(labels) * logm) / (2 * b)


@METHODS.register("OCM")
class OCM(Method):
    concat_buffer = False
    # _cur_task drives the traced loss branch — must survive resume
    host_state_attrs = ("_cur_task",)

    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx)
        buf_kwargs = (config.get("buffer") or {}).get("kwargs") or {}
        self.capacity = int(buf_kwargs.get("buffer_size", 1000))
        self.buffer_batch_cap = int(self.kwargs.get("buffer_batch_size", 64))
        # reference ocm.py:870 hardcodes 7 exemplars-per-class for the replay
        # batch sizing rule (ocm.py:944)
        self.buffer_per_class = int(self.kwargs.get("buffer_per_class", 7))
        self._cur_task = 0
        self.proj_dim = min(128, int(self.kwargs.get("feat_dim", 512)) // 2 or 128)
        img = int(config.get("image_size", 32))
        self._simclr_aug = T.Pipeline([
            ("RandomResizedCrop", {"size": img, "scale": (0.6, 1.0)}),
            ("RandomHorizontalFlip", {}),
            ("ColorJitter", {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4}),
            ("RandomGrayscale", {"p": 0.2}),
        ])

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class)

    def augment(self, rng, images, train=True):
        # OCM owns its augmentation in-loss (reference feeds near-raw tensors
        # and augments on device, ocm.py:105-531); both paths use [0,1] images
        return images.astype(jnp.float32) / 255.0

    def init_state(self, rng, sample_input_hw):
        state = super().init_state(rng, sample_input_hw)
        k = jax.random.fold_in(rng, 77)
        params = dict(state.params)
        params["proj"] = {
            "kernel": jax.random.normal(k, (self.feat_dim, self.proj_dim)) * 0.02,
            "bias": jnp.zeros((self.proj_dim,)),
        }
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(params)  # teacher mirrors the full params
        return state.replace(
            params=params, opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
        )

    def init_mvars(self, rng, params, model_state):
        h = int(self.config.get("image_size", 32))
        return {
            "buffer": {
                "bx": jnp.zeros((self.capacity, h, h, 3), jnp.uint8),
                "by": jnp.zeros((self.capacity,), jnp.int32),
                "bt": jnp.zeros((self.capacity,), jnp.int32),
                "n_seen": jnp.zeros((), jnp.int32),
            },
            "teacher": copy_tree(params),
            "teacher_state": copy_tree(model_state),
        }

    # ----------------------------------------------------------------- hooks

    def before_task(self, state, task_idx, task_data):
        self._cur_task = int(task_idx)
        return state

    def jit_key(self):
        # task-0 vs incremental traces a different loss graph (reference
        # observe_first_task vs observe_incremental_tasks, ocm.py:900-903);
        # the replay batch size is a static shape that grows with seen classes
        return (self._cur_task > 0, self._buffer_batch())

    def _buffer_batch(self) -> int:
        """min(64, 7 * classes-seen) — reference ocm.py:944. The reference's
        class_holder grows within the first batches of each task; here the
        per-task value uses the full class count up front (a static shape —
        the holder reaches it within the first few steps there)."""
        seen = self.init_cls_num + self.inc_cls_num * self._cur_task
        return max(1, min(self.buffer_batch_cap, self.buffer_per_class * seen))

    def after_task(self, state, task_idx, task_data):
        mvars = dict(state.mvars)
        mvars["teacher"] = copy_tree(state.params)
        mvars["teacher_state"] = copy_tree(state.mvars["model_state"])
        return state.replace(mvars=mvars)

    def post_update(self, state, batch, aux):
        state = super().post_update(state, batch, aux)
        rng, sub = jax.random.split(state.rng)
        mvars = dict(state.mvars)
        mvars["buffer"] = reservoir_add(
            mvars["buffer"], batch["image"], batch["label"],
            jnp.full_like(batch["label"], state.task),
            batch.get("weight", jnp.ones_like(batch["label"], jnp.float32)),
            sub,
        )
        return state.replace(mvars=mvars, rng=rng)

    # ------------------------------------------------------------------ loss

    def _embed(self, params, model_state, x_float, train=True):
        out, new_ms = self.apply_backbone(params, model_state, x_float, train=train)
        f = out["features"]
        proj = f @ params["proj"]["kernel"] + params["proj"]["bias"]
        return f, proj, new_ms

    def _norm(self, z):
        return z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-8)

    def _slice_ids(self, k1, k2):
        """Random feature-map slice offsets (ocm.py:945-948 randperm picks)."""
        hi = max(self.feat_dim - self.proj_dim, 1)
        return jax.random.randint(k1, (), 0, hi), jax.random.randint(k2, (), 0, hi)

    def _contrast_loss(self, params, state, x_u8, y, rng, teacher=None, mode="n"):
        """NT-Xent over [rotations; simclr(rotations)] (ocm.py:915-935);
        the replay path uses ``uni`` + the ``pre`` teacher term
        (ocm.py:972-973)."""
        k1, k2 = jax.random.split(rng)
        xr, yr = rotation_expand(x_u8.astype(jnp.float32) / 255.0, y)
        xr_aug = self._simclr_aug(k1, xr)
        pair = jnp.concatenate([xr, xr_aug], axis=0)  # raw [0,1] inputs
        f, proj, new_ms = self._embed(params, state.mvars["model_state"], pair)
        simclr = self._norm(proj)
        fmap = self._norm(f[: pair.shape[0]])
        id1, _ = self._slice_ids(k2, k2)
        slice_f = jax.lax.dynamic_slice_in_dim(fmap, id1, self.proj_dim, axis=1)
        sim = simclr @ slice_f.T + simclr @ simclr.T
        loss = nt_xent(sim, yr, temperature=0.07, mode=mode)
        extra = None
        if teacher is not None:
            t_f, t_proj, _ = self._embed(
                teacher, state.mvars["teacher_state"], xr, train=self.teacher_train
            )
            pre = self._norm(jax.lax.stop_gradient(t_proj))
            sim_pre = simclr[: xr.shape[0]] @ pre.T
            extra = nt_xent_pre(sim_pre, yr, temperature=0.07)
        return loss, extra, new_ms

    def loss(self, params, state, batch, rng):
        if self._cur_task > 0:
            return self._loss_incremental(params, state, batch, rng)
        return self._loss_first(params, state, batch, rng)

    def _loss_first(self, params, state, batch, rng):
        """observe_first_task (ocm.py:912-936): CE on simclr-augmented inputs
        + NT-Xent over the rotation pair."""
        k1, k2 = jax.random.split(rng)
        x_u8, y, w = batch["image"], batch["label"], batch.get("weight")
        x_aug = self._simclr_aug(k1, x_u8.astype(jnp.float32) / 255.0)
        logits, _, new_ms = self.forward(
            params, state.mvars["model_state"], x_aug, train=True
        )
        # reference CE runs over the FULL fixed-width head — OCM_Model's
        # classifier is Linear(feat, num_class) from the start and observe
        # never column-masks it (ocm.py:827, 931-933)
        ce = masked_cross_entropy(logits, y, w)
        c_inc, _, _ = self._contrast_loss(params, state, x_u8, y, k2)
        return ce + c_inc, {"logits": logits, "model_state": new_ms}

    def _loss_incremental(self, params, state, batch, rng):
        """observe_incremental_tasks (ocm.py:939-986). The incoming and
        replay rotation pairs run through ONE forward over
        ``[pair; pair_r]`` (reference ocm.py:953-955 ``t = cat(images_pair,
        images_pair_r)``) so BatchNorm statistics are shared across the two
        sets; the loss is replay CE + three NT-Xent terms + old-logit MSE."""
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        # no incoming-batch CE (and hence no batch weight) here: the
        # reference's incremental observe computes only replay CE +
        # contrastive terms + MSE (ocm.py:939-986)
        x_u8, y = batch["image"], batch["label"]
        buf = state.mvars["buffer"]
        mx, my, mw = sample_random(buf, k1, self._buffer_batch())

        xr, yr = rotation_expand(x_u8.astype(jnp.float32) / 255.0, y)
        xr_r, yr_r = rotation_expand(mx.astype(jnp.float32) / 255.0, my)
        pair = jnp.concatenate([xr, self._simclr_aug(k2, xr)], axis=0)
        pair_r = jnp.concatenate([xr_r, self._simclr_aug(k3, xr_r)], axis=0)
        n_pair = pair.shape[0]
        f, proj, new_ms = self._embed(
            params, state.mvars["model_state"],
            jnp.concatenate([pair, pair_r], axis=0),
        )
        simclr = self._norm(proj[:n_pair])
        simclr_r = self._norm(proj[n_pair:])
        fmap = self._norm(f[:n_pair])
        fmap_r = self._norm(f[n_pair:])
        id1, id2 = self._slice_ids(k4, k5)
        s1 = jax.lax.dynamic_slice_in_dim(fmap, id1, self.proj_dim, axis=1)
        s2 = jax.lax.dynamic_slice_in_dim(fmap_r, id2, self.proj_dim, axis=1)
        sim = simclr @ s1.T + simclr @ simclr.T
        sim_r = simclr_r @ s2.T + simclr_r @ simclr_r.T
        c_inc = nt_xent(sim, yr, temperature=0.07, mode="n")
        c_rep = nt_xent(sim_r, yr_r, temperature=0.07, mode="uni")

        # distillation NT-Xent vs the previous model on the raw replay
        # rotations (ocm.py:956, 971-973)
        # reference previous_model runs in train mode during training (the
        # trainer's per-epoch model.train(), trainer.py:575) — batch stats
        _, t_proj, _ = self._embed(
            state.mvars["teacher"], state.mvars["teacher_state"], xr_r,
            train=self.teacher_train,
        )
        pre = self._norm(jax.lax.stop_gradient(t_proj))
        sim_pre = simclr_r[: xr_r.shape[0]] @ pre.T
        c_pre = nt_xent_pre(sim_pre, yr_r, temperature=0.07)

        # replay CE + old-class logit MSE vs teacher (ocm.py:977-980)
        mem_aug = self._simclr_aug(k6, mx.astype(jnp.float32) / 255.0)
        m_logits, _, _ = self.forward(
            params, state.mvars["model_state"], mem_aug, train=True
        )
        ce_mem = masked_cross_entropy(m_logits, my, mw)  # full head (ocm.py:977)
        t_logits, _, _ = self.forward(
            state.mvars["teacher"], state.mvars["teacher_state"], mem_aug,
            train=self.teacher_train,
        )
        # F.mse_loss over the prev_cls_num columns ONLY (ocm.py:978-980):
        # averaging over all num_class columns would shrink the distillation
        # strength by n_prev/num_class
        sq = (
            (m_logits - jax.lax.stop_gradient(t_logits))
            * state.prev_mask[None, :]
        ) ** 2
        n_prev = jnp.maximum(jnp.sum(state.prev_mask), 1.0)
        mse = jnp.sum(sq) / (m_logits.shape[0] * n_prev)

        # metric logits on the raw incoming batch (ocm.py:982-985)
        logits, _, _ = self.forward(
            params, state.mvars["model_state"],
            x_u8.astype(jnp.float32) / 255.0, train=True,
        )
        loss = ce_mem + c_inc + c_rep + c_pre + mse
        return loss, {"logits": logits, "model_state": new_ms}

    def eval_logits(self, state, x, task_id):
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        return jnp.where(state.seen_mask[None, :] > 0, logits, -1e30)
