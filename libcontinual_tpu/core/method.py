"""The Method protocol — the TPU-native re-design of the reference's 5-hook
``nn.Module`` API (reference core/model/finetune.py:4-51:
``before_task / observe / inference / after_task / get_parameters``).

Functional equivalent:

  hook            reference (torch)              here (JAX)
  --------------  -----------------------------  ---------------------------------
  before_task     mutates module, widens heads   (state, task, data) -> state
  observe         fwd+loss (+bwd for GPM fam.)   pure ``loss(params, state, batch)``
  optimizer.step  trainer-side torch.optim       optax chain inside ``train_step``
  grad surgery    in-observe .grad edits         ``transform_grads(grads, state)``
  after_task      herding/SVD/fisher on module   (state, task, data) -> state
  inference       fwd + argmax                   pure ``eval_logits(params, ...)``
  get_parameters  param-group lists              ``trainable_mask`` / ``lr_scale``

``train_step`` is compiled ONCE for the entire task sequence: the current
task, class masks, teachers, buffers etc. are arrays in ``TrainState``; the
per-step learning rate is an input (so every scheduler, including the
loss-reactive PatienceSchedule, reuses the same program). The trainer can run
a whole epoch as one ``lax.scan`` over gathered device-resident batches.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from libcontinual_tpu.core.optim import make_optimizer
from libcontinual_tpu.core.state import TrainState, make_masks
from libcontinual_tpu.data.transforms import build_transform
from libcontinual_tpu.models import backbone_feat_dim, get_backbone


def masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weight: Optional[jax.Array] = None,
    class_mask: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Weighted-mean CE; ``class_mask`` (num_class,) excludes classes by
    setting their logits to -inf (the reference's masking idiom,
    e.g. l2p.py:92-99). ``label_smoothing`` matches torch's
    ``F.cross_entropy(..., label_smoothing=s)`` — ``(1-s)·NLL + (s/K)·Σ_c
    -log p_c`` with K the number of (unmasked) classes."""
    if class_mask is not None:
        logits = jnp.where(class_mask[None, :] > 0, logits, -1e30)
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        if class_mask is not None:
            valid = (class_mask > 0).astype(ll.dtype)[None, :]
            smooth = -jnp.sum(ll * valid, axis=-1) / jnp.maximum(
                jnp.sum(valid, axis=-1), 1.0
            )
        else:
            smooth = -jnp.mean(ll, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if weight is None:
        return jnp.mean(nll)
    return jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def weighted_accuracy(logits, labels, weight=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weight is None:
        return jnp.mean(correct)
    return jnp.sum(correct * weight) / jnp.maximum(jnp.sum(weight), 1.0)


class Method:
    """Base class; ``Finetune`` semantics by default (backbone + linear head,
    plain CE on the full head, reference core/model/finetune.py:15-25)."""

    # --- capability flags consulted by the trainer ---
    scan_safe: bool = True  # epoch can run as one lax.scan
    concat_buffer: bool = True  # LinearBuffer concat-into-task-data semantics
    #: extra host-side attribute names persisted by checkpoint/resume
    #: (core/ckpt.py adds these to its default list) — any host state a
    #: method keeps outside the TrainState pytree must be declared here
    host_state_attrs: tuple = ()
    validate_enabled: bool = True  # reference disables val for some methods
    #: enforced by the trainer: ``setting: task-aware`` configs error out on
    #: methods that cannot honor task ids at eval
    supports_task_aware: bool = True
    #: documentation of reference behavior only — per-iteration LR stepping
    #: is a property of the SCHEDULER (CosineAnnealingWarmUp's step_lrs
    #: computes per-step values; optim.py ScheduleController.per_iteration),
    #: not something the trainer keys off this flag for
    per_iter_scheduler: bool = False

    def __init__(self, config: Dict[str, Any], mesh_ctx=None):
        self.config = config
        self.mesh_ctx = mesh_ctx
        ck = (config.get("classifier") or {}).get("kwargs") or {}
        self.num_class = int(
            ck.get("num_class")
            or config["init_cls_num"] + config["inc_cls_num"] * (config["task_num"] - 1)
        )
        self.task_num = int(config["task_num"])
        self.init_cls_num = int(config["init_cls_num"])
        self.inc_cls_num = int(config["inc_cls_num"])
        self.kwargs = ck
        # Reference-parity default: the reference trainer's per-epoch
        # model.train() (reference trainer.py:575) leaves distillation
        # teachers in train mode, so their BN targets use the CURRENT
        # batch's statistics (PARITY.md round-3 systemic finding). Set
        # ``teacher_batch_stats: false`` to run teachers on running stats
        # instead — the method authors' intended .eval() semantics.
        self.teacher_train = bool(ck.get("teacher_batch_stats", True))
        self.dtype = (
            jnp.bfloat16 if str(config.get("dtype", "bfloat16")) == "bfloat16" else jnp.float32
        )
        self.backbone = self.build_backbone()
        try:
            self.feat_dim = int(ck.get("feat_dim") or backbone_feat_dim(config))
        except ValueError:
            self.feat_dim = 0
        self._build_pipelines()
        self._build_optimizers()

    # ------------------------------------------------------------- components

    def build_backbone(self):
        return get_backbone(self.config)

    def _backbone_kind(self) -> str:
        name = self.config["backbone"]["name"].lower()
        if "vit" in name or "sinet" in name:
            return "vit"
        if "alexnet" in name:
            return "alexnet"
        if "clip" in name:
            return "clip"
        return "resnet"

    def _build_pipelines(self):
        cfg = self.config
        common = dict(
            dataset=str(cfg.get("dataset", "cifar100")),
            backbone=self._backbone_kind(),
            image_size=int(cfg.get("image_size", 32)),
        )
        self.train_pipeline = build_transform(
            cfg.get("train_trfms"), mode="train", **common
        )
        self.test_pipeline = build_transform(
            cfg.get("test_trfms"), mode="test", **common
        )
        if not cfg.get("augment", True):
            # reference headers/data.yaml `augment:` flag disables train-time
            # augmentation (eval transforms everywhere)
            self.train_pipeline = self.test_pipeline

    def _build_optimizers(self):
        cfg = self.config
        self.tx = make_optimizer(
            cfg["optimizer"]["name"], cfg["optimizer"].get("kwargs") or {}
        )
        self.init_tx = (
            make_optimizer(
                cfg["init_optimizer"]["name"], cfg["init_optimizer"].get("kwargs") or {}
            )
            if "init_optimizer" in cfg
            else None
        )

    # ------------------------------------------------------------------ state

    def init_mvars(self, rng, params, model_state) -> Dict[str, Any]:
        """Method-owned variables. Subclasses extend; must keep a constant
        pytree structure across the whole run."""
        return {}

    def head_module(self):
        from libcontinual_tpu.models.heads import LinearHead

        return LinearHead(self.num_class)

    def model_input(self, sample_input_hw: Tuple[int, int, int]) -> jax.Array:
        """Dummy model input AFTER the eval transform pipeline (which may
        resize, e.g. 32x32 storage -> 224x224 ViT input)."""
        h, w, c = sample_input_hw
        return self.test_pipeline(None, jnp.zeros((2, h, w, c), jnp.uint8))

    def init_state(self, rng: jax.Array, sample_input_hw: Tuple[int, int, int]) -> TrainState:
        # k4 (not the consumed parent) becomes the carried state.rng:
        # storing `rng` itself would make the first train_step's split
        # reproduce k1..k3 exactly, correlating augmentation/dropout draws
        # with the weight-initialization keys
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        dummy = self.model_input(sample_input_hw)
        variables = self.backbone.init(k1, dummy, train=False)
        params = {"backbone": variables["params"]}
        model_state = {
            k: v for k, v in variables.items() if k != "params"
        }  # e.g. batch_stats
        head = self.head_module()
        if head is not None:
            feats = jnp.zeros((2, self.feat_dim), jnp.float32)
            params["head"] = head.init(k2, feats)["params"]
            self._head = head
        else:
            self._head = None
        seen, prev = make_masks(self.num_class, 0, self.init_cls_num)
        mvars = {"model_state": model_state}
        mvars.update(self.init_mvars(k3, params, model_state))
        state = TrainState(
            params=params,
            opt_state=self._tx_for_task(0).init(params),
            mvars=mvars,
            rng=k4,
            step=jnp.zeros((), jnp.int32),
            task=jnp.zeros((), jnp.int32),
            seen_mask=seen,
            prev_mask=prev,
        )
        return state

    def _tx_for_task(self, task_idx: int) -> optax.GradientTransformation:
        if task_idx == 0 and self.init_tx is not None:
            return self.init_tx
        return self.tx

    def reset_optimizer(self, state: TrainState, task_idx: int) -> TrainState:
        """Fresh optimizer state per task (reference trainer.py:294)."""
        return state.replace(opt_state=self._tx_for_task(task_idx).init(state.params))

    # ------------------------------------------------------------------ hooks

    def start_task(self, state: TrainState, task_idx: int, class_lo: int, class_hi: int) -> TrainState:
        """Trainer-called: update task scalar + class masks, then delegate to
        ``before_task``."""
        seen, prev = make_masks(self.num_class, class_lo, class_hi)
        return state.replace(
            task=jnp.asarray(task_idx, jnp.int32), seen_mask=seen, prev_mask=prev
        )

    def before_task(self, state: TrainState, task_idx: int, task_data) -> TrainState:
        return state

    def after_task(self, state: TrainState, task_idx: int, task_data) -> TrainState:
        return state

    def on_buffer_updated(self, state: TrainState, task_idx: int, buffer) -> TrainState:
        """Called after the trainer refreshed the exemplar buffer (iCaRL
        recomputes exemplar class means here, reference icarl.py:226-287)."""
        return state

    def extra_phases(self, trainer, state: TrainState, task_idx: int, task_data) -> TrainState:
        """Method-owned extra training phases after the main loop — the clean
        generalization of the trainer's BiC stage-2 special case
        (reference trainer.py:421-455)."""
        return state

    def jit_key(self):
        """Extra component of the trainer's train-step jit-cache key. Methods
        whose *traced* computation legitimately changes across tasks (e.g.
        DER's active-prefix extractor slicing) return a per-task value here to
        force a retrace; the default None keeps one compiled program for the
        whole task sequence."""
        return None

    def eval_jit_key(self):
        """Like ``jit_key`` but for the trainer's EVAL programs. Methods whose
        eval trace should be bounded by the tasks learned so far (e.g.
        CL-LoRA's per-task diagonal forwards) return that count here; the
        default None keeps one task-agnostic eval trace."""
        return None

    def epochs_for_task(self, task_idx: int, default: int) -> int:
        """Per-task epoch override (RanPAC trains only the first session,
        reference ranpac.py:176-180)."""
        return default

    def build_train_data(self, task_data, buffer, task_idx):
        """Method-specific stage-1 training data, or None for the trainer's
        default (task data + optional buffer concat). BiC holds out a
        classwise split here (reference bic.py spilt_and_update)."""
        return None

    def override_schedule(self, task_idx: int, steps_per_epoch: int, epochs: int):
        """Return a ScheduleController to replace the config one, or None —
        the clean version of the trainer's per-method optimizer overrides
        (reference trainer.py:297-303, 324-327)."""
        return None

    # ----------------------------------------------------------- pure compute

    def apply_backbone(self, params, model_state, x, train: bool, rng=None):
        """Run the backbone; returns (features_dict, new_model_state).
        ``rng`` feeds dropout when the backbone uses it."""
        variables = {"params": params["backbone"], **model_state}
        # "moe" feeds noisy top-k gating in MoE-adapter blocks (unused
        # collections are ignored by flax)
        rngs = {"dropout": rng, "moe": rng} if (train and rng is not None) else None
        if train and model_state:
            out, new_state = self.backbone.apply(
                variables, x, train=True, mutable=list(model_state.keys()),
                rngs=rngs,
            )
            return out, new_state
        out = self.backbone.apply(variables, x, train=train, rngs=rngs)
        return out, model_state

    def forward(self, params, model_state, x, train: bool, rng=None):
        """features -> logits through the method's head."""
        out, new_state = self.apply_backbone(params, model_state, x, train, rng)
        feats = out["features"]
        logits = self._head.apply({"params": params["head"]}, feats)
        return logits, feats, new_state

    def augment(self, rng, images, train: bool = True):
        pipeline = self.train_pipeline if train else self.test_pipeline
        return pipeline(rng if train else None, images)

    def loss(self, params, state: TrainState, batch, rng) -> Tuple[jax.Array, Dict]:
        """Default: plain CE on the full head (Finetune observe,
        reference finetune.py:15-25)."""
        logits, feats, new_model_state = self.forward(
            params, state.mvars["model_state"], batch["x"], train=True, rng=rng
        )
        ce = masked_cross_entropy(logits, batch["label"], batch.get("weight"))
        return ce, {
            "logits": logits,
            "features": feats,
            "model_state": new_model_state,
        }

    def transform_grads(self, grads, state: TrainState):
        return grads

    def transform_updates(self, updates, state: TrainState):
        """Hook on the *optimizer output* (post-Adam), for methods that
        project updates rather than gradients (LoRAsub's DRS-Adam,
        reference lora_sub.py:70-233)."""
        return updates

    def trainable_mask(self, state: TrainState):
        """0/1 pytree matching params, or None for all-trainable."""
        return state.mvars.get("trainable_mask")

    def post_update(self, state: TrainState, batch, aux) -> TrainState:
        """After the optimizer step (reservoir adds etc.). Must preserve
        pytree structure."""
        if "model_state" in aux:
            mvars = dict(state.mvars)
            mvars["model_state"] = aux["model_state"]
            state = state.replace(mvars=mvars)
        return state

    # ------------------------------------------------------------- train step

    def train_step(self, state: TrainState, batch, lr, tx=None):
        tx = tx or self.tx
        rng, aug_rng, loss_rng = jax.random.split(state.rng, 3)
        batch = dict(batch)
        batch["x"] = self.augment(aug_rng, batch["image"], train=True)

        def lfn(p):
            return self.loss(p, state, batch, loss_rng)

        (loss, aux), grads = jax.value_and_grad(lfn, has_aux=True)(state.params)
        grads = self.transform_grads(grads, state)
        mask = self.trainable_mask(state)
        if mask is not None:
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = self.transform_updates(updates, state)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        if mask is not None:
            updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params, opt_state=opt_state, rng=rng, step=state.step + 1
        )
        state = self.post_update(state, batch, aux)
        metrics = {
            "loss": loss,
            "acc": weighted_accuracy(
                aux["logits"], batch["label"], batch.get("weight")
            ),
        }
        return state, metrics

    def task_range_mask(self, task_id) -> jax.Array:
        """(num_class,) mask of the classes belonging to traced ``task_id``
        (-1 -> all classes)."""
        idx = jnp.arange(self.num_class)
        lo = jnp.where(
            task_id <= 0,
            0,
            self.init_cls_num + (task_id - 1) * self.inc_cls_num,
        )
        size = jnp.where(task_id == 0, self.init_cls_num, self.inc_cls_num)
        in_task = (idx >= lo) & (idx < lo + size)
        return jnp.where(task_id < 0, jnp.ones_like(idx, jnp.float32), in_task.astype(jnp.float32))

    # -------------------------------------------------------------- inference

    def eval_logits(self, state: TrainState, x, task_id) -> jax.Array:
        """Logits for evaluation. ``task_id`` is a traced int32 scalar; -1
        means task-agnostic."""
        logits, _, _ = self.forward(
            state.params, state.mvars["model_state"], x, train=False
        )
        return logits

    def eval_step(self, state: TrainState, batch, task_id):
        x = self.augment(None, batch["image"], train=False)
        logits = self.eval_logits(state, x, task_id)
        return jnp.argmax(logits, axis=-1)

    def herding_features(self, state: TrainState, x) -> jax.Array:
        """Features used by the herding buffer update (overridable by methods
        whose backbone params aren't a plain single-net tree, e.g. DER)."""
        out, _ = self.apply_backbone(
            state.params, state.mvars["model_state"], x, train=False
        )
        return out["features"]
