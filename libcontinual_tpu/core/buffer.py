"""Replay buffers.

The reference keeps Python lists of image paths and rebuilds DataLoaders
(reference core/model/buffer/linearbuffer.py, linearherdingbuffer.py). Here a
buffer is a pair of numpy arrays on the host (images uint8 + labels); at task
start the trainer concatenates buffer arrays into the task arrays (one memcpy)
and the whole thing moves to device once — replay then happens through the
same in-graph gather path as ordinary batches.

Update strategies (reference core/model/buffer/update.py:7-80):
  * ``random``: uniform random subsample of (task data + old buffer) down to
    ``buffer_size`` (reference update.py:7-16 — no per-class quota);
  * ``herding``: iCaRL greedy mean-feature selection, run on device as a
    ``lax.fori_loop`` over the candidate set (the argmin chain is inherently
    sequential) using features from the method's backbone;
  * ``equal_random`` / ``balance_random``: class-balanced random quota
    (old exemplars re-subsampled at random, not by insertion order).

Online reservoir slabs (OCM's OnlineBuffer / ER's ERBuffer,
reference buffer/onlinebuffer.py, buffer/erbuffer.py) are *device-resident
state* owned by their methods — see methods/ocm.py and methods/er.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.data import native
from libcontinual_tpu.data.continual import TaskData
from libcontinual_tpu.registry import BUFFERS


@jax.jit
def _herding_order(feats: jax.Array) -> jax.Array:
    """iCaRL herding: greedily pick exemplars whose running mean tracks the
    class mean (reference buffer/update.py:62-78, linearherdingbuffer.py:78-163).

    feats: (N, D) L2-normalized features. Returns selection order (N,) int32;
    the first k entries are the chosen exemplars.
    """
    n, d = feats.shape
    mu = jnp.mean(feats, axis=0)

    def body(i, carry):
        chosen_sum, taken, order = carry
        # candidate running means if sample j were added next
        cand = (chosen_sum[None, :] + feats) / (i + 1.0)
        dist = jnp.sum((cand - mu[None, :]) ** 2, axis=1)
        dist = jnp.where(taken > 0, jnp.inf, dist)
        j = jnp.argmin(dist)
        return (
            chosen_sum + feats[j],
            taken.at[j].set(1),
            order.at[i].set(j),
        )

    init = (jnp.zeros((d,), feats.dtype), jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
    _, _, order = jax.lax.fori_loop(0, n, body, init)
    return order


class LinearBuffer:
    """Host-side exemplar store with fixed capacity
    (reference buffer/linearbuffer.py:4-28)."""

    def __init__(self, buffer_size: int = 0, batch_size: int = 128,
                 strategy: str = "herding", **_):
        self.buffer_size = int(buffer_size)
        self.batch_size = int(batch_size)
        self.strategy = strategy
        self.total_classes = 0
        self.images: Optional[np.ndarray] = None  # uint8 (M, H, W, 3)
        self.labels: Optional[np.ndarray] = None  # int32 (M,)

    def __len__(self):
        return 0 if self.labels is None else len(self.labels)

    def as_task_data(self) -> Optional[TaskData]:
        if self.labels is None or len(self.labels) == 0:
            return None
        return TaskData(
            images=self.images,
            labels=self.labels,
            class_lo=int(self.labels.min()),
            class_hi=int(self.labels.max()) + 1,
        )

    # ---------------------------------------------------------------- updates

    def update(
        self,
        task_data: TaskData,
        feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        seed: int = 0,
    ):
        """Post-task buffer update (dispatch mirroring reference
        trainer.py:409-418). ``feature_fn`` maps uint8 images -> features and
        is required for herding."""
        if self.buffer_size <= 0:
            return
        if self.strategy == "herding":
            assert feature_fn is not None, "herding needs a feature_fn"
            self._herding_update(task_data, feature_fn)
        elif self.strategy in ("random", "equal_random", "balance_random"):
            self._random_update(task_data, seed)
        else:
            # the reference trainer silently SKIPS unknown strategies
            # (trainer.py:413-418 has no else); failing here beats either
            # silent behavior — a typo'd strategy would otherwise change
            # exemplar semantics with no error
            raise ValueError(
                f"unknown buffer strategy {self.strategy!r}; expected one of "
                "herding/random/equal_random/balance_random"
            )

    def _quota(self) -> int:
        return self.buffer_size // max(self.total_classes, 1)

    def _shrink_old(self, per_cls: int, rng: Optional[np.random.RandomState] = None):
        """Subsample existing exemplars to the new per-class quota.  With
        ``rng`` None, keeps the first ``per_cls`` per class (reference
        linearherdingbuffer.py:55-76 — herding order makes prefixes the best
        exemplars); with an rng, subsamples each class at random (the right
        semantics for random-quota strategies, where insertion order carries
        no ranking)."""
        if self.labels is None:
            return
        keep = []
        for c in np.unique(self.labels):
            idx = np.nonzero(self.labels == c)[0]
            if rng is not None:
                idx = rng.permutation(idx)
            keep.append(idx[:per_cls])
        keep = np.concatenate(keep)
        self.images = native.gather_rows(self.images, keep)
        self.labels = self.labels[keep]

    def _append(self, images: np.ndarray, labels: np.ndarray):
        if self.labels is None:
            self.images, self.labels = images.copy(), labels.copy()
        else:
            self.images = native.concat_rows(self.images, images)
            self.labels = np.concatenate([self.labels, labels])

    def _herding_update(self, task_data: TaskData, feature_fn):
        per_cls = self._quota()
        self._shrink_old(per_cls)
        for c in range(task_data.class_lo, task_data.class_hi):
            sel = np.nonzero(task_data.labels == c)[0]
            if len(sel) == 0:
                continue
            feats = np.asarray(feature_fn(task_data.images[sel]), np.float32)
            feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
            order = np.asarray(_herding_order(jnp.asarray(feats)))
            pick = sel[order[: min(per_cls, len(sel))]]
            self._append(task_data.images[pick], task_data.labels[pick])

    def _random_update(self, task_data: TaskData, seed: int):
        rng = np.random.RandomState(seed)
        per_cls = self._quota()
        if self.strategy in ("equal_random", "balance_random"):
            self._shrink_old(per_cls, rng)
            for c in range(task_data.class_lo, task_data.class_hi):
                sel = np.nonzero(task_data.labels == c)[0]
                rng.shuffle(sel)
                pick = sel[:per_cls]
                self._append(task_data.images[pick], task_data.labels[pick])
        else:
            # reference update.py:7-16 exactly: uniform random subsample of
            # (task data + old buffer) down to buffer_size — no per-class
            # quota, no prefix-keeping
            if self.labels is None:
                pool_im, pool_lb = task_data.images, task_data.labels
            else:
                pool_im = native.concat_rows(task_data.images, self.images)
                pool_lb = np.concatenate([task_data.labels, self.labels])
            perm = rng.permutation(len(pool_lb))[: self.buffer_size]
            self.images = native.gather_rows(pool_im, perm)
            self.labels = pool_lb[perm].copy()


class LinearSpiltBuffer(LinearBuffer):
    """BiC's buffer with train/val splits
    (reference buffer/linearbuffer.py:16-28). ``split_ratio`` of each class's
    exemplars goes to the bias-correction validation set."""

    def __init__(self, buffer_size: int = 0, batch_size: int = 128,
                 strategy: str = "herding", split_ratio: float = 0.1, **kw):
        super().__init__(buffer_size, batch_size, strategy, **kw)
        self.split_ratio = float(split_ratio)

    def split(self, seed: int = 0):
        """Return (train_part, val_part) as TaskData or (None, None)."""
        if self.labels is None:
            return None, None
        rng = np.random.RandomState(seed)
        train_idx, val_idx = [], []
        for c in np.unique(self.labels):
            idx = np.nonzero(self.labels == c)[0]
            rng.shuffle(idx)
            # at least one val exemplar per class (the reference hardcodes
            # val_ratio=0.1, linearbuffer.py:22, so tiny classes still split),
            # but never empty a class's train side, and honor an explicit
            # split_ratio 0.0 (no held-out set — a config the reference
            # cannot express)
            if self.split_ratio <= 0.0 or len(idx) <= 1:
                n_val = 0
            else:
                n_val = max(1, int(len(idx) * self.split_ratio))
            n_val = min(n_val, len(idx) - 1)
            val_idx.append(idx[:n_val])
            train_idx.append(idx[n_val:])
        tr, va = np.concatenate(train_idx), np.concatenate(val_idx)
        mk = lambda idx: TaskData(
            images=self.images[idx],
            labels=self.labels[idx],
            class_lo=int(self.labels[idx].min()),
            class_hi=int(self.labels[idx].max()) + 1,
        )
        if len(va) == 0:
            return mk(tr), None
        return mk(tr), mk(va)


BUFFERS.register("LinearBuffer")(LinearBuffer)
BUFFERS.register("LinearHerdingBuffer")(
    lambda **kw: LinearBuffer(**{**kw, "strategy": "herding"})
)
BUFFERS.register("LinearSpiltBuffer")(LinearSpiltBuffer)
BUFFERS.register("OnlineBuffer")(LinearBuffer)  # methods own the device slabs
BUFFERS.register("ERBuffer")(LinearBuffer)


def build_buffer(config: Dict) -> LinearBuffer:
    node = config.get("buffer") or {"name": "LinearBuffer", "kwargs": {}}
    return BUFFERS.get(node["name"])(**(node.get("kwargs") or {}))
