"""Buffer unit tests: herding selection math + reservoir statistics."""

import numpy as np
import jax
import jax.numpy as jnp

from libcontinual_tpu.core.buffer import LinearBuffer, _herding_order
from libcontinual_tpu.data.continual import TaskData, imbalance_profile


def naive_herding(feats):
    """Reference greedy (buffer/update.py:62-78) in plain numpy."""
    n = len(feats)
    mu = feats.mean(0)
    chosen, total = [], np.zeros_like(mu)
    taken = np.zeros(n, bool)
    for i in range(n):
        cand = (total[None] + feats) / (i + 1)
        d = ((cand - mu) ** 2).sum(1)
        d[taken] = np.inf
        j = int(np.argmin(d))
        chosen.append(j)
        taken[j] = True
        total += feats[j]
    return chosen


def test_herding_order_matches_naive():
    rng = np.random.RandomState(0)
    feats = rng.randn(17, 5).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    got = np.asarray(_herding_order(jnp.asarray(feats))).tolist()
    assert got == naive_herding(feats)


def test_linear_buffer_quota_and_shrink():
    buf = LinearBuffer(buffer_size=8, strategy="equal_random")
    imgs = np.zeros((40, 4, 4, 3), np.uint8)
    labels = np.repeat(np.arange(4), 10).astype(np.int32)
    buf.total_classes = 4
    buf.update(TaskData(imgs, labels, 0, 4), seed=0)
    assert len(buf) == 8  # 2 per class
    for c in range(4):
        assert (buf.labels == c).sum() == 2


def test_random_update_uniform_subsample():
    """`random` = uniform subsample of (task data + old buffer) to
    buffer_size (reference buffer/update.py:7-16): class counts follow the
    pool's proportions statistically, NOT a per-class quota, and old
    exemplars are not kept by insertion-order prefix."""
    B = 60
    counts = np.zeros(6)
    for seed in range(30):
        buf = LinearBuffer(buffer_size=B, strategy="random")
        buf.total_classes = 2
        # task 0: classes 0,1 with 100 images each
        imgs0 = np.zeros((200, 2, 2, 3), np.uint8)
        lbl0 = np.repeat(np.arange(2), 100).astype(np.int32)
        buf.update(TaskData(imgs0, lbl0, 0, 2), seed=seed)
        assert len(buf) == B
        # task 1: classes 2..5 with 300 images each (pool 1200 + buffer 60)
        buf.total_classes = 6
        imgs1 = np.zeros((1200, 2, 2, 3), np.uint8)
        lbl1 = (2 + np.repeat(np.arange(4), 300)).astype(np.int32)
        buf.update(TaskData(imgs1, lbl1, 2, 6), seed=100 + seed)
        assert len(buf) == B
        for c in range(6):
            counts[c] += (buf.labels == c).sum()
    counts /= 30
    # expected: old classes ~ B*(30/1260) ≈ 1.43 each, new ~ B*(300/1260) ≈ 14.3
    assert counts[:2].mean() < 4, counts
    assert abs(counts[2:].mean() - 60 * 300 / 1260) < 3, counts


def test_reservoir_uniformity():
    from libcontinual_tpu.methods.er import reservoir_add

    cap = 32
    buf = {
        "bx": jnp.zeros((cap, 2, 2, 3), jnp.uint8),
        "by": jnp.zeros((cap,), jnp.int32),
        "bt": jnp.zeros((cap,), jnp.int32),
        "n_seen": jnp.zeros((), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    n_stream = 256
    images = jnp.zeros((n_stream, 2, 2, 3), jnp.uint8)
    labels = jnp.arange(n_stream, dtype=jnp.int32)
    tasks = jnp.zeros((n_stream,), jnp.int32)
    w = jnp.ones((n_stream,), jnp.float32)
    buf = reservoir_add(buf, images, labels, tasks, w, key)
    assert int(buf["n_seen"]) == n_stream
    # reservoir keeps a non-trivial spread over the whole stream
    kept = np.asarray(buf["by"])
    assert kept.max() > n_stream // 2


def test_imbalance_profiles_shapes():
    for t in ("exp", "exp_re", "exp_max", "half", "halfbal", "oneshot",
              "step", "fewshot", "none"):
        counts = imbalance_profile(t, 20, 5, 4, 4, img_max=100, imb_factor=0.1)
        assert len(counts) == 20
        assert all(c >= 0 for c in counts)
    exp = imbalance_profile("exp", 20, 5, 4, 4, 100, 0.01)
    assert exp[0] == 100 and exp[-1] == 1  # long tail


def test_unknown_strategy_raises():
    """Typo'd strategies must fail loudly (the reference silently SKIPS the
    buffer update, trainer.py:413-418; we used to silently run random)."""
    import numpy as np
    import pytest

    from libcontinual_tpu.core.buffer import LinearBuffer
    from libcontinual_tpu.data.continual import TaskData

    buf = LinearBuffer(buffer_size=8, batch_size=4, strategy="hering")
    buf.total_classes = 2
    td = TaskData(images=np.zeros((4, 2, 2, 3), np.uint8),
                  labels=np.asarray([0, 0, 1, 1], np.int32),
                  class_lo=0, class_hi=2)
    with pytest.raises(ValueError, match="unknown buffer strategy"):
        buf.update(td, seed=0)


def test_split_ratio_zero_disables_holdout():
    import numpy as np

    from libcontinual_tpu.core.buffer import LinearSpiltBuffer
    from libcontinual_tpu.data.continual import TaskData

    buf = LinearSpiltBuffer(buffer_size=8, batch_size=4, strategy="random",
                            split_ratio=0.0)
    buf.total_classes = 2
    td = TaskData(images=np.zeros((8, 2, 2, 3), np.uint8),
                  labels=np.asarray([0, 0, 0, 0, 1, 1, 1, 1], np.int32),
                  class_lo=0, class_hi=2)
    buf.update(td, seed=0)
    tr, va = buf.split(seed=0)
    assert va is None and len(tr.labels) == len(buf.labels)
