"""2-task micro-runs for the classic CL block (EWC/LwF/WA/iCaRL/LUCIR/DER/BiC).

Each test asserts the mechanics (state updates, loss finiteness, acc_table
shape, method-specific invariants), not paper-level accuracy — that's the
reproduce-config suite's job on real data.
"""

import copy

import numpy as np
import pytest

from libcontinual_tpu.core.trainer import Trainer


def make_cfg(tiny_config, name, extra_kwargs=None, buffer_size=32, strategy="random",
             **top):
    cfg = copy.deepcopy(tiny_config)
    cfg["classifier"] = {
        "name": name,
        "kwargs": {
            "num_class": 8,
            "feat_dim": 32,
            "init_cls_num": 4,
            "inc_cls_num": 4,
            "task_num": 2,
            **(extra_kwargs or {}),
        },
    }
    cfg["buffer"] = {
        "name": "LinearBuffer",
        "kwargs": {"buffer_size": buffer_size, "batch_size": 16, "strategy": strategy},
    }
    cfg["epoch"] = 3
    cfg.update(top)
    return cfg


def run(cfg):
    tr = Trainer(cfg)
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"][: cfg["task_num"]]).all()
    return tr, res


def test_ewc(tiny_config):
    cfg = make_cfg(tiny_config, "EWC", {"lamda": 10.0}, buffer_size=0)
    tr, res = run(cfg)
    fisher_norm = sum(
        float(np.abs(x).sum())
        for x in __import__("jax").tree_util.tree_leaves(tr.state.mvars["fisher"])
    )
    assert fisher_norm > 0  # fisher accumulated


def test_lwf(tiny_config):
    # lamda=3 is the reference's hardcoded distillation weight (lwf.py:65).
    # teacher_batch_stats=False runs the teacher on running BN stats (the
    # method's intended .eval() semantics) so the retention contract below
    # is testable: the reference-parity default (train-mode teacher, see
    # PARITY.md round-3) makes teacher targets batch-dependent, which on
    # this 4-new-class tiny protocol collapses retention to ~0 — in the
    # executing reference too.
    cfg = make_cfg(tiny_config, "LWF",
                   {"lamda": 3.0, "teacher_batch_stats": False}, buffer_size=0)
    cfg["epoch"] = 5
    tr, res = run(cfg)
    # distillation's contract is retention: task-0 accuracy survives task 1
    # well above naive finetune's ~0. (Threshold recalibrated after the
    # round-3 parity fix: task-0 CE now spans only the init_cls-wide head as
    # the reference does, so unseen columns keep their init values instead
    # of being suppressed — the old >50 reading came from that suppression.)
    assert res["acc_table"][1, 0] > 10.0
    assert res["acc_table"][1, 1] > 50.0  # plasticity preserved too


def test_wa(tiny_config):
    cfg = make_cfg(tiny_config, "WA", buffer_size=32, strategy="herding")
    tr, res = run(cfg)
    assert len(tr.buffer) > 0


def test_icarl_nme(tiny_config):
    cfg = make_cfg(tiny_config, "ICarl", buffer_size=32, strategy="herding")
    tr, res = run(cfg)
    assert float(tr.state.mvars["nme_ready"]) == 1.0
    means = np.asarray(tr.state.mvars["class_means"])
    # seen class means are unit-norm, unseen stay zero
    assert np.allclose(np.linalg.norm(means[:8], axis=1), 1.0, atol=1e-3)


def test_lucir(tiny_config):
    cfg = make_cfg(
        tiny_config, "LUCIR",
        {"K": 2, "lw_mr": 1.0, "dist": 0.5, "lamda": 5.0},
        buffer_size=32, strategy="herding",
    )
    tr, res = run(cfg)
    # old head columns frozen on task 1
    mask = np.asarray(tr.state.mvars["head_col_mask"])
    assert mask[:4].sum() == 0 and mask[4:8].sum() == 4


def test_der_frozen_extractor_untouched_by_weight_decay(tiny_config):
    """Old extractors must be bit-frozen even under optimizer weight decay
    (reference never touches frozen nets, der.py:90-134): grads are masked
    BEFORE tx.update, so add_decayed_weights would otherwise reintroduce
    wd*param updates for the frozen stack."""
    import jax

    cfg = make_cfg(tiny_config, "DER", buffer_size=32)
    cfg["optimizer"] = {
        "name": "SGD", "kwargs": {"lr": 0.05, "momentum": 0.9,
                                  "weight_decay": 5e-4},
    }
    tr = Trainer(cfg)
    # snapshot extractor 0 after task 0 finishes, before task 1 trains
    snaps = {}
    orig_before = tr.method.before_task

    def spy(state, task_idx, task_data):
        if task_idx == 1:
            snaps["t0"] = jax.tree_util.tree_map(
                lambda p: np.array(p[0]), state.params["backbone"]
            )
        return orig_before(state, task_idx, task_data)

    tr.method.before_task = spy
    tr.train_loop()
    after = jax.tree_util.tree_map(
        lambda p: np.asarray(p[0]), tr.state.params["backbone"]
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), snaps["t0"], after
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_der(tiny_config):
    cfg = make_cfg(tiny_config, "DER", buffer_size=32)
    tr, res = run(cfg)
    assert np.asarray(tr.state.mvars["active"]).sum() == 2
    # active-prefix slicing: the traced train program differs per task
    # (task-0 step runs ONE extractor, not task_num), so the trainer must
    # hold one compiled epoch fn per active-count
    assert tr.method.jit_key() == 2
    epoch_keys = [k for k in tr._jit_cache if k[0] == "epoch"]
    assert len(epoch_keys) == 2


def test_bic(tiny_config):
    cfg = make_cfg(tiny_config, "bic", buffer_size=48, strategy="random",
                   stage2_epoch=2)
    tr, res = run(cfg)
    alphas = np.asarray(tr.state.mvars["alphas"])
    betas = np.asarray(tr.state.mvars["betas"])
    # stage 2 actually moved the current task's bias params
    assert not (alphas[1] == 1.0 and betas[1] == 0.0)
