"""Trainer-level lockstep differential #6: a FULL 2-task GPM run — the
gradient-projection family — against the executing reference
(core/model/gpm.py, core/trainer.py:593-606).

Seams pinned here that the step-level projected-grad differential cannot:

  * the zero_grad-BEFORE-observe / backward-inside-observe / projection-
    BETWEEN-backward-and-step ordering (reference trainer.py:593-596: GPM
    is in the methods-that-backward-inside-observe branch; the projection
    mutates .grad in observe, AFTER backward, BEFORE optimizer.step);
  * feature_mat built at before_task from the feature_list grown at
    after_task (gpm.py:117-129) — i.e. task t trains under the subspace
    accumulated through task t-1, never its own;
  * BN parameters frozen on incremental tasks (gpm.py:134-138) — via
    trainable_mask here, so neither gradients nor optimizer-chain updates
    touch them;
  * the after_task representation pass: eval-mode capture over the task's
    samples, conv-input im2col, threshold-0.97+0.003t SVD subspace growth
    (gpm.py:131-204) — executed by the REFERENCE's own loops on the same
    pinned sample order, then compared as sign/rotation-invariant
    projectors U U^T plus exact subspace ranks;
  * task-aware (TIL) evaluation: logits[task_id].argmax + class offset
    (gpm.py:85-103) vs my task_range_mask eval.

RNG pinning: the reference's 125-sample selection is ``torch.randperm``
from the live global RNG (gpm.py:140-142) — the loader here yields MY
seeded selection in MY order and ``torch.randperm`` is patched to identity
for the after_task call (order matters: the conv mats slice the first
24/100/100 samples, gpm.py:146). Dropout is constructed at 0.0 on both
sides (rates are ctor args upstream, alexnet.py:96).

Protocol: PIECEWISE lockstep as test_trainer_lockstep_icarl.py — my
trainer runs first capturing epoch-end states; torch replays the reference
loop re-synced from those captures, asserting per-step losses and
epoch-end params from every common start.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _refload
import _refsync as S

DEV = torch.device("cpu")
INIT, INC, TASKS = 4, 4, 2
NUM_CLASS = 8
FEAT = 2048
# >= 125 samples/task: the reference's conv-mat loops hardcode slicing the
# first 24/100/100 capture samples (gpm.py:146,160-171) and CRASH below
# 100 — so the real 125-of-N selection path is exercised here. Batch 32
# keeps the piecewise horizon at 4 steps/epoch: AlexNet's per-step fp
# chaos is far above the resnet locksteps' (track_running_stats=False
# BatchNorm1d over 2048 features + maxpool ties routing gradients to
# different-but-equal cells), measured ~1e-3 by step 3 at batch 8.
BATCH = 32
EPOCHS0, EPOCHS1 = 3, 2
PER_CLASS = 32
LR, MOM, SEED = 0.01, 0.9, 47
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
TOL_PARAM = 2e-3
PROJ_TOL = 1e-3


def _my_config():
    from libcontinual_tpu.config import Config

    return Config(overrides={
        "dataset": "synthetic", "data_root": "", "image_size": 32,
        "task_num": TASKS, "init_cls_num": INIT, "inc_cls_num": INC,
        "epoch": EPOCHS1, "init_epoch": EPOCHS0, "batch_size": BATCH,
        "per_class": PER_CLASS, "seed": SEED, "val_per_epoch": 0,
        "testing_times": 1, "dtype": "float32", "setting": "task-aware",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "AlexNet_TRGP",
                     "kwargs": {"dropout1": 0.0, "dropout2": 0.0}},
        "classifier": {"name": "GPM", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": BATCH,
                              "strategy": "random"}},
        "optimizer": {"name": "SGD", "kwargs": {"lr": LR, "momentum": MOM}},
        "lr_scheduler": {"name": "MultiStepLR",
                         "kwargs": {"milestones": [2], "gamma": 0.1}},
        "warmup": 0,
    }).get_config_dict()


def _to_torch(img_u8):
    x = img_u8.astype(np.float32) / 255.0
    x = (x - MEAN) / STD
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


def _randomize_torch(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05, generator=g)
            elif isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)


def _host_tree(t):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), jax.device_get(t))


def _find_trace(opt_state):
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "trace")):
        if hasattr(part, "trace"):
            return part.trace
    raise AssertionError("SGD momentum trace not found in opt_state")


class _CaptureLoader:
    """The loader contract gpm.after_task reads: iteration over
    {'image': ...} batches, concatenated then 125-subsampled (pinned here
    by yielding MY selection in MY order + identity randperm)."""

    def __init__(self, imgs_u8):
        self._imgs = imgs_u8

    def __iter__(self):
        yield {"image": _to_torch(self._imgs)}


def _my_capture_order(task_data, seed, n_sample=125):
    rng = np.random.RandomState(seed)
    return rng.permutation(len(task_data))[:n_sample]


def test_gpm_two_task_lockstep(tmp_path, monkeypatch):
    ref_alex = _refload.ref_module("core.model.backbone.alexnet")
    ref_gpm = _refload.ref_module("core.model.gpm")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side (dropout constructed at 0 on both sides)
    torch.manual_seed(53)
    tm = ref_gpm.GPM(
        ref_alex.AlexNet_TRGP(dropout_rate_1=0.0, dropout_rate_2=0.0), DEV,
        init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS)
    _randomize_torch(tm.network, 921)

    # p=0 nn.Dropout is a pure passthrough, so the non-contiguous maxpool
    # view reaches alexnet.py:144's .view() and crashes; the upstream p>0
    # train path materializes a contiguous copy at the same spot — this
    # identity shim reproduces that side effect without the RNG
    class _Contig(torch.nn.Module):
        def forward(self, x):
            return x.contiguous()

    tm.network.backbone.dropout1 = _Contig()
    tm.network.backbone.dropout2 = _Contig()

    # ---- my side: full Trainer; weights from torch
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    bb = jax.tree_util.tree_map(
        jnp.asarray, S.sync_alexnet(tm.network.backbone))
    hk = np.zeros((FEAT, NUM_CLASS), np.float32)
    for t_, fc in enumerate(tm.network.classifiers):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hi = lo + (INIT if t_ == 0 else INC)
        hk[:, lo:hi] = S.lin_k(fc.weight)
    params = {"backbone": bb,
              "head": {"Dense_0": {"kernel": jnp.asarray(hk)}}}
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(trainer.state.params), (
            "GPM param structure changed; update the lockstep sync")
    trainer.state = trainer.state.replace(params=params)

    captures = {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "trace": _host_tree(_find_trace(state.opt_state)),
            "losses": np.asarray(step_losses, np.float64),
        }

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    my_feature_list = [np.array(u) for u in trainer.method._feature_list]
    assert set(captures) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    # inverse pairing: backbone + per-task head slices
    perms = S.alex_perms()
    pairs = S.alexnet_param_pairs(tm.network.backbone, perms)

    def _write_heads(cap_params):
        k = np.asarray(cap_params["head"]["Dense_0"]["kernel"], np.float32)
        with torch.no_grad():
            for t_, fc in enumerate(tm.network.classifiers):
                lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
                hi = lo + (INIT if t_ == 0 else INC)
                fc.weight.copy_(torch.from_numpy(k[:, lo:hi].T.copy()))

    def _write_head_momentum(cap_trace, optim):
        k = np.asarray(cap_trace["head"]["Dense_0"]["kernel"], np.float32)
        for t_, fc in enumerate(tm.network.classifiers):
            lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
            hi = lo + (INIT if t_ == 0 else INC)
            optim.state[fc.weight]["momentum_buffer"] = torch.from_numpy(
                k[:, lo:hi].T.copy())

    def _resync(cap, optim=None):
        S.write_param_pairs(pairs, cap["params"])
        _write_heads(cap["params"])
        if optim is not None:
            S.write_momentum(pairs, cap["trace"], optim)
            _write_head_momentum(cap["trace"], optim)

    # ---- torch side: the reference loop, same data + batch order
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        tm.before_task(task, None, None, None)  # builds feature_mat, BN flags
        optim = torch.optim.SGD(
            [p for p in tm.network.parameters() if p.requires_grad],
            lr=LR, momentum=MOM)
        schedr = torch.optim.lr_scheduler.MultiStepLR(
            optim, milestones=[2], gamma=0.1)
        epochs = EPOCHS0 if task == 0 else EPOCHS1
        n = len(labels)
        assert n % BATCH == 0
        steps = n // BATCH
        for epoch in range(epochs):
            if epoch > 0:
                _resync(captures[(task, epoch - 1)], optim)
            tm.train()  # trainer.py:574
            perm = native.shuffled_indices(n, SEED + task * 100003 + epoch)
            losses = []
            for s in range(steps):
                rows = perm[s * BATCH:(s + 1) * BATCH]
                batch = {"image": _to_torch(imgs[rows]),
                         "label": torch.from_numpy(labels[rows])}
                optim.zero_grad()  # trainer.py:593-595 (GPM branch)
                _, _, loss = tm.observe(batch)  # backward + projection inside
                optim.step()
                losses.append(float(loss.detach()))
            schedr.step()
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine "
                f"{cap['losses'].tolist()}")
            t_bb = S.sync_alexnet(tm.network.backbone)
            dp = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                t_bb, cap["params"]["backbone"])))
            k = np.asarray(cap["params"]["head"]["Dense_0"]["kernel"])
            for t_, fc in enumerate(tm.network.classifiers):
                lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
                hi = lo + (INIT if t_ == 0 else INC)
                dp = max(dp, float(np.abs(
                    S.lin_k(fc.weight) - k[:, lo:hi]).max()))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # pin torch to my end-of-task state, then run the reference
        # boundary machinery on the same pinned sample order
        _resync(captures[(task, epochs - 1)])
        order = _my_capture_order(td, SEED)
        monkeypatch.setattr(
            torch, "randperm", lambda n_, _orig=torch.randperm: torch.arange(n_))
        try:
            tm.after_task(task, None, _CaptureLoader(imgs[order]), None)
        finally:
            monkeypatch.undo()
        # eval: the reference task-aware inference (logits[t].argmax + bias).
        # AlexNet's BN has track_running_stats=False, so EVAL accuracy
        # depends on the eval batch composition — iterate the same
        # batch-of-BATCH order my trainer's eval scan uses
        tm.network.eval()
        for t_prev in range(task + 1):
            te = trainer.test_stream.task(t_prev)
            n_te = len(te.labels)
            assert n_te % BATCH == 0
            correct = 0
            for s in range(n_te // BATCH):
                sl = slice(s * BATCH, (s + 1) * BATCH)
                batch = {"image": _to_torch(te.images[sl]),
                         "label": torch.from_numpy(
                             te.labels[sl].astype(np.int64))}
                with torch.no_grad():
                    pred, _ = tm.inference(batch, task_id=t_prev)
                correct += int(np.sum(pred.numpy() == te.labels[sl]))
            t_acc_table[task, t_prev] = round(100.0 * correct / n_te, 2)

    print(f"lockstep drift: max step-loss {drift['loss']:.2e} "
          f"max epoch-end param {drift['param']:.2e}")

    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")

    # ---- end-state artifacts: the grown subspaces ------------------------
    # ranks exact; spans compared as sign/rotation-invariant projectors
    # mapped across the two flatten orders (perm[torch_idx] = my_idx)
    assert len(tm.feature_list) == len(my_feature_list) == 5
    worst = 0.0
    for i, (u_ref, u_mine, perm) in enumerate(
            zip(tm.feature_list, my_feature_list, perms)):
        u_ref = np.asarray(u_ref)
        assert u_ref.shape == u_mine.shape, (
            f"layer {i} subspace rank diverged: "
            f"ref {u_ref.shape} vs mine {u_mine.shape}")
        p_ref = u_ref @ u_ref.T
        p_mine = u_mine @ u_mine.T
        d = float(np.abs(p_mine[perm][:, perm] - p_ref).max())
        worst = max(worst, d)
        assert d <= PROJ_TOL, (
            f"layer {i} subspace projector diverged: max |diff| {d:.2e}")
    print(f"subspace projector worst |diff| {worst:.2e}")
