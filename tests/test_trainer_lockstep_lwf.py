"""Trainer-level lockstep differential: a FULL 2-task LwF run — the
pure-distillation family (no buffer, no rehearsal) — against the executing
reference method under the reference trainer-loop semantics
(reference core/model/lwf.py, core/trainer.py:259-614).

Seams this lockstep pins that the step-level loss differential
(test_reference_loss_parity.py::test_lwf_loss_task1) cannot:

  * old_backbone/old_fc snapshot TIMING: the reference deepcopies the
    backbone at before_task of task>0 (lwf.py:48-49) and the
    PRE-expansion classifier inside update_fc (lwf.py:31-33) — i.e. the
    KD teacher is the end-of-previous-task state, not the epoch-start
    state; my mvars["teacher"] copy at before_task must land on the same
    trajectory point (methods/lwf.py:40-46);
  * per-task head expansion with weight carry-over (lwf.py:28-40: a new
    Linear(feat, total) whose first known rows/bias are copied from the
    old head) vs my fixed-width masked head — the copy geometry is
    asserted implicitly by every task-1 step loss and epoch-end param;
  * the task>0 CE restricted to NEW columns with fake targets
    (lwf.py:61-63) riding on top of the 3x T=2 KD of the OLD columns
    over a whole trajectory of optimizer steps;
  * the reference trainer's model.train() each epoch flipping the frozen
    teacher back to train mode (trainer.py:574) — teacher targets use the
    current batch's BN statistics all run long;
  * per-task SGD(momentum, weight_decay) re-init over backbone+classifier
    only (finetune.py:47-51 — old_backbone/old_fc excluded), per-epoch
    StepLR stepping (trainer.py:404), and the init_epoch/epoch split;
  * eval argmax over the grown-width head (finetune.py:27-36) vs my
    unseen-column masking (methods/lwf.py:75-80), and the acc_table.

Protocol — PIECEWISE lockstep, exactly as test_trainer_lockstep_icarl.py
(see there for the fp-chaos measurement that makes a whole-trajectory
f32 comparison physically impossible): my trainer runs first capturing
epoch-end states via ``Trainer.epoch_hook`` (params + batch_stats +
momentum trace + per-step losses); the torch side replays the reference
loop re-synced from those captures at each epoch start, asserting
per-step losses and epoch-end params from every common start. The one
LwF-specific sync point: at task-1 before_task the reference head gains
FRESH kaiming rows for the new classes (lwf.py:28 — drawn from torch's
global RNG, unmirrorable) while my fixed-width head has carried its own
initial rows; the new rows alone are pinned from my state right after
the reference's update_fc runs, so the expansion copy of the OLD rows
stays 100% reference code.
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
FEAT = 64
BATCH = 8
EPOCHS0, EPOCHS1 = 3, 2  # init_epoch != epoch: exercises the split
PER_CLASS = 6  # 24 imgs/task, 3 steps/epoch — all sizes divide
# lr/wd rationale: see test_trainer_lockstep_icarl.py:87-91
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 23
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
TOL_PARAM = 2e-3


def _my_config():
    from libcontinual_tpu.config import Config

    return Config(overrides={
        "dataset": "synthetic", "data_root": "", "image_size": 32,
        "task_num": TASKS, "init_cls_num": INIT, "inc_cls_num": INC,
        "epoch": EPOCHS1, "init_epoch": EPOCHS0, "batch_size": BATCH,
        "per_class": PER_CLASS, "seed": SEED, "val_per_epoch": 0,
        "testing_times": 1, "dtype": "float32",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "cifar_resnet20", "kwargs": {}},
        "classifier": {"name": "LWF", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS, "lamda": 3}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": BATCH}},
        "optimizer": {"name": "SGD", "kwargs": {
            "lr": LR, "momentum": MOM, "weight_decay": WD}},
        "lr_scheduler": {"name": "StepLR",
                         "kwargs": {"step_size": 2, "gamma": 0.1}},
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
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.05, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0, 0.1, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.1, generator=g)


def _host_tree(t):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), jax.device_get(t))


def _find_trace(opt_state):
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "trace")):
        if hasattr(part, "trace"):
            return part.trace
    raise AssertionError("SGD momentum trace not found in opt_state")


def test_lwf_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_lwf = _refload.ref_module("core.model.lwf")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side
    torch.manual_seed(29)
    tm = ref_lwf.LWF(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                     init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
                     device=DEV)
    _randomize_torch(tm, 907)

    # ---- my side: full Trainer, weights overwritten from the torch model.
    # The torch head is Linear(FEAT, INIT) pre-expansion (lwf.py:14); it maps
    # onto the first INIT columns of my fixed-width head — the remaining
    # columns keep my init (they are CE/KD-masked and eval-masked until their
    # task arrives, and torch's corresponding fresh rows are pinned from mine
    # at the task-1 sync point below).
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    blocks, sc, sb = S.blocks_cifar(tm.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    assert set(trainer.state.params) == {"backbone", "head"}, (
        "LWF param structure changed; update the lockstep sync")
    head0 = trainer.state.params["head"]["Dense_0"]
    head = {"Dense_0": {
        "kernel": jnp.asarray(head0["kernel"]).at[:, :INIT].set(
            jnp.asarray(S.lin_k(tm.classifier.weight))),
        "bias": jnp.asarray(head0["bias"]).at[:INIT].set(
            jnp.asarray(S.t2n(tm.classifier.bias))),
    }}
    params = {"backbone": fv["params"], "head": head}
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = {"batch_stats": fv["batch_stats"]}
    # teacher is rewritten at before_task(1) prior to its first KD use; sync
    # it anyway so both sides are bit-identical from step zero
    mvars["teacher"] = jax.tree_util.tree_map(jnp.copy, params)
    mvars["teacher_state"] = {
        "batch_stats": jax.tree_util.tree_map(jnp.copy, fv["batch_stats"])}
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    captures = {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "stats": _host_tree(state.mvars["model_state"]["batch_stats"]),
            "trace": _host_tree(_find_trace(state.opt_state)),
            "losses": np.asarray(step_losses, np.float64),
        }

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    assert set(captures) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    # inverse-sync pairing: backbone is the same object all run; the head
    # Linear is REPLACED every before_task (lwf.py:28-40), so its pairs are
    # rebuilt per task with a width-`total` slice off my fixed head
    bparam_pairs = S.resnet_param_pairs(blocks, sc, sb, linear=None)
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _head_pairs(total):
        def inv_k(a):
            return np.ascontiguousarray(np.asarray(a)[:, :total].T)

        def inv_b(a):
            return np.ascontiguousarray(np.asarray(a)[:total])

        return [(tm.classifier.weight, ("head", "Dense_0", "kernel"), inv_k),
                (tm.classifier.bias, ("head", "Dense_0", "bias"), inv_b)]

    def _resync(cap, head_pairs, optim=None):
        S.write_param_pairs(bparam_pairs + head_pairs, cap["params"])
        S.write_stat_pairs(stat_pairs, cap["stats"])
        if optim is not None:
            S.write_momentum(bparam_pairs + head_pairs, cap["trace"], optim)

    def _param_drift(cap, total):
        t_fv = S.sync_resnet(*S.blocks_cifar(tm.backbone))
        dp = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            t_fv["params"], cap["params"]["backbone"])))
        hk = cap["params"]["head"]["Dense_0"]
        dp = max(dp, float(np.abs(
            S.lin_k(tm.classifier.weight)
            - np.asarray(hk["kernel"])[:, :total]).max()))
        dp = max(dp, float(np.abs(
            S.t2n(tm.classifier.bias)
            - np.asarray(hk["bias"])[:total]).max()))
        return dp

    # ---- torch side: the reference trainer loop, same data + batch order,
    # re-synced to my captured state at each epoch start (piecewise lockstep)
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        total = INIT + task * INC
        if task > 0:
            # pin the pre-boundary state so before_task's old_backbone
            # deepcopy (lwf.py:48-49) and old_fc copy (lwf.py:31-33) snapshot
            # exactly the state my before_task snapshotted into mvars
            _resync(captures[(task - 1, EPOCHS0 - 1)], _head_pairs(total - INC))
        tm.before_task(task, None, None, None)
        if task > 0:
            # update_fc's NEW rows are fresh global-RNG kaiming draws
            # (lwf.py:28); pin the full expanded head — rows [:known] are the
            # reference's own copy (already equal), rows [known:] become mine
            S.write_param_pairs(_head_pairs(total),
                                captures[(task - 1, EPOCHS0 - 1)]["params"])
        head_pairs = _head_pairs(total)
        optim = torch.optim.SGD(tm.get_parameters(cfg), lr=LR,
                                momentum=MOM, weight_decay=WD)
        schedr = torch.optim.lr_scheduler.StepLR(optim, step_size=2,
                                                 gamma=0.1)
        epochs = EPOCHS0 if task == 0 else EPOCHS1
        n = len(labels)
        assert n % BATCH == 0
        steps = n // BATCH
        for epoch in range(epochs):
            if epoch > 0:
                _resync(captures[(task, epoch - 1)], head_pairs, optim)
            tm.train()  # trainer.py:574 — also flips the KD teacher
            perm = native.shuffled_indices(n, SEED + task * 100003 + epoch)
            losses = []
            for s in range(steps):
                rows = perm[s * BATCH:(s + 1) * BATCH]
                batch = {"image": _to_torch(imgs[rows]),
                         "label": torch.from_numpy(labels[rows])}
                _, _, loss = tm.observe(batch)
                optim.zero_grad()
                loss.backward()
                optim.step()
                losses.append(float(loss.detach()))
            schedr.step()  # trainer.py:404 — per epoch
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine {cap['losses']}")
            dp = _param_drift(cap, total)
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # pin end-of-task state so the eval row proceeds from the exact
        # state my trainer evaluated
        _resync(captures[(task, epochs - 1)], head_pairs)
        tm.after_task(task, None, None, None)  # lwf.py:72-73 — a no-op
        tm.eval()
        for t_prev in range(task + 1):
            te = trainer.test_stream.task(t_prev)
            batch = {"image": _to_torch(te.images),
                     "label": torch.from_numpy(te.labels.astype(np.int64))}
            with torch.no_grad():
                pred, _ = tm.inference(batch)
            t_acc_table[task, t_prev] = round(
                100.0 * float(np.mean(pred.numpy() == te.labels)), 2)

    print(f"lockstep drift: max step-loss {drift['loss']:.2e} "
          f"max epoch-end param {drift['param']:.2e}")

    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")
