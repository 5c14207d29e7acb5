"""Trainer-level lockstep differential #8: a FULL 3-task WA run — weight
aligning — against the executing reference (core/model/wa.py).

THREE tasks, not two: WA's boundary choreography is
``classifier_weight_align`` THEN ``old_network = deepcopy(...)`` (reference
wa.py:227-231) — the KD teacher of task t+1 carries the ALIGNED task-t
head. With 2 tasks the task-0 boundary performs no align (task_idx > 0
guard) and the ordering seam is invisible; here task 2's KD losses train
against the aligned task-1 teacher, pinning the order.

Seams pinned beyond the step-level loss/eval differentials:
  * the align rescale gamma = mean||w_old|| / mean||w_new|| applied to the
    new rows only (wa.py:96-109) on the REAL post-training weights, and the
    eval row computed AFTER it (trainer.py:406->457 ordering);
  * align -> teacher-snapshot ordering (above);
  * (1-lam)*CE + lam*KD with lam = known/total across the growing head,
    trainer-generic zero_grad/backward/step, per-task optimizer re-init,
    init_epoch/epoch split, per-epoch MultiStepLR.

Scope note: buffer_size 0 — WA's rehearsal path is the trainer's generic
LinearHerdingBuffer concat machinery, lockstepped end-to-end by
test_trainer_lockstep_icarl.py; the torch side's buffer hooks are stubbed.
Upstream quirk recorded: reference before_task grows the head by
``init_cls_num`` EVERY task (wa.py:216-217) — only coherent when
init == inc, which every shipped WA config uses; this framework uses the
init/inc class ranges, coinciding exactly on those configs (and here).

Protocol: PIECEWISE lockstep exactly as test_trainer_lockstep_icarl.py.
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
INIT, INC, TASKS = 4, 4, 3
NUM_CLASS = 12
FEAT = 64
# one step per epoch: at this geometry the f32 train-mode-BN gradient
# chaos seeds at ~5e-4 on the stem (data-dependent; EWC's seed lands at
# ~1e-6) and amplifies 5-10x per step — full-batch epochs make every
# piecewise segment a single step, so drift never compounds between
# re-syncs while every seam (ordering, align, teacher) stays asserted
BATCH = 24
EPOCHS0, EPOCHS1 = 3, 2
PER_CLASS = 6
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 67
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
# measured one-STEP f32 divergence floor of torch-vs-XLA batch-stat BN
# backward at this geometry is ~3e-3 on this data (pipelines verified
# bit-identical; the seed is the BN backward itself) — the sharp asserts
# are the per-step losses from each re-synced common start
TOL_PARAM = 1e-2


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
        "classifier": {"name": "WA", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS, "T": 2.0}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": BATCH,
                              "strategy": "random"}},
        "optimizer": {"name": "SGD", "kwargs": {
            "lr": LR, "momentum": MOM, "weight_decay": WD}},
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


class _StubBuffer:
    """No-op stand-in for the herding buffer hooks wa.after_task calls
    (buffer machinery is lockstepped by the iCaRL test)."""

    def reduce_old_data(self, *a, **k):
        pass

    def update(self, *a, **k):
        pass


class _LoaderShim:
    class _DS:
        trfms = None

    def __init__(self):
        self.dataset = self._DS()


def _head_of(cap_params):
    d = cap_params["head"]["Dense_0"]
    return np.asarray(d["kernel"], np.float32), np.asarray(d["bias"], np.float32)


def _write_head(cap_params, linear):
    k, b = _head_of(cap_params)
    out = linear.out_features
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(k[:, :out].T.copy()))
        linear.bias.copy_(torch.from_numpy(b[:out].copy()))


def _write_head_momentum(cap_trace, linear, optim):
    k, b = _head_of(cap_trace)
    out = linear.out_features
    optim.state[linear.weight]["momentum_buffer"] = torch.from_numpy(
        k[:, :out].T.copy())
    optim.state[linear.bias]["momentum_buffer"] = torch.from_numpy(
        b[:out].copy())


def test_wa_three_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_wa = _refload.ref_module("core.model.wa")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side
    torch.manual_seed(71)
    tm = ref_wa.WA(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                   init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
                   device=DEV)
    tm.before_task(0, None, None, None)  # allocates the task-0 head
    _randomize_torch(tm.network, 941)

    # ---- my side: full Trainer; weights from torch (head cols [:INIT])
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    blocks, sc, sb = S.blocks_cifar(tm.network.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    head = jax.tree_util.tree_map(np.array, _host_tree(
        trainer.state.params["head"]))
    head["Dense_0"]["kernel"][:, :INIT] = S.lin_k(tm.network.classifier.weight)
    head["Dense_0"]["bias"][:INIT] = S.t2n(tm.network.classifier.bias)
    params = {"backbone": fv["params"],
              "head": jax.tree_util.tree_map(jnp.asarray, head)}
    assert set(params) == set(trainer.state.params), (
        "WA param structure changed; update the lockstep sync")
    mstate = {"batch_stats": fv["batch_stats"]}
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = mstate
    mvars["teacher"] = jax.tree_util.tree_map(jnp.copy, params)
    mvars["teacher_state"] = jax.tree_util.tree_map(jnp.copy, mstate)
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    captures = {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "stats": _host_tree(state.mvars["model_state"]["batch_stats"]),
            "trace": _host_tree(_find_trace(state.opt_state)),
            "losses": np.asarray(step_losses, np.float64),
        }

    # capture the POST-after_task (post-align) state per boundary: the
    # next task's entry head is the ALIGNED one, which the epoch captures
    # (taken before the boundary) don't carry
    post_boundary = {}
    m = trainer.method
    orig_at = type(m).after_task

    def record_after_task(state, task_idx, task_data):
        st = orig_at(m, state, task_idx, task_data)
        post_boundary[task_idx] = _host_tree(st.params)
        return st

    m.after_task = record_after_task

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    final_state = trainer.state

    bb_pairs = S.resnet_param_pairs(blocks, sc, sb, linear=None)
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _resync(cap, optim=None):
        S.write_param_pairs(bb_pairs, cap["params"])
        _write_head(cap["params"], tm.network.classifier)
        S.write_stat_pairs(stat_pairs, cap["stats"])
        if optim is not None:
            S.write_momentum(bb_pairs, cap["trace"], optim)
            _write_head_momentum(cap["trace"], tm.network.classifier, optim)

    # ---- torch side: reference loop, same data + batch order, piecewise
    stub = _StubBuffer()
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        if task > 0:
            tm.before_task(task, None, None, None)  # widens the head
            # pin the task-entry state to mine: backbone/stats from the
            # last epoch capture (the boundary does not touch them), the
            # head from the POST-align boundary capture — the widened
            # rows also start from torch's fresh random draw there, and
            # my trainer enters with its own values
            prev_cap = captures[(task - 1,
                                 (EPOCHS0 if task - 1 == 0 else EPOCHS1) - 1)]
            S.write_param_pairs(bb_pairs, prev_cap["params"])
            S.write_stat_pairs(stat_pairs, prev_cap["stats"])
            _write_head({"head": {"Dense_0":
                                  post_boundary[task - 1]["head"]["Dense_0"]}},
                        tm.network.classifier)
            # NOTE the pinning must not touch old_network: the teacher is
            # the reference's own post-align deepcopy from the previous
            # boundary — the artifact under test
        optim = torch.optim.SGD(tm.get_parameters(cfg), lr=LR,
                                momentum=MOM, weight_decay=WD)
        schedr = torch.optim.lr_scheduler.MultiStepLR(
            optim, milestones=[2], gamma=0.1)
        epochs = EPOCHS0 if task == 0 else EPOCHS1
        n = len(labels)
        assert n % BATCH == 0
        steps = n // BATCH
        for epoch in range(epochs):
            if epoch > 0:
                _resync(captures[(task, epoch - 1)], optim)
            tm.network.train()  # trainer.py:574 (old_network stays frozen
            if tm.old_network is not None:  # module but train-mode BN —
                tm.old_network.train()      # the model.train() cascade)
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
            schedr.step()
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine "
                f"{cap['losses'].tolist()}")
            t_fv = S.sync_resnet(*S.blocks_cifar(tm.network.backbone))
            dp = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                t_fv["params"], cap["params"]["backbone"])))
            out = tm.network.classifier.out_features
            ck, cb = _head_of(cap["params"])
            dp = max(dp, float(np.abs(
                S.lin_k(tm.network.classifier.weight) - ck[:, :out]).max()))
            dp = max(dp, float(np.abs(
                S.t2n(tm.network.classifier.bias) - cb[:out]).max()))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # pin end-of-task state; run the REFERENCE boundary: align (task>0)
        # then teacher deepcopy (wa.py:227-231), buffer hooks stubbed
        _resync(captures[(task, epochs - 1)])
        tm.after_task(task, stub, _LoaderShim(), [_LoaderShim()])
        # eval AFTER the align, matching trainer.py:406->457 ordering
        tm.network.eval()
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

    # ---- end-state artifact: the ALIGNED final head. Both sides applied
    # gamma = mean||w_old||/mean||w_new|| to the same pinned end-of-task-2
    # weights; equality pins the align math + the new-rows-only mask.
    fk, fb = _head_of(_host_tree(final_state.params))
    np.testing.assert_allclose(
        S.lin_k(tm.network.classifier.weight), fk[:, :NUM_CLASS],
        rtol=0, atol=1e-5, err_msg="aligned final head diverged")
    np.testing.assert_allclose(
        S.t2n(tm.network.classifier.bias), fb, rtol=0, atol=1e-5,
        err_msg="final head bias diverged")
