"""Trainer-level lockstep differential #4: a FULL 2-task ER-ACE run — the
online-replay family — against the executing reference's loop + buffer
semantics (reference core/model/erace.py, core/model/buffer/erbuffer.py,
core/trainer.py:608-609).

Seams this lockstep pins that step-level differentials cannot:

  * the POST-STEP ``add_reservoir`` ordering (reference trainer.py:608-609:
    the incoming batch enters the buffer only AFTER optimizer.step(), so a
    step's own replay draw can never contain that step's batch; an
    implementation adding before the loss would differ at EVERY step under
    the most-recent-items replay probe below — most loudly at task-0 step 0,
    where the reference's replay term is OFF because the buffer is empty);
  * ``seen_so_far`` updated at after_task (erace.py:124-125) — the
    asymmetric CE mask is a TASK-boundary quantity, not a step quantity;
  * sequential reservoir appends while capacity remains
    (erbuffer.py:52-84: place = current_index while space is left) — both
    sides' buffers must hold identical items in identical order;
  * the not-use_augs transform swap (erace.py:114-116);
  * distLinear cosine head training end-to-end.

RNG note: the reference's replay draw is ``np.random.choice`` from the live
global RNG (erbuffer.py:169-171) — unmirrorable by design. BOTH sides'
index-draw (and only the draw) is therefore pinned in this test to the same
deterministic rule: the min(amt, n) MOST RECENT buffer items. Everything
around it — the reference's buffer container, the CE math, my in-graph
buffer slabs and weighted-CE padding semantics — executes unmodified, and
the most-recent rule makes the replay set change every step, which is what
keeps the add-ordering assertion sharp for the whole run.

Protocol: PIECEWISE lockstep, exactly as test_trainer_lockstep_icarl.py
(see there for the fp-chaos measurement): my trainer runs first capturing
epoch-end states via ``Trainer.epoch_hook``; the torch side replays the
reference loop re-synced from those captures, asserting per-step losses and
epoch-end params from every common start. End-state artifacts asserted
exactly: the final buffer contents (labels, task ids, count, pixels), the
final seen_so_far, and the acc_table.
"""

from __future__ import annotations

from collections import OrderedDict

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
FEAT = 160  # slim AML resnet18 (reference resnet.py:690-753)
# batch > REPLAY_AMT: after the first add the buffer always holds >= 10
# items, so BOTH sides replay exactly the last-10 full batch (with fewer,
# my fixed-shape padded replay batch and the reference's short batch see
# different train-mode BN batch statistics — a shape artifact, not a seam)
BATCH = 12
EPOCHS0, EPOCHS1 = 3, 2
PER_CLASS = 6  # 24 imgs/task -> 2 steps/epoch, divisible
# add_reservoir runs EVERY step of EVERY epoch, so total adds =
# 24*(3+2) = 120; capacity above that keeps every append sequential
# (erbuffer.py:62-66) — past capacity the reference evicts via torch's
# uniform RNG, which is unmirrorable by design
CAPACITY = 128
REPLAY_AMT = 10  # reference erace.py:63-66
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 29
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
        "backbone": {"name": "resnet18_AML", "kwargs": {}},
        "classifier": {"name": "ERACE", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS,
            "task_free": True, "use_augs": False}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "ERBuffer",
                   "kwargs": {"buffer_size": CAPACITY, "batch_size": BATCH}},
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


def _det_sample_replay(buf, rng, amt):
    """Deterministic stand-in for my Gumbel replay DRAW only: the min(amt,n)
    most recent buffer items; padded rows weigh 0 so the weighted CE equals
    the reference's mean over min(amt, n) real rows."""
    n = jnp.minimum(buf["n_seen"], buf["by"].shape[0])
    start = jnp.maximum(n - amt, 0)
    idx = (start + jnp.arange(amt)) % jnp.maximum(n, 1)
    w = (jnp.arange(amt) < n).astype(jnp.float32)
    return buf["bx"][idx], buf["by"][idx], w


def _det_ref_sample_random(buffer):
    """Same deterministic rule for the reference ERBuffer: patches only the
    np.random.choice index draw (erbuffer.py:160-174); container, slicing
    and CE semantics stay reference code."""

    def sample_random(amt, exclude_task=None, **kw):
        assert exclude_task is None
        buffers = OrderedDict()
        for name in buffer.buffers:
            buffers[name[1:]] = getattr(buffer, name)[:buffer.current_index]
        n = buffers["x"].size(0)
        if n <= amt:
            assert n > 0
            return buffers
        return OrderedDict({k: v[n - amt:n] for k, v in buffers.items()})

    return sample_random


class _LoaderShim:
    """What erace.before_task touches (transform swap, erace.py:114-116)."""

    class _DS:
        trfms = None

    def __init__(self):
        self.dataset = self._DS()


def test_erace_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_erace = _refload.ref_module("core.model.erace")
    ref_erbuf = _refload.ref_module("core.model.buffer.erbuffer")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side
    torch.manual_seed(31)
    tm = ref_erace.ERACE(
        ref_resnet.resnet18_AML(num_classes=NUM_CLASS), DEV,
        num_classes=NUM_CLASS, init_cls_num=INIT, inc_cls_num=INC,
        use_augs=False, task_free=True)
    _randomize_torch(tm.model, 911)
    buffer = ref_erbuf.ERBuffer(capacity=CAPACITY)
    buffer.device = DEV
    buffer.sample_random = _det_ref_sample_random(buffer)

    # ---- my side: full Trainer; weights from torch; replay draw pinned
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    trainer.method.sample_replay = _det_sample_replay
    blocks, sc, sb = S.blocks_aml(tm.model.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    params = {"backbone": fv["params"],
              "head": {"kernel": jnp.asarray(S.lin_k(tm.model.classifier.L.weight))}}
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(trainer.state.params), (
            "ERACE param structure changed; update the lockstep sync")
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = {"batch_stats": fv["batch_stats"]}
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    captures = {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "stats": _host_tree(state.mvars["model_state"]["batch_stats"]),
            "trace": _host_tree(_find_trace(state.opt_state)),
            "buffer": _host_tree(state.mvars["buffer"]),
            "losses": np.asarray(step_losses, np.float64),
        }

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    assert set(captures) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    # param/momentum pairing incl. the bias-free distLinear head
    pairs = S.resnet_param_pairs(blocks, sc, sb, linear=None)
    pairs.append((tm.model.classifier.L.weight, ("head", "kernel"),
                  S.inv_lin_k))
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _sync_ref_buffer(cap_buf):
        """Write my captured buffer slab into the reference container."""
        n = int(cap_buf["n_seen"])
        if n == 0:
            return
        if "bx" not in buffer.buffers:
            # trigger lazy container creation with a zero-row add
            buffer._init_buffers({
                "x": _to_torch(cap_buf["bx"][:1]),
                "y": torch.from_numpy(cap_buf["by"][:1].astype(np.int64)),
                "t": torch.zeros(1, dtype=torch.int64)})
        with torch.no_grad():
            buffer.bx[:n] = _to_torch(cap_buf["bx"][:n])
            buffer.by[:n] = torch.from_numpy(cap_buf["by"][:n].astype(np.int64))
            buffer.bt[:n] = torch.from_numpy(cap_buf["bt"][:n].astype(np.int64))
        buffer.current_index = n
        buffer.n_seen_so_far = n

    def _resync(cap, optim=None):
        S.write_param_pairs(pairs, cap["params"])
        S.write_stat_pairs(stat_pairs, cap["stats"])
        _sync_ref_buffer(cap["buffer"])
        if optim is not None:
            S.write_momentum(pairs, cap["trace"], optim)

    # ---- torch side: the reference loop, same data + batch order, re-synced
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        tm.before_task(task, buffer, _LoaderShim(), [_LoaderShim()])
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
            tm.train()  # trainer.py:574
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
                tm.add_reservoir()  # trainer.py:608-609 — POST-step
                losses.append(float(loss.detach()))
            schedr.step()
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine "
                f"{cap['losses'].tolist()}")
            blocks_now, sc_now, sb_now = S.blocks_aml(tm.model.backbone)
            t_fv = S.sync_resnet(blocks_now, sc_now, sb_now)
            dp = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                t_fv["params"], cap["params"]["backbone"])))
            dp = max(dp, float(np.abs(
                S.lin_k(tm.model.classifier.L.weight)
                - cap["params"]["head"]["kernel"]).max()))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
            # both sides appended the same number of items this epoch
            assert int(cap["buffer"]["n_seen"]) == buffer.n_seen_so_far
        # end-of-task: pin torch to my end state, then run the reference
        # boundary semantics (seen_so_far update)
        _resync(captures[(task, epochs - 1)])
        tm.after_task(task, buffer, None, None)
        # eval: reference inference — full-head argmax (erace.py:101-110)
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

    # ---- end-state artifacts -------------------------------------------
    assert int(tm.seen_so_far) == INIT + INC * (TASKS - 1)
    final_buf = captures[(TASKS - 1, EPOCHS1 - 1)]["buffer"]
    n_final = int(final_buf["n_seen"])
    # every step of every epoch appended its batch
    assert n_final == INIT * PER_CLASS * (EPOCHS0 + EPOCHS1)
    # NOTE: the torch buffer was re-synced from my captures each epoch, but
    # the FINAL epoch's appends ran purely on reference code from the common
    # epoch start — so this equality pins the last epoch's add semantics,
    # and transitively (each epoch asserted from a common start) the whole
    # run's. Compare against the reference's own post-run container:
    np.testing.assert_array_equal(
        final_buf["by"][:n_final],
        buffer.by[:buffer.current_index].numpy(),
        err_msg="buffer labels diverged")
    np.testing.assert_array_equal(
        final_buf["bt"][:n_final],
        buffer.bt[:buffer.current_index].numpy(),
        err_msg="buffer task ids diverged")
    np.testing.assert_allclose(
        np.asarray(_to_torch(final_buf["bx"][:n_final])),
        buffer.bx[:buffer.current_index].numpy(),
        atol=1e-6, err_msg="buffer pixels diverged")

    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")
