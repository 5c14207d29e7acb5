"""Trainer-level lockstep differential #3: a FULL 2-task EWC run — the
regularizer family — against the executing reference's loop + boundary
semantics (reference core/model/ewc.py, core/trainer.py:259-614).

The L2P lockstep covers the prompt path and the iCaRL lockstep the
rehearsal/buffer path; this test covers the seams the regularizer family
adds on top:

  * Fisher estimation from the task's data at after_task — executed by the
    reference's own getFisher (ewc.py:147-204): TRAIN-mode BN (batch-stat
    gradients AND running stats mutated by the estimation passes),
    normalization by the padded loader count, grad^2 * len(y) accumulation;
  * the growing-alpha merge applied only to pre-existing rows — head rows
    added by the current task keep their full new Fisher (ewc.py:129-133)
    vs this framework's fixed-width head + class-axis mask;
  * ref_param snapshot ordering (saved before getFisher, ewc.py:124-125);
  * the growing classifier head (before_task re-allocates nn.Linear,
    ewc.py:72-80) vs the fixed-width masked head: task-0 CE over the
    init_cls-wide head, task-1 CE rebased to the new columns
    (ewc.py:92-99), penalty sliced to p[:len(ref_param)] (ewc.py:221-224);
  * per-task SGD(momentum, weight_decay) re-init and per-epoch MultiStepLR
    stepping across the init_epoch/epoch split.

Protocol — PIECEWISE lockstep, exactly as test_trainer_lockstep_icarl.py
(see there for the fp-chaos measurement that rules out whole-trajectory
comparison on a momentum-SGD BN net): the JAX trainer runs first, capturing
epoch-end states via ``Trainer.epoch_hook``; the torch side replays the
reference loop epoch by epoch re-synced from those captures, asserting
per-step losses and epoch-end params from every common start. On top of
the piecewise asserts, the END-STATE artifacts are compared directly:

  (a) the final merged Fisher pytree vs the reference's ``self.fisher``
      (leaf by leaf through the same layout mapping the weight sync uses)
      — this pins BOTH tasks' Fisher passes (task 0's enters through the
      alpha=0.5 mix) and the row-masked merge;
  (b) the final ref_param snapshot;
  (c) the final BN running stats (mutated by the reference's train-mode
      Fisher passes — a framework that estimated Fisher in eval mode
      would leave different stats);
  (d) the acc_table, exactly.

Head-geometry note: the reference head grows (4 -> 8 columns here); this
framework's head is fixed-width with masked CE. Masked softmax zeroes the
unseen columns exactly in f32 (the -1e9 shift underflows), so unseen-column
Fisher is exactly 0 and the full-width penalty equals the reference's
sliced one. The unseen columns do receive weight decay here (the reference
columns don't exist yet — their task-1 start values are a fresh random
draw there, arbitrary on both sides); the torch replay pins them from my
captures at the task-1 boundary.

Fisher batch-order note: per-batch Fisher gradients use the batch's OWN BN
statistics, so the accumulated Fisher is batch-order independent (up to fp
summation); only the post-estimation running stats depend on order. The
reference iterates its shuffled train_loader, this framework iterates in
task-data order — the replay uses data order on both sides.
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
PER_CLASS = 6  # 24 imgs/task -> 3 steps/epoch, divisible
LAMDA = 100.0
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 19
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
TOL_PARAM = 2e-3
# Fisher: identical state + batches on both sides, but the TRAIN-mode BN
# backward is intrinsically fp-chaotic in f32 at this depth — torch's own
# f32 gradients deviate from its float64 ground truth by ~1.6e-3 absolute
# at the stem (measured; the jax-vs-torch diff is the same magnitude, and
# eval-mode grads agree to 1e-6). Fisher is grad^2, so |df| ~= 2*sqrt(f)*dg:
# assert |mine - ref| <= 2*sqrt(ref)*GRAD_NOISE with a 3x margin over the
# measured floor. Still sharp enough to catch every semantic seam: a wrong
# normalization, a missed train-mode estimate (eval-mode grads are ~2x
# off), or a mis-merged alpha all shift fisher by >= 2x.
FISHER_GRAD_NOISE, FISHER_ATOL = 5e-3, 1e-9


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
        "classifier": {"name": "EWC", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS, "lamda": LAMDA}},
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


class FisherLoader:
    """The loader contract getFisher reads (ewc.py:168-204): iteration over
    {'image','label'} batches, ``.batch_size``, ``len()`` — deterministic
    task-data order, matching the framework's batch_iter."""

    def __init__(self, imgs_u8, labels, batch_size):
        self.imgs, self.labels, self.batch_size = imgs_u8, labels, batch_size

    def __len__(self):
        return -(-len(self.labels) // self.batch_size)

    def __iter__(self):
        for s in range(len(self)):
            lo = s * self.batch_size
            yield {"image": _to_torch(self.imgs[lo:lo + self.batch_size]),
                   "label": torch.from_numpy(
                       self.labels[lo:lo + self.batch_size])}


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


def _head_of(cap_params):
    d = cap_params["head"]["Dense_0"]
    return np.asarray(d["kernel"], np.float32), np.asarray(d["bias"], np.float32)


def _write_head(cap_params, linear):
    """My fixed-width head -> the reference's (possibly narrower) grown
    nn.Linear: column-sliced to its current out_features."""
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


def test_ewc_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_ewc = _refload.ref_module("core.model.ewc")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side
    torch.manual_seed(23)
    tm = ref_ewc.EWC(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                     init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
                     lamda=LAMDA, device=DEV)
    _randomize_torch(tm.network, 907)

    # ---- my side: full Trainer; backbone + head cols [:INIT] overwritten
    # from the torch model (the torch head is init_cls-wide at construction,
    # ewc.py:60-66; my cols [INIT:] keep their own init — they receive
    # exactly-zero CE gradients until task 1 trains them)
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
        "EWC param structure changed; update the lockstep sync")
    mstate = {"batch_stats": fv["batch_stats"]}
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = mstate
    mvars["ref_params"] = jax.tree_util.tree_map(jnp.copy, params)
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

    # backbone-only inverse pairing (stable across the head re-allocation)
    bb_pairs = S.resnet_param_pairs(blocks, sc, sb, linear=None)
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _resync(cap, optim=None):
        S.write_param_pairs(bb_pairs, cap["params"])
        _write_head(cap["params"], tm.network.classifier)
        S.write_stat_pairs(stat_pairs, cap["stats"])
        if optim is not None:
            S.write_momentum(bb_pairs, cap["trace"], optim)
            _write_head_momentum(cap["trace"], tm.network.classifier, optim)

    # ---- torch side: the reference loop, same data + batch order, re-synced
    # to my captured state at each epoch start (piecewise lockstep)
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        tm.before_task(task, None, None, None)
        if task > 0:
            # before_task's fresh nn.Linear gives the NEW columns a random
            # draw (ewc.py:76-80); my trainer enters the task with its own
            # (weight-decayed) values for those columns — pin torch to mine,
            # as the resync already pinned everything else
            _write_head(captures[(task - 1, EPOCHS0 - 1)]["params"],
                        tm.network.classifier)
        optim = torch.optim.SGD(tm.get_parameters(cfg), lr=LR,
                                momentum=MOM, weight_decay=WD)
        schedr = torch.optim.lr_scheduler.MultiStepLR(
            optim, milestones=[2], gamma=0.1)
        epochs = EPOCHS0 if task == 0 else EPOCHS1
        n = len(labels)
        assert n % BATCH == 0, "sizing must divide; padding is out of scope"
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
                optim.step()  # trainer.py:600-606 (generic branch)
                losses.append(float(loss.detach()))
            schedr.step()  # trainer.py:404 — per epoch
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine {cap['losses']}")
            # epoch-end params: backbone fully, head cols [:out]
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
        # pin torch to my end-of-task state BEFORE the boundary machinery —
        # the boundary SEMANTICS (ref_param snapshot, getFisher, the merge)
        # stay 100% reference code, only the network values are pinned
        _resync(captures[(task, epochs - 1)])
        tm.after_task(task, None,
                      FisherLoader(imgs, labels, BATCH), None)
        # eval: the reference _validate — model.eval(), plain argmax
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

    # ---- end-state artifacts -------------------------------------------
    final = trainer.state
    name_of = {id(p): n for n, p in tm.network.named_parameters()}
    my_fisher = _host_tree(final.mvars["fisher"])
    my_ref = _host_tree(final.mvars["ref_params"])
    fisher_drift = 0.0
    for t, path, inv in S.resnet_param_pairs(
            *S.blocks_cifar(tm.network.backbone),
            linear=tm.network.classifier):
        name = name_of[id(t)]
        ref_f = tm.fisher[name].numpy()
        mine_f = inv(S.tree_get(my_fisher, path))
        bound = 2.0 * np.sqrt(np.abs(ref_f)) * FISHER_GRAD_NOISE + FISHER_ATOL
        excess = float((np.abs(mine_f - ref_f) / bound).max())
        assert excess <= 1.0, (
            f"merged Fisher diverged at {name}: worst |diff| exceeds the "
            f"2*sqrt(f)*grad-noise bound by {excess:.2f}x")
        fisher_drift = max(fisher_drift, excess)
        np.testing.assert_allclose(
            inv(S.tree_get(my_ref, path)), tm.ref_param[name].numpy(),
            rtol=0, atol=TOL_PARAM, err_msg=f"ref_param diverged at {name}")
    print(f"final merged fisher worst noise-bound fraction {fisher_drift:.2e}")

    # my unseen-at-task-0 Fisher rows entered the merge as exact zeros; the
    # final head rows [INIT:] must equal the UNMERGED new Fisher — already
    # covered above vs the reference's row-sliced merge — and the task-0
    # fisher contribution is pinned through the alpha=0.5 mix of rows [:INIT]

    # BN running stats: mutated by the reference's train-mode Fisher passes
    # (ewc.py:181); both sides ran them from the same pinned end-of-task
    # state. Variance tolerance covers the biased (flax) vs unbiased (torch)
    # batch-variance update increments.
    my_stats = _host_tree(final.mvars["model_state"]["batch_stats"])
    for t, path in stat_pairs:
        mine_s = S.tree_get(my_stats, path)
        tol = 3e-3 if path[-1] == "var" else 1e-4
        np.testing.assert_allclose(
            mine_s, t.numpy(), rtol=tol, atol=1e-5,
            err_msg=f"post-Fisher running stats diverged at {path}")


# ---------------------------------------------------------------------------
# init_cls_num != inc_cls_num merge differential
# ---------------------------------------------------------------------------

def test_ewc_fisher_merge_init_ne_inc():
    """Fisher-merge differential at init_cls_num != inc_cls_num — the seam
    the full lockstep's INIT==INC geometry cannot see: the reference merge
    loop runs at task 0 too, over the ZERO-initialized ``self.fisher`` from
    __init__ (reference ewc.py:67-68, :129-133), so the task-0 Fisher comes
    out scaled by (1-alpha) = inc/init (here 0.5 — an unscaled task-0 Fisher
    would be 2x off). Both boundaries' after_task run on the EXECUTING
    reference (getFisher + merge) and on this framework from identically
    synced weights and data; the merged Fisher is compared leaf by leaf."""
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_ewc = _refload.ref_module("core.model.ewc")

    import libcontinual_tpu.methods  # noqa: F401 — populate the registry
    from libcontinual_tpu.data.continual import TaskData
    from libcontinual_tpu.registry import METHODS

    INIT2, INC2, TASKS2 = 4, 2, 3
    NUM2 = INIT2 + INC2 * (TASKS2 - 1)  # 8
    B2, PER_TASK = 4, 12

    torch.manual_seed(41)
    tm = ref_ewc.EWC(ref_resnet.cifar_resnet20(), FEAT, NUM2,
                     init_cls_num=INIT2, inc_cls_num=INC2, task_num=TASKS2,
                     lamda=LAMDA, device=DEV)

    cfg = {
        "dataset": "synthetic", "image_size": 32,
        "task_num": TASKS2, "init_cls_num": INIT2, "inc_cls_num": INC2,
        "batch_size": B2, "epoch": 1, "dtype": "float32", "seed": 3,
        "backbone": {"name": "cifar_resnet20", "kwargs": {}},
        "classifier": {"name": "EWC", "kwargs": {
            "num_class": NUM2, "feat_dim": FEAT, "init_cls_num": INIT2,
            "inc_cls_num": INC2, "task_num": TASKS2, "lamda": LAMDA}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.01}},
        "lr_scheduler": {"name": "Constant"},
    }
    m = METHODS.get("EWC")(cfg)
    state = m.init_state(jax.random.PRNGKey(0), (32, 32, 3))

    rng = np.random.RandomState(77)
    for task in range(2):
        lo = 0 if task == 0 else INIT2 + (task - 1) * INC2
        hi = INIT2 + task * INC2
        tm.before_task(task, None, None, None)  # head width -> hi
        _randomize_torch(tm.network, 700 + task)

        # sync my side FROM torch (carrying over only my own fisher/ref_params
        # — the unit under test at the second boundary)
        blocks, sc, sb = S.blocks_cifar(tm.network.backbone)
        fv = S.sync_resnet(blocks, sc, sb)
        k = np.zeros((FEAT, NUM2), np.float32)
        b = np.zeros((NUM2,), np.float32)
        k[:, :hi] = S.lin_k(tm.network.classifier.weight)
        b[:hi] = S.t2n(tm.network.classifier.bias)
        params = {"backbone": fv["params"],
                  "head": {"Dense_0": {"kernel": jnp.asarray(k),
                                       "bias": jnp.asarray(b)}}}
        mvars = dict(state.mvars)
        mvars["model_state"] = {"batch_stats": fv["batch_stats"]}
        state = state.replace(params=params, mvars=mvars)
        state = m.start_task(state, task, lo, hi)

        imgs = rng.randint(0, 256, size=(PER_TASK, 32, 32, 3)).astype(np.uint8)
        labels = rng.randint(lo, hi, size=(PER_TASK,)).astype(np.int32)

        tm.after_task(task, None,
                      FisherLoader(imgs, labels.astype(np.int64), B2), None)
        state = m.after_task(
            state, task, TaskData(images=imgs, labels=labels,
                                  class_lo=lo, class_hi=hi))

        # merged Fisher must agree on both sides after EVERY boundary
        name_of = {id(p): n for n, p in tm.network.named_parameters()}
        my_fisher = _host_tree(state.mvars["fisher"])
        worst = 0.0
        for t, path, inv in S.resnet_param_pairs(blocks, sc, sb, linear=None):
            name = name_of[id(t)]
            ref_f = tm.fisher[name].numpy()
            mine_f = inv(S.tree_get(my_fisher, path))
            bound = 2.0 * np.sqrt(np.abs(ref_f)) * FISHER_GRAD_NOISE + FISHER_ATOL
            excess = float((np.abs(mine_f - ref_f) / bound).max())
            assert excess <= 1.0, (
                f"task{task} merged Fisher diverged at {name} "
                f"(init!=inc): exceeds noise bound by {excess:.2f}x")
            worst = max(worst, excess)
        # head: reference rows span [0:hi); my fixed-width cols beyond hi
        # carry exactly-zero Fisher (masked softmax)
        hk = np.asarray(my_fisher["head"]["Dense_0"]["kernel"])  # (FEAT, NUM2)
        hb = np.asarray(my_fisher["head"]["Dense_0"]["bias"])
        ref_hk = tm.fisher["classifier.weight"].numpy()  # (hi, FEAT)
        ref_hb = tm.fisher["classifier.bias"].numpy()
        for mine_f, ref_f in ((hk[:, :hi].T, ref_hk), (hb[:hi], ref_hb)):
            bound = 2.0 * np.sqrt(np.abs(ref_f)) * FISHER_GRAD_NOISE + FISHER_ATOL
            excess = float((np.abs(mine_f - ref_f) / bound).max())
            assert excess <= 1.0, (
                f"task{task} merged head Fisher diverged (init!=inc): "
                f"exceeds noise bound by {excess:.2f}x")
        assert float(np.abs(hk[:, hi:]).max()) == 0.0
        print(f"task{task} merged-fisher worst noise-bound fraction {worst:.2e}")
