"""Trainer-level lockstep differential: a FULL 2-task DER run — the
dynamic-expansion family — against the executing reference method under the
reference trainer-loop semantics (reference core/model/der.py,
core/trainer.py:259-614).

Seams this lockstep pins that step/eval-level differentials cannot:

  * the expansion choreography at before_task (der.py:194-208):
    freeze_convnets() FIRST (all existing extractors), THEN update_fc
    appends a new trainable extractor WARM-STARTED from the previous one's
    state_dict — params AND BatchNorm running stats (der.py:150-154). The
    reference's own copy is asserted bit-equal against my stacked-slot
    warm-start (methods/der.py:199-218) at the boundary;
  * fc expansion copy geometry (der.py:157-166): the old (known x k*D)
    weight block lands at [:known, :feat_dim-out_dim] of the new head —
    asserted bit-equal against my fixed-width head's live block;
  * frozen-old-extractor semantics over a whole trajectory: torch freezes
    via requires_grad=False (grad None -> SGD skips, so no wd either),
    mine via update masking AFTER add_decayed_weights — old-slot params are
    asserted equal at every epoch end;
  * CE over the concat features + the aux head on the NEWEST extractor's
    features with remapped targets ``old -> 0, new -> y - known + 1``
    (der.py:119-129), riding momentum-SGD + MultiStepLR over a whole run;
  * the reference trainer's model.train() each epoch (trainer.py:575)
    flipping the "frozen" extractors back to train-mode BN — their outputs
    use the current batch's statistics all run long (DER._train, which
    would keep them in eval mode, is dead code: the trainer only ever calls
    nn.Module.train());
  * eval over the concatenated features at the grown width vs my
    active-prefix masked readout, and the acc_table.

Protocol — PIECEWISE lockstep, exactly as test_trainer_lockstep_icarl.py
(see there for the fp-chaos measurement): my trainer runs first capturing
epoch-end states via ``Trainer.epoch_hook``; the torch side replays the
reference loop re-synced from those captures at each epoch start. Two
DER-specific sync points, both at the task-1 boundary: the expanded fc's
fresh entries (new rows entirely, old rows' new-extractor columns) and the
regenerated aux_fc are global-RNG kaiming draws (der.py:43-63,172) —
unmirrorable — so they are pinned from my post-before_task boundary capture
AFTER asserting the deterministic parts (warm-start copy, old-block copy)
match bit-exact.

Known benign deviation (documented in PARITY.md): the reference mutates the
frozen extractors' BN *running stats* during training (train-mode BN side
effect); mine stay frozen at their end-of-own-task values. Running stats
never enter train-mode forwards, and the piecewise protocol re-pins them at
each sync point, so the assertion surface is unaffected.
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
FEAT = 512  # reference get_convnet hardcodes cifar resnet18 (der.py:30-36)
BATCH = 24  # FULL-BATCH epochs (one piecewise segment per step), as
# test_trainer_lockstep_lucir.py: resnet18 is 8x wider than the other
# locksteps' resnet20 and its f32 train-mode-BN chaos amplifies ~3.4e-3
# over a 3-step segment at lr 0.01 — one step per epoch keeps the drift
# floor an order below the wd signature the tolerance must detect
EPOCHS0, EPOCHS1 = 3, 2  # init_epoch != epoch: exercises the split
PER_CLASS = 6  # 24 imgs/task = one full batch per epoch
# lr/wd rationale: see test_trainer_lockstep_icarl.py:87-91
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 31
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
        "backbone": {"name": "resnet18",
                     "kwargs": {"args": {"dataset": "cifar100"}}},
        "classifier": {"name": "DER", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": BATCH}},
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


def _host_tree(t):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), jax.device_get(t))


def _find_trace(opt_state):
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "trace")):
        if hasattr(part, "trace"):
            return part.trace
    raise AssertionError("SGD momentum trace not found in opt_state")


def _slot(pairs, t):
    """Wrap single-net (tensor, path, inv) triples so the pytree leaf is
    sliced to stacked-extractor slot ``t`` before the inv transform."""
    return [(buf, path, (lambda a, inv=inv: inv(np.asarray(a)[t])))
            for buf, path, inv in pairs]


def test_der_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_der = _refload.ref_module("core.model.der")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side. before_task(0) CREATES convnet[0] + fc +
    # aux_fc (der.py:149-172), so it runs during setup; the replay loop
    # below must not re-enter it for task 0 (a second call would freeze
    # convnet[0] and append a premature second extractor).
    torch.manual_seed(37)
    tm = ref_der.DER(ref_resnet.resnet18(args={"dataset": "cifar100"}),
                     FEAT, NUM_CLASS, init_cls_num=INIT, inc_cls_num=INC,
                     task_num=TASKS, device=DEV)
    tm.before_task(0, None, None, None)
    _randomize_torch(tm.convnets[0], 911)

    # ---- my side: full Trainer, weights overwritten from the torch model.
    # My extractor stack slot 0 <- convnet[0]; slot 1 keeps my init (my
    # before_task(1) overwrites it with the warm-start copy, matching the
    # reference's load_state_dict). The torch fc is (INIT, FEAT) over ONE
    # extractor's features; it maps onto the [:FEAT, :INIT] block of my
    # fixed (task_num*FEAT, NUM_CLASS) head — the dead blocks keep my init
    # (zero-padded features give them zero grads; torch's corresponding
    # fresh entries are pinned from mine at the task-1 boundary).
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    blocks0, sc0, sb0 = S.blocks_torchvision(tm.convnets[0])
    fv = S.sync_resnet(blocks0, sc0, sb0)
    assert set(trainer.state.params) == {"backbone", "head", "aux"}, (
        "DER param structure changed; update the lockstep sync")
    params = jax.tree_util.tree_map(lambda x: x, trainer.state.params)
    params["backbone"] = jax.tree_util.tree_map(
        lambda stk, one: jnp.asarray(stk).at[0].set(jnp.asarray(one)),
        params["backbone"], fv["params"])
    hd = params["head"]["Dense_0"]
    params["head"] = {"Dense_0": {
        "kernel": jnp.asarray(hd["kernel"]).at[:FEAT, :INIT].set(
            jnp.asarray(S.lin_k(tm.fc.weight))),
        "bias": jnp.asarray(hd["bias"]).at[:INIT].set(
            jnp.asarray(S.t2n(tm.fc.bias))),
    }}
    # aux_fc exists at task 0 but is outside the loss graph (der.py:117-129
    # — task-0 branch is plain CE); both sides regenerate it at task 1
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = jax.tree_util.tree_map(
        lambda stk, one: jnp.asarray(stk).at[0].set(jnp.asarray(one)),
        mvars["model_state"], {"batch_stats": fv["batch_stats"]})
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    captures, boundary = {}, {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "stats": _host_tree(
                state.mvars["model_state"]["batch_stats"]),
            "trace": _host_tree(_find_trace(state.opt_state)),
            "losses": np.asarray(step_losses, np.float64),
        }

    trainer.epoch_hook = _capture
    orig_bt = trainer.method.before_task

    def _spy(state, task_idx, task_data):
        s = orig_bt(state, task_idx, task_data)
        # post-boundary state: the warm-started slot, my head (unchanged
        # through the boundary), and the freshly drawn aux params
        boundary[task_idx] = {
            "params": _host_tree(s.params),
            "stats": _host_tree(s.mvars["model_state"]["batch_stats"]),
        }
        return s

    trainer.method.before_task = _spy
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    assert set(captures) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    # ---- torch side: the reference trainer loop, same data + batch order,
    # re-synced to my captured state at each epoch start
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    conv_pairs = {0: _slot(S.resnet_param_pairs(blocks0, sc0, sb0), 0)}
    stat_paths = {0: S.resnet_stat_pairs(blocks0, sb0)}

    def _head_pairs(total, k):
        def inv_k(a):
            return np.ascontiguousarray(
                np.asarray(a)[:FEAT * k, :total].T)

        def inv_b(a):
            return np.ascontiguousarray(np.asarray(a)[:total])

        return [(tm.fc.weight, ("head", "Dense_0", "kernel"), inv_k),
                (tm.fc.bias, ("head", "Dense_0", "bias"), inv_b)]

    def _aux_pairs():
        return [(tm.aux_fc.weight, ("aux", "Dense_0", "kernel"), S.inv_lin_k),
                (tm.aux_fc.bias, ("aux", "Dense_0", "bias"), S._ident)]

    def _write_stats(stats_tree, upto):
        """Pin every created extractor's running stats (stacked on my side)
        — re-freezing the reference's train-mode drift on the old nets."""
        with torch.no_grad():
            for t in range(upto + 1):
                for buf, path in stat_paths[t]:
                    buf.copy_(torch.from_numpy(np.ascontiguousarray(
                        np.asarray(S.tree_get(stats_tree, path),
                                   np.float32)[t])))

    for task in range(TASKS):
        total = INIT + task * INC
        if task > 0:
            # reference boundary runs verbatim: freeze_convnets ->
            # append + load_state_dict warm start -> fc expand/copy ->
            # aux_fc regen (torch state was pinned to my end-of-task state
            # by the end-of-task resync below)
            tm.before_task(task, None, None, None)
            blocks, sc, sb = S.blocks_torchvision(tm.convnets[task])
            conv_pairs[task] = _slot(S.resnet_param_pairs(blocks, sc, sb),
                                     task)
            stat_paths[task] = S.resnet_stat_pairs(blocks, sb)
            bnd = boundary[task]
            # (1) the reference's warm-start copy == my stacked-slot copy
            t_fv = S.sync_resnet(blocks, sc, sb)
            dws = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(
                    np.abs(np.asarray(a) - np.asarray(b)[task]).max()),
                t_fv["params"], bnd["params"]["backbone"])))
            assert dws <= 1e-7, f"warm-start copy diverged: {dws:.2e}"
            dss = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(
                    np.abs(np.asarray(a) - np.asarray(b)[task]).max()),
                t_fv["batch_stats"], bnd["stats"])))
            assert dss <= 1e-7, f"warm-start running stats diverged: {dss:.2e}"
            # (2) fc expansion copied the old block to
            # [:known, :feat_dim-out_dim] (der.py:160-164)
            known = total - INC
            old_block = S.t2n(tm.fc.weight)[:known, :FEAT * task]
            my_block = np.asarray(S.tree_get(
                bnd["params"], ("head", "Dense_0", "kernel")))[
                    :FEAT * task, :known].T
            np.testing.assert_allclose(old_block, my_block, atol=1e-7,
                                       err_msg="fc expansion copy diverged")
            # (3) pin the unmirrorable fresh draws (new fc entries, aux_fc)
            # from my post-boundary state
            S.write_param_pairs(_head_pairs(total, task + 1) + _aux_pairs(),
                                bnd["params"])
        head_pairs = _head_pairs(total, task + 1)
        aux_pairs = _aux_pairs() if task > 0 else []
        train_pairs = conv_pairs[task] + head_pairs + aux_pairs
        optim = torch.optim.SGD(tm.get_parameters(cfg), lr=LR,
                                momentum=MOM, weight_decay=WD)
        schedr = torch.optim.lr_scheduler.MultiStepLR(
            optim, milestones=[2], gamma=0.1)

        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        epochs = EPOCHS0 if task == 0 else EPOCHS1
        n = len(labels)
        assert n % BATCH == 0
        steps = n // BATCH
        for epoch in range(epochs):
            if epoch > 0:
                cap = captures[(task, epoch - 1)]
                S.write_param_pairs(train_pairs, cap["params"])
                _write_stats(cap["stats"], task)
                S.write_momentum(train_pairs, cap["trace"], optim)
            tm.train()  # trainer.py:575 — flips frozen nets to train-mode BN
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
                f"max |diff| {dl:.2e}\nref  {losses}\nmine {cap['losses']}")
            # epoch-end params: EVERY created extractor (old slots pin both
            # sides' freeze semantics against each other), fc, aux
            dp = 0.0
            for t in range(task + 1):
                bl, c, b = S.blocks_torchvision(tm.convnets[t])
                t_fv = S.sync_resnet(bl, c, b)
                dp = max(dp, max(jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(
                        lambda a, bb: float(np.abs(
                            np.asarray(a) - np.asarray(bb)[t]).max()),
                        t_fv["params"], cap["params"]["backbone"]))))
            hk = cap["params"]["head"]["Dense_0"]
            dp = max(dp, float(np.abs(
                S.lin_k(tm.fc.weight)
                - np.asarray(hk["kernel"])[:FEAT * (task + 1), :total]).max()))
            dp = max(dp, float(np.abs(
                S.t2n(tm.fc.bias) - np.asarray(hk["bias"])[:total]).max()))
            if task > 0:
                ak = cap["params"]["aux"]["Dense_0"]
                dp = max(dp, float(np.abs(
                    S.lin_k(tm.aux_fc.weight)
                    - np.asarray(ak["kernel"])).max()))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # pin end-of-task state (params + the drifted old-net running stats)
        # so eval and the next boundary proceed from my exact state
        cap = captures[(task, epochs - 1)]
        S.write_param_pairs(train_pairs, cap["params"])
        _write_stats(cap["stats"], task)
        tm.after_task(task, None, None, None)  # finetune.py:44-45 — a no-op
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
