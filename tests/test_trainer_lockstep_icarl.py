"""Trainer-level lockstep differential #2: a FULL 2-task iCaRL run — the
classic rehearsal path — against the executing reference's loop + buffer
semantics.

The L2P lockstep (test_trainer_lockstep.py) covers the prompt path; this
test covers every integration seam the rehearsal family adds on top:

  * LinearHerdingBuffer concat-into-task-data at task boundaries
    (reference trainer.py:305-312 — task images first, then buffer);
  * the reference's OWN herding exemplar selection executed verbatim
    (linearherdingbuffer.py:78-163: class-sorted candidates, normalized
    features, greedy running-mean argmin) vs my device herding kernel;
  * reduce_old_data prefix-keeping when the per-class quota shrinks
    (linearherdingbuffer.py:55-76);
  * KD teacher snapshot ordering inside after_task (icarl.py:167-189)
    and the trainer's model.train() flipping the frozen teacher back to
    train mode each epoch (trainer.py:574);
  * calc_class_mean -> NCM readout (icarl.py:122-152,226-287), and the
    acc_table built from it;
  * per-task init_epoch/epoch split, per-task SGD(momentum, weight_decay)
    re-init, and per-epoch MultiStepLR stepping (trainer.py:294,404).

Protocol — PIECEWISE lockstep. A whole-trajectory comparison is physically
impossible here: with synced f32 weights the first step's losses agree to
4e-7, but momentum-SGD on a BN net amplifies that fp seed ~5-10x PER STEP
(measured: 3.6e-7 -> 3.2e-2 across one 6-step epoch at lr=0.05), so any
tolerance tight enough to catch a real seam is blown by chaos within two
epochs. Instead the JAX trainer runs first, capturing its epoch-end states
via ``Trainer.epoch_hook`` (params + batch_stats + optax momentum trace +
per-step losses); the torch side then replays the reference loop epoch by
epoch, RE-SYNCED to my captured state at each epoch start, asserting

  (a) per-step train losses against my recorded per-step losses, and
  (b) its own epoch-end params against my captured epoch-end params,

so every epoch is validated from a common start and drift never spans more
than one epoch. A my-side seam (skipped batch, momentum reset, missing
weight decay, wrong LR milestone, mistimed buffer/teacher update) shifts
the endpoint by O(lr * effect * steps), far above the measured one-epoch
drift floor at lr=0.01. The torch side executes the reference METHOD +
BUFFER code unmodified over file-backed datasets (lossless PNGs of the
same synthetic arrays my trainer consumes — the reference buffer stores
image PATHS and PIL-loads them, icarl.py:226-287), with the reference
trainer loop semantics (trainer.py:259-614) replayed in my trainer's
deterministic batch order, exactly as the L2P lockstep does.

Discrete artifacts stay asserted exactly: the final exemplar buffers are
identical (labels AND pixels — both herding implementations picked the
same exemplars in the same order) and the final acc_table is identical.

Known benign deviation: flax BatchNorm tracks running variance with the
biased batch variance, torch with the unbiased one — at these shapes a
1/(N-1) relative drift on running_var, invisible to the discrete accuracy
and argmin assertions, absent from train losses (train mode uses batch
statistics on both sides), and never compounding here because stats are
re-synced each epoch.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
import PIL.Image

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
PER_CLASS = 6  # 24 imgs/task; with the 8-exemplar buffer all sizes divide
BUF_SIZE = 8  # task0 quota 2/class -> task1 quota 1/class: reduce path runs
# lr tuned for the piecewise protocol: low enough that one epoch of fp-chaos
# amplification stays ~1e-4, with weight_decay large enough that dropping it
# would move the epoch endpoint by ~lr*wd*3 steps = 6e-3 — two orders above
# the drift floor
LR, MOM, WD, SEED = 0.01, 0.9, 0.2, 13
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3  # per-step train loss, from a synced epoch start
TOL_PARAM = 2e-3  # epoch-end max-abs param diff (one epoch of drift)


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
        "classifier": {"name": "ICarl", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearHerdingBuffer",
                   "kwargs": {"buffer_size": BUF_SIZE, "batch_size": BATCH}},
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


def _trfms(pil_img):
    """The val/train transform both sides use: /255 then Normalize —
    callable on a PIL image, as the reference dataset contract expects."""
    x = np.asarray(pil_img, np.float32) / 255.0
    x = (x - MEAN) / STD
    return torch.from_numpy(x.transpose(2, 0, 1))


class RefDataset(torch.utils.data.Dataset):
    """The reference dataset contract the buffer code relies on: ``images``
    is a list of paths relative to ``data_root/mode`` PIL-loaded per item
    (icarl.py:233-241, linearherdingbuffer.py:99-121), with ``labels``,
    ``trfms``, ``data_root`` and ``mode`` attributes mutated in place by
    herding_select."""

    def __init__(self, data_root, mode, images, labels, trfms):
        self.data_root, self.mode = data_root, mode
        self.images, self.labels = images, labels
        self.trfms = trfms

    def __getitem__(self, idx):
        img = PIL.Image.open(os.path.join(
            self.data_root, self.mode, self.images[idx])).convert("RGB")
        return {"image": self.trfms(img), "label": int(self.labels[idx])}

    def __len__(self):
        return len(self.labels)


class LoaderShim:
    """What icarl.after_task reads off the trainer's DataLoaders."""

    def __init__(self, dataset, batch_size):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = 0
        self.pin_memory = False


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


def _full_pytree(t_backbone, t_linear):
    blocks, sc, sb = S.blocks_cifar(t_backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    head = {"Dense_0": {"kernel": jnp.asarray(S.lin_k(t_linear.weight)),
                        "bias": jnp.asarray(S.t2n(t_linear.bias))}}
    return ({"backbone": fv["params"], "head": head},
            {"batch_stats": fv["batch_stats"]})


def _host_tree(t):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), jax.device_get(t))


def _find_trace(opt_state):
    """Locate the optax TraceState (momentum) pytree inside a chained
    optimizer state tuple."""
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "trace")):
        if hasattr(part, "trace"):
            return part.trace
    raise AssertionError("SGD momentum trace not found in opt_state")


def test_icarl_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_icarl = _refload.ref_module("core.model.icarl")
    ref_buf = _refload.ref_module("core.model.buffer.linearherdingbuffer")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side: backbone + method + herding buffer
    torch.manual_seed(17)
    tm = ref_icarl.ICarl(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                         init_cls_num=INIT, inc_cls_num=INC,
                         task_num=TASKS, device=DEV)
    _randomize_torch(tm.network, 901)
    buffer = ref_buf.LinearHerdingBuffer(buffer_size=BUF_SIZE,
                                         batch_size=BATCH)

    # ---- my side: full Trainer, weights overwritten from the torch model
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    params, mstate = _full_pytree(tm.network.backbone, tm.network.classifier)
    assert set(params) == set(trainer.state.params), (
        "ICarl param structure changed; update the lockstep sync")
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = mstate
    # teacher is rewritten at after_task(0) before its first KD use; sync it
    # anyway so both sides are bit-identical from step zero
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

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    assert set(captures) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    # ---- file-backed datasets for the reference buffer machinery
    root = os.path.join(tmp_path, "refdata")
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rel_paths = []
    for t in range(TASKS):
        td = trainer.train_stream.task(t)
        rels = []
        for i in range(len(td)):
            rel = f"t{t}_{i:03d}.png"
            PIL.Image.fromarray(td.images[i]).save(
                os.path.join(root, "train", rel))
            rels.append(rel)
        rel_paths.append(rels)

    def _load_rel(paths):
        return np.stack([
            np.asarray(PIL.Image.open(
                os.path.join(root, "train", p)).convert("RGB"))
            for p in paths])

    # inverse-sync pairing (same correspondence sync_resnet uses)
    blocks, sc, sb = S.blocks_cifar(tm.network.backbone)
    param_pairs = S.resnet_param_pairs(blocks, sc, sb,
                                       linear=tm.network.classifier)
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _resync(cap, optim=None):
        S.write_param_pairs(param_pairs, cap["params"])
        S.write_stat_pairs(stat_pairs, cap["stats"])
        if optim is not None:
            S.write_momentum(param_pairs, cap["trace"], optim)

    # ---- torch side: the reference trainer loop, same data + batch order,
    # re-synced to my captured state at each epoch start (piecewise lockstep)
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        ds = RefDataset(root, "train", list(rel_paths[task]),
                        [int(y) for y in td.labels], _trfms)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        if task > 0 and len(buffer.labels) > 0:
            # reference trainer.py:305-312: buffer concatenated AFTER the
            # task's own samples
            buf_paths = list(buffer.images)
            buf_labels = [int(y) for y in buffer.labels]
            ds.images.extend(buf_paths)
            ds.labels.extend(buf_labels)
            imgs = np.concatenate([imgs, _load_rel(buf_paths)])
            labels = np.concatenate([labels,
                                     np.asarray(buf_labels, np.int64)])
        tm.before_task(task, buffer, None, None)
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
                # piecewise re-sync: torch starts this epoch from MY state
                # at the end of the previous epoch (params + running stats
                # + momentum buffers). Epoch 0 of each task needs no sync:
                # the fresh per-task optimizer has no momentum (reference
                # trainer.py:294) and params/stats were pinned to my
                # end-of-previous-task state before after_task ran.
                _resync(captures[(task, epoch - 1)], optim)
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
                optim.step()  # trainer.py:600-606 (generic branch)
                losses.append(float(loss.detach()))
            schedr.step()  # trainer.py:404 — per epoch
            cap = captures[(task, epoch)]
            # (a) per-step losses from the common epoch start
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine {cap['losses']}")
            # (b) epoch-end params: catches momentum / wd / lr / batch-order
            # seams that per-step losses (computed pre-update) cannot
            t_params, _ = _full_pytree(tm.network.backbone,
                                       tm.network.classifier)
            dp = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                t_params, cap["params"])))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # re-sync to my end-of-task state BEFORE the boundary machinery, so
        # the teacher snapshot (deepcopy of the now-synced network), herding
        # feature extraction, class means, the eval row below, and the next
        # task's epoch 0 all proceed from the exact state my trainer had —
        # the boundary SEMANTICS (ordering, quotas, selection, NCM) stay
        # 100% reference code, only the network values are pinned
        _resync(captures[(task, epochs - 1)])
        # after_task runs the reference buffer machinery verbatim:
        # teacher snapshot, reduce_old_data, herding_select (mutates ds),
        # calc_class_mean over PIL-loaded exemplars
        val_ds = RefDataset(root, "train", [], [], _trfms)
        tm.after_task(task, buffer, LoaderShim(ds, BATCH),
                      [LoaderShim(val_ds, BATCH)])
        buffer.total_classes += INIT if task == 0 else INC  # trainer.py:411
        # eval: the reference _validate — model.eval(), NCM inference
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

    # both herding implementations picked the same exemplars, same order
    my_buf_labels = np.asarray(trainer.buffer.labels)
    np.testing.assert_array_equal(
        my_buf_labels, np.asarray([int(y) for y in buffer.labels]),
        err_msg="exemplar label sequences diverged")
    ref_buf_imgs = _load_rel(list(buffer.images))
    np.testing.assert_array_equal(
        np.asarray(trainer.buffer.images), ref_buf_imgs,
        err_msg="exemplar pixels diverged — herding picked different images")

    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")
