"""Trainer-level lockstep differential #9: a FULL 2-task LUCIR run — the
cosine-classifier rebalancing family — against the executing reference
(core/model/lucir.py).

Seams pinned beyond the step/eval differentials:

  * the DATA-DEPENDENT imprinting boundary: before_task(1) initializes the
    new cosine columns from normalized class-mean backbone features scaled
    by the average old embedding norm (lucir.py:134-159) — executed by the
    reference's own `_init_new_fc` over a DataLoader of the same task data
    in the same order, and compared column-by-column against my
    post-before_task head;
  * the hardcoded optimizer-group semantics at task > 0: base params at
    lr=0.1/wd=5e-4, fc1 (old embeddings) at lr=0/wd=0 (lucir.py:232-238) —
    the reason my old-column freeze is an UPDATE mask (trainable_mask), so
    the chain's coupled weight decay cannot shrink what the reference
    pins exactly;
  * teacher (ref_model) snapshot at the task boundary, the hook-captured
    less-forget cosine-embedding loss + CE at cur_lamda =
    lamda*sqrt(n_old/inc) (lucir.py:94-112, 175-190), trained through the
    growing CosineLinear -> SplitCosineLinear head;
  * sigma-scaled cosine eval -> the acc_table.

Scope: buffer_size 0, so the margin-ranking term is inert (it fires only
on old-class samples, which replay provides; its math is pinned by the
mixed-batch step-level loss differential). The backbone is cifar_resnet20
(the reference constructor accepts any backbone with `.feature`; the
modified_ResNet variant's forward parity is covered by
test_reference_parity.py).

Protocol: PIECEWISE lockstep with FULL-BATCH epochs (one step per epoch),
as test_trainer_lockstep_wa.py: at the reference-mandated lr 0.1, f32
train-mode-BN chaos amplifies too fast for multi-step segments.
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
BATCH = 24  # full-batch epochs: one piecewise segment per step
EPOCHS0, EPOCHS1 = 3, 2
PER_CLASS = 6
LR, MOM, WD, SEED = 0.1, 0.9, 5e-4, 83  # the reference's hardcoded groups
K_MR, LW_MR, DIST, LAMDA = 2, 1.0, 0.5, 5.0
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
TOL_PARAM = 1e-2  # lr 0.1: one-step fp drift scale (see BiC lockstep)
TOL_IMPRINT = 1e-5


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
        "classifier": {"name": "LUCIR", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": FEAT, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS, "K": K_MR,
            "lw_mr": LW_MR, "dist": DIST, "lamda": LAMDA}},
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


class ImprintDataset(torch.utils.data.Dataset):
    """The dataset contract _init_new_fc reads (lucir.py:139-153):
    `.images`/`.labels` arrays mutated in place, items as tensors
    (module-level so DataLoader workers can pickle it)."""

    def __init__(self, images, labels):
        self.images, self.labels = images, labels

    def __getitem__(self, i):
        x = self.images[i].astype(np.float32) / 255.0
        x = (x - MEAN) / STD
        return {"image": torch.from_numpy(x.transpose(2, 0, 1)),
                "label": int(self.labels[i])}

    def __len__(self):
        return len(self.labels)


class _LoaderShim:
    def __init__(self, dataset):
        self.dataset = dataset


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


def _torch_head_write(tm, kernel, sigma):
    """my (feat, num_class) kernel cols -> CosineLinear/SplitCosineLinear."""
    cls = tm.network.classifier
    with torch.no_grad():
        if hasattr(cls, "fc1"):
            n1 = cls.fc1.out_features
            cls.fc1.weight.copy_(torch.from_numpy(kernel[:, :n1].T.copy()))
            cls.fc2.weight.copy_(torch.from_numpy(
                kernel[:, n1:n1 + cls.fc2.out_features].T.copy()))
        else:
            n = cls.out_features
            cls.weight.copy_(torch.from_numpy(kernel[:, :n].T.copy()))
        cls.sigma.fill_(float(sigma))


def _torch_head_read(tm):
    cls = tm.network.classifier
    if hasattr(cls, "fc1"):
        k = np.concatenate([S.lin_k(cls.fc1.weight), S.lin_k(cls.fc2.weight)],
                           axis=1)
    else:
        k = S.lin_k(cls.weight)
    return k, float(cls.sigma)


def test_lucir_two_task_lockstep(tmp_path):
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_lucir = _refload.ref_module("core.model.lucir")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side
    torch.manual_seed(89)
    tm = ref_lucir.LUCIR(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                         K=K_MR, lw_mr=LW_MR, dist=DIST, lamda=LAMDA,
                         init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
                         device=DEV)
    _randomize_torch(tm.network, 951)
    g = torch.Generator().manual_seed(952)
    with torch.no_grad():
        tm.network.classifier.weight.normal_(0, 0.1, generator=g)
        tm.network.classifier.sigma.fill_(3.0)

    # ---- my side: full Trainer; weights from torch (head cols [:INIT])
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))
    blocks, sc, sb = S.blocks_cifar(tm.network.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    k0 = np.array(np.asarray(trainer.state.params["head"]["kernel"]),
                  np.float32)
    k0[:, :INIT] = S.lin_k(tm.network.classifier.weight)
    params = {"backbone": fv["params"],
              "head": {"kernel": jnp.asarray(k0),
                       "sigma": jnp.asarray(3.0, jnp.float32)}}
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(trainer.state.params), (
            "LUCIR param structure changed; update the lockstep sync")
    mstate = {"batch_stats": fv["batch_stats"]}
    mvars = dict(trainer.state.mvars)
    mvars["model_state"] = mstate
    mvars["teacher"] = jax.tree_util.tree_map(jnp.copy, params)
    mvars["teacher_state"] = jax.tree_util.tree_map(jnp.copy, mstate)
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    # capture my POST-before_task state (imprinted head) per task
    post_before = {}
    m = trainer.method
    orig_bt = type(m).before_task

    def record_before_task(state, task_idx, task_data):
        st = orig_bt(m, state, task_idx, task_data)
        post_before[task_idx] = _host_tree(st.params)
        return st

    m.before_task = record_before_task

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

    bb_pairs = S.resnet_param_pairs(blocks, sc, sb, linear=None)
    stat_pairs = S.resnet_stat_pairs(blocks, sb)

    def _resync(cap, optim=None):
        S.write_param_pairs(bb_pairs, cap["params"])
        _torch_head_write(tm, np.asarray(cap["params"]["head"]["kernel"]),
                          cap["params"]["head"]["sigma"])
        S.write_stat_pairs(stat_pairs, cap["stats"])
        if optim is not None:
            S.write_momentum(bb_pairs, cap["trace"], optim)
            tk = np.asarray(cap["trace"]["head"]["kernel"])
            cls = tm.network.classifier
            if hasattr(cls, "fc1"):
                n1 = cls.fc1.out_features
                optim.state[cls.fc1.weight]["momentum_buffer"] = \
                    torch.from_numpy(tk[:, :n1].T.copy())
                optim.state[cls.fc2.weight]["momentum_buffer"] = \
                    torch.from_numpy(tk[:, n1:NUM_CLASS].T.copy())
            else:
                optim.state[cls.weight]["momentum_buffer"] = \
                    torch.from_numpy(tk[:, :cls.out_features].T.copy())
            optim.state[cls.sigma]["momentum_buffer"] = torch.tensor(
                [float(cap["trace"]["head"]["sigma"])])  # sigma is shape (1,)

    # ---- torch side: reference loop, same data + batch order, piecewise
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        imgs = td.images.copy()
        labels = td.labels.astype(np.int64).copy()
        if task > 0:
            # pin torch to my end-of-prev-task state BEFORE before_task:
            # the teacher deepcopy and the imprinting feature pass must
            # both run from the exact weights my trainer had
            prev = captures[(task - 1, EPOCHS0 - 1)]
            S.write_param_pairs(bb_pairs, prev["params"])
            _torch_head_write(tm, np.asarray(prev["params"]["head"]["kernel"]),
                              prev["params"]["head"]["sigma"])
            S.write_stat_pairs(stat_pairs, prev["stats"])
        loader = _LoaderShim(ImprintDataset(imgs, labels.copy()))
        tm.before_task(task, None, loader, None)
        if task > 0:
            # the reference's own imprinting vs my post-before_task head
            ref_k, ref_sigma = _torch_head_read(tm)
            my_k = np.asarray(post_before[task]["head"]["kernel"])
            lo = INIT + (task - 1) * INC
            d = np.abs(ref_k[:, lo:lo + INC] - my_k[:, lo:lo + INC]).max()
            assert d <= TOL_IMPRINT, (
                f"imprinted novel columns diverged at task{task}: "
                f"max |diff| {d:.2e}")
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
            tm.network.train()  # trainer.py:574 (ref_model set eval by
            if tm.ref_model is not None:  # before_task; the model.train()
                tm.ref_model.train()      # cascade flips it back)
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
            tk, tsig = _torch_head_read(tm)
            ck = np.asarray(cap["params"]["head"]["kernel"])
            dp = max(dp, float(np.abs(tk - ck[:, :tk.shape[1]]).max()))
            dp = max(dp, abs(tsig - float(cap["params"]["head"]["sigma"])))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        _resync(captures[(task, epochs - 1)])
        tm.after_task(task, None, None, None)  # removes the hooks
        # eval: reference inference — sigma-scaled cosine argmax
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

    # frozen old embeddings: the reference's lr=0/wd=0 fc1 group means the
    # task-1 old columns END the run exactly as they entered it (the
    # imprint boundary does not touch them either)
    final_k = np.asarray(captures[(1, EPOCHS1 - 1)]["params"]["head"]["kernel"])
    entry_k = np.asarray(post_before[1]["head"]["kernel"])
    np.testing.assert_array_equal(
        final_k[:, :INIT], entry_k[:, :INIT],
        err_msg="frozen old cosine embeddings moved during task 1")
