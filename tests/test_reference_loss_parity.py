"""Differential LOSS parity: my method observe-math vs the EXECUTING
reference methods (torch, CPU).

For each method: build the reference method object on a cifar_resnet20
backbone, drive its before_task protocol to the target task, randomize its
weights, copy the exact same weights / teachers / fisher into my Method's
TrainState, feed both the same batch, and assert the scalar training loss
matches. This executes the reference's own loss code — the strongest parity
evidence available without its datasets.

Reference targets: core/model/{ewc,lwf,wa,lucir,icarl,erace,eraml,ocm,
InfLoRA,der}.py (cited per test).
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _refload
import _refsync as S
import libcontinual_tpu.methods  # noqa: F401 — populate the registry
from libcontinual_tpu.registry import METHODS

DEV = torch.device("cpu")
# 3 tasks x 4 classes so "seen" (8) != full head width (12) at task 1 —
# masked-softmax semantics are actually exercised, not vacuously equal
INIT, INC, TASKS = 4, 4, 3
NUM_CLASS = INIT + INC * (TASKS - 1)
FEAT = 64

REF_KW = dict(init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS, device=DEV)


@pytest.fixture(scope="module")
def ref_resnet():
    return _refload.ref_module("core.model.backbone.resnet")


def my_method(name, kwargs=None, backbone="cifar_resnet20", feat=FEAT,
              buffer=None, backbone_kwargs=None):
    cfg = {
        "dataset": "cifar100",
        "image_size": 32,
        "task_num": TASKS,
        "init_cls_num": INIT,
        "inc_cls_num": INC,
        "batch_size": 8,
        "epoch": 1,
        "dtype": "float32",
        "seed": 3,
        "backbone": {"name": backbone, "kwargs": dict(backbone_kwargs or {})},
        "classifier": {
            "name": name,
            "kwargs": {
                "num_class": NUM_CLASS, "feat_dim": feat,
                "init_cls_num": INIT, "inc_cls_num": INC, "task_num": TASKS,
                **(kwargs or {}),
            },
        },
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.01}},
        "lr_scheduler": {"name": "Constant"},
    }
    if buffer is not None:
        cfg["buffer"] = buffer
    m = METHODS.get(name)(cfg)
    state = m.init_state(jax.random.PRNGKey(0), (32, 32, 3))
    return m, state


def randomize_torch(model, seed):
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


def backbone_pytree(t_backbone):
    """torch cifar_resnet20 -> my flax {params, batch_stats}."""
    blocks, sc, sb = S.blocks_cifar(t_backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    return fv["params"], fv["batch_stats"]


def head_pytree(t_linear, width=NUM_CLASS):
    """torch Linear(feat, w<=width) -> my fixed-width LinearHead params;
    unseen columns zero (masked out of every loss by class masks)."""
    w = t_linear.out_features
    k = np.zeros((FEAT, width), np.float32)
    b = np.zeros((width,), np.float32)
    k[:, :w] = S.lin_k(t_linear.weight)
    b[:w] = S.t2n(t_linear.bias)
    return {"Dense_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}


def full_pytree(t_backbone, t_linear):
    bp, bs = backbone_pytree(t_backbone)
    return {"backbone": bp, "head": head_pytree(t_linear)}, {"batch_stats": bs}


def install(state, params, model_state, extra_mvars=None):
    mvars = dict(state.mvars)
    mvars["model_state"] = model_state
    mvars.update(extra_mvars or {})
    return state.replace(params=params, mvars=mvars)


def batch_of(seed, lo, hi, n=8):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 3, 32, 32).astype(np.float32)
    y = rng.randint(lo, hi, size=(n,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    return tb, jb


def assert_loss_close(t_loss, j_loss, label, tol=2e-4):
    t, j = float(t_loss.detach() if hasattr(t_loss, "detach") else t_loss), float(j_loss)
    assert abs(t - j) <= tol * max(1.0, abs(t)), (
        f"{label}: reference {t:.6f} vs mine {j:.6f}")


# ---------------------------------------------------------------- EWC


def test_ewc_loss_task0_and_task1(ref_resnet):
    """reference ewc.py:82-110 (observe) + :206-225 (penalty)."""
    ref_ewc = _refload.ref_module("core.model.ewc")
    lamda = 7.0
    tm = ref_ewc.EWC(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                     lamda=lamda, **REF_KW)
    m, state = my_method("EWC", {"lamda": lamda})

    # ---- task 0: CE over the init_cls-wide head
    tm.before_task(0, None, None, None)
    randomize_torch(tm.network, 101)
    params, mstate = full_pytree(tm.network.backbone, tm.network.classifier)
    state0 = install(state, params, mstate)
    state0 = m.start_task(state0, 0, 0, INIT)
    tb, jb = batch_of(5, 0, INIT)
    tm.network.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state0.params, state0, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "EWC task0 CE")

    # ---- task 1: current-task CE + lamda * fisher penalty
    tm.before_task(1, None, None, None)  # widens head to 8
    randomize_torch(tm.network, 102)
    # fisher/ref_param: random values shaped like the network, mirrored into
    # my pytrees through the same weight-sync machinery
    fisher_model = copy.deepcopy(tm.network)
    ref_model = copy.deepcopy(tm.network)
    g = torch.Generator().manual_seed(103)
    with torch.no_grad():
        for p in fisher_model.parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.5)
        for p in ref_model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.05)
    tm.fisher = {n: p.data.clone() for n, p in fisher_model.named_parameters()}
    tm.ref_param = {n: p.data.clone() for n, p in ref_model.named_parameters()}

    params, mstate = full_pytree(tm.network.backbone, tm.network.classifier)
    fisher_p, _ = full_pytree(fisher_model.backbone, fisher_model.classifier)
    ref_p, _ = full_pytree(ref_model.backbone, ref_model.classifier)
    state1 = install(state, params, mstate,
                     {"fisher": fisher_p, "ref_params": ref_p})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(6, INIT, INIT + INC)  # reference rebases y - old
    tm.network.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "EWC task1 CE+penalty")


# ---------------------------------------------------------------- ER-ACE/AML

AML_FEAT = 160


class _StubRefBuffer:
    """Deterministic stand-in for the reference buffer controller."""

    def __init__(self, x, y):
        self.x, self.y = x, y

    def __len__(self):
        return self.y.shape[0]

    def sample_random(self, **kw):
        return {"x": self.x, "y": self.y}

    sample = sample_random


def _aml_pair(name, kwargs, seed):
    """Build reference ERACE/ERAML + my method on the slim AML resnet18."""
    ref_resnet = _refload.ref_module("core.model.backbone.resnet")
    ref_mod = _refload.ref_module(f"core.model.{name.lower()}")
    tm = getattr(ref_mod, name)(
        ref_resnet.resnet18_AML(num_classes=NUM_CLASS), DEV,
        num_classes=NUM_CLASS, init_cls_num=INIT, inc_cls_num=INC,
        use_augs=True, **kwargs)
    randomize_torch(tm.model, seed)
    m, state = my_method(
        name, {"use_augs": True, **kwargs}, backbone="resnet18_AML",
        feat=AML_FEAT,
        buffer={"name": "ERBuffer", "kwargs": {"buffer_size": 64,
                                               "batch_size": 8}})
    blocks, sc, sb = S.blocks_aml(tm.model.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    params = {"backbone": fv["params"],
              "head": {"kernel": S.lin_k(tm.model.classifier.L.weight)}}
    m.augment = lambda rng, images, train=True: images  # isolate loss math
    return tm, m, state, params, {"batch_stats": fv["batch_stats"]}


def test_erace_loss_task1():
    """reference erace.py:69-99: incoming CE masked to classes >=
    seen_so_far + replay CE on buffer samples."""
    tm, m, state, params, mstate = _aml_pair("ERACE", {"task_free": True}, 501)
    rng = np.random.RandomState(61)
    rx = rng.randn(10, 3, 32, 32).astype(np.float32)
    ry = rng.randint(0, INIT, size=(10,)).astype(np.int64)
    tm.buffer = _StubRefBuffer(torch.from_numpy(rx), torch.from_numpy(ry))
    tm.cur_task_idx = 1
    tm.seen_so_far = INIT
    jrx = jnp.asarray(rx.transpose(0, 2, 3, 1))
    jry = jnp.asarray(ry.astype(np.int32))
    m.sample_replay = lambda buf, k, amt: (jrx, jry, jnp.ones((10,), jnp.float32))

    state1 = install(state, params, mstate,
                     {"seen_so_far": jnp.asarray(INIT, jnp.int32)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    mvars = dict(state1.mvars)
    mvars["buffer"] = dict(mvars["buffer"], n_seen=jnp.asarray(10, jnp.int32))
    state1 = state1.replace(mvars=mvars)
    tb, jb = batch_of(10, INIT, INIT + INC)
    tm.model.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "ERACE task1 maskedCE+replayCE")


def test_eraml_loss_task1():
    """reference eraml.py:83-177: SupCon over mined pos/neg (single joint
    forward) + replay CE."""
    tm, m, state, params, mstate = _aml_pair(
        "ERAML", {"task_free": False, "supcon_temperature": 0.2,
                  "use_minimal_selection": False}, 502)
    B = 8
    rng = np.random.RandomState(71)
    pos = rng.randn(B, 3, 32, 32).astype(np.float32)
    neg = rng.randn(B, 3, 32, 32).astype(np.float32)
    pos_y = rng.randint(INIT, INIT + INC, size=(B,)).astype(np.int64)
    neg_y = rng.randint(0, INIT, size=(B,)).astype(np.int64)
    rx = rng.randn(10, 3, 32, 32).astype(np.float32)
    ry = rng.randint(0, INIT + INC, size=(10,)).astype(np.int64)

    tm.buffer = _StubRefBuffer(torch.from_numpy(rx), torch.from_numpy(ry))
    tm.cur_task_idx = 1
    invalid = torch.zeros(B, dtype=torch.bool)
    tm.sample = lambda inc_data, **kw: (
        torch.from_numpy(pos), torch.from_numpy(neg),
        torch.from_numpy(pos_y), torch.from_numpy(neg_y), invalid, None)

    # my buffer: bx[0:B] = pos, bx[B:2B] = neg; _mine pinned to those slots
    cap = state.mvars["buffer"]["bx"].shape[0]
    bx = np.zeros((cap, 32, 32, 3), np.float32)
    bx[:B] = pos.transpose(0, 2, 3, 1)
    bx[B:2 * B] = neg.transpose(0, 2, 3, 1)
    by = np.zeros((cap,), np.int32)
    by[:B], by[B:2 * B] = pos_y, neg_y
    buf = {"bx": jnp.asarray(bx), "by": jnp.asarray(by),
           "bt": jnp.zeros((cap,), jnp.int32),
           "n_seen": jnp.asarray(2 * B, jnp.int32)}
    m._mine = lambda b, labels, task, k: (
        jnp.arange(B), jnp.arange(B, 2 * B), jnp.ones((B,), jnp.float32))
    jrx = jnp.asarray(rx.transpose(0, 2, 3, 1))
    jry = jnp.asarray(ry.astype(np.int32))
    m.sample_replay = lambda b, k, amt: (jrx, jry, jnp.ones((10,), jnp.float32))

    state1 = install(state, params, mstate, {"buffer": buf})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(11, INIT, INIT + INC, n=B)
    tm.model.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "ERAML task1 supcon+replayCE")


# ---------------------------------------------------------------- LUCIR


def test_lucir_loss_task1(ref_resnet):
    """reference lucir.py:175-210: CE over sigma-scaled cosine logits
    + cur_lamda * less-forget cosine embedding + lw_mr * margin ranking."""
    ref_lucir = _refload.ref_module("core.model.lucir")
    kw = dict(K=2, lw_mr=1.0, dist=0.5, lamda=5.0)
    tm = ref_lucir.LUCIR(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                         **kw, **REF_KW)
    m, state = my_method("LUCIR", kw)

    # task-0 head: CosineLinear(feat, INIT); randomize then snapshot teacher
    randomize_torch(tm.network, 401)
    g = torch.Generator().manual_seed(402)
    with torch.no_grad():
        tm.network.classifier.weight.normal_(0, 0.1, generator=g)
        tm.network.classifier.sigma.fill_(3.7)
    tm.ref_model = copy.deepcopy(tm.network)
    tm.ref_model.train()  # trainer model.train() undoes before_task's eval
    # widen: SplitCosineLinear(fc1=old rows, fc2=new) as before_task does
    # (lucir.py:86-93), minus the dataset-dependent imprinting
    new_fc = ref_resnet.SplitCosineLinear(FEAT, INIT, INC)
    with torch.no_grad():
        new_fc.fc1.weight.copy_(tm.network.classifier.weight.data)
        new_fc.fc2.weight.normal_(0, 0.1, generator=g)
        new_fc.sigma.copy_(tm.network.classifier.sigma.data)
        for p in tm.network.backbone.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    tm.network.classifier = new_fc
    tm.task_idx = 1
    tm.cur_lamda = kw["lamda"] * float(np.sqrt(INIT / INC))
    tm.num_old_classes = INIT
    tm.loss_fn1 = torch.nn.CosineEmbeddingLoss()
    tm.loss_fn2 = torch.nn.CrossEntropyLoss()
    tm.loss_fn3 = torch.nn.MarginRankingLoss(margin=kw["dist"])
    tm.handle_ref_features = tm.ref_model.classifier.register_forward_hook(
        ref_lucir.get_ref_features)
    tm.handle_cur_features = tm.network.classifier.register_forward_hook(
        ref_lucir.get_cur_features)
    tm.handle_old_scores_bs = tm.network.classifier.fc1.register_forward_hook(
        ref_lucir.get_old_scores_before_scale)
    tm.handle_new_scores_bs = tm.network.classifier.fc2.register_forward_hook(
        ref_lucir.get_new_scores_before_scale)

    # my side: 12-wide cosine head, cols 0-8 = [fc1; fc2] rows
    bp, bs = backbone_pytree(tm.network.backbone)
    k = np.zeros((FEAT, NUM_CLASS), np.float32)
    k[:, :INIT] = S.lin_k(new_fc.fc1.weight)
    k[:, INIT:INIT + INC] = S.lin_k(new_fc.fc2.weight)
    params = {"backbone": bp,
              "head": {"kernel": jnp.asarray(k),
                       "sigma": jnp.asarray(3.7, np.float32)}}
    t_bp, t_bs = backbone_pytree(tm.ref_model.backbone)
    t_params = {"backbone": t_bp,
                "head": dict(state.mvars["teacher"]["head"])}
    state1 = install(state, params, {"batch_stats": bs},
                     {"teacher": t_params,
                      "teacher_state": {"batch_stats": t_bs},
                      "cur_lamda": jnp.asarray(tm.cur_lamda, jnp.float32)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(9, 0, INIT + INC)  # mixed labels: MR needs old samples
    tm.network.backbone.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "LUCIR task1 CE+LF+MR")


# ---------------------------------------------------------------- OCM


class _StubOCMBuffer:
    def __init__(self, x, y):
        self.x, self.y = x, y

    def sample(self, n, exclude_task=None):
        return self.x, self.y, None

    def add_reservoir(self, **kw):
        pass


def _ocm_pair(ref_resnet, monkeypatch, seed):
    ref_ocm = _refload.ref_module("core.model.ocm")
    backbone = ref_resnet.resnet18(
        args={"dataset": "cifar100", "init_cls_num": INIT, "inc_cls_num": INC})
    tm = ref_ocm.OCM(backbone, 512, NUM_CLASS, image_size=32, **REF_KW)
    randomize_torch(tm.model, seed)
    tm.simclr_aug = torch.nn.Identity()
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **kw: torch.zeros(max(n, 1), dtype=torch.long))
    # reference observe hardcodes .cuda() on the rotation labels (ocm.py:918)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    import libcontinual_tpu.methods.ocm as my_ocm_mod
    m, state = my_method("OCM", {"feat_dim": 512}, backbone="resnet18",
                         feat=512,
                         buffer={"name": "OnlineBuffer",
                                 "kwargs": {"buffer_size": 64}})
    m._simclr_aug = lambda rng, x: x
    m._slice_ids = lambda a, b: (0, 0)

    blocks, sc, sb = S.blocks_torchvision(tm.model.backbone)
    fv = S.sync_resnet(blocks, sc, sb)
    params = {
        "backbone": fv["params"],
        "head": {"Dense_0": {"kernel": S.lin_k(tm.model.classifier.weight),
                             "bias": S.t2n(tm.model.classifier.bias)}},
        "proj": {"kernel": S.lin_k(tm.model.head.weight),
                 "bias": S.t2n(tm.model.head.bias)},
    }
    return ref_ocm, tm, m, state, params, {"batch_stats": fv["batch_stats"]}, my_ocm_mod


def test_ocm_loss_first_task(ref_resnet, monkeypatch):
    """reference ocm.py:912-936: full-head CE + NT-Xent over the 16x
    rotation pair (augs pinned to identity, slice ids pinned to 0)."""
    _, tm, m, state, params, mstate, _ = _ocm_pair(ref_resnet, monkeypatch, 601)
    tm.cur_task_id = 0
    tm.buffer = _StubOCMBuffer(None, None)  # observe ends in add_reservoir
    m._cur_task = 0
    state0 = install(state, params, mstate)
    state0 = m.start_task(state0, 0, 0, INIT)

    rng = np.random.RandomState(81)
    xf = rng.rand(2, 3, 32, 32).astype(np.float32)  # [0,1] floats
    y = rng.randint(0, INIT, size=(2,)).astype(np.int64)
    tb = {"image": torch.from_numpy(xf), "label": torch.from_numpy(y)}
    jb = {"image": jnp.asarray(xf.transpose(0, 2, 3, 1)) * 255.0,
          "label": jnp.asarray(y.astype(np.int32))}
    tm.model.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state0.params, state0, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "OCM first-task CE+NTXent", tol=5e-4)


def test_ocm_loss_incremental(ref_resnet, monkeypatch):
    """reference ocm.py:939-986: joint [pair; pair_r] forward, replay CE,
    three NT-Xent terms, old-logit MSE vs the previous model."""
    ref_ocm, tm, m, state, params, mstate, my_ocm_mod = _ocm_pair(
        ref_resnet, monkeypatch, 602)
    rng = np.random.RandomState(82)
    mem = rng.rand(7, 3, 32, 32).astype(np.float32)
    mem_y = rng.randint(0, INIT, size=(7,)).astype(np.int64)
    tm.cur_task_id = 1
    tm.prev_cls_num = INIT
    tm.accu_cls_num = INIT + INC
    tm.class_holder = [torch.tensor(0)]  # -> buffer_batch = min(64, 7*1) = 7
    tm.buffer = _StubOCMBuffer(torch.from_numpy(mem), torch.from_numpy(mem_y))
    tm.previous_model = copy.deepcopy(tm.model)
    g = torch.Generator().manual_seed(603)
    with torch.no_grad():
        for p in tm.previous_model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    tm.previous_model.train()  # trainer model.train() leaves it in train

    m._cur_task = 1
    m._buffer_batch = lambda: 7
    jmx = jnp.asarray(mem.transpose(0, 2, 3, 1)) * 255.0
    jmy = jnp.asarray(mem_y.astype(np.int32))
    monkeypatch.setattr(
        my_ocm_mod, "sample_random",
        lambda buf, k, n: (jmx, jmy, jnp.ones((7,), jnp.float32)))

    # teacher pytree from previous_model
    blocks, sc, sb = S.blocks_torchvision(tm.previous_model.backbone)
    tfv = S.sync_resnet(blocks, sc, sb)
    teacher = {
        "backbone": tfv["params"],
        "head": {"Dense_0": {
            "kernel": S.lin_k(tm.previous_model.classifier.weight),
            "bias": S.t2n(tm.previous_model.classifier.bias)}},
        "proj": {"kernel": S.lin_k(tm.previous_model.head.weight),
                 "bias": S.t2n(tm.previous_model.head.bias)},
    }
    state1 = install(state, params, mstate,
                     {"teacher": teacher,
                      "teacher_state": {"batch_stats": tfv["batch_stats"]}})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    xf = rng.rand(2, 3, 32, 32).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(2,)).astype(np.int64)
    tb = {"image": torch.from_numpy(xf), "label": torch.from_numpy(y)}
    jb = {"image": jnp.asarray(xf.transpose(0, 2, 3, 1)) * 255.0,
          "label": jnp.asarray(y.astype(np.int32))}
    tm.model.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "OCM incremental joint-forward loss",
                      tol=5e-4)


# ---------------------------------------------------------------- LwF


def test_lwf_loss_task1(ref_resnet):
    """reference lwf.py:52-77: current-task CE + 3x T=2 distillation of the
    old head against the frozen pre-task snapshot."""
    ref_lwf = _refload.ref_module("core.model.lwf")
    tm = ref_lwf.LWF(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS, **REF_KW)
    m, state = my_method("LWF")

    tm.before_task(0, None, None, None)
    randomize_torch(tm.backbone, 201)
    g = torch.Generator().manual_seed(202)
    with torch.no_grad():
        tm.classifier.weight.normal_(0, 0.1, generator=g)
        tm.classifier.bias.normal_(0, 0.1, generator=g)
    tm.before_task(1, None, None, None)  # snapshots old_fc + old_backbone
    tm.old_backbone.train()  # the trainer's per-epoch model.train() undoes
    # the freeze()'s eval — teacher targets use batch statistics
    # diverge student from teacher after the snapshot
    with torch.no_grad():
        for p in tm.backbone.parameters():
            p.add_(torch.randn(p.shape) * 0.02)
        tm.classifier.weight.add_(torch.randn(tm.classifier.weight.shape) * 0.02)

    params, mstate = full_pytree(tm.backbone, tm.classifier)
    t_params, t_mstate = full_pytree(tm.old_backbone, tm.old_fc)
    state1 = install(state, params, mstate,
                     {"teacher": t_params, "teacher_state": t_mstate})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(7, INIT, INIT + INC)
    tm.backbone.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "LwF task1 CE+KD")


# ---------------------------------------------------------------- L2P


def test_l2p_loss_task1():
    """reference l2p.py:88-110 + prompt.py:369-406 + vit.py:100-117: frozen
    no-prompt query pass, batch-majority prompt selection, prompt-mean
    readout, current-task-masked CE minus the pull constraint — on the full
    ViT-B/16."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_l2p = _refload.ref_module("core.model.l2p")
    ref_tf = _refload.ref_module("core.model.backbone.transformer")

    # fixed global seed: ViTZoo init draws from torch's global RNG, and
    # with arbitrary weights two prompt keys can land within float noise of
    # each other — a CPU-reduction-order tie then flips the top-k selection
    # between frameworks (observed once). This seed has comfortable margins.
    torch.manual_seed(7)
    zoo = ref_vit.ViTZoo(pretrained=False)
    kw = dict(num_class=NUM_CLASS, feat_dim=768, prompt_length=5,
              pool_size=10, top_k=5, pull_constraint_coeff=0.1,
              **{k: v for k, v in REF_KW.items() if k != "device"})
    tm = ref_l2p.L2P(zoo, DEV, **kw)
    g = torch.Generator().manual_seed(1001)
    with torch.no_grad():
        tm.network.backbone.prompt.prompt.uniform_(0, 1, generator=g)
        tm.network.backbone.prompt.prompt_key.uniform_(0, 1, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()
    tm.cur_task_id = 1
    tm._known_classes = INIT

    m, state = my_method(
        "L2P",
        {"prompt_length": 5, "pool_size": 10, "top_k": 5,
         "pull_constraint_coeff": 0.1},
        backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(
        jnp.asarray, S.sync_vit(tm.network.backbone.feat, 12))
    params = {
        "head": {"Dense_0": {
            "kernel": S.lin_k(tm.network.classifier.weight),
            "bias": S.t2n(tm.network.classifier.bias)}},
        "prompt": {
            "prompt": S.t2n(tm.network.backbone.prompt.prompt)[0],
            "key": S.t2n(tm.network.backbone.prompt.prompt_key)},
    }
    state1 = install(state, params, {}, {"frozen": frozen})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(1002)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "L2P task1 maskedCE - pull", tol=1e-3)


# ---------------------------------------------------------------- BiC


def test_bic_stage1_distill_loss(ref_resnet):
    """reference bic.py:193-217 (stage1_distill): bias-corrected logits on
    both student and frozen teacher, T=2 soft target over the old classes,
    alpha*KD*T^2 + (1-alpha)*CE.

    NOTE: the reference's ResNet_BIC sets feat_dim=256 while its 32x32
    forward emits 64 features, so the shipped Model crashes on its own
    cifar configs (verified: mat1 1x64 @ mat2 256x12); the test repairs the
    head to the intended Linear(64, C) before comparing."""
    ref_bic = _refload.ref_module("core.model.bic")
    tm = ref_bic.bic(ref_resnet.cifar_resnet32_V2(), NUM_CLASS,
                     **REF_KW)
    tm.model.classifier = torch.nn.Linear(64, NUM_CLASS)  # repair (see note)
    randomize_torch(tm.model, 1301)
    import copy as _copy
    tm.previous_model = _copy.deepcopy(tm.model)
    g = torch.Generator().manual_seed(1302)
    with torch.no_grad():
        for p in tm.model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
        tm.bias_layers[0].alpha.fill_(1.3)
        tm.bias_layers[0].beta.fill_(0.2)
    tm.cur_task = 1
    tm.seen_cls = INIT + INC

    m, state = my_method("bic", {}, backbone="cifar_resnet32_V2", feat=64)
    blocks_p = S.sync_preact_resnet(tm.model.backbone)
    params = {"backbone": blocks_p["params"],
              "head": head_pytree(tm.model.classifier)}
    t_blocks = S.sync_preact_resnet(tm.previous_model.backbone)
    teacher = {"backbone": t_blocks["params"],
               "head": head_pytree(tm.previous_model.classifier)}
    alphas = np.ones((TASKS,), np.float32)
    betas = np.zeros((TASKS,), np.float32)
    alphas[0], betas[0] = 1.3, 0.2
    state1 = install(
        state, params, {"batch_stats": blocks_p["batch_stats"]},
        {"teacher": teacher,
         "teacher_state": {"batch_stats": t_blocks["batch_stats"]},
         "alphas": jnp.asarray(alphas), "betas": jnp.asarray(betas)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(15, 0, INIT + INC)  # BiC replays old classes
    tm.model.train()
    _, _, t_loss = tm.stage1_distill(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "BiC stage1 distill")


# ---------------------------------------------------------------- InfLoRA


def test_inflora_loss_task1():
    """reference InfLoRA.py:68-88 observe on the full SiNet_vit (ViT-B/16
    with per-task k/v LoRA, vit_inflora.py:262-286): logits from the
    CURRENT task's classifier_pool head over the task<=1 summed LoRA
    deltas, CE on offset labels — vs my stacked-LoRA merged-delta forward
    with current-task-masked CE (methods/lora_base.py loss)."""
    ref_sinet = _refload.ref_module("core.model.backbone.SiNet")
    ref_if = _refload.ref_module("core.model.InfLoRA")

    RANK = 4
    torch.manual_seed(11)
    net = ref_sinet.SiNet_vit(total_sessions=TASKS, rank=RANK,
                              init_cls=INIT, embd_dim=768)
    tm = ref_if.InfLoRA(net, 768, NUM_CLASS, lame=1.0, lamb=0.95,
                        total_sessions=TASKS, **REF_KW)
    g = torch.Generator().manual_seed(1501)
    with torch.no_grad():
        for blk in net.image_encoder.blocks:
            for t in range(2):  # tasks 0 and 1 carry non-zero adapters
                for lin in (blk.attn.lora_A_k[t], blk.attn.lora_B_k[t],
                            blk.attn.lora_A_v[t], blk.attn.lora_B_v[t]):
                    lin.weight.uniform_(-0.05, 0.05, generator=g)
        for pool in net.classifier_pool:
            pool.weight.normal_(0, 0.1, generator=g)
            pool.bias.normal_(0, 0.1, generator=g)
    net.update_fc(INIT)
    net.update_fc(INIT + INC)  # numtask = 2 -> current head = pool[1]
    tm._cur_task = 1
    tm._known_classes = INIT
    tm._total_classes = INIT + INC

    m, state = my_method(
        "InfLoRA",
        {"rank": RANK, "lame": 1.0, "lamb": 0.95, "total_sessions": TASKS},
        backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(
        jnp.asarray, S.sync_inflora_vit(net.image_encoder, 12))
    L, T, d = 12, TASKS, 768
    lora = {k: np.zeros(v.shape, np.float32)
            for k, v in state.params["lora"].items()}
    for li, blk in enumerate(net.image_encoder.blocks):
        for t in range(2):
            lora["A_k"][li, t] = S.t2n(blk.attn.lora_A_k[t].weight)
            lora["B_k"][li, t] = S.t2n(blk.attn.lora_B_k[t].weight)
            lora["A_v"][li, t] = S.t2n(blk.attn.lora_A_v[t].weight)
            lora["B_v"][li, t] = S.t2n(blk.attn.lora_B_v[t].weight)
    kern = np.zeros((768, NUM_CLASS), np.float32)
    bias = np.zeros((NUM_CLASS,), np.float32)
    kern[:, INIT:INIT + INC] = S.lin_k(net.classifier_pool[1].weight)
    bias[INIT:INIT + INC] = S.t2n(net.classifier_pool[1].bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(kern),
                             "bias": jnp.asarray(bias)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
    }
    active = (np.arange(T) < 2).astype(np.float32)
    onehot = (np.arange(T) == 1).astype(np.float32)
    state1 = install(state, params, {},
                     {"frozen": frozen, "active": jnp.asarray(active),
                      "train_onehot": jnp.asarray(onehot)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(1502)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "InfLoRA task1 current-head CE", tol=1e-3)


# ------------------------------------------------------- MoE-Adapter4CL


def test_moe_adapter4cl_loss_task1():
    """reference moe_adapter4cl.py:61-84 observe on the MoE CLIP
    (ResidualAttentionBlock_MoE_MLP both towers, transformer.py:1461-1658):
    contrastive logits vs the CURRENT task's text tokens, CE with label
    smoothing on offset labels — vs my masked-CE over all-class tokens.
    Both sides deterministic (reference in eval(): no gate noise / expert
    dropout; my side rng=None) with the reference's SOT text gate."""
    ref_clip = _refload.ref_module("core.model.backbone.clip")
    ref_tf = _refload.ref_module("core.model.backbone.transformer")
    ref_moe = _refload.ref_module("core.model.moe_adapter4cl")

    depth, d, heads, out_dim, ctx, vocab = 2, 64, 4, 32, 16, 100
    E = 2
    torch.manual_seed(21)
    # Repair a reference crash: ResidualAttentionBlock_MoE_MLP.__init__
    # forwards 13 positionals (transformer.py:1485-1498) into a base
    # signature that has ``norm_layer_eps`` before ``attn_mask``
    # (transformer.py:1289-1291), so the text_or_image STRING lands in
    # attn_mask and every forward dies on `'str'.to` — the shipped MoE-CLIP
    # config cannot execute upstream. Re-insert the skipped eps slot.
    base_init = ref_tf.ResidualAttentionBlock.__init__

    def shifted_init(self, *a, **kw):
        if len(a) == 13:
            a = a[:11] + (1e-5,) + a[11:]
        return base_init(self, *a, **kw)

    ref_tf.ResidualAttentionBlock.__init__ = shifted_init
    try:
        net = ref_clip.CLIP(
            embed_dim=out_dim, image_resolution=32, vision_layers=depth,
            vision_width=d, vision_patch_size=8, context_length=ctx,
            vocab_size=vocab, transformer_width=d, transformer_heads=heads,
            transformer_layers=depth, act_layer=ref_tf.QuickGELU,
            block_layer="ResidualAttentionBlock_MoE_MLP",
            experts_num=E, top_k=E, step=1)
    finally:
        ref_tf.ResidualAttentionBlock.__init__ = base_init
    g = torch.Generator().manual_seed(2101)
    with torch.no_grad():
        for p in net.parameters():
            if p.ndim:
                p.uniform_(-0.08, 0.08, generator=g)
    net.visual.ln_pre.eps = 1e-5  # my ln_pre_n
    net.eval()

    tm = ref_moe.MOE_ADAPTER4CL(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        label_smoothing=0.1, embd_dim=d,
        prompt_template="a bad photo of a {}.")
    tm._cur_task_id = 1
    tm._known_classes = INIT
    rng = np.random.RandomState(2102)
    cur_toks = rng.randint(1, vocab - 1, size=(INC, ctx))
    cur_toks[:, 0] = 0
    cur_toks[np.arange(INC), rng.randint(2, ctx, size=INC)] = vocab - 1
    tm.curr_text_tokens = torch.from_numpy(cur_toks)

    m, state = my_method(
        "MOE_ADAPTER4CL",
        {"label_smoothing": 0.1, "prompt_template": "a bad photo of a {}."},
        backbone="clip_tiny_test", feat=out_dim,
        backbone_kwargs={"moe_experts": E, "moe_top_k": E,
                         "moe_text_gate": "sot"})

    params = {
        "visual_projection": S.t2n(net.visual.proj),
        "logit_scale": S.t2n(net.logit_scale),
        "visual": {
            "patch_embed": {"kernel": S.conv_k(net.visual.conv1.weight),
                            "bias": np.zeros((d,), np.float32)},
            "cls_token": S.t2n(net.visual.class_embedding)[None, None, :],
            "pos_embed": S.t2n(net.visual.positional_embedding)[None],
            "ln_pre_n": S.ln_vars(net.visual.ln_pre),
            "norm": S.ln_vars(net.visual.ln_post),
        },
        "text": {
            "token_embedding": np.zeros((49408, d), np.float32),
            "pos_embed": np.zeros((77, d), np.float32),
            "ln_final": S.ln_vars(net.ln_final),
            "text_projection": S.t2n(net.text_projection),
        },
    }
    params["text"]["token_embedding"][:vocab] = S.t2n(net.token_embedding.weight)
    params["text"]["pos_embed"][:ctx] = S.t2n(net.positional_embedding)
    for tower, blocks in (("visual", net.visual.transformer.blocks),
                          ("text", net.transformer.blocks)):
        for i, blk in enumerate(blocks):
            bp = S.sync_vit_block(blk)
            bp["moe"] = {
                "w_gate": S.t2n(blk.router_list[0]),
                "w_noise": S.t2n(blk.w_noise_list[0]),
                "down": np.stack([S.lin_k(a.down_proj.weight)
                                  for a in blk.adaptmlp_list]),
                "down_b": np.stack([S.t2n(a.down_proj.bias)
                                    for a in blk.adaptmlp_list]),
                "up": np.stack([S.lin_k(a.up_proj.weight)
                                for a in blk.adaptmlp_list]),
                "up_b": np.stack([S.t2n(a.up_proj.bias)
                                  for a in blk.adaptmlp_list]),
            }
            params[tower][f"block_{i}"] = bp

    def split(tree, path=()):
        train_t, frozen_t = {}, {}
        for k, v in tree.items():
            if isinstance(v, dict):
                t, f = split(v, path + (k,))
                if t:
                    train_t[k] = t
                if f:
                    frozen_t[k] = f
            elif "moe" in path or "logit_scale" in k:
                train_t[k] = jnp.asarray(v)
            else:
                frozen_t[k] = jnp.asarray(v)
        return train_t, frozen_t

    trainable, frozen = split(params)
    all_toks = np.zeros((NUM_CLASS, ctx), np.int64)
    all_toks[INIT:INIT + INC] = cur_toks
    state1 = install(state, {"clip": trainable}, {},
                     {"frozen": frozen,
                      "task_tokens": jnp.asarray(all_toks.astype(np.int32))})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = rng.randn(4, 3, 32, 32).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "MoE-Adapter4CL contrastive CE+smooth",
                      tol=1e-3)


# ---------------------------------------------------------------- RanPAC


def test_ranpac_ridge_sweep_and_solve():
    """reference ranpac.py:231-268 (update_rp_classifier): ReLU random
    projection, Q/G accumulation, 80/20 ridge sweep, closed-form solve.
    Executes the reference function verbatim on stubbed features and
    compares the chosen lambda and the solved classifier weights."""
    ref_rp = _refload.ref_module("core.model.ranpac")
    D, M, n = 64, 50, 40
    rng = np.random.RandomState(41)
    feats = rng.randn(n, D).astype(np.float32)
    labels = rng.randint(0, INIT + INC, size=(n,)).astype(np.int64)
    W = rng.randn(D, M).astype(np.float32)

    # ---- reference: run update_rp_classifier unbound on a stub object
    class _Clf:
        use_RP = False
        W_rand = None
        weight = torch.zeros(INIT + INC, M)

    class _Net:
        classifier = _Clf()

        def eval(self):
            pass

        def get_feature(self, x):
            return x

    class _DS:
        trfms = None

    class _Loader:
        dataset = _DS()

        def __iter__(self):
            yield {"image": torch.from_numpy(feats),
                   "label": torch.from_numpy(labels)}

    stub = type("Stub", (), {})()
    stub._network = _Net()
    stub.W_rand = torch.from_numpy(W)
    stub.device = DEV
    stub.M = M
    stub._classes_seen_so_far = INIT + INC
    stub.Q = torch.zeros(M, INIT + INC)
    stub.G = torch.zeros(M, M)
    ref_rp.RanPAC.update_rp_classifier(stub, _Loader(), None)
    ref_W = stub._network.classifier.weight.data.numpy()  # (C_seen, M)

    # ---- mine: reorder samples so my every-5th-position holdout equals the
    # reference's last-20% split (Q/G sums are order-invariant per group)
    n_fit = int(n * 0.8)
    fit_idx, ho_idx = list(range(n_fit)), list(range(n_fit, n))
    order = []
    fi, hi = iter(fit_idx), iter(ho_idx)
    for p in range(n):
        order.append(next(hi) if p % 5 == 0 else next(fi))
    order = np.asarray(order)

    m, state = my_method("RanPAC", {"M": M})
    mvars = dict(state.mvars)
    mvars["W_rand"] = jnp.asarray(W)
    state = state.replace(mvars=mvars)
    state = m.start_task(state, 1, INIT, INIT + INC)
    # stub the backbone: images carry the features in their first D flats
    imgs = np.zeros((n, 32, 32, 3), np.float32)
    imgs.reshape(n, -1)[:, :D] = feats[order]
    m.augment = lambda rng_, images, train=True: images
    m.apply_backbone = lambda p, ms, x, train: (
        {"features": x.reshape(x.shape[0], -1)[:, :D]}, ms)

    class _TaskData:
        def __len__(self):
            return n

    _TaskData.images = imgs
    _TaskData.labels = labels[order]

    state = m.after_task(state, 1, _TaskData())
    my_W = np.asarray(state.mvars["Wo"]).T  # (num_class, M)
    np.testing.assert_allclose(
        my_W[: INIT + INC], ref_W, rtol=2e-3, atol=2e-4,
        err_msg="RanPAC solved classifier weights diverge")


# ---------------------------------------------------------------- GPM


# flat-order helpers shared with the GPM lockstep (tests/_refsync.py)
_alex_perms = S.alex_perms
_sync_alexnet = S.sync_alexnet


def test_gpm_loss_and_projected_grads():
    """reference gpm.py:65-83: task-head CE, then per-layer gradient
    projection ``g -= (g @ feature_mat)`` — compares both the loss scalar
    and all five projected weight gradients."""
    ref_alex = _refload.ref_module("core.model.backbone.alexnet")
    ref_gpm = _refload.ref_module("core.model.gpm")
    torch.manual_seed(21)
    tm = ref_gpm.GPM(ref_alex.AlexNet_TRGP(), DEV,
                     **{k: v for k, v in REF_KW.items() if k != "device"})
    tm.cur_task = 1
    tm._known_classes = INIT
    tm.network.eval()  # dropout off; BN (track_running_stats=False) still
    # uses batch statistics, matching our _BatchStatsNorm

    m, state = my_method("GPM", {}, backbone="AlexNet_TRGP", feat=2048)
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    params["backbone"] = jax.tree_util.tree_map(
        jnp.asarray, _sync_alexnet(tm.network.backbone))
    hk = np.zeros((2048, NUM_CLASS), np.float32)
    for t_, fc in enumerate(tm.network.classifiers):
        hk[:, t_ * INC:(t_ + 1) * INC] = S.lin_k(fc.weight)
    params["head"] = {"Dense_0": {"kernel": jnp.asarray(hk)}}

    # random projection subspaces, mirrored across the two flat orders
    perms = _alex_perms()
    rng = np.random.RandomState(31)
    in_flats = [3 * 16, 64 * 9, 128 * 4, 1024, 2048]
    proj_mine, proj_torch = [], []
    for d, perm in zip(in_flats, perms):
        u, _ = np.linalg.qr(rng.randn(d, 8))
        P = (u @ u.T).astype(np.float32)
        proj_mine.append(jnp.asarray(P))
        proj_torch.append(torch.from_numpy(
            P[perm][:, perm].copy()))
    tm.feature_mat = proj_torch
    mvars = dict(state.mvars)
    mvars["proj"] = proj_mine
    mvars["bn_trainable"] = jnp.asarray(0.0)
    state1 = state.replace(params=params, mvars=mvars)
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(14, INIT, INIT + INC)
    _, _, t_loss = tm.observe(tb)  # backward + in-place projection
    # rng=None keeps our dropout off, matching the reference's eval() mode
    assert_loss_close(
        t_loss, m.loss(state1.params, state1, jb, None)[0], "GPM task1 CE")

    def lfn(p):
        return m.loss(p, state1, jb, None)[0]

    grads = m.transform_grads(jax.grad(lfn)(state1.params), state1)
    t_layers = [tm.network.backbone.conv1, tm.network.backbone.conv2,
                tm.network.backbone.conv3, tm.network.backbone.fc1,
                tm.network.backbone.fc2]
    names = ["conv0_kernel", "conv1_kernel", "conv2_kernel",
             "fc3_kernel", "fc4_kernel"]
    for li, (mod, nm, perm) in enumerate(zip(t_layers, names, perms)):
        tg = mod.weight.grad.detach().numpy()
        out_dim = tg.shape[0]
        tg_flat = tg.reshape(out_dim, -1).T  # (in_flat_torch, out)
        mine = np.asarray(grads["backbone"][nm]).reshape(-1, out_dim)
        tg_mine_order = np.empty_like(tg_flat)
        tg_mine_order[perm] = tg_flat
        np.testing.assert_allclose(
            mine, tg_mine_order, rtol=2e-3, atol=2e-5,
            err_msg=f"projected grad mismatch at layer {li} ({nm})")


# ------------------------------------------------------- DualPrompt / CODA


def _deleaf_prompt_loss(monkeypatch):
    """Reference transformer.py:2278-2279 does ``prompt_loss += loss`` on
    ``torch.zeros(requires_grad=True).to(device)`` — on CUDA ``.to`` returns
    a non-leaf so the in-place add is legal; on CPU it is identity and
    raises. Clone the zeros so the CPU run matches CUDA autograd shape."""
    orig_to = torch.Tensor.to

    def to_clone(self, *a, **k):
        out = orig_to(self, *a, **k)
        if out is self and self.requires_grad and self.is_leaf:
            return self.clone()
        return out

    monkeypatch.setattr(torch.Tensor, "to", to_clone)


def _prompt_harness(method_name, my_kwargs):
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    torch.manual_seed(11)  # fixed ViT init: see test_l2p_loss_task1
    zoo = ref_vit.ViTZoo(pretrained=False)
    m, state = my_method(method_name, my_kwargs, backbone="ViTZoo", feat=768)
    return zoo, m, state


def _vit_frozen(zoo):
    return jax.tree_util.tree_map(jnp.asarray, S.sync_vit(zoo.feat, 12))


def test_dualprompt_loss_task1(monkeypatch):
    _deleaf_prompt_loss(monkeypatch)
    """reference dualprompt.py:93-107 + prompt.py:231-345: g-prompts on
    layers 0-1, task-indexed e-prompts on 2-4 (prefix K/V halves), summed
    key-match loss + current-task CE."""
    ref_dp = _refload.ref_module("core.model.dualprompt")
    zoo, m, state = _prompt_harness(
        "DualPrompt",
        {"e_prompt_length": 20, "g_prompt_length": 6, "pool_size": 10})
    kw = dict(num_class=NUM_CLASS, e_prompt_length=20, g_prompt_length=6,
              **{k: v for k, v in REF_KW.items() if k != "device"})
    tm = ref_dp.DualPrompt(zoo, 768, kw.pop("num_class"), device=DEV, **kw)
    tm.before_task(0, None, None, None)
    tm.after_task(0, None, None, None)   # last_out_dim = init_cls
    tm.before_task(1, None, None, None)  # head widens to 8, task_id = 1
    g = torch.Generator().manual_seed(1101)
    pr = tm.network.backbone.prompt
    with torch.no_grad():
        for name in ["g_p_0", "g_p_1", "e_p_2", "e_p_3", "e_p_4",
                     "e_k_2", "e_k_3", "e_k_4"]:
            getattr(pr, name).uniform_(0, 1, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()

    prompt_params = {n: S.t2n(getattr(pr, n)) for n in
                     ["g_p_0", "g_p_1", "e_p_2", "e_p_3", "e_p_4",
                      "e_k_2", "e_k_3", "e_k_4"]}
    k = np.zeros((768, NUM_CLASS), np.float32)
    b = np.zeros((NUM_CLASS,), np.float32)
    k[:, : INIT + INC] = S.lin_k(tm.network.classifier.weight)
    params = {"head": {"Dense_0": {"kernel": jnp.asarray(k),
                                   "bias": jnp.asarray(b)}},
              "prompt": prompt_params}
    state1 = install(state, params, {}, {"frozen": _vit_frozen(zoo)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(1102)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "DualPrompt task1 match+CE", tol=1e-3)


def test_codaprompt_loss_task1(monkeypatch):
    _deleaf_prompt_loss(monkeypatch)
    """reference codaprompt.py:86-100 + prompt.py:158-221: attention-composed
    prompts over the pool prefix, past blocks detached, ortho penalties,
    current-task CE. The reference never calls process_task_count (its
    task_count stays 0 — documented quirk, PARITY.md); set it manually to
    exercise the module's own per-task freeze/slice mechanism at task 1."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    ref_cp = _refload.ref_module("core.model.codaprompt")
    pool, plen, mu = 6, 8, 0.1
    zoo, m, state = _prompt_harness(
        "CodaPrompt", {"pool_size": pool, "prompt_length": plen, "mu": mu})
    kw = dict(num_class=NUM_CLASS, pool_size=pool, prompt_length=plen, mu=mu,
              **{k: v for k, v in REF_KW.items() if k != "device"})
    tm = ref_cp.CodaPrompt(zoo, 768, kw.pop("num_class"), device=DEV, **kw)
    tm.before_task(0, None, None, None)
    tm.after_task(0, None, None, None)
    tm.before_task(1, None, None, None)
    pr = tm.network.backbone.prompt
    pr.task_count = 1  # the paper protocol the module implements
    g = torch.Generator().manual_seed(1201)
    with torch.no_grad():
        for e in range(5):
            for nm in (f"e_p_{e}", f"e_k_{e}", f"e_a_{e}"):
                getattr(pr, nm).uniform_(-0.5, 0.5, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()

    prompt_params = {}
    for e in range(5):
        for nm in (f"e_p_{e}", f"e_k_{e}", f"e_a_{e}"):
            prompt_params[nm] = S.t2n(getattr(pr, nm))
    k = np.zeros((768, NUM_CLASS), np.float32)
    b = np.zeros((NUM_CLASS,), np.float32)
    k[:, : INIT + INC] = S.lin_k(tm.network.classifier.weight)
    params = {"head": {"Dense_0": {"kernel": jnp.asarray(k),
                                   "bias": jnp.asarray(b)}},
              "prompt": prompt_params}
    state1 = install(state, params, {}, {"frozen": _vit_frozen(zoo)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(1202)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "CODA task1 ortho+CE", tol=1e-3)


# ---------------------------------------------------------------- DER


def test_der_loss_task1(ref_resnet):
    """reference der.py:108-134: CE over the concatenated-extractor logits
    + aux CE on the newest extractor (targets y-known+1, old->0); old
    extractors frozen in eval mode."""
    ref_der = _refload.ref_module("core.model.der")
    tm = ref_der.DER(ref_resnet.resnet18(
        args={"dataset": "cifar100", "init_cls_num": INIT, "inc_cls_num": INC}
    ), 512, NUM_CLASS, **REF_KW)
    tm.before_task(0, None, None, None)   # convnet 0 + 4-wide fc
    tm.before_task(1, None, None, None)   # convnet 1 (copy), 8-wide fc, aux
    randomize_torch(tm.convnets[0], 901)
    randomize_torch(tm.convnets[1], 902)
    g = torch.Generator().manual_seed(903)
    with torch.no_grad():
        tm.fc.weight.normal_(0, 0.05, generator=g)
        tm.fc.bias.normal_(0, 0.05, generator=g)
        tm.aux_fc.weight.normal_(0, 0.05, generator=g)
        tm.aux_fc.bias.normal_(0, 0.05, generator=g)
    tm.freeze_convnets()
    tm.convnets.train()  # trainer model.train() undoes freeze_convnets

    m, state = my_method("DER", backbone="resnet18", feat=512)
    m._active_count = 2
    D = 512
    # stack the two torch extractors into the (task_num, ...) param slabs
    nets = [S.sync_resnet(*_bt(tm.convnets[i])) for i in range(2)]

    def stack(*trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    pads = [nets[0]] * (TASKS - 2)
    bb = stack(*(n["params"] for n in (nets + pads)))
    bs = stack(*(n["batch_stats"] for n in (nets + pads)))
    hk = np.zeros((TASKS * D, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    hk[: 2 * D, : INIT + INC] = S.lin_k(tm.fc.weight)
    hb[: INIT + INC] = S.t2n(tm.fc.bias)
    aux = {"Dense_0": {"kernel": S.lin_k(tm.aux_fc.weight),
                       "bias": S.t2n(tm.aux_fc.bias)}}
    params = {"backbone": bb,
              "head": {"Dense_0": {"kernel": jnp.asarray(hk),
                                   "bias": jnp.asarray(hb)}},
              "aux": aux}
    # DER's model_state is {"batch_stats": stacked} (leading task axis)
    state1 = install(state, params, {"batch_stats": bs})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(13, 0, INIT + INC)  # DER replays old classes
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "DER task1 CE+auxCE")


def _bt(model):
    return S.blocks_torchvision(model)


# ---------------------------------------------------------------- iCaRL


def test_icarl_loss_task1(ref_resnet):
    """reference icarl.py:197-221: CE over seen classes + T=2 KD of the
    old-class logits vs the frozen previous network."""
    ref_icarl = _refload.ref_module("core.model.icarl")
    tm = ref_icarl.ICarl(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS, **REF_KW)
    m, state = my_method("ICarl")

    randomize_torch(tm.network, 801)
    tm.old_network = copy.deepcopy(tm.network)
    g = torch.Generator().manual_seed(802)
    with torch.no_grad():
        for p in tm.network.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    tm.old_network.train()  # trainer model.train() undoes the eval()
    tm.cur_task_id = 1
    tm.prev_cls_num = INIT
    tm.accu_cls_num = INIT + INC

    params, mstate = full_pytree(tm.network.backbone, tm.network.classifier)
    t_params, t_mstate = full_pytree(tm.old_network.backbone,
                                     tm.old_network.classifier)
    state1 = install(state, params, mstate,
                     {"teacher": t_params, "teacher_state": t_mstate})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(12, 0, INIT + INC)  # iCaRL replays old classes
    tm.network.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "iCaRL task1 CE+KD")


# ---------------------------------------------------------------- WA


def test_wa_loss_task1(ref_resnet):
    """reference wa.py:153-185: (1-lam)*CE + lam*KD, lam = known/total."""
    ref_wa = _refload.ref_module("core.model.wa")
    tm = ref_wa.WA(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS, **REF_KW)
    m, state = my_method("WA")

    # reference flow: 4-wide head trained on task 0, snapshot frozen teacher
    # (after_task wa.py:232), then before_task widens to 8
    tm.network.update_classifier(INIT)
    randomize_torch(tm.network, 301)
    tm.old_network = copy.deepcopy(tm.network).freeze()
    tm.old_network.train()  # trainer model.train() undoes freeze()'s eval
    tm.task_idx = 1
    tm.known_classes, tm.total_classes = INIT, INIT + INC
    tm.network.update_classifier(INIT + INC)
    g = torch.Generator().manual_seed(302)
    with torch.no_grad():  # non-trivial new-class rows + student drift
        tm.network.classifier.weight[INIT:].normal_(0, 0.1, generator=g)
        tm.network.classifier.bias[INIT:].normal_(0, 0.1, generator=g)
        for p in tm.network.backbone.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)

    params, mstate = full_pytree(tm.network.backbone, tm.network.classifier)
    t_params, t_mstate = full_pytree(tm.old_network.backbone,
                                     tm.old_network.classifier)
    state1 = install(state, params, mstate,
                     {"teacher": t_params, "teacher_state": t_mstate})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)
    tb, jb = batch_of(8, 0, INIT + INC)  # WA replays old classes too
    tm.network.backbone.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, jax.random.PRNGKey(1))
    assert_loss_close(t_loss, j_loss, "WA task1 (1-lam)CE+lam*KD")


# ---------------------------------------------------------------- RAPF


def _rapf_pair(beta=0.5):
    """Tiny plain-block reference CLIP + RAPF method object, my RAPF with
    synced frozen towers and adapter. The shipped reference RAPF config's
    MoE block cannot execute upstream (PARITY.md), so both sides run the
    plain tower the adapter trains against (rapf.py:60-118)."""
    ref_tf = _refload.ref_module("core.model.backbone.transformer")
    ref_clip = _refload.ref_module("core.model.backbone.clip")
    ref_rapf = _refload.ref_module("core.model.rapf")

    depth, d, heads, out_dim, ctx, vocab = 2, 64, 4, 32, 16, 100
    net = ref_clip.CLIP(
        embed_dim=out_dim, image_resolution=32, vision_layers=depth,
        vision_width=d, vision_patch_size=8, context_length=ctx,
        vocab_size=vocab, transformer_width=d, transformer_heads=heads,
        transformer_layers=depth, act_layer=ref_tf.QuickGELU)
    g = torch.Generator().manual_seed(511)
    with torch.no_grad():
        for p in net.parameters():
            if p.ndim:
                p.uniform_(-0.08, 0.08, generator=g)
    net.visual.ln_pre.eps = 1e-5
    net.eval()

    tm = ref_rapf.RAPF(
        net, seed=3, device=DEV, fp16=False, mix_bias=0.6,
        prompt_template="a good photo of a {}", init_cls_num=INIT,
        inc_cls_num=INC, task_num=TASKS, beta=beta, shrinkage=False,
        threshold=0.55, train_batch_size=8, batch_size=8, num_workers=0)
    # the reference hardcodes Linear(512, 512) (rapf.py:84); re-size to the
    # tiny tower's embed dim
    tm.model.adapter = torch.nn.Linear(out_dim, out_dim, bias=False)
    with torch.no_grad():
        tm.model.adapter.weight.uniform_(-0.3, 0.3, generator=g)

    m, state = my_method(
        "RAPF", {"beta": beta, "threshold": 0.55, "mix_bias": 0.6},
        backbone="clip_tiny_test", feat=out_dim)

    params = {
        "visual_projection": S.t2n(net.visual.proj),
        "logit_scale": S.t2n(net.logit_scale),
        "visual": {
            "patch_embed": {"kernel": S.conv_k(net.visual.conv1.weight),
                            "bias": np.zeros((d,), np.float32)},
            "cls_token": S.t2n(net.visual.class_embedding)[None, None, :],
            "pos_embed": S.t2n(net.visual.positional_embedding)[None],
            "ln_pre_n": S.ln_vars(net.visual.ln_pre),
            "norm": S.ln_vars(net.visual.ln_post),
        },
        "text": {
            "token_embedding": np.zeros((49408, d), np.float32),
            "pos_embed": np.zeros((77, d), np.float32),
            "ln_final": S.ln_vars(net.ln_final),
            "text_projection": S.t2n(net.text_projection),
        },
    }
    params["text"]["token_embedding"][:vocab] = S.t2n(net.token_embedding.weight)
    params["text"]["pos_embed"][:ctx] = S.t2n(net.positional_embedding)
    for tower, blocks in (("visual", net.visual.transformer.blocks),
                          ("text", net.transformer.blocks)):
        for i, blk in enumerate(blocks):
            params[tower][f"block_{i}"] = S.sync_vit_block(blk)
    frozen = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.RandomState(512)
    all_toks = rng.randint(1, vocab - 1, size=(NUM_CLASS, ctx))
    all_toks[:, 0] = 0
    all_toks[np.arange(NUM_CLASS), rng.randint(2, ctx, size=NUM_CLASS)] = vocab - 1

    # my text features, as my before_task computes them (normalized fp32)
    out = m.backbone.apply(
        {"params": frozen},
        method=lambda mod, t: mod.encode_text(t, train=False),
        t=jnp.asarray(all_toks.astype(np.int32)))
    tf = out[0]
    tf = tf / (jnp.linalg.norm(tf, axis=-1, keepdims=True) + 1e-8)

    adapter = {"kernel": jnp.asarray(S.lin_k(tm.model.adapter.weight))}
    state = install(state, {"adapter": adapter}, {},
                    {"frozen": frozen, "text_feats": tf})
    return ref_rapf, net, tm, m, state, all_toks, rng


def test_rapf_loss_task0():
    """reference rapf.py:292-353 observe at task 0: pure CE of adapted
    image features against the current class-name text features, through
    the fp16 input round-trip (rapf.py:127)."""
    _, net, tm, m, state, all_toks, rng = _rapf_pair()
    tm.task_id = 0
    tm.model.text_tokens = torch.from_numpy(all_toks[:INIT])
    tm.model.hard_pairs = None

    x = (rng.randn(4, 3, 32, 32) * 0.5).astype(np.float16).astype(np.float32)
    y = rng.randint(0, INIT, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y),
          "batch_id": 0}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state.params, state, jb, jax.random.PRNGKey(7))
    assert_loss_close(t_loss, j_loss, "RAPF task0 CE", tol=1e-3)


def test_rapf_loss_task1_replay_and_hinge():
    """reference rapf.py:292-353 observe at task 1: one CE over
    [images; Gaussian-replayed old features] (round-robin classes by batch
    id, rapf.py:305-323) + the hard-pair hinge over edge samples
    (rapf.py:324-348). Covariances are driven to ~0 so both sides' samples
    collapse to the class means and the stochastic paths align."""
    _, net, tm, m, state, all_toks, rng = _rapf_pair()
    d = 32
    tm.task_id = 1
    tm.model.text_tokens = torch.from_numpy(all_toks[:INIT + INC])
    with torch.no_grad():
        cnf = tm.model.get_class_name_features()
    tm.model.class_name_features = cnf / cnf.norm(dim=-1, keepdim=True)
    means = (rng.randn(INIT, d) * 0.5).astype(np.float32)
    tm.model.class_mean_list = [torch.from_numpy(means[i]) for i in range(INIT)]
    tm.model.class_cov_list = [1e-30 * torch.eye(d) for _ in range(INIT)]
    tm.model.hard_pairs = torch.tensor([[0, 5], [2, 7]])
    tm.model.old_adapter = copy.deepcopy(tm.model.adapter)
    tm.random_class_order_list = [2, 0, 3, 1]
    batch_id = 3

    state = m.start_task(state, 1, INIT, INIT + INC)
    mvars = dict(state.mvars)
    cls_mean = np.zeros((NUM_CLASS, d), np.float32)
    cls_mean[:INIT] = means
    mvars["cls_mean"] = jnp.asarray(cls_mean)
    mvars["cls_chol"] = jnp.zeros((NUM_CLASS, d, d), jnp.float32)
    mvars["cls_valid"] = jnp.asarray(
        (np.arange(NUM_CLASS) < INIT).astype(np.float32))
    mvars["replay_order"] = jnp.asarray(
        np.resize(np.array([2, 0, 3, 1], np.int32), NUM_CLASS))
    mvars["replay_len"] = jnp.asarray(INIT, jnp.int32)
    hard_old = np.zeros((m.hard_cap,), np.int32)
    hard_new = np.zeros((m.hard_cap,), np.int32)
    hard_valid = np.zeros((m.hard_cap,), np.float32)
    hard_old[:2] = [0, 2]
    hard_new[:2] = [5, 7]
    hard_valid[:2] = 1.0
    mvars.update(hard_old=jnp.asarray(hard_old), hard_new=jnp.asarray(hard_new),
                 hard_valid=jnp.asarray(hard_valid))
    state = state.replace(mvars=mvars, step=jnp.asarray(batch_id, jnp.int32))

    x = (rng.randn(4, 3, 32, 32) * 0.5).astype(np.float16).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y),
          "batch_id": batch_id}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state.params, state, jb, jax.random.PRNGKey(9))
    assert_loss_close(t_loss, j_loss, "RAPF task1 CE+replay+hinge", tol=1e-3)


def test_rapf_mix_matrix_executing_ref():
    """reference mix_matrix (rapf.py:212-226) executed on a detached shell
    vs my numpy fusion rule."""
    ref_rapf = _refload.ref_module("core.model.rapf")
    from libcontinual_tpu.methods.clip_methods import mix_matrix

    class Shell:
        pass

    g = torch.Generator().manual_seed(513)
    sh = Shell()
    sh.adapter = torch.nn.Linear(16, 16, bias=False)
    sh.old_adapter = torch.nn.Linear(16, 16, bias=False)
    with torch.no_grad():
        sh.adapter.weight.uniform_(-0.5, 0.5, generator=g)
        sh.old_adapter.weight.uniform_(-0.5, 0.5, generator=g)
    sh.mix_b = 0.6
    W_old = S.t2n(sh.old_adapter.weight).astype(np.float64)
    W_new = S.t2n(sh.adapter.weight).astype(np.float64)
    ref_rapf.ClassIncrementalCLIP.mix_matrix(sh)
    mine = mix_matrix(W_old, W_new, 0.6)
    ref = S.t2n(sh.adapter.weight)
    assert np.abs(mine - ref).max() < 1e-4, np.abs(mine - ref).max()


# ---------------------------------------------------------------- PRAKA


def _praka_pair(ref_resnet, task1=False):
    """Reference PRAKA (joint rotation head + single head) on
    cifar_resnet20, my PRAKA with synced heads/backbone/teacher. The
    reference hardcodes Linear(512, .) heads (praka.py:33-34); re-size to
    the tiny backbone's feat dim."""
    ref_praka = _refload.ref_module("core.model.praka")
    bb = ref_resnet.cifar_resnet20()
    randomize_torch(bb, seed=61)

    class FeatWrap(torch.nn.Module):
        # PRAKA's shipped backbone (resnet18_cbam) returns a flat feature
        # tensor (resnet_cbam.py:192-203); cifar_resnet20 returns a dict
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x):
            out = self.inner(x)
            return out["features"] if isinstance(out, dict) else out

    tm = ref_praka.PRAKA(
        FeatWrap(bb), FEAT, NUM_CLASS, device=DEV, init_cls_num=INIT,
        inc_cls_num=INC, task_num=TASKS, temp=0.1, protoAug_weight=15.0,
        kd_weight=15.0)
    width = (INIT + INC) if task1 else INIT
    g = torch.Generator().manual_seed(62)
    tm.model.fc = torch.nn.Linear(FEAT, width * 4)
    tm.model.classifier = torch.nn.Linear(FEAT, width)
    with torch.no_grad():
        for lin in (tm.model.fc, tm.model.classifier):
            lin.weight.normal_(0, 0.1, generator=g)
            lin.bias.normal_(0, 0.1, generator=g)
    m, state = my_method(
        "PRAKA", {"temp": 0.1, "protoAug_weight": 15.0, "kd_weight": 15.0})
    bp, bs = backbone_pytree(tm.model.feature.inner)
    params = {
        "backbone": bp,
        "head": head_pytree(tm.model.fc, width=NUM_CLASS * 4),
        "single": head_pytree(tm.model.classifier),
    }
    return ref_praka, tm, m, state, params, {"batch_stats": bs}


def test_praka_loss_task0(ref_resnet):
    """reference praka.py:139-219 first-task loss: temperature CE on the
    joint 4x rotation head + temperature CE on the single head + KL
    (single || rotation-aggregated joint)."""
    _, tm, m, state, params, mstate = _praka_pair(ref_resnet)
    tm.task_idx = 0
    state = install(state, params, mstate,
                    {"teacher": copy.deepcopy(params),
                     "teacher_state": copy.deepcopy(mstate)})
    tb, jb = batch_of(63, 0, INIT, n=4)
    tm.model.train()
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state.params, state, jb, jax.random.PRNGKey(3))
    assert_loss_close(t_loss, j_loss, "PRAKA task0 joint+single+distill")


def test_praka_loss_task1(ref_resnet, monkeypatch):
    """reference praka.py:218-256 incremental loss: + kd_weight * L2 over
    the WHOLE rotated stack vs the old model + protoAug_weight * (CE +
    joint CE + KL) over prototype-feature mixes. Both sides' stochastic
    draws (mix class / lam / row / sign) are pinned to the same values."""
    _, tm, m, state, params, mstate = _praka_pair(ref_resnet, task1=True)
    tm.task_idx = 1
    b = 4
    # old model: drifted copy
    tm.old_model = copy.deepcopy(tm.model)
    g = torch.Generator().manual_seed(64)
    with torch.no_grad():
        for p in tm.old_model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    proto_cls = 2
    proto_vec = (np.random.RandomState(65).randn(FEAT) * 0.5).astype(np.float32)
    tm.prototype = {proto_cls: proto_vec}

    # pin the reference's numpy draws (praka.py:229-240)
    monkeypatch.setattr(np.random, "randint", lambda lo, hi=None: 1)
    monkeypatch.setattr(np.random, "shuffle", lambda lst: None)
    monkeypatch.setattr(np.random, "beta", lambda a, bb: 0.3)
    monkeypatch.setattr(np.random, "random", lambda: 0.7)
    # pin my jax draws to the same values; reference row 1 of the
    # INTERLEAVED stack (img0, rot1) = row b of my BLOCKED stack
    monkeypatch.setattr(jax.random, "beta",
                        lambda k, a, bb, shape: jnp.full(shape, 0.3))
    monkeypatch.setattr(jax.random, "randint",
                        lambda k, shape, lo, hi: jnp.full(shape, b, jnp.int32))
    # reference draw 0.7 >= 0.5 takes the (1+lam)*proto - lam*feat branch
    monkeypatch.setattr(jax.random, "bernoulli",
                        lambda k, p, shape: jnp.ones(shape, bool))

    tp, tbs = backbone_pytree(tm.old_model.feature.inner)
    teacher = {
        "backbone": tp,
        "head": head_pytree(tm.old_model.fc, width=NUM_CLASS * 4),
        "single": head_pytree(tm.old_model.classifier),
    }
    protos = np.zeros((NUM_CLASS, FEAT), np.float32)
    protos[proto_cls] = proto_vec
    pvalid = np.zeros((NUM_CLASS,), np.float32)
    pvalid[proto_cls] = 1.0
    state = install(state, params, mstate,
                    {"teacher": teacher, "teacher_state": {"batch_stats": tbs},
                     "protos": jnp.asarray(protos),
                     "proto_valid": jnp.asarray(pvalid)})
    state = m.start_task(state, 1, INIT, INIT + INC)
    tb, jb = batch_of(66, INIT, INIT + INC, n=b)
    tm.model.train()
    tm.old_model.train()  # trainer.py:575 flips the teacher every epoch
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state.params, state, jb, jax.random.PRNGKey(5))
    assert_loss_close(t_loss, j_loss, "PRAKA task1 +kd+protoAug", tol=5e-4)


# ---------------------------------------------------------------- TRGP


def test_trgp_loss_scale_and_projection_task1():
    """reference trgp.py:129-168 AlexNet observe at task 1: smoothed CE on
    the task head THROUGH the trust-region scale reparameterization
    (alexnet.py:34-56 cumulative W <- W + W U (Q-I) U^T), then the manual
    GPM projection of every layer's weight gradient out of the accumulated
    feature space (trgp.py:158-161). Compares loss, all 5 projected layer
    grads, and the trained scale grads."""
    from libcontinual_tpu.models.alexnet import LAYER_IN_FLAT, CONV_SPECS

    ref_trgp = _refload.ref_module("core.model.trgp")
    ref_alex = _refload.ref_module("core.model.backbone.alexnet")
    torch.manual_seed(71)
    bb = ref_alex.AlexNet_TRGP()
    g = torch.Generator().manual_seed(72)
    with torch.no_grad():
        for p in bb.parameters():
            p.uniform_(-0.1, 0.1, generator=g)
    tm = ref_trgp.TRGP(bb, DEV, init_cls_num=INIT, inc_cls_num=INC,
                       task_num=TASKS, label_smoothing=0.1)
    with torch.no_grad():
        for cl in tm.network.classifiers:
            cl.weight.normal_(0, 0.1, generator=g)
    tm.cur_task = 1
    tm._known_classes = INIT
    tm.network.eval()  # dropout off on both sides (draws can't be aligned)

    rng = np.random.RandomState(73)
    r_space, r_feat = 3, 4

    def perm_conv(U, li):
        """torch input-row order -> mine: conv patches are (c, kh, kw) ->
        (kh, kw, c); fc1's input is torch's NCHW flatten (c=256, 2, 2) ->
        my NHWC flatten (2, 2, c)."""
        if li == 4:
            return U
        if li == 3:
            return U.reshape(256, 2, 2, -1).transpose(1, 2, 0, 3).reshape(
                1024, -1)
        c, k = CONV_SPECS[li]["in_ch"], CONV_SPECS[li]["kernel"]
        return U.reshape(c, k, k, -1).transpose(1, 2, 0, 3).reshape(
            k * k * c, -1)

    spaces, scales, feats = [], [], []
    for li, d in enumerate(LAYER_IN_FLAT):
        q, _ = np.linalg.qr(rng.randn(d, r_space + r_feat))
        spaces.append(np.ascontiguousarray(q[:, :r_space], np.float32))
        feats.append(np.ascontiguousarray(q[:, r_space:], np.float32))
        scales.append((np.eye(r_space) + 0.1 * rng.randn(r_space, r_space))
                      .astype(np.float32))

    # reference: enable one trust-region space per layer + non-trivial Q.
    # Repair an upstream aliasing bug first: enable_scale builds
    # nn.Parameter(self.identity_matrix) (alexnet.py:27,71), which SHARES
    # STORAGE with the identity the forward subtracts — so on the CPU
    # device (cropped_scale - cropped_identity) is identically zero and
    # the scale reparameterization can never act (see PARITY.md). Give
    # each scale its own storage, as the paper semantics require.
    for li, module in enumerate(tm.layers):
        module.enable_scale([torch.from_numpy(spaces[li])])
        module.scale_param[0] = torch.nn.Parameter(
            module.identity_matrix.clone())
        with torch.no_grad():
            module.scale_param[0][:r_space, :r_space] = torch.from_numpy(
                scales[li])
    tm.feature_mat = [torch.from_numpy(f @ f.T) for f in feats]

    m, state = my_method("TRGP", {"label_smoothing": 0.1},
                         backbone="AlexNet_TRGP", feat=2048)
    bp = {}
    for i, conv in enumerate((bb.conv1, bb.conv2, bb.conv3)):
        bp[f"conv{i}_kernel"] = S.conv_k(conv.weight)
    bp["fc3_kernel"] = perm_conv(S.lin_k(bb.fc1.weight), 3)
    bp["fc4_kernel"] = S.lin_k(bb.fc2.weight)
    for i, bn in enumerate((bb.bn1, bb.bn2, bb.bn3, bb.bn4, bb.bn5)):
        bp[f"bn{i}"] = {"scale": S.t2n(bn.weight), "bias": S.t2n(bn.bias)}
    head_k = np.zeros((2048, NUM_CLASS), np.float32)
    head_k[:, :INIT] = S.lin_k(tm.network.classifiers[0].weight)
    head_k[:, INIT:INIT + INC] = S.lin_k(tm.network.classifiers[1].weight)
    params = {
        "backbone": jax.tree_util.tree_map(jnp.asarray, bp),
        "head": {"Dense_0": {"kernel": jnp.asarray(head_k),
                             "bias": jnp.zeros((NUM_CLASS,), jnp.float32)}},
        "tr_scale": state.params["tr_scale"],
    }
    R = m.R_CAP
    for li in range(5):
        Up = perm_conv(spaces[li], li)
        blk = np.zeros((2, LAYER_IN_FLAT[li], R), np.float32)
        blk[0, :, :r_space] = Up
        sc = state.mvars["tr_space"][li].at[1].set(jnp.asarray(blk))
        state.mvars["tr_space"][li] = sc
        Q = np.broadcast_to(np.eye(R, dtype=np.float32), (2, R, R)).copy()
        Q[0, :r_space, :r_space] = scales[li]
        params["tr_scale"][li] = params["tr_scale"][li].at[1].set(
            jnp.asarray(Q))
    proj = [jnp.asarray(perm_conv(f, li) @ perm_conv(f, li).T)
            for li, f in enumerate(feats)]
    state = install(state, params, {},
                    {"proj": proj, "tr_space": state.mvars["tr_space"],
                     "bn_trainable": jnp.asarray(0.0)})
    state = m.start_task(state, 1, INIT, INIT + INC)

    tb, jb = batch_of(74, INIT, INIT + INC)
    _, _, t_loss = tm.observe(tb)  # backward + in-place projection inside

    def lfn(p):
        return m.loss(p, state, jb, None)[0]

    j_loss, j_grads = jax.value_and_grad(lfn)(state.params)
    j_grads = m.transform_grads(j_grads, state)
    assert_loss_close(t_loss, j_loss, "TRGP task1 smoothed CE via scale")

    mods = tm.layers
    names = ["conv0_kernel", "conv1_kernel", "conv2_kernel",
             "fc3_kernel", "fc4_kernel"]
    for li, (name, mod) in enumerate(zip(names, mods)):
        tg = S.t2n(mod.weight.grad)
        jg = np.asarray(j_grads["backbone"][name])
        if li < 3:
            jg = jg.transpose(3, 2, 0, 1)  # (kh,kw,c,out) -> (out,c,kh,kw)
        elif li == 3:  # undo the NHWC-flatten input permutation
            jg = jg.T.reshape(2048, 2, 2, 256).transpose(0, 3, 1, 2).reshape(
                2048, 1024)
        else:
            jg = jg.T
        scale = max(np.abs(tg).max(), 1e-8)
        assert np.abs(tg - jg).max() < 5e-4 * max(1.0, scale), (
            f"{name}: projected grad mismatch {np.abs(tg - jg).max()}")
        # trained scale grads (cropped to the space rank)
        tq = S.t2n(mod.scale_param[0].grad)[:r_space, :r_space]
        jq = np.asarray(j_grads["tr_scale"][li])[1, 0, :r_space, :r_space]
        assert np.abs(tq - jq).max() < 5e-4 * max(1.0, np.abs(tq).max()), (
            f"{name}: scale grad mismatch {np.abs(tq - jq).max()}")


# ---------------------------------------------------------------- DMNSP


def test_dmnsp_vit_loss_task1():
    """reference dmnsp.py:66-84 ViT-variant observe: smoothed CE from the
    current task's classifier over CLS features of the adapter ViT
    (ResidualAttentionBlock_MLP, transformer.py:1338-1400). The shipped
    dmnsp_vit.yaml omits block_layer so the upstream ViT variant has no
    adapters and cannot train; this test builds the adapter block the CLIP
    siblings configure — repairing the same __init__ positional shift the
    MoE block suffers (norm_layer_eps swallows attn_mask, PARITY.md)."""
    ref_tf = _refload.ref_module("core.model.backbone.transformer")
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_dm = _refload.ref_module("core.model.dmnsp")

    torch.manual_seed(81)
    base_init = ref_tf.ResidualAttentionBlock.__init__

    def shifted_init(self, *a, **kw):
        if len(a) == 13:
            a = a[:11] + (1e-5,) + a[11:]
        return base_init(self, *a, **kw)

    ref_tf.ResidualAttentionBlock.__init__ = shifted_init
    try:
        net = ref_vit.ViTZoo(
            pretrained=False, block_layer="ResidualAttentionBlock_MLP",
            act_layer=ref_tf.QuickGELU)
    finally:
        ref_tf.ResidualAttentionBlock.__init__ = base_init
    g = torch.Generator().manual_seed(82)
    with torch.no_grad():
        for blk in net.feat.transformer.blocks:
            for lin in (blk.adaptmlp.down_proj, blk.adaptmlp.up_proj):
                lin.weight.uniform_(-0.05, 0.05, generator=g)
                lin.bias.uniform_(-0.05, 0.05, generator=g)
    net.eval()  # adapter dropout draws can't be aligned (rng=None on my side)

    tm = ref_dm.DMNSP(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        label_smoothing=0.1, lamda_scale=1.0, prompt_template="a {}",
        embd_dim=768)
    tm._cur_task_id = 1
    tm._known_classes = INIT
    # observe's post-backward projection loop needs a populated basis
    # (values irrelevant here — we compare the pre-projection loss)
    tm.visual_U = [torch.eye(768)[:, :1] for _ in range(12)]
    with torch.no_grad():
        tm.classifier_pool[1].weight.normal_(0, 0.1, generator=g)
        tm.classifier_pool[1].bias.normal_(0, 0.1, generator=g)

    m, state = my_method(
        "DMNSP", {"label_smoothing": 0.1, "embd_dim": 768},
        backbone="ViTZoo", feat=768,
        backbone_kwargs={"adapter_dim": 64, "act_layer": "QuickGELU"})
    vp = S.sync_vit(net.feat, 12)
    adapters, frozen = {}, {}
    for blk_name, sub in vp.items():
        if blk_name.startswith("block_"):
            i = int(blk_name.split("_")[1])
            tb = net.feat.transformer.blocks[i]
            adapters[blk_name] = {
                "down": {"kernel": jnp.asarray(S.lin_k(tb.adaptmlp.down_proj.weight)),
                         "bias": jnp.asarray(S.t2n(tb.adaptmlp.down_proj.bias))},
                "up": {"kernel": jnp.asarray(S.lin_k(tb.adaptmlp.up_proj.weight)),
                       "bias": jnp.asarray(S.t2n(tb.adaptmlp.up_proj.bias))},
            }
        frozen[blk_name] = jax.tree_util.tree_map(jnp.asarray, sub)
    kern = np.zeros((768, NUM_CLASS), np.float32)
    bias = np.zeros((NUM_CLASS,), np.float32)
    kern[:, INIT:INIT + INC] = S.lin_k(tm.classifier_pool[1].weight)
    bias[INIT:INIT + INC] = S.t2n(tm.classifier_pool[1].bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(kern),
                             "bias": jnp.asarray(bias)}},
        "adapters": adapters,
    }
    state1 = install(state, params, {}, {"frozen": frozen})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(83)
    x = rng.randn(3, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb_ = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb_)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "DMNSP ViT task1 smoothed CE", tol=1e-3)


# ---------------------------------------------------------------- SD-LoRA


def test_sdlora_loss_task1():
    """reference sd_lora.py:82-95 observe at task 1 through
    MultiHeadAttention_SDLoRA (transformer.py:276-357): the CURRENT task's
    LoRA at raw scale mag[-1], every PAST task as a normalized direction
    (B A)/(|B||A|) scaled by (mag_i + assimilated_i), CE on the
    current-task slice of the grown classifier."""
    ref_tf = _refload.ref_module("core.model.backbone.transformer")
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_sd = _refload.ref_module("core.model.sd_lora")

    R = 4
    torch.manual_seed(91)
    net = ref_vit.ViTZoo(pretrained=False,
                         attn_layer="MultiHeadAttention_SDLoRA", lora_rank=R)
    tm = ref_sd.SD_LoRA(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        init_mag=1.0, rank_reduction=[False, 0, 0, 0, 0],
        knowledge_dist=[False, 0.0], embd_dim=768)
    tm.before_task(0, None, None, None)
    tm.after_task(0, None, None, None)
    tm.before_task(1, None, None, None)

    g = torch.Generator().manual_seed(92)
    with torch.no_grad():
        for mod in tm.attention_modules:
            for t in range(2):
                for lin in (mod.lora_A_q_list[t], mod.lora_B_q_list[t],
                            mod.lora_A_v_list[t], mod.lora_B_v_list[t]):
                    lin.weight.uniform_(-0.05, 0.05, generator=g)
            mod.assimilated_mag_lora_q[0] += 0.3
            mod.assimilated_mag_lora_v[0] -= 0.2
        # one shared magnitude list across modules (sd_lora.py:121-124)
        tm.attention_modules[0].mag_lora[0].fill_(1.2)
        tm.attention_modules[0].mag_lora[1].fill_(0.8)
        tm._network.classifier.weight.normal_(0, 0.1, generator=g)
        tm._network.classifier.bias.normal_(0, 0.1, generator=g)
    net.eval()

    m, state = my_method("SD_LoRA", {"init_mag": 1.0, "rank": R,
                                     "embd_dim": 768},
                         backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    L, T, d = 12, TASKS, 768
    lora = {k: np.zeros(np.asarray(v).shape, np.float32)
            for k, v in state.params["lora"].items()}
    assim_q = np.zeros((L, T), np.float32)
    assim_v = np.zeros((L, T), np.float32)
    mag = np.zeros((L, T), np.float32)
    for li, mod in enumerate(tm.attention_modules):
        for t in range(2):
            lora["A_q"][li, t] = S.t2n(mod.lora_A_q_list[t].weight)
            lora["B_q"][li, t] = S.t2n(mod.lora_B_q_list[t].weight)
            lora["A_v"][li, t] = S.t2n(mod.lora_A_v_list[t].weight)
            lora["B_v"][li, t] = S.t2n(mod.lora_B_v_list[t].weight)
            mag[li, t] = float(mod.mag_lora[t])
        assim_q[li, 0] = float(mod.assimilated_mag_lora_q[0])
        assim_v[li, 0] = float(mod.assimilated_mag_lora_v[0])
    kern = np.zeros((768, NUM_CLASS), np.float32)
    bias = np.zeros((NUM_CLASS,), np.float32)
    w = tm._network.classifier
    kern[:, :INIT + INC] = S.lin_k(w.weight)
    bias[:INIT + INC] = S.t2n(w.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(kern),
                             "bias": jnp.asarray(bias)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
        "mag": jnp.asarray(mag),
    }
    active = (np.arange(T) < 2).astype(np.float32)
    onehot = (np.arange(T) == 1).astype(np.float32)
    state1 = install(state, params, {},
                     {"frozen": frozen, "active": jnp.asarray(active),
                      "train_onehot": jnp.asarray(onehot),
                      "assim_q": jnp.asarray(assim_q),
                      "assim_v": jnp.asarray(assim_v)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(93)
    x = rng.randn(3, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb_ = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    tm._known_classes = INIT
    _, _, t_loss = tm.observe(tb_)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "SD-LoRA task1 decoupled-dir CE",
                      tol=1e-3)


# ---------------------------------------------------------------- LoRA-Sub


def test_lorasub_loss_task1():
    """reference lora_sub.py:293-311 observe at task 1 through
    MultiHeadAttention_LoRA_Sub (transformer.py:359-430): k/v carry the
    SUM of saved past deltas + the current task's B A; loss is CE on the
    current head + lambada * augmented triplet (hardest pos/neg with
    normalized old prototypes as extra negatives, lora_sub.py:27-68)."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_ls = _refload.ref_module("core.model.lora_sub")

    R, d = 4, 768
    torch.manual_seed(101)
    net = ref_vit.ViTZoo(pretrained=False,
                         attn_layer="MultiHeadAttention_LoRA_Sub", lora_rank=R)
    tm = ref_ls.LoRAsub_DRS(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        fc_lrate=0.002, margin_inter=1.0, lambada=0.05, embd_dim=768)
    tm._network.update_fc()
    tm._network.update_fc()  # _cur_task_id = 1
    tm._cur_task = 1
    tm._known_classes = INIT
    tm._total_classes = INIT + INC

    g = torch.Generator().manual_seed(102)
    rng = np.random.RandomState(103)
    # task-0 factors define the saved past delta; task-1 factors train now
    A0, B0, A1, B1 = {}, {}, {}, {}
    for li, mod in enumerate(tm.attention_modules):
        mod.init_param()  # apply_lora = True
        for slot in ("k", "v"):
            A0[li, slot] = rng.uniform(-0.05, 0.05, (R, d)).astype(np.float32)
            B0[li, slot] = rng.uniform(-0.05, 0.05, (d, R)).astype(np.float32)
            A1[li, slot] = rng.uniform(-0.05, 0.05, (R, d)).astype(np.float32)
            B1[li, slot] = rng.uniform(-0.05, 0.05, (d, R)).astype(np.float32)
        with torch.no_grad():
            mod.prev_k_weight.copy_(
                torch.from_numpy(B0[li, "k"] @ A0[li, "k"]))
            mod.prev_v_weight.copy_(
                torch.from_numpy(B0[li, "v"] @ A0[li, "v"]))
            mod.lora_A_k.weight.copy_(torch.from_numpy(A1[li, "k"]))
            mod.lora_B_k.weight.copy_(torch.from_numpy(B1[li, "k"]))
            mod.lora_A_v.weight.copy_(torch.from_numpy(A1[li, "v"]))
            mod.lora_B_v.weight.copy_(torch.from_numpy(B1[li, "v"]))
    protos = (rng.randn(INIT, d) * 0.5).astype(np.float32)
    tm._protos = [protos[i] for i in range(INIT)]
    with torch.no_grad():
        tm._network.classifier_pool[1].weight.normal_(0, 0.1, generator=g)
        tm._network.classifier_pool[1].bias.normal_(0, 0.1, generator=g)
    net.eval()

    m, state = my_method(
        "LoRAsub_DRS",
        {"margin_inter": 1.0, "lambada": 0.05, "embd_dim": 768, "rank": R,
         "fc_lrate": 0.002},
        backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    lora = {k: np.zeros(np.asarray(v).shape, np.float32)
            for k, v in state.params["lora"].items()}
    for li in range(12):
        for slot in ("k", "v"):
            lora[f"A_{slot}"][li, 0] = A0[li, slot]
            lora[f"B_{slot}"][li, 0] = B0[li, slot]
            lora[f"A_{slot}"][li, 1] = A1[li, slot]
            lora[f"B_{slot}"][li, 1] = B1[li, slot]
    kern = np.zeros((768, NUM_CLASS), np.float32)
    bias = np.zeros((NUM_CLASS,), np.float32)
    kern[:, INIT:INIT + INC] = S.lin_k(tm._network.classifier_pool[1].weight)
    bias[INIT:INIT + INC] = S.t2n(tm._network.classifier_pool[1].bias)
    pvec = np.zeros((NUM_CLASS, 768), np.float32)
    pvec[:INIT] = protos
    pvalid = (np.arange(NUM_CLASS) < INIT).astype(np.float32)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(kern),
                             "bias": jnp.asarray(bias)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
    }
    T = TASKS
    state1 = install(state, params, {},
                     {"frozen": frozen,
                      "active": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
                      "train_onehot": jnp.asarray((np.arange(T) == 1).astype(np.float32)),
                      "protos": jnp.asarray(pvec),
                      "proto_valid": jnp.asarray(pvalid)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = (rng.randn(5, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(5,)).astype(np.int64)
    y[0] = y[1]  # guarantee at least one positive pair
    tb_ = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb_)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "LoRA-Sub task1 CE + lambada*ATL",
                      tol=1e-3)


# ---------------------------------------------------------------- CL-LoRA


def test_cl_lora_loss_task1(monkeypatch):
    """reference cl_lora.py:218-257 observe at task 1: CE on the fresh
    per-task cosine proxy head through the general+specific adapter ViT
    (block weights scaling specific q/v, transformer.py:495-504) + 1e-4 *
    block-weight orthogonality. The KD term is verified separately against
    an intended-semantics torch replication of forward_general_cls (the
    upstream one feeds [B,N,C] to [N,B,C] blocks — PARITY.md). The
    reference hardcodes '_device': 'cuda:0' (transformer.py:2421), so
    Module.to('cuda*') is shimmed to a no-op."""
    ref_tf = _refload.ref_module("core.model.backbone.transformer")
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_cl = _refload.ref_module("core.model.cl_lora")

    orig_to = torch.nn.Module.to

    def safe_to(self, *a, **k):
        if a and isinstance(a[0], (str, torch.device)) and str(a[0]).startswith("cuda"):
            return self
        return orig_to(self, *a, **k)

    monkeypatch.setattr(torch.nn.Module, "to", safe_to)

    R, d = 4, 768
    torch.manual_seed(111)
    net = ref_vit.ViT_CL_LoRA(
        pretrained=False, attn_layer="MultiHeadAttention_CL_LoRA",
        transformer_layer="Transformer_CL_LoRA", lora_rank=R)
    tm = ref_cl.CL_LoRA(net, DEV, init_cls_num=INIT, inc_cls_num=INC,
                        task_num=TASKS)
    tm.before_task(0, None, None, None)
    tm._network.add_fc()
    tm.before_task(1, None, None, None)
    assert tm._known_classes == INIT and tm._total_classes == INIT + INC

    rng = np.random.RandomState(112)
    feat = net.feat
    # randomize all live + teacher adapters (down = lora_B, up = lora_A)
    def rand_pair(mod):
        with torch.no_grad():
            mod.lora_B.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (R, d)).astype(np.float32)))
            mod.lora_A.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (d, R)).astype(np.float32)))

    for lst in (feat.cur_adapter, feat.old_adapter_list[0]):
        for pos in range(12):
            rand_pair(lst[pos][0])
            rand_pair(lst[pos][2])
    with torch.no_grad():
        feat.block_weight.copy_(torch.from_numpy(
            rng.uniform(0.5, 1.5, (3, 6)).astype(np.float32)))
        feat.block_weight_list[0].copy_(torch.from_numpy(
            rng.uniform(0.5, 1.5, (3, 6)).astype(np.float32)))
        tm._network.proxy_fc.weight.copy_(torch.from_numpy(
            rng.uniform(-0.1, 0.1, (INC, d)).astype(np.float32)))
        tm._network.proxy_fc.sigma.fill_(1.3)
    net.eval()

    def build_my(kd_ratio):
        m, state = my_method(
            "CL_LoRA", {"rank": R, "kd_ratio": kd_ratio},
            backbone="ViTZoo", feat=768)
        frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
        lora = {k: np.zeros(np.asarray(v).shape, np.float32)
                for k, v in state.params["lora"].items()}
        gen = {}
        hist = {}
        for slot, si in (("q", 0), ("v", 2)):
            gd = np.zeros((6, R, d), np.float32)
            gu = np.zeros((6, d, R), np.float32)
            hd = np.zeros((6, R, d), np.float32)
            hu = np.zeros((6, d, R), np.float32)
            for l in range(12):
                cur = feat.cur_adapter[l][si]
                if l < 6:
                    gd[l] = S.t2n(cur.lora_B.weight)
                    gu[l] = S.t2n(cur.lora_A.weight)
                    old = feat.old_adapter_list[0][l][si]
                    hd[l] = S.t2n(old.lora_B.weight)
                    hu[l] = S.t2n(old.lora_A.weight)
                else:
                    lora[f"A_{slot}"][l, 1] = S.t2n(cur.lora_B.weight)
                    lora[f"B_{slot}"][l, 1] = S.t2n(cur.lora_A.weight)
            gen[f"gen_down_{slot}"] = jnp.asarray(gd)
            gen[f"gen_up_{slot}"] = jnp.asarray(gu)
            hist[f"hist_gen_down_{slot}"] = state.mvars[
                f"hist_gen_down_{slot}"].at[0].set(jnp.asarray(hd))
            hist[f"hist_gen_up_{slot}"] = state.mvars[
                f"hist_gen_up_{slot}"].at[0].set(jnp.asarray(hu))
        kern = np.zeros((d, NUM_CLASS), np.float32)
        kern[:, INIT:INIT + INC] = S.lin_k(tm._network.proxy_fc.weight)
        params = {
            "head": {"kernel": jnp.asarray(kern),
                     "sigma": jnp.asarray(1.3, jnp.float32)},
            "lora": {k: jnp.asarray(v) for k, v in lora.items()},
            "block_w": jnp.asarray(S.t2n(feat.block_weight)),
            **gen,
        }
        bwh = state.mvars["block_w_hist"].at[0].set(
            jnp.asarray(S.t2n(feat.block_weight_list[0])))
        T = TASKS
        state = install(state, params, {}, {
            "frozen": frozen,
            "active": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
            "train_onehot": jnp.asarray((np.arange(T) == 1).astype(np.float32)),
            "block_w_hist": bwh, "n_hist": jnp.asarray(1.0, jnp.float32),
            **hist,
        })
        return m, m.start_task(state, 1, INIT, INIT + INC)

    x = (rng.randn(3, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb_ = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}

    # reference observe runs its own KD optimizer step; give it one and
    # compare the RETURNED loss = CE + 1e-4 * ortho
    tm.set_optim(torch.optim.Adam(
        [p for p in tm._network.parameters() if p.requires_grad], lr=0.0))
    _, _, t_loss = tm.observe(tb_)
    m0, state0 = build_my(kd_ratio=0.0)
    j_loss0, _ = m0.loss(state0.params, state0, jb, None)
    assert_loss_close(t_loss, j_loss0, "CL-LoRA task1 CE + ortho", tol=1e-3)

    # KD term vs an intended-semantics torch replication of
    # forward_general_cls (proper [N,B,C] block layout)
    with torch.no_grad():
        xb = torch.from_numpy(x)
        B = xb.shape[0]
        h = feat.patch_embed(xb)
        cls_tok = feat.cls_token.expand(B, -1, -1)
        h = torch.cat((cls_tok, h), dim=1) + feat.pos_embed
        h_t = h.clone()
        h = h.permute(1, 0, 2)
        h_t = h_t.permute(1, 0, 2)
        for j in range(6):
            blk = feat.transformer.blocks[j]
            h = blk(h, adapt=feat.cur_adapter[j], prompt=None,
                    rank_prompt=None, block_weight=None)
            h_t = blk(h_t, adapt=feat.old_adapter_list[0][j], prompt=None,
                      rank_prompt=None, block_weight=None)
        f_stu = feat.norm(h.permute(1, 0, 2))[:, 0, :]
        f_tea = feat.norm(h_t.permute(1, 0, 2))[:, 0, :]
        l_stu = tm._network.proxy_fc(f_stu)["logits"]
        l_tea = tm._network.proxy_fc(f_tea)["logits"]
        t_kd = ref_cl._KD_loss(l_stu, l_tea, T=2)
    m5, state5 = build_my(kd_ratio=5.0)
    j_loss5, _ = m5.loss(state5.params, state5, jb, None)
    assert_loss_close(5.0 * t_kd, j_loss5 - j_loss0,
                      "CL-LoRA general-stream KD (intended layout)", tol=2e-3)


# ---------------------------------------------------------------- DAP


def test_dap_loss_task2():
    """reference dap.py:61-117 on the executing vit_dap backbone
    (vit_dap.py:453-520): task prompts concatenated BEFORE pos_embed (the
    pos table has 25 extra prompt slots, vit_dap.py:380-383), head_type
    'prompt' = mean over the prompt positions, CE masked to the current
    task's classes.  The anchoring terms (dap.py:86-103) are dead code in
    the executed reference (trainer.py:594-604 never passes train_gprompt);
    this framework composes them per the paper — here every piece of the
    composite loss is computed by the reference's own code:
    ce_t/ce_g via observe(), pla/sta/center via the reference staticmethods
    cal_latestsimilarity_loss/cal_center/cal_similarity_loss (PARITY.md).
    The prompt slice of pos_embed is zeroed on the torch side so prompt
    values are directly comparable (this framework folds that frozen
    additive offset into the prompt parameter)."""
    ref_vd = _refload.ref_module("core.model.backbone.vit_dap")
    ref_dap = _refload.ref_module("core.model.dap")

    L, K = 5, 5
    P = L * K
    torch.manual_seed(77)
    net = ref_vd.vit_pt_imnet_dap(
        pretrained=False, model_name="vit_base_patch16_224_dap",
        num_classes=NUM_CLASS, drop=0.0, drop_path=0.0, length=L,
        embedding_key="cls", prompt_key_init="uniform", prompt_pool=True,
        prompt_key=True, size=10, top_k=K, batchwise_prompt=True,
        head_type="prompt", use_prompt_mask=False)
    counts = [40, 10, 20]
    tm = ref_dap.DAP(
        net, feat_dim=768, num_class=NUM_CLASS, train_mask=True,
        task_inc=False, pull_constraint=True, pull_constraint_coeff=0.1,
        freeze=["blocks", "patch_embed", "cls_token", "norm", "pos_embed"],
        **REF_KW)
    tm.task_idx = 2
    tm.task_data_count = list(counts)
    with torch.no_grad():
        net.pos_embed[0, 1:1 + P] = 0.0  # see docstring
    net.eval()

    m, state = my_method(
        "DAP", {"length": L, "top_k": K, "feat_dim": 768},
        backbone="ViTZoo", feat=768)
    frozen_t = S.sync_inflora_vit(net, 12)
    pos = frozen_t["pos_embed"]
    frozen_t["pos_embed"] = np.concatenate(
        [pos[:, :1], pos[:, 1 + P:]], axis=1)
    frozen = jax.tree_util.tree_map(jnp.asarray, frozen_t)
    tp = np.stack([S.t2n(net.prompt.taskprompt[t]).reshape(P, 768)
                   for t in range(TASKS)])
    params = {
        "head": {"Dense_0": {"kernel": S.lin_k(net.head.weight),
                             "bias": S.t2n(net.head.bias)}},
        "prompt": {
            "taskprompt": jnp.asarray(tp),
            "generalprompt": jnp.asarray(
                S.t2n(net.prompt.generalprompt).reshape(P, 768)),
        },
    }
    state = install(state, params, {}, {"frozen": frozen})
    state = m.start_task(state, 2, INIT + INC, NUM_CLASS)
    for t, n in enumerate(counts):
        state = m.before_task(state, t, np.zeros(n))

    rng = np.random.RandomState(78)
    x = (rng.randn(3, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT + INC, NUM_CLASS, size=(3,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}

    # (1) the reference's EXECUTED loss: task-prompted current-task CE
    _, _, t_ce_t = tm.observe(tb)
    from libcontinual_tpu.core.method import masked_cross_entropy

    j_logits = m.forward_logits(state.params, state, jb["x"], train=True)
    mask = m.cur_class_mask(state)
    j_masked = jnp.where(mask[None, :] > 0, j_logits, -jnp.inf)
    j_ce_t = masked_cross_entropy(j_masked, jb["label"], None)
    assert_loss_close(t_ce_t, j_ce_t, "DAP executed-path task CE", tol=1e-3)

    # (2) composite intended-semantics loss, every term from reference code
    _, _, t_ce_g = tm.observe(tb, gen=True)
    pla = ref_dap.DAP.cal_latestsimilarity_loss(net, task_id=2)["similarity"]
    # task_data_count=None crashes upstream (weights2 unbound, dap.py:179)
    center = ref_dap.DAP.cal_center(net, task_id=1,
                                    task_data_count=counts[:1],
                                    prompt_center=None)
    center = ref_dap.DAP.cal_center(net, task_id=2,
                                    task_data_count=counts[:2],
                                    prompt_center=center)
    sta = ref_dap.DAP.cal_similarity_loss(net, task_id=2,
                                          prompt_center=center)["avg_similarity"]
    alpha = (counts[-1] - min(counts)) / (max(counts) - min(counts) + 1e-10)
    expected = (float(t_ce_t) + float(t_ce_g)
                + alpha * float(sta) + (1 - alpha) * float(pla))
    assert abs(float(state.mvars["alpha"]) - alpha) < 1e-6
    j_loss, _ = m.loss(state.params, state, jb, jax.random.PRNGKey(2))
    assert_loss_close(expected, j_loss, "DAP composite CE+CE_g+anchors",
                      tol=1e-3)


# ---------------------------------------------------------------- API


def test_api_loss_and_projected_grads_task1():
    """reference api.py:70-105 at task 1 with live input expansion:
    stage-0 observe = CE on the current task head through AlexNet_API
    whose layers were widened input-side (alexnet.py:160-232: extra
    channels are learnable mixes ``x @ w`` of the base input), then
    per-layer DualGPM gradient projection applied ONLY to the
    pre-expansion input columns (``grad[:, :expand]``, api.py:92-99;
    expand == base because self.expand is built in after_task(0), before
    any widening).  'remove' layers subtract the span component; 'retain'
    layers multiply by the precomputed ZERO feature_mat (api.py:293-297).
    Compares the loss scalar and all five projected kernel gradients,
    including the (free) gradients of the new columns and of the mix
    matrices' kernel columns."""
    ref_alex = _refload.ref_module("core.model.backbone.alexnet")
    ref_api = _refload.ref_module("core.model.api")
    torch.manual_seed(23)
    net = ref_alex.AlexNet_API()
    tm = ref_api.API(net, DEV, **{k: v for k, v in REF_KW.items()
                                  if k != "device"})
    BASE = [3, 64, 128, 1024, 2048]
    KS = [4, 3, 2, 1, 1]
    sizes = [2, 3, 1, 4, 5]
    rng = np.random.RandomState(24)
    ws_t = []
    for base, n in zip(BASE, sizes):
        u, _ = np.linalg.qr(rng.randn(base, n))
        ws_t.append(torch.from_numpy(u.astype(np.float32)))
    net.expand(sizes, ws_t)
    tm.layers = [net.conv1, net.conv2, net.conv3, net.fc1, net.fc2]
    tm.cur_task = 1
    tm._known_classes = INIT
    tm.per_layer_retain = [0.0] * 5
    tm.expand = [np.array([c]) for c in BASE]
    ptype = ["remove", "retain", "remove", "retain", "remove"]
    tm.project_type = list(ptype)
    feats_t, proj_base = [], []
    for base, k, pt in zip(BASE, KS, ptype):
        d = base * k * k
        if pt == "remove":
            u, _ = np.linalg.qr(rng.randn(d, min(8, d)))
            P = (u @ u.T).astype(np.float32)
        else:
            P = np.zeros((d, d), np.float32)
        proj_base.append(P)
        feats_t.append(torch.from_numpy(P))
    tm.feature_mat = feats_t
    tm.network.eval()  # dropout off; BN still uses batch stats

    m, state = my_method("API", {}, feat=2048)
    ks_slot = m.backbone.k_slot
    E = m.backbone.extra_in
    full_cs = [b + E for b in BASE]

    def cmap(li, ci):  # torch input-channel/feature -> my slab channel
        return ci if ci < BASE[li] else BASE[li] + (ci - BASE[li])

    def row_map(li, n_extra):
        """torch flat kernel-row index -> my flat index, active rows."""
        k, fc = KS[li], full_cs[li]
        rows_t, rows_m = [], []
        for ci in range(BASE[li] + n_extra):
            for kk in range(k * k):
                rows_t.append(ci * k * k + kk)
                if li < 3:
                    rows_m.append(kk * fc + cmap(li, ci))
                else:
                    if li == 3 and ci < 1024:
                        rows_m.append(int(_alex_perms()[3][ci]))
                    else:
                        rows_m.append(cmap(li, ci))
        return np.asarray(rows_t), np.asarray(rows_m)

    # ---- params sync: kernels (expanded), bn, ws slabs, head
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    bb = jax.tree_util.tree_map(np.array, dict(params["backbone"]))
    convs = [net.conv1, net.conv2, net.conv3]
    for li in range(3):
        w = S.t2n(convs[li].weight)  # (out, base+n, kh, kw)
        kern = bb[f"conv{li}_kernel"]  # (kh, kw, full_c, out)
        for ci in range(w.shape[1]):
            kern[:, :, cmap(li, ci), :] = np.transpose(w[:, ci], (1, 2, 0))
        bb[f"conv{li}_kernel"] = kern
    for li, fc_t in zip((3, 4), (net.fc1, net.fc2)):
        w = S.lin_k(fc_t.weight)  # (base+n, out) torch row order
        kern = bb[f"fc{li}_kernel"]
        rows_t, rows_m = row_map(li, sizes[li])
        kern[rows_m] = w[rows_t]
        bb[f"fc{li}_kernel"] = kern
    for i, bn in enumerate([net.bn1, net.bn2, net.bn3, net.bn4, net.bn5]):
        bb[f"bn{i}"] = {"scale": S.t2n(bn.weight), "bias": S.t2n(bn.bias)}
    perm_fc1 = _alex_perms()[3]
    for li in range(5):
        slab = np.array(bb[f"ws{li}"])
        wnp = S.t2n(ws_t[li]) if li != 3 else None
        if li == 3:
            wsrc = S.t2n(ws_t[3])
            wnp = np.empty_like(wsrc)
            wnp[perm_fc1] = wsrc  # mix rows follow my flat input order
        slab[0, :, : sizes[li]] = wnp
        bb[f"ws{li}"] = slab
    params["backbone"] = jax.tree_util.tree_map(jnp.asarray, bb)
    hk = np.zeros((2048, NUM_CLASS), np.float32)
    for t_, fc_h in enumerate(tm.network.classifiers):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hk[:, lo: lo + fc_h.out_features] = S.lin_k(fc_h.weight)
    params["head"] = {"Dense_0": {"kernel": jnp.asarray(hk)}}

    # ---- mvars: masks + projections in my flat order
    counts = np.zeros((5, m.backbone.slots), np.int64)
    counts[:, 0] = sizes
    m._ws_counts = counts
    mvars = dict(state.mvars)
    mvars["ws_mask"] = m._ws_mask_arrays(counts)
    zero_counts = np.zeros_like(counts)
    mvars["old_rows"] = [jnp.asarray(r, jnp.float32)
                         for r in m._row_masks(zero_counts)]
    proj_mine = []
    for li in range(5):
        D = m.in_flats[li]
        rows_t, rows_m = row_map(li, 0)  # base rows only
        P = np.zeros((D, D), np.float32)
        P[np.ix_(rows_m, rows_m)] = proj_base[li][np.ix_(rows_t, rows_t)]
        proj_mine.append(jnp.asarray(P))
    mvars["proj"] = proj_mine
    mvars["proj_sign"] = jnp.asarray(
        [1.0 if t == "remove" else -1.0 for t in ptype], np.float32)
    state1 = state.replace(params=params, mvars=mvars)
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(25, INIT, INIT + INC)
    _, _, t_loss = tm.observe(tb)  # stage 0: backward + projection
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "API task1 CE (expanded net)")

    grads = m.transform_grads(
        jax.grad(lambda p: m.loss(p, state1, jb, None)[0])(state1.params),
        state1)
    kernel_names = ["conv0_kernel", "conv1_kernel", "conv2_kernel",
                    "fc3_kernel", "fc4_kernel"]
    for li, (mod, name) in enumerate(zip(tm.layers, kernel_names)):
        tg = S.t2n(mod.weight.grad)
        out_dim = tg.shape[0]
        tg_flat = tg.reshape(out_dim, -1).T  # (in_flat_torch, out)
        mine = np.asarray(
            grads["backbone"][name]).reshape(-1, out_dim)
        rows_t, rows_m = row_map(li, sizes[li])
        np.testing.assert_allclose(
            mine[rows_m], tg_flat[rows_t], rtol=2e-3, atol=2e-5,
            err_msg=f"API projected grad mismatch layer {li}")
        # mix-matrix gradients: torch extra_ws[0] vs my ws slab slot 0
        tgw = S.t2n(mod.extra_ws[0].grad)  # (base, n)
        mgw = np.asarray(grads["backbone"][f"ws{li}"])[0][:, : sizes[li]]
        if li == 3:
            tgw_m = np.empty_like(tgw)
            tgw_m[perm_fc1] = tgw
            tgw = tgw_m
        np.testing.assert_allclose(
            mgw, tgw, rtol=2e-3, atol=2e-5,
            err_msg=f"API mix grad mismatch layer {li}")


# ---------------------------------------------------------------- MInfLoRA


def test_minflora_v1_loss_task1(monkeypatch):
    """reference MInfLoRA.py:350-365 observe at task 1 on the executing
    dual-stream backbone (ViTZoo + Transformer_Proj + ResidualAttentionBi
    Block + MultiHeadAttention_MaskedLoRA1): the train forward merges the
    base k/v projections with EVERY expert's B@A (transformer.py:699-707 —
    the range(cur_task) loop plus the explicit last term covers all
    experts, expert_id is unused at train), both Bi streams stay identical
    because the v1 attention returns (x, x, probs) (transformer.py:764),
    and the loss is plain CE on the CURRENT task head with shifted labels
    (SiNet.forward else-branch, MInfLoRA.py:297-299). The no-grad probe
    pass at the top of observe mutates nothing at batch <= 128."""
    import os

    os.environ.setdefault("PYTHONHASHSEED", "0")
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_m = _refload.ref_module("core.model.MInfLoRA")

    R = 4
    torch.manual_seed(31)
    net = ref_vit.ViTZoo(
        pretrained=False, attn_layer="MultiHeadAttention_MaskedLoRA1",
        block_layer="ResidualAttentionBiBlock",
        transformer_layer="Transformer_Proj", lora_rank=R)
    tm = ref_m.MInfLoRA(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        lame=1.0, lamb=0.95, embd_dim=768, use_ca=False, dataset="cifar")
    # drive to task 1 without the probe machinery: two head slots + two
    # experts per attention module (before_task's update_fc/init_param)
    tm._network.update_fc()
    tm._network.update_fc()
    for mod in tm.attention_modules:
        mod.init_param()
        mod.init_param()
    tm._known_classes = INIT
    rng = np.random.RandomState(32)
    with torch.no_grad():
        for mod in tm.attention_modules:
            for t in range(2):
                for lst in (mod.lora_A_k_list, mod.lora_A_v_list):
                    lst[t].weight.copy_(torch.from_numpy(
                        rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
                for lst in (mod.lora_B_k_list, mod.lora_B_v_list):
                    lst[t].weight.copy_(torch.from_numpy(
                        rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
    net.eval()
    tm.probe_selection = torch.from_numpy(
        (rng.randn(2, 3, 224, 224) * 0.5).astype(np.float32))

    m, state = my_method("MInfLoRA", {"rank": R}, backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    lora = {k: np.array(v) for k, v in state.params["lora"].items()}
    for li, mod in enumerate(tm.attention_modules):
        for t in range(2):
            lora["A_k"][li, t] = S.t2n(mod.lora_A_k_list[t].weight)
            lora["A_v"][li, t] = S.t2n(mod.lora_A_v_list[t].weight)
            lora["B_k"][li, t] = S.t2n(mod.lora_B_k_list[t].weight)
            lora["B_v"][li, t] = S.t2n(mod.lora_B_v_list[t].weight)
    hk = np.zeros((768, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    for t_, fc in enumerate(tm._network.classifier_pool):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hk[:, lo: lo + fc.out_features] = S.lin_k(fc.weight)
        hb[lo: lo + fc.out_features] = S.t2n(fc.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(hk), "bias": jnp.asarray(hb)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
    }
    T = TASKS
    state1 = install(state, params, {}, {
        "frozen": frozen,
        "active": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
        "train_onehot": jnp.asarray((np.arange(T) == 1).astype(np.float32)),
    })
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = (rng.randn(3, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "MInfLoRA v1 task1 CE (merged experts)",
                      tol=1e-3)


def test_minflora_v2_loss_and_grads_task1():
    """reference MInfLoRA2.py:153-166 observe at task 1 on the executing
    MultiHeadAttention_MultiMaskedLoRA backbone (transformer.py:795-894):
    stream 1 runs base-qkv + the single REBASED live LoRA pair on k/v;
    stream 2 (what Transformer_Proj returns and the head consumes,
    transformer.py:2036-2043) re-applies the current expert's trust-region
    weight-space scaling ``W += W U (QQ^T - I) U^T`` on top of the LoRA'd
    k/v (the 'better, idk why' QQ^T form, transformer.py:866).  Past-task
    folds live in qkv.weight via merge_weight (transformer.py:228-234) —
    mirrored here by syncing the folded qkv as the frozen base and zero
    merged_delta.  Asserts the loss, every layer's lora_B_k/v gradients,
    and the active 6x6 scale-parameter gradient block."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_m = _refload.ref_module("core.model.MInfLoRA2")

    R, RS = 4, 6
    torch.manual_seed(41)
    net = ref_vit.ViTZoo(
        pretrained=False, attn_layer="MultiHeadAttention_MultiMaskedLoRA",
        block_layer="ResidualAttentionBiBlock",
        transformer_layer="Transformer_Proj", lora_rank=R)
    tm = ref_m.MInfLoRA2(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        lame=1.0, lamb=0.95, embd_dim=768, use_ca=False, dataset="cifar",
        eval_mat=False)
    tm._network.update_fc()
    tm._network.update_fc()
    tm._known_classes = INIT
    rng = np.random.RandomState(42)
    spaces = []
    # CPU storage split: every scale_param Parameter is built as
    # nn.Parameter(self.identity_matrix) (transformer.py:540) — Parameters
    # SHARE that one storage, so a CPU write into scale_param[1][0] would
    # also mutate identity_matrix (the forward's "identity" crop) and every
    # other task's scale. On the reference's CUDA runtime Module.to(device)
    # gives each Parameter its own device copy while identity_matrix stays
    # a CPU eye — clone here to reproduce the executed (CUDA) semantics.
    with torch.no_grad():
        for mod in tm.attention_modules:
            for plist in mod.scale_param:
                for p in plist:
                    p.data = p.data.clone()
            mod.init_param()
            mod.lora_A_k.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
            mod.lora_A_v.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
            mod.lora_B_k.weight.copy_(torch.from_numpy(
                rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
            mod.lora_B_v.weight.copy_(torch.from_numpy(
                rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
            u, _ = np.linalg.qr(rng.randn(768, RS))
            spaces.append(u.astype(np.float32))
            mod.enable_scale(task_id=1, space=[torch.from_numpy(spaces[-1])])
            mod.scale_param[1][0].data[:RS, :RS] = torch.from_numpy(
                (np.eye(RS) + 0.1 * rng.randn(RS, RS)).astype(np.float32))
    net.train()  # routing branch is eval-only; all dropout rates are 0

    m, state = my_method("MInfLoRA2", {"rank": R}, backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    lora = {k: np.array(v) for k, v in state.params["lora"].items()}
    rc = m.scale_rank_cap
    scale = np.array(state.params["scale"])
    tr_space = np.array(state.mvars["tr_space"])
    tr_mask = np.array(state.mvars["tr_mask"])
    for li, mod in enumerate(tm.attention_modules):
        lora["A_k"][li] = S.t2n(mod.lora_A_k.weight)
        lora["A_v"][li] = S.t2n(mod.lora_A_v.weight)
        lora["B_k"][li] = S.t2n(mod.lora_B_k.weight)
        lora["B_v"][li] = S.t2n(mod.lora_B_v.weight)
        tr_space[li, 1, 0, :RS, :] = spaces[li].T
        tr_mask[li, 1, 0] = 1.0
        scale[li, 1, 0][:RS, :RS] = S.t2n(mod.scale_param[1][0])[:RS, :RS]
    hk = np.zeros((768, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    for t_, fc in enumerate(tm._network.classifier_pool):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hk[:, lo: lo + fc.out_features] = S.lin_k(fc.weight)
        hb[lo: lo + fc.out_features] = S.t2n(fc.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(hk), "bias": jnp.asarray(hb)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
        "scale": jnp.asarray(scale),
    }
    T = TASKS
    state1 = install(state, params, {}, {
        "frozen": frozen,
        "tr_space": jnp.asarray(tr_space),
        "tr_mask": jnp.asarray(tr_mask),
        "cur_expert": jnp.asarray(1, jnp.int32),
        "train_onehot": jnp.asarray((np.arange(T) == 1).astype(np.float32)),
    })
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = (rng.randn(3, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "MInfLoRA2 task1 CE (dual-stream TR)",
                      tol=1e-3)

    t_loss.backward()
    grads = m.transform_grads(
        jax.grad(lambda p: m.loss(p, state1, jb, None)[0])(state1.params),
        state1)
    for li, mod in enumerate(tm.attention_modules):
        for slot, tmod in (("B_k", mod.lora_B_k), ("B_v", mod.lora_B_v)):
            np.testing.assert_allclose(
                np.asarray(grads["lora"][slot][li]), S.t2n(tmod.weight.grad),
                rtol=5e-3, atol=5e-5,
                err_msg=f"MInfLoRA2 {slot} grad mismatch layer {li}")
    g_scale = np.asarray(grads["scale"][0, 1, 0])[:RS, :RS]
    t_scale = S.t2n(tm.attention_modules[0].scale_param[1][0].grad)[:RS, :RS]
    np.testing.assert_allclose(g_scale, t_scale, rtol=5e-3, atol=5e-5,
                               err_msg="MInfLoRA2 scale grad mismatch")


def test_minflora_v3_loss_and_grads_task1():
    """reference MInfLoRA3.py:134-145 observe at task 1 on the executing
    MultiHeadAttention_MultiMaskedLoRA3 (transformer.py:1157-1250): the
    running k/v weight accumulates, PER expert ii <= cur_task, the B@A
    delta followed by that expert's diagonal trust-region rewrite
    ``W - W S^T S + W S^T diag(diag(Q)) S`` (the live 'Q Diagonal Scaling'
    — the last of the four scalee assignments wins, :1204-1207).  Streams
    are identical (the v3 attention returns (x, x, probs)).  Asserts the
    loss, the CURRENT task's lora_B_k/v grads (the reference freezes all
    other tasks, MInfLoRA3.py:246-253), and the scale diagonal grads.
    scale_param storages are cloned for the CUDA-split alias (PARITY.md,
    MInfLoRA round-3 findings)."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_m = _refload.ref_module("core.model.MInfLoRA3")

    R, RS = 4, 8
    torch.manual_seed(51)
    net = ref_vit.ViTZoo(
        pretrained=False, attn_layer="MultiHeadAttention_MultiMaskedLoRA3",
        block_layer="ResidualAttentionBiBlock",
        transformer_layer="Transformer_Proj", lora_rank=R)
    tm = ref_m.MInfLoRA3(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        lame=1.0, lamb=0.95, embd_dim=768, use_ca=False, dataset="cifar",
        eval_mat=False)
    tm._network.update_fc()
    tm._network.update_fc()
    tm._known_classes = INIT
    rng = np.random.RandomState(52)
    sp_k, sp_v, diags = [], [], []
    with torch.no_grad():
        for mod in tm.attention_modules:
            for p in mod.scale_param:
                p.data = p.data.clone()  # split the identity_matrix alias
            mod.init_param()
            mod.init_param()
            ks, vs, ds = [], [], []
            for t in range(2):
                mod.lora_A_k_list[t].weight.copy_(torch.from_numpy(
                    rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
                mod.lora_A_v_list[t].weight.copy_(torch.from_numpy(
                    rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
                mod.lora_B_k_list[t].weight.copy_(torch.from_numpy(
                    rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
                mod.lora_B_v_list[t].weight.copy_(torch.from_numpy(
                    rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
                ks.append((rng.randn(RS, 768) * 0.03).astype(np.float32))
                vs.append((rng.randn(RS, 768) * 0.03).astype(np.float32))
                ds.append((1.0 + 0.1 * rng.randn(RS)).astype(np.float32))
                mod.space_k[t] = torch.from_numpy(ks[-1])
                mod.space_v[t] = torch.from_numpy(vs[-1])
                blk = 0.1 * rng.randn(RS, RS).astype(np.float32)
                np.fill_diagonal(blk, ds[-1])
                mod.scale_param[t].data[:RS, :RS] = torch.from_numpy(blk)
            sp_k.append(ks)
            sp_v.append(vs)
            diags.append(ds)
    for name, param in tm._network.named_parameters():
        param.requires_grad_(False)
        if ("classifier_pool.1" in name or "lora_B_k_list.1" in name
                or "lora_B_v_list.1" in name or "scale_param.1" in name):
            param.requires_grad_(True)
    net.eval()

    m, state = my_method("MInfLoRA3", {"rank": R, "space_rank": RS},
                         backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    lora = {k: np.array(v) for k, v in state.params["lora"].items()}
    scale_diag = np.array(state.params["scale_diag"])
    space_k = np.array(state.mvars["space_k"])
    space_v = np.array(state.mvars["space_v"])
    for li, mod in enumerate(tm.attention_modules):
        for t in range(2):
            lora["A_k"][li, t] = S.t2n(mod.lora_A_k_list[t].weight)
            lora["A_v"][li, t] = S.t2n(mod.lora_A_v_list[t].weight)
            lora["B_k"][li, t] = S.t2n(mod.lora_B_k_list[t].weight)
            lora["B_v"][li, t] = S.t2n(mod.lora_B_v_list[t].weight)
            space_k[li, t] = sp_k[li][t]
            space_v[li, t] = sp_v[li][t]
            scale_diag[li, t] = diags[li][t]
    hk = np.zeros((768, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    for t_, fc in enumerate(tm._network.classifier_pool):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hk[:, lo: lo + fc.out_features] = S.lin_k(fc.weight)
        hb[lo: lo + fc.out_features] = S.t2n(fc.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(hk), "bias": jnp.asarray(hb)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
        "scale_diag": jnp.asarray(scale_diag),
    }
    T = TASKS
    state1 = install(state, params, {}, {
        "frozen": frozen,
        "space_k": jnp.asarray(space_k),
        "space_v": jnp.asarray(space_v),
        "space_mask": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
        "active": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
        "train_onehot": jnp.asarray((np.arange(T) == 1).astype(np.float32)),
    })
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = (rng.randn(3, 3, 224, 224) * 0.5).astype(np.float32)
    y = rng.randint(INIT, INIT + INC, size=(3,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    jb = {"x": jnp.asarray(x.transpose(0, 2, 3, 1)),
          "label": jnp.asarray(y.astype(np.int32))}
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "MInfLoRA3 task1 CE (diag TR ladder)",
                      tol=1e-3)

    t_loss.backward()
    grads = m.transform_grads(
        jax.grad(lambda p: m.loss(p, state1, jb, None)[0])(state1.params),
        state1)
    for li, mod in enumerate(tm.attention_modules):
        for slot, tmod in (("B_k", mod.lora_B_k_list[1]),
                           ("B_v", mod.lora_B_v_list[1])):
            np.testing.assert_allclose(
                np.asarray(grads["lora"][slot][li, 1]),
                S.t2n(tmod.weight.grad), rtol=5e-3, atol=5e-5,
                err_msg=f"MInfLoRA3 {slot} grad mismatch layer {li}")
    g_diag = np.asarray(grads["scale_diag"][0, 1])
    t_diag = np.diag(S.t2n(tm.attention_modules[0].scale_param[1].grad))[:RS]
    np.testing.assert_allclose(g_diag, t_diag, rtol=5e-3, atol=5e-5,
                               err_msg="MInfLoRA3 scale diag grad mismatch")


def test_inflora_opt_compact_classifier(monkeypatch):
    """reference InfLoRA_opt.py:399-456 _compact_classifier: 5 epochs of
    SGD(lr 0.01, momentum 0.9, wd 5e-4) under CosineAnnealingLR over
    class-Gaussian feature samples, 256/class, per-class mean scaled by
    0.9 + (task_id+1)/(task_idx+1)*0.1.  Both sides consume BIT-IDENTICAL
    draws (the reference's MultivariateNormal and randperm are stubbed; my
    sampling seams are overridden) so the test isolates the optimizer
    dynamics — the advisor's round-2 finding was a sign error precisely
    here (gradient ascent via double negation).  Asserts the retrained
    head weights/biases match after the full run."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_opt = _refload.ref_module("core.model.InfLoRA_opt")
    import os
    os.environ.setdefault("PYTHONHASHSEED", "0")

    torch.manual_seed(61)
    net = ref_vit.ViTZoo(pretrained=False,
                         attn_layer="MultiHeadAttention_LoRA", lora_rank=4)
    tm = ref_opt.InfLoRA_OPT(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        lame=1.0, lamb=0.95, embd_dim=768, use_ca=True, dataset="cifar100")
    tm._network._cur_task_id = 1
    rng = np.random.RandomState(62)
    n_seen, D, NS, EP = INIT + INC, 768, 256, 5
    means = rng.randn(n_seen, D).astype(np.float32)
    covs, chols = [], []
    for c in range(n_seen):
        a = rng.randn(D, 8).astype(np.float64) * 0.1
        cov = a @ a.T + 0.05 * np.eye(D)
        covs.append(cov.astype(np.float32))
        chols.append(np.linalg.cholesky(cov).astype(np.float32))
    tm._class_means = torch.from_numpy(means)
    tm._class_covs = torch.stack([torch.from_numpy(c) for c in covs])
    with torch.no_grad():
        for pool in tm._network.classifier_pool:
            pool.weight.normal_(0, 0.05)
            pool.bias.normal_(0, 0.05)
    pre_k = [S.lin_k(p.weight) for p in tm._network.classifier_pool]
    pre_b = [S.t2n(p.bias) for p in tm._network.classifier_pool]

    # shared draws: z[ep][c] consumed in identical (ep, class) order
    zs = [[rng.randn(NS, D).astype(np.float32) for _ in range(n_seen)]
          for _ in range(EP)]
    flat_z = [z for ep in zs for z in ep]
    calls = {"i": 0}

    class FakeMVN:
        def __init__(self, mean, cov):
            self.mean, self.cov = mean, cov

        def sample(self, sample_shape):
            z = torch.from_numpy(flat_z[calls["i"]])
            calls["i"] += 1
            L = torch.linalg.cholesky(self.cov.double()).float()
            return self.mean[None, :] + z @ L.T

    monkeypatch.setattr(
        torch.distributions.multivariate_normal, "MultivariateNormal", FakeMVN)
    monkeypatch.setattr(torch, "randperm", lambda n: torch.arange(n))
    tm._compact_classifier(task_idx=1)

    import types as _types

    m, state = my_method("InfLoRA_OPT", {"rank": 4}, backbone="ViTZoo",
                         feat=768)
    m._class_means[:n_seen] = means
    for c in range(n_seen):
        m._class_chol[c] = chols[c]
    m._seen[:n_seen] = True
    jcalls = {"i": 0}

    def fake_noise(self, rng_, n, class_id):
        z = flat_z[jcalls["i"]]
        jcalls["i"] += 1
        return z

    m._ca_noise = _types.MethodType(fake_noise, m)
    m._ca_perm = _types.MethodType(
        lambda self, rng_, n: np.arange(n), m)
    # head BEFORE retraining = the torch pools' pre-CA snapshot
    kern = np.array(state.params["head"]["Dense_0"]["kernel"])
    bias = np.array(state.params["head"]["Dense_0"]["bias"])
    for t_ in range(len(pre_k)):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hi = lo + pre_k[t_].shape[1]
        kern[:, lo:hi] = pre_k[t_]
        bias[lo:hi] = pre_b[t_]
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    params["head"] = {"Dense_0": {"kernel": jnp.asarray(kern),
                                  "bias": jnp.asarray(bias)}}
    state = state.replace(params=params)
    state2 = m._compact_classifier(state, 1)

    out_k = np.asarray(state2.params["head"]["Dense_0"]["kernel"])
    out_b = np.asarray(state2.params["head"]["Dense_0"]["bias"])
    for t_, pool in enumerate(tm._network.classifier_pool[:2]):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hi = lo + pool.out_features
        np.testing.assert_allclose(
            out_k[:, lo:hi], S.lin_k(pool.weight), rtol=2e-3, atol=2e-4,
            err_msg=f"compact-classifier kernel cols task {t_}")
        np.testing.assert_allclose(
            out_b[lo:hi], S.t2n(pool.bias), rtol=2e-3, atol=2e-4,
            err_msg=f"compact-classifier bias task {t_}")


# ---------------------------------------------------------------- Finetune


def test_finetune_loss_task1(ref_resnet):
    """reference finetune.py:15-25: plain full-head CE (NO class masking —
    unseen head columns participate in the softmax) on the cifar_resnet20
    features; the naive baseline every other method builds on."""
    ref_ft = _refload.ref_module("core.model.finetune")
    torch.manual_seed(71)
    tm = ref_ft.Finetune(
        ref_resnet.cifar_resnet20(), feat_dim=FEAT, num_class=NUM_CLASS,
        **REF_KW)
    randomize_torch(tm, 72)
    tm.train()  # the trainer observes in train mode: BN uses batch stats

    m, state = my_method("Finetune")
    params, mstate = full_pytree(tm.backbone, tm.classifier)
    state1 = install(state, params, mstate)
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(73, 0, INIT + INC)
    _, _, t_loss = tm.observe(tb)
    j_loss, _ = m.loss(state1.params, state1, jb, None)
    assert_loss_close(t_loss, j_loss, "Finetune full-head CE")
