"""Trainer-level lockstep differential: a FULL 2-task x 3-epoch L2P run of
my Trainer vs the executing reference's own loop semantics.

Per-step loss parity (test_reference_loss_parity.py) proves the method
math; this test catches the integration seams it cannot: optimizer-step
ordering around observe's internal backward+clip (reference
trainer.py:593-606), per-task optimizer re-init (:294), per-epoch
scheduler stepping, shuffle-stream usage, transform placement, and the
task-boundary hook order.

Protocol — PIECEWISE lockstep (the same re-sync-each-epoch protocol as
every other lockstep; see test_trainer_lockstep_icarl.py for the fp-chaos
measurement). L2P adds a reason of its own: the prompt-pool top-k key
match and batch-majority dedup are DISCRETE selections, so once fp drift
accumulates across updates a near-tie can flip one prompt choice and move
the loss by percents — a whole-trajectory comparison is chaos-bound even
on a frozen trunk (observed: epoch-0 agreement at 2e-6, epoch-1 off by
7e-2 from one flipped selection). Re-synced from my captured epoch states
(params + Adam mu/nu/count), every epoch's per-step losses and epoch-end
params are asserted from a common start. The pool runs at top_k ==
pool_size: the pull constraint actively drags keys toward queries, so
top-k BOUNDARY near-ties become generic after a few updates and flip on
the ~1e-6 torch-vs-flax forward difference even from identical parameters
(measured: 2e-3 loss shift from one flipped prompt at a synced epoch
start). Selecting the whole pool removes only the tie lottery; the top-k
selection math itself is pinned by the margin-safe step-level loss parity
and eval-parity key-match tests.

Reference loop semantics executed here: L2P.observe backward + clip inside
observe (l2p.py:102-104), trainer zero_grad-before / step-after
(trainer.py:593-606), before_task/after_task ordering (:288,406).
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

INIT, INC, TASKS = 4, 4, 2
NUM_CLASS = 8
BATCH, EPOCHS, PER_CLASS = 4, 3, 2
LR, SEED = 5e-3, 11
MEAN, STD = 0.5, 0.25
TOL_STEP_LOSS = 2e-3
TOL_PARAM = 2e-3


def _my_config():
    from libcontinual_tpu.config import Config

    return Config(overrides={
        "dataset": "synthetic", "data_root": "", "image_size": 224,
        "task_num": TASKS, "init_cls_num": INIT, "inc_cls_num": INC,
        "epoch": EPOCHS, "init_epoch": EPOCHS, "batch_size": BATCH,
        "per_class": PER_CLASS, "seed": SEED, "val_per_epoch": 0,
        "testing_times": 1, "dtype": "float32",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "ViTZoo", "kwargs": {}},
        "classifier": {"name": "L2P", "kwargs": {
            "num_class": NUM_CLASS, "feat_dim": 768, "init_cls_num": INIT,
            "inc_cls_num": INC, "task_num": TASKS, "prompt_length": 5,
            "pool_size": 5, "top_k": 5, "pull_constraint_coeff": 0.1}},
        "train_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "test_trfms": [{"Normalize": {"mean": [MEAN] * 3, "std": [STD] * 3}}],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": BATCH,
                              "strategy": "random"}},
        "optimizer": {"name": "Adam", "kwargs": {"lr": LR}},
        "lr_scheduler": {"name": "Constant"}, "warmup": 0,
    }).get_config_dict()


def _to_torch(img_u8):
    x = img_u8.astype(np.float32) / 255.0
    x = (x - MEAN) / STD
    return torch.from_numpy(x.transpose(0, 3, 1, 2))




def _host_tree(t):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), jax.device_get(t))


def _find_adam(opt_state):
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu")):
        if hasattr(part, "mu"):
            return {"mu": part.mu, "nu": part.nu, "count": part.count}
    raise AssertionError("Adam state not found in opt_state")


def test_l2p_two_task_lockstep(tmp_path):
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_l2p = _refload.ref_module("core.model.l2p")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side: model + method
    torch.manual_seed(7)  # margin-safe prompt keys (same as the loss test)
    zoo = ref_vit.ViTZoo(pretrained=False)
    kw = dict(num_class=NUM_CLASS, feat_dim=768, prompt_length=5,
              pool_size=5, top_k=5, pull_constraint_coeff=0.1,
              init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS)
    tm = ref_l2p.L2P(zoo, torch.device("cpu"), **kw)
    g = torch.Generator().manual_seed(1101)
    with torch.no_grad():
        tm.network.backbone.prompt.prompt.uniform_(0, 1, generator=g)
        tm.network.backbone.prompt.prompt_key.uniform_(0, 1, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()

    # ---- my side: full Trainer, weights overwritten from the torch model
    cfg = _my_config()
    trainer = Trainer(cfg, workdir=str(tmp_path))

    frozen = jax.tree_util.tree_map(
        jnp.asarray, S.sync_vit(tm.network.backbone.feat, 12))
    params = {
        "head": {"Dense_0": {
            "kernel": jnp.asarray(S.lin_k(tm.network.classifier.weight)),
            "bias": jnp.asarray(S.t2n(tm.network.classifier.bias))}},
        "prompt": {
            "prompt": jnp.asarray(S.t2n(tm.network.backbone.prompt.prompt)[0]),
            "key": jnp.asarray(S.t2n(tm.network.backbone.prompt.prompt_key))},
    }
    assert set(params) == set(trainer.state.params), (
        "L2P param structure changed; update the lockstep sync")
    mvars = dict(trainer.state.mvars)
    mvars["frozen"] = frozen
    trainer.state = trainer.state.replace(params=params, mvars=mvars)

    captures = {}

    def _capture(task_idx, epoch_idx, state, step_losses):
        captures[(task_idx, epoch_idx)] = {
            "params": _host_tree(state.params),
            "adam": _host_tree(_find_adam(state.opt_state)),
            "losses": np.asarray(step_losses, np.float64),
        }

    trainer.epoch_hook = _capture
    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    assert set(captures) == {(t, e) for t in range(TASKS)
                             for e in range(EPOCHS)}

    # my pytree path -> torch tensor (+ flax->torch transform); the torch
    # prompt carries a leading singleton dim my params drop
    def _inv_prompt(a):
        return np.asarray(a)[None].copy()

    pairs = [
        (tm.network.backbone.prompt.prompt, ("prompt", "prompt"), _inv_prompt),
        (tm.network.backbone.prompt.prompt_key, ("prompt", "key"), S._ident),
        (tm.network.classifier.weight, ("head", "Dense_0", "kernel"),
         S.inv_lin_k),
        (tm.network.classifier.bias, ("head", "Dense_0", "bias"), S._ident),
    ]

    def _resync(cap, optim=None):
        for t, path, inv in pairs:
            with torch.no_grad():
                t.copy_(torch.from_numpy(inv(S.tree_get(cap["params"], path))))
        if optim is not None:
            adam = cap["adam"]
            step = torch.tensor(float(adam["count"]))
            for t, path, inv in pairs:
                optim.state[t] = {
                    "step": step.clone(),
                    "exp_avg": torch.from_numpy(
                        inv(S.tree_get(adam["mu"], path))),
                    "exp_avg_sq": torch.from_numpy(
                        inv(S.tree_get(adam["nu"], path))),
                }

    # ---- torch side: the reference trainer loop, same data + batch order,
    # re-synced to my captured state at each epoch start
    t_acc_table = np.zeros((TASKS, TASKS))
    drift = {"loss": 0.0, "param": 0.0}
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        n = len(td)
        tm.before_task(task, None, None, None)
        optim = torch.optim.Adam(tm.get_parameters(cfg), lr=LR)
        for epoch in range(EPOCHS):
            if epoch > 0:
                _resync(captures[(task, epoch - 1)], optim)
            elif task > 0:
                # fresh per-task optimizer (reference trainer.py:294) has
                # no Adam state; params pinned from my end-of-prev-task
                _resync(captures[(task - 1, EPOCHS - 1)])
            perm = native.shuffled_indices(n, SEED + task * 100003 + epoch)
            steps = n // BATCH
            losses = []
            for s in range(steps):
                rows = perm[s * BATCH:(s + 1) * BATCH]
                batch = {"image": _to_torch(td.images[rows]),
                         "label": torch.from_numpy(
                             td.labels[rows].astype(np.int64))}
                optim.zero_grad()
                _, _, loss = tm.observe(batch)  # backward + clip inside
                optim.step()
                losses.append(float(loss.detach()))
            cap = captures[(task, epoch)]
            dl = np.abs(np.asarray(losses) - cap["losses"]).max()
            drift["loss"] = max(drift["loss"], float(dl))
            assert dl <= TOL_STEP_LOSS, (
                f"step losses diverged at task{task} epoch{epoch}: "
                f"max |diff| {dl:.2e}\nref  {losses}\nmine "
                f"{cap['losses'].tolist()}")
            dp = 0.0
            for t, path, inv in pairs:
                dp = max(dp, float(np.abs(
                    t.detach().numpy()
                    - inv(S.tree_get(cap["params"], path))).max()))
            drift["param"] = max(drift["param"], float(dp))
            assert dp <= TOL_PARAM, (
                f"epoch-end params diverged at task{task} epoch{epoch}: "
                f"max |diff| {dp:.2e}")
        # pin end-of-task state before the boundary + eval
        _resync(captures[(task, EPOCHS - 1)])
        tm.after_task(task, None, None, None)
        seen = INIT + task * INC
        for t_prev in range(task + 1):
            te = trainer.test_stream.task(t_prev)
            with torch.no_grad():
                logits, _ = tm.network(_to_torch(te.images), train=False)
            logits = logits.numpy()
            logits[:, seen:] = -np.inf  # my eval masks to the seen prefix
            preds = np.argmax(logits, axis=1)
            t_acc_table[task, t_prev] = round(
                100.0 * float(np.mean(preds == te.labels)), 2)

    print(f"lockstep drift: max step-loss {drift['loss']:.2e} "
          f"max epoch-end param {drift['param']:.2e}")
    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")
