"""Trainer-level lockstep differential: a FULL 2-task x 3-epoch L2P run of
my Trainer vs the executing reference's own loop semantics.

Per-step loss parity (test_reference_loss_parity.py) proves the method
math; this test catches the integration seams it cannot: optimizer-step
ordering around observe's internal backward+clip (reference
trainer.py:593-606), per-task optimizer re-init (:294), per-epoch
scheduler stepping, shuffle-stream usage, transform placement, and the
task-boundary hook order. Both sides start from identical weights, consume
identical batch orders (my trainer's deterministic shuffle stream,
replayed on the torch side), and train 2 tasks x 3 epochs x 2 steps with
Adam; per-epoch mean losses must track within fp tolerance and the final
acc_table must agree.

Reference loop semantics executed here: L2P.observe backward + clip inside
observe (l2p.py:102-104), trainer zero_grad-before / step-after
(trainer.py:593-606), before_task/after_task ordering (:288,406).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import _refload
import _refsync as S

INIT, INC, TASKS = 4, 4, 2
NUM_CLASS = 8
BATCH, EPOCHS, PER_CLASS = 4, 3, 2
LR, SEED = 5e-3, 11
MEAN, STD = 0.5, 0.25


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
            "pool_size": 10, "top_k": 5, "pull_constraint_coeff": 0.1}},
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


def test_l2p_two_task_lockstep(tmp_path):
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_l2p = _refload.ref_module("core.model.l2p")

    from libcontinual_tpu.core.trainer import Trainer
    from libcontinual_tpu.data import native

    # ---- torch reference side: model + method
    torch.manual_seed(7)  # margin-safe prompt keys (same as the loss test)
    zoo = ref_vit.ViTZoo(pretrained=False)
    kw = dict(num_class=NUM_CLASS, feat_dim=768, prompt_length=5,
              pool_size=10, top_k=5, pull_constraint_coeff=0.1,
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
    import jax

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

    overall = trainer.train_loop()
    my_acc_table = np.asarray(overall["acc_table"])[:TASKS, :TASKS]
    events = [json.loads(l) for l in
              open(os.path.join(tmp_path, "events.jsonl"))]
    my_losses = {(e["task"], e["epoch"]): e["loss"]
                 for e in events if e.get("kind") == "train_epoch"}

    # ---- torch side: the reference trainer loop, same data + batch order
    t_losses = {}
    t_acc_table = np.zeros((TASKS, TASKS))
    for task in range(TASKS):
        td = trainer.train_stream.task(task)
        n = len(td)
        tm.before_task(task, None, None, None)
        optim = torch.optim.Adam(tm.get_parameters(cfg), lr=LR)
        for epoch in range(EPOCHS):
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
            t_losses[(task, epoch)] = float(np.mean(losses))
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

    # ---- lockstep assertions
    for key in sorted(t_losses):
        t, j = t_losses[key], my_losses[key]
        assert abs(t - j) <= 2e-3 * max(1.0, abs(t)), (
            f"epoch loss diverged at task{key[0]} epoch{key[1]}: "
            f"ref {t:.6f} vs mine {j:.6f}\nref {t_losses}\nmine {my_losses}")
    np.testing.assert_allclose(
        my_acc_table, t_acc_table, atol=1e-6,
        err_msg=f"acc_table diverged\nref\n{t_acc_table}\nmine\n{my_acc_table}")
