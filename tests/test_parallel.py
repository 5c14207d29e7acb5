"""Data-parallel trainer path over the virtual 8-device CPU mesh."""

import copy

import jax
import numpy as np

from libcontinual_tpu.core.trainer import Trainer


def test_trainer_data_parallel_4way(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["mesh"] = {"data": 4, "model": 1}
    cfg["batch_size"] = 16  # 4 per device
    cfg["epoch"] = 6
    tr = Trainer(cfg)
    assert tr.mesh.data_size == 4
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert res["acc_table"][0, 0] > 30.0  # actually learns under sharding


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    from libcontinual_tpu.parallel.tp import tp_spec

    assert tp_spec("vit/blocks_0/mlp/fc1/kernel", (64, 256), 4) == P(None, "model")
    assert tp_spec("vit/blocks_0/mlp/fc1/bias", (256,), 4) == P("model")
    assert tp_spec("vit/blocks_0/mlp/fc2/kernel", (256, 64), 4) == P("model", None)
    # stacked (vmap'd) extractor params: leading axes stay unsharded
    assert tp_spec("stack/mlp/fc1/kernel", (10, 64, 256), 4) == P(None, None, "model")
    # non-divisible or non-MLP leaves stay replicated
    assert tp_spec("vit/blocks_0/mlp/fc1/kernel", (64, 255), 4) == P()
    assert tp_spec("vit/blocks_0/attn/qkv/kernel", (64, 192), 4) == P()
    assert tp_spec("vit/blocks_0/mlp/fc2/bias", (64,), 4) == P()


def test_tp_matches_replicated_training(tiny_config):
    """Same seed, same data: a 2x2 dp x tp run must reproduce the 1x1 run's
    accuracy table (TP sharding is a layout choice, not a math change)."""
    import jax

    results = []
    for mesh in ({"data": 1, "model": 1}, {"data": 2, "model": 2}):
        cfg = copy.deepcopy(tiny_config)
        cfg["mesh"] = mesh
        cfg["batch_size"] = 16
        cfg["epoch"] = 3
        cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
        cfg["classifier"] = {
            "name": "L2P",
            "kwargs": {
                "num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                "inc_cls_num": 4, "task_num": 2,
                "prompt_pool": 4, "prompt_length": 2, "top_k": 2,
            },
        }
        cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
        tr = Trainer(cfg)
        results.append(np.asarray(tr.train_loop()["acc_table"]))
    # f32 psum reduction order differs; tolerance covers one borderline
    # example flip (acc quantum 0.625 on 160 test samples), not drift
    diff = np.abs(results[0] - results[1])
    assert diff.max() <= 1.5 and diff.mean() <= 0.5, (
        f"replicated vs tp acc tables diverged:\n{results[0]}\n{results[1]}"
    )


def test_tp_one_step_loss_matches_replicated(tiny_config):
    """One train step, same batch, f32: the dp x tp loss must equal the
    single-device loss to reduction-order noise — catches a dropped psum or
    wrong partition spec at the loss level before training chaos hides it."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import libcontinual_tpu.methods  # noqa: F401 — populate registry
    from libcontinual_tpu.parallel.mesh import make_mesh
    from libcontinual_tpu.registry import METHODS

    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "L2P",
        "kwargs": {
            "num_class": 8, "feat_dim": 64, "init_cls_num": 4,
            "inc_cls_num": 4, "task_num": 2,
            "prompt_pool": 4, "prompt_length": 2, "top_k": 2,
        },
    }
    losses = []
    for dp, tp in ((1, 1), (2, 2)):
        mesh = make_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
        method = METHODS.get("L2P")(cfg, mesh)
        state = method.init_state(jax.random.PRNGKey(0), (32, 32, 3))
        state = jax.device_put(state, mesh.param_sharding(state))
        rng = np.random.RandomState(0)
        batch = {
            "image": jax.device_put(
                jnp.asarray(rng.randint(0, 255, (8, 32, 32, 3), np.uint8)),
                NamedSharding(mesh.mesh, P("data")),
            ),
            "label": jax.device_put(
                jnp.asarray(rng.randint(0, 4, (8,), np.int32)),
                NamedSharding(mesh.mesh, P("data")),
            ),
            "weight": jax.device_put(
                jnp.ones((8,), jnp.float32), NamedSharding(mesh.mesh, P("data"))
            ),
        }
        tx = method._tx_for_task(0)
        with mesh.mesh:
            _, m = jax.jit(
                lambda st, b: method.train_step(st, b, jnp.float32(1e-3), tx=tx)
            )(state, batch)
        losses.append(float(np.asarray(m["loss"])))
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) <= 1e-3 * max(1.0, abs(losses[0])), (
        f"1x1 vs 2x2 one-step loss diverged: {losses}"
    )


def test_trainer_tensor_parallel_2x2(tiny_config):
    """dp=2 x tp=2 mesh on a ViT: MLPs sharded over 'model', batch over 'data'."""
    cfg = copy.deepcopy(tiny_config)
    cfg["mesh"] = {"data": 2, "model": 2}
    cfg["batch_size"] = 16
    cfg["epoch"] = 8
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "L2P",
        "kwargs": {
            "num_class": 8, "feat_dim": 64, "init_cls_num": 4,
            "inc_cls_num": 4, "task_num": 2,
            "prompt_pool": 4, "prompt_length": 2, "top_k": 2,
        },
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    tr = Trainer(cfg)
    assert tr.mesh.model_size == 2
    # the ViT MLP leaves must actually be TP-sharded, not replicated
    from jax.sharding import PartitionSpec as P

    shardings = tr.mesh.param_sharding(tr.state)
    specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
    ]
    assert any(p == P(None, "model") for p in specs), "no fc1 kernel sharded"
    assert any(p == P("model", None) for p in specs), "no fc2 kernel sharded"
    res = tr.train_loop()
    assert np.isfinite(res["acc_table"]).all()
    assert res["acc_table"][0, 0] > 30.0  # learns under dp x tp sharding


def test_make_mesh_rejects_oversized_model_axis():
    """model > device count under data=-1 used to build a 0-device Mesh that
    died later inside XLA; it must raise the misconfiguration here."""
    import pytest

    from libcontinual_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh(data=-1, model=1024)


def test_tp_model4_one_step_loss_matches_replicated(tiny_config):
    """Pure 4-way tensor parallelism (1x4 mesh): with vit_tiny_test's 4
    heads, the attention head constraint puts exactly one head group per
    rank and the MLP shards 256/4 — the deepest TP the tiny geometry
    supports. One optimizer step's loss must match the replicated run."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libcontinual_tpu.parallel.mesh import make_mesh
    from libcontinual_tpu.registry import METHODS

    cfg = copy.deepcopy(tiny_config)
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "L2P",
        "kwargs": {
            "num_class": 8, "feat_dim": 64, "init_cls_num": 4,
            "inc_cls_num": 4, "task_num": 2,
            "prompt_pool": 4, "prompt_length": 2, "top_k": 2,
        },
    }
    losses = []
    for dp, tp in ((1, 1), (1, 4)):
        mesh = make_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
        method = METHODS.get("L2P")(cfg, mesh)
        state = method.init_state(jax.random.PRNGKey(0), (32, 32, 3))
        state = jax.device_put(state, mesh.param_sharding(state))
        rng = np.random.RandomState(0)
        batch = {
            "image": jax.device_put(
                jnp.asarray(rng.randint(0, 255, (8, 32, 32, 3), np.uint8)),
                NamedSharding(mesh.mesh, P("data")),
            ),
            "label": jax.device_put(
                jnp.asarray(rng.randint(0, 4, (8,), np.int32)),
                NamedSharding(mesh.mesh, P("data")),
            ),
            "weight": jax.device_put(
                jnp.ones((8,), jnp.float32), NamedSharding(mesh.mesh, P("data"))
            ),
        }
        tx = method._tx_for_task(0)
        with mesh.mesh:
            _, m = jax.jit(
                lambda st, b: method.train_step(st, b, jnp.float32(1e-3), tx=tx)
            )(state, batch)
        losses.append(float(np.asarray(m["loss"])))
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) <= 1e-3 * max(1.0, abs(losses[0])), (
        f"1x1 vs 1x4 one-step loss diverged: {losses}"
    )
