"""Serving export: the StableHLO artifact must reproduce the live eval path
bit-for-bit (same program, ahead-of-time serialized), survive a
serialize/deserialize round trip, and support all three flavors: baked
weights, symbolic batch, weights-as-args."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.core.trainer import Trainer
from libcontinual_tpu.serving import ServingModel, export_from_trainer


def _trained_trainer(tiny_config):
    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 1
    tr = Trainer(cfg)
    tr.train_loop()
    return tr


def test_export_baked_matches_live_eval(tiny_config):
    tr = _trained_trainer(tiny_config)
    blob = export_from_trainer(
        tr, batch_size=8, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    model = ServingModel.load(blob)

    rng = np.random.RandomState(3)
    x = rng.rand(8, 32, 32, 3).astype(np.float32)
    served = np.asarray(model(jnp.asarray(x)))
    live_x = tr.method.augment(None, jnp.asarray(x), train=False)
    live = np.asarray(tr.method.eval_logits(tr.state, live_x, -1))
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-5)
    # seen-class masking is part of the artifact
    assert np.all(served[:, 8:] <= -1e29)


def test_export_symbolic_batch(tiny_config):
    tr = _trained_trainer(tiny_config)
    blob = export_from_trainer(tr, batch_size=None, platforms=("cpu",))
    model = ServingModel.load(blob)
    rng = np.random.RandomState(4)
    for b in (1, 5, 16):
        x = rng.rand(b, 32, 32, 3).astype(np.float32)
        out = np.asarray(model(jnp.asarray(x)))
        assert out.shape == (b, 8)


def test_export_weights_as_args(tiny_config):
    tr = _trained_trainer(tiny_config)
    blob = export_from_trainer(
        tr, batch_size=4, bake_weights=False, platforms=("cpu",))
    model = ServingModel.load(blob)
    rng = np.random.RandomState(5)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    out1 = np.asarray(model(tr.state, jnp.asarray(x)))
    # hot-swap: zeroed head must change the logits fed the same state shape
    params = jax.tree_util.tree_map(lambda a: a, tr.state.params)
    params["head"] = jax.tree_util.tree_map(jnp.zeros_like, params["head"])
    state2 = tr.state.replace(params=params)
    out2 = np.asarray(model(state2, jnp.asarray(x)))
    assert out1.shape == out2.shape == (4, 8)
    assert not np.allclose(out1[:, :8], out2[:, :8])


def test_export_sharded_dp(tiny_config):
    """Multi-chip serving: export the inference program jitted over a
    dp mesh (batch sharded across 8 virtual devices). jax.export records
    the shardings + device assignment; the loaded artifact runs under the
    same-shaped mesh — the deployment path for fleet serving."""
    import copy

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import export as jax_export
    from libcontinual_tpu.serving import _infer_fn

    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 1
    tr = Trainer(cfg)
    tr.train_loop()

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    bshard = NamedSharding(mesh, P("data"))
    run = _infer_fn(tr.method, tr.state, -1)
    state = jax.device_put(tr.state, NamedSharding(mesh, P()))  # replicate
    fn = jax.jit(lambda images: run(state, images), in_shardings=bshard)
    spec = jax.ShapeDtypeStruct((16, 32, 32, 3), jnp.float32, sharding=bshard)
    exp = jax_export.export(fn)(spec)
    blob = bytes(exp.serialize())
    model = ServingModel.load(blob)
    assert model.exported.nr_devices == 8

    rng = np.random.RandomState(6)
    x_np = rng.rand(16, 32, 32, 3).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np), bshard)
    served = np.asarray(model(x))
    live_x = tr.method.augment(None, jnp.asarray(x_np), train=False)
    live = np.asarray(tr.method.eval_logits(tr.state, live_x, -1))
    np.testing.assert_allclose(served, live, rtol=1e-4, atol=1e-4)


def test_export_default_geometry_is_storage_not_resize_target(tiny_config):
    """A resize pipeline (stored 32x32, in-graph Resize to 64 — the shape of
    every ViT-on-CIFAR config) must export an artifact that accepts the RAW
    stored geometry the live eval path consumes, not the post-resize target
    (regression: export_from_trainer used to default to cfg['image_size'])."""
    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 1
    cfg["storage_size"] = 32
    cfg["image_size"] = 64
    resize = {"Resize": {"size": 64}}
    cfg["train_trfms"] = [resize] + cfg["train_trfms"]
    cfg["test_trfms"] = [resize] + cfg["test_trfms"]
    tr = Trainer(cfg)
    tr.train_loop()
    assert tr.train_stream.task(0).images.shape[1:] == (32, 32, 3)

    blob = export_from_trainer(tr, batch_size=4, platforms=("cpu",))
    model = ServingModel.load(blob)
    rng = np.random.RandomState(9)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)  # raw storage geometry
    served = np.asarray(model(jnp.asarray(x)))
    live_x = tr.method.augment(None, jnp.asarray(x), train=False)
    live = np.asarray(tr.method.eval_logits(tr.state, live_x, -1))
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-5)


# ------------------------------------------------- nontrivial readouts
#
# The six special eval paths could silently bake the WRONG readout into
# the artifact exactly where eval differs from masked-argmax; these three
# cover the families: NME (iCaRL, reference icarl.py:122-152),
# bias-corrected (BiC, bic.py:155-163), projected ridge (RanPAC,
# ranpac.py:201-212,265-266).


def _readout_cfg(tiny_config, method, kwargs, backbone=None, buffer=None,
                 extra=None):
    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 1
    cfg["classifier"] = {"name": method, "kwargs": {
        "num_class": 8, "feat_dim": 32, "init_cls_num": 4,
        "inc_cls_num": 4, "task_num": 2, **kwargs}}
    if backbone is not None:
        cfg["backbone"] = backbone
    if buffer is not None:
        cfg["buffer"] = buffer
    cfg.update(extra or {})
    return cfg


def _assert_export_matches_live(tr, n_class=8):
    blob = export_from_trainer(tr, batch_size=6, platforms=("cpu",))
    model = ServingModel.load(blob)
    rng = np.random.RandomState(9)
    x = rng.rand(6, 32, 32, 3).astype(np.float32)
    served = np.asarray(model(jnp.asarray(x)))
    live_x = tr.method.augment(None, jnp.asarray(x), train=False)
    live = np.asarray(tr.method.eval_logits(tr.state, live_x, -1))
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-5)
    assert served.shape == (6, n_class)
    return served


def test_export_icarl_nme_readout(tiny_config):
    """The baked program must carry the class-mean NME scores (negative
    squared distances), not the linear head."""
    cfg = _readout_cfg(
        tiny_config, "ICarl", {},
        buffer={"name": "LinearHerdingBuffer",
                "kwargs": {"buffer_size": 16, "batch_size": 16}})
    tr = Trainer(cfg)
    tr.train_loop()
    served = _assert_export_matches_live(tr)
    # NME scores are negative squared distances on the seen prefix
    assert np.all(served[:, :8] <= 0.0)


def test_export_bic_bias_corrected_readout(tiny_config):
    """The baked program must apply the stage-2-trained per-task
    (alpha, beta) bias layers."""
    cfg = _readout_cfg(
        tiny_config, "bic", {"T": 2.0},
        buffer={"name": "LinearSpiltBuffer",
                "kwargs": {"buffer_size": 16, "batch_size": 16,
                           "strategy": "equal_random", "split_ratio": 0.25}},
        extra={"stage2_epoch": 2})
    tr = Trainer(cfg)
    tr.train_loop()
    alphas = np.asarray(tr.state.mvars["alphas"])
    betas = np.asarray(tr.state.mvars["betas"])
    assert abs(alphas[1] - 1.0) > 1e-4 or abs(betas[1]) > 1e-4, (
        "stage 2 did not move the bias layer; the export test would be "
        "vacuous")
    _assert_export_matches_live(tr)


def test_export_ranpac_ridge_readout(tiny_config):
    """The baked program must take the random-projection ridge branch
    (rp_ready), not the warmup linear head."""
    cfg = _readout_cfg(
        tiny_config, "RanPAC", {"M": 32, "feat_dim": 64},
        backbone={"name": "vit_tiny_test", "kwargs": {"adapter_dim": 8}})
    tr = Trainer(cfg)
    tr.train_loop()
    assert float(tr.state.mvars["rp_ready"]) > 0
    _assert_export_matches_live(tr)


def test_export_lucir_cosine_readout(tiny_config):
    """The baked program must carry the sigma-scaled cosine head (reference
    lucir.py:125-128 eval through CosineLinear, resnet.py:418), not a plain
    linear readout."""
    cfg = _readout_cfg(
        tiny_config, "LUCIR",
        {"K": 2, "lw_mr": 1.0, "dist": 0.5, "lamda": 5.0},
        buffer={"name": "LinearBuffer",
                "kwargs": {"buffer_size": 16, "batch_size": 16,
                           "strategy": "herding"}})
    tr = Trainer(cfg)
    tr.train_loop()
    served = _assert_export_matches_live(tr)
    # cosine scores are bounded by |sigma| — a linear head would not be
    sigma = abs(float(np.asarray(tr.state.params["head"]["sigma"])))
    assert np.all(np.abs(served[:, :8]) <= sigma + 1e-4)
    assert sigma > 1e-3


def test_export_der_concat_readout(tiny_config):
    """The baked program must run BOTH stacked extractors and feed the
    concatenated features to the widened head (reference der.py:90-134),
    i.e. bake the final active-count geometry, not the task-0 program."""
    cfg = _readout_cfg(
        tiny_config, "DER", {},
        buffer={"name": "LinearBuffer",
                "kwargs": {"buffer_size": 16, "batch_size": 16,
                           "strategy": "random"}})
    tr = Trainer(cfg)
    tr.train_loop()
    assert np.asarray(tr.state.mvars["active"]).sum() == 2
    _assert_export_matches_live(tr)


def test_export_dualprompt_key_match_readout(tiny_config):
    """The baked program must carry the full two-pass eval: frozen-query
    forward, e-prompt key matching, prefix-KV prompted forward (reference
    prompt.py:253-291, vit.py:100-127)."""
    cfg = _readout_cfg(
        tiny_config, "DualPrompt",
        {"e_prompt_length": 4, "g_prompt_length": 4, "pool_size": 2,
         "feat_dim": 64},
        backbone={"name": "vit_tiny_test", "kwargs": {}})
    tr = Trainer(cfg)
    tr.train_loop()
    _assert_export_matches_live(tr)
