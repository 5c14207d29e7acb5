import os

# Virtual 8-device CPU mesh: the standard JAX fake-multi-device harness for
# testing sharding without real chips (SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax with JAX_PLATFORMS=axon already baked;
# override through the config API (backend init is lazy, so this still wins).
jax.config.update("jax_platforms", "cpu")

# Build the native host-data engine when a compiler exists, so its tests run
# instead of silently skipping (they skipif on the .so being absent).
_native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
if not os.path.exists(os.path.join(_native_dir, "libhostdata.so")):
    import shutil
    import subprocess

    if shutil.which("g++") or shutil.which("c++"):
        subprocess.run(["make", "-C", _native_dir], check=False, capture_output=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_attention_mesh():
    """Trainers register the active mesh in module globals (ops/attention.py)
    so the fused kernels can shard_map; clear it between tests so a
    mesh-building test can't leak sharding behavior into a unit test."""
    yield
    from libcontinual_tpu.ops.attention import (
        set_active_mesh, set_active_mesh_devices,
    )

    set_active_mesh(None)
    set_active_mesh_devices(None)


@pytest.fixture
def tiny_config():
    """2-task micro-run config on synthetic data."""
    from libcontinual_tpu.config import Config

    cfg = Config(overrides={
        "dataset": "synthetic",
        "data_root": "",
        "image_size": 32,
        "task_num": 2,
        "init_cls_num": 4,
        "inc_cls_num": 4,
        "epoch": 6,
        "batch_size": 16,
        "per_class": 40,
        "seed": 7,
        "val_per_epoch": 0,
        "testing_times": 1,
        "dtype": "float32",
        "mesh": {"data": 1, "model": 1},
        "backbone": {"name": "tiny_cnn", "kwargs": {}},
        "classifier": {"name": "Finetune", "kwargs": {"num_class": 8, "feat_dim": 32}},
        "train_trfms": [
            {"RandomHorizontalFlip": {}},
            {"Normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.25, 0.25, 0.25]}},
        ],
        "test_trfms": [
            {"Normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.25, 0.25, 0.25]}},
        ],
        "buffer": {"name": "LinearBuffer",
                   "kwargs": {"buffer_size": 0, "batch_size": 16, "strategy": "random"}},
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.05, "momentum": 0.9}},
        "lr_scheduler": {"name": "Constant"},
        "warmup": 0,
    }).get_config_dict()
    return cfg
