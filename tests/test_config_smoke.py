"""Schema-rot guard: every shipped config must instantiate its method (which
builds the backbone module and transform pipelines) and its LR schedule —
no training, no param init (VERDICT r1 #4)."""

import glob
import os

import pytest

from libcontinual_tpu.config.config import load_config
from libcontinual_tpu.core.optim import make_schedule
from libcontinual_tpu.registry import METHODS

import libcontinual_tpu.methods  # noqa: F401  (registry population)

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL = sorted(
    os.path.relpath(p, ROOT)
    for p in glob.glob(os.path.join(ROOT, "**", "*.yaml"), recursive=True)
    if "headers" not in p
)


@pytest.mark.parametrize("rel", ALL)
def test_config_instantiates(rel):
    cfg = load_config(os.path.join(ROOT, rel))
    if "classifier" not in cfg or not (cfg.get("classifier") or {}).get("name"):
        pytest.skip("config fragment (no classifier)")
    method = METHODS.get(cfg["classifier"]["name"])(cfg, None)
    assert method is not None
    epochs = int(cfg.get("epoch", 1))
    sched = make_schedule(cfg, steps_per_epoch=4, total_epochs=epochs, task_idx=0)
    lrs = sched.step_lrs(0)
    assert lrs.shape == (4,)
    assert float(lrs[0]) > 0
