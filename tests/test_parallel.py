"""Data-parallel trainer path over the virtual 8-device CPU mesh."""

import copy

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
