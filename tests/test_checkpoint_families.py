"""Per-family checkpoint resume-EQUALITY: train 2 tasks straight vs save at
the task-0 boundary, resume, train task 1 — the final acc tables must match.

This is the strong form of resume testing: it catches any method host state
missing from ``host_state_attrs``/DEFAULT_HOST_ATTRS (such state silently
resets to __init__ values on resume and changes task-1 training), which a
restore-only test cannot see. One method per family: rehearsal (ICarl),
GPM (host feature lists), prompt (L2P), masked-LoRA (MInfLoRA2,
``_feature_each_task``), CLIP (MoE-Adapter4CL), online (OCM, ``_cur_task``).
"""

import copy
import os
import shutil

import numpy as np
import pytest

from libcontinual_tpu.core.trainer import Trainer


def _base(tiny_config, tmp_path, name):
    cfg = copy.deepcopy(tiny_config)
    cfg["epoch"] = 2
    cfg["checkpoint"] = {"enable": True, "dir": str(tmp_path / f"ck_{name}")}
    return cfg


def _families(tiny_config, tmp_path):
    fam = {}

    cfg = _base(tiny_config, tmp_path, "icarl")
    cfg["classifier"] = {
        "name": "ICarl",
        "kwargs": {"num_class": 8, "feat_dim": 32, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2},
    }
    cfg["buffer"] = {"name": "LinearBuffer",
                     "kwargs": {"buffer_size": 32, "batch_size": 16,
                                "strategy": "herding"}}
    fam["icarl"] = cfg

    cfg = _base(tiny_config, tmp_path, "gpm")
    cfg["backbone"] = {"name": "AlexNet_TRGP", "kwargs": {}}
    cfg["classifier"] = {
        "name": "GPM",
        "kwargs": {"num_class": 8, "feat_dim": 2048, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2},
    }
    cfg["setting"] = "task-aware"
    cfg["batch_size"] = 16
    fam["gpm"] = cfg

    cfg = _base(tiny_config, tmp_path, "l2p")
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "L2P",
        "kwargs": {"num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2,
                   "prompt_pool": 4, "prompt_length": 2, "top_k": 2},
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    fam["l2p"] = cfg

    cfg = _base(tiny_config, tmp_path, "minflora2")
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "MInfLoRA2",
        "kwargs": {"num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, "rank": 2},
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    fam["minflora2"] = cfg

    cfg = _base(tiny_config, tmp_path, "clip")
    cfg["backbone"] = {"name": "clip_tiny_test", "kwargs": {"moe_experts": 2}}
    cfg["classifier"] = {
        "name": "MOE_ADAPTER4CL",
        "kwargs": {"num_class": 8, "feat_dim": 32, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2},
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.005}}
    fam["clip"] = cfg

    cfg = _base(tiny_config, tmp_path, "cl_lora")
    cfg["backbone"] = {"name": "vit_tiny_test", "kwargs": {}}
    cfg["classifier"] = {
        "name": "CL_LoRA",
        "kwargs": {"num_class": 8, "feat_dim": 64, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2, "rank": 2},
    }
    cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 0.01}}
    fam["cl_lora"] = cfg

    cfg = _base(tiny_config, tmp_path, "ocm")
    cfg["classifier"] = {
        "name": "OCM",
        "kwargs": {"num_class": 8, "feat_dim": 32, "init_cls_num": 4,
                   "inc_cls_num": 4, "task_num": 2,
                   "buffer_batch_size": 16},
    }
    cfg["buffer"] = {"name": "OnlineBuffer", "kwargs": {"buffer_size": 64}}
    cfg["batch_size"] = 16
    cfg["epoch"] = 1
    fam["ocm"] = cfg

    return fam


@pytest.mark.parametrize(
    "family", ["icarl", "gpm", "l2p", "minflora2", "clip", "cl_lora", "ocm"])
def test_resume_equality(tiny_config, tmp_path, family):
    cfg = _families(tiny_config, tmp_path)[family]
    tr = Trainer(cfg)
    res = tr.train_loop()

    # interrupt: keep only the task-0 checkpoint, resume, re-train task 1
    ckdir = cfg["checkpoint"]["dir"]
    shutil.rmtree(os.path.join(ckdir, "task_001"))
    tr2 = Trainer(cfg)
    assert tr2._resume_from == 0
    res2 = tr2.train_loop()

    np.testing.assert_allclose(
        res2["acc_table"], res["acc_table"], atol=1e-3,
        err_msg=f"{family}: resumed task-1 training diverged from straight run"
    )
