"""Scheduler parity: formulas must match reference core/scheduler.py."""

import math

import numpy as np

from libcontinual_tpu.core.optim import ScheduleController, make_schedule


def sc(name, kwargs, base_lr=0.1, steps=10, epochs=20, warmup=0):
    return ScheduleController(
        {"lr_scheduler": {"name": name, "kwargs": kwargs}},
        base_lr, steps, epochs, warmup=warmup,
    )


def test_cosine_schedule_reference_form():
    # reference core/scheduler.py:47-62: base * cos(99*pi*e / (200*(K-1)))
    s = sc("CosineSchedule", {"K": 20})
    for e in (0, 5, 19):
        expect = 0.1 * math.cos((99 * math.pi * e) / (200 * 19))
        assert abs(s.step_lrs(e)[0] - expect) < 1e-7


def test_cosine_schedule_k1_special_case():
    s = sc("CosineSchedule", {"K": 1})
    expect = 0.1 * math.cos((99 * math.pi * 3) / 200)
    assert abs(s.step_lrs(3)[0] - expect) < 1e-7


def test_multistep_with_warmup_shift():
    # warmup shifts milestones by warmup-1 (reference utils.py:117-126)
    s = sc("MultiStepLR", {"milestones": [10, 15], "gamma": 0.1}, warmup=3)
    assert abs(s.step_lrs(0)[0] - 0.1 / 3) < 1e-9  # linear warmup
    assert abs(s.step_lrs(1)[0] - 0.2 / 3) < 1e-9
    # epoch 2 => after-scheduler clock 0; shifted milestone = 10-2 = 8
    assert abs(s.step_lrs(2)[0] - 0.1) < 1e-9
    assert abs(s.step_lrs(2 + 8)[0] - 0.01) < 1e-9


def test_cosine_annealing_lr_torch_formula():
    s = sc("CosineAnnealingLR", {"T_max": 10})
    for e in (0, 4, 10):
        expect = 0.5 * 0.1 * (1 + math.cos(math.pi * e / 10))
        assert abs(s.step_lrs(e)[0] - expect) < 1e-9


def test_cosine_annealing_warmup_per_iteration():
    s = sc("CosineAnnealingWarmUp", {"warmup_length": 5, "T_max": 100}, steps=10)
    lrs = s.step_lrs(0)
    # first 5 iters are linear warmup
    assert abs(lrs[0] - 0.1 * 1 / 5) < 1e-7
    assert abs(lrs[4] - 0.1 * 5 / 5) < 1e-7
    # iter 5 onwards cosine on the global iteration clock
    expect = 0.1 * 0.5 * (1 + math.cos(math.pi * 5 / 100))
    assert abs(lrs[5] - expect) < 1e-7
    assert s.per_iteration


def test_patience_schedule_decay_and_stop():
    s = sc("PatienceSchedule", {"patience": 2, "factor": 10.0, "stopping_lr": 1e-3})
    assert s.step_lrs(0)[0] == 0.1
    s.observe(1.0)  # best
    s.observe(1.5)  # no improvement (1)
    s.observe(1.4)  # no improvement (2) -> decay
    assert abs(s.step_lrs(3)[0] - 0.01) < 1e-9
    s.observe(2.0)
    s.observe(2.0)  # -> decay to 1e-3
    assert not s.should_stop()  # 1e-3 not < 1e-3
    s.observe(2.0)
    s.observe(2.0)  # -> 1e-4 < stopping_lr
    assert s.should_stop()


def test_init_optimizer_selected_for_task0():
    cfg = {
        "optimizer": {"name": "SGD", "kwargs": {"lr": 0.1}},
        "init_optimizer": {"name": "Adam", "kwargs": {"lr": 0.001}},
        "lr_scheduler": {"name": "Constant"},
    }
    s0 = make_schedule(cfg, 10, 5, task_idx=0)
    s1 = make_schedule(cfg, 10, 5, task_idx=1)
    assert s0.base_lr == 0.001 and s1.base_lr == 0.1
