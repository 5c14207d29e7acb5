import numpy as np

from libcontinual_tpu.core.metrics import compute_bwt, compute_frgt


def test_frgt_matches_reference_formula():
    acc = np.zeros((3, 3))
    acc[0, 0] = 80.0
    acc[1, :2] = [70.0, 75.0]
    curr = np.array([60.0, 65.0, 72.0])
    # task_idx=2: sum(diag[:1] - curr[:3][:-2]) / 2 = (80-60)/2
    assert compute_frgt(acc, curr, 2) == 10.0
    assert compute_frgt(acc, curr, 1) == 0.0


def test_bwt_matches_reference_formula():
    acc = np.zeros((3, 3))
    acc[0, 0] = 80.0
    acc[1, :2] = [70.0, 75.0]
    curr = np.array([60.0, 65.0, 72.0])
    # task_idx=2: ((curr[0]-acc[0,0]) * 2) / (2*3) -- no i-loop terms at T=2
    expected = ((60.0 - 80.0) * 2) / 6
    assert abs(compute_bwt(acc, curr, 2) - expected) < 1e-9
    assert compute_bwt(acc, curr, 1) == 0.0
