"""Golden-value tests of the CL loss zoo (SURVEY.md §4 / VERDICT r1 #9):
hand-derived constants and independent numpy derivations — no reference
import, no reuse of the library's jax code in the expectations."""

import math

import jax.numpy as jnp
import numpy as np

from libcontinual_tpu.methods.common import kd_loss
from libcontinual_tpu.methods.ewc import ewc_penalty
from libcontinual_tpu.methods.lucir import margin_ranking
from libcontinual_tpu.methods.ocm import nt_xent, nt_xent_pre


def test_kd_loss_T2_masked_hand_value():
    """One sample, classes {0,1} active + class 2 masked, T=2.
    p=[2,0], s=[0,2]: soft = softmax([0,1]) = [1,e]/(1+e);
    logp = log_softmax([1,0]); per = -(s·logp)."""
    pred = jnp.asarray([[2.0, 0.0, 50.0]])  # junk in the masked slot
    soft = jnp.asarray([[0.0, 2.0, -50.0]])
    mask = jnp.asarray([1.0, 1.0, 0.0])
    e = math.e
    s = np.array([1 / (1 + e), e / (1 + e)])
    logp = np.array([1.0, 0.0]) - math.log(e + 1.0)
    expect = float(-(s * logp).sum())
    got = float(kd_loss(pred, soft, T=2.0, class_mask=mask))
    assert abs(got - expect) < 1e-4
    # the masked class must have zero influence
    pred2 = pred.at[0, 2].set(-7.0)
    assert abs(float(kd_loss(pred2, soft, T=2.0, class_mask=mask)) - got) < 1e-5


def test_ewc_penalty_hand_value():
    fisher = {"a": jnp.asarray(2.0), "b": jnp.asarray([1.0, 3.0])}
    params = {"a": jnp.asarray(1.5), "b": jnp.asarray([2.0, -1.0])}
    ref = {"a": jnp.asarray(0.5), "b": jnp.asarray([0.0, 0.0])}
    # 1/2 * (2*1^2 + 1*2^2 + 3*1^2) = 4.5
    assert abs(float(ewc_penalty(fisher, params, ref)) - 4.5) < 1e-6


def test_lucir_margin_ranking_hand_value():
    """4 seen classes, first 2 old; K=1, dist=0.5. Sample 0 (old, gt=0.6,
    best novel 0.3) violates by 0.2; sample 1 is new-class -> excluded."""
    scores = jnp.asarray([[0.6, 0.1, 0.3, 0.2],
                          [0.0, 0.0, 0.9, 0.1]])
    labels = jnp.asarray([0, 3])
    prev = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    seen = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    got = float(margin_ranking(scores, labels, prev, seen, K=1, dist=0.5))
    assert abs(got - 0.2) < 1e-6
    # K=2: violations 0.5-(0.6-0.3)=0.2 and 0.5-(0.6-0.2)=0.1, /(1*2)
    got2 = float(margin_ranking(scores, labels, prev, seen, K=2, dist=0.5))
    assert abs(got2 - 0.15) < 1e-6


def _np_nt_logm(sim, t, exclude_diag, eps=1e-8):
    sim = sim - sim.max(axis=1, keepdims=True)
    e = np.exp(sim / t)
    if exclude_diag:
        e = e * (1 - np.eye(len(sim)))
    return -np.log(e / (e.sum(axis=1, keepdims=True) + eps) + eps)


def _np_label_mask(labels1):
    m = (labels1[:, None] == labels1[None, :]).astype(np.float64)
    return m / (m.sum(axis=1, keepdims=True) + 1e-8)


def test_nt_xent_n_matches_independent_numpy():
    """Supervised NT-Xent 'n' (reference ocm.py:738-759): diagonal-excluded
    softmax, doubled label-mask sum + aug-pair positive diagonals."""
    rng = np.random.RandomState(0)
    b = 4
    sim = rng.randn(2 * b, 2 * b)
    labels = rng.randint(0, 3, b)
    l1 = np.concatenate([labels, labels])
    logm = _np_nt_logm(sim, 0.07, exclude_diag=True)
    mask = _np_label_mask(l1)
    expect = 2 * (mask * logm).sum() / (2 * b) + (
        np.diag(logm[:b, b:]).sum() + np.diag(logm[b:, :b]).sum()
    ) / (2 * b)
    got = float(nt_xent(jnp.asarray(sim), jnp.asarray(labels), 0.07, mode="n"))
    assert abs(got - expect) / abs(expect) < 1e-4


def test_nt_xent_uni_matches_independent_numpy():
    """'uni' (ocm.py:762-780) keeps the diagonal and has NO factor 2 and NO
    positive term — the round-1 implementation got both wrong."""
    rng = np.random.RandomState(1)
    b = 4
    sim = rng.randn(2 * b, 2 * b)
    labels = rng.randint(0, 3, b)
    l1 = np.concatenate([labels, labels])
    logm = _np_nt_logm(sim, 0.07, exclude_diag=False)
    expect = (_np_label_mask(l1) * logm).sum() / (2 * b)
    got = float(nt_xent(jnp.asarray(sim), jnp.asarray(labels), 0.07, mode="uni"))
    assert abs(got - expect) / abs(expect) < 1e-4


def test_nt_xent_pre_matches_independent_numpy():
    """'pre' (ocm.py:787-811): label-masked with UNREPEATED labels,
    diagonal kept."""
    rng = np.random.RandomState(2)
    n = 6
    sim = rng.randn(n, n)
    labels = rng.randint(0, 3, n)
    logm = _np_nt_logm(sim, 0.07, exclude_diag=False)
    expect = (_np_label_mask(labels) * logm).sum() / (2 * (n // 2))
    got = float(nt_xent_pre(jnp.asarray(sim), jnp.asarray(labels), 0.07))
    assert abs(got - expect) / abs(expect) < 1e-4
