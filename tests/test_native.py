"""C++ host data engine: every C-ABI entry point vs its numpy fallback.
Skips when libhostdata.so hasn't been built (`make native`)."""

import numpy as np
import pytest

from libcontinual_tpu.data import native

needs_lib = pytest.mark.skipif(
    not native.available(), reason="libhostdata.so not built (make native)"
)


@needs_lib
def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (64, 8, 8, 3), np.uint8)
    idx = rng.randint(0, 64, (200,))
    assert (native.gather_rows(src, idx) == src[idx]).all()


@needs_lib
def test_concat_rows_matches_numpy():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 255, (10, 4, 4, 3), np.uint8)
    b = rng.randint(0, 255, (7, 4, 4, 3), np.uint8)
    assert (native.concat_rows(a, b) == np.concatenate([a, b])).all()


@needs_lib
def test_shuffled_indices_is_permutation_and_deterministic():
    out = native.shuffled_indices(1000, seed=42)
    assert sorted(out.tolist()) == list(range(1000))
    assert (out == native.shuffled_indices(1000, seed=42)).all()
    assert (out != native.shuffled_indices(1000, seed=43)).any()


def test_gather_rows_fallback_on_noncontiguous():
    # non-contiguous input must take the numpy path, same result
    src = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)[:, ::2]
    idx = np.asarray([2, 0, 3])
    assert (native.gather_rows(src, idx) == src[idx]).all()


@needs_lib
def test_gather_rows_negative_and_bounds():
    """The C memcpy loop has no bounds checks, so the wrapper must resolve
    numpy-style negative indices and refuse out-of-range ones (the fallback
    raises IndexError; UB on the native path would silently corrupt data)."""
    rng = np.random.RandomState(5)
    n = 600  # > 1 MB total so the call takes the native path, not the
    # small-job numpy fallback
    src = rng.randint(0, 255, (n, 32, 32, 3), np.uint8)
    idx = np.r_[np.arange(-n, 0), np.arange(n)][::2]
    assert (native.gather_rows(src, idx) == src[idx]).all()
    for bad in ([n], [-n - 1]):
        big_bad = np.r_[np.zeros(n, np.int64), bad]
        with pytest.raises(IndexError):
            native.gather_rows(src, big_bad)


@needs_lib
def test_shuffle_fallback_matches_native_stream():
    """Seed-exact reproducibility across environments: the python fallback
    must produce the SAME permutation as the C++ engine, so a seeded run's
    batch order doesn't depend on whether libhostdata.so is built."""
    for n, seed in ((1, 0), (17, 0), (1000, 7), (1000, 8), (4096, 123456789)):
        assert (native.shuffled_indices(n, seed)
                == native._xorshift_permutation(n, seed)).all()
