"""Native C++ host runtime vs NumPy reference implementations."""

import numpy as np
import pytest

from ppcseq_tpu import _native
from ppcseq_tpu.norm.tmm import tmm_norm_factors

needs_native = pytest.mark.skipif(
    not _native.available(), reason="native library not built (make -C native)"
)


@needs_native
def test_pivot_counts_matches_numpy():
    rng = np.random.default_rng(0)
    S, G = 13, 57
    s = np.repeat(np.arange(S), G)
    g = np.tile(np.arange(G), S)
    v = rng.integers(0, 1000, size=S * G)
    got = _native.pivot_counts(s, g, v, S, G)
    want = np.zeros((S, G), dtype=np.int64)
    want[s, g] = v
    np.testing.assert_array_equal(got, want)


@needs_native
def test_native_tmm_matches_numpy():
    rng = np.random.default_rng(1)
    lam = rng.gamma(2.0, 50.0, size=800)
    counts = np.column_stack([rng.poisson(lam * d) for d in (1.0, 2.5, 0.7, 1.4)]).astype(float)
    f_native = tmm_norm_factors(counts, ref_column=0, use_native=True)
    f_numpy = tmm_norm_factors(counts, ref_column=0, use_native=False)
    np.testing.assert_allclose(f_native, f_numpy, rtol=1e-12)


@needs_native
def test_quantile7_matches_r():
    import ctypes

    lib = _native._load()
    x = np.arange(1.0, 11.0)
    # R: quantile(1:10, .1, type=7) == 1.9
    got = lib.quantile7_sorted(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 10, 0.1)
    assert np.isclose(got, 1.9)
