"""TMM normalization (edgeR calcNormFactors/filterByExpr semantics from scratch)."""

import numpy as np
import pandas as pd

from ppcseq_tpu.norm.tmm import (
    _calc_factor_tmm,
    _rank_average,
    filter_by_expr,
    sample_scaling,
    tmm_norm_factors,
)


def test_rank_average_matches_r():
    x = np.array([3.0, 1.0, 2.0, 3.0])
    # R: rank(c(3,1,2,3)) == c(3.5, 1, 2, 3.5)
    np.testing.assert_array_equal(_rank_average(x), [3.5, 1.0, 2.0, 3.5])


def test_tmm_identical_columns_give_unity():
    rng = np.random.default_rng(0)
    col = rng.poisson(50, size=500)
    counts = np.column_stack([col, col, col])
    f = tmm_norm_factors(counts, ref_column=0)
    np.testing.assert_allclose(f, 1.0, atol=1e-12)


def test_tmm_pure_depth_difference_gives_unity_factors():
    # Doubling sequencing depth changes lib size, not composition:
    # TMM factors stay 1 (the M-values are all ~0 after lib-size scaling).
    rng = np.random.default_rng(1)
    base = rng.poisson(100, size=2000).astype(float)
    counts = np.column_stack([base, base * 2, base * 4])
    f = tmm_norm_factors(counts, ref_column=0)
    np.testing.assert_allclose(f, 1.0, atol=1e-9)


def test_tmm_composition_bias_detected():
    # Sample 2 has a handful of hugely expressed genes: its other genes look
    # under-sampled, so TMM should assign it a factor < ~1 relative to ref...
    # direction: the trimmed mean of M removes the outliers; remaining genes
    # in sample 2 have lower proportion -> logR = log2(p2/p1) < 0 -> f < 1.
    rng = np.random.default_rng(2)
    lam = rng.gamma(2.0, 50.0, size=1000)
    base = rng.poisson(lam).astype(float)
    spiked = rng.poisson(lam).astype(float)
    spiked[:5] = 1e6
    counts = np.column_stack([base, spiked])
    f = tmm_norm_factors(counts, ref_column=0)
    assert f[1] / f[0] < 0.9
    # factors multiply to one
    np.testing.assert_allclose(np.prod(f), 1.0, rtol=1e-12)


def test_calc_factor_tmm_weighted_trimming():
    # Hand-computable tiny case sanity: equal columns -> 1
    obs = np.array([10.0, 20.0, 30.0, 40.0])
    assert _calc_factor_tmm(obs, obs) == 1.0


def test_filter_by_expr_basic():
    rng = np.random.default_rng(3)
    high = rng.poisson(100, size=(50, 21))
    low = rng.poisson(0.2, size=(30, 21))
    counts = np.vstack([high, low])
    keep = filter_by_expr(counts)
    assert keep[:50].all()
    assert not keep[50:].any()


def test_sample_scaling_on_counts_subset(counts_df):
    from ppcseq_tpu.data.ingest import format_input

    df = counts_df.assign(is_significant=counts_df.symbol.isin(["SLC16A12", "CYP1A1", "ART3"]))
    my_df = format_input(df, "~ Label", "sample", "symbol", "value", "is_significant", "PValue", 50)
    scal = sample_scaling(my_df, "sample", "symbol", "value")
    assert len(scal) == 21
    assert np.isfinite(scal.multiplier).all()
    # multiplier of the reference sample is ~1 (tot_ref/(tot_ref*nf_ref))
    med = my_df.groupby("sample")["value"].median()
    ref = (med.max() - med).abs().idxmin()
    ref_mult = scal.loc[scal["sample"] == ref, "multiplier"].iloc[0]
    assert 0.8 < ref_mult < 1.25
    # exposure_rate = -log(multiplier) (reference R/methods.R:236)
    np.testing.assert_allclose(scal.exposure_rate, -np.log(scal.multiplier), rtol=1e-12)
