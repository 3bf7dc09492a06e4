"""Degenerate constant-domain robustness (round 10).

A partition-pruned slice of a 100-TB corpus is routinely CONSTANT in
a measure column (one price-capped product, one fixed-bid campaign);
under ANSI mode an unguarded variance/range/total division then kills
the whole job with DIVIDE_BY_ZERO at runtime.  The r10 registry-wide
sweep (tools/degen_audit.py) found ten such keys; each now returns
NULL (or a degenerate-but-defined value) with the guard mirrored in
its DuckDB oracle.  This suite keeps exactly those ten crash-free on
the shared constant-domain fixture — the registry-wide version runs
via ``python tools/degen_audit.py`` (artifact DEGEN_AUDIT_r10.txt).
"""

from __future__ import annotations

import sys

import pytest

from bigdata_twitter_spark.registry import load_all_operators

SPECS = load_all_operators()

# The ten keys the r10 sweep caught, with what their degenerate
# output must look like (column -> expected NULLness on an all-42.0
# domain).  Every key must EXECUTE; the listed columns pin the
# graceful semantics so a refactor can't silently turn NULL back
# into a crash or an inf.
FIXED_KEYS = [
    "agg_stats",
    "agg_histogram",
    "embed_quantize_int8",
    "agg_regression_per_group",
    "agg_covariance_matrix",
    "agg_mann_whitney_u",
    "agg_welch_ttest",
    "agg_spearman_rank_corr",
    "sample_stratified_neyman",
    "embed_pca_power_exact",
]


@pytest.fixture(scope="module")
def degen_dir(spark, sf_dir):
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0] + "/tools")
    from degen_audit import build_degen_fixture

    return build_degen_fixture(spark, sf_dir, "/tmp/bdt_degen_sf_test")


@pytest.mark.parametrize("key", FIXED_KEYS)
def test_constant_domain_executes(spark, degen_dir, key):
    rows = SPECS[key].fn(spark, degen_dir).collect()
    assert isinstance(rows, list)  # executed; no ANSI DIVIDE_BY_ZERO


def test_constant_domain_null_semantics(spark, degen_dir):
    stats = SPECS["agg_stats"].fn(spark, degen_dir).collect()[0]
    assert stats["var_qty"] == 0.0
    assert stats["corr_qty_price"] is None

    for r in SPECS["agg_regression_per_group"].fn(
        spark, degen_dir
    ).collect():
        assert r["slope"] is None and r["r2"] is None

    mw = SPECS["agg_mann_whitney_u"].fn(spark, degen_dir).collect()[0]
    assert mw["z_stat"] is None

    wt = SPECS["agg_welch_ttest"].fn(spark, degen_dir).collect()[0]
    assert wt["t_stat"] is None and wt["welch_dof"] is None

    for r in SPECS["agg_spearman_rank_corr"].fn(
        spark, degen_dir
    ).collect():
        assert r["spearman_rho"] is None

    # histogram: one bin holding everything, lo == hi == the constant
    h = SPECS["agg_histogram"].fn(spark, degen_dir).collect()
    assert len(h) == 1 and h[0]["bin"] == 0
    assert h[0]["bin_lo"] == h[0]["bin_hi"] == 42.0

    # int8 quantization: constant vector -> all codes -128, scale 0
    q = SPECS["embed_quantize_int8"].fn(spark, degen_dir).collect()[0]
    assert q["scale"] == 0.0
    assert set(q["q_codes"].split(",")) == {"-128"}

    # Neyman: zero variance everywhere -> zero allocation, empty draw
    ney = SPECS["sample_stratified_neyman"].fn(spark, degen_dir).collect()
    assert ney == []
