"""Unit tests for the round-8g operators: classical seasonal
decomposition, Jensen-Shannon divergence matrix, classification report,
Benford first-digit audit, l-diversity audit. Registry twins q174-q178
are strict-oracle-pinned by test_tail_query_parity at sf0.001 + sf0.01."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import text as tx
from powerdatapipeline_spark.operators import timeseries as ts


# --------------------------------------------------------------------------
# seasonal_decompose_profile
# --------------------------------------------------------------------------

def _hourly_df(spark, values):
    rows = [Row(ts=float(i * 3600), value=float(v))
            for i, v in enumerate(values)]
    return (spark.createDataFrame(rows)
            .select(F.col("ts").cast("timestamp").alias("ts"), "value"))


def test_seasonal_decompose_removes_linear_trend(spark):
    # pure linear trend + period-4 seasonal; after CMA detrending the
    # per-phase detrended means must recover the seasonal shape (up to
    # a common constant), NOT the trend
    period = 4
    seasonal = [2.0, -1.0, -3.0, 2.0]
    values = [0.5 * t + seasonal[t % period] for t in range(40)]
    out = {r["phase"]: r for r in ts.seasonal_decompose_profile(
        _hourly_df(spark, values), period=period,
        bucket_seconds=3600).collect()}
    assert set(out) == {0, 1, 2, 3}
    means = {ph: out[ph]["sum_detrended"] / out[ph]["n"] for ph in out}
    center = sum(means.values()) / 4
    for ph in range(4):
        assert means[ph] - center == pytest.approx(
            seasonal[ph] - sum(seasonal) / 4, abs=1e-4)


def test_seasonal_decompose_edge_rows_dropped(spark):
    # n buckets, window period+1: first and last period/2 buckets have
    # no full window, so total detrended observations = n - period
    values = [float(i % 3) for i in range(20)]
    out = ts.seasonal_decompose_profile(_hourly_df(spark, values),
                                        period=4).collect()
    assert sum(r["n"] for r in out) == 20 - 4


def test_seasonal_decompose_gap_blocks_window(spark):
    # a missing bucket kills every window that needs it (no averaging
    # over holes): drop bucket 10 of 0..20 -> windows centered at
    # 8..12 all lose a contributor (m < 5) and vanish
    rows = [Row(ts=float(i * 3600), value=1.0)
            for i in range(21) if i != 10]
    df = (spark.createDataFrame(rows)
          .select(F.col("ts").cast("timestamp").alias("ts"), "value"))
    out = ts.seasonal_decompose_profile(df, period=4).collect()
    # full grid keeps t in 2..18 (17 windows); the gap at 10 kills the
    # five windows t in 8..12 -> 12 detrended observations remain
    assert sum(r["n"] for r in out) == 12


def test_seasonal_decompose_period_guard(spark):
    df = _hourly_df(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="even"):
        ts.seasonal_decompose_profile(df, period=5)
    with pytest.raises(ValueError, match="even"):
        ts.seasonal_decompose_profile(df, period=0)


# --------------------------------------------------------------------------
# js_divergence_matrix
# --------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(rows)])


def _py_jsd(pa, pb):
    # reference JSD in bits over explicit distributions
    words = set(pa) | set(pb)
    jsd = 0.0
    for w in words:
        p, q = pa.get(w, 0.0), pb.get(w, 0.0)
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    return jsd


def test_jsd_identical_sources_zero(spark):
    df = _docs(spark, [("a", "x y z x"), ("b", "x y z x")])
    r = tx.js_divergence_matrix(df).collect()[0]
    assert r["jsd_bits"] == pytest.approx(0.0, abs=1e-5)
    assert r["n_common"] == 3


def test_jsd_disjoint_sources_one_bit(spark):
    df = _docs(spark, [("a", "x y x y"), ("b", "u v u v")])
    r = tx.js_divergence_matrix(df).collect()[0]
    assert r["n_common"] == 0
    assert r["jsd_bits"] == pytest.approx(1.0, abs=1e-5)


def test_jsd_matches_reference_formula(spark):
    df = _docs(spark, [("a", "x x x y"), ("b", "x y y z")])
    r = tx.js_divergence_matrix(df).collect()[0]
    pa = {"x": 0.75, "y": 0.25}
    pb = {"x": 0.25, "y": 0.5, "z": 0.25}
    assert r["jsd_bits"] == pytest.approx(_py_jsd(pa, pb), abs=1e-4)


def test_jsd_frequency_shift_visible(spark):
    # identical vocabulary, shifted frequencies: Jaccard of vocab = 1
    # but JSD > 0 — the case the set measure cannot see
    df = _docs(spark, [("a", "x x x x x x x x x y"),
                       ("b", "x y y y y y y y y y")])
    r = tx.js_divergence_matrix(df).collect()[0]
    assert r["n_common"] == 2 and r["jsd_bits"] > 0.3


# --------------------------------------------------------------------------
# classification_report
# --------------------------------------------------------------------------

def _preds(spark, pairs):
    return spark.createDataFrame([Row(t=t, p=p) for t, p in pairs])


def test_report_perfect_classifier(spark):
    df = _preds(spark, [("a", "a")] * 5 + [("b", "b")] * 3)
    out = {r["cls"]: r for r in
           st.classification_report(df, "t", "p").collect()}
    for cls in ("a", "b"):
        assert out[cls]["precision"] == 1.0
        assert out[cls]["recall"] == 1.0
        assert out[cls]["f1"] == 1.0


def test_report_hand_computed(spark):
    # class a: tp=2, fp=1 (b->a), fn=1 (a->b)
    df = _preds(spark, [("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"),
                        ("b", "b")])
    out = {r["cls"]: r for r in
           st.classification_report(df, "t", "p").collect()}
    a = out["a"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (3, 3, 2)
    assert a["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["f1"] == pytest.approx(2 / 3, abs=1e-6)


def test_report_never_predicted_class_null_precision(spark):
    df = _preds(spark, [("a", "b"), ("a", "b"), ("b", "b")])
    out = {r["cls"]: r for r in
           st.classification_report(df, "t", "p").collect()}
    assert out["a"]["n_pred"] == 0
    assert out["a"]["precision"] is None and out["a"]["f1"] is None
    assert out["a"]["recall"] == 0.0


def test_report_pred_only_class_gets_row(spark):
    df = _preds(spark, [("a", "c"), ("a", "a")])
    out = {r["cls"]: r for r in
           st.classification_report(df, "t", "p").collect()}
    assert out["c"]["n_true"] == 0 and out["c"]["recall"] is None
    assert out["c"]["precision"] == 0.0


# --------------------------------------------------------------------------
# benford_audit
# --------------------------------------------------------------------------

def test_benford_digit_extraction_and_shares(spark):
    rows = [Row(v=123.45), Row(v=19.99), Row(v=987.0), Row(v=1000.0),
            Row(v=-5.0), Row(v=0.0)]
    out = {r["digit"]: r for r in
           st.benford_audit(spark.createDataFrame(rows), "v").collect()}
    # negatives and zeros excluded; digits: 1 (123.45), 1 (19.99),
    # 9 (987.0), 1 (1000.0)
    assert out[1]["n"] == 3 and out[9]["n"] == 1
    assert out[1]["total"] == 4
    assert out[1]["share"] == 0.75
    assert out[1]["expected_p"] == pytest.approx(math.log10(2), abs=1e-6)


def test_benford_conforming_sample_low_chi2(spark):
    # exact Benford frequencies over 1000 values -> tiny chi-square
    import itertools
    rows = []
    n = 0
    for d in range(1, 10):
        cnt = round(1000 * math.log10(1 + 1 / d))
        rows += [Row(v=float(d) * 10 + 1.0)] * cnt
        n += cnt
    out = st.benford_audit(spark.createDataFrame(rows), "v").collect()
    chi2 = sum(r["chi2_term"] for r in out)
    assert chi2 < 1.0


def test_benford_uniform_digits_high_chi2(spark):
    rows = [Row(v=float(d) * 100.0) for d in range(1, 10) for _ in range(50)]
    out = st.benford_audit(spark.createDataFrame(rows), "v").collect()
    chi2 = sum(r["chi2_term"] for r in out)
    assert chi2 > 50.0


# --------------------------------------------------------------------------
# l_diversity_audit
# --------------------------------------------------------------------------

def test_l_diversity_flags_homogeneous_group(spark):
    rows = ([Row(q="g1", s="hiv") for _ in range(10)]          # k-safe, l-unsafe
            + [Row(q="g2", s=v) for v in ("a", "b", "c", "d")])
    r = st.l_diversity_audit(spark.createDataFrame(rows), ["q"], "s",
                             l=3).collect()[0]
    assert r["n_groups"] == 2
    assert r["n_low_diversity_groups"] == 1
    assert r["n_rows_at_risk"] == 10
    assert r["min_distinct_sensitive"] == 1
    assert r["l_diverse"] is False


def test_l_diversity_passes_diverse_release(spark):
    rows = [Row(q=f"g{i % 2}", s=str(j % 4)) for i in range(2)
            for j in range(8)]
    r = st.l_diversity_audit(spark.createDataFrame(rows), ["q"], "s",
                             l=3).collect()[0]
    assert r["l_diverse"] is True and r["n_rows_at_risk"] == 0


def test_l_diversity_guards(spark):
    df = spark.createDataFrame([Row(q="g", s="v")])
    with pytest.raises(ValueError, match="l must"):
        st.l_diversity_audit(df, ["q"], "s", l=1)
    with pytest.raises(ValueError, match="quasi"):
        st.l_diversity_audit(df, [], "s", l=3)
