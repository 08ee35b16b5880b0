"""Per-group OLS: native decimal-moment aggregate vs hand computation vs the
applyInPandas twin."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import stats as st


def _fixture(spark):
    rows = [
        # group "a": exactly y = 2x + 1 → slope 2, intercept 1, r 1
        *[Row(g="a", x=float(i), y=2.0 * i + 1.0) for i in range(10)],
        # group "b": noisy-ish but deterministic, negative trend
        *[Row(g="b", x=float(i), y=10.0 - i + (0.5 if i % 2 else -0.5))
          for i in range(8)],
        # group "c": constant x → degenerate (NULL fit)
        *[Row(g="c", x=3.0, y=float(i)) for i in range(5)],
    ]
    return spark.createDataFrame(rows)


def _ols_reference(pts):
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov_n = n * sxy - sx * sy
    slope = cov_n / var_x
    return (round(slope, 6), round((sy - slope * sx) / n, 6),
            round(cov_n / math.sqrt(var_x * var_y), 6))


def test_grouped_ols_exact_and_degenerate(spark):
    out = {r.g: r for r in st.grouped_ols(
        _fixture(spark), ["g"], "x", "y").collect()}
    assert (out["a"].slope, out["a"].intercept, out["a"].r) == (2.0, 1.0, 1.0)
    pts_b = [(float(i), 10.0 - i + (0.5 if i % 2 else -0.5)) for i in range(8)]
    assert (out["b"].slope, out["b"].intercept, out["b"].r) == _ols_reference(pts_b)
    assert out["b"].slope < 0
    # constant x: no fit, never ±inf
    assert out["c"].slope is None and out["c"].intercept is None and out["c"].r is None
    assert out["c"].n == 5


def test_grouped_ols_pandas_matches_native(spark, sf_dir):
    """The applyInPandas twin (float64 accumulation) agrees with the exact
    decimal aggregate to well under the 6-dp rounding on real data."""
    from powerdatapipeline_spark.queries import load_events
    from pyspark.sql import functions as F

    ev = load_events(spark, sf_dir).select(
        "event_type",
        ((F.col("ts").cast("double") - 1700000000.0) / 86400.0).alias("t"),
        "value")
    native = {r.event_type: r for r in
              st.grouped_ols(ev, ["event_type"], "t", "value").collect()}
    pandas_ = {r.event_type: r for r in
               st.grouped_ols_pandas(ev, ["event_type"], "t", "value").collect()}
    assert set(native) == set(pandas_) and len(native) >= 2
    for k in native:
        assert native[k].n == pandas_[k].n
        for f in ("slope", "intercept", "r"):
            a, b = getattr(native[k], f), getattr(pandas_[k], f)
            assert a == pytest.approx(b, abs=2e-6), (k, f, a, b)


def test_grouped_ols_pandas_preserves_key_types(spark):
    """Non-string group keys keep their input dtype, so the twin outputs
    stay joinable on the key."""
    df = spark.createDataFrame(
        [Row(k=7, x=float(i), y=2.0 * i) for i in range(5)]
        + [Row(k=9, x=float(i), y=-1.0 * i + 4.0) for i in range(5)])
    out = st.grouped_ols_pandas(df, ["k"], "x", "y")
    assert dict(out.dtypes)["k"] == "bigint"
    joined = st.grouped_ols(df, ["k"], "x", "y").select("k", "slope") \
        .join(out.select("k", F.col("slope").alias("slope_p")), "k")
    rows = joined.collect()
    assert len(rows) == 2
    assert all(abs(r.slope - r.slope_p) < 1e-9 for r in rows)


def test_histogram_bins_and_edges(spark):
    """Bin boundaries: [lo+i·w, lo+(i+1)·w), top edge clamped into the last
    bin, out-of-range rows dropped; counts per (group, bin) are exact."""
    from powerdatapipeline_spark.operators.stats import histogram
    rows = [Row(g="x", v=0.0), Row(g="x", v=4.99), Row(g="x", v=5.0),
            Row(g="x", v=10.0),          # == hi → clamped into last bin
            Row(g="y", v=7.5), Row(g="y", v=-0.1), Row(g="y", v=10.01)]
    out = histogram(spark.createDataFrame(rows), "v", 0.0, 10.0, 2,
                    keys=["g"]).collect()
    got = {(r.g, r.bin): (r.bin_lo, r.bin_hi, r.n) for r in out}
    assert got == {("x", 0): (0.0, 5.0, 2),
                   ("x", 1): (5.0, 10.0, 2),
                   ("y", 1): (5.0, 10.0, 1)}
    with pytest.raises(ValueError, match="nbins"):
        histogram(spark.createDataFrame(rows), "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        histogram(spark.createDataFrame(rows), "v", 10.0, 0.0, 2)
