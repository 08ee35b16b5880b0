"""Datetime/cyclical/vector function tests — value-level."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.functions import (
    concat_date_time,
    cosine_similarity,
    cyclical_minute_hour_day,
    dot,
    epoch_seconds,
    l2_norm,
    seconds_to_days_minutes_seconds,
    synthetic_datetime,
    vectorize,
    with_derived_columns,
)


def test_concat_and_epoch(spark):
    df = spark.createDataFrame([Row(date_block="2016-02-01", time_block="00:30:00")])
    out = (df.withColumn("datetimestamp", concat_date_time("date_block", "time_block"))
             .withColumn("s", epoch_seconds("datetimestamp")))
    r = out.first()
    assert r.datetimestamp == "2016-02-01 00:30:00"
    assert r.s == 1454286600.0  # float64 epoch (reference dtype rule)
    assert dict(out.dtypes)["s"] == "double"


def test_with_derived_columns_dispatcher(spark):
    df = spark.createDataFrame([Row(date_block="2023-01-01", time_block="12:00:00")])
    out = with_derived_columns(df, ["datetimestamp", "datetimestampseconds"],
                               {"date": "date_block", "time": "time_block"})
    assert out.first().datetimestampseconds == 1672574400.0
    with pytest.raises(ValueError):
        with_derived_columns(df, ["unsupported_col"], {})


def test_cyclical_exact_pi(spark):
    # s = 15 s → quarter minute: sin=1, cos≈0 with EXACT π (the reference
    # hard-codes 3.14 — Appendix A.1 divergence, deliberately not replicated)
    df = spark.createDataFrame([Row(s=15.0)])
    r = df.select(*cyclical_minute_hour_day("s")).first()
    assert r.sin_minute == pytest.approx(1.0, abs=1e-12)
    assert r.cos_minute == pytest.approx(0.0, abs=1e-12)
    assert r.sin_day == pytest.approx(math.sin(15 * 2 * math.pi / 86400), abs=1e-15)


def test_seconds_decomposition(spark):
    df = spark.createDataFrame([Row(s=90061.0)])  # 1 day 1 min 1 s + 1 h
    r = df.select(*seconds_to_days_minutes_seconds("s")).first()
    assert (r.days, r.minutes, r.seconds) == (1, 61, 1.0)


def test_synthetic_datetime_even_spacing(spark):
    df = spark.range(5).withColumnRenamed("id", "i")
    out = synthetic_datetime(df, order_by="i", step_seconds=2)
    secs = [r.datetime.second for r in out.orderBy("i").collect()]
    assert secs == [0, 2, 4, 6, 8]


def test_vector_math(spark):
    df = spark.createDataFrame([Row(a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])])
    r = df.select(dot("a", "b").alias("d"), l2_norm("a").alias("n"),
                  cosine_similarity("a", "b").alias("c"),
                  cosine_similarity("a", "a").alias("self")).first()
    assert r.d == 32.0
    assert r.n == pytest.approx(math.sqrt(14))
    assert r.c == pytest.approx(32 / (math.sqrt(14) * math.sqrt(77)))
    assert r.self == pytest.approx(1.0)


def test_cosine_null_safe_on_zero_norm(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 1.0])])
    assert df.select(cosine_similarity("a", "b").alias("c")).first().c is None


def test_vectorize_packs_named_columns(spark):
    df = spark.createDataFrame([Row(x=1, y=2.5)])
    r = df.select(vectorize(["x", "y"]).alias("vec")).first()
    assert r.vec == [1.0, 2.5]


def test_epoch_seconds_keeps_subsecond_fraction(spark):
    df = spark.createDataFrame([Row(s="2023-01-01 00:00:00.500")])
    r = df.select(epoch_seconds("s").alias("e")).first()
    assert r.e == 1672531200.5  # unix_timestamp would truncate to .0


def test_stats_profile_matches_numpy(spark):
    """q66's decimal-moment closed forms are real population statistics:
    cross-check covar_pop / stddev_pop / corr against numpy on a fixture
    (the DuckDB oracle only proves engine agreement, not that the formula
    is correlation)."""
    import numpy as np

    from powerdatapipeline_spark.queries import REGISTRY

    rng = np.random.default_rng(3)
    x = rng.uniform(1, 50, 200).round(2)
    y = (3.0 * x + rng.normal(0, 5, 200)).round(2)
    # full lineitem schema: the registry loader validates fixture columns
    # (TABLE_COLUMNS), so a projected fixture would be rejected as drift
    df = spark.createDataFrame(
        [(i, 1, 1, 1, float(a), float(b), 0.0, 0.0, "A", "O",
          "1995-01-01 00:00:00")
         for i, (a, b) in enumerate(zip(x, y))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string").withColumn(
            "l_shipdate", F.col("l_shipdate").cast("timestamp"))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = REGISTRY["q66_stats_profile"][0](spark, d).collect()[0]
    assert out.n_rows == 200
    assert abs(out.covar_pop - np.cov(x, y, bias=True)[0][1]) < 1e-4
    assert abs(out.stddev_pop_qty - x.std()) < 1e-4
    assert abs(out.stddev_pop_price - y.std()) < 1e-4
    assert abs(out.corr_qty_price - np.corrcoef(x, y)[0][1]) < 1e-6
