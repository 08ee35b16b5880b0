"""As-of join, bucketed range join, sessionization — value-level tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import timeseries as ts


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame([
        Row(k="a", ts=10.0, event="e1"),
        Row(k="a", ts=20.0, event="e2"),
        Row(k="a", ts=5.0, event="e0"),   # before any right row
        Row(k="b", ts=10.0, event="e3"),  # key with no right rows
    ])
    right = spark.createDataFrame([
        Row(k="a", ts=8.0, price=1.0),
        Row(k="a", ts=15.0, price=2.0),
    ])
    out = {r.event: r.asof_price for r in
           ts.asof_join(left, right, ["k"], "ts", ["price"]).collect()}
    assert out == {"e0": None, "e1": 1.0, "e2": 2.0, "e3": None}


def test_asof_join_tie_is_inclusive(spark):
    left = spark.createDataFrame([Row(k="a", ts=10.0, event="e")])
    right = spark.createDataFrame([Row(k="a", ts=10.0, price=9.0)])
    out = ts.asof_join(left, right, ["k"], "ts", ["price"]).first()
    assert out.asof_price == 9.0  # at-or-before includes equal timestamps


def test_range_join_bucketed_equals_naive(spark):
    import random
    random.seed(7)
    left = spark.createDataFrame(
        [Row(lid=i, lts=float(random.randint(0, 10000))) for i in range(80)])
    right = spark.createDataFrame(
        [Row(rid=i, rts=float(random.randint(0, 10000))) for i in range(80)])
    bucketed = ts.range_join_bucketed(left, right, "lts", "rts", -500, 500)
    got = sorted((r.lid, r.rid) for r in bucketed.collect())
    naive = left.crossJoin(right).where(
        (F.col("rts") >= F.col("lts") - 500) & (F.col("rts") <= F.col("lts") + 500))
    want = sorted((r.lid, r.rid) for r in naive.collect())
    assert got == want  # bucket replication reproduces exact range semantics


def test_range_join_asymmetric_window(spark):
    left = spark.createDataFrame([Row(lid=1, lts=1000.0)])
    right = spark.createDataFrame([
        Row(rid=1, rts=940.0),   # in [t-60, t]
        Row(rid=2, rts=1001.0),  # after → out
        Row(rid=3, rts=939.0),   # too old → out
    ])
    out = ts.range_join_bucketed(left, right, "lts", "rts", -60, 0).collect()
    assert [r.rid for r in out] == [1]


def test_sessionize_gap_splits(spark):
    rows = [Row(u="a", ts=t) for t in [0.0, 10.0, 20.0, 2000.0, 2010.0, 9000.0]]
    df = spark.createDataFrame(rows)
    out = ts.sessionize(df, "ts", ["u"], gap_seconds=1800)
    sess = {r.ts: r.session_id for r in out.collect()}
    assert sess == {0.0: 1, 10.0: 1, 20.0: 1, 2000.0: 2, 2010.0: 2, 9000.0: 3}


def test_sessionize_per_key_independent(spark):
    df = spark.createDataFrame([Row(u="a", ts=0.0), Row(u="b", ts=0.0),
                                Row(u="b", ts=5000.0)])
    out = ts.sessionize(df, "ts", ["u"], gap_seconds=1800)
    got = {(r.u, r.ts): r.session_id for r in out.collect()}
    assert got == {("a", 0.0): 1, ("b", 0.0): 1, ("b", 5000.0): 2}


def test_asof_join_null_field_not_resurrected(spark):
    """A matched right row whose value field is NULL must yield NULL — not a
    stale non-null value from an earlier right row (fields of one right row
    must travel together)."""
    left = spark.createDataFrame([Row(k="a", ts=25.0, event="e")])
    right = spark.createDataFrame(
        [Row(k="a", ts=10.0, price=5.0), Row(k="a", ts=20.0, price=None)],
        schema="k string, ts double, price double")
    out = ts.asof_join(left, right, ["k"], "ts", ["price", "ts"],
                       prefix="asof_").first()
    assert out.asof_price is None   # matched row ts=20 has NULL price
    assert out.asof_ts == 20.0      # and the match IS ts=20, not ts=10
