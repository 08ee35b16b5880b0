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


# ------------------------------------------------- SCD2 merge (round 8)

def _scd2_fixtures(spark):
    from pyspark.sql import types as T
    dim_schema = ("k long, city string, tier long, valid_from double, "
                  "valid_to double, is_current boolean")
    dim = spark.createDataFrame([
        (1, "berlin", 1, 0.0, 100.0, False),    # closed history row
        (1, "munich", 1, 100.0, None, True),    # open current
        (2, "paris", 2, 0.0, None, True),       # open, no updates coming
    ], dim_schema)
    ups = spark.createDataFrame([
        (1, "munich", 2, 200.0),   # tier change at t=200
        (1, "munich", 2, 300.0),   # NO-OP (same attrs) -> compressed away
        (1, "hamburg", 2, 400.0),  # city change at t=400
        (3, "rome", 1, 50.0),      # brand-new key
    ], "k long, city string, tier long, eff double")
    return dim, ups


def test_scd2_merge_chains_compresses_and_passes_history(spark):
    from powerdatapipeline_spark.operators import relational as rel
    dim, ups = _scd2_fixtures(spark)
    out = rel.scd2_merge(dim, ups, key="k", attrs=["city", "tier"],
                         eff_col="eff")
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}
    # closed history untouched
    assert rows[(1, 0.0)]["valid_to"] == 100.0
    assert not rows[(1, 0.0)]["is_current"]
    # open row closed at the first surviving update
    assert rows[(1, 100.0)]["valid_to"] == 200.0
    assert not rows[(1, 100.0)]["is_current"]
    # t=200 version survives; the t=300 no-op is compressed, so its
    # valid_to chains straight to t=400
    assert rows[(1, 200.0)]["tier"] == 2
    assert rows[(1, 200.0)]["valid_to"] == 400.0
    assert (1, 300.0) not in rows
    # final version open + current
    assert rows[(1, 400.0)]["city"] == "hamburg"
    assert rows[(1, 400.0)]["valid_to"] is None
    assert rows[(1, 400.0)]["is_current"]
    # untouched key stays open
    assert rows[(2, 0.0)]["valid_to"] is None and rows[(2, 0.0)]["is_current"]
    # new key starts its own open history
    assert rows[(3, 50.0)]["city"] == "rome" and rows[(3, 50.0)]["is_current"]
    # exactly one current row per key
    cur = [k for (k, _), r in rows.items() if r["is_current"]]
    assert sorted(cur) == [1, 2, 3]


def test_scd2_update_at_open_rows_timestamp_supersedes(spark):
    from powerdatapipeline_spark.operators import relational as rel
    dim = spark.createDataFrame(
        [(1, "a", 100.0, None, True)],
        "k long, v string, valid_from double, valid_to double, is_current boolean")
    ups = spark.createDataFrame([(1, "b", 100.0)], "k long, v string, eff double")
    out = {r["valid_from"]: r for r in rel.scd2_merge(
        dim, ups, key="k", attrs=["v"], eff_col="eff").collect()}
    # the update at the SAME instant wins the tie-break: the old open row
    # becomes a zero-length version closed at its own start, the update
    # is the open current one
    assert out[100.0]["v"] in ("a", "b")
    currents = [r for r in out.values() if r["is_current"]]
    assert len(currents) == 1 and currents[0]["v"] == "b"


def test_scd2_duplicate_update_keys_raise(spark):
    import pytest as _pytest
    from powerdatapipeline_spark.operators import relational as rel
    dim = spark.createDataFrame(
        [(1, "a", 0.0, None, True)],
        "k long, v string, valid_from double, valid_to double, is_current boolean")
    ups = spark.createDataFrame([(1, "b", 5.0), (1, "c", 5.0)],
                                "k long, v string, eff double")
    with _pytest.raises(ValueError, match="pre-aggregate"):
        rel.scd2_merge(dim, ups, key="k", attrs=["v"], eff_col="eff")
