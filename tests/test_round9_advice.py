"""Round-9 ADVICE closures — one pinned test per round-8 advisory.

1. triangle_count: the arithmetic orientation key ``deg*1e9 + id``
   silently collided/inverted for ids >= 1e9 or negative ids; the fix
   orders by a native ``struct(deg, id)`` comparison. Pinned with a
   known triangle on 10-digit and negative ids.
2. benford_audit: values in (0, 0.005) floored to 0 cents, producing
   a digit-0 bucket with NULL expected_p/chi2_term; the fix excludes
   cents < 1. Pinned: sub-cent rows never surface a 0 bucket.
3. fs_linkage: an all-distinct (or constant / <2-row) comparison field
   gave u ∈ {NULL, 0, 1} and silently NULL'ed every pair score; the
   fix raises loudly. Pinned: degenerate field -> exception.
4. winsorize_report: the keyed per-group fit join no longer carries a
   forced broadcast hint (unbounded at high key cardinality); the
   keyless 1-row scalar crossJoin keeps it. Pinned on the analyzed
   plans.
"""
import pytest
from pyspark.sql import Row, functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import graph as gr
from powerdatapipeline_spark.operators import stats as st


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_triangle_count_ids_above_1e9(spark):
    # one triangle + a pendant edge, all ids >= 1e9: the old
    # deg*1e9+id composite collided across degree classes here
    big = 5_000_000_000
    tri = _edges(spark, [(big, big + 1), (big + 1, big + 2),
                         (big + 2, big), (big, big + 7)])
    r = gr.triangle_count(tri).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 4, 1)


def test_triangle_count_negative_ids(spark):
    tri = _edges(spark, [(-5, -4), (-4, -3), (-3, -5), (-5, 0)])
    r = gr.triangle_count(tri).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 4, 1)


def test_benford_no_digit_zero_for_subcent_values(spark):
    rows = [Row(v=0.003), Row(v=0.0049), Row(v=1.23), Row(v=9.01),
            Row(v=12.5), Row(v=0.004)]
    out = st.benford_audit(spark.createDataFrame(rows), "v").collect()
    digits = [r["digit"] for r in out]
    assert 0 not in digits
    assert sorted(digits) == [1, 9]
    assert {r["digit"]: r["n"] for r in out} == {1: 2, 9: 1}
    # every surviving row has a defined expected share and chi2 term
    assert all(r["expected_p"] is not None and r["chi2_term"] is not None
               for r in out)
    # the sub-cent rows are excluded from the total, not mis-bucketed
    assert out[0]["total"] == 3


def test_fs_linkage_all_distinct_field_raises(spark):
    rows = [Row(pid=i, blk="b", zip=f"{10000 + i}") for i in range(6)]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="degenerate u-probability"):
        dd.fs_linkage(df, "pid", [F.col("blk")],
                      {"zip": F.col("zip")}, {"zip": 0.9}).collect()


def test_fs_linkage_constant_field_raises(spark):
    rows = [Row(pid=i, blk="b", zip="11111") for i in range(6)]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="degenerate u-probability"):
        dd.fs_linkage(df, "pid", [F.col("blk")],
                      {"zip": F.col("zip")}, {"zip": 0.9}).collect()


def _analyzed(df):
    return df._jdf.queryExecution().analyzed().toString()


def test_winsorize_keyed_fit_join_not_force_broadcast(spark):
    df = spark.createDataFrame(
        [Row(k=i % 3, v=float(i)) for i in range(30)])
    keyed = st.winsorize_report(df, "v", keys=["k"])
    assert "UnresolvedHint" not in _analyzed(keyed)
    assert "ResolvedHint" not in _analyzed(keyed)
    # values still correct: group 0 holds 0,3,...,27
    r = {row["k"]: row for row in keyed.collect()}
    assert r[0]["n"] == 10 and r[0]["n_clipped_low"] >= 1
    # the keyless scalar fit keeps its 1-row broadcast hint
    scalar = st.winsorize_report(df, "v")
    assert "ResolvedHint" in _analyzed(scalar)
