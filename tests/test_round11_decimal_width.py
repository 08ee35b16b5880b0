"""Accumulator-width regression pins (VERDICT r10 #4 BIGINT-fold audit).

Spark widens ``sum(decimal(p,0))`` to ``decimal(p+10,0)`` — so a sum of
decimal(19,0) micro-values/ranks accumulates at decimal(29,0) and
overflows at ~1e29 total mass, the same latent class as the bigint
checksum folds, two tiers up. The fix casts each LINEAR summand to
decimal(38,0) before the sum (product summands already hit the 38-digit
cap at the multiply). A 1e29 fixture is untestable, so these tests pin
the width in the ANALYZED PLAN: no aggregate in the fixed operators may
accumulate a linear decimal sum at precision 29.
"""

import re

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators import graph as gr
from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import timeseries as ts


def narrow_sums(df):
    """decimal(29,0) sum accumulators present in the analyzed plan."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return re.findall(r"sum\([^)]*\)[^,\n]*decimal\(29,0\)", plan)


def test_welch_anova_kruskal_accumulate_wide(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 3.5), ("b", 0.5), ("c", 9.0),
         ("c", 1.0)],
        "g string, v double")
    assert narrow_sums(st.welch_ttest(df, "v", "g", "a", "b")) == []
    assert narrow_sums(st.anova_f(df, "v", "g")) == []
    assert narrow_sums(st.kruskal_wallis(df, "v", "g")) == []


def test_spearman_and_timeseries_accumulate_wide(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 4.0)],
        "x double, y double")
    assert narrow_sums(st.spearman_corr(df, "x", "y")) == []

    ev = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a"),
         ("2024-01-01 00:01:00", "a"),
         ("2024-01-01 00:00:00", "b"),
         ("2024-01-01 00:01:00", "b")],
        "ts string, type string"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "type")
    assert narrow_sums(ts.cross_correlation(
        ev, "ts", "type", "a", "b", max_lag=2, bucket_seconds=60)) == []


def test_wedge_count_exact_integer_and_wide(spark):
    # star K_{1,5}: hub degree 5, leaves degree 1 → wedges = C(5,2) = 10
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src bigint, dst bigint")
    out = gr.triangle_count(edges)
    assert narrow_sums(out) == []
    r = out.collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (6, 5, 10, 0)
    # the shiftright /2 must stay exact where double division is not:
    # deg = 2^27+1 → deg·(deg−1)/2 = 9007199321849856, an odd-mantissa
    # integer past double's 2^53 half-ulp zone for the intermediate
    d = 2 ** 27 + 1
    got = spark.range(1).select(
        F.shiftright(F.lit(d).cast("bigint")
                     * F.lit(d - 1).cast("bigint"), 1)
        .alias("w")).collect()[0]["w"]
    assert got == d * (d - 1) // 2


def test_round11_new_operators_accumulate_wide(spark):
    from powerdatapipeline_spark.operators import relational as rel

    left = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    assert narrow_sums(rel.join_size_estimate(left, left, "k", "k")) == []

    docs = spark.createDataFrame([(f"d{i}", "odd" if i % 2 else "even")
                                  for i in range(8)],
                                 "doc_id string, source string")
    assert narrow_sums(rel.shuffle_runs_audit(
        docs, "doc_id", "source", n_shards=2)) == []

    ev = spark.createDataFrame(
        [("a", 1.0, 0.0, 1), ("a", 2.0, 3600.0, 2),
         ("b", 5.0, 0.0, 3), ("b", 9.0, 3600.0, 4)],
        "g string, v double, e double, id bigint").select(
        "g", "v", F.col("e").cast("timestamp").alias("ts"), "id")
    from powerdatapipeline_spark.operators import timeseries as ts2
    assert narrow_sums(ts2.ramp_rates(
        ev, "ts", "v", "g", ["g"], tiebreak="id")) == []
