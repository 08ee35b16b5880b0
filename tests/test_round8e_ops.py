"""Unit tests for the round-8e operators: prefix-filter similarity join
(exactness vs the full inverted-index baseline), KMV bottom-k sketches
(accuracy + mergeability), Heaps'-law fit, sorted-neighborhood blocking.
Registry twins q163-q166 are strict-oracle-pinned by
test_tail_query_parity at sf0.001 + sf0.01."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import text as tx


# --------------------------------------------------------------------------
# prefix-filter Jaccard
# --------------------------------------------------------------------------

@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_filter_equals_baseline(spark, sf_dir, threshold):
    # the PPJoin exactness theorem, empirically: prefix filtering must
    # produce the IDENTICAL pair set as the full inverted-index join
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = dd.ngram_jaccard_pairs(docs, n=3, threshold=threshold,
                                  unit="word")
    pf = dd.prefix_filter_jaccard_pairs(docs, n=3, threshold=threshold,
                                        unit="word")
    b = sorted(map(tuple, base.select("id_a", "id_b", "jaccard").collect()))
    p = sorted(map(tuple, pf.collect()))
    assert b == p and len(p) > 0


def test_prefix_filter_threshold_guard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="threshold"):
        dd.prefix_filter_jaccard_pairs(docs, threshold=0.0)


# --------------------------------------------------------------------------
# KMV sketches
# --------------------------------------------------------------------------

def _sets_df(spark, sets):
    rows = [Row(g=g, mid=int(v)) for g, vals in sets.items() for v in vals]
    return spark.createDataFrame(rows)


def test_kmv_exact_when_small(spark):
    # below k the sketch IS the set: estimates must be exact
    sets = {"a": range(30), "b": range(20, 50)}
    sk = st.kmv_sketch(_sets_df(spark, sets), "g", "mid", k=64)
    out = st.kmv_set_compare(sk, 64).collect()[0]
    assert out["est_union"] == 50.0
    assert out["est_intersection"] == pytest.approx(10.0, abs=1e-6)
    assert out["jaccard_est"] == pytest.approx(10 / 50, abs=1e-6)


def test_kmv_estimator_accuracy(spark):
    # k=256 over 4000-distinct sets: relative error ~ 1/sqrt(k) ≈ 6%;
    # allow 4x margin for the deterministic draw
    sets = {"a": range(4000), "b": range(2000, 6000)}
    sk = st.kmv_sketch(_sets_df(spark, sets), "g", "mid", k=256)
    out = st.kmv_set_compare(sk, 256).collect()[0]
    assert out["est_union"] == pytest.approx(6000, rel=0.25)
    assert out["est_intersection"] == pytest.approx(2000, rel=0.5)


def test_kmv_sketch_mergeable(spark):
    # union+re-rank of two group sketches == sketch of the merged group
    df = _sets_df(spark, {"a": range(500), "b": range(300, 800)})
    k = 32
    sk = st.kmv_sketch(df, "g", "mid", k=k)
    from pyspark.sql import Window
    merged = (sk.select(F.lit("ab").alias("g"), "hv").distinct()
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy("g").orderBy(F.col("hv").asc()))
                  .cast("bigint"))
              .where(F.col("rank") <= k))
    direct = st.kmv_sketch(
        df.select(F.lit("ab").alias("g"), "mid"), "g", "mid", k=k)
    assert sorted(r["hv"] for r in merged.collect()) == \
        sorted(r["hv"] for r in direct.collect())


def test_kmv_k_guard(spark):
    with pytest.raises(ValueError, match="k must be"):
        st.kmv_sketch(_sets_df(spark, {"a": [1]}), "g", "mid", k=1)


# --------------------------------------------------------------------------
# Heaps' law
# --------------------------------------------------------------------------

def test_heaps_law_hand_fit(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"),       # N=3,  V=3
         Row(doc_id=2, text="a b d d"),     # N=7,  V=4
         Row(doc_id=3, text="e f"),         # N=9,  V=6
         Row(doc_id=4, text="a a a")])      # N=12, V=6
    out = tx.heaps_law_fit(docs).collect()[0]
    assert out["n_points"] == 4
    assert out["total_tokens"] == 12 and out["total_vocab"] == 6
    xs = [round(math.log(n), 6) for n in (3, 7, 9, 12)]
    ys = [round(math.log(v), 6) for v in (3, 4, 6, 6)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    logk = (sy - beta * sx) / n
    assert out["beta"] == pytest.approx(round(beta, 6), abs=2e-6)
    assert out["log_k"] == pytest.approx(round(logk, 6), abs=2e-6)
    # growing-vocabulary corpus: 0 < beta < 1
    assert 0.0 < out["beta"] < 1.0


def test_heaps_law_saturated_vocab(spark):
    # same token repeated: V saturates at 1, slope ~ 0
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x x x") for i in range(1, 6)])
    out = tx.heaps_law_fit(docs).collect()[0]
    assert out["total_vocab"] == 1
    assert abs(out["beta"]) < 1e-9


# --------------------------------------------------------------------------
# sorted neighborhood
# --------------------------------------------------------------------------

def test_sorted_neighborhood_finds_adjacent_typos(spark):
    df = spark.createDataFrame(
        [Row(k=1, name="jon smith"), Row(k=2, name="john smith"),
         Row(k=3, name="zachary quinn"), Row(k=4, name="aaron a")])
    pairs = dd.sorted_neighborhood_pairs(df, "k", "name", window=2)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    # sort order: aaron a(4), john smith(2), jon smith(1), zachary(3)
    assert got == {(4, 2), (2, 1), (1, 3)}
    verified = pairs.where(
        F.levenshtein("sort_a", "sort_b") <= 2).collect()
    assert {(r["key_a"], r["key_b"]) for r in verified} == {(2, 1)}


def test_sorted_neighborhood_window_bound_and_guard(spark):
    df = spark.createDataFrame([Row(k=i, name=f"n{i:03d}") for i in range(10)])
    pairs = dd.sorted_neighborhood_pairs(df, "k", "name", window=4)
    assert pairs.count() == 9 + 8 + 7  # gaps 1,2,3
    assert pairs.agg(F.max("rank_gap")).collect()[0][0] == 3
    with pytest.raises(ValueError, match="window"):
        dd.sorted_neighborhood_pairs(df, "k", "name", window=1)
