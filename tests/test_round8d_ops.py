"""Unit tests for the round-8d operators: bigram LM, rolling distinct
(exact + HLL twin), nearest as-of join, footer-stats scan, per-group
reservoir sample. The registry twins (q157-q162) are additionally
strict-oracle-pinned by test_tail_query_parity at sf0.001 + sf0.01;
these tests pin hand-computed values and the failure contracts."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import text as tx
from powerdatapipeline_spark.operators import timeseries as ts
from powerdatapipeline_spark.sources import readers as rd


# --------------------------------------------------------------------------
# bigram LM
# --------------------------------------------------------------------------

def test_bigram_logprob_hand_values(spark):
    # corpus: "a b a b", "b a", "c" -> unigrams: a=3, b=3, c=1, T=7
    # bigram counts: (a,b)=2, (b,a)=2 ; left-context: c(a,.)=2, c(b,.)=2
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"),
         Row(doc_id=2, text="b a"),
         Row(doc_id=3, text="c")])
    out = {r["doc_id"]: r for r in tx.bigram_logprob(df).collect()}
    # doc 3 has <2 tokens: excluded
    assert set(out) == {1, 2}
    lam = 0.8
    p_ab = lam * (2 / 2) + (1 - lam) * (3 / 7)   # p(b|a)
    p_ba = lam * (2 / 2) + (1 - lam) * (3 / 7)   # p(a|b) (symmetric here)
    ln_ab = round(math.log(p_ab), 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_neg_logprob"] == pytest.approx(
        round(-(2 * ln_ab + 1 * round(math.log(p_ba), 6)) / 3, 6), abs=1e-9)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_neg_logprob"] == pytest.approx(
        -round(math.log(p_ba), 6), abs=1e-9)


def test_bigram_logprob_single_token_docs_only(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    assert tx.bigram_logprob(df).count() == 0


# --------------------------------------------------------------------------
# rolling distinct
# --------------------------------------------------------------------------

def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(ts=float(t), uid=u) for t, u in rows],
        "ts double, uid bigint")


def test_rolling_distinct_hand_values(spark):
    day = 86400.0
    # day 0: users {1,2}; day 1: {2}; day 10: {3}
    df = _ev(spark, [(0.0, 1), (10.0, 1), (100.0, 2),
                     (day + 5, 2), (10 * day + 1, 3)])
    out = {r["window_end_day"]: r
           for r in ts.rolling_distinct(df, "ts", "uid").collect()}
    # observed days: 0, 1, 10 -> windows ending there
    assert set(out) == {0, 1, 10}
    assert out[0]["n_active"] == 2 and out[0]["n_id_buckets"] == 2
    # window [-5..1]: users 1,2 (day0) + 2 (day1): distinct 2, pairs 3
    assert out[1]["n_active"] == 2 and out[1]["n_id_buckets"] == 3
    # window [4..10]: only day 10
    assert out[10]["n_active"] == 1 and out[10]["n_id_buckets"] == 1


def test_rolling_distinct_sketch_within_contract(spark, sf_dir):
    from powerdatapipeline_spark.queries import load_events
    ev = load_events(spark, sf_dir)
    exact = {r["window_end_day"]: r["n_active"]
             for r in ts.rolling_distinct(ev).collect()}
    est = {r["window_end_day"]: r["est_active"]
           for r in ts.rolling_distinct_sketch(ev).collect()}
    assert set(est) == set(exact)
    rel_err = 3 * 1.04 / math.sqrt(2 ** 12)
    for d, n in exact.items():
        assert abs(est[d] - n) <= max(1.0, rel_err * n), (d, n, est[d])


# --------------------------------------------------------------------------
# nearest as-of join
# --------------------------------------------------------------------------

def test_asof_nearest_directions_ties_tolerance(spark):
    left = spark.createDataFrame(
        [Row(k="a", ets=100.0, lid=1),   # backward 90 (d10) vs fwd 120 (d20)
         Row(k="a", ets=105.0, lid=2),   # tie: 90 (d15) vs 120 (d15) -> backward
         Row(k="a", ets=500.0, lid=3),   # nothing within 50
         Row(k="b", ets=10.0, lid=4),    # only forward 15
         Row(k="c", ets=7.0, lid=5)])    # same-ts right row -> distance 0
    right = spark.createDataFrame(
        [Row(k="a", ets=90.0, v=1.0), Row(k="a", ets=120.0, v=2.0),
         Row(k="b", ets=15.0, v=3.0), Row(k="c", ets=7.0, v=4.0)])
    out = {r["lid"]: r for r in ts.asof_join_nearest(
        left, right, ["k"], "ets", ["v"], 50.0).collect()}
    assert len(out) == 5
    assert (out[1]["near_direction"], out[1]["near_v"],
            out[1]["near_gap_s"]) == ("backward", 1.0, 10.0)
    assert (out[2]["near_direction"], out[2]["near_ts"]) == ("backward", 90.0)
    assert out[3]["near_direction"] is None and out[3]["near_v"] is None
    assert (out[4]["near_direction"], out[4]["near_v"]) == ("forward", 3.0)
    assert (out[5]["near_direction"], out[5]["near_gap_s"]) == ("backward", 0.0)


def test_asof_nearest_no_right_rows(spark):
    left = spark.createDataFrame([Row(k="a", ets=1.0, lid=1)])
    right = spark.createDataFrame([], "k string, ets double, v double")
    out = ts.asof_join_nearest(left, right, ["k"], "ets", ["v"], 10.0).collect()
    assert len(out) == 1 and out[0]["near_v"] is None


# --------------------------------------------------------------------------
# footer-stats scan
# --------------------------------------------------------------------------

def test_scan_stats_pushes_aggregates_and_matches(spark, sf_dir):
    out = rd.scan_stats(spark, f"{sf_dir}/events.parquet",
                        min_max_cols=["event_id", "user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.split("\n") if "PushedAggregation" in ln]
    # the whole point is the footer-only scan: an empty PushedAggregation
    # means the conf key drifted or the shape degraded to a full scan
    assert pushed and "PushedAggregation: []" not in pushed[0], plan
    row = out.collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    truth = ev.agg(F.count("*"), F.min("event_id"), F.max("event_id"),
                   F.min("user_id"), F.max("user_id")).collect()[0]
    assert (row["n_rows"], row["min_event_id"], row["max_event_id"],
            row["min_user_id"], row["max_user_id"]) == tuple(truth)


def test_scan_stats_rejects_unpushable_columns(spark, sf_dir):
    with pytest.raises(ValueError, match="full scan"):
        rd.scan_stats(spark, f"{sf_dir}/events.parquet",
                      min_max_cols=["event_type"])
    with pytest.raises(ValueError, match="not in"):
        rd.scan_stats(spark, f"{sf_dir}/events.parquet",
                      min_max_cols=["nope"])


# --------------------------------------------------------------------------
# per-group reservoir sample
# --------------------------------------------------------------------------

def test_group_reservoir_exact_k_and_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "doc_id")
    a = rel.group_reservoir_sample(docs, ["source"], "doc_id", 3)
    counts = {r["source"]: r["n"] for r in
              a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s, n in counts.items():
        assert n == min(3, sizes[s])
    b = rel.group_reservoir_sample(
        docs.repartition(7), ["source"], "doc_id", 3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_group_reservoir_salt_changes_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "doc_id")
    a = set(r["doc_id"] for r in rel.group_reservoir_sample(
        docs, ["source"], "doc_id", 3).collect())
    c = set(r["doc_id"] for r in rel.group_reservoir_sample(
        docs, ["source"], "doc_id", 3, salt="epoch2").collect())
    assert a != c


def test_group_reservoir_rejects_bad_k(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="k must be"):
        rel.group_reservoir_sample(docs, ["source"], "doc_id", 0)
