"""Unit tests for the round-8f operators: ACF (autocorrelation),
Fellegi-Sunter linkage scoring, directional n-gram containment,
dimension-truncation recall, centroid-classifier calibration, Cohen's
kappa. Registry twins q168-q173 are strict-oracle-pinned by
test_tail_query_parity at sf0.001 + sf0.01."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import timeseries as ts


# --------------------------------------------------------------------------
# acf
# --------------------------------------------------------------------------

def _series_df(spark, values, bucket_seconds=1):
    # one reading per bucket: ts = bucket index (bucket_seconds=1)
    rows = [Row(ts=float(i), value=float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows)
    return df.select(F.col("ts").cast("timestamp").alias("ts"), "value")


def _py_acf(xs, k):
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
    return num / den


def test_acf_matches_hand_computation(spark):
    xs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0]
    got = {r["lag"]: r["acf"]
           for r in ts.acf(_series_df(spark, xs), max_lag=3,
                           bucket_seconds=1).collect()}
    for k in (1, 2, 3):
        assert got[k] == pytest.approx(_py_acf(xs, k), abs=1e-5)


def test_acf_perfect_period_two(spark):
    # alternating series: lag-1 strongly negative, lag-2 strongly positive
    xs = [1.0, -1.0] * 20
    got = {r["lag"]: r["acf"]
           for r in ts.acf(_series_df(spark, xs), max_lag=2,
                           bucket_seconds=1).collect()}
    assert got[1] < -0.9 and got[2] > 0.9


def test_acf_constant_series_null(spark):
    out = ts.acf(_series_df(spark, [4.0] * 10), max_lag=2,
                 bucket_seconds=1).collect()
    assert all(r["acf"] is None for r in out)


def test_acf_gap_pairwise_semantics(spark):
    # drop bucket 2: lag-1 keeps (0,1),(3,4); lag-2 keeps only (1,3)
    rows = [Row(ts=float(i), value=float(i)) for i in (0, 1, 3, 4)]
    df = (spark.createDataFrame(rows)
          .select(F.col("ts").cast("timestamp").alias("ts"), "value"))
    got = {r["lag"]: r["n_pairs"]
           for r in ts.acf(df, max_lag=2, bucket_seconds=1).collect()}
    assert got[1] == 2 and got[2] == 1


def test_acf_lag_guard(spark):
    with pytest.raises(ValueError, match="max_lag"):
        ts.acf(_series_df(spark, [1.0, 2.0]), max_lag=0)


# --------------------------------------------------------------------------
# fs_linkage
# --------------------------------------------------------------------------

def _people(spark):
    rows = [
        # two near-duplicates: same city, same zip, same year
        Row(pid=1, city="springfield", zip="11111", year=1980),
        Row(pid=2, city="springfield", zip="11111", year=1980),
        # same block, disagreeing fields
        Row(pid=3, city="springfield", zip="22222", year=1990),
        # different block entirely
        Row(pid=4, city="shelbyville", zip="33333", year=1980),
    ]
    return spark.createDataFrame(rows)


def test_fs_linkage_scores_rank_true_match_first(spark):
    out = dd.fs_linkage(
        _people(spark), "pid", [F.col("city")],
        {"zip": F.col("zip"), "year": F.col("year")},
        {"zip": 0.9, "year": 0.9}).collect()
    scores = {(r["id_a"], r["id_b"]): r["score"] for r in out}
    # blocking: only springfield pairs compared (3 pairs), never pid 4
    assert set(scores) == {(1, 2), (1, 3), (2, 3)}
    assert scores[(1, 2)] > scores[(1, 3)]
    assert scores[(1, 3)] == scores[(2, 3)]
    agree = {(r["id_a"], r["id_b"]): (r["agree_zip"], r["agree_year"])
             for r in out}
    assert agree[(1, 2)] == (True, True)
    assert agree[(1, 3)] == (False, False)


def test_fs_linkage_rare_agreement_outweighs_common(spark):
    # field "common": one dominant value (u high) -> small agree weight;
    # field "rare": all-distinct-but-pair (u low) -> large agree weight
    rows = [Row(pid=i, blk="b",
                common="x" if i < 9 else "y",
                rare=str(i if i < 8 else 99)) for i in range(10)]
    df = spark.createDataFrame(rows)
    out = dd.fs_linkage(df, "pid", [F.col("blk")],
                        {"common": F.col("common"), "rare": F.col("rare")},
                        {"common": 0.9, "rare": 0.9}).collect()
    sc = {(r["id_a"], r["id_b"]): r for r in out}
    # (8,9) agree on rare only; (0,1) agree on common only
    rare_only = sc[(8, 9)]
    common_only = sc[(0, 1)]
    assert rare_only["agree_rare"] and not rare_only["agree_common"]
    assert common_only["agree_common"] and not common_only["agree_rare"]
    assert rare_only["score"] > common_only["score"]


def test_fs_linkage_null_is_disagreement(spark):
    # pids 3/4 give the field a non-degenerate u (2 values, one
    # repeat); the (1,2) pair still pins NULL -> disagreement.
    # (A single non-null row would now RAISE — see
    # test_round9_advice.py's degenerate-u guards.)
    rows = [Row(pid=1, blk="b", f="v"), Row(pid=2, blk="b", f=None),
            Row(pid=3, blk="c", f="v"), Row(pid=4, blk="c", f="w")]
    out = dd.fs_linkage(spark.createDataFrame(rows), "pid", [F.col("blk")],
                        {"f": F.col("f")}, {"f": 0.9}).collect()
    pair = {(r["id_a"], r["id_b"]): r for r in out}
    assert pair[(1, 2)]["agree_f"] is False


def test_fs_linkage_key_mismatch_guard(spark):
    with pytest.raises(ValueError, match="mismatch"):
        dd.fs_linkage(_people(spark), "pid", [F.col("city")],
                      {"zip": F.col("zip")}, {"year": 0.9})
    with pytest.raises(ValueError, match="m_probs"):
        dd.fs_linkage(_people(spark), "pid", [F.col("city")],
                      {"zip": F.col("zip")}, {"zip": 1.0})


# --------------------------------------------------------------------------
# containment_pairs
# --------------------------------------------------------------------------

def test_containment_is_asymmetric(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"word{i}" for i in range(40))
    df = spark.createDataFrame([Row(doc_id=1, text=short),
                                Row(doc_id=2, text=long)])
    out = {(r["src"], r["dst"]): r["containment"]
           for r in dd.containment_pairs(df, n=3, threshold=0.0,
                                         unit="word").collect()}
    # every shingle of the short doc occurs in the long one
    assert out[(1, 2)] == 1.0
    # but the long doc is mostly NOT in the short one
    assert out[(2, 1)] < 0.2


def test_containment_threshold_filters_direction(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"word{i}" for i in range(40))
    df = spark.createDataFrame([Row(doc_id=1, text=short),
                                Row(doc_id=2, text=long)])
    out = dd.containment_pairs(df, n=3, threshold=0.9,
                               unit="word").collect()
    assert [(r["src"], r["dst"]) for r in out] == [(1, 2)]


def test_containment_bounded_by_one_and_counts(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f"),
        Row(doc_id=2, text="a b c d e f"),  # identical
    ])
    out = dd.containment_pairs(df, n=3, threshold=0.0,
                               unit="word").collect()
    assert len(out) == 2
    for r in out:
        assert r["containment"] == 1.0 and r["n_inter"] == r["n_src"] == 4


# --------------------------------------------------------------------------
# truncation_recall
# --------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])


def test_truncation_recall_full_dim_is_one(spark):
    import random
    rng = random.Random(7)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(30)]
    emb = _emb_df(spark, vecs)
    qs = (emb.where(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = {r["dim"]: r for r in sim.truncation_recall(
        emb, qs, dims=[2, 8], k=5).collect()}
    # truncating to the full dimension IS the ground truth
    assert out[8]["recall"] == 1.0 and out[8]["n_full"] == 15
    # heavy truncation loses neighbors but keeps >= 1/k (self-match)
    assert 0.2 <= out[2]["recall"] <= 1.0


def test_truncation_recall_monotone_on_nested_structure(spark):
    # first-2-dims dominate: truncation barely hurts when the tail is tiny
    import random
    rng = random.Random(11)
    vecs = [[rng.gauss(0, 1), rng.gauss(0, 1),
             rng.gauss(0, 1e-4), rng.gauss(0, 1e-4)] for _ in range(25)]
    emb = _emb_df(spark, vecs)
    qs = (emb.where(F.col("vec_id") < 4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = {r["dim"]: r["recall"] for r in sim.truncation_recall(
        emb, qs, dims=[2, 4], k=5).collect()}
    assert out[2] >= 0.9 and out[4] == 1.0


def test_truncation_recall_dims_guard(spark):
    emb = _emb_df(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="dim"):
        sim.truncation_recall(emb, emb, dims=[])


# --------------------------------------------------------------------------
# centroid_calibration
# --------------------------------------------------------------------------

def test_calibration_separable_labels_top_bin_perfect(spark):
    # two orthogonal clusters: every vector is confidently correct
    rows = ([Row(vec_id=i, embedding=[1.0, 0.0, 0.0, 0.0], label=0)
             for i in range(10)]
            + [Row(vec_id=10 + i, embedding=[0.0, 1.0, 0.0, 0.0], label=1)
               for i in range(10)])
    out = sim.centroid_calibration(spark.createDataFrame(rows),
                                   n_bins=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 9 and r["n"] == 20 and r["accuracy"] == 1.0
    # cos = 1 for every vector: exact sum of 6-rounded cosines
    assert r["sum_cos"] == pytest.approx(20.0, abs=1e-6)


def test_calibration_shuffled_labels_near_chance(spark):
    # labels independent of geometry: accuracy ~= 1/n_labels in every bin
    import random
    rng = random.Random(3)
    rows = [Row(vec_id=i, embedding=[rng.gauss(0, 1) for _ in range(8)],
                label=i % 4) for i in range(200)]
    out = sim.centroid_calibration(spark.createDataFrame(rows),
                                   n_bins=5).collect()
    total = sum(r["n"] for r in out)
    correct = sum(r["n_correct"] for r in out)
    assert total == 200
    # chance is 0.25; allow a generous band for 200 draws
    assert 0.10 <= correct / total <= 0.45


def test_calibration_bins_guard(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0], label=0)])
    with pytest.raises(ValueError, match="n_bins"):
        sim.centroid_calibration(df, n_bins=1)


# --------------------------------------------------------------------------
# cohen_kappa
# --------------------------------------------------------------------------

def _raters_df(spark, pairs):
    return spark.createDataFrame([Row(a=a, b=b) for a, b in pairs])


def test_kappa_perfect_agreement(spark):
    df = _raters_df(spark, [(True, True)] * 6 + [(False, False)] * 4)
    r = st.cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["kappa"] == 1.0 and r["po"] == 1.0
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (4, 0, 0, 6)


def test_kappa_chance_level_is_zero(spark):
    # independent raters, each keeping half: po = pe = 0.5 -> kappa = 0
    df = _raters_df(spark, [(True, True), (True, False),
                            (False, True), (False, False)] * 5)
    r = st.cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["kappa"] == 0.0 and r["po"] == 0.5 and r["pe"] == 0.5


def test_kappa_textbook_example(spark):
    # classic 2x2: n11=20, n10=5, n01=10, n00=15 -> kappa = 0.4
    pairs = ([(True, True)] * 20 + [(True, False)] * 5
             + [(False, True)] * 10 + [(False, False)] * 15)
    r = st.cohen_kappa(_raters_df(spark, pairs),
                       F.col("a"), F.col("b")).collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 2500
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


def test_kappa_degenerate_raters_null(spark):
    # both raters constant-True: pe = 1, kappa undefined -> NULL
    df = _raters_df(spark, [(True, True)] * 8)
    r = st.cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["kappa"] is None


def test_kappa_null_is_false(spark):
    df = spark.createDataFrame([Row(a=None, b=False), Row(a=True, b=True)])
    r = st.cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert (r["n00"], r["n11"]) == (1, 1)
