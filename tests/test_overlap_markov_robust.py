"""Laws for the interval-overlap join, Markov transitions, trimmed mean,
and vocabulary/OOV operators (q146-q149). The DuckDB value parity is
pinned by the tail-parity sweep; these pin the semantics the hash can't:
bucketing ≡ naive join, emit-once, probability normalization, trim-set
correctness, and coverage edge cases."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import text as tx
from powerdatapipeline_spark.operators import timeseries as ts


# ------------------------------------------------------- interval overlap

def _intervals(spark, rows):
    return spark.createDataFrame([Row(iv_id=i, start=float(s), end=float(e))
                                  for i, (s, e) in enumerate(rows)])


def _naive_pairs(rows):
    out = set()
    for i, (s1, e1) in enumerate(rows):
        for j, (s2, e2) in enumerate(rows):
            if i < j and s1 <= e2 and s2 <= e1:
                out.add((i, j, min(e1, e2) - max(s1, s2)))
    return out


@pytest.mark.parametrize("bucket", [0.5, 1.0, 3.0, 10.0, 1000.0])
def test_overlap_join_equals_naive_any_bucket(spark, bucket):
    rows = [(0, 2), (1, 5), (4, 4), (6, 7), (6.5, 20), (30, 31),
            (2, 2), (19.9, 30)]
    df = _intervals(spark, rows)
    got = ts.interval_overlap_join(
        df, df, bucket_seconds=bucket,
        extra_cond=F.col("iv_id_a") < F.col("iv_id_b")).collect()
    pairs = {(r.iv_id_a, r.iv_id_b, r.overlap_seconds) for r in got}
    assert pairs == _naive_pairs(rows)
    # emit-once: no duplicate pairs even when intervals share many buckets
    assert len(got) == len(pairs)


def test_overlap_join_validates_args(spark):
    df = _intervals(spark, [(0, 1)])
    with pytest.raises(ValueError, match="bucket_seconds"):
        ts.interval_overlap_join(df, df, bucket_seconds=0)
    with pytest.raises(ValueError, match="suffixes"):
        ts.interval_overlap_join(df, df, suffixes=("_x", "_x"))


# ------------------------------------------------------------ transitions

def test_transition_matrix_hand_case(spark):
    ev = spark.createDataFrame(
        [Row(u=1, t=i, s=x, eid=i) for i, x in
         enumerate(["a", "b", "a", "b", "c"])]
        + [Row(u=2, t=i, s=x, eid=10 + i) for i, x in
           enumerate(["a", "b"])])
    got = {(r.from_state, r.to_state): (r.n_transitions, r.prob)
           for r in ts.transition_matrix(ev, "t", "s", ["u"],
                                         tiebreak="eid").collect()}
    # user1: a->b, b->a, a->b, b->c ; user2: a->b
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")][0] == 1 and abs(got[("b", "a")][1] - 0.5) < 1e-9
    assert got[("b", "c")][0] == 1 and abs(got[("b", "c")][1] - 0.5) < 1e-9
    # probabilities normalize per from_state
    from collections import defaultdict
    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(v - 1.0) < 1e-5 for v in sums.values())


# ----------------------------------------------------------- trimmed mean

def test_trimmed_mean_hand_case(spark):
    # values 1..10, trim 0.1 -> drop 1 low + 1 high -> mean(2..9) = 5.5
    df = spark.createDataFrame([Row(g="x", v=float(i), k=i)
                                for i in range(1, 11)])
    r = st.trimmed_mean(df, "v", ["g"], trim_frac=0.1,
                        tiebreak="k").collect()[0]
    assert r.n_kept == 8 and abs(r.trimmed_mean - 5.5) < 1e-9


def test_trimmed_mean_zero_trim_is_mean(spark):
    df = spark.createDataFrame([Row(g="x", v=float(i), k=i)
                                for i in (3, 7, 100)])
    r = st.trimmed_mean(df, "v", ["g"], trim_frac=0.0,
                        tiebreak="k").collect()[0]
    assert r.n_kept == 3 and abs(r.trimmed_mean - 110 / 3) < 1e-6


def test_trimmed_mean_outlier_resistant_and_validates(spark):
    base = [Row(g="x", v=float(i), k=i) for i in range(1, 100)]
    spiked = base + [Row(g="x", v=1e12, k=1000)]
    r = st.trimmed_mean(spark.createDataFrame(spiked), "v", ["g"],
                        trim_frac=0.1, tiebreak="k").collect()[0]
    assert r.trimmed_mean < 100  # the 1e12 spike is trimmed away
    with pytest.raises(ValueError, match="trim_frac"):
        st.trimmed_mean(spark.createDataFrame(base), "v", ["g"],
                        trim_frac=0.5)


# -------------------------------------------------------------- vocab/OOV

def test_vocab_and_oov_report(spark):
    docs = spark.createDataFrame(
        [Row(source="a", text="cat dog cat"),
         Row(source="b", text="cat bird wolf")])
    vocab = tx.vocab_top_k(docs, vocab_size=2)
    terms = {r.term for r in vocab.collect()}
    assert terms == {"cat", "bird"}  # freq desc then term asc: cat(3), bird/dog/wolf(1)->bird
    rep = {r.source: r for r in tx.oov_report(docs, vocab).collect()}
    assert rep["a"].n_tokens == 3 and rep["a"].n_oov == 1  # dog
    assert rep["b"].n_tokens == 3 and rep["b"].n_oov == 1  # wolf
    assert abs(rep["b"].oov_rate - 1 / 3) < 1e-5


def test_oov_zero_when_vocab_covers(spark):
    docs = spark.createDataFrame([Row(source="a", text="x y x")])
    vocab = tx.vocab_top_k(docs, vocab_size=10)
    r = tx.oov_report(docs, vocab).collect()[0]
    assert r.n_oov == 0 and r.oov_rate == 0.0
    with pytest.raises(ValueError, match="vocab_size"):
        tx.vocab_top_k(docs, vocab_size=0)


# ---------------------------------------------------------------- BPE merges

def test_bpe_merge_candidates_hand_case(spark):
    # digits split letter runs, so each doc yields several pieces
    docs = spark.createDataFrame(
        [Row(source="a", text="lo1lo1lo"), Row(source="b", text="hi1lo")])
    got = {(r.left_piece, r.right_piece): (r.pair_count, r.merge_rank)
           for r in tx.bpe_merge_candidates(docs, top_n=10).collect()}
    # doc a pieces: lo,1,lo,1,lo -> (lo,1)x2 (1,lo)x2 ; doc b: hi,1,lo
    assert got[("lo", "1")][0] == 2
    assert got[("1", "lo")][0] == 3
    assert got[("hi", "1")][0] == 1
    # ranks deterministic: (1,lo) first, then (lo,1), then (hi,1)
    assert got[("1", "lo")][1] == 1
    assert got[("lo", "1")][1] == 2
    assert got[("hi", "1")][1] == 3


def test_bpe_merge_single_piece_docs_yield_nothing(spark):
    docs = spark.createDataFrame([Row(source="a", text="word"),
                                  Row(source="b", text="")])
    assert tx.bpe_merge_candidates(docs).count() == 0
    with pytest.raises(ValueError, match="top_n"):
        tx.bpe_merge_candidates(docs, top_n=0)
