"""Value pins for the round-11c operators: shuffle runs audit, SAX words."""

import math

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import timeseries as ts

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


def test_shuffle_runs_audit_expected_term(spark):
    # one shard (n_shards=1) so the order is the full md5-uniform
    # permutation; verify the EXPECTED term against the closed form
    rows = [(f"k{i:03d}", "odd" if i % 2 else "even") for i in range(40)]
    df = spark.createDataFrame(rows, "k string, cls string")
    got = rel.shuffle_runs_audit(df, "k", "cls", n_shards=1).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_rows == 40 and r.n_classes == 2
    # n_c = 20/20 -> E[adjacent-equal] = 2*20*19/40 = 19 -> E[runs] = 21
    assert r.expected_runs == 21.0
    assert 1 <= r.n_runs <= 40
    assert r.runs_ratio == fl6(r.n_runs / 21.0)


def test_shuffle_runs_audit_single_class_ratio_null(spark):
    df = spark.createDataFrame([(f"k{i}", "only") for i in range(10)],
                               "k string, cls string")
    r = rel.shuffle_runs_audit(df, "k", "cls", n_shards=1).collect()[0]
    # all one class: observed runs = 1, expected = n - n(n-1)/n = 1
    assert r.n_runs == 1
    assert r.expected_runs == 1.0
    assert r.runs_ratio == 1.0


def test_sax_words_hand_series(spark):
    # one series, hourly buckets 0..7 with counts 1,1,1,1,9,9,9,9:
    # mu = 5, sd = 4 -> z = -1 ('a') x4 then +1 ('d') x4
    # 3-words: aaa, aad, add, ddd -> each once
    rows = []
    eid = 0
    for b, c in enumerate([1, 1, 1, 1, 9, 9, 9, 9]):
        for _ in range(c):
            rows.append((float(b * 3600 + 5), "t1", eid))
            eid += 1
    df = (spark.createDataFrame(rows, "e double, ty string, id bigint")
          .select(F.col("e").cast("timestamp").alias("ts"),
                  F.col("ty").alias("event_type"), "id"))
    got = {r.word: (r.n_series, r.n_occurrences)
           for r in ts.sax_words(df, "ts", "event_type").collect()}
    assert got == {"aaa": (1, 2), "aad": (1, 1), "add": (1, 1),
                   "ddd": (1, 2)}


def test_sax_words_gap_breaks_words(spark):
    # buckets 0,1,2 then a gap then 10,11,12 -> words only within
    # each contiguous block (2 blocks x 1 word of length 3 each... the
    # blocks are 3 long so 1 word each)
    rows = []
    eid = 0
    for b in [0, 1, 2, 10, 11, 12]:
        for _ in range(1 + (b % 3)):
            rows.append((float(b * 3600 + 1), "t", eid))
            eid += 1
    df = (spark.createDataFrame(rows, "e double, ty string, id bigint")
          .select(F.col("e").cast("timestamp").alias("ts"),
                  F.col("ty").alias("event_type"), "id"))
    out = ts.sax_words(df, "ts", "event_type").collect()
    assert sum(r.n_occurrences for r in out) == 2  # no cross-gap words


def test_sax_words_validation(spark):
    import pytest

    df = spark.createDataFrame([(1.0, "t")], "ts double, event_type string")
    with pytest.raises(ValueError, match="word_len"):
        ts.sax_words(df, "ts", "event_type", word_len=1)


def test_diff_in_diff_hand_case(spark):
    from powerdatapipeline_spark.operators import stats as st
    # treated: pre mean 10, post mean 15 (+5); control: pre 20, post 21
    # (+1) -> DiD = 4
    rows = ([(True, False, v) for v in (9.0, 10.0, 11.0)]
            + [(True, True, v) for v in (14.0, 15.0, 16.0)]
            + [(False, False, v) for v in (19.0, 20.0, 21.0)]
            + [(False, True, v) for v in (20.0, 21.0, 22.0)])
    df = spark.createDataFrame(rows, "g boolean, p boolean, v double")
    got = st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()[0]
    assert (got.n_tp, got.n_tr, got.n_cp, got.n_cr) == (3, 3, 3, 3)
    assert got.did == 4.0
    # each cell var = 1, se = sqrt(4/3)
    assert got.se == fl6(math.sqrt(4 / 3))
    assert got.z == fl6(4.0 / math.sqrt(4 / 3))


def test_diff_in_diff_small_cell_raises(spark):
    import pytest
    from powerdatapipeline_spark.operators import stats as st

    rows = [(True, True, 1.0), (True, False, 1.0), (True, False, 2.0),
            (False, True, 1.0), (False, True, 2.0),
            (False, False, 1.0), (False, False, 2.0)]
    df = spark.createDataFrame(rows, "g boolean, p boolean, v double")
    with pytest.raises(Exception, match="diff_in_diff"):
        st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()


def test_streaming_woe_partials_merge_equals_batch(spark, tmp_path):
    # appended per-batch (bucket, n_pos, n_neg) partials finalize
    # bit-identically to the batch operator over the union
    from powerdatapipeline_spark.operators import stats as st
    from powerdatapipeline_spark.streaming.stateful import \
        finalize_woe_monitor

    def per(rows):
        return spark.createDataFrame(
            rows, "bucket bigint, n_pos bigint, n_neg bigint")

    p = str(tmp_path / "partials")
    per([(0, 2, 5), (1, 4, 1)]).write.mode("append").parquet(p)
    per([(0, 1, 3), (2, 0, 2)]).write.mode("append").parquet(p)
    got = finalize_woe_monitor(spark, p).collect()
    rows = ([(0, True)] * 3 + [(0, False)] * 8
            + [(1, True)] * 4 + [(1, False)] * 1
            + [(2, False)] * 2)
    df = spark.createDataFrame(rows, "b bigint, y boolean")
    want = st.woe_iv(df, F.col("b"), F.col("y")).collect()
    assert got == want
