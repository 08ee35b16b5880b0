"""Round-12 streaming twins (VERDICT r11 #8): Krippendorff alpha and
2×2 diff-in-diff get the q45/q258 stream ≡ batch treatment — per-batch
mergeable sufficient-statistic partials finalized through the SAME
code path as the batch operator, pinned here against the batch result
over the union of all batches.
"""

import pyspark.sql.functions as F
import pytest

from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.streaming.stateful import (
    finalize_did_monitor,
    finalize_krippendorff_monitor,
    streaming_did_monitor,
    streaming_krippendorff_monitor,
)

# ---------------------------------------------------------------- fixtures

RATING_ROWS = (
    # 4 units × up to 3 raters, one unit single-rated (drops out of D_o)
    [("u1", "keep")] * 3
    + [("u2", "keep"), ("u2", "drop"), ("u2", "drop")]
    + [("u3", "drop"), ("u3", "drop")]
    + [("u4", "keep")]
)

DID_ROWS = (
    [(True, True, 10.5), (True, True, 11.25), (True, True, 9.0)]
    + [(True, False, 8.0), (True, False, 7.5)]
    + [(False, True, 6.125), (False, True, 5.0), (False, True, 7.0)]
    + [(False, False, 5.5), (False, False, 6.0)]
)


# --------------------------------------------- partials merge ≡ batch
def test_krippendorff_partials_merge_equals_batch(spark, tmp_path):
    p = str(tmp_path / "kri_partials")

    def write_partial(rows):
        (spark.createDataFrame(rows, "u string, c string")
         .groupBy(F.col("u").alias("__u"), F.col("c").alias("__c"))
         .agg(F.count("*").cast("bigint").alias("nuc"))
         .write.mode("append").parquet(p))

    # split the ratings across 3 "micro-batches", slicing THROUGH units
    # so per-unit counts genuinely have to merge by addition
    write_partial(RATING_ROWS[:4])
    write_partial(RATING_ROWS[4:7])
    write_partial(RATING_ROWS[7:])
    got = finalize_krippendorff_monitor(spark, p).collect()
    want = st.krippendorff_alpha(
        spark.createDataFrame(RATING_ROWS, "u string, c string"),
        "u", "c").collect()
    assert got == want
    assert got[0].n_units == 3 and got[0].n_ratings == 8


def test_did_partials_merge_equals_batch(spark, tmp_path):
    p = str(tmp_path / "did_partials")
    df = spark.createDataFrame(DID_ROWS, "g boolean, p boolean, v double")

    # two partials slicing THROUGH cells (each half holds rows of every
    # cell) so cell moments must add
    for half in (df.where(F.col("v") >= 7.0), df.where(F.col("v") < 7.0)):
        (st.did_cell_moments(half, "v", F.col("g"), F.col("p"))
         .write.mode("append").parquet(p))
    got = finalize_did_monitor(spark, p).collect()
    want = st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()
    assert got == want
    r = got[0]
    assert (r.n_tp, r.n_tr, r.n_cp, r.n_cr) == (3, 2, 3, 2)


# --------------------------------- end-to-end through a real file stream
def _run_stream(spark, tmp_path, rows, schema, start_fn):
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(rows, schema)
    # two source files → two micro-batches under maxFilesPerTrigger=1
    for i, part in enumerate((rows[: len(rows) // 2],
                              rows[len(rows) // 2:])):
        (spark.createDataFrame(part, schema).coalesce(1)
         .write.mode("overwrite").parquet(str(src / f"f{i}")))
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*"))
    q = start_fn(stream)
    assert q.awaitTermination(120)
    return df


def test_streaming_krippendorff_end_to_end(spark, tmp_path):
    p, c = str(tmp_path / "partials"), str(tmp_path / "ckpt")
    df = _run_stream(
        spark, tmp_path, RATING_ROWS, "u string, c string",
        lambda s: streaming_krippendorff_monitor(
            s, F.col("u"), F.col("c"), p, c))
    got = finalize_krippendorff_monitor(spark, p).collect()
    want = st.krippendorff_alpha(df, "u", "c").collect()
    assert got == want


def test_streaming_did_end_to_end(spark, tmp_path):
    p, c = str(tmp_path / "partials"), str(tmp_path / "ckpt")
    df = _run_stream(
        spark, tmp_path, DID_ROWS, "g boolean, p boolean, v double",
        lambda s: streaming_did_monitor(
            s, "v", F.col("g"), F.col("p"), p, c))
    got = finalize_did_monitor(spark, p).collect()
    want = st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()
    assert got == want


# ------------------------------------------------ refactor value pins
def test_diff_in_diff_hand_case_unchanged(spark):
    """The finalizer extraction must not move a single value: hand DiD
    for the fixture — means in exact micro-units, Welch-style SE."""
    df = spark.createDataFrame(DID_ROWS, "g boolean, p boolean, v double")
    r = st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()[0]
    m_tp, m_tr = (10.5 + 11.25 + 9.0) / 3, (8.0 + 7.5) / 2
    m_cp, m_cr = (6.125 + 5.0 + 7.0) / 3, (5.5 + 6.0) / 2
    assert r.mean_treat_post == pytest.approx(round(m_tp, 6), abs=1e-6)
    did = (m_tp - m_tr) - (m_cp - m_cr)
    assert r.did == pytest.approx(round(did, 6), abs=1e-6)


def test_diff_in_diff_small_cell_still_raises(spark):
    df = spark.createDataFrame(
        [(True, True, 1.0), (True, False, 1.0), (True, False, 2.0),
         (False, True, 1.0), (False, True, 2.0),
         (False, False, 1.0), (False, False, 2.0)],
        "g boolean, p boolean, v double")
    with pytest.raises(Exception, match="diff_in_diff"):
        st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()


# ------------------------------- at-least-once / restart idempotence
def test_did_monitor_restart_does_not_duplicate_partials(spark, tmp_path):
    """Re-running the monitor with the SAME checkpoint must not change
    the finalized result: committed offsets mean the restart processes
    nothing new, and a retried/replayed batch overwrites its own
    batch=<id> subdirectory instead of appending a second copy (the
    at-least-once fix, round-12 self-review)."""
    src = tmp_path / "src2"
    src.mkdir()
    df = spark.createDataFrame(DID_ROWS, "g boolean, p boolean, v double")
    df.coalesce(1).write.parquet(str(src / "f0"))
    p, c = str(tmp_path / "partials2"), str(tmp_path / "ckpt2")
    want = st.diff_in_diff(df, "v", F.col("g"), F.col("p")).collect()
    for _ in range(2):  # second run = restart with committed offsets
        stream = (spark.readStream.schema(df.schema)
                  .parquet(str(src) + "/*"))
        q = streaming_did_monitor(stream, "v", F.col("g"), F.col("p"),
                                  p, c)
        assert q.awaitTermination(120)
        assert finalize_did_monitor(spark, p).collect() == want


def test_partial_write_batch_retry_is_idempotent(spark, tmp_path):
    """The per-batch overwrite discipline itself: writing a batch's
    partial twice under the same batch_id (a foreachBatch retry) leaves
    exactly one copy."""
    p = str(tmp_path / "retry_partials")
    partial = spark.createDataFrame([("u1", "keep", 2)],
                                    "__u string, __c string, nuc bigint")
    for _ in range(2):
        partial.write.mode("overwrite").parquet(f"{p}/batch=7")
    got = finalize_krippendorff_monitor(spark, p).collect()[0]
    assert got.n_ratings == 2  # not 4: the retry replaced, not stacked
