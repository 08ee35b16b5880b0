"""Round-13 global_prefix + unpartitioned-window gate (VERDICT r12 #4).

`relational.global_prefix` replaces the single-task
``Window.orderBy(...)`` (no partitionBy) for corpus-sized frames with
a deterministic two-pass prefix: equal-width value buckets of the
first order key (order-contiguous, sampling-free — safe to plan twice
under AQE), per-bucket windows, and a ≤B-row offset broadcast. These
tests pin (a) exact equivalence with the single-task window for row
numbers and running sums across key types, (b) the four operators
rewritten on top of it, and (c) the dump_plans detector that
distinguishes raw-row global windows (red flag) from
aggregate-bounded summary windows (documented pattern).
"""

import random
import string

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import timeseries as ts
from powerdatapipeline_spark.operators.relational import (
    global_prefix, zorder_code, zorder_layout_audit)


def _single_task(df, order, sums=None, rn=None):
    w = Window.orderBy(*order)
    wall = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for name, src in (sums or {}).items():
        out = out.withColumn(name, F.sum(src).over(wall))
    if rn:
        out = out.withColumn(rn, F.row_number().over(w).cast("bigint"))
    return out


def test_rn_matches_single_task_numeric(spark):
    random.seed(13)
    vals = random.sample(range(100000), 700)
    df = spark.createDataFrame([(v, v * 7 % 991) for v in vals],
                               "k bigint, s bigint")
    got = {r.k: r.rn for r in
           global_prefix(df, ["s", "k"], rn_col="rn").collect()}
    want = {r.k: r.rn for r in
            _single_task(df, ["s", "k"], rn="rn").collect()}
    assert got == want


def test_sums_match_single_task(spark):
    random.seed(17)
    vals = random.sample(range(100000), 400)
    df = spark.createDataFrame([(v, v % 13) for v in vals],
                               "k bigint, nt bigint")
    got = {r.k: r.ct for r in
           global_prefix(df, ["k"],
                         sums={"ct": F.col("nt")}).collect()}
    want = {r.k: r.ct for r in
            _single_task(df, ["k"],
                         sums={"ct": F.col("nt")}).collect()}
    assert got == want


def test_rn_matches_single_task_string_key(spark):
    random.seed(19)
    words = list({"".join(random.choice(string.ascii_lowercase)
                          for _ in range(random.randint(1, 12)))
                  for _ in range(300)})
    df = spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                               "w string, i bigint")
    got = {r.i: r.rn for r in
           global_prefix(df, ["w", "i"], rn_col="rn").collect()}
    want = {r.i: r.rn for r in
            _single_task(df, ["w", "i"], rn="rn").collect()}
    assert got == want


def test_string_prefix_vs_extension_ordering(spark):
    """A strict prefix must rank before its extensions even when the
    7-byte projection ties them into one bucket (rpad-with-zero keeps
    the projection <=; the in-bucket sort settles the rest)."""
    df = spark.createDataFrame(
        [("aaaaaaa", 1), ("aaaaaaab", 2), ("aaaaaaac", 3),
         ("b", 4), ("", 5)], "w string, i bigint")
    got = {r.w: r.rn for r in
           global_prefix(df, ["w", "i"], rn_col="rn").collect()}
    assert got == {"": 1, "aaaaaaa": 2, "aaaaaaab": 3,
                   "aaaaaaac": 4, "b": 5}


def test_empty_and_single_row(spark):
    e = spark.createDataFrame([], "k bigint")
    assert global_prefix(e, ["k"], rn_col="rn").count() == 0
    one = spark.createDataFrame([(42,)], "k bigint")
    assert global_prefix(one, ["k"], rn_col="rn").collect()[0].rn == 1


def test_unsupported_key_type_raises(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(ValueError, match="unsupported"):
        global_prefix(df, ["a"], rn_col="rn")


def test_nothing_requested_raises(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="nothing requested"):
        global_prefix(df, ["k"])


def test_no_unpartitioned_window_in_plan(spark):
    """The helper's own plan must not contain a raw-row unpartitioned
    window — that is the defect it exists to remove."""
    from tools.dump_plans import unpartitioned_windows

    df = spark.range(0, 1000).withColumn("s", F.col("id") % 97)
    out = global_prefix(df, ["s", "id"], rn_col="rn",
                    small_input_bytes=0)
    txt = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    raw, bounded = unpartitioned_windows(txt)
    assert raw == 0
    # the ≤B-row offsets prefix IS the one intended bounded window
    assert bounded >= 1


def test_detector_flags_raw_global_window(spark, sf_dir):
    """Sanity: the detector DOES flag the shape the rewrites removed."""
    from tools.dump_plans import unpartitioned_windows

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = df.withColumn("rn",
                        F.row_number().over(Window.orderBy("o_orderkey")))
    txt = bad._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    raw, _ = unpartitioned_windows(txt)
    assert raw == 1


# ------------------------- operators rewritten on global_prefix -----
def test_zip_by_position_values(spark):
    l = spark.createDataFrame([(i, f"a{i}") for i in range(120)],
                              "ol int, a string")
    r = spark.createDataFrame([(i * 2, f"b{i}") for i in range(100)],
                              "orr int, b string")
    z = ts.zip_by_position(l, r, "ol", "orr").orderBy("ol").collect()
    # truncates to the shorter side (tf.data zip semantics)
    assert len(z) == 100
    assert all(row.a == f"a{i}" and row.b == f"b{i}"
               for i, row in enumerate(z))


def test_sorted_neighborhood_values(spark):
    random.seed(23)
    vals = random.sample(range(10000), 300)
    df = spark.createDataFrame([(v, v * 3 % 997) for v in vals],
                               "k bigint, s bigint")
    got = {(r.key_a, r.key_b)
           for r in dd.sorted_neighborhood_pairs(df, "k", "s",
                                                 window=3).collect()}
    rnk = sorted(vals, key=lambda v: (v * 3 % 997, v))
    want = {(v, rnk[j]) for i, v in enumerate(rnk)
            for j in range(i + 1, min(i + 3, len(rnk)))}
    assert got == want


def test_zorder_ntile_exact_sql_semantics(spark):
    """file assignment must replicate SQL ntile exactly: sizes differ
    by <= 1 with LARGER buckets FIRST, boundaries by rank."""
    random.seed(29)
    for n, k in [(500, 7), (5, 7), (100, 10)]:
        vals = random.sample(range(100000), n)
        df = spark.createDataFrame([(v, v * 3 % 997) for v in vals],
                                   "x bigint, y bigint")
        zc = df.withColumn("z", zorder_code(F.col("x"), F.col("y"), 17))
        old = zc.withColumn(
            "f", F.ntile(k).over(Window.orderBy("z", "x", "y")))
        from collections import Counter
        oldc = Counter(r.f for r in old.collect())
        newrows = zorder_layout_audit(df, F.col("x"), F.col("y"), k,
                                      bits=17).collect()
        assert {r.file_id: r.n_rows for r in newrows} == dict(oldc)


def test_plans_artifact_has_zero_red_flags():
    """Gate on the committed artifact (the VERDICT r12 #4 'true by
    gate, not by review' ask): PLANS.md must report zero red-flag
    queries — including zero raw-row unpartitioned windows — across
    the full registry. Regenerate with tools/dump_plans.py after any
    operator change."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    txt = open(path).read()
    assert "RED FLAG: unpartitioned" not in txt
    assert "Red-flag queries: 0" in txt


def test_heaps_law_runs_and_is_sane(spark):
    df = spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 5) + f"w{i} z{i*7%31}")
         for i in range(60)], ["doc_id", "text"])
    from powerdatapipeline_spark.operators.text import heaps_law_fit
    r = heaps_law_fit(df).collect()[0]
    assert r.n_points == 60
    assert r.total_tokens > r.total_vocab > 0
    assert 0.0 < r.beta < 1.0
