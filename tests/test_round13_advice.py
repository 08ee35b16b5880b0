"""Round-13 ADVICE/VERDICT pins.

1. widen_narrow_scan no-ops on frames with shuffle lineage (the probe
   rule is enforced by plan inspection, not docstring — ADVICE r12 #2).
2. hits_scores' degree pre-flight is folded into iteration 1 (VERDICT
   r12 #2): values unchanged, guard intact, error message documents the
   bound's conservatism (ADVICE r12 #1).
3. bench.py stamps the repeat count into the compact stdout line when
   best-of-N mode is on (ADVICE r12 #5).
4. canonicalize_labels cuts the candidate-pair plan before the CC loop
   (VERDICT r12 #3): values unchanged, lineage is checkpoint-rooted.
"""

import json

import pytest

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import graph as g
from powerdatapipeline_spark.operators import relational as rel


# -------------------------------------- widen_narrow_scan shuffle guard
def test_widen_noop_on_aggregated_frame(spark):
    agged = spark.range(0, 100).groupBy("id").count().coalesce(1)
    # coalesce(1) makes it narrow — but upstream Aggregate means the
    # probe would execute the shuffle stage un-reused: must no-op
    assert rel.widen_narrow_scan(agged) is agged


def test_widen_noop_on_joined_frame(spark):
    a = spark.range(0, 100)
    b = spark.range(0, 50)
    j = a.join(b, "id").coalesce(1)
    assert rel.widen_narrow_scan(j, by="id") is j


def test_widen_still_widens_scan_rooted(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).coalesce(1)
    assert rel.widen_narrow_scan(df, by="id") is not df
    assert (rel.widen_narrow_scan(df, by="id")
            .rdd.getNumPartitions() == par)


def test_widen_widens_checkpointed_frame(spark):
    """A localCheckpoint cuts lineage to a leaf — upstream shuffles no
    longer exist in the plan, the probe is free, widening applies."""
    par = spark.sparkContext.defaultParallelism
    ck = (spark.range(0, 500).groupBy("id").count().coalesce(1)
          .localCheckpoint(eager=True))
    w = rel.widen_narrow_scan(ck, by="id")
    assert w.rdd.getNumPartitions() == par


def test_shuffle_lineage_detector_classes(spark):
    df = spark.range(0, 100)
    assert not rel._has_shuffle_lineage(df)
    assert not rel._has_shuffle_lineage(df.coalesce(1))  # narrow
    assert rel._has_shuffle_lineage(df.repartition(4))
    assert rel._has_shuffle_lineage(df.orderBy("id"))
    assert rel._has_shuffle_lineage(df.distinct())
    assert rel._has_shuffle_lineage(df.groupBy("id").count())


# ------------------------------------------- hits_scores folded guard
def test_hits_values_unchanged_by_fold(spark):
    """K(3,3) plus a pendant edge: exact integer authorities must match
    the hand-unrolled alternation (a1 = indeg, h1 = Σa1, a2 = Σh1)."""
    rows = ([(f"u{i}", f"v{j}") for i in range(3) for j in range(3)]
            + [("u0", "vp")])
    e = spark.createDataFrame(rows, "src string, dst string")
    out = {r.node: r.authority_int
           for r in g.hits_scores(e, rounds=2, top_k=10).collect()}
    # a1: v0..v2 = 3, vp = 1. h1: u0 = 3+3+3+1 = 10, u1/u2 = 9.
    # a2: v0..v2 = 10+9+9 = 28, vp = 10.
    assert out == {"v0": 28, "v1": 28, "v2": 28, "vp": 10}


def test_hits_rounds_1_is_indegree(spark):
    e = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y")], "src string, dst string")
    out = {r.node: r.authority_int
           for r in g.hits_scores(e, rounds=1, top_k=10).collect()}
    assert out == {"x": 2, "y": 1}


def test_hits_guard_message_documents_conservatism(spark):
    m = 2048
    rows = ([(f"u{i}", "vhot") for i in range(m)]
            + [("uhot", f"v{j}") for j in range(m)])
    e = spark.createDataFrame(rows, "src string, dst string")
    with pytest.raises(ValueError, match="CONSERVATIVE"):
        g.hits_scores(e, rounds=6)


# --------------------------------------------- bench repeat stamping
def test_bench_compact_line_carries_repeat():
    from bench import build_payloads

    timings = {"q1_x": 1.0, "q2_y": 2.0}
    detail, line = build_payloads(timings, 0.1, repeat=3)
    assert detail["repeat"] == 3
    assert json.loads(line)["repeat"] == 3


def test_bench_single_pass_line_has_no_repeat_key():
    from bench import build_payloads

    detail, line = build_payloads({"q1_x": 1.0}, 0.1)
    assert "repeat" not in detail
    assert "repeat" not in json.loads(line)


# ------------------------------------- canonicalize_labels plan cut
def test_canonicalize_labels_values_and_cut(spark):
    # blocking key is the LAST token (head noun), so variants must
    # share it: typos live in the qualifier
    df = spark.createDataFrame(
        [("color pen",)] * 5 + [("colour pen",)] * 2 + [("colr pen",)]
        + [("shade pen x",)] * 3,
        ["v"])
    out = {r.value: (r.canonical, r.cluster_size)
           for r in dd.canonicalize_labels(df, "v").collect()}
    # "color pen" (n=5) dominates its cluster of three variants
    assert out["color pen"] == ("color pen", 3)
    assert out["colour pen"] == ("color pen", 3)
    assert out["colr pen"] == ("color pen", 3)
    assert "shade pen x" not in out  # singleton never enters the graph
