"""Round-12 overflow guard: hits_scores pre-flight (VERDICT r11 #6).

`hits_scores` keeps an exact-BIGINT fold for oracle parity; its safety
contract — worst-case score Din^rounds · Dout^(rounds−1) must fit int64
— used to depend on caller discipline. Now a pre-flight computes the
max degrees and raises BEFORE launching an iteration that could
overflow mid-job. These tests pin both sides of the guard.
"""

import pytest

from powerdatapipeline_spark.operators import graph as g


def _star(spark, fan: int):
    """One hub u0 pointing at `fan` authorities, each also pointed at by
    a long tail of distinct hubs → Din = fan for v0? Keep it simple:
    a complete bipartite K(m,m) has Din = Dout = m."""
    m = fan
    rows = [(f"u{i}", f"v{j}") for i in range(m) for j in range(m)]
    return spark.createDataFrame(rows, "src string, dst string")


def test_hits_guard_allows_safe_rounds(spark):
    e = _star(spark, 4)  # Din=Dout=4; 4^2·4 = 64 « int64
    out = g.hits_scores(e, rounds=2, top_k=10).collect()
    assert len(out) == 4
    # K(4,4): every authority is symmetric — a = 4·4 = 16 after round 2?
    # round 1: a1 = indeg = 4; h1 = Σ a1 over out-edges = 16;
    # round 2: a2 = Σ h1 = 64.
    assert all(r.authority_int == 64 for r in out)
    assert all(r.authority == 1.0 for r in out)


def test_hits_guard_raises_before_overflow(spark):
    # Din = Dout = 2^11 = 2048; rounds = 6 → bound = 2^(11·11) = 2^121
    # » int64. The graph itself is tiny by rows (m² = 4.2M edges would
    # be too big for a unit test) — use a thin construction with the
    # same max degrees: one authority with Din=2048, one hub with
    # Dout=2048.
    m = 2048
    rows = ([(f"u{i}", "vhot") for i in range(m)]
            + [("uhot", f"v{j}") for j in range(m)])
    e = spark.createDataFrame(rows, "src string, dst string")
    with pytest.raises(ValueError, match="exceeds int64"):
        g.hits_scores(e, rounds=6)


def test_hits_guard_empty_graph_no_raise(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert g.hits_scores(e, rounds=3).count() == 0


def test_hits_guard_rounds_validation_still_first(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="rounds"):
        g.hits_scores(e, rounds=0)
