"""PageRank (operators/graph.py) semantics on tiny planted graphs — the
oracle-parity sweep proves cross-engine value equality at fixture scale;
these pin the algorithm itself against an independent pure-python replay
with the identical per-iteration rounding discipline."""

import pytest
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import graph as gr


def _round_half_up(x, places):
    """Engine-style round: Spark/DuckDB round() is HALF-UP on the
    decimal rendering; Python's built-in round is banker's — the two
    diverge exactly at .5 boundaries (measured: the K1,3 hub rank hits
    0.6208125 at iteration 3)."""
    from decimal import ROUND_HALF_UP, Decimal
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _replay(edges, iterations=3, damping=0.85):
    from decimal import ROUND_HALF_UP, Decimal
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: _round_half_up(1.0 / n, 6) for v in nodes}
    base = _round_half_up(_round_half_up(1.0 - damping, 6) / n, 12)
    q12 = Decimal(1).scaleb(-12)
    for _ in range(iterations):
        inc = {v: Decimal(0) for v in nodes}
        for s, d in edges:
            # the engines' cast(double as decimal(28,12)) — half-up at 12
            inc[d] += Decimal(repr(r[s] / outdeg[s])).quantize(
                q12, rounding=ROUND_HALF_UP)
        r = {v: _round_half_up(base + damping * float(inc[v]), 6)
             for v in nodes}
    return r


def test_pagerank_matches_replay_on_star(spark):
    """Symmetrized star K1,3: the hub must outrank the leaves, and every
    value matches the python replay of the same rounded recurrence."""
    raw = spark.createDataFrame(
        [("hub", "a"), ("hub", "b"), ("hub", "c")], "src string, dst string")
    e = gr.symmetrize(raw)
    got = {r["node"]: r["rank"] for r in gr.pagerank(e, 3).collect()}
    edges = [("hub", x) for x in "abc"] + [(x, "hub") for x in "abc"]
    want = _replay(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert got["hub"] > got["a"] == got["b"] == got["c"]
    # total mass stays ~1 (rounding drift only)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_rejects_dangling_nodes(spark):
    """A directed edge list with a sink node must fail loudly, not
    silently leak rank mass."""
    raw = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="out-edges"):
        gr.pagerank(raw, 1)
    with pytest.raises(ValueError, match="iteration"):
        gr.pagerank(gr.symmetrize(raw), 0)


def test_symmetrize_dedups_both_orientations(spark):
    raw = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")],
        "src string, dst string")
    got = {(r["src"], r["dst"]) for r in gr.symmetrize(raw).collect()}
    assert got == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


# --------------------------------------------------------------------------
# triangle counting (round 8e)
# --------------------------------------------------------------------------

def _edges(spark, pairs):
    from pyspark.sql import Row
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_triangle_count_k4(spark):
    from powerdatapipeline_spark.operators import graph as gr
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(4) if a < b])
    r = gr.triangle_count(k4).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"],
            r["n_triangles"]) == (4, 6, 12, 4)
    assert r["global_clustering"] == 1.0


def test_triangle_count_triangle_free(spark):
    from powerdatapipeline_spark.operators import graph as gr
    # bipartite C4: 4 nodes in a square, zero triangles
    c4 = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = gr.triangle_count(c4).collect()[0]
    assert r["n_triangles"] == 0 and r["global_clustering"] == 0.0


def test_triangle_count_dedupes_and_ignores_direction(spark):
    from powerdatapipeline_spark.operators import graph as gr
    # one triangle given with duplicates, reversed edges, and a self-loop
    messy = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)])
    r = gr.triangle_count(messy).collect()[0]
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_triangle_count_hub_star_plus_triangle(spark):
    from powerdatapipeline_spark.operators import graph as gr
    # a 20-leaf hub star (no triangles) + one disjoint triangle:
    # degree orientation points each hub edge AT the hub, so the wedge
    # join at the hub materializes zero rows despite the skew
    pairs = [(100, i) for i in range(20)] + [(200, 201), (201, 202),
                                             (200, 202)]
    r = gr.triangle_count(_edges(spark, pairs)).collect()[0]
    assert r["n_triangles"] == 1
