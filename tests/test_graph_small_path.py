"""Round-15 small-graph fast paths: every iterative graph operator runs
a single-task exact twin (union-find / in-memory peel / integer
iteration via one mapInPandas task) when its materialized edge count is
at/below GRAPH_SMALL_MAX_ROWS. These tests pin fast ≡ distributed on
randomized graphs (including the bit-sensitive pagerank decimal
trajectory), the env/argument pins, and the contract edges (raises,
self-loops, strings).

The distributed forms additionally stay DuckDB-oracle-verified by the
env-pinned parity sweep artifact (PARITY_graphdist_* — see
OPTIMIZATION_r15.md)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import graph as gr


@pytest.fixture(scope="module")
def spark():
    from powerdatapipeline_spark.session import get_spark
    s = get_spark("test_graph_small_path", master="local[4]",
                  shuffle_partitions=4)
    yield s


def _edges(spark, pairs, typ="bigint"):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], f"src {typ}, dst {typ}")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _random_graph(seed, n_nodes=40, n_edges=80):
    rng = random.Random(seed)
    return [(rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_fast_equals_distributed(spark, seed):
    e = _edges(spark, _random_graph(seed))
    fast = gr.connected_components(e)
    dist = gr.connected_components(e, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_cc_fast_handles_self_loops_and_strings(spark):
    pairs = [("b", "a"), ("c", "b"), ("x", "x"), ("m", "z"), ("z", "q")]
    e = _edges(spark, pairs, typ="string")
    fast = gr.connected_components(e)
    dist = gr.connected_components(e, small_max_rows=0)
    assert _rows(fast) == _rows(dist)
    got = dict(fast.collect())
    assert got["x"] == "x" and got["c"] == "a" and got["q"] == "m"


@pytest.mark.parametrize("seed,iterations", [(1, 1), (2, 3), (3, 5),
                                             (4, 6)])
def test_pagerank_fast_bit_identical(spark, seed, iterations):
    # symmetrize so the dangling guard passes; the decimal trajectory
    # (6-rounded vectors, 12-decimal HALF_UP contributions) must match
    # the distributed unroll BIT FOR BIT, not approximately
    raw = _random_graph(seed, n_nodes=30, n_edges=60)
    pairs = [(a, b) for a, b in raw if a != b]
    sym = list(dict.fromkeys(pairs + [(b, a) for a, b in pairs]))
    e = _edges(spark, sym)
    fast = gr.pagerank(e, iterations=iterations)
    dist = gr.pagerank(e, iterations=iterations, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_pagerank_fast_dangling_raises(spark):
    e = _edges(spark, [(1, 2), (2, 3)])  # 3 has no out-edge
    with pytest.raises(ValueError, match="without out-edges"):
        gr.pagerank(e).count()


@pytest.mark.parametrize("seed,k", [(1, 2), (2, 3), (3, 2)])
def test_kcore_fast_equals_distributed(spark, seed, k):
    e = _edges(spark, _random_graph(seed, n_nodes=25, n_edges=70))
    fast = gr.k_core(e, k=k)
    dist = gr.k_core(e, k=k, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_kcore_fast_keeps_round_budget_raise(spark):
    # a long path peels one layer per synchronous round — the fast
    # path must exhaust max_rounds exactly like the distributed form
    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="max_rounds"):
        gr.k_core(chain, k=2, max_rounds=1).count()


@pytest.mark.parametrize("seed,rounds", [(1, 1), (2, 2), (3, 3)])
def test_hits_fast_equals_distributed(spark, seed, rounds):
    e = _edges(spark, _random_graph(seed, n_nodes=20, n_edges=60))
    fast = gr.hits_scores(e, rounds=rounds, top_k=50)
    dist = gr.hits_scores(e, rounds=rounds, top_k=50, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_hits_fast_keeps_overflow_guard(spark):
    hub = _edges(spark, [(i, 0) for i in range(2100)]
                 + [(0, i + 10_000) for i in range(2100)])
    with pytest.raises(ValueError, match="exceeds int64"):
        gr.hits_scores(hub, rounds=4).count()


@pytest.mark.parametrize("seed,rounds", [(1, 1), (2, 2), (3, 4)])
def test_lpa_fast_equals_distributed(spark, seed, rounds):
    e = _edges(spark, _random_graph(seed, n_nodes=30, n_edges=70))
    fast = gr.label_propagation(e, rounds=rounds, top_k=100)
    dist = gr.label_propagation(e, rounds=rounds, top_k=100,
                                small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_lpa_fast_string_nodes(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("p", "q"), ("q", "p")]
    e = _edges(spark, pairs, typ="string")
    fast = gr.label_propagation(e, rounds=2, top_k=10)
    dist = gr.label_propagation(e, rounds=2, top_k=10, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_triangle_fast_equals_distributed(spark, seed):
    e = _edges(spark, _random_graph(seed, n_nodes=25, n_edges=70))
    fast = gr.triangle_count(e)
    dist = gr.triangle_count(e, small_max_rows=0)
    assert _rows(fast) == _rows(dist)


def test_triangle_fast_hub_and_strings(spark):
    pairs = ([("h", f"n{i}") for i in range(30)]
             + [(f"n{i}", f"n{i + 1}") for i in range(29)])
    e = _edges(spark, pairs, typ="string")
    assert _rows(gr.triangle_count(e)) == _rows(
        gr.triangle_count(e, small_max_rows=0))


def test_env_zero_disables_fast_paths(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_SMALL_MAX_ROWS", "0")
    assert gr._small_max_rows(None) == 0
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_SMALL_MAX_ROWS", "123")
    assert gr._small_max_rows(None) == 123
    # explicit argument beats the env
    assert gr._small_max_rows(0) == 0
    # hard int64-headroom cap applies to both
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_SMALL_MAX_ROWS",
                       str(10 ** 9))
    assert gr._small_max_rows(None) == gr._FAST_PATH_HARD_MAX_ROWS
    assert gr._small_max_rows(10 ** 9) == gr._FAST_PATH_HARD_MAX_ROWS


def test_round_half_up_matches_spark_semantics():
    # shortest-repr HALF_UP — the replay-model identity (tests/_hyp)
    assert gr._round_half_up(0.1234565, 6) == 0.123457  # HALF_UP, not half-even
    assert gr._round_half_up(2.5e-7, 6) == 0.0  # .00000025 < half a quantum
    assert gr._round_half_up(1.0 / 3.0, 6) == 0.333333
