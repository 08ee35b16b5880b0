"""Laws for the product-quantization ANN path (q142): seed vectors
quantize to themselves losslessly, codes are complete and in-range, and
the encoding is invariant to input partitioning. Value parity vs DuckDB
is pinned by the tail-parity sweep; these are the operator guarantees
the hash compare can't express."""

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import similarity as sim


def _emb(spark, n=64, dim=64, seed=7):
    rnd = random.Random(seed)
    rows = [Row(vec_id=i, embedding=[rnd.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows)


def test_pq_codes_complete_and_in_range(spark):
    emb = _emb(spark)
    cb = sim.pq_seed_codebook(emb)
    codes = sim.pq_encode(emb, cb).collect()
    assert len(codes) == 64 * 8  # every vector gets all m codes
    assert all(0 <= r.code < 16 and 0 <= r.j < 8 for r in codes)


def test_pq_seed_self_distance_zero(spark):
    """A seed vector's subslices ARE codewords, so it encodes losslessly
    and its ADC distance to itself is exactly 0 — the PQ analog of
    'quantization error vanishes on the codebook'."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = sim.pq_adc_topk(emb, queries, k_top=3).collect()
    rank1 = {r.query_id: r for r in top if r.rank == 1}
    assert set(rank1) == {0, 1, 2, 3}
    for qid, r in rank1.items():
        assert r.vec_id == qid
        assert r.adc_dist == 0.0


def test_pq_adc_approximates_true_distance(spark):
    """ADC distance must correlate with true squared-L2: over the top-10
    of one query the Spearman-ish ordering can't be arbitrary — check
    that ADC's nearest non-self neighbor is within the true-distance
    top quartile (a loose, deterministic recall floor for seed
    codebooks on random data)."""
    emb = _emb(spark, n=64)
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = sorted(sim.pq_adc_topk(emb, queries, k_top=5).collect(),
                 key=lambda r: r.rank)
    best = next(r for r in top if r.vec_id != 0)

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    true = sorted((l2(rows[0], v), k) for k, v in rows.items() if k != 0)
    true_rank = [k for _, k in true].index(best.vec_id)
    assert true_rank < len(true) // 4


def test_pq_encode_partitioning_invariant(spark):
    emb = _emb(spark, n=48)
    cb = sim.pq_seed_codebook(emb)
    a = sorted(map(tuple, sim.pq_encode(emb, cb).collect()))
    b = sorted(map(tuple, sim.pq_encode(emb.repartition(11), cb).collect()))
    assert a == b


def test_pq_validates_divisibility(spark):
    emb = _emb(spark, n=4, dim=10)
    with pytest.raises(ValueError, match="divisible"):
        sim.pq_seed_codebook(emb, m=8, dim=10)
