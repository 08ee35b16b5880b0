"""Unit laws for the round-8 layout/batching operators: deterministic
shard assignment, Z-order interleaving, length-bucketed batch assembly,
and temperature-scaled mixtures. The DuckDB value parity for q138-q141
lives in the tail-parity sweep; these tests pin the operator LAWS the
oracle compare can't see (invariance to partitioning, envelope tightness
vs a single-column sort, bucket bounds)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import text as tx


# ---------------------------------------------------------------- shards

def _docs(spark, n=200):
    return spark.createDataFrame(
        [Row(doc_id=i, payload=f"text {i} " * (i % 7 + 1)) for i in range(n)])


def test_shard_assign_total_order_and_stability(spark):
    df = _docs(spark)
    a = rel.shard_assign(df, "doc_id", n_shards=8)
    rows = a.select("doc_id", "shard_id", "shard_pos").collect()
    assert len(rows) == 200
    # positions within a shard are 1..n, dense and unique
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # repartitioning the input must not change a single assignment
    b = rel.shard_assign(df.repartition(13), "doc_id", n_shards=8)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, b.select("doc_id", "shard_id", "shard_pos").collect()))


def test_shard_assign_salt_changes_order_not_balance(spark):
    df = _docs(spark)
    a = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in rel.shard_assign(df, "doc_id", 8).collect()}
    c = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in rel.shard_assign(df, "doc_id", 8, salt="v2").collect()}
    assert a != c  # a new salt re-deals the corpus


def test_shard_manifest_checksum_is_order_sensitive(spark):
    df = _docs(spark, 64)
    m = {r.shard_id: (r.n_rows, r.order_checksum)
         for r in rel.shard_manifest(df, "doc_id", 4).collect()}
    assert sum(n for n, _ in m.values()) == 64
    # same membership, different intra-shard order (different order salt
    # via a changed global salt) => different checksum for some shard
    m2 = {r.shard_id: (r.n_rows, r.order_checksum)
          for r in rel.shard_manifest(df, "doc_id", 4, salt="x").collect()}
    assert m != m2


def test_shard_assign_validates_n_shards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        rel.shard_assign(_docs(spark, 4), "doc_id", 0)


# ---------------------------------------------------------------- zorder

def test_zorder_code_known_values(spark):
    df = spark.createDataFrame([Row(x=0, y=0), Row(x=1, y=0), Row(x=0, y=1),
                                Row(x=3, y=5), Row(x=65535, y=65535)])
    out = df.select("x", "y",
                    rel.zorder_code(F.col("x"), F.col("y"), 16).alias("z"))
    got = {(r.x, r.y): r.z for r in out.collect()}

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)


def test_zorder_envelopes_tighter_than_single_sort(spark):
    # a grid where x and y are independent: sorting by x alone leaves the
    # per-file y-envelope at full width; z-order must shrink BOTH
    rows = [Row(x=i, y=j) for i in range(32) for j in range(32)]
    df = spark.createDataFrame(rows)
    z = rel.zorder_layout_audit(df, F.col("x"), F.col("y"),
                                n_files=16, bits=8).collect()
    avg_y_span = sum(r.y_max - r.y_min for r in z) / len(z)
    assert avg_y_span < 31  # single-column x-sort would leave 31 everywhere
    avg_x_span = sum(r.x_max - r.x_min for r in z) / len(z)
    assert avg_x_span < 31
    assert sum(r.n_rows for r in z) == 1024


def test_zorder_validates_bits(spark):
    df = spark.createDataFrame([Row(x=1, y=1)])
    with pytest.raises(ValueError, match="bits"):
        df.select(rel.zorder_code(F.col("x"), F.col("y"), 0))


# -------------------------------------------------------------- batching

def test_length_buckets_pow2_law(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="word " * i) for i in range(1, 120)])
    out = tx.length_bucketed_batches(df, batch_size=8).collect()
    for r in out:
        assert r.length_bucket >= max(r.n_pieces, 1)
        if r.n_pieces > 1:
            assert r.length_bucket < 2 * r.n_pieces  # pow-2 ceiling, tight
        assert 0 <= r.batch_pos < 8
    # batch ids are consistent: every batch holds docs of ONE bucket
    seen = {}
    for r in out:
        seen.setdefault(r.batch_id, set()).add(r.length_bucket)
    assert all(len(s) == 1 for s in seen.values())


def test_batch_padding_report_bounds(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="tok " * (i % 40 + 1)) for i in range(1, 200)])
    rep = tx.batch_padding_report(df, batch_size=8).collect()
    assert sum(r.n_docs for r in rep) == 199
    for r in rep:
        assert r.padding_waste == r.n_docs * r.max_pieces - r.sum_pieces
        assert 0 <= r.pad_ratio < 0.5 + 1e-9  # pow-2 bucket bounds waste


def test_batching_invariant_to_partitioning(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="a " * (i % 31 + 1)) for i in range(150)])
    a = sorted(map(tuple, tx.length_bucketed_batches(df).collect()))
    b = sorted(map(tuple,
                   tx.length_bucketed_batches(df.repartition(17)).collect()))
    assert a == b


def test_batch_size_validated(spark):
    with pytest.raises(ValueError, match="batch_size"):
        tx.length_bucketed_batches(_docs(spark, 3), text_col="payload",
                                   batch_size=0)


# -------------------------------------------------------------- mixture

def test_temperature_mixture_alpha_limits(spark):
    df = spark.createDataFrame(
        [Row(source=f"s{i % 3}", n=1) for i in range(60)]
        + [Row(source="s0", n=1) for _ in range(60)])
    # alpha=1: weights == natural shares
    nat = rel.temperature_mixture(df, "source", alpha=1.0).collect()
    for r in nat:
        assert abs(r.mixture_weight - r.natural_share) <= 2e-6
    # alpha=0: uniform weights regardless of size
    uni = rel.temperature_mixture(df, "source", alpha=0.0).collect()
    for r in uni:
        assert abs(r.mixture_weight - 1 / 3) <= 2e-6
    # weights sum to ~1 and shrink toward uniform as alpha drops
    mid = {r.stratum: r.mixture_weight
           for r in rel.temperature_mixture(df, "source", alpha=0.5).collect()}
    assert abs(sum(mid.values()) - 1.0) <= 1e-5
    nat_w = {r.stratum: r.mixture_weight for r in nat}
    assert mid["s0"] < nat_w["s0"]  # head source down-weighted
    assert mid["s1"] > nat_w["s1"]  # tail sources up


def test_temperature_mixture_budget_columns(spark):
    df = spark.createDataFrame(
        [Row(source="a", sz=10), Row(source="a", sz=30), Row(source="b", sz=60)])
    out = {r.stratum: r for r in rel.temperature_mixture(
        df, "source", size_col="sz", alpha=0.5,
        token_budget=1000).collect()}
    assert out["a"].n_size == 40 and out["b"].n_size == 60
    for r in out.values():
        assert r.expected_size == int(1000 * r.mixture_weight)
        assert abs(r.oversample_factor
                   - 1000 * r.mixture_weight / r.n_size) <= 1e-6


def test_temperature_mixture_validates_alpha(spark):
    with pytest.raises(ValueError, match="alpha"):
        rel.temperature_mixture(_docs(spark, 3), "payload", alpha=1.5)
