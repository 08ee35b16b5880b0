"""ANSI-on overflow contracts (VERDICT r10 #1-#4).

The driver runs a vanilla Spark 4 session where ``spark.sql.ansi.enabled``
defaults to TRUE, while the engine's ``get_spark`` pins it off. Two
BIGINT-accumulator folds passed every ANSI-off gate and then failed (or
would fail) the driver run:

- ``graph.connected_components``'s convergence checksum summed raw
  xxhash64 values (sum of n uniform int64 → overflow w.p. → 1);
- ``relational.shard_manifest``'s order checksum summed
  ``pos · small_hash`` terms that reach ~1e15 per row at 1e9-row shards.

Both now accumulate in decimal(38,0). These tests run the REAL code paths
under ``spark.sql.ansi.enabled=true`` with inputs sized so the old BIGINT
accumulator provably overflowed, so a regression raises
ARITHMETIC_OVERFLOW here before the driver sees it.
"""

import contextlib

import pyspark.sql.functions as F
import pytest

from powerdatapipeline_spark.operators import graph as gr
from powerdatapipeline_spark.operators import relational as rel


@contextlib.contextmanager
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_cc_checksum_survives_ansi_with_overflowing_hash_sum(spark):
    # pick disjoint edges (i, i+10000) whose xxhash64 each exceeds 2^61:
    # any 5+ of them sum past 2^63-1, so the old BIGINT fold overflowed
    # on the very first checksum() call under ANSI.
    cand = (spark.range(0, 5000)
            .select(F.col("id").alias("src"),
                    (F.col("id") + 10_000).alias("dst"))
            .where(F.xxhash64(F.col("src"), F.col("dst"))
                   > F.lit(2 ** 61).cast("bigint"))
            .limit(8))
    rows = cand.collect()
    assert len(rows) == 8, "uniform hashes must yield enough candidates"
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    with ansi(spark):
        got = {(r.node, r.label)
               for r in gr.connected_components(edges).collect()}
    want = ({(r.src, r.src) for r in rows}
            | {(r.dst, r.src) for r in rows})
    assert got == want


def test_order_checksum_fold_exact_past_int64_under_ansi(spark):
    # pos ~ 1e9 (realistic shard positions at 100 TB) x hash ~ 1e6:
    # each term ~1e15, 20k such terms sum to ~2e19 > int64 max. The
    # decimal fold must return the EXACT mod-2^63 residue.
    n, pos0, h = 20_000, 10 ** 9, 1_000_000
    df = (spark.range(0, n)
          .select((F.col("id") + pos0).alias("pos"),
                  F.lit(h).cast("bigint").alias("ck")))
    exact = sum((pos0 + i) * h for i in range(n))
    assert exact > 2 ** 63 - 1  # the old BIGINT fold overflowed here
    with ansi(spark):
        got = df.agg(rel.order_checksum_fold(
            F.col("pos"), F.col("ck")).alias("c")).collect()[0]["c"]
    assert got == exact % (2 ** 63)


def test_shard_manifest_matches_pandas_reference_under_ansi(spark):
    # end-to-end value pin for the reworked checksum at test scale
    # (values identical to the old fold whenever it did not overflow)
    import hashlib

    keys = [f"doc{i:04d}" for i in range(400)]
    df = spark.createDataFrame([(k, len(k)) for k in keys],
                               "doc_id string, n_chars int")
    with ansi(spark):
        got = {r.shard_id: (r.n_rows, r.order_checksum, r.total_size)
               for r in rel.shard_manifest(df, "doc_id", 8,
                                           size_col="n_chars").collect()}

    def md5_int(s, nhex):
        return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)

    import collections
    per = collections.defaultdict(list)
    for k in keys:
        sid = md5_int(k, 8) % 8
        u = (md5_int("|order" + k, 15) + 1) / 2 ** 60
        per[sid].append((u, k))
    want = {}
    for sid, lst in per.items():
        lst.sort()
        ck = sum((i + 1) * (md5_int("|ck" + k, 8) % 1_000_003)
                 for i, (_, k) in enumerate(lst)) % 2 ** 63
        want[sid] = (len(lst), ck, sum(len(k) for _, k in lst))
    assert got == want


def test_hits_rounds_validation_and_no_wasted_final_hub(spark):
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="rounds"):
        gr.hits_scores(edges, rounds=0)
    # rounds=1 is plain in-degree authority (h0 = 1 for every source)
    got = {r.node: r.authority_int
           for r in gr.hits_scores(edges, rounds=1).collect()}
    assert got == {10: 2, 11: 1}
