"""Round-12 narrow-scan widening pins (SCALE.md round-12 section).

`widen_narrow_scan` must (a) actually widen a narrow input to the
session's parallelism EVEN under AQE partition coalescing — the
explicit-count repartition (REPARTITION_BY_NUM) is load-bearing,
because AQE collapses a numberless keyed repartition of a small-bytes
shuffle straight back to one partition — and (b) be a NO-OP when the
input already arrives at least as wide as the session, so production
plans gain no shuffle.
"""

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators.relational import widen_narrow_scan


def test_widen_narrow_input_reaches_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    w = widen_narrow_scan(df, by="id")
    # the count must survive AQE: collect partition sizes at runtime
    sizes = w.rdd.glom().map(len).collect()
    assert len(sizes) == par, (
        f"widened to {len(sizes)} partitions, want {par} — AQE "
        "coalesced the repartition; the explicit count regressed")
    assert sum(sizes) == 1000


def test_widen_is_noop_on_wide_input(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par + 4)
    w = widen_narrow_scan(df, by="id")
    # same plan object — no shuffle inserted
    assert w is df


def test_widen_keyless_roundrobin(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 257).coalesce(1)
    w = widen_narrow_scan(df)
    sizes = w.rdd.glom().map(len).collect()
    assert len(sizes) == par and sum(sizes) == 257


def test_widen_preserves_values(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k bigint, s string"
    ).coalesce(1)
    got = sorted(widen_narrow_scan(df, by="k").collect())
    assert got == sorted(df.collect())


def test_spread_delegates(spark):
    from powerdatapipeline_spark.operators.text import _spread

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 100).coalesce(1)
    assert _spread(df).rdd.getNumPartitions() == par
