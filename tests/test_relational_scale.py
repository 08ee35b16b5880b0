"""Scale-mechanics tests for relational operators: salted joins equal plain
joins, offset/limit semantics, bucketed writes produce exchange-free
co-located joins, and broadcast hints reach the physical plan."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left: 900 rows of key 1, few others
    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(900)] + [Row(k=i, v=i) for i in range(2, 10)])
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(0, 10)])
    plain = left.join(right, "k").groupBy("k").count()
    salted = rel.salted_join(left, right, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([Row(k=1, v=1), Row(k=99, v=2)])
    right = spark.createDataFrame([Row(k=1, name="a")])
    out = rel.salted_join(left, right, "k", how="left").collect()
    by_k = {r.k: r.name for r in out}
    assert by_k == {1: "a", 99: None}
    assert len(out) == 2  # left rows never duplicated by salting


def test_offset_limit(spark):
    df = spark.range(100).withColumnRenamed("id", "x")
    out = rel.offset_limit(df, [F.col("x")], offset=45, limit=3)
    assert [r.x for r in out.collect()] == [45, 46, 47]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed-by-key tables co-locate join rows at WRITE time: the join
    plan must contain SortMergeJoin with NO Exchange on either side — the
    100 TB recipe for repeated large-fact joins (write once bucketed, join
    many times shuffle-free)."""
    big = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (big.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
            .saveAsTable("t_big_bucketed"))
        (dim.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
            .saveAsTable("t_dim_bucketed"))
        joined = spark.table("t_big_bucketed").join(
            spark.table("t_dim_bucketed"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_big_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_dim_bucketed")


def test_broadcast_hint_reaches_plan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    joined = rel.join_dim(li, part, on=[li.l_partkey == part.p_partkey])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_top_k_uses_take_ordered(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = rel.top_k(orders, [F.col("o_totalprice").desc()], 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # local top-k + merge, no global sort
    assert out.count() == 5


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    out = rel.hash_split(df, "k")
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 5000 == pytest.approx(0.8, abs=0.03)
    assert counts["val"] / 5000 == pytest.approx(0.1, abs=0.02)
    # deterministic: identical assignment on re-run and after repartition
    a = {r.k: r.split for r in out.collect()}
    b = {r.k: r.split for r in rel.hash_split(df.repartition(7), "k").collect()}
    assert a == b
    # salt changes the assignment (independent re-splits)
    c = {r.k: r.split for r in rel.hash_split(df, "k", salt="v2").collect()}
    assert a != c
    with pytest.raises(ValueError):
        rel.hash_split(df, "k", fractions={"train": 0.5, "test": 0.1})


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Writing partitioned by a coarse time key lets Catalyst prune whole
    directories at planning time: the scan's PartitionFilters must carry the
    predicate and the pruned plan must read fewer files — the layout that
    makes a 100 TB time-range query touch only its days."""
    out = str(tmp_path / "events_by_day")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("day"),
        (F.col("id") * 1.5).alias("value"))
    df.write.partitionBy("day").mode("overwrite").parquet(out)
    pruned = spark.read.parquet(out).where(F.col("day") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (directory pruning at
    # planning time), NOT in PushedFilters/post-scan Filter
    assert "PartitionFilters" in plan
    pf_section = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "day" in pf_section
    assert pruned.count() == 100


def test_stratified_hash_sample(spark):
    """Per-stratum rates hold approximately; membership is deterministic
    (same keys survive on re-run); rate 1.0 keeps the whole stratum and
    rate 0.0 (the default) drops strata not listed."""
    df = spark.createDataFrame(
        [Row(k=i, s="a" if i % 2 == 0 else ("b" if i % 4 == 1 else "c"))
         for i in range(2000)])
    out = rel.stratified_hash_sample(df, "k", "s", {"a": 1.0, "b": 0.25})
    counts = {r.s: r.c for r in out.groupBy("s").agg(
        F.count("*").alias("c")).collect()}
    assert counts["a"] == 1000                     # rate 1.0: all kept
    assert "c" not in counts                       # default_rate 0: dropped
    assert 75 <= counts["b"] <= 175                # ~0.25 of 500
    again = {r.k for r in rel.stratified_hash_sample(
        df, "k", "s", {"a": 1.0, "b": 0.25}).collect()}
    assert again == {r.k for r in out.collect()}   # no RNG state
    with pytest.raises(ValueError, match="rate"):
        rel.stratified_hash_sample(df, "k", "s", {"a": 1.5})


def test_partial_rollup_merge_equals_full_recompute(spark):
    """merge_rollups(partial_rollup(shard_i)) is bit-identical to
    partial_rollup(full) for any sharding — the decomposable-measure
    invariant incremental maintenance (q134) rests on. Includes an empty
    shard (no rows contributed) and a singleton shard."""
    from powerdatapipeline_spark.operators import relational as rel
    rows = [(i % 4, f"t{i % 3}", float(i) * 0.5 - 3.0) for i in range(97)]
    df = spark.createDataFrame(rows, "k long, typ string, value double")
    keys = ["k", "typ"]
    shards = [df.filter(F.col("k") % 3 == i) for i in range(3)] + [
        df.limit(0)]  # empty shard must be a no-op
    merged = rel.merge_rollups(
        [rel.partial_rollup(s, keys) for s in shards], keys)
    full = rel.partial_rollup(df, keys)
    m = {(r["k"], r["typ"]): r for r in merged.collect()}
    f = {(r["k"], r["typ"]): r for r in full.collect()}
    assert set(m) == set(f)
    for key in f:
        for c in ("n_rows", "sum_dec", "min_value", "max_value"):
            assert m[key][c] == f[key][c], (key, c)
    with pytest.raises(ValueError):
        rel.merge_rollups([], keys)
