"""Declared query registry: every operator from SURVEY.md §2 (and the §2.12
gap ledger) as a (Spark builder, DuckDB oracle SQL) pair consumed by
``__spark_entry__.py``.

Engine-parity rules used throughout (so the driver's order-insensitive
value-hash matches bit-for-bit):

  * **Exact sums**: ``SUM(double)`` is order-dependent; both sides compute
    ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`` — decimal addition is
    exact, the final decimal→double conversion is identical IEEE rounding in
    both engines. Averages = exact decimal sum / count, divided in double.
  * **Transcendentals** (sin/cos/sqrt-of-aggregates): rounded to 6 decimals
    on both sides — libm vs JVM can differ in the last ulp; 1e-16 error vs
    5e-7 rounding spacing makes boundary collisions negligible.
  * **Epoch seconds**: Spark ``ts.cast("double")`` ≡ DuckDB ``epoch(ts)``
    (both keep microsecond fractions exactly).
  * **Truncation**: always explicit ``floor()`` — DuckDB's double→int cast
    ROUNDS while Spark's truncates.
  * Every computed column is aliased identically in both plans (the driver
    sorts columns by name before hashing).

Each builder cites the reference operator it re-expresses (SURVEY.md §2
inventory) so parity can be checked line-by-line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powerdatapipeline_spark.functions.datetime_funcs import _cyclical
from powerdatapipeline_spark.functions.vector import cosine_similarity
from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import text as tx
from powerdatapipeline_spark.operators import timeseries as ts

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark builder, oracle SQL or None for rows-only checks)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn):
        REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    read the nanos as long (legacy conf, set at runtime so it works under any
    driver-created session) and truncate to microseconds — exactly what
    DuckDB does when it loads the same file, so epoch values hash-match."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def dsum(col, alias: str):
    """Exact engine-portable sum of a double column (see module docstring)."""
    return F.sum(F.col(col).cast("decimal(18,6)")).cast("double").alias(alias)


def davg(col, alias: str):
    """Exact decimal sum / count, divided in double — identical both sides."""
    return (F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
            / F.count(col)).alias(alias)


_DSUM = "CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE)"
_DAVG = f"({_DSUM} / COUNT({{c}}))"


# ===========================================================================
# Relational core (SURVEY.md §2.12) over the TPC-H-ish star schema
# ===========================================================================

@register("q01_pricing_summary", f"""
SELECT l_returnflag, l_linestatus,
       {_DSUM.format(c='l_quantity')} AS sum_qty,
       {_DSUM.format(c='l_extendedprice')} AS sum_base_price,
       {_DSUM.format(c='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_DAVG.format(c='l_quantity')} AS avg_qty,
       {_DAVG.format(c='l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregation (gap §2.12; the reference's only grouped agg
    is the pandas resample mean, pandas_utilities.py:115-129). Map-side
    partial agg + single shuffle on the 6-value group key."""
    li = _t(spark, sf_dir, "lineitem")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity", "sum_qty"),
                 dsum("l_extendedprice", "sum_base_price"),
                 F.sum(disc.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
                 davg("l_quantity", "avg_qty"),
                 davg("l_extendedprice", "avg_price"),
                 F.count("*").alias("count_order")))


@register("q02_revenue_by_nation", f"""
SELECT n_name,
       {_DSUM.format(c='l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""")
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join (gap §2.12 — the reference has NO joins,
    SURVEY.md §2.3). Dimensions are broadcast (customer/nation/region are
    tiny at star ratios) so the lineitem fact never shuffles for the join;
    only the final groupBy shuffles on n_name."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
            .where(F.col("r_name") == "ASIA"))
    return df.groupBy("n_name").agg(
        F.sum(disc.cast("decimal(18,6)")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"))


@register("q03_part_type_revenue", f"""
SELECT p_type,
       {_DSUM.format(c='l_extendedprice')} AS revenue,
       {_DSUM.format(c='l_quantity')} AS total_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25
GROUP BY p_type
""")
def q03_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast fact-dim join (operators/relational.join_dim): the part dim
    rides to every executor; predicate on the dim prunes before broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    return (rel.join_dim(li, part, on=[li.l_partkey == part.p_partkey])
            .groupBy("p_type")
            .agg(dsum("l_extendedprice", "revenue"),
                 dsum("l_quantity", "total_qty"),
                 F.count("*").alias("n_items")))


@register("q04_customers_with_orders", """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""")
def q04_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — never duplicates the left side (gap §2.12)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (rel.semi_join(cust, orders, on="c_custkey")
            .groupBy("c_mktsegment").agg(F.count("*").alias("n_customers")))


@register("q05_customers_without_orders", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return rel.anti_join(cust, orders, on="c_custkey").select("c_custkey", "c_name")


@register("q06_top_orders_per_customer", """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""")
def q06_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (gap §2.12 — the reference has no
    analytic window functions, SURVEY.md §2.6). One shuffle on o_custkey;
    ties broken by orderkey for determinism."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return rel.top_k_per_group(
        orders, ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3)


@register("q07_global_top10_orders", """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def q07_global_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject — per-partition local
    top-10 + driver merge, never a global sort (SURVEY.md §2.8: the
    reference has no sort at all)."""
    return rel.top_k(_t(spark, sf_dir, "orders")
                     .select("o_orderkey", "o_custkey", "o_totalprice"),
                     [F.col("o_totalprice").desc(), F.col("o_orderkey")], 10)


@register("q08_rollup_lineitem", f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {_DSUM.format(c='l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""")
def q08_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets (gap §2.12)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "sum_qty", "n_rows"))


@register("q09_cube_orders", """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""")
def q09_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
                    "n_orders", "sum_price"))


@register("q10_set_operations", """
SELECT 'buyers_high_balance' AS op, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 0
  INTERSECT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'high_balance_non_buyers' AS op, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 0
  EXCEPT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'all_keys_union' AS op, COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)
""")
def q10_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except (gap §2.12 — the reference's concats are
    feature-wise, not row-wise, SURVEY.md §2.8)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rich = cust.where(F.col("c_acctbal") > 0).select(F.col("c_custkey"))
    buyers = orders.select(F.col("o_custkey").alias("c_custkey"))
    allc = cust.select("c_custkey")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")

    return (one("buyers_high_balance", rich.intersect(buyers))
            .unionByName(one("high_balance_non_buyers", rich.exceptAll(buyers).distinct()))
            .unionByName(one("all_keys_union", allc.union(buyers).distinct())))


@register("q11_distinct_counts", """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""")
def q11_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n_parts"),
                 F.countDistinct("l_suppkey").alias("n_suppliers"),
                 F.count("*").alias("n_rows")))


@register("q12_string_date_funcs", """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       upper(substr(o_orderpriority, 1, 8)) AS prio_prefix,
       CAST(length(o_orderstatus) AS INT) AS status_len,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4
""")
def q12_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date scalar functions (SURVEY.md §2.5 — the reference's only
    string ops are concat + datetime parse via py_function; Spark built-ins
    replace the Python escape hatch)."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_prefix"),
        F.length("o_orderstatus").cast("int").alias("status_len"))
        .groupBy("order_year", "order_month", "prio_prefix", "status_len")
        .agg(F.count("*").alias("n")))


_JSON_K = "CAST(props->>'$.k' AS INT)"


@register("q13_json_extract", f"""
SELECT event_type,
       {_DSUM.format(c=_JSON_K)} AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""")
def q13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (gap §2.12): get_json_object — JVM
    Jackson parse, pushed inside codegen; no Python."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.groupBy("event_type")
            .agg(F.sum(k.cast("decimal(18,6)")).cast("double").alias("sum_k"),
                 F.count("*").alias("n")))


@register("q14_conditional_agg", f"""
SELECT CAST(floor(value / 20.0) AS BIGINT) AS value_bucket,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       {_DSUM.format(c="CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value
FROM events WHERE value IS NOT NULL
GROUP BY 1
""")
def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/conditional aggregation (pivot-style without pivot's schema
    inference — fixed columns, deterministic)."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = F.floor(F.col("value") / 20.0).cast("bigint").alias("value_bucket")
    pv = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0))
    return (ev.groupBy(bucket)
            .agg(F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
                 F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
                 F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
                 F.sum(pv.cast("decimal(18,6)")).cast("double").alias("purchase_value")))
