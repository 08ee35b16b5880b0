#!/usr/bin/env python
"""10× scale probe (VERDICT r11 #5): make the 100 TB design claims an
empirical point, not just a plan argument.

Builds an sf1-equivalent dataset by replicating /root/testdata/sf0.1
``--factor`` times (default 10) with SHIFTED keys — each replica is a
disjoint key universe (graphs replicate as disjoint components,
documents as distinct ids, users as distinct users), so per-key
cardinalities and skew SHAPE are preserved while totals scale — then
times the top bench queries at both scales and reports the observed
scaling exponent log(t_big/t_small)/log(factor). An exponent ≈ 1 is
linear (the design claim for the scan/agg/bucketed families); the
graph/iteration queries are expected slightly above 1 (more rounds ≈
log n) — anything ≫ 1 is a red flag the plan audit missed.

Output: one JSON line per query + a summary table appended to stdout;
the round ledger lives in SCALE.md. Scratch data goes under
``.scratch/`` (gitignored) inside the repo — the only writable area.

Usage:
  python tools/scale_probe.py [--build-only] [--factor 10]
      [--queries q156,q153,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(REPO, ".scratch", "sf1")

#: per-table key columns to shift per replica (disjoint key universes).
#: Non-key attributes (ts, text, embedding, value) stay identical — the
#: probe measures plan scaling, not data novelty. Foreign keys shift in
#: lockstep with their parents so joins keep the same per-key fan-out.
SHIFT_COLS = {
    "region": [],           # tiny dims: replicating would break FK
    "nation": [],           # semantics; keep one copy
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = ["q156", "q153", "q184", "q135", "q253",
                   "q163", "q152", "q214", "q172", "q205"]


def build(spark, factor: int) -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    for table, keys in SHIFT_COLS.items():
        out = os.path.join(SCRATCH, f"{table}.parquet")
        if os.path.exists(out):
            print(f"# {table}: exists, skipping", flush=True)
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        if not keys:
            df.write.mode("overwrite").parquet(out)
            print(f"# {table}: copied (dim)", flush=True)
            continue
        # stride = next power of 10 above the max key, so shifted ids
        # stay readable and collision-free
        maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        stride = 10 ** len(str(max(int(maxes[k] or 0) for k in keys)))
        rep = df.withColumn(
            "__rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        for k in keys:
            rep = rep.withColumn(
                k, (F.col(k) + F.col("__rep").cast("bigint")
                    * F.lit(stride)).cast(dict(df.dtypes)[k]))
        (rep.drop("__rep")
         .repartition(max(32, factor * 4))
         .write.mode("overwrite").parquet(out))
        print(f"# {table}: x{factor} (stride {stride})", flush=True)


def probe(spark, stems: list[str], factor: int) -> list[dict]:
    import math

    by_stem = {n.split("_")[0]: n for n in REGISTRY}
    rows = []
    for stem in stems:
        name = by_stem[stem]
        fn, _ = REGISTRY[name]
        fn(spark, "/root/testdata/sf0.001").count()  # JIT warm
        t0 = time.time()
        fn(spark, SRC).count()
        t_small = time.time() - t0
        t0 = time.time()
        fn(spark, SCRATCH).count()
        t_big = time.time() - t0
        exp = math.log(t_big / t_small) / math.log(factor)
        row = {"query": name, "t_sf0.1_s": round(t_small, 2),
               f"t_x{factor}_s": round(t_big, 2),
               "exponent": round(exp, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    factor = 10
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    stems = DEFAULT_QUERIES
    if "--queries" in sys.argv:
        stems = sys.argv[sys.argv.index("--queries") + 1].split(",")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, factor)
    if "--build-only" in sys.argv:
        return
    rows = probe(spark, stems, factor)
    print(json.dumps({"factor": factor, "results": rows}))


if __name__ == "__main__":
    main()
