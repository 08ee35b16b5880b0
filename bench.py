#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a count() (full execution, no driver collect of
result payloads) after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.flagship import flagship  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM once (not timed): the flagship covers scan/agg/window
    # codegen; a tiny-SF MinHash run JITs the md5/higher-order-function
    # paths that otherwise pay ~5 s of first-run compilation inside the
    # timed loop. Different data (sf0.001), so no result caching leaks in.
    flagship(spark, sf_dir).count()
    from powerdatapipeline_spark.operators import dedup as _dd
    _dd.minhash_lsh_pairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        shingle_unit="word").count()

    timings: dict[str, float] = {}
    for name, (fn, _oracle) in REGISTRY.items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    t0 = time.time()
    flagship(spark, sf_dir).count()
    timings["flagship"] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
