#!/usr/bin/env python
"""Dump explain("formatted") for the round-16-touched queries into
plans/r16/<qNN>_<suffix>.txt. Driver-side plan build only — no query
executes (eager operators still run their plan-build jobs, which is why
this script runs at sf0.001). Streaming queries dump their pre-sink
*_stream_frame (the exact DAG the micro-batches execute — the memory
sink itself has no batch plan to explain ahead of time).

Usage: python tools/dump_r16_plans.py <suffix> [qNN ...]
  suffix "before": run from a git worktree at the round-start commit
  (f94b33c) so the old operator internals are what gets planned.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from powerdatapipeline_spark import queries as Q  # noqa: E402
from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

#: batch queries: explain the registered frame directly
DEFAULT_QUERIES = [
    "q135_pagerank", "q184_connected_components", "q205_k_core",
    "q235_hits_authorities", "q253_label_propagation",
    "q217_canonicalize_labels", "q167_triangle_count",
    "q64_fuzzy_match", "q166_sorted_neighborhood", "q206_fuzzy_dict_match",
]

#: streaming queries: explain the shared pre-sink stream frame
STREAM_FRAMES = {
    "q45": "q45_stream_frame",
    "q65": "q65_stream_frame",
    "q95": "q95_stream_frame",
    "q124": "q124_stream_frame",
}

SF = "/root/testdata/sf0.001"


def main() -> None:
    args = list(sys.argv[1:])
    suffix = args[0]
    names = args[1:] or (DEFAULT_QUERIES + list(STREAM_FRAMES))
    # outdir is the CHECKED-OUT repo this script runs from only when it
    # is the main repo; "before" worktree runs write into the main repo
    # via $SPARK_GRAFT_PLANS_OUT
    outdir = os.environ.get("SPARK_GRAFT_PLANS_OUT",
                            os.path.join(REPO, "plans", "r16"))
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_r16_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name in STREAM_FRAMES:
            df = getattr(Q, STREAM_FRAMES[name])(spark, SF)
            stem, label = name, STREAM_FRAMES[name]
        else:
            fn, _ = REGISTRY[name]
            df = fn(spark, SF)
            stem, label = name.split("_")[0], name
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{stem}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {label} @ {SF} ({suffix}) ==\n\n")
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
