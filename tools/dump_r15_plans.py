#!/usr/bin/env python
"""Dump explain("formatted") for the round-15-touched queries into
plans/r15/<qNN>_<suffix>.txt. Driver-side plan build only — no query
executes (eager operators still run their plan-build jobs, which is why
this script runs at sf0.001).

Usage: python tools/dump_r15_plans.py <suffix> [qNN ...]
  suffix "before": run with the graph fast paths pinned OFF
  (SPARK_GRAFT_GRAPH_SMALL_MAX_ROWS=0) to capture the distributed
  shapes — for the non-graph queries, run this from a worktree at the
  pre-optimization commit instead.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q135_pagerank", "q184_connected_components", "q205_k_core",
    "q235_hits_authorities", "q253_label_propagation",
    "q217_canonicalize_labels", "q167_triangle_count",
    "q214_ngram_cosine_pairs", "q163_prefix_filter_jaccard",
    "q246_mutual_knn", "q35_ann_ivf_topk", "q60_embedding_neardup",
    "q34_ann_lsh_topk", "q185_bpe_train", "q186_bpe_encode",
    "q125_binary_ingest",
]

SF = "/root/testdata/sf0.001"


def main() -> None:
    args = list(sys.argv[1:])
    lazy = "--lazy" in args
    if lazy:
        # identity-patch localCheckpoint so MATERIALIZING operators
        # (ngram_cosine_pairs, prefix_filter_jaccard_pairs, bpe_train,
        # embedding_neardup_pairs, …) expose their full physical plan
        # instead of the post-checkpoint Scan-ExistingRDD stub. Plan
        # SHAPE is unchanged by the patch — only the lineage cut is.
        args.remove("--lazy")
        # patch the RUNTIME class (Spark 4: pyspark.sql.DataFrame is the
        # facade; instances are classic.dataframe.DataFrame)
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
        # keep persisted subtrees registered so the dumped plan shows
        # the InMemoryTableScan substitutions the operator really runs
        # with (operators unpersist on exit, which would strip them
        # from a post-hoc explain)
        DataFrame.unpersist = lambda self, blocking=False: self
    suffix = args[0]
    names = args[1:] or DEFAULT_QUERIES
    outdir = os.path.join(REPO, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        stem = name.split("_")[0]
        path = os.path.join(outdir, f"{stem}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {SF} ({suffix}) ==\n\n")
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
