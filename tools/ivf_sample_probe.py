#!/usr/bin/env python
"""IVF fit-on-sample probe (VERDICT r12 #8): make the documented
"at 100 TB you fit centroids on a sample" caveat (similarity.
fit_ivf_centroids docstring) an empirical number instead of a claim.

Fit IVF coarse centroids two ways — on the FULL embedding set and on a
deterministic hash sample (vec_id % mod == 0; the engine's reproducible
sampling discipline, no RNG state) — then run the same
``ivf_topk(n_cells=16, n_probe=1, k=10)`` search with each centroid set
over a held-out query batch and score recall@10 against the exact
brute-force cosine ranking. n_probe=1 on purpose: it is the most
fit-sensitive setting (a probe list of one cell gives a misplaced
centroid nowhere to hide). Output: one JSON line
``{"recall_full": ..., "recall_sample": ..., "delta": ...}`` for the
SCALE.md ledger. A small |delta| bounds the cost of sample-fitting:
coarse quantizers only need the DENSITY SHAPE of the corpus, which a
uniform sample preserves.

Runs on the sf0.1 fixtures by default, NOT the ×10 scratch build: the
scale build replicates each vector verbatim (key-shifted), so every
query's true top-k is its own copies — co-celled under ANY centroid
fit — and recall saturates at 1.0 for both fits (measured; the
degenerate-probe trap SCALE.md documents for q163).

Usage: python tools/ivf_sample_probe.py [--n-queries 16]
           [--src /root/testdata/sf0.1] [--sample-mod 10]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from powerdatapipeline_spark.operators import similarity as sim  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

X10 = os.path.join(REPO, ".scratch", "x10")


def recall_at_k(got, want, k: int) -> float:
    """Mean |IVF∩GT|/k over queries; got/want: {qid -> [ids ranked]}."""
    tot = 0.0
    for qid, w in want.items():
        tot += len(set(got.get(qid, [])) & set(w)) / float(k)
    return tot / max(len(want), 1)


def topk_map(df, k: int) -> dict:
    out: dict = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r.query_id, []).append(r.vec_id)
    return {q: ids[:k] for q, ids in out.items()}


def main() -> None:
    n_queries = 16
    if "--n-queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--n-queries") + 1])
    src = "/root/testdata/sf0.1"
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    mod = 10
    if "--sample-mod" in sys.argv:
        mod = int(sys.argv[sys.argv.index("--sample-mod") + 1])
    k, n_cells, n_probe = 10, 16, 1
    if "--n-probe" in sys.argv:
        n_probe = int(sys.argv[sys.argv.index("--n-probe") + 1])
    spark = get_spark("ivf-sample-probe", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(1024 * 1024)})
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_corpus = emb.count()
    # held-out query batch: every (n//n_queries)-th id — spread across
    # the id space, deterministic
    stride = max(n_corpus // n_queries, 1)
    queries = (emb.where(F.col("vec_id") % stride == 0)
               .orderBy("vec_id").limit(n_queries)
               .selectExpr("vec_id AS query_id", "embedding"))
    queries = queries.localCheckpoint(eager=True)

    gt = topk_map(sim.brute_force_topk(emb, queries, k=k), k)

    sample = emb.where(F.col("vec_id") % mod == 0)
    n_sample = sample.count()

    results = {}
    for tag, fitset in (("full", emb), ("sample", sample)):
        cents = sim.fit_ivf_centroids(fitset, n_cells=n_cells, iters=3)
        got = topk_map(
            sim.ivf_topk(emb, queries, k=k, n_cells=n_cells,
                         n_probe=n_probe, centroids=cents), k)
        results[tag] = round(recall_at_k(got, gt, k), 4)

    line = {"probe": "ivf_fit_on_sample", "src": src,
            "n_corpus": n_corpus,
            "n_sample": n_sample, "n_queries": n_queries,
            "k": k, "n_cells": n_cells, "n_probe": n_probe,
            "recall_full": results["full"],
            "recall_sample": results["sample"],
            "delta": round(results["full"] - results["sample"], 4)}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
