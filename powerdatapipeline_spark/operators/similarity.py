"""Similarity search over embedding columns (BASELINE.json north star;
SURVEY.md §2.12): brute-force cosine top-k baseline + LSH-bucketed and
IVF-style scale paths.

Scale design: brute force is O(n·q) dot products — fine as the exactness
oracle and for small q; the scale paths cut the candidate set per query by
orders of magnitude (random-hyperplane LSH buckets / coarse-centroid IVF
cells), turning a 100 TB full scan into a bucketed semi-join. All vector math
is JVM-side (``zip_with`` + ``aggregate``, functions/vector.py) — no Python
in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from powerdatapipeline_spark.functions.vector import cosine_similarity, dot


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` (small) is broadcast and cross-joined against the corpus —
    the corpus never shuffles; per-query ranking uses a window partitioned by
    query id. Ties broken by corpus id for determinism.
    """
    q = F.broadcast(queries.select(F.col(query_id_col),
                                   F.col(vec_col).alias("__qvec")))
    scored = (embeddings.crossJoin(q)
              .select(query_id_col, id_col,
                      F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
                  .where(F.col("rank") <= k))


def hyperplane_lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                        n_planes: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding", query_id_col: str = "query_id",
                        seed: int = 42, dim: int = 64) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH.

    Each vector hashes to an ``n_planes``-bit bucket (sign of dot with fixed
    pseudo-random hyperplanes, deterministic from ``seed``); queries probe
    only their own bucket. Recall < 1 by construction — this is the scale
    path; exactness is :func:`brute_force_topk`.

    The hyperplanes are generated driver-side (numpy, deterministic) and
    embedded as literals — tiny, no broadcast join needed.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket(col: str):
        bits = []
        for i in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[i]])
            s = dot(col, plane)
            bits.append(F.when(s >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** i))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    emb_b = embeddings.withColumn("__bucket", bucket(vec_col))
    q_b = F.broadcast(queries.select(query_id_col,
                                     F.col(vec_col).alias("__qvec"))
                      .withColumn("__bucket", bucket("__qvec")))
    scored = (emb_b.join(q_b, "__bucket")
              .select(query_id_col, id_col,
                      F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
                  .where(F.col("rank") <= k))


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", query_id_col: str = "query_id",
             seed: int = 7, dim: int = 64) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest coarse
    centroid (deterministic pseudo-random centroids — a production system
    would k-means these; the partition/probe plumbing is identical), then
    each query scores only vectors in its ``n_probe`` nearest cells.

    At 100 TB: write the corpus partitioned by cell id (partition pruning →
    each query touches n_probe/n_cells of the data).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])

    def cell_scores(col: str):
        return F.transform(cent_arr, lambda c: dot(F.col(col), c))

    def best_cell(col: str):
        sc = cell_scores(col)
        return F.array_position(sc, F.array_max(sc)) - 1

    emb_c = embeddings.withColumn("__cell", best_cell(vec_col))
    qs = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    # argsort the cell scores expression-side: pair (−score, cell), sort,
    # take the n_probe best cell ids
    sc = cell_scores("__qvec")
    ranked_cells = F.slice(
        F.transform(F.array_sort(F.zip_with(sc,
                                            F.sequence(F.lit(0), F.lit(n_cells - 1)),
                                            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")))),
                    lambda st: st["cell"]),
        1, n_probe)
    # explode the probe list so the cell lookup is an EQUI-join (hash,
    # partition-prunable when the corpus is written partitioned by cell) —
    # an array_contains join condition would run as BroadcastNestedLoopJoin
    q_c = F.broadcast(qs.withColumn("__cells", ranked_cells)
                        .withColumn("__cell", F.explode("__cells"))
                        .drop("__cells"))
    scored = (emb_c.join(q_c, "__cell")
              .select(query_id_col, id_col,
                      F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
                  .where(F.col("rank") <= k))
