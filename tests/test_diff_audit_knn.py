"""Laws for snapshot diff, FK audit, and kNN label transfer (q143-q145):
planted changes/orphans must be detected and classified exactly; the kNN
classifier must recover planted cluster structure. DuckDB value parity is
pinned by the tail-parity sweep."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import similarity as sim


def test_snapshot_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [Row(k=i, v=f"v{i}", n=i * 10) for i in range(10)])
    new = spark.createDataFrame(
        # 0-7 kept (5 changed in v, 6 changed n->NULL), 8-9 removed,
        # 100 added
        [Row(k=i, v=("X" if i == 5 else f"v{i}"),
             n=(None if i == 6 else i * 10)) for i in range(8)]
        + [Row(k=100, v="new", n=0)])
    got = {r.k: r.status
           for r in rel.snapshot_diff(old, new, "k").collect()}
    assert got[5] == "changed" and got[6] == "changed"
    assert got[8] == "removed" and got[9] == "removed"
    assert got[100] == "added"
    assert all(got[i] == "unchanged" for i in (0, 1, 2, 3, 4, 7))

    summary = {r.status: (r.n_rows, r.share)
               for r in rel.snapshot_diff_summary(old, new, "k").collect()}
    assert summary["changed"][0] == 2
    assert summary["removed"][0] == 2
    assert summary["added"][0] == 1
    assert summary["unchanged"][0] == 6
    assert abs(sum(s for _, s in summary.values()) - 1.0) < 1e-5


def test_snapshot_diff_null_equals_null(spark):
    old = spark.createDataFrame([(1, None)], "k INT, v STRING")
    new = spark.createDataFrame([(1, None)], "k INT, v STRING")
    assert rel.snapshot_diff(old, new, "k").collect()[0].status == "unchanged"


def test_snapshot_diff_validates_columns(spark):
    old = spark.createDataFrame([Row(k=1, v=1)])
    new = spark.createDataFrame([Row(k=1, w=1)])
    with pytest.raises(ValueError, match="missing"):
        rel.snapshot_diff(old, new, "k")


def test_fk_audit_counts_orphans_and_nulls(spark):
    fact = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)])
    dim = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    r = rel.fk_audit(fact, dim, "fk", "pk", "fact.fk->dim.pk").collect()[0]
    assert r.relation == "fact.fk->dim.pk"
    assert r.n_rows == 5
    assert r.n_null_keys == 1
    assert r.n_orphans == 1  # fk=99; NULL is not an orphan
    assert abs(r.orphan_rate - 0.2) < 1e-9


def test_knn_classify_recovers_clusters(spark):
    """Two well-separated clusters: labeled evens carry the cluster id,
    odd queries must be predicted into their own cluster."""
    rnd = random.Random(3)

    def vec(center):
        return [center + rnd.uniform(-0.05, 0.05) for _ in range(64)]

    # interleave so both clusters appear in labeled (even ids) and
    # queries (odd ids): cluster = (i // 2) % 2
    rows = [Row(vec_id=i, embedding=vec(1.0 if (i // 2) % 2 == 0 else -1.0),
                label=(0 if (i // 2) % 2 == 0 else 1))
            for i in range(80)]
    emb = spark.createDataFrame(rows)
    labeled = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    preds = sim.knn_classify(labeled, queries, k=5).collect()
    truth = {r.vec_id: r.label for r in rows}
    assert len(preds) >= 35  # LSH may drop a rare far-bucket query
    correct = sum(1 for p in preds if p.pred_label == truth[p.query_id])
    assert correct / len(preds) >= 0.95
    for p in preds:
        assert 1 <= p.n_votes <= 5
        assert p.sum_cosine is not None
