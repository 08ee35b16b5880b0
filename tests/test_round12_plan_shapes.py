"""Round-12 plan-shape pins (VERDICT r11 'What's wrong' #2).

``cdc_chunk_rows`` needs its md5 boundary array twice (chunk starts and
chunk ends). Higher-order-function expressions containing lambdas are
excluded from Spark's subexpression elimination (SPARK-35410 class), so
inlining the array expression twice ran the O(len·window) md5 scan —
the operator's entire cost — twice per row (measured: q156 17.6s →
~7s at sf0.1 after the fix). The fix materializes the array once in a
prior projection; these tests pin that CollapseProject does NOT
re-inline the non-cheap alias back into a double evaluation.
"""

import re

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators.text import cdc_chunk_rows
from powerdatapipeline_spark.queries import REGISTRY

#: the boundary-array scan's unmistakable fingerprint: the only
#: filter-over-sequence HOF in the operator (and in q156's whole plan)
_BOUNDARY_SCAN = re.compile(r"filter\(sequence\(")


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_cdc_chunk_rows_single_boundary_scan(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 30), (2, "xyz" * 40)], ["doc_id", "text"])
    plan = _optimized(cdc_chunk_rows(df))
    hits = _BOUNDARY_SCAN.findall(plan)
    assert len(hits) == 1, (
        f"md5 boundary array evaluated {len(hits)}× in the optimized plan "
        "— CollapseProject re-inlined the alias; the O(len·window) scan "
        "must run exactly once per row")


def test_q156_plan_single_boundary_scan(spark, sf_dir):
    fn, _ = REGISTRY["q156_cdc_chunk_dedup"]
    plan = _optimized(fn(spark, sf_dir))
    hits = _BOUNDARY_SCAN.findall(plan)
    assert len(hits) == 1, f"q156 boundary scans: {len(hits)} (want 1)"


def test_cdc_chunk_rows_values_unchanged(spark):
    """Value pin alongside the plan pin: chunk boundaries for a known
    string must be identical to the pre-fix semantics (every position
    whose trailing 8-gram md5 prefix is 0 mod 64 ends a chunk)."""
    text = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = cdc_chunk_rows(df).orderBy("chunk_idx").collect()
    # chunks tile the document exactly: concatenated lengths == len(text)
    assert sum(r.chunk_len for r in rows) == len(text)
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    # replay the boundary rule row-by-row in Python (window=8, mod=64)
    import hashlib
    bounds = [
        i for i in range(8, len(text) + 1)
        if int(hashlib.md5(text[i - 8:i].encode()).hexdigest()[:8], 16)
        % 64 == 0]
    starts = [1] + [b + 1 for b in bounds]
    ends = bounds + [len(text)]
    spans = [(s, e) for s, e in zip(starts, ends) if e >= s]
    assert [(r.chunk_len) for r in rows] == [e - s + 1 for s, e in spans]
    for r, (s, e) in zip(rows, spans):
        want = hashlib.md5(text[s - 1:e].encode()).hexdigest()
        assert r.chunk_md5 == want
