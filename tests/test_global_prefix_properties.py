"""Property-based checks (hypothesis) for relational.global_prefix —
the round-13 distributed replacement for single-task global windows.

The ground truth is the single-task ``Window.orderBy`` itself (exact,
just not scalable), so every example is a full equivalence oracle:
for ANY key distribution — duplicates, negatives, clustered values,
tiny/huge magnitudes — the bucketed two-pass prefix must produce the
identical global row numbers and running sums. Hypothesis drives the
distribution SHAPE (the docstring's "pathologically clustered key"
caveat is about performance, never values); examples stay small
because each one is a Spark job.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators.relational import global_prefix

SLOW = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

#: key pools that stress the equal-width bucketing: clustered (one hot
#: value), bimodal (two far-apart clusters → most buckets empty),
#: uniform small range (every bucket a tie-block), huge magnitudes
#: (double-rounding in the width division), negatives straddling zero
KEY_POOLS = [
    [7] * 20 + [8],                       # near-constant
    [0, 1, 2, 3, 10**12],                 # bimodal, extreme spread
    list(range(-5, 6)),                   # negatives through zero
    [-(10**15), 10**15],                  # huge symmetric magnitudes
    list(range(100)),                     # uniform
]


def _expected(rows, with_sum):
    # python ground truth: stable sort by (k, tie), 1-based row number,
    # running sum of v — matches Window.orderBy("k", "tie") exactly
    srt = sorted(rows, key=lambda r: (r[0], r[1]))
    out, acc = {}, 0
    for i, (k, tie, v) in enumerate(srt, start=1):
        acc += v
        out[(k, tie)] = (i, acc) if with_sum else (i, None)
    return out


@SLOW
@given(pool=st.sampled_from(KEY_POOLS), seed=st.integers(0, 10**6),
       n=st.integers(1, 60), buckets=st.sampled_from([1, 2, 7, 64]))
def test_rn_and_sums_match_python_ground_truth(spark, pool, seed, n,
                                               buckets):
    import random

    rnd = random.Random(seed)
    rows = [(rnd.choice(pool), i, rnd.randint(-100, 100))
            for i in range(n)]
    # shuffle the tie-breaker assignment so input order ≠ key order
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, tie long, v long")
    out = global_prefix(df, ["k", "tie"],
                        sums={"rsum": F.col("v")}, rn_col="rn",
                        num_partitions=buckets)
    got = {(r.k, r.tie): (r.rn, r.rsum) for r in out.collect()}
    assert got == _expected(rows, with_sum=True)


@SLOW
@given(seed=st.integers(0, 10**6), n=st.integers(1, 40))
def test_matches_single_task_window_on_random_doubles(spark, seed, n):
    """Cross-check against the Spark single-task window (not just the
    python model) on double keys with duplicates."""
    import random

    rnd = random.Random(seed)
    rows = [(round(rnd.uniform(-1e6, 1e6), 2) if rnd.random() < 0.7
             else 42.5, i) for i in range(n)]
    df = spark.createDataFrame(rows, "k double, tie long")
    got = {(r.k, r.tie): r.rn
           for r in global_prefix(df, ["k", "tie"], rn_col="rn",
                                  num_partitions=7).collect()}
    w = Window.orderBy("k", "tie")
    want = {(r.k, r.tie): r.rn
            for r in df.withColumn(
                "rn", F.row_number().over(w).cast("bigint")).collect()}
    assert got == want
