"""Round-12 ADVICE regression pins (ADVICE r11 #1–#5).

Each test pins the FIXED behavior of one advised defect:
  #1 skew_report's gini denominator K·N divides in double (bigint×bigint
     would raise under ANSI / wrap silently at ≈1e22);
  #2 join_size_estimate emits contrib/est_total_rows as double so an
     estimate ≥ 9.2e18 — the explosion the audit exists to detect —
     reports instead of raising at output time;
  #3 negative_sampling's draw key includes pos_item, so a user's
     positives get INDEPENDENT negative draws;
  #4 mutual_knn_rate excludes zero-norm vectors from both sides;
  #5 canonical_representatives left-joins so unscored cluster members
     count in n_docs and rank last instead of silently dropping.
"""

import hashlib
import math

import pytest

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import similarity as sim

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------- #1 skew_report gini
def test_skew_report_gini_denominator_is_double(spark):
    """The optimized plan must not contain a bigint×bigint K·N multiply:
    both window counts are cast to double before the division. The plan
    renders attributes WITH exprIds (``__K#8L``), so the assertions
    match that form — the original substring check without exprIds was
    vacuous (could never fail; round-12 self-review)."""
    import re

    df = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    out = rel.skew_report(df, "k")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # regressed form: a raw bigint multiply `(__K#NL * __tot#NL)`
    assert not re.search(r"\(__K#\d+L?\s*\*\s*__tot#\d+L?\)", plan), (
        "bigint K*N multiply in the gini denominator — overflows at "
        "~1e22 under ANSI (ADVICE r11 #1)")
    # fixed form: both operands individually cast to double
    assert re.search(
        r"cast\(__K#\d+L? as double\)\s*\*\s*cast\(__tot#\d+L? as double\)",
        plan), "expected double*double gini denominator not found"
    rows = {r.key_value: r for r in out.collect()}
    # hand gini for counts [1, 2]: G = 2*(1*1+2*2)/(2*3) - 3/2 = 1/6
    assert rows[1].gini == pytest.approx(round(2 * 5 / 6 - 1.5, 6))


def test_skew_report_gini_values_unchanged(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(9)], "k bigint")
    rows = rel.skew_report(df, "k").collect()
    # perfectly uniform: gini == 0
    assert all(r.gini == 0.0 for r in rows)


# ------------------------------------------ #2 join_size_estimate output
def test_join_size_estimate_emits_double(spark):
    left = spark.createDataFrame([(1,)] * 3 + [(2,)] * 2, "k bigint")
    right = spark.createDataFrame([(1,)] * 4 + [(2,)], "k bigint")
    out = rel.join_size_estimate(left, right, "k", "k")
    dt = dict(out.dtypes)
    assert dt["contrib"] == "double"
    assert dt["est_total_rows"] == "double"
    got = {r.key: r for r in out.collect()}
    assert got[1].contrib == 12.0 and got[1].est_total_rows == 14.0


def test_join_size_estimate_survives_past_int64(spark):
    """Counts of 4e9 rows per side → contrib 1.6e19 > int64 max: the
    audit must REPORT the explosion, not raise. Counts that large are
    unbuildable as real rows, so this drives the OPERATOR'S OWN
    scoring expressions (_join_size_from_counts — the exact frame
    join_size_estimate hands its per-key counts to, ADVICE r12)
    through pre-counted (key, n) frames: a regression reintroducing a
    bigint cast anywhere on the >int64 path fails here, under both
    ANSI modes (raise) and off (silent wrap to a wrong value)."""
    lc = spark.createDataFrame(
        [(1, 4_000_000_000), (2, 3)], "key bigint, n_left bigint")
    rc = spark.createDataFrame(
        [(1, 4_000_000_000), (2, 5)], "key bigint, n_right bigint")
    out = {r.key: r for r in
           rel._join_size_from_counts(lc, rc, top_k=10).collect()}
    assert out[1].contrib == 1.6e19          # > 2^63-1, reported not raised
    assert out[1].n_left == 4_000_000_000    # exact inputs preserved
    assert out[2].contrib == 15.0
    # total = 1.6e19 + 15 — exact in the decimal fold, double readout
    assert out[1].est_total_rows == pytest.approx(1.6e19, rel=1e-12)
    # share of the hot key ≈ 1.0 — the explosion is visible
    assert out[1].share == 1.0


# ----------------------------------------------- #3 negative_sampling
def test_negative_sampling_independent_draws_per_positive(spark):
    """Two positives of the SAME user must not share base draws: the
    draw key is (user, pos_item, slot)."""
    df = spark.createDataFrame(
        [(7, 100), (7, 200), (7, 300)], "u bigint, i bigint")
    out = rel.negative_sampling(df, "u", "i", n_items=1000, k=4).collect()
    by_pos: dict = {}
    for r in out:
        by_pos.setdefault(r.pos_item, {})[r.slot] = r.neg_item
    # replay the documented rule per (user, pos, slot)
    for pos, slots in by_pos.items():
        for slot, neg in slots.items():
            d = int(hashlib.md5(
                f"|neg7|{pos}|{slot}".encode()).hexdigest()[:15],
                16) % 999 + 1
            want = d + 1 if d >= pos else d
            assert neg == want
    # draws differ across positives for at least one slot (p(fail) ~ 0
    # for independent md5 draws over 999 items)
    base_draws = [tuple(sorted(s.items())) for s in by_pos.values()]
    assert len(set(base_draws)) > 1


# ------------------------------------------------- #4 mutual_knn_rate
def test_mutual_knn_rate_excludes_zero_norm(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    r = sim.mutual_knn_rate(df, k=1).collect()[0]
    # the zero-norm vector neither counts nor emits/receives edges
    assert (r.n_vectors, r.n_edges, r.n_mutual, r.mutual_rate) \
        == (2, 2, 2, 1.0)


def test_mutual_knn_rate_all_zero_norm_empty_not_fabricated(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    r = sim.mutual_knn_rate(df, k=1).collect()[0]
    assert (r.n_vectors, r.n_edges, r.n_mutual, r.mutual_rate) \
        == (0, 0, 0, 0.0)


# --------------------------------------- #5 canonical_representatives
def test_canonical_representatives_unscored_member_counts_and_ranks_last(
        spark):
    labels = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "node string, label bigint")
    scored = spark.createDataFrame(
        [("a", 0.5), ("b", 0.9)], "doc_id string, quality_score double")
    rows = dd.canonical_representatives(labels, scored).collect()
    assert len(rows) == 1
    r = rows[0]
    # "c" has no score: still counted, never chosen over scored members
    assert r.n_docs == 3
    assert r.rep_id == "b" and r.rep_score == 0.9


def test_canonical_representatives_all_unscored_cluster_is_loud(spark):
    labels = spark.createDataFrame(
        [("x", 1), ("y", 1)], "node string, label bigint")
    scored = spark.createDataFrame(
        [], "doc_id string, quality_score double")
    rows = dd.canonical_representatives(labels, scored).collect()
    assert len(rows) == 1
    r = rows[0]
    # coverage gap surfaces as NULL rep_score with the id tiebreak pick
    assert r.n_docs == 2 and r.rep_id == "x" and r.rep_score is None
