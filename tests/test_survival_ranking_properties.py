"""Property-based brute-force checks for km_survival, ranking_metrics,
and quantile_normalize — the third installment of the independent-replay
suites (rank/moment family: test_rank_stats_properties.py,
test_dist_stats_properties.py). These three had hand-case pins only, and
each hides a semantics choice a shared engine+oracle derivation could
get wrong together:

- km_survival: censoring rows join the risk set but emit no curve row;
  the all-remaining-subjects-die terminal time publishes survival 0.0
  with log_survival NULL; ln factors are 6-rounded THEN decimal-folded.
- ranking_metrics: ideal positions are assigned over the FULL candidate
  list and only then filtered to the score-top-k (deliberately NOT
  textbook NDCG's re-ranked-subset ideal — the oracle spells the same
  rule), MRR misses publish 0.0, ties break by id.
- quantile_normalize: tied rows share a LOW rank and therefore a
  target; the global inverse CDF maps pos = floor(q·(N−1)+0.5)+1;
  singleton groups pin q = 0.5.

Models are dict/Counter walks sharing no code with the engine. Integer
and rational outputs compare EXACTLY; the two transcendental-derived
columns (ln/exp in km, log2 in NDCG) compare to within one 6th-decimal
step — Python libm and JVM Math may differ in the final ulp BEFORE the
6-rounding, which lands on the other side of a rounding boundary with
probability ~0 per example but not exactly 0 (the one seam an
independent replay cannot reproduce bit-for-bit).
"""

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import stats as sx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def round6(x):
    """Spark's round(double, 6): the double goes through
    BigDecimal.valueOf — Double.toString's SHORTEST round-trip decimal
    (Python's repr), NOT the exact binary expansion, NOT Python's
    banker's round — then HALF_UP (see test_dependence_properties.py
    for the hypothesis-found 0.25·ln(4) example that distinguishes)."""
    return Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP)


def close6(got, want):
    """Exact, or one 6th-decimal step apart (the libm ulp seam)."""
    if got is None or want is None:
        return got is None and want is None
    return got == want or abs(got - want) <= 1.000001e-6


# ------------------------------------------------------------ km_survival

def _km_model(rows):
    pts = [(int(t), bool(e)) for t, e in rows
           if t is not None and e is not None]
    per = defaultdict(lambda: [0, 0])
    for t, e in pts:
        per[t][0 if e else 1] += 1
    times = sorted(per)
    n_risk, run = {}, 0
    for t in reversed(times):
        run += per[t][0] + per[t][1]
        n_risk[t] = run
    out, cum, dead = [], Decimal(0), False
    for t in times:
        d, c = per[t]
        nr = n_risk[t]
        if 0 < d < nr:
            cum += round6(math.log(1.0 - d / nr))
        if d == nr:
            dead = True
        if d > 0:
            ls = float(cum)
            out.append((t, nr, d, c,
                        None if dead else ls,
                        0.0 if dead else fl6(math.exp(ls))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       tmax=st.integers(1, 8))
def test_km_survival_matches_bruteforce(spark, seed, n, tmax):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(tmax), rng.random() < 0.6) for _ in range(n)]
    df = spark.createDataFrame(rows, "t long, e boolean")
    got = [(r["t"], r["n_risk"], r["n_events"], r["n_censored"],
            r["log_survival"], r["survival"])
           for r in sx.km_survival(df, "t", "e").orderBy("t").collect()]
    want = _km_model(rows)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4], (g, w)
        assert close6(g[4], w[4]) and close6(g[5], w[5]), (g, w)


# -------------------------------------------------------- ranking_metrics

def _rank_model(rows, k, thr=2):
    base = [(i, float(s), int(r)) for i, s, r in rows
            if s is not None and r is not None]
    act = sorted(base, key=lambda x: (-x[1], x[0]))
    pos = {i: p for p, (i, _, _) in enumerate(act, 1)}
    ideal = sorted(base, key=lambda x: (-x[2], -x[1], x[0]))
    ipos = {i: p for p, (i, _, _) in enumerate(ideal, 1)}
    top = [(i, s, r) for i, s, r in base if pos[i] <= k]
    log2 = lambda x: math.log(x) / math.log(2)   # Spark's Log2 shape
    dcg = float(sum(round6((2.0 ** r - 1.0) / log2(pos[i] + 1.0))
                    for i, _, r in top))
    idcg = float(sum(round6((2.0 ** r - 1.0) / log2(ipos[i] + 1.0))
                     for i, _, r in top))
    hits = [pos[i] for i, _, r in top if r >= thr]
    return (k, len(top), dcg, idcg,
            fl6(dcg / idcg) if idcg > 0 else None,
            fl6(1.0 / min(hits)) if hits else 0.0,
            fl6(len(hits) / float(k)))


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 20),
       k=st.integers(1, 12), spool=st.integers(1, 4))
def test_ranking_metrics_matches_bruteforce(spark, seed, n, k, spool):
    import random
    rng = random.Random(seed)
    rows = [(i, float(rng.randrange(spool)), rng.randrange(5))
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score double, rel int")
    r = sim.ranking_metrics(df, "rel", k=k).collect()[0]
    want = _rank_model(rows, k)
    got = (r["k"], r["n_ranked"], r["dcg"], r["idcg"], r["ndcg"],
           r["mrr"], r["precision_at_k"])
    assert got[:2] == want[:2], (got, want)
    for g, w in zip(got[2:], want[2:]):
        assert close6(g, w), (got, want)


def test_ranking_metrics_empty_input_shape(spark):
    """Pin the degenerate: no valid candidates → counts 0, sums NULL,
    mrr published 0.0 (a miss, not a NULL)."""
    df = spark.createDataFrame([], "doc_id long, score double, rel int")
    r = sim.ranking_metrics(df, "rel", k=5).collect()[0]
    assert (r["k"], r["n_ranked"], r["dcg"], r["idcg"], r["ndcg"],
            r["mrr"], r["precision_at_k"]) == (5, 0, None, None, None,
                                               0.0, None)


# ----------------------------------------------------- quantile_normalize

def _qn_model(rows):
    base = [(i, g, int(v)) for i, g, v in rows
            if i is not None and g is not None and v is not None]
    gv = Counter((g, v) for _, g, v in base)
    ng = Counter(g for _, g, _ in base)
    rank = {}
    for g in ng:
        cum = 0
        for v in sorted(v for (gg, v) in gv if gg == g):
            rank[(g, v)] = cum + 1
            cum += gv[(g, v)]
    n_tot = len(base)
    allv = sorted(v for _, _, v in base)
    out = {}
    for i, g, v in base:
        q = ((rank[(g, v)] - 1) / float(ng[g] - 1)
             if ng[g] > 1 else 0.5)
        p = math.floor(q * float(n_tot - 1) + 0.5) + 1
        out[i] = (g, v, fl6(q), allv[p - 1])
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       pool=st.integers(1, 6), ngroups=st.integers(1, 3))
def test_quantile_normalize_matches_bruteforce(spark, seed, n, pool,
                                               ngroups):
    import random
    rng = random.Random(seed)
    rows = [(i, "abc"[rng.randrange(ngroups)], rng.randrange(pool))
            for i in range(n)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r["id"]: (r["grp"], r["value"], r["quantile"], r["norm_value"])
           for r in sx.quantile_normalize(df, "v", "g", "id").collect()}
    assert got == _qn_model(rows)
