"""Property-based brute-force checks for event_funnel,
retention_cohorts, and acf — the order/calendar-semantics family (sixth
independent-replay suite; rationale in test_rank_stats_properties.py).
The hand cases pin strict-after ties and two-step chains; hypothesis
drives the shapes where first-touch greediness, cohort bucketing, and
the pairwise-available lag estimator actually decide results:

- event_funnel: the step-i+1 qualifying time is the EARLIEST event
  strictly after the step-i time — a user with B before their first A
  and another B after must still convert; same-timestamp events must
  not.
- retention_cohorts: users cohort by the bucket of their FIRST
  activity; multiple events in one bucket count once; retention is a
  ratio against the offset-0 cell.
- acf: per-bucket means feed a bucket+k equi-join — missing buckets
  produce no pair, and the denominator stays the full-series Σ(x−x̄)²,
  with every moment repr-quantized to decimal(28,12) before folding.

All three are rational end-to-end → exact double equality (conversion
and retention ratios replicate Spark's round via the shortest-repr
HALF_UP quantize pinned in test_dependence_properties.py).
"""

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)

SIX = Decimal("0.000001")
TWELVE = Decimal("0.000000000001")


def rquant(x, q=SIX):
    return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)


# ------------------------------------------------------------ event_funnel

STEPS = ["A", "B", "C"]


def _funnel_model(rows, steps=STEPS):
    per_user = defaultdict(list)
    for u, t, typ in rows:
        per_user[u].append((float(t), typ))
    counts = []
    for i, step in enumerate(steps):
        n = 0
        for evs in per_user.values():
            qt = None
            ok = True
            for s in steps[:i + 1]:
                cand = [t for t, typ in evs if typ == s
                        and (qt is None or t > qt)]
                if not cand:
                    ok = False
                    break
                qt = min(cand)
            if ok:
                n += 1
        counts.append(n)
    out = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        conv = (float(rquant(n / counts[i - 1]))
                if i > 0 and counts[i - 1] > 0 else None)
        out.append((i + 1, step, n, conv))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 5), tmax=st.integers(1, 8))
def test_event_funnel_matches_bruteforce(spark, seed, n, nusers, tmax):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers), float(rng.randrange(tmax)),
             rng.choice("ABCD")) for _ in range(n)]
    df = spark.createDataFrame(rows, "user long, t double, typ string")
    got = [(r["step"], r["typ"], r["n_users"], r["conversion"])
           for r in ts.event_funnel(df, "t", "user", "typ",
                                    STEPS).collect()]
    assert got == _funnel_model(rows)


# ------------------------------------------------------- retention_cohorts

def _retention_model(rows, bucket=604_800):
    activity = {(u, math.floor(float(t) / float(bucket)))
                for u, t in rows}
    first = {}
    for u, b in activity:
        first[u] = min(first.get(u, b), b)
    cells = defaultdict(set)
    for u, b in activity:
        cells[(first[u], b - first[u])].add(u)
    out = {}
    for (cohort, off), users in cells.items():
        base = len(cells[(cohort, 0)])
        out[(cohort, off)] = (len(users),
                              float(rquant(len(users) / base)))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 6), nweeks=st.integers(1, 6))
def test_retention_cohorts_matches_bruteforce(spark, seed, n, nusers,
                                              nweeks):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers),
             float(rng.randrange(nweeks) * 604_800
                   + rng.randrange(604_800))) for _ in range(n)]
    df = spark.createDataFrame(rows, "user long, t double")
    got = {(r["cohort"], r["week_offset"]): (r["n_active"],
                                             r["retention"])
           for r in ts.retention_cohorts(df, "t", "user").collect()}
    assert got == _retention_model(rows)


# --------------------------------------------------------------------- acf

def _acf_model(rows, max_lag=4, bucket=3600):
    by_b = defaultdict(list)
    for t, v in rows:
        by_b[math.floor(float(t) / float(bucket))].append(int(v))
    series = {b: float(sum(vs)) / len(vs) for b, vs in by_b.items()}
    n = len(series)
    sx = float(sum(rquant(x, TWELVE) for x in series.values()))
    sxx = float(sum(rquant(x * x, TWELVE) for x in series.values()))
    nf = float(n)
    mean = sx / nf
    denom = sxx - nf * mean * mean
    out = []
    for k in range(1, max_lag + 1):
        pairs = [(series[b], series[b + k]) for b in sorted(series)
                 if b + k in series]
        if not pairs:
            continue                      # no row for pairless lags
        s0 = float(sum(rquant(a, TWELVE) for a, _ in pairs))
        sk = float(sum(rquant(c, TWELVE) for _, c in pairs))
        s0k = float(sum(rquant(a * c, TWELVE) for a, c in pairs))
        num = (s0k - mean * s0 - mean * sk
               + float(len(pairs)) * mean * mean)
        out.append((k, len(pairs),
                    float(rquant(num / denom)) if denom > 0 else None))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nhours=st.integers(2, 10))
def test_acf_matches_bruteforce(spark, seed, n, nhours):
    import random
    rng = random.Random(seed)
    rows = []
    for h in range(nhours):
        if rng.random() < 0.2:
            continue                      # bucket gap → missing pairs
        for _ in range(rng.randint(1, 3)):
            rows.append((float(h * 3600 + rng.randrange(3600)),
                         float(rng.randrange(7) - 3)))
    rows = rows or [(0.0, 1.0), (3600.0, 2.0)]
    df = spark.createDataFrame(rows, "ts double, value double")
    got = [(r["lag"], r["n_pairs"], r["acf"])
           for r in ts.acf(df, max_lag=4).collect()]
    assert got == _acf_model(rows)
