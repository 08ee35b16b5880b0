"""Property-based brute-force checks for the attribution/conversion
family — last_touch_attribution, time_to_convert, cohort_ltv. Tenth
independent-replay suite (rationale in test_rank_stats_properties.py).
Pinned semantics beyond the hand cases:

- last_touch_attribution: the (ts, kind, tiebreak) carry order — a
  same-instant touch IS creditable (touches sort before conversions),
  the newest of several same-instant touches wins by tiebreak, the
  window check happens at the conversion, and out-of-window /
  never-touched conversions land in '(none)' with their value.
- time_to_convert: duration = first conversion AT-OR-AFTER the first
  start (conversions before every start are ignored), nearest-rank
  p50/p90 via floor(q·(n−1)+0.5)+1 on the distinct-duration cumsum.
- cohort_ltv: cohort by the week of the first event of ANY type,
  revenue and distinct buyers by age week.

All rational → exact double equality.
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
TEN = Decimal("0.0000000001")


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def rq(x, q=SIX):
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# ---------------------------------------------------- last_touch_attribution

def _lta_model(rows, window=7200.0, touches=("view", "click"),
               conversion="purchase"):
    per = defaultdict(list)
    for u, t, i, typ, v in rows:
        if typ in touches or typ == conversion:
            per[u].append((float(t), i, typ, v))
    agg = defaultdict(lambda: [0, Decimal(0)])
    for evs in per.values():
        # (t, kind, tiebreak): touches (kind 0) before conversions
        evs.sort(key=lambda e: (e[0], 1 if e[2] == conversion else 0,
                                e[1]))
        last_touch, last_t = None, None
        for t, i, typ, v in evs:
            if typ != conversion:
                last_touch, last_t = typ, t
            else:
                ch = (last_touch if last_touch is not None
                      and t - last_t <= window else "(none)")
                a = agg[ch]
                a[0] += 1
                val = 0.0 if v is None else float(v)
                a[1] += Decimal(repr(rq(val))).quantize(
                    TEN, rounding=ROUND_HALF_UP)
    return {ch: (n, rq(float(s))) for ch, (n, s) in agg.items()}


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 4), window=st.sampled_from([1.0, 5.0, 1e6]))
def test_last_touch_matches_bruteforce(spark, seed, n, nusers, window):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers), float(rng.randrange(10)), i,
             rng.choice(["view", "click", "purchase", "other"]),
             None if rng.random() < 0.2 else float(rng.randrange(50)))
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_id long, "
              "event_type string, value double")
    got = {r["channel"]: (r["n_conversions"], r["total_value"])
           for r in ts.last_touch_attribution(
               df, window_seconds=window).collect()}
    assert got == _lta_model(rows, window)


# ----------------------------------------------------------- time_to_convert

def _ttc_model(rows, start="view", conv="purchase"):
    per = defaultdict(lambda: [None, []])
    for u, t, typ in rows:
        if typ == start:
            a = per[u]
            a[0] = float(t) if a[0] is None else min(a[0], float(t))
        elif typ == conv:
            per[u][1].append(float(t))
    durs = []
    for t0, tcs in per.values():
        cand = [tc for tc in tcs if t0 is not None and tc >= t0]
        if cand:
            durs.append(rq(min(cand) - t0))
    if not durs:
        return None
    n = len(durs)
    vs = sorted(durs)
    cnt = defaultdict(int)
    for d in durs:
        cnt[d] += 1

    def nearest_rank(q):
        pos = math.floor(q * float(n - 1) + 0.5) + 1
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            if cum >= pos:
                return v

    mean = fl6(float(sum(Decimal(repr(d)).quantize(
        TEN, rounding=ROUND_HALF_UP) for d in durs)) / float(n))
    return n, nearest_rank(0.5), nearest_rank(0.9), mean


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 5))
def test_time_to_convert_matches_bruteforce(spark, seed, n, nusers):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers), float(rng.randrange(12)),
             rng.choice(["view", "purchase", "other"])) for _ in range(n)]
    rows += [(0, 1.0, "view"), (0, 3.0, "purchase")]  # >= 1 converter
    df = spark.createDataFrame(rows,
                               "user_id long, ts double, event_type string")
    r = ts.time_to_convert(df).collect()[0]
    assert (r["n_converted"], r["q_50"], r["q_90"],
            r["mean_seconds"]) == _ttc_model(rows)


# ---------------------------------------------------------------- cohort_ltv

def _ltv_model(rows, conv="purchase", bucket=604800.0):
    first = {}
    for u, t, typ, v in rows:
        first[u] = min(first.get(u, float(t)), float(t))
    cells = defaultdict(lambda: [set(), Decimal(0)])
    for u, t, typ, v in rows:
        if typ != conv or v is None:
            continue
        cohort = math.floor(first[u] / bucket)
        age = math.floor(float(t) / bucket) - cohort
        c = cells[(cohort, age)]
        c[0].add(u)
        c[1] += Decimal(repr(float(v))).quantize(TEN,
                                                 rounding=ROUND_HALF_UP)
    return {k: (len(us), rq(float(s))) for k, (us, s) in cells.items()}


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 5), nweeks=st.integers(1, 5))
def test_cohort_ltv_matches_bruteforce(spark, seed, n, nusers, nweeks):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers),
             float(rng.randrange(nweeks) * 604800 + rng.randrange(604800)),
             rng.choice(["view", "purchase"]),
             None if rng.random() < 0.2 else float(rng.randrange(40)))
            for _ in range(n)]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_type string, value double")
    got = {(r["cohort_week"], r["age_weeks"]): (r["n_buyers"],
                                                r["revenue"])
           for r in ts.cohort_ltv(df).collect()}
    assert got == _ltv_model(rows)
