"""Property-based brute-force checks for the robust-stats family —
winsorize_report, robust_scale_fit/apply, mad_outliers. Eighteenth
independent-replay suite (rationale in test_rank_stats_properties.py).
Pinned semantics:

- winsorize_report: the interpolated-percentile caps, STRICT clip
  counting (a value equal to the cap is not clipped), and the decimal
  sums over 6-rounded raw/clamped values.
- robust_scale: (x − median)/IQR with degenerate IQR = 0 groups
  yielding NULL, never ±inf.
- mad_outliers: the double-median modified z with the 0.6745 constant,
  MAD = 0 slabs NULL, the strict |mz| > threshold flag.

All rational (interpolated quantiles replayed exactly) → exact double
equality.
"""

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import stats as sx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


def quantile(sorted_vals, q):
    """Spark percentile / DuckDB quantile_cont (0-based q·(n−1))."""
    p = q * (len(sorted_vals) - 1)
    lo = math.floor(p)
    hi = min(lo + 1, len(sorted_vals) - 1)
    return sorted_vals[lo] + (p - lo) * (sorted_vals[hi] - sorted_vals[lo])


# ----------------------------------------------------------- winsorize_report

def _wins_model(rows, lo=0.05, hi=0.95):
    per = defaultdict(list)
    for g, v in rows:
        per[g].append(float(v))
    out = {}
    for g, vs in per.items():
        s = sorted(vs)
        plo, phi = quantile(s, lo), quantile(s, hi)
        clamped = [min(max(v, plo), phi) for v in vs]
        sum_raw = float(sum(Decimal(repr(rq(v))) for v in vs))
        sum_w = float(sum(Decimal(repr(rq(c))) for c in clamped))
        out[g] = (len(vs), rq(plo), rq(phi),
                  sum(1 for v in vs if v < plo),
                  sum(1 for v in vs if v > phi), sum_raw, sum_w)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       lo=st.sampled_from([0.05, 0.25]), hi=st.sampled_from([0.75, 0.95]))
def test_winsorize_matches_bruteforce(spark, seed, n, lo, hi):
    import random
    rng = random.Random(seed)
    rows = [("g" + str(rng.randrange(2)), float(rng.randrange(12)))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["n"], r["p_lo"], r["p_hi"], r["n_clipped_low"],
                    r["n_clipped_high"], r["sum_raw"],
                    r["sum_winsorized"])
           for r in sx.winsorize_report(df, "v", keys=["g"],
                                        lo=lo, hi=hi).collect()}
    assert got == _wins_model(rows, lo, hi)


# --------------------------------------------------------------- robust scale

@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       pool=st.integers(1, 6))
def test_robust_scale_matches_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    rows = [(i, "g" + str(rng.randrange(2)), float(rng.randrange(pool)))
            for i in range(n)]
    df = spark.createDataFrame(rows, "i long, g string, v double")
    fit = sx.robust_scale_fit(df, "v", keys=["g"])
    got = {r["i"]: r["robust_z"]
           for r in sx.robust_scale_apply(df, fit, "v",
                                          keys=["g"]).collect()}
    per = defaultdict(list)
    for _, g, v in rows:
        per[g].append(v)
    stats = {}
    for g, vs in per.items():
        s = sorted(vs)
        stats[g] = (quantile(s, 0.5),
                    quantile(s, 0.75) - quantile(s, 0.25))
    want = {}
    for i, g, v in rows:
        med, iqr = stats[g]
        want[i] = rq((v - med) / iqr) if iqr != 0 else None
    assert got == want


# --------------------------------------------------------------- mad_outliers

@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       thr=st.sampled_from([0.5, 3.5]))
def test_mad_outliers_matches_bruteforce(spark, seed, n, thr):
    import random
    rng = random.Random(seed)
    rows = [(i, "g" + str(rng.randrange(2)), float(rng.randrange(7)))
            for i in range(n)]
    df = spark.createDataFrame(rows, "i long, g string, v double")
    got = {r["i"]: (r["modified_z"], r["is_outlier"])
           for r in sx.mad_outliers(df, "v", keys=["g"],
                                    threshold=thr).collect()}
    per = defaultdict(list)
    for _, g, v in rows:
        per[g].append(v)
    med = {g: quantile(sorted(vs), 0.5) for g, vs in per.items()}
    mad = {g: quantile(sorted(abs(v - med[g]) for v in vs), 0.5)
           for g, vs in per.items()}
    want = {}
    for i, g, v in rows:
        if mad[g] != 0:
            mz_raw = 0.6745 * (v - med[g]) / mad[g]
            want[i] = (rq(mz_raw), abs(mz_raw) > thr)
        else:
            want[i] = (None, None)
    assert got == want
