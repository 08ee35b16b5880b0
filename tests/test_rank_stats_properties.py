"""Property-based brute-force checks for the rank/omnibus statistics —
kruskal_wallis, mann_kendall, anova_f — the three operators whose
hand-case tests pin single examples but whose TIE HANDLING (tie-averaged
doubled ranks, tie-corrected variance, micro-unit moments) is exactly
where a shared engine+oracle derivation error would hide (the
common-mode class the krippendorff hypothesis suite caught in round 13).

Each model replays the operator's DOCUMENTED arithmetic independently —
plain dict/Counter walks in Python, no window functions, no Spark — with
the same floor6 (floor(x·1e6 + 0.5)/1e6) and expression SHAPES
(left-associated products, micro-integer accumulators summed exactly and
divided once) so the comparison is EXACT double equality, not approx:
any divergence is a real semantics difference, not float noise.

Hypothesis drives the tie structure: small integer value pools force
heavy ties; group/day counts sweep the guard boundaries (k = 2, all
values identical, flat series, var_s = 0).
"""

import math
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import stats as sx
from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


# --------------------------------------------------------- Kruskal–Wallis

def _kw_model(pairs):
    vals = [(g, float(v)) for g, v in pairs
            if g is not None and v is not None]
    cnt = Counter(v for _, v in vals)
    r2, cum = {}, 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1   # doubled tie-averaged rank
        cum += cnt[v]
    per = defaultdict(lambda: [0, 0])
    for g, v in vals:
        per[g][0] += 1
        per[g][1] += r2[v]
    k, n = len(per), sum(a[0] for a in per.values())
    hsum_micro = 0
    for ng, r2sum in per.values():
        rg = float(r2sum) / 2.0
        x = 12.0 * rg * rg / ((float(n) * (float(n) + 1.0)) * float(ng))
        hsum_micro += math.floor(x * 1e6 + 0.5)
    hsum = float(hsum_micro) / 1e6
    n_values = len(cnt)
    tt = sum(t ** 3 - t for t in cnt.values())
    h_raw = hsum - 3.0 * (float(n) + 1.0)
    nf = float(n)
    corr_raw = 1.0 - float(tt) / (nf * nf * nf - nf)
    return (k, n, n_values, fl6(h_raw),
            fl6(corr_raw) if n > 1 else None,
            fl6(h_raw / corr_raw) if n > 1 and n_values > 1 else None)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 30),
       pool=st.integers(2, 8), ngroups=st.integers(2, 4))
def test_kruskal_wallis_matches_bruteforce(spark, seed, n, pool, ngroups):
    import random
    rng = random.Random(seed)
    rows = [("abcd"[rng.randrange(ngroups)], float(rng.randrange(pool)))
            for _ in range(n)]
    rows += [("a", 1.0), ("b", 2.0)]        # guard: k >= 2 always
    df = spark.createDataFrame(rows, "g string, v double")
    r = sx.kruskal_wallis(df, "v", "g").collect()[0]
    assert (r["k"], r["n"], r["n_values"], r["h"],
            r["tie_correction"], r["h_adj"]) == _kw_model(rows)


# ----------------------------------------------------------- Mann–Kendall

def _mk_model(rows, bucket=86400):
    by_day = defaultdict(list)
    for t, v in rows:
        if t is None or v is None:
            continue
        by_day[math.floor(float(t) / float(bucket))].append(float(v))
    days = {d: math.floor(float(sum(vs)) / len(vs) * 1e6 + 0.5) / 1e6
            for d, vs in by_day.items()}
    ds = sorted(days)
    m = len(ds)
    pairs = [(di, dj) for i, di in enumerate(ds) for dj in ds[i + 1:]]
    n_pairs = len(pairs)
    s = sum((days[dj] > days[di]) - (days[dj] < days[di])
            for di, dj in pairs)
    slopes = sorted(((days[dj] - days[di]) / float(dj - di), di, dj)
                    for di, dj in pairs)
    sen = slopes[(n_pairs + 1) // 2 - 1][0]   # lower median, 1-based
    tt = sum(t * (t - 1) * (2 * t + 5)
             for t in Counter(days.values()).values())
    mf = float(m)
    var = (mf * (mf - 1.0) * (2.0 * mf + 5.0) - float(tt)) / 18.0
    if s > 0:
        z_raw = (float(s) - 1.0) / math.sqrt(var)
    elif s < 0:
        z_raw = (float(s) + 1.0) / math.sqrt(var)
    else:
        z_raw = 0.0
    return (m, n_pairs, s, fl6(var),
            fl6(z_raw) if var > 0 else None, fl6(sen))


@SLOW
@given(seed=st.integers(0, 10 ** 6), m=st.integers(2, 10),
       pool=st.integers(1, 5), events_per_day=st.integers(1, 3))
def test_mann_kendall_matches_bruteforce(spark, seed, m, pool,
                                         events_per_day):
    import random
    rng = random.Random(seed)
    rows = [(float(d * 86400 + rng.randrange(86400)),
             float(rng.randrange(pool)))
            for d in range(m) for _ in range(rng.randint(1, events_per_day))]
    df = spark.createDataFrame(rows, "ts double, value double")
    r = ts.mann_kendall(df).collect()[0]
    assert (r["n_buckets"], r["n_pairs"], r["s"], r["var_s"],
            r["z"], r["sen_slope"]) == _mk_model(rows)


def test_mann_kendall_single_bucket_is_empty(spark):
    """Pin the documented degenerate: one bucket → no pairs → the
    median cross join empties the output frame (callers see zero rows,
    never a NULL-studded one)."""
    df = spark.createDataFrame([(10.0, 1.0), (20.0, 2.0)],
                               "ts double, value double")
    assert ts.mann_kendall(df).count() == 0


# -------------------------------------------------------------- ANOVA F

def _anova_model(pairs):
    per = defaultdict(lambda: [0, 0, 0])
    for g, v in pairs:
        if g is None or v is None:
            continue
        mu = math.floor(float(v) * 1e6 + 0.5)
        a = per[g]
        a[0] += 1
        a[1] += mu
        a[2] += mu * mu
    k = len(per)
    n = sum(a[0] for a in per.values())
    g_tot = sum(a[1] for a in per.values())
    nf, g6 = float(n), float(g_tot) / 1e6
    ssb_micro = ssw_micro = 0
    for ng, s, ss in per.values():
        nd, s6, ss12 = float(ng), float(s) / 1e6, float(ss) / 1e12
        ssw_micro += math.floor((ss12 - (s6 * s6) / nd) * 1e6 + 0.5)
        mdiff = s6 / nd - g6 / nf
        ssb_micro += math.floor((nd * mdiff * mdiff) * 1e6 + 0.5)
    ssb, ssw = float(ssb_micro) / 1e6, float(ssw_micro) / 1e6
    dfb, dfw = k - 1, n - k
    f = fl6((ssb / float(dfb)) / (ssw / float(dfw))) if ssw > 0 else None
    eta = fl6(ssb / (ssb + ssw)) if ssb + ssw > 0 else None
    return k, n, ssb, ssw, dfb, dfw, f, eta


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 30),
       pool=st.integers(1, 8), ngroups=st.integers(2, 4))
def test_anova_f_matches_bruteforce(spark, seed, n, pool, ngroups):
    import random
    rng = random.Random(seed)
    rows = [("abcd"[rng.randrange(ngroups)], float(rng.randrange(pool)))
            for _ in range(n)]
    rows += [("a", 1.0), ("a", 2.0), ("b", 3.0)]   # guard: k>=2, n>k
    df = spark.createDataFrame(rows, "g string, v double")
    r = sx.anova_f(df, "v", "g").collect()[0]
    assert (r["k"], r["n"], r["ssb"], r["ssw"], r["df_between"],
            r["df_within"], r["f_stat"], r["eta_sq"]) == _anova_model(rows)
