"""Property-based brute-force checks for the distribution-comparison
statistics — spearman_corr, welch_ttest, ks_test, levene_bf — the
second half of the rank/moment family (test_rank_stats_properties.py
covers kruskal_wallis / mann_kendall / anova_f). Same rationale: the
hand-case tests pin single examples, but tie-averaged ranks, exact
micro-unit moments, the KS integer cross-product maximization, and the
lower-median centering are where a shared engine+oracle derivation
error would hide.

Each model replays the documented arithmetic independently (dict/Counter
walks, no Spark, no windows) with the operators' exact expression shapes
— floor6 = floor(x·1e6 + 0.5)/1e6, left-associated double products,
integer accumulators divided once — so every comparison is EXACT double
equality.
"""

import math
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import stats as sx

SLOW = replay_settings(8)


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _ranks2(vals):
    """Doubled tie-averaged rank per distinct value: 2r = 2·cum_below
    + ties + 1 (exact integers)."""
    cnt = Counter(vals)
    out, cum = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    return out


# --------------------------------------------------------------- Spearman

def _spearman_model(pairs):
    pts = [(float(x), float(y)) for x, y in pairs
           if x is not None and y is not None]
    rx = _ranks2([x for x, _ in pts])
    ry = _ranks2([y for _, y in pts])
    n = len(pts)
    sx_, sy_ = sum(rx[x] for x, _ in pts), sum(ry[y] for _, y in pts)
    sxy = sum(rx[x] * ry[y] for x, y in pts)
    sxx = sum(rx[x] * rx[x] for x, _ in pts)
    syy = sum(ry[y] * ry[y] for _, y in pts)
    nd = float(n)
    da = nd * float(sxx) - float(sx_) * float(sx_)
    db = nd * float(syy) - float(sy_) * float(sy_)
    num = nd * float(sxy) - float(sx_) * float(sy_)
    rho = (fl6(num / (math.sqrt(da) * math.sqrt(db)))
           if da > 0 and db > 0 else None)
    return n, len(rx), len(ry), rho


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 35),
       pool=st.integers(1, 6))
def test_spearman_matches_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    rows = [(float(rng.randrange(pool)), float(rng.randrange(pool)))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = sx.spearman_corr(df, "x", "y").collect()[0]
    assert (r["n"], r["x_distinct"], r["y_distinct"],
            r["rho"]) == _spearman_model(rows)


# ---------------------------------------------------------------- Welch t

def _welch_model(rows):
    acc = {"a": [0, 0, 0], "b": [0, 0, 0]}
    for g, v in rows:
        if g not in acc or v is None:
            continue
        mu = math.floor(float(v) * 1e6 + 0.5)
        a = acc[g]
        a[0] += 1
        a[1] += mu
        a[2] += mu * mu
    (na, sa_i, ssa_i), (nb, sb_i, ssb_i) = acc["a"], acc["b"]
    naf, nbf = float(na), float(nb)
    sa, sb = float(sa_i) / 1e6, float(sb_i) / 1e6
    ssa, ssb = float(ssa_i) / 1e12, float(ssb_i) / 1e12
    va = (ssa - sa * sa / naf) / (naf - 1.0)
    vb = (ssb - sb * sb / nbf) / (nbf - 1.0)
    se2 = va / naf + vb / nbf
    t = (sa / naf - sb / nbf) / math.sqrt(se2)
    dfree = (se2 * se2) / ((va / naf) * (va / naf) / (naf - 1.0)
                           + (vb / nbf) * (vb / nbf) / (nbf - 1.0))
    return (na, nb, fl6(sa / naf), fl6(sb / nbf), fl6(va), fl6(vb),
            fl6(t), fl6(dfree))


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 30),
       pool=st.integers(1, 6))
def test_welch_matches_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    rows = [(rng.choice("abc"), float(rng.randrange(pool)))
            for _ in range(n)]
    # guards: both sides >= 2 rows, side a has spread so se2 > 0 (t and
    # df are undefined on zero pooled variance — not a tested shape);
    # side c is the must-be-excluded distractor
    rows += [("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 2.0), ("c", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = sx.welch_ttest(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"], r["var_a"],
            r["var_b"], r["t"], r["df"]) == _welch_model(rows)


# --------------------------------------------------------------------- KS

def _ks_model(rows):
    per = defaultdict(lambda: [0, 0])
    for g, v in rows:
        if g not in ("a", "b") or v is None:
            continue
        per[float(v)][0 if g == "a" else 1] += 1
    na = sum(c[0] for c in per.values())
    nb = sum(c[1] for c in per.values())
    cuma = cumb = 0
    dmax, d_at = -1, None
    for v in sorted(per):
        cuma += per[v][0]
        cumb += per[v][1]
        dnum = abs(cuma * nb - cumb * na)
        if dnum > dmax:
            dmax, d_at = dnum, v
    d = fl6(float(dmax) / (float(na) * float(nb)))
    return na, nb, len(per), d, d_at


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 30),
       pool=st.integers(1, 6))
def test_ks_matches_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    rows = [(rng.choice("abc"), float(rng.randrange(pool)))
            for _ in range(n)]
    rows += [("a", 0.0), ("b", 1.0)]   # both sides non-empty
    df = spark.createDataFrame(rows, "g string, v double")
    r = sx.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_values"], r["d"],
            r["d_at"]) == _ks_model(rows)


def test_ks_one_empty_side_yields_empty_frame(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                               "g string, v double")
    assert sx.ks_test(df, "v", "g", "a", "b").count() == 0


# -------------------------------------------------- Brown–Forsythe Levene

def _levene_model(rows):
    per = defaultdict(list)
    for g, v in rows:
        if g is None or v is None:
            continue
        per[g].append(float(v))
    centered = []
    for g, vs in per.items():
        cnt = Counter(vs)
        n_g, cum, med = len(vs), 0, None
        for v in sorted(cnt):
            cum += cnt[v]
            if cum >= (n_g + 1) // 2:
                med = v
                break
        centered += [(g, abs(v - med)) for v in vs]
    # the deviations flow through the UNCHANGED anova_f — reuse its
    # replay so the one-operator-one-seam contract is what's tested
    from tests.test_rank_stats_properties import _anova_model
    return _anova_model(centered)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 30),
       pool=st.integers(1, 8), ngroups=st.integers(2, 4))
def test_levene_bf_matches_bruteforce(spark, seed, n, pool, ngroups):
    import random
    rng = random.Random(seed)
    rows = [("abcd"[rng.randrange(ngroups)], float(rng.randrange(pool)))
            for _ in range(n)]
    rows += [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = sx.levene_bf(df, "v", "g").collect()[0]
    assert (r["k"], r["n"], r["ssb"], r["ssw"], r["df_between"],
            r["df_within"], r["f_stat"], r["eta_sq"]) == _levene_model(rows)
