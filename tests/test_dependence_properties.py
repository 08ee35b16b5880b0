"""Property-based brute-force checks for binary_auc,
mutual_information, chisq_independence, and gini_concentration — the
fourth independent-replay suite (see test_rank_stats_properties.py for
the rationale). The headline pin here is AUC: the engine computes the
Mann–Whitney statistic via a cumulative-counts identity
(Σ np·(2·cum_neg_below + nn)), and the replay counts EVERY
positive/negative PAIR directly (+2 for a win, +1 for a tie) — two
derivations that only agree if the tie-half-credit identity is right.
Chi-square's analytic zero-cell fold (Σ_zero e = (N² − Σ_nonzero
n_x·n_y)/N) is likewise replayed against literally enumerating the
empty cells, and Gini's run-arithmetic Σ i·x_(i) against a plain
per-row sorted sum.

Rational/integer outputs compare exactly. MI's ln-derived columns get a
one-6th-decimal-step allowance per term (the Python-vs-JVM libm ulp
seam; nmi divides two such values so its allowance is wider).
"""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import stats as sx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def round6(x):
    """Spark's round(double, 6): the double goes through
    BigDecimal.valueOf — Double.toString's SHORTEST round-trip decimal
    (Python's repr), NOT the exact binary expansion — then HALF_UP.
    Decimal(x) (exact expansion) rounds 0.25·ln(4) ≈ 0.3465735 the
    other way (hypothesis found it: exact expansion ...349999 rounds
    down, shortest repr "0.3465735" rounds up)."""
    return Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP)


def close(got, want, tol):
    if got is None or want is None:
        return got is None and want is None
    return got == want or abs(got - want) <= tol


# --------------------------------------------------------------- ROC AUC

def _auc_model(rows):
    pts = [(float(s), bool(y)) for s, y in rows
           if s is not None and y is not None]
    pos = [s for s, y in pts if y]
    neg = [s for s, y in pts if not y]
    if not pos or not neg:
        return None
    num = sum(2 if p > q else (1 if p == q else 0)
              for p in pos for q in neg)   # doubled Mann–Whitney U
    auc = fl6(float(num) / (2.0 * len(pos) * len(neg)))
    return (len(pos), len(neg), len({s for s, _ in pts}),
            auc, 2.0 * auc - 1.0)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(0, 40),
       pool=st.integers(1, 6))
def test_binary_auc_matches_pairwise_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    rows = [(float(rng.randrange(pool)), rng.random() < 0.5)
            for _ in range(n)]
    rows += [(0.0, True), (1.0, False)]   # both classes non-empty
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = sx.binary_auc(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["n_scores"], r["auc"],
            r["gini"]) == _auc_model(rows)


def test_binary_auc_single_class_empty(spark):
    df = spark.createDataFrame([(1.0, True), (2.0, True)],
                               "s double, y boolean")
    assert sx.binary_auc(df, "s", "y").count() == 0


# --------------------------------------------------- mutual information

def _mi_model(rows):
    pts = [(x, y) for x, y in rows if x is not None and y is not None]
    nxy = Counter(pts)
    nx = Counter(x for x, _ in pts)
    ny = Counter(y for _, y in pts)
    n = float(len(pts))
    mi = Decimal(0)
    for (x, y), c in nxy.items():
        ratio = (float(c) * n) / (float(nx[x]) * float(ny[y]))
        mi += round6((float(c) / n) * float(round6(math.log(ratio))))
    hx = sum((round6((float(c) / n) * -float(round6(math.log(float(c) / n))))
              for c in nx.values()), Decimal(0))
    hy = sum((round6((float(c) / n) * -float(round6(math.log(float(c) / n))))
              for c in ny.values()), Decimal(0))
    mi_f, hx_f, hy_f = float(mi), float(hx), float(hy)
    hmin = min(hx_f, hy_f)
    return (len(pts), len(nx), len(ny), hx_f, hy_f, mi_f,
            fl6(mi_f / hmin) if hmin > 0 else None)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       xl=st.integers(1, 4), yl=st.integers(1, 4))
def test_mutual_information_matches_bruteforce(spark, seed, n, xl, yl):
    import random
    rng = random.Random(seed)
    rows = [("uvwx"[rng.randrange(xl)], "pqrs"[rng.randrange(yl)])
            for _ in range(n)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = sx.mutual_information(df, "x", "y").collect()[0]
    w = _mi_model(rows)
    assert (r["n"], r["x_levels"], r["y_levels"]) == w[:3]
    assert close(r["h_x"], w[3], 2e-6) and close(r["h_y"], w[4], 2e-6)
    assert close(r["mi"], w[5], 2e-6) and close(r["nmi"], w[6], 1e-4)


# ------------------------------------------------- chi-square + Cramér V

def _chisq_model(rows):
    pts = [(x, y) for x, y in rows if x is not None and y is not None]
    nxy = Counter(pts)
    nx = Counter(x for x, _ in pts)
    ny = Counter(y for _, y in pts)
    n = len(pts)
    nd = float(n)
    tsum = Decimal(0)
    for (x, y), c in nxy.items():
        d = c * n - nx[x] * ny[y]
        tsum += round6((float(d) / nd)
                       * (float(d) / (float(nx[x]) * float(ny[y]))))
    # the replay enumerates the EMPTY cells literally — the engine folds
    # them analytically; equality is the point of the test
    zero_e = sum(nx[x] * ny[y] for x in nx for y in ny
                 if (x, y) not in nxy)
    zero_term = float(round6(float(zero_e) / nd))
    chi2 = float(round6(float(tsum) + zero_term))
    dof = (len(nx) - 1) * (len(ny) - 1)
    mindim = min(len(nx), len(ny)) - 1
    v = fl6(math.sqrt(chi2 / (nd * mindim))) if mindim > 0 else None
    return n, len(nx), len(ny), dof, chi2, v


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       xl=st.integers(1, 4), yl=st.integers(1, 4))
def test_chisq_matches_bruteforce(spark, seed, n, xl, yl):
    import random
    rng = random.Random(seed)
    rows = [("uvwx"[rng.randrange(xl)], "pqrs"[rng.randrange(yl)])
            for _ in range(n)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = sx.chisq_independence(df, "x", "y").collect()[0]
    assert (r["n"], r["x_levels"], r["y_levels"], r["dof"], r["chi2"],
            r["cramers_v"]) == _chisq_model(rows)


# ------------------------------------------------------------------ Gini

def _gini_model(vals):
    vs = sorted(int(v) for v in vals if v is not None and v >= 0)
    n, total = len(vs), sum(vs)
    ix = sum(i * v for i, v in enumerate(vs, 1))   # Σ i·x_(i), per-row
    if total == 0:
        return n, total, None
    nd = float(n)
    g = (2.0 * float(ix)) / (nd * float(total)) - (nd + 1.0) / nd
    return n, total, fl6(g)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       pool=st.integers(1, 8))
def test_gini_concentration_matches_bruteforce(spark, seed, n, pool):
    import random
    rng = random.Random(seed)
    vals = [rng.randrange(pool) for _ in range(n)] \
        + [None, -3]                       # excluded: NULL and negative
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = sx.gini_concentration(df, "v").collect()[0]
    assert (r["n"], r["total"], r["gini"]) == _gini_model(vals)
