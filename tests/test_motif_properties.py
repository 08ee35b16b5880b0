"""Property-based brute-force checks for the numeric/symbolic motif
family — changepoint_two_level, periodogram, sax_words. Fifth
independent-replay suite (rationale in test_rank_stats_properties.py).
What hand cases missed here:

- changepoint_two_level: the greedy second split chooses between a
  LEFT-of-first-cut and RIGHT-of-first-cut gain formula per candidate,
  with (gain desc, bucket asc) tiebreaks at both levels — the replay
  recomputes both argmaxes from prefix sums over a freshly sorted
  bucket list, including calendar gaps.
- periodogram: phase reduction before the transcendental, per-term
  repr-quantized decimal(38,10) folds, and the demeaning constant as a
  floor6 of the exact mean.
- sax_words: per-series z-normalization against own exact moments,
  quartile-breakpoint symbolization, and the words-break-at-calendar-
  gaps rule (missing buckets are NOT zero-filled).

changepoint and sax are fully rational (plus IEEE-exact sqrt) → exact
compares. periodogram's cos/sin terms get the one-6th-decimal libm
allowance on the amplitude.
"""

import math
from collections import Counter, defaultdict
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


def rquant(x, q):
    """Spark's double→decimal cast: shortest round-trip repr, HALF_UP."""
    return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)


# ------------------------------------------------- changepoint_two_level

def _cp_model(rows, bucket=86400):
    ld = defaultdict(int)
    for t, v in rows:
        ld[math.floor(float(t) / float(bucket))] += int(v)
    bs = sorted(ld)
    n = len(bs)
    if n < 3:
        return None
    cum, cums = 0, {}
    for k, b in enumerate(bs, 1):
        cum += ld[b]
        cums[k] = cum
    s, nf = float(cum), float(n)

    def sq(x):
        return x * x

    def g1(k):
        c = float(cums[k])
        return (sq(c) / float(k) + sq(s - c) / (nf - float(k))) \
            - sq(s) / nf

    k1 = max(range(1, n), key=lambda k: (g1(k), -k))
    c1, k1f = float(cums[k1]), float(k1)

    def g2(k):
        c = float(cums[k])
        if k < k1:
            return (sq(c) / float(k) + sq(c1 - c) / (k1f - float(k))) \
                - sq(c1) / k1f
        return (sq(c - c1) / (float(k) - k1f)
                + sq(s - c) / (nf - float(k))) - sq(s - c1) / (nf - k1f)

    k2 = max((k for k in range(1, n) if k != k1),
             key=lambda k: (g2(k), -k))
    klo, khi = min(k1, k2), max(k1, k2)
    clo, chi = float(cums[klo]), float(cums[khi])
    return (n, bs[k1 - 1], bs[k2 - 1], fl6(g1(k1)), fl6(g2(k2)),
            fl6(clo / float(klo)),
            fl6((chi - clo) / float(khi - klo)),
            fl6((s - chi) / (nf - float(khi))))


@SLOW
@given(seed=st.integers(0, 10 ** 6), ndays=st.integers(1, 12),
       pool=st.integers(1, 7))
def test_changepoint_two_level_matches_bruteforce(spark, seed, ndays,
                                                  pool):
    import random
    rng = random.Random(seed)
    rows = []
    for d in range(ndays):
        if rng.random() < 0.15:
            continue                      # calendar gap
        for _ in range(rng.randint(1, 3)):
            rows.append((float(d * 86400 + rng.randrange(86400)),
                         float(rng.randrange(pool) - 3)))
    df = spark.createDataFrame(rows or [(0.0, 1.0)],
                               "ts double, value double")
    got = ts.changepoint_two_level(df).collect()
    want = _cp_model(rows or [(0.0, 1.0)])
    if want is None:
        assert got == []
        return
    r = got[0]
    assert (r["n_buckets"], r["split1_bucket"], r["split2_bucket"],
            r["gain1"], r["gain2"], r["mean_seg1"], r["mean_seg2"],
            r["mean_seg3"]) == want


# ------------------------------------------------------------ periodogram

def _pg_model(rows, periods):
    pts = [(float(t), float(v)) for t, v in rows]
    n = len(pts)
    mean = math.floor(float(sum(int(v) for _, v in pts)) / n
                      * 1e6 + 0.5) / 1e6
    out = []
    for prd in periods:
        pf = float(prd)
        a = b = Decimal(0)
        for t, v in pts:
            ph = (t - math.floor(t / pf) * pf) / pf
            vd = v - mean
            cos6 = float(rquant(math.cos(2.0 * math.pi * ph), SIX))
            sin6 = float(rquant(math.sin(2.0 * math.pi * ph), SIX))
            a += rquant(vd * cos6, TEN)
            b += rquant(vd * sin6, TEN)
        af, bf = float(a), float(b)
        amp = fl6(2.0 * math.sqrt(af * af + bf * bf) / float(n))
        out.append((prd, n, amp))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25))
def test_periodogram_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    periods = (4, 6, 10)
    rows = [(float(rng.randrange(60)), float(rng.randrange(9) - 4))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "ts double, value double")
    got = [(r["period_seconds"], r["n"], r["amplitude"])
           for r in ts.periodogram(df, periods_seconds=periods).collect()]
    want = _pg_model(rows, periods)
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == w[2] or abs(g[2] - w[2]) <= 1.000001e-6, (g, w)


# -------------------------------------------------------------- sax_words

def _sax_model(rows, bucket=3600.0, word_len=3, top_k=20):
    cnt = Counter((g, math.floor(float(t) / bucket))
                  for t, g in rows if g is not None)
    series = defaultdict(dict)
    for (g, b), c in cnt.items():
        series[g][b] = c
    words = Counter()
    word_series = defaultdict(set)
    for g, bc in series.items():
        m = len(bc)
        s = sum(bc.values())
        ss = sum(c * c for c in bc.values())
        mu = float(s) / float(m)
        var = max(float(ss) / float(m) - mu * mu, 0.0)
        sd = math.sqrt(var)

        def sym(c):
            z = (float(c) - mu) / sd if sd > 0 else 0.0
            if z < -0.6745:
                return "a"
            if z < 0.0:
                return "b"
            if z < 0.6745:
                return "c"
            return "d"

        for b in sorted(bc):
            if all(b + i in bc for i in range(word_len)):
                w = "".join(sym(bc[b + i]) for i in range(word_len))
                words[w] += 1
                word_series[w].add(g)
    ranked = sorted(words, key=lambda w: (-words[w], w))[:top_k]
    return [(w, len(word_series[w]), words[w]) for w in ranked]


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 60),
       ntypes=st.integers(1, 3), nhours=st.integers(1, 8))
def test_sax_words_matches_bruteforce(spark, seed, n, ntypes, nhours):
    import random
    rng = random.Random(seed)
    rows = [(float(rng.randrange(nhours) * 3600 + rng.randrange(3600)),
             "xyz"[rng.randrange(ntypes)]) for _ in range(n)]
    df = spark.createDataFrame(rows, "ts double, event_type string")
    got = [(r["word"], r["n_series"], r["n_occurrences"])
           for r in ts.sax_words(df, "ts", "event_type").collect()]
    assert got == _sax_model(rows)
