"""Property-based brute-force checks for the corpus-drift family —
script_audit, hellinger_tv_matrix, js_divergence_matrix. Thirteenth
independent-replay suite (rationale in test_rank_stats_properties.py).
Pinned semantics:

- script_audit: char-class counts via length-difference arithmetic,
  other = n − letters − digits − spaces, all-empty groups publishing
  0.0 ratios (not NULL).
- hellinger_tv_matrix: the no-outer-join decomposition — TV's
  off-intersection mass folded per pair as (1 − Σ_I p) + (1 − Σ_I q),
  BC zero off-intersection, intersection-less pairs at TV 1 /
  Hellinger 1 through the left-join coalesce.
- js_divergence_matrix: the per-group solo-term reduction plus the
  intersection-only correction; disjoint-support pairs finite.

The replays recount tokens and probabilities from scratch (regex split
on the WS class, lowercase, drop empties). script_audit and hellinger
are rational/sqrt-exact → exact equality; JSD's log2 terms get the
libm allowance.
"""

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import text as tx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")
WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


def toks(text):
    return [w for w in WS_RE.split(text.lower()) if w]


VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _docs(rng, n, nsrc):
    return [("src" + str(rng.randrange(nsrc)),
             " ".join(rng.choice(VOCAB)
                      for _ in range(rng.randrange(0, 6))))
            for _ in range(n)]


def _pw(rows):
    cnt = defaultdict(Counter)
    for s, text in rows:
        cnt[s].update(toks(text))
    return {s: {w: c / sum(ws.values()) for w, c in ws.items()}
            for s, ws in cnt.items() if sum(ws.values()) > 0}


# ------------------------------------------------------------- script_audit

def _script_model(rows):
    per = defaultdict(lambda: [0, 0, 0, 0, 0])
    for g, t in rows:
        a = per[g]
        a[0] += 1
        a[1] += len(t)
        a[2] += sum(1 for ch in t if ch.isascii() and ch.isalpha())
        a[3] += sum(1 for ch in t if ch.isdigit())
        a[4] += sum(1 for ch in t if ch in " \t\n\r\f\x0b")
    out = {}
    for g, (nd, n, lt, dt, st_) in per.items():
        if n > 0:
            nf = float(n)
            out[g] = (nd, n, fl6(lt / nf), fl6(dt / nf), fl6(st_ / nf),
                      fl6((n - lt - dt - st_) / nf))
        else:
            out[g] = (nd, n, 0.0, 0.0, 0.0, 0.0)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25))
def test_script_audit_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    chars = "abZ09 .#\t\n"
    rows = [("g" + str(rng.randrange(3)),
             "".join(rng.choice(chars)
                     for _ in range(rng.randrange(0, 20))))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["group"]: (r["n_docs"], r["n_chars"], r["letter_ratio"],
                        r["digit_ratio"], r["space_ratio"],
                        r["other_ratio"])
           for r in tx.script_audit(df).collect()}
    assert got == _script_model(rows)


# ------------------------------------------------------ hellinger/TV matrix

def _htv_model(rows):
    pw = _pw(rows)
    srcs = sorted(pw)
    out = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            common = set(pw[sa]) & set(pw[sb])
            ti = bci = ma = mb = Decimal(0)
            for w in common:
                pa, pb = pw[sa][w], pw[sb][w]
                ti += Decimal(repr(rq(abs(pa - pb))))
                bci += Decimal(repr(rq(math.sqrt(pa * pb))))
                ma += Decimal(repr(rq(pa)))
                mb += Decimal(repr(rq(pb)))
            tif, bcf = float(ti), float(bci)
            maf, mbf = float(ma), float(mb)
            tv = (tif + (1.0 - maf) + (1.0 - mbf)) / 2.0
            out[(sa, sb)] = (len(common), fl6(tv), fl6(bcf),
                             fl6(math.sqrt(1.0 - min(bcf, 1.0))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(2, 25),
       nsrc=st.integers(2, 3))
def test_hellinger_tv_matches_bruteforce(spark, seed, n, nsrc):
    import random
    rng = random.Random(seed)
    rows = _docs(rng, n, nsrc)
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["src_a"], r["src_b"]): (r["n_common"], r["tv"], r["bc"],
                                      r["hellinger"])
           for r in tx.hellinger_tv_matrix(df).collect()}
    assert got == _htv_model(rows)


# ----------------------------------------------------------------- JSD

def _jsd_model(rows):
    pw = _pw(rows)

    def h(z):
        return -(z * (math.log(z) / math.log(2))) if z > 0 else 0.0

    solo = {s: {w: rq(h(p / 2) - h(p) / 2) for w, p in ws.items()}
            for s, ws in pw.items()}
    sv = {s: float(sum(Decimal(repr(t)) for t in ws.values()))
          for s, ws in solo.items()}
    srcs = sorted(pw)
    out = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            common = set(pw[sa]) & set(pw[sb])
            ci = sai = sbi = Decimal(0)
            for w in common:
                pa, pb = pw[sa][w], pw[sb][w]
                ci += Decimal(repr(rq(h((pa + pb) / 2)
                                      - (h(pa) + h(pb)) / 2)))
                sai += Decimal(repr(solo[sa][w]))
                sbi += Decimal(repr(solo[sb][w]))
            jsd = rq((((sv[sa] + sv[sb]) + float(ci)) - float(sai))
                     - float(sbi))
            out[(sa, sb)] = (len(common), jsd)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(2, 25),
       nsrc=st.integers(2, 3))
def test_jsd_matches_bruteforce(spark, seed, n, nsrc):
    import random
    rng = random.Random(seed)
    rows = _docs(rng, n, nsrc)
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["src_a"], r["src_b"]): (r["n_common"], r["jsd_bits"])
           for r in tx.js_divergence_matrix(df).collect()}
    want = _jsd_model(rows)
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        g, w = got[k][1], want[k][1]
        assert g == w or abs(g - w) <= 3.000001e-6, (k, got[k], want[k])
