"""Property-based brute-force checks for association_rules,
benford_audit, sequence_ngrams, and shuffle_runs_audit — the ninth
independent-replay suite (rationale in test_rank_stats_properties.py).
The pinned semantics:

- association_rules: a-priori over DISTINCT (basket, item), the
  min_pair_count prune applied before the marginal joins, and the
  (lift desc, item_a, item_b) total order at the top-k cut.
- benford_audit: first digit from the integer-cents decimal STRING
  (never log10-of-value), with the sub-cent positive exclusion.
- sequence_ngrams: lead-based n-grams follow entity ORDER (ts,
  tiebreak), not time contiguity, and end at the entity boundary.
- shuffle_runs_audit: the full md5 chain replayed in Python —
  shard = int(md5(salt‖key)[:8], 16) mod n, position by the
  15-hex-digit uniform with key tie-break — then runs counted in that
  order against the Σ n_c(n_c−1)/n expectation.

Everything is rational except Benford's log10 constants (one
6th-decimal allowance there).
"""

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as sx
from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def fl6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


def close6(g, w):
    if g is None or w is None:
        return g is None and w is None
    return g == w or abs(g - w) <= 1.000001e-6


# ------------------------------------------------------- association_rules

def _rules_model(rows, min_pair=2, top_k=25):
    li = {(b, i) for b, i in rows if b is not None and i is not None}
    baskets = defaultdict(set)
    for b, i in li:
        baskets[b].add(i)
    n_orders = len(baskets)
    item_n = Counter(i for _, i in li)
    pair_n = Counter()
    for items in baskets.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pair_n[(s[x], s[y])] += 1
    nd = float(n_orders)
    out = []
    for (a, b), np_ in pair_n.items():
        if np_ < min_pair:
            continue
        na, nb = item_n[a], item_n[b]
        lift = fl6(nd * float(np_) / (float(na) * float(nb)))
        out.append((a, b, np_, na, nb, fl6(float(np_) / nd),
                    fl6(float(np_) / float(na)),
                    fl6(float(np_) / float(nb)), lift))
    out.sort(key=lambda r: (-r[8], r[0], r[1]))
    return out[:top_k]


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 60),
       nb=st.integers(1, 10), ni=st.integers(2, 6))
def test_association_rules_matches_bruteforce(spark, seed, n, nb, ni):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nb), "pqrstu"[rng.randrange(ni)])
            for _ in range(n)]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = [(r["item_a"], r["item_b"], r["n_pairs"], r["n_a"], r["n_b"],
            r["support"], r["conf_a_to_b"], r["conf_b_to_a"], r["lift"])
           for r in rel.association_rules(df, "basket", "item").collect()]
    assert got == _rules_model(rows)


# ----------------------------------------------------------- benford_audit

def _benford_model(vals):
    counts = Counter()
    for x in vals:
        if x is None or not x > 0:
            continue
        cents = math.floor(float(x) * 100 + 0.5)
        if cents >= 1:
            counts[int(str(cents)[0])] += 1
    total = sum(counts.values())
    out = []
    for d in sorted(counts):
        n = counts[d]
        p6 = rq(math.log10(1.0 + 1.0 / float(d)))
        dev = float(n) - float(total) * p6
        out.append((d, n, total, rq(float(n) / float(total)), p6,
                    rq(dev * dev / (float(total) * p6))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 50))
def test_benford_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    vals = [round(rng.uniform(-0.5, 99.0), 2) for _ in range(n)]
    vals += [0.004, 0.0, 1.0]             # sub-cent + zero exclusions
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [(r["digit"], r["n"], r["total"], r["share"], r["expected_p"],
            r["chi2_term"])
           for r in sx.benford_audit(df, "v").collect()]
    want = _benford_model(vals)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert close6(g[4], w[4]) and close6(g[5], w[5]), (g, w)


# --------------------------------------------------------- sequence_ngrams

def _grams_model(rows, n=3, top_k=25):
    per = defaultdict(list)
    for k, t, i, s in rows:
        per[k].append((float(t), i, s))
    grams = Counter()
    for evs in per.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        states = [s for _, _, s in evs]
        for j in range(len(states) - n + 1):
            grams[tuple(states[j:j + n])] += 1
    ranked = sorted(grams, key=lambda g: (-grams[g], g))[:top_k]
    return [(g[0], g[1], g[2], grams[g]) for g in ranked]


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nkeys=st.integers(1, 4))
def test_sequence_ngrams_matches_bruteforce(spark, seed, n, nkeys):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nkeys), float(rng.randrange(6)), i,
             rng.choice("AB")) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, ts double, i long, s string")
    got = [(r["s1"], r["s2"], r["s3"], r["n_occurrences"])
           for r in ts.sequence_ngrams(df, "ts", "k", "s",
                                       tiebreak_col="i").collect()]
    assert got == _grams_model(rows)


# ------------------------------------------------------- shuffle_runs_audit

def _md5_prefix(key, salt, n_hex):
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:n_hex],
               16)


def _runs_model(rows, n_shards, salt=""):
    per = defaultdict(list)
    for key, cls in rows:
        shard = _md5_prefix(key, salt, 8) % n_shards
        u = (_md5_prefix(key, salt + "|order", 15) + 1) / float(1 << 60)
        per[shard].append((u, key, cls))
    out = {}
    for shard, evs in per.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        classes = [c for _, _, c in evs]
        n = len(classes)
        n_runs = sum(1 for j, c in enumerate(classes)
                     if j == 0 or classes[j - 1] != c)
        cnt = Counter(classes)
        ee = sum(c * (c - 1) for c in cnt.values())
        expected = float(n) - float(ee) / float(n)
        out[shard] = (n, len(cnt), n_runs, fl6(expected),
                      fl6(n_runs / expected) if expected > 0 else None)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       n_shards=st.sampled_from([1, 2, 4]))
def test_shuffle_runs_matches_bruteforce(spark, seed, n, n_shards):
    import random
    rng = random.Random(seed)
    rows = [(i, rng.choice("xy")) for i in range(n)]
    df = spark.createDataFrame(rows, "key long, cls string")
    got = {r["shard_id"]: (r["n_rows"], r["n_classes"], r["n_runs"],
                           r["expected_runs"], r["runs_ratio"])
           for r in rel.shuffle_runs_audit(df, "key", "cls",
                                           n_shards).collect()}
    assert got == _runs_model(rows, n_shards)
