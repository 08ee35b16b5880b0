"""Property-based brute-force twins for the round-11 operators —
each Spark operator replayed against a plain-Python reference on
randomized small inputs (fixed seeds via hypothesis). Strategies stay
small: a Spark job per example."""
import math
import random
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import graph as gr
from powerdatapipeline_spark.operators import stats as sto
from powerdatapipeline_spark.operators import timeseries as tso

SLOW = replay_settings(6)

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


@SLOW
@given(seed=st.integers(0, 10_000), k=st.integers(2, 5),
       n_total=st.integers(0, 50))
def test_neyman_allocation_matches_bruteforce(spark, seed, k, n_total):
    rng = random.Random(seed)
    rows = [(f"s{i}", float(rng.randint(0, 20)))
            for i in range(k) for _ in range(rng.randint(1, 6))]
    df = spark.createDataFrame([Row(g=g, v=v) for g, v in rows])
    got = {r.stratum: r
           for r in sto.neyman_allocation(df, "v", "g", n_total).collect()}

    per = defaultdict(list)
    for g, v in rows:
        per[g].append(round(v * 1e6))  # exact micro ints
    w = {}
    for g, mus in per.items():
        n = len(mus)
        s, ss = sum(mus), sum(m * m for m in mus)
        var = max(ss / n - (s / n) ** 2, 0.0) / 1e12
        w[g] = fl6(n * math.sqrt(var))
    tot = sum(w.values())
    quota = {g: (n_total * w[g] / tot if tot > 0 else 0.0) for g in w}
    base = {g: math.floor(quota[g]) for g in w}
    frac = {g: quota[g] - base[g] for g in w}
    left = n_total - sum(base.values()) if tot > 0 else 0
    order = sorted(w, key=lambda g: (-frac[g], g))
    alloc = dict(base)
    for g in order[:left]:
        alloc[g] += 1
    for g in w:
        assert got[g].n_alloc == alloc[g], (g, quota, left)
    if tot > 0:
        assert sum(r.n_alloc for r in got.values()) == n_total


@SLOW
@given(seed=st.integers(0, 10_000), n_units=st.integers(2, 12))
def test_krippendorff_matches_bruteforce(spark, seed, n_units):
    rng = random.Random(seed)
    rows = []
    for u in range(n_units):
        for _ in range(rng.randint(1, 4)):
            rows.append((u, rng.choice("xyz"[:rng.randint(2, 3)])))
    df = spark.createDataFrame([Row(u=u, c=c) for u, c in rows])
    got = sto.krippendorff_alpha(df, "u", "c").collect()[0]

    per = defaultdict(Counter)
    for u, c in rows:
        per[u][c] += 1
    pairable = {u: cc for u, cc in per.items() if sum(cc.values()) >= 2}
    n = sum(sum(cc.values()) for cc in pairable.values())
    assert got.n_ratings == n
    if not pairable:
        return
    dsum = sum(round(nuc * (sum(cc.values()) - nuc)
                     / (sum(cc.values()) - 1), 6)
               for cc in pairable.values() for nuc in cc.values())
    nc = Counter()
    for cc in pairable.values():
        nc.update(cc)
    esum = sum(v * (n - v) for v in nc.values())
    assert got.d_o == fl6(dsum / n)
    assert got.d_e == fl6(esum / (n * (n - 1))) if n > 1 else True
    if esum > 0:
        assert abs(got.alpha
                   - fl6(1 - (dsum / n) / (esum / (n * (n - 1))))) < 2e-6


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(6, 40))
def test_markov_entropy_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = []
    for u in range(2):
        for i in range(n):
            rows.append((u, float(i), rng.choice("AB")))
    df = (spark.createDataFrame([Row(u=u, t=t, s=s) for u, t, s in rows])
          .select("u", F.col("t").cast("timestamp").alias("t"), "s"))
    got = tso.markov_entropy_rate(df, "t", "s", ["u"]).collect()[0]

    pairs = Counter()
    for u in range(2):
        seq = [s for (uu, _t, s) in rows if uu == u]
        pairs.update(zip(seq, seq[1:]))
    ni = Counter()
    for (a, _b), c in pairs.items():
        ni[a] += c
    ntr = sum(pairs.values())
    tsum = sum(c * round(math.log(c / ni[a]), 6)
               for (a, _b), c in pairs.items())
    assert got.n_transitions == ntr
    assert got.entropy_rate == fl6(-tsum / ntr)


@SLOW
@given(seed=st.integers(0, 10_000), n_edges=st.integers(1, 25))
def test_label_propagation_matches_bruteforce(spark, seed, n_edges):
    rng = random.Random(seed)
    edges = {(rng.randint(0, 9), rng.randint(0, 9))
             for _ in range(n_edges)}
    edges = {(a, b) for a, b in edges if a != b}
    if not edges:
        return
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r.label: r.n_nodes
           for r in gr.label_propagation(df, rounds=2).collect()}

    sym = defaultdict(set)
    for a, b in edges:
        sym[a].add(b)
        sym[b].add(a)
    labels = {v: v for v in sym}
    for _ in range(2):
        new = {}
        for v in sym:
            cnt = Counter(labels[w] for w in sym[v])
            # most frequent, ties -> smallest label
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        labels = new
    want = Counter(labels.values())
    assert got == dict(want)
