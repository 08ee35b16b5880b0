"""Property-based brute-force twins for the round-11b/c/d operators —
randomized small inputs, plain-Python references, fixed hypothesis
seeds. Strategies stay small: a Spark job per example."""
import math
import random
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as sto
from powerdatapipeline_spark.operators import timeseries as tso

SLOW = replay_settings(6)

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(4, 40))
def test_woe_iv_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = [(rng.randint(0, 3), rng.random() < 0.5) for _ in range(n)]
    df = spark.createDataFrame([Row(b=b, y=y) for b, y in rows])
    got = {r.bucket: r for r in
           sto.woe_iv(df, F.col("b"), F.col("y")).collect()}

    pos = Counter(b for b, y in rows if y)
    neg = Counter(b for b, y in rows if not y)
    G, B = sum(pos.values()), sum(neg.values())
    iv_total = 0.0
    want = {}
    for b in set(pos) | set(neg):
        g, bb = pos.get(b, 0), neg.get(b, 0)
        if g > 0 and bb > 0 and G > 0 and B > 0:
            woe = round(math.log((g / G) / (bb / B)), 6)
            iv_total += (g / G - bb / B) * woe
            want[b] = (g, bb, woe)
        else:
            want[b] = (g, bb, None)
    for b, (g, bb, woe) in want.items():
        assert got[b].n_pos == g and got[b].n_neg == bb
        assert got[b].woe == woe
    if any(w is not None for (_g, _b, w) in want.values()):
        # iv terms fold at decimal(28,12) of the double product — agree
        # to the fold's rounding
        some = next(iter(got.values()))
        assert abs(some.iv_total - fl6(iv_total)) <= 2e-6


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(2, 30))
def test_join_size_estimate_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    left = [rng.randint(0, 5) for _ in range(n)]
    right = [rng.randint(0, 5) for _ in range(n)]
    l = spark.createDataFrame([Row(k=k) for k in left])
    r = spark.createDataFrame([Row(k=k) for k in right])
    got = {row.key: row for row in
           rel.join_size_estimate(l, r, "k", "k", top_k=20).collect()}
    lc, rc = Counter(left), Counter(right)
    want = {k: lc[k] * rc[k] for k in lc if k in rc}
    total = sum(want.values())
    assert {k: v.contrib for k, v in got.items()} == want
    for k, v in got.items():
        assert v.est_total_rows == total
        assert v.share == fl6(want[k] / total)


@SLOW
@given(seed=st.integers(0, 10_000), k=st.integers(2, 4))
def test_stratified_exact_split_counts(spark, seed, k):
    rng = random.Random(seed)
    rows = [(f"key{seed}_{i}", f"s{i % k}")
            for i in range(rng.randint(k, 60))]
    df = spark.createDataFrame([Row(kk=a, g=b) for a, b in rows])
    out = rel.stratified_exact_split(df, "kk", "g").collect()
    per = defaultdict(dict)
    for r in out:
        per[r.stratum][r.split] = r.n_rows
    sizes = Counter(b for _a, b in rows)
    for g, d in per.items():
        n = sizes[g]
        b1, b2 = math.floor(0.8 * n), math.floor(0.9 * n)
        assert d.get("train", 0) == b1
        assert d.get("val", 0) == b2 - b1
        assert d.get("test", 0) == n - b2
        assert sum(d.values()) == n


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(3, 30))
def test_ramp_rates_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = [(1, float(i * 60 + rng.randint(0, 30)),
             float(rng.randint(0, 20))) for i in range(n)]
    df = (spark.createDataFrame([Row(u=u, e=e, v=v) for u, e, v in rows])
          .select("u", F.col("e").cast("timestamp").alias("ts"), "v",
                  F.lit("g").alias("g")))
    got = tso.ramp_rates(df, "ts", "v", "g", ["u"]).collect()[0]
    pts = sorted((e, v) for _u, e, v in rows)
    ramps = [round(abs(v1 - v0) / ((t1 - t0) / 3600.0), 6)
             for (t0, v0), (t1, v1) in zip(pts, pts[1:]) if t1 > t0]
    assert got.n_ramps == len(ramps)
    assert got.max_ramp == max(ramps)
    srt = sorted(ramps)
    m = len(srt)
    for q, col in [(0.5, got.p50_ramp), (0.9, got.p90_ramp)]:
        pos = math.floor(q * (m - 1) + 0.5)
        assert col == srt[pos]
    assert abs(got.mean_ramp - fl6(sum(ramps) / m)) <= 2e-6


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(4, 40))
def test_policy_replay_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    arms = ["a", "b", "c"]
    rows = [(rng.choice(arms), float(rng.randint(0, 1)),
             rng.choice(arms)) for _ in range(n)]
    df = spark.createDataFrame([Row(arm=a, r=r, t=t) for a, r, t in rows])
    out = {r.arm: r for r in sto.policy_replay_eval(
        df, "arm", F.col("r"), F.col("t")).collect()}
    matched = [(a, r) for a, r, t in rows if a == t]
    overall = out[None]
    assert overall.n_logged == n
    assert overall.n_matched == len(matched)
    if matched:
        assert overall.reward_rate == fl6(
            sum(r for _a, r in matched) / len(matched))
    for arm in set(a for a, _r, _t in rows):
        lg = [r for a, r, _t in rows if a == arm]
        mt = [r for a, r in matched if a == arm]
        assert out[arm].n_logged == len(lg)
        assert out[arm].n_matched == len(mt)
