"""Property-based brute-force twins for the round-10c operators —
each Spark operator replayed against a plain-Python reference on
randomized small inputs (fixed seeds via hypothesis), so the
DataFrame formulation is checked against the textbook definition, not
against itself. Strategies stay small: a Spark job per example."""
import hashlib
import math
import random

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st
from pyspark.sql import Row

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as sto
from powerdatapipeline_spark.operators import timeseries as tso

SLOW = replay_settings(6)


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 40))
def test_pareto_frontier_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    pts = [(float(rng.randint(0, 8)), rng.randint(0, 8))
           for _ in range(n)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    got = {(r["x"], r["y"]): r["n_rows"]
           for r in rel.pareto_frontier_2d(df, "x", "y").collect()}
    distinct = set(pts)
    want = {}
    for (x, y) in distinct:
        dominated = any((a <= x and b <= y and (a < x or b < y))
                        for (a, b) in distinct)
        if not dominated:
            want[(x, y)] = sum(1 for p in pts if p == (x, y))
    assert got == want


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 30))
def test_quantiles_from_value_counts_matches_sorted_expansion(
        spark, seed, n):
    rng = random.Random(seed)
    counts = {}
    for _ in range(n):
        counts[float(rng.randint(0, 9))] = rng.randint(1, 4)
    per = spark.createDataFrame(
        [Row(__v=v, c=c) for v, c in counts.items()])
    got = sto.quantiles_from_value_counts(per).collect()[0]
    expanded = sorted(v for v, c in counts.items() for _ in range(c))
    m = len(expanded)
    assert got["n"] == m
    for q, col in [(0.5, "q_50"), (0.9, "q_90"), (0.99, "q_99")]:
        pos = math.floor(q * (m - 1) + 0.5) + 1
        assert got[col] == expanded[pos - 1]


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(2, 15),
       max_dist=st.integers(1, 3))
def test_fuzzy_dict_pairs_matches_bruteforce(spark, seed, n, max_dist):
    rng = random.Random(seed)
    heads = ["red", "rad", "blue", "cold", "old"]
    tails = ["bolt", "gear"]
    vals = [f"{rng.choice(heads)} {rng.choice(tails)}" for _ in range(n)]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got = {(r["value_a"], r["value_b"]): r["dist"]
           for r in dd.fuzzy_dict_pairs(df, "v", max_dist=max_dist,
                                        top_k=1000).collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    distinct = sorted(set(vals))
    want = {}
    for i, a in enumerate(distinct):
        for b in distinct[i + 1:]:
            if a.split(" ")[-1] != b.split(" ")[-1]:
                continue
            if abs(len(a) - len(b)) > max_dist:
                continue
            d = lev(a, b)
            if d <= max_dist:
                want[(a, b)] = d
    assert got == want


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 25),
       q=st.sampled_from([0.5, 0.9]))
def test_exceedance_report_matches_bruteforce(spark, seed, n, q):
    rng = random.Random(seed)
    vals = [round(rng.uniform(0, 20), 3) for _ in range(n)]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    got = sto.exceedance_report(df, "v", "g", q=q).collect()[0]
    s = sorted(round(v, 6) for v in vals)
    pos = math.floor(q * (n - 1) + 0.5) + 1
    thr = s[pos - 1]
    exceed = [v for v in s if v > thr]
    assert got["threshold"] == thr
    assert got["n_exceed"] == len(exceed)
    if exceed:
        want = sum(v - thr for v in exceed) / len(exceed)
        assert got["mean_excess"] is not None
        assert abs(got["mean_excess"] - want) < 1e-6
    else:
        assert got["mean_excess"] is None
    assert got["max_value"] == s[-1]


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(2, 30))
def test_class_balance_matches_md5_order(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, rng.choice(["a", "b"])) for i in range(n)]
    labels = {lb for _, lb in rows}
    df = spark.createDataFrame([Row(id=i, label=lb) for i, lb in rows])
    got = {}
    for r in rel.class_balance(df, "label", "id").collect():
        got.setdefault(r["label"], set()).add(r["id"])
    counts = {lb: sum(1 for _, x in rows if x == lb) for lb in labels}
    m = min(counts.values())
    for lb in labels:
        ids = [i for i, x in rows if x == lb]
        order = sorted(ids, key=lambda i: (
            hashlib.md5(f"balance{i}".encode()).hexdigest(), i))
        assert got[lb] == set(order[:m])


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(2, 20))
def test_ols_trend_matches_closed_form(spark, seed, n):
    rng = random.Random(seed)
    pts = [(float(i), round(rng.uniform(-5, 5), 3)) for i in range(n)]
    df = spark.createDataFrame([Row(g="a", x=x, y=y) for x, y in pts])
    got = sto.ols_trend(df, "x", "y", "g").collect()[0]
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    assert abs(got["slope"] - slope) < 1e-5
    assert abs(got["intercept"] - intercept) < 1e-5


@SLOW
@given(seed=st.integers(0, 10_000), n_sites=st.integers(1, 6),
       n_pts=st.integers(1, 8))
def test_grid_nearest_matches_bruteforce_within_ring(spark, seed,
                                                     n_sites, n_pts):
    rng = random.Random(seed)
    sites = [(s + 1, rng.uniform(-50, 50), rng.uniform(-170, 170))
             for s in range(n_sites)]
    pts = [(p + 1, rng.uniform(-50, 50), rng.uniform(-170, 170))
           for p in range(n_pts)]
    sdf = spark.createDataFrame(
        [Row(sid=i, lat=la, lon=lo) for i, la, lo in sites])
    pdf = spark.createDataFrame(
        [Row(pid=i, lat=la, lon=lo) for i, la, lo in pts])
    got = {r["pid"]: (r["sid"], r["dist_km"])
           for r in rel.grid_nearest_join(pdf, sdf, "pid", "sid")
           .collect()}

    def hav(la1, lo1, la2, lo2):
        p1, p2 = math.radians(la1), math.radians(la2)
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        h = (math.sin(dla) ** 2
             + math.cos(p1) * math.cos(p2) * math.sin(dlo) ** 2)
        return 2 * 6371.0 * math.asin(min(1.0, math.sqrt(h)))

    def cells(la, lo):
        return math.floor(lo / 10.0), math.floor(la / 10.0)

    for pid, pla, plo in pts:
        cx, cy = cells(pla, plo)
        cand = []
        for sid, sla, slo in sites:
            sx, sy = cells(sla, slo)
            # wrapped longitudinal cell distance: adjacent iff 0, 1 or
            # 35 (mod 36)
            dx = (sx - cx) % 36
            if dx in (0, 1, 35) and abs(sy - cy) <= 1:
                d6 = math.floor(hav(pla, plo, sla, slo) * 1e6
                                + 0.5) / 1e6
                cand.append((d6, sid))
        if not cand:
            assert pid not in got
        else:
            d6, sid = min(cand)
            assert got[pid] == (sid, d6) or abs(got[pid][1] - d6) < 1e-5


@SLOW
@given(seed=st.integers(0, 10_000), n_edges=st.integers(1, 25))
def test_hits_matches_bruteforce_two_rounds(spark, seed, n_edges):
    rng = random.Random(seed)
    edges = {(f"u{rng.randint(0, 5)}", f"p{rng.randint(0, 5)}")
             for _ in range(n_edges)}
    from powerdatapipeline_spark.operators import graph as gr
    df = spark.createDataFrame(
        [Row(src=u, dst=v) for u, v in edges])
    got = {r["node"]: r["authority_int"]
           for r in gr.hits_scores(df, rounds=2, top_k=1000).collect()}
    a1 = {}
    for u, v in edges:
        a1[v] = a1.get(v, 0) + 1
    h1 = {}
    for u, v in edges:
        h1[u] = h1.get(u, 0) + a1[v]
    a2 = {}
    for u, v in edges:
        a2[v] = a2.get(v, 0) + h1[u]
    assert got == a2


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(3, 25))
def test_burstiness_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    times = sorted(round(rng.uniform(0, 1000), 3) for _ in range(n))
    rows = [Row(user_id=1, ts=t, event_type="X", event_id=i)
            for i, t in enumerate(times)]
    got = tso.burstiness_report(
        spark.createDataFrame(rows)).collect()[0]
    gaps = [round(b - a, 6) for a, b in zip(times, times[1:])]
    mu = sum(gaps) / len(gaps)
    var = sum(g * g for g in gaps) / len(gaps) - mu * mu
    sd = math.sqrt(max(var, 0.0))
    assert got["n_gaps"] == len(gaps)
    assert abs(got["mean_gap_s"] - mu) < 1e-5
    if mu > 0:
        assert abs(got["cv"] - sd / mu) < 1e-4
    if sd + mu > 0:
        assert abs(got["burstiness"] - (sd - mu) / (sd + mu)) < 1e-4


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 20))
def test_token_coverage_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    words = ["a", "b", "c", "d", "e"]
    docs = [" ".join(rng.choice(words)
                     for _ in range(rng.randint(1, 6)))
            for _ in range(n)]
    from powerdatapipeline_spark.operators import text as tx
    df = spark.createDataFrame([Row(text=d) for d in docs])
    got = {r["k"]: (r["n_terms"], r["covered_tokens"])
           for r in tx.token_coverage_curve(df).collect()}
    counts = {}
    for d in docs:
        for w in d.split():
            counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in (1, 2, 5, 10, 20):
        top = ranked[:k]
        assert got[k] == (len(top), sum(c for _, c in top))


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 30))
def test_abc_classes_partition_and_order(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, round(rng.uniform(1, 100), 2)) for i in range(n)]
    df = spark.createDataFrame([Row(k=k, amt=a) for k, a in rows])
    out = rel.abc_classification(df, "k", "amt").collect()
    # classes partition all entities; shares sum to ~1; A-head shares
    # are cumulative-ordered
    assert sum(r["n_entities"] for r in out) == len({k for k, _ in rows})
    assert abs(sum(r["revenue_share"] for r in out) - 1.0) < 1e-4
    got = {r["abc_class"]: r for r in out}
    if "A" in got and "C" in got:
        # every A revenue-per-entity >= every C revenue-per-entity
        a_min = got["A"]["revenue"] / got["A"]["n_entities"]
        c_max = got["C"]["revenue"] / got["C"]["n_entities"]
        assert a_min >= c_max - 1e-6


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(2, 25))
def test_state_durations_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = [(rng.randint(1, 3), round(rng.uniform(0, 100), 3),
             rng.choice(["A", "B"]), i) for i, _ in enumerate(range(n))]
    df = spark.createDataFrame(
        [Row(user_id=u, ts=t, event_type=s, event_id=e)
         for u, t, s, e in rows])
    got = {r["state"]: (r["n_intervals"], r["total_seconds"])
           for r in tso.state_durations(df).collect()}
    want = {}
    users = {}
    for u, t, s, e in rows:
        users.setdefault(u, []).append((t, e, s))
    for u, evs in users.items():
        evs.sort()
        for (t, e, s), (t2, e2, s2) in zip(evs, evs[1:]):
            d = round(t2 - t, 6)
            k, tot = want.get(s, (0, 0.0))
            want[s] = (k + 1, tot + d)
    assert set(got) == set(want)
    for s, (k, tot) in want.items():
        assert got[s][0] == k
        assert abs(got[s][1] - tot) < 1e-5


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 30))
def test_lorenz_deciles_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, round(rng.uniform(0.5, 50), 2)) for i in range(n)]
    df = spark.createDataFrame([Row(e=e, amt=a) for e, a in rows])
    got = {r["decile"]: (r["cum_entities"], r["cum_share"])
           for r in sto.lorenz_deciles(df, "e", "amt").collect()}
    spends = sorted(round(a, 6) for _, a in rows)
    tot = sum(spends)
    for d in range(1, 11):
        pos = math.floor((d * n + 9) / 10)
        # first distinct value whose cumcount >= pos: cumulative stats
        # include ALL entities at that value
        cume, cums = 0, 0.0
        from itertools import groupby
        for v, grp in groupby(spends):
            k = len(list(grp))
            cume += k
            cums += v * k
            if cume >= pos:
                break
        assert got[d][0] == cume
        assert abs(got[d][1] - cums / tot) < 1e-5


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 30),
       lag=st.sampled_from([2, 3]))
def test_forecast_backtest_matches_bruteforce(spark, seed, n, lag):
    rng = random.Random(seed)
    buckets = sorted(rng.sample(range(0, 12), min(n, 12)))
    loads = {b: round(rng.uniform(1, 50), 3) for b in buckets}
    df = spark.createDataFrame(
        [Row(event_type="a", ts=b * 3600.0 + 1.0, value=v)
         for b, v in loads.items()])
    got = tso.forecast_backtest_naive(df, lag_buckets=lag).collect()
    pairs = [(loads[b], loads[b - lag]) for b in loads if b - lag in loads]
    if not pairs:
        assert got == []
        return
    r = got[0]
    errs = [y - yh for y, yh in pairs]
    assert r["n_scored"] == len(pairs)
    assert abs(r["mae"] - sum(abs(e) for e in errs) / len(errs)) < 1e-5
    assert abs(r["bias"] - sum(errs) / len(errs)) < 1e-5
    rmse = math.sqrt(sum(e * e for e in errs) / len(errs))
    assert abs(r["rmse"] - rmse) < 1e-5


@SLOW
@given(seed=st.integers(0, 10_000), n=st.integers(1, 40))
def test_load_coincidence_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    rows = [(rng.choice(["a", "b"]), float(rng.randint(0, 3)) * 3600.0
             + rng.uniform(0, 3599), round(rng.uniform(1, 10), 3))
            for _ in range(n)]
    df = spark.createDataFrame(
        [Row(event_type=g, ts=t, value=v) for g, t, v in rows])
    got = {r["event_type"]: r for r in
           tso.load_coincidence(df).collect()}
    hourly = {}
    for g, t, v in rows:
        b = math.floor(t / 3600.0)
        hourly[(g, b)] = hourly.get((g, b), 0.0) + v
    groups = {g for g, _, _ in rows}
    sys_hour = {}
    for (g, b), ld in hourly.items():
        sys_hour[b] = sys_hour.get(b, 0.0) + ld
    sum_peaks = sum(max(ld for (g2, b), ld in hourly.items()
                        if g2 == g) for g in groups)
    sys_peak = max(sys_hour.values())
    for g in groups:
        loads = {b: ld for (g2, b), ld in hourly.items() if g2 == g}
        peak = max(loads.values())
        assert abs(got[g]["peak_load"] - peak) < 1e-6
        lf = (sum(loads.values()) / len(loads)) / peak
        assert abs(got[g]["load_factor"] - lf) < 1e-5
        assert abs(got[g]["coincidence_factor"]
                   - sys_peak / sum_peaks) < 1e-5
