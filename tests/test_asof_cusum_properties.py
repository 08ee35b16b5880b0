"""Property-based brute-force checks for asof_join, asof_join_nearest,
cusum_changepoints, and interval_overlap_join — the eighth
independent-replay suite (rationale in test_rank_stats_properties.py).
The pinned semantics:

- asof_join: at-or-before match with right-before-left at equal
  timestamps, and the WHOLE-ROW struct carry — a matched right row
  whose value field is NULL must yield NULL, never resurrect an older
  row's non-null field.
- asof_join_nearest: nearest within tolerance, backward preferred on
  equal gaps, same-ts rights captured backward at gap 0, direction and
  gap columns, NULL survival outside tolerance.
- cusum_changepoints: decimal-exact (mu, sigma) per series, 6-rounded
  standardized terms folded in decimal, the sqrt(i) envelope on the
  ROUNDED cusum, and sigma = 0 series excluded entirely.
- interval_overlap_join: every closed-interval overlapping pair emitted
  EXACTLY ONCE by the first-shared-bucket guard (the replay enumerates
  all pairs literally), with overlap_seconds = min(ends) − max(starts).

All rational (plus IEEE sqrt) → exact equality.
"""

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)

SIX = Decimal("0.000001")
TEN = Decimal("0.0000000001")


def rq(x, q=SIX):
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# ------------------------------------------------------------------- asof

def _asof_model(lefts, rights):
    by_k = defaultdict(dict)
    for k, rts, rv in rights:
        by_k[k][float(rts)] = rv          # unique per (key, ts)
    out = []
    for i, (k, t) in enumerate(lefts):
        cand = [rts for rts in by_k.get(k, {}) if rts <= float(t)]
        out.append((i, max(cand) if cand else None,
                    by_k[k][max(cand)] if cand else None))
    return sorted(out)


@SLOW
@given(seed=st.integers(0, 10 ** 6), nl=st.integers(1, 15),
       nr=st.integers(0, 12))
def test_asof_join_matches_bruteforce(spark, seed, nl, nr):
    import random
    rng = random.Random(seed)
    lefts = [(rng.randrange(2), float(rng.randrange(12)))
             for _ in range(nl)]
    rights_d = {}
    for _ in range(nr):
        k, rts = rng.randrange(2), float(rng.randrange(12))
        # NULL value fields pin the whole-row struct carry: an older
        # non-null must NOT leak through a matched NULL-field row
        rights_d[(k, rts)] = (None if rng.random() < 0.3
                              else float(rng.randrange(9)))
    rights = [(k, rts, rv) for (k, rts), rv in rights_d.items()]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)],
        "lid long, k long, ts double")
    rdf = spark.createDataFrame(rights or [(0, -99.0, 0.0)],
                                "k long, ts double, v double")
    if not rights:
        rdf = rdf.where(F.lit(False))
    got = sorted((r["lid"],
                  None if r["asof_rts"] is None else r["asof_rts"],
                  r["asof_v"])
                 for r in ts.asof_join(
                     ldf, rdf.withColumn("rts", F.col("ts")),
                     ["k"], "ts", ["rts", "v"]).collect())
    want = _asof_model(lefts, rights)
    assert got == want


# ----------------------------------------------------------- asof nearest

def _nearest_model(lefts, rights, tol):
    by_k = defaultdict(dict)
    for k, rts, rv in rights:
        by_k[k][float(rts)] = rv
    out = []
    for i, (k, t) in enumerate(lefts):
        t = float(t)
        rs = by_k.get(k, {})
        bcand = [rts for rts in rs if rts <= t]
        fcand = [rts for rts in rs if rts > t]
        b = max(bcand) if bcand else None
        f = min(fcand) if fcand else None
        db = t - b if b is not None else None
        df_ = f - t if f is not None else None
        bok = b is not None and db <= tol
        fok = f is not None and df_ <= tol
        use_b = bok and (not fok or db <= df_)
        use_f = fok and not use_b
        if use_b:
            out.append((i, "backward", db, b, rs[b]))
        elif use_f:
            out.append((i, "forward", df_, f, rs[f]))
        else:
            out.append((i, None, None, None, None))
    return sorted(out)


@SLOW
@given(seed=st.integers(0, 10 ** 6), nl=st.integers(1, 15),
       nr=st.integers(0, 12), tol=st.sampled_from([1.0, 2.0, 4.0]))
def test_asof_nearest_matches_bruteforce(spark, seed, nl, nr, tol):
    import random
    rng = random.Random(seed)
    lefts = [(rng.randrange(2), float(rng.randrange(12)))
             for _ in range(nl)]
    rights_d = {(rng.randrange(2), float(rng.randrange(12))):
                float(rng.randrange(9)) for _ in range(nr)}
    rights = [(k, rts, rv) for (k, rts), rv in rights_d.items()]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)],
        "lid long, k long, ts double")
    rdf = spark.createDataFrame(rights or [(0, -99.0, 0.0)],
                                "k long, ts double, v double")
    if not rights:
        rdf = rdf.where(F.lit(False))
    got = sorted((r["lid"], r["near_direction"], r["near_gap_s"],
                  r["near_ts"], r["near_v"])
                 for r in ts.asof_join_nearest(
                     ldf, rdf, ["k"], "ts", ["v"], tol).collect())
    assert got == _nearest_model(lefts, rights, tol)


# ------------------------------------------------------------------ CUSUM

def _cusum_model(rows, thr=5.0):
    per = defaultdict(list)
    for k, t, i, v in rows:
        per[k].append((float(t), i, float(v)))
    out = {}
    for k, evs in per.items():
        n = len(evs)
        mu = float(sum(int(v) for _, _, v in evs)) / n
        ex2 = float(sum(int(v) * int(v) for _, _, v in evs)) / n
        sigma = math.sqrt(max(ex2 - mu * mu, 0.0))
        if not sigma > 0:
            continue
        cum = Decimal(0)
        for pos, (t, i, v) in enumerate(sorted(evs,
                                               key=lambda e: (e[0], e[1])),
                                        1):
            term = rq((v - mu) / sigma)
            cum += Decimal(repr(term)).quantize(TEN,
                                                rounding=ROUND_HALF_UP)
            c6 = rq(float(cum))
            out[(k, i)] = (c6, abs(c6) > thr * math.sqrt(float(pos)))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       thr=st.sampled_from([0.5, 1.0, 5.0]))
def test_cusum_matches_bruteforce(spark, seed, n, thr):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(3), float(rng.randrange(10)), i,
             float(rng.randrange(7) - 3)) for i, _ in enumerate(range(n))]
    df = spark.createDataFrame(rows, "k long, ts double, i long, v double")
    got = {(r["k"], r["i"]): (r["cusum"], r["is_shift"])
           for r in ts.cusum_changepoints(
               df, "ts", "v", ["k"], threshold_sigmas=thr,
               order_cols=["i"]).collect()}
    assert got == _cusum_model(rows, thr)


# -------------------------------------------------------- interval overlap

def _overlap_model(la, ra):
    out = []
    for i, (s1, e1) in enumerate(la):
        for j, (s2, e2) in enumerate(ra):
            if s1 <= e2 and s2 <= e1:
                out.append((i, j, min(e1, e2) - max(s1, s2)))
    return sorted(out)


@SLOW
@given(seed=st.integers(0, 10 ** 6), nl=st.integers(1, 12),
       nr=st.integers(1, 12), bucket=st.sampled_from([2.0, 5.0, 9.0]))
def test_interval_overlap_matches_all_pairs(spark, seed, nl, nr, bucket):
    import random
    rng = random.Random(seed)

    def mk(n):
        out = []
        for _ in range(n):
            s = float(rng.randrange(30))
            out.append((s, s + float(rng.randrange(12))))
        return out

    la, ra = mk(nl), mk(nr)
    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(la)],
        "ida long, start double, end double")
    rdf = spark.createDataFrame(
        [(j, s, e) for j, (s, e) in enumerate(ra)],
        "idb long, start double, end double")
    got = sorted((r["ida_a"], r["idb_b"], r["overlap_seconds"])
                 for r in ts.interval_overlap_join(
                     ldf, rdf, bucket_seconds=bucket).collect())
    assert got == _overlap_model(la, ra)
