"""Property-based brute-force checks for seasonal_profile,
deviation_from_profile, rolling_distinct, and changepoint_binary_seg —
the twelfth independent-replay suite (rationale in
test_rank_stats_properties.py). Pinned semantics:

- seasonal_profile: population variance via the exact
  (n·Σx² − (Σx)²)/n² tree from decimal moments, per (key, hour slot).
- deviation_from_profile: z against the row's OWN (key, slot) baseline,
  NULL (not ±inf) under the min_std floor — exercised by constant-slot
  series.
- rolling_distinct: each (day, id) pair serves the window_buckets
  window-ends it can reach; windows ending on event-less days are
  dropped; n_id_buckets counts pairs, n_active distinct ids.
- changepoint_binary_seg: single-level argmax with the
  (gain desc, bucket asc) tiebreak; n = 1 yields an empty frame.

All rational (plus IEEE sqrt) → exact double equality.
"""

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


def _profile_model(rows):
    per = defaultdict(list)
    for k, t, v in rows:
        per[(k, (int(t) // 3600) % 24)].append(int(v))
    out = {}
    for (k, slot), vs in per.items():
        n = len(vs)
        sx, sxx = float(sum(vs)), float(sum(v * v for v in vs))
        nf = float(n)
        var = (nf * sxx - sx * sx) / (nf * nf)
        out[(k, slot)] = (n, rq(sx / nf),
                          rq(math.sqrt(max(var, 0.0))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nkeys=st.integers(1, 3), nhours=st.integers(1, 4))
def test_seasonal_profile_matches_bruteforce(spark, seed, n, nkeys,
                                             nhours):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nkeys),
             rng.randrange(nhours) * 3600 + rng.randrange(3600),
             rng.randrange(9) - 4) for _ in range(n)]
    df = (spark.createDataFrame(rows, "k long, t long, v long")
          .selectExpr("k", "timestamp_seconds(t) AS ts",
                      "CAST(v AS DOUBLE) AS v"))
    got = {(r["k"], r["slot"]): (r["n"], r["profile_mean"],
                                 r["profile_std"])
           for r in ts.seasonal_profile(df, "ts", "v", ["k"]).collect()}
    assert got == _profile_model(rows)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nkeys=st.integers(1, 3), pool=st.integers(1, 3))
def test_deviation_from_profile_matches_bruteforce(spark, seed, n,
                                                   nkeys, pool):
    import random
    rng = random.Random(seed)
    # pool=1 makes whole slots constant → the min_std NULL branch
    rows = [(i, rng.randrange(nkeys),
             rng.randrange(3) * 3600 + rng.randrange(3600),
             rng.randrange(pool)) for i in range(n)]
    df = (spark.createDataFrame(rows, "i long, k long, t long, v long")
          .selectExpr("i", "k", "timestamp_seconds(t) AS ts",
                      "CAST(v AS DOUBLE) AS v"))
    prof = _profile_model([(k, t, v) for _, k, t, v in rows])
    want = {}
    for i, k, t, v in rows:
        _, mean, std = prof[(k, (t // 3600) % 24)]
        want[i] = rq((float(v) - mean) / std) if std > 1e-9 else None
    got = {r["i"]: r["z_score"]
           for r in ts.deviation_from_profile(df, "ts", "v",
                                              ["k"]).collect()}
    assert got == want


def _rolling_model(rows, w=3, bucket=86400.0):
    du = {(int(t // bucket), u) for u, t in rows}
    days = {d for d, _ in du}
    out = {}
    for wday in days:
        pairs = [(d, u) for d, u in du if wday - w + 1 <= d <= wday]
        out[wday] = (len({u for _, u in pairs}), len(pairs))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       nusers=st.integers(1, 5), ndays=st.integers(1, 8))
def test_rolling_distinct_matches_bruteforce(spark, seed, n, nusers,
                                             ndays):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(nusers),
             float(rng.randrange(ndays) * 86400 + rng.randrange(86400)))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "user_id long, ts double")
    got = {r["window_end_day"]: (r["n_active"], r["n_id_buckets"])
           for r in ts.rolling_distinct(df, window_buckets=3).collect()}
    assert got == _rolling_model(rows)


def _binseg_model(rows, bucket=86400):
    ld = defaultdict(int)
    for t, v in rows:
        ld[math.floor(float(t) / float(bucket))] += int(v)
    bs = sorted(ld)
    n = len(bs)
    if n < 2:
        return None
    cum, cums = 0, {}
    for k, b in enumerate(bs, 1):
        cum += ld[b]
        cums[k] = cum
    s, nf = float(cum), float(n)

    def gain(k):
        sl = float(cums[k])
        sr = float(cum - cums[k])
        return sl * sl / float(k) + sr * sr / (nf - float(k)) \
            - s * s / nf

    k = max(range(1, n), key=lambda k: (gain(k), -k))
    sl, sr = float(cums[k]), float(cum - cums[k])
    # this operator publishes through the floor(x*1e6 + 0.5)/1e6 formula
    # (_floor6), NOT round(double, 6) — use the matching replica
    fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    return (bs[k - 1], n, fl6(gain(k)), fl6(sl / float(k)),
            fl6(sr / (nf - float(k))))


@SLOW
@given(seed=st.integers(0, 10 ** 6), ndays=st.integers(1, 10),
       pool=st.integers(1, 7))
def test_changepoint_binary_seg_matches_bruteforce(spark, seed, ndays,
                                                   pool):
    import random
    rng = random.Random(seed)
    rows = [(float(d * 86400 + rng.randrange(86400)),
             float(rng.randrange(pool) - 3))
            for d in range(ndays) for _ in range(rng.randint(1, 2))]
    df = spark.createDataFrame(rows, "ts double, value double")
    got = ts.changepoint_binary_seg(df).collect()
    want = _binseg_model(rows)
    if want is None:
        assert got == []
        return
    r = got[0]
    assert (r["split_bucket"], r["n_buckets"], r["gain"],
            r["mean_left"], r["mean_right"]) == want
