"""Property-based brute-force checks for the power-domain operators —
energy_integral (trapezoid + left), peak_analysis, load_duration_curve,
gap_report, interpolation_join. Seventh independent-replay suite
(rationale in test_rank_stats_properties.py). The semantics worth
pinning beyond the hand cases:

- energy_integral: (ts, value) segment ordering under duplicate
  timestamps, per-segment 6-rounding BEFORE the decimal fold, zero-span
  singleton series (integral 0.0, TWAP NULL).
- peak_analysis: earliest-timestamp-at-max tie-break via min(−v, ts).
- load_duration_curve: the exceedance duality — load at duration d is
  the exact interpolated (1−d) quantile.
- gap_report: missing ticks = round(gap/expected) − 1 per gap, the
  completeness denominator round(span/expected) + 1, singleton series
  completeness 1.0.
- interpolation_join: right-at-equal-ts wins via the backward carry,
  max-value/min-value bracket tie-breaks between same-ts right rows,
  endpoint clamping, NULL for keys with no right rows.

All five are rational end-to-end → exact double equality (Spark's
round replicated by shortest-repr HALF_UP quantization).
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
ONE = Decimal("1")


def rq(x, q=SIX):
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# ---------------------------------------------------------- energy_integral

def _energy_model(rows, method):
    per = defaultdict(list)
    for k, t, v in rows:
        per[k].append((float(t), float(v)))
    out = {}
    for k, evs in per.items():
        evs.sort()                        # (ts, value) order incl. ties
        segsum = Decimal(0)
        any_seg = False
        for (t0, v0), (t1, v1) in zip(evs, evs[1:]):
            dt = t1 - t0
            seg = (v0 + v1) / 2.0 * dt if method == "trapezoid" else v0 * dt
            segsum += Decimal(repr(rq(seg))).quantize(
                Decimal("0.0000000001"), rounding=ROUND_HALF_UP)
            any_seg = True
        integral = float(segsum) if any_seg else 0.0
        span = evs[-1][0] - evs[0][0]
        twap = rq(integral / span) if span > 0 else None
        out[k] = (len(evs), rq(integral), rq(span), twap)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       method=st.sampled_from(["trapezoid", "left"]))
def test_energy_integral_matches_bruteforce(spark, seed, n, method):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(3), float(rng.randrange(10)),
             float(rng.randrange(9) - 4)) for _ in range(n)]
    df = spark.createDataFrame(rows, "k long, ts double, v double")
    got = {r["k"]: (r["n_readings"], r["integral"], r["span_seconds"],
                    r["time_weighted_avg"])
           for r in ts.energy_integral(df, "ts", "v", ["k"],
                                       method=method).collect()}
    assert got == _energy_model(rows, method)


# ------------------------------------------------------------ peak_analysis

def _peak_model(rows, bucket=86_400):
    per = defaultdict(list)
    for k, t, v in rows:
        per[(k, math.floor(float(t) / float(bucket)))].append(
            (float(t), float(v)))
    out = {}
    for (k, b), evs in per.items():
        peak = max(v for _, v in evs)
        mean = math.fsum(v for _, v in evs) / len(evs)
        peak_ts = min(t for t, v in evs if v == peak)
        out[(k, b)] = (len(evs), rq(peak), rq(mean),
                       rq(peak / mean) if mean != 0 else None, peak_ts)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30))
def test_peak_analysis_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(2),
             float(rng.randrange(3) * 86_400 + rng.randrange(86_400)),
             float(rng.randrange(9) - 4)) for _ in range(n)]
    df = spark.createDataFrame(rows, "k long, ts double, v double")
    got = {(r["k"], r["bucket"]): (r["n_readings"], r["peak"],
                                   r["mean_load"], r["peak_to_avg"],
                                   r["peak_ts_seconds"])
           for r in ts.peak_analysis(df, "ts", "v", ["k"]).collect()}
    assert got == _peak_model(rows)


# ------------------------------------------------------ load_duration_curve

def _quantile(sorted_vals, q):
    """Spark percentile / DuckDB quantile_cont: linear interpolation at
    0-based position q·(n−1)."""
    p = q * (len(sorted_vals) - 1)
    lo = math.floor(p)
    hi = min(lo + 1, len(sorted_vals) - 1)
    return sorted_vals[lo] + (p - lo) * (sorted_vals[hi] - sorted_vals[lo])


def _ldc_model(vals, points=20):
    vs = sorted(float(v) for v in vals)
    out = []
    for i in range(points + 1):
        d = i / points
        out.append((round(d, 6), rq(_quantile(vs, 1.0 - d))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       points=st.integers(1, 8))
def test_load_duration_curve_matches_bruteforce(spark, seed, n, points):
    import random
    rng = random.Random(seed)
    vals = [float(rng.randrange(12)) for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [(r["duration_frac"], r["load"])
           for r in ts.load_duration_curve(df, "v",
                                           points=points).collect()]
    want = _ldc_model(vals, points)
    assert sorted(got) == sorted(want)
    assert all(r == n for r in
               [x["n_readings"] for x in
                ts.load_duration_curve(df, "v", points=points).collect()])


# ---------------------------------------------------------------- gap_report

def _gap_model(rows, expected, eps=1e-6):
    per = defaultdict(list)
    for k, t in rows:
        per[k].append(float(t))
    out = {}
    for k, tsl in per.items():
        tsl.sort()
        ivs = [b - a for a, b in zip(tsl, tsl[1:])]
        gaps = [iv for iv in ivs if iv > expected + eps]
        missing = sum(int(rq(iv / expected, ONE)) - 1 for iv in gaps)
        span = tsl[-1] - tsl[0]
        comp = (rq(len(tsl) / (rq(span / expected, ONE) + 1))
                if span > 0 else 1.0)
        out[k] = (len(tsl), len(gaps), missing,
                  rq(max(ivs)) if ivs else None, comp)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 30),
       expected=st.sampled_from([1.0, 2.0, 5.0]))
def test_gap_report_matches_bruteforce(spark, seed, n, expected):
    import random
    rng = random.Random(seed)
    rows = [(rng.randrange(3), float(rng.randrange(40)))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "k long, ts double")
    got = {r["k"]: (r["n_readings"], r["n_gaps"], r["missing_ticks"],
                    r["max_gap_seconds"], r["completeness"])
           for r in ts.gap_report(df, "ts", ["k"], expected).collect()}
    assert got == _gap_model(rows, expected)


# --------------------------------------------------------- interpolation_join

def _ij_model(lefts, rights):
    by_k = defaultdict(list)
    for k, rts, rv in rights:
        by_k[k].append((float(rts), float(rv)))
    out = []
    for k, t in lefts:
        t = float(t)
        rs = by_k.get(k, [])
        before = [(rts, rv) for rts, rv in rs if rts <= t]
        after = [(rts, rv) for rts, rv in rs if rts > t]
        # backward carry: last in (ts, v) order → max v among tied ts
        b = max(before, key=lambda p: (p[0], p[1])) if before else None
        # forward carry: first in (ts, v) order → min v among tied ts
        a = min(after, key=lambda p: (p[0], p[1])) if after else None
        if b is None and a is None:
            out.append((k, t, None))
        elif b is None:
            out.append((k, t, rq(a[1])))
        elif a is None:
            out.append((k, t, rq(b[1])))
        else:
            tb, vb = b
            ta, va = a
            out.append((k, t, rq(vb + (va - vb) * (t - tb) / (ta - tb))))
    return sorted(out, key=lambda r: (r[0], r[1]))


@SLOW
@given(seed=st.integers(0, 10 ** 6), nl=st.integers(1, 15),
       nr=st.integers(0, 12))
def test_interpolation_join_matches_bruteforce(spark, seed, nl, nr):
    import random
    rng = random.Random(seed)
    lefts = [(rng.randrange(2), float(rng.randrange(12)))
             for _ in range(nl)]
    rights = [(rng.randrange(2), float(rng.randrange(12)),
               float(rng.randrange(9) - 4)) for _ in range(nr)]
    ldf = spark.createDataFrame(lefts, "k long, ts double")
    rdf = spark.createDataFrame(rights, "k long, ts double, v double")
    got = sorted(((r["k"], r["ts"], r["interp_value"])
                  for r in ts.interpolation_join(
                      ldf, rdf, ["k"], "ts", "v").collect()),
                 key=lambda r: (r[0], r[1]))
    assert got == _ij_model(lefts, rights)
