"""Property-based checks (hypothesis) for the time-series operators —
the identities SURVEY.md §5 proposes: window-count law, resample
composition, interpolation boundedness, split partitioning.

Strategies are kept small (Spark job per example is expensive): hypothesis
drives the SHAPE diversity (cadences, sizes, gaps), not bulk volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import timeseries as ts

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _series(spark, n, step, start=0):
    return spark.createDataFrame(
        [Row(s=float(start + i * step), v=float(i)) for i in range(n)])


@SLOW
@given(n=st.integers(2, 30), w=st.integers(1, 8))
def test_window_count_law(spark, n, w):
    """#windows == max(n - w + 1, 0) for stride-1 drop-remainder windows."""
    out = ts.sliding_windows(_series(spark, n, 1), "s", w, ["v"])
    assert out.count() == max(n - w + 1, 0)


@SLOW
@given(n=st.integers(2, 20), step=st.sampled_from([60, 300, 900, 1800]),
       factor=st.sampled_from([2, 3, 5]))
def test_down_then_up_preserves_grid_rows(spark, n, step, factor):
    """Downsampling a clean grid by k·step keeps exactly the aligned rows,
    and every surviving timestamp is still grid-aligned."""
    df = _series(spark, n, step)
    down = ts.downsample_modulo(df, "s", step * factor)
    rows = down.collect()
    assert all(r.s % (step * factor) == 0 for r in rows)
    expected = sum(1 for i in range(n) if (i * step) % (step * factor) == 0)
    assert len(rows) == expected


@SLOW
@given(n=st.integers(1, 10), interval=st.sampled_from([60, 300]),
       factor=st.sampled_from([2, 3]))
def test_upsample_tick_count_and_alignment(spark, n, interval, factor):
    """Upsample emits span/interval ticks per input row, all grid-aligned,
    all carrying the source row's values (repeat fill)."""
    span = interval * factor
    df = _series(spark, n, span)
    up = ts.upsample_repeat(df, "s", interval, span)
    rows = up.collect()
    assert len(rows) == n * factor
    assert all(r.s % interval == 0 for r in rows)
    # repeat fill: v constant within each source row's tick group
    by_v = {}
    for r in rows:
        by_v.setdefault(r.v, []).append(r.s)
    assert all(len(v) == factor for v in by_v.values())


@SLOW
@given(vals=st.lists(st.one_of(st.none(), st.floats(-100, 100)),
                     min_size=2, max_size=12))
def test_interpolation_bounded_by_neighbors(spark, vals):
    """Linear interpolation never exits [min, max] of the non-null values,
    and leaves non-null inputs untouched."""
    df = spark.createDataFrame(
        [Row(s=float(i), v=vals[i]) for i in range(len(vals))],
        schema="s double, v double")
    out = {r.s: r.v for r in ts.interpolate_linear(df, "s", ["v"]).collect()}
    present = [v for v in vals if v is not None]
    for i, v in enumerate(vals):
        if v is not None:
            assert out[float(i)] == pytest.approx(v)
        elif present:
            assert min(present) - 1e-9 <= out[float(i)] <= max(present) + 1e-9
        else:
            assert out[float(i)] is None


@SLOW
@given(vals=st.lists(st.one_of(st.none(), st.floats(-100, 100)),
                     min_size=2, max_size=24),
       bucket=st.sampled_from([2, 3, 5, 7]),
       mode=st.sampled_from(["ffill", "bfill", "interp"]))
def test_bucketed_fill_equals_global_property(spark, vals, bucket, mode):
    """For ANY null pattern and ANY bucket size, the bucketed-overlap fills
    must reproduce the unpartitioned-window result exactly — including
    patterns hypothesis finds that hand fixtures miss (all-null prefixes,
    alternating nulls, bucket-boundary runs)."""
    df = spark.createDataFrame(
        [Row(s=float(i), v=vals[i]) for i in range(len(vals))],
        schema="s double, v double")
    pairs = {
        "ffill": (ts.ffill, ts.ffill_bucketed),
        "bfill": (ts.bfill, ts.bfill_bucketed),
        "interp": (ts.interpolate_linear, ts.interpolate_linear_bucketed),
    }
    glob_fn, buck_fn = pairs[mode]
    glob = {r.s: r.v for r in glob_fn(df, "s", ["v"]).collect()}
    buck = {r.s: r.v for r in buck_fn(df, "s", ["v"], bucket).collect()}
    assert set(glob) == set(buck)
    for s in glob:
        if glob[s] is None:
            assert buck[s] is None
        else:
            assert buck[s] == pytest.approx(glob[s], nan_ok=True)


@SLOW
@given(n=st.integers(5, 40),
       fracs=st.sampled_from([(0.8, 0.1), (0.5, 0.25), (0.9, 0.05)]))
def test_prefix_split_partitions_exactly(spark, n, fracs):
    """The three splits are disjoint, exhaustive, and time-ordered."""
    df = _series(spark, n, 1)
    train, test, ev = ts.prefix_split(df, "s", *fracs)
    a, b, c = ([r.s for r in d.collect()] for d in (train, test, ev))
    assert sorted(a + b + c) == [float(i) for i in range(n)]
    assert not (set(a) & set(b) or set(b) & set(c) or set(a) & set(c))
    if a and b:
        assert max(a) < min(b)
    if b and c:
        assert max(b) < min(c)


# round-7: the gram builders were rewritten from slice-in-lambda (O(L²))
# to the shifted-zip_with chain — pin them against a direct Python
# reference over arbitrary text, including whitespace runs, unicode, and
# short/empty edges, so the linear-time construction can never drift
# from n-gram semantics.

def _py_tokens(s):
    return [t for t in s.lower().replace("\x0b", " ").split() if t]


@SLOW
@given(s=st.text(alphabet=st.sampled_from(list("ab d\t\n.é")), max_size=40),
       n=st.integers(1, 4))
def test_word_ngrams_match_python_reference(spark, s, n):
    from powerdatapipeline_spark.operators import text as tx

    got = spark.createDataFrame([Row(t=s)]) \
        .select(tx.word_ngrams("t", n).alias("g")).first().g
    toks = _py_tokens(s)
    want = list(dict.fromkeys(
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)))
    assert sorted(got) == sorted(want)


@SLOW
@given(s=st.text(alphabet=st.sampled_from(list("abcd é.")), max_size=30),
       n=st.integers(1, 5))
def test_char_ngrams_match_python_reference(spark, s, n):
    from powerdatapipeline_spark.operators import text as tx

    got = spark.createDataFrame([Row(t=s)]) \
        .select(tx.char_ngrams("t", n).alias("g")).first().g
    c = s.lower()
    want = list(dict.fromkeys(
        c[i:i + n] for i in range(len(c) - n + 1)))
    assert sorted(got) == sorted(want)


@SLOW
@given(s=st.text(alphabet=st.sampled_from(list("ab c\tx")), max_size=30))
def test_rolling_fingerprint_matches_python_reference(spark, s):
    from powerdatapipeline_spark.operators import text as tx

    got = spark.createDataFrame([Row(t=s)]) \
        .select(tx.rolling_fingerprint("t").alias("fp")).first().fp
    import re
    norm = re.sub(r"[ \t\n\r\f\x0B]+", " ", s.lower()).strip()
    fp = 0
    for ch in norm:
        fp = (fp * 131 + ord(ch)) % 1_000_000_007
    assert got == fp


# ------------------------------------------------- round-7b operator laws

@SLOW
@given(s=st.text(alphabet=st.sampled_from(list("abc d\t.é中")), max_size=40))
def test_char_entropy_matches_python_reference(spark, s):
    """H from the zero-shuffle HOF pipeline == the plain Python
    counter-based entropy (same 6-rounded ln terms, same ordered fold)."""
    import math
    from collections import Counter
    from powerdatapipeline_spark.operators import text as tx

    out = tx.char_entropy(spark.createDataFrame(
        [Row(doc_id=1, text=s)])).collect()[0]
    n = len(s)
    cnt = Counter(s)
    if n == 0:
        want = 0.0
    else:
        acc = 0.0
        for ch in sorted(cnt):
            c = cnt[ch]
            acc += c * round(math.log(c / n), 6)
        want = round(-acc / n, 6)
    assert out["n_chars"] == n
    assert out["n_distinct_chars"] == len(cnt)
    assert out["char_entropy"] == pytest.approx(want, abs=1e-9)


@SLOW
@given(vals=st.lists(st.floats(-100, 100), min_size=1, max_size=25),
       alpha=st.sampled_from([0.2, 0.5, 0.9]),
       taps=st.sampled_from([1, 3, 8]))
def test_ewma_fir_matches_python_reference(spark, vals, alpha, taps):
    df = spark.createDataFrame(
        [Row(u="u", t=i, x=float(v)) for i, v in enumerate(vals)])
    got = {r["t"]: r["ewma"] for r in
           ts.ewma_fir(df, ["t"], "x", ["u"], alpha=alpha, taps=taps)
           .collect()}
    for i in range(len(vals)):
        num = den = 0.0
        for k in range(min(taps, i + 1)):
            w = alpha * (1 - alpha) ** k
            num += w * vals[i - k]
            den += w
        assert got[i] == pytest.approx(round(num / den, 6), abs=1e-6)


@SLOW
@given(n=st.integers(1, 60), nb=st.sampled_from([1, 3, 16]),
       nkeys=st.integers(1, 3))
def test_bucketed_cumsum_matches_python_reference(spark, n, nb, nkeys):
    import random
    from powerdatapipeline_spark.operators import text as tx

    rng = random.Random(n * 31 + nb)
    rows = [(f"k{rng.randrange(nkeys)}", i, rng.randrange(1, 9))
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {(r["g"], r["o"]): int(r["cum"]) for r in
           tx.cumulative_sum_bucketed(df, ["g"], "o", "v",
                                      n_buckets=nb).collect()}
    acc: dict = {}
    want = {}
    for g, o, v in sorted(rows, key=lambda r: r[1]):
        acc[g] = acc.get(g, 0) + v
        want[(g, o)] = acc[g]
    assert got == want


@SLOW
@given(n=st.integers(1, 40), k=st.integers(1, 10))
def test_weighted_sample_matches_python_reference(spark, n, k):
    """The sampled id set == the top-k of the SAME md5-uniform scoring
    computed in plain Python (full determinism, no RNG)."""
    import hashlib
    from powerdatapipeline_spark.operators import relational as rel

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(n)]
    df = spark.createDataFrame(rows, "key long, w double")
    got = [r["key"] for r in
           rel.weighted_hash_sample(df, "key", "w", k).collect()]

    def score(i, w):
        h = hashlib.md5(str(i).encode()).hexdigest()[:15]
        u = (int(h, 16) + 1) / float(1 << 60)
        return u ** (1.0 / w)

    want = [i for i, w in sorted(rows, key=lambda r:
                                 (-score(*r), r[0]))][:k]
    assert got == want


@SLOW
@given(n=st.integers(1, 30), p=st.sampled_from([0.25, 0.5, 0.9]))
def test_weighted_percentile_matches_python_reference(spark, n, p):
    """The crossing value == the plain-Python weighted-percentile scan
    over the same (value, weight) pairs."""
    import random
    from powerdatapipeline_spark.operators import stats as st2

    rng = random.Random(n * 13 + int(p * 100))
    rows = [("g", float(rng.randrange(0, 50)),
             float(rng.randrange(1, 9))) for _ in range(n)]
    df = spark.createDataFrame(rows, "g string, x double, w double")
    got = st2.weighted_percentile(df, "x", "w", ["g"], p=p) \
             .collect()[0]["wpct"]
    total = sum(w for _, _, w in rows)
    acc = 0.0
    want = None
    for _, x, w in sorted(rows, key=lambda r: r[1]):
        acc += w
        if acc >= p * total:
            want = x
            break
    assert got == want


@SLOW
@given(n=st.integers(20, 200), shift=st.sampled_from([0.0, 25.0, 60.0]))
def test_psi_zero_iff_identical_and_grows_with_shift(spark, n, shift):
    """PSI(a, a) == 0 exactly; shifting the current window strictly
    increases PSI (monotone drift response on a planted translation)."""
    from powerdatapipeline_spark.operators import stats as st2

    base = [("g", float(v % 100)) for v in range(n)]
    ref = spark.createDataFrame(base, "g string, x double")
    cur = spark.createDataFrame(
        [("g", min(x + shift, 199.0)) for _, x in base],
        "g string, x double")
    psi = st2.psi_drift(ref, cur, "x", ["g"], lo=0.0, hi=200.0,
                        nbins=8).collect()[0]["psi"]
    if shift == 0.0:
        assert psi == 0.0
    else:
        assert psi > 0.0
