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
