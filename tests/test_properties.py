"""Property-based checks (hypothesis) for the time-series operators —
the identities SURVEY.md §5 proposes: window-count law, resample
composition, interpolation boundedness, split partitioning.

Strategies are kept small (Spark job per example is expensive): hypothesis
drives the SHAPE diversity (cadences, sizes, gaps), not bulk volume.
"""

import pytest
from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import timeseries as ts

SLOW = replay_settings(8)


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
    from decimal import ROUND_HALF_UP, Decimal
    from powerdatapipeline_spark.operators import text as tx

    # Spark's round(double, 6) quantizes the SHORTEST-REPR decimal
    # HALF_UP; python's round() rounds the exact binary value HALF_EVEN
    # — they disagree when the shortest repr lands exactly on a 7th-
    # decimal 5 (round-14 fuzz catch: s='aaaaa....   \t\tbbcd' gave
    # -ssum/n = x.xxxxxx5 → engine 1.798106, old model 1.798105)
    def rq6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

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
            acc += c * rq6(math.log(c / n))
        want = rq6(-acc / n)
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


# ------------- span dedup vs brute-force oracles (VERDICT r7 #4) -----------

_WS_RE = __import__("re").compile(r"[ \t\n\r\f\x0B]+")


def _py_tokens(text):
    return [t for t in _WS_RE.split(text.lower()) if t]


def _py_span_spec(texts, span_words, min_docs=2):
    """Pure-python replay of remove_repeated_spans' aligned-window spec:
    non-overlapping span_words-token windows, drop those whose text
    occurs as an ALIGNED window in >= min_docs distinct docs."""
    spans = {}
    for i, t in enumerate(texts):
        tt = _py_tokens(t)
        spans[i] = [" ".join(tt[j:j + span_words])
                    for j in range(0, len(tt), span_words)]
    docs_of = {}
    for i, ss in spans.items():
        for s in ss:
            docs_of.setdefault(s, set()).add(i)
    out, dropped = {}, {}
    for i, ss in spans.items():
        kept = [s for s in ss if len(docs_of[s]) < min_docs]
        out[i] = (len(ss), len(ss) - len(kept), " ".join(kept))
        dropped[i] = [s for s in ss if len(docs_of[s]) >= min_docs]
    return out, dropped


def _occurs_contiguously(hay, needle):
    n = len(needle)
    return any(hay[k:k + n] == needle for k in range(len(hay) - n + 1))


def _exact_target_tokens(token_lists, span_words, min_docs=2):
    """Brute-force Lee et al. (2021) oracle: per doc, the set of token
    positions covered by SOME >=span_words-token contiguous window that
    occurs (at any offset) in >= min_docs distinct docs. This is the
    EXACT substring-dedup removal target the aligned-window operator
    approximates."""
    out = []
    for i, tt in enumerate(token_lists):
        covered = set()
        for a in range(len(tt) - span_words + 1):
            win = tt[a:a + span_words]
            n_docs = sum(1 for other in token_lists
                         if _occurs_contiguously(other, win))
            if n_docs >= min_docs:
                covered.update(range(a, a + span_words))
        out.append(covered)
    return out


@SLOW
@given(docs=st.lists(
    st.lists(st.sampled_from(["ab", "cd", "ef", "gh", "ij", "kl"]),
             max_size=24),
    min_size=2, max_size=5),
    span_words=st.integers(2, 3))
def test_span_dedup_matches_spec_and_never_exceeds_exact_oracle(
        spark, docs, span_words):
    """Two laws pinning q85's approximation (VERDICT r7 #4):

    1. EXACTNESS for the aligned-window definition: the operator equals
       a pure-python replay of its spec on every corpus shape.
    2. SOUNDNESS vs the true Lee et al. target: every token the
       approximation removes lies inside a genuinely repeated
       >=span_words-token cross-doc substring found by the brute-force
       exact oracle — so the approximation only ever removes LESS than
       exact substring dedup would, never clean content.
    """
    from powerdatapipeline_spark.operators import text as tx
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_spans"], r["n_removed"], r["clean_text"])
           for r in tx.remove_repeated_spans(
               df, span_words=span_words).collect()}
    spec, dropped = _py_span_spec(texts, span_words)
    assert got == spec
    token_lists = [_py_tokens(t) for t in texts]
    exact = _exact_target_tokens(token_lists, span_words)
    for i, span_texts in dropped.items():
        for s in span_texts:
            s_toks = s.split(" ")
            # the dropped span's text really does repeat contiguously in
            # >= 2 distinct docs...
            assert sum(1 for tt in token_lists
                       if _occurs_contiguously(tt, s_toks)) >= 2
        # ...and (for full-width spans) its token positions are a subset
        # of the exact oracle's removal target: removed <= exact always
        tt = token_lists[i]
        approx_covered = set()
        for j in range(0, len(tt), span_words):
            s = " ".join(tt[j:j + span_words])
            if s in span_texts and len(tt) - j >= span_words:
                approx_covered.update(range(j, j + span_words))
        assert approx_covered <= exact[i]


def test_span_dedup_aligned_duplication_recall_floor(spark):
    """Recall floor of the approximation: a duplicated block of
    m×span_words tokens inserted at SPAN-ALIGNED offsets in two docs is
    fully caught — all m aligned windows drop in both docs."""
    from powerdatapipeline_spark.operators import text as tx
    block = "x1 x2 x3 x4 x5 x6 x7 x8"          # m=2 spans at span_words=4
    texts = ["a1 a2 a3 a4 " + block + " a5 a6",  # block at offset 4 (aligned)
             block + " b1 b2 b3",                # block at offset 0 (aligned)
             "c1 c2 c3 c4 c5"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = {r["doc_id"]: r["n_removed"]
           for r in tx.remove_repeated_spans(df, span_words=4).collect()}
    assert out[0] >= 2 and out[1] >= 2 and out[2] == 0


def test_span_dedup_documented_miss_class(spark):
    """The approximation's KNOWN miss (documented in the q85 docstring
    and SCALE.md): the same duplicated block at a NON-aligned offset in
    one doc produces differing aligned window texts, so nothing drops —
    while the exact Lee et al. oracle still finds every duplicated
    token. This pins the miss CLASS (alignment-dependent recall), not a
    bug: precision stays 1 (nothing clean is ever removed)."""
    from powerdatapipeline_spark.operators import text as tx
    block = "x1 x2 x3 x4 x5 x6 x7 x8"
    texts = ["a1 a2 a3 a4 " + block,        # aligned at 4
             "b1 " + block + " b2 b3 b4"]   # misaligned at 1
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = {r["doc_id"]: r["n_removed"]
           for r in tx.remove_repeated_spans(df, span_words=4).collect()}
    assert out == {0: 0, 1: 0}  # the miss: zero recall when misaligned
    exact = _exact_target_tokens([_py_tokens(t) for t in texts], 4)
    assert len(exact[0]) == 8 and len(exact[1]) == 8  # oracle catches all


@SLOW
@given(docs=st.lists(
    st.lists(st.sampled_from(["ab", "cd", "ef", "gh", "ij", "kl"]),
             max_size=24),
    min_size=2, max_size=5),
    min_tokens=st.integers(2, 3))
def test_exact_substring_dedup_matches_brute_force(spark, docs, min_tokens):
    """remove_repeated_substrings_exact IS the Lee et al. semantics: its
    removed-token count per doc equals the brute-force any-offset oracle
    exactly, its clean_text is the uncovered tokens in order, and it
    removes a SUPERSET of what the aligned approximation removes."""
    from powerdatapipeline_spark.operators import text as tx
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in tx.remove_repeated_substrings_exact(
        df, min_tokens=min_tokens).collect()}
    token_lists = [_py_tokens(t) for t in texts]
    exact = _exact_target_tokens(token_lists, min_tokens)
    for i, tt in enumerate(token_lists):
        assert got[i]["n_tokens"] == len(tt)
        assert got[i]["n_removed_tokens"] == len(exact[i])
        kept = [t for p, t in enumerate(tt) if p not in exact[i]]
        assert got[i]["clean_text"] == " ".join(kept)
    # containment law: the aligned approximation removes a SUBSET of the
    # exact operator's target — positions of every aligned-dropped
    # full-width span lie inside the exact covered set
    _, dropped = _py_span_spec(texts, min_tokens)
    for i, tt in enumerate(token_lists):
        approx_covered = set()
        for j in range(0, len(tt), min_tokens):
            if (len(tt) - j >= min_tokens
                    and " ".join(tt[j:j + min_tokens]) in dropped[i]):
                approx_covered.update(range(j, j + min_tokens))
        assert approx_covered <= exact[i]
        assert len(approx_covered) <= got[i]["n_removed_tokens"]


# --------------------- SCD2 merge vs python replay (round 8) ---------------

def _py_scd2(cur_rows, upd_rows):
    """Pure-python replay of relational.scd2_merge for one attribute:
    cur_rows = {key: (val, valid_from)}, upd_rows = [(key, val, eff)]
    with unique (key, eff). Returns {(key, valid_from): (val, valid_to,
    is_current)}."""
    from collections import defaultdict
    per_key = defaultdict(list)
    for k, (v, vf) in cur_rows.items():
        per_key[k].append((vf, 0, v))
    for k, v, eff in upd_rows:
        per_key[k].append((eff, 1, v))
    out = {}
    for k, versions in per_key.items():
        versions.sort()
        surviving = []
        for vf, src, v in versions:
            if not surviving or surviving[-1][1] != v:
                surviving.append((vf, v))
        for i, (vf, v) in enumerate(surviving):
            vt = surviving[i + 1][0] if i + 1 < len(surviving) else None
            out[(k, vf)] = (v, vt, vt is None)
    return out


@SLOW
@given(updates=st.lists(
    st.tuples(st.integers(0, 3),                      # key
              st.sampled_from(["a", "b", "c"]),       # value (few → no-ops)
              st.integers(1, 20)),                    # eff time
    max_size=15))
def test_scd2_merge_matches_python_replay(spark, updates):
    """scd2_merge over arbitrary effective-dated update sequences equals
    a direct python replay: same surviving versions, same
    valid_from/valid_to chains, same single-current-per-key invariant,
    no-op runs compressed identically."""
    from powerdatapipeline_spark.operators import relational as rel
    # unique (key, eff) per the operator's contract
    seen, uniq = set(), []
    for k, v, eff in updates:
        if (k, eff) not in seen:
            seen.add((k, eff))
            uniq.append((k, v, float(eff)))
    cur = {0: ("a", 0.0), 1: ("b", 0.0)}   # keys 2,3 are born by updates
    dim = spark.createDataFrame(
        [(k, v, vf, None, True) for k, (v, vf) in cur.items()],
        "k long, v string, valid_from double, valid_to double, "
        "is_current boolean")
    ups = spark.createDataFrame(uniq, "k long, v string, eff double") \
        if uniq else spark.createDataFrame(
            [], "k long, v string, eff double")
    got = {(r["k"], r["valid_from"]):
           (r["v"], r["valid_to"], r["is_current"])
           for r in rel.scd2_merge(dim, ups, key="k", attrs=["v"],
                                   eff_col="eff").collect()}
    assert got == _py_scd2(cur, uniq)
    currents = [k for (k, _), (_, _, cur_) in got.items() if cur_]
    assert sorted(currents) == sorted(set(list(cur) + [k for k, _, _ in uniq]))
