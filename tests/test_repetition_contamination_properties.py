"""Property-based brute-force checks for repetition_stats and
contamination_report — the nineteenth independent-replay suite
(rationale in test_rank_stats_properties.py). Pinned semantics:

- repetition_stats: duplicate-line fraction over the raw newline split
  (trailing empties kept — Java split limit −1 ≡ Python str.split),
  top-bigram share over NON-distinct bigram occurrences, and the
  short-document 0.0 (not NULL) via the left join + coalesce.
- contamination_report: collisions counted as DISTINCT shared n-grams
  per training doc (the md5 key is a bijection modulo collisions),
  n_bench_docs as distinct benchmark docs reachable through ANY shared
  gram, clean docs absent from the output.

All exact.
"""

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import text as tx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


def toks(text):
    import re
    return [w for w in re.split(r"[ \t\n\r\f\x0b]+", text.lower()) if w]


VOCAB = ["aa", "bb", "cc"]


# ------------------------------------------------------------ repetition

def _rep_model(rows):
    out = {}
    for i, t in rows:
        lines = t.split("\n")
        nl = len(lines)
        dup = rq((nl - len(set(lines))) / nl) if nl > 0 else 0.0
        ws = toks(t)
        bg = Counter(" ".join(ws[j:j + 2]) for j in range(len(ws) - 1))
        frac = rq(max(bg.values()) / sum(bg.values())) if bg else 0.0
        out[i] = (nl, dup, frac)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 15))
def test_repetition_stats_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = [(i, "\n".join(" ".join(rng.choice(VOCAB)
                                   for _ in range(rng.randrange(0, 5)))
                          for _ in range(rng.randrange(0, 4))))
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                         r["top_bigram_frac"])
           for r in tx.repetition_stats(df).collect()}
    assert got == _rep_model(rows)


# --------------------------------------------------------- contamination

def _grams(text, n):
    ws = toks(text)
    return {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}


def _contam_model(train, bench, n=2):
    bgrams = defaultdict(set)
    for bid, t in bench:
        for g in _grams(t, n):
            bgrams[g].add(bid)
    out = {}
    for i, t in train:
        shared = {g for g in _grams(t, n) if g in bgrams}
        if shared:
            out[i] = (len(shared),
                      len(set().union(*(bgrams[g] for g in shared))))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), nt=st.integers(1, 12),
       nb=st.integers(1, 6))
def test_contamination_matches_bruteforce(spark, seed, nt, nb):
    import random
    rng = random.Random(seed)

    def doc(i):
        return (i, " ".join(rng.choice(VOCAB)
                            for _ in range(rng.randrange(0, 7))))

    train = [doc(i) for i in range(nt)]
    bench = [doc(i) for i in range(nb)]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_colliding_ngrams"], r["n_bench_docs"])
           for r in tx.contamination_report(tdf, bdf, n=2).collect()}
    assert got == _contam_model(train, bench)
