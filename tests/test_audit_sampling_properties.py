"""Property-based brute-force checks for good_turing_mass,
stratified_hash_sample, k_anonymity_audit, l_diversity_audit, and
trimmed_mean — the sixteenth independent-replay suite (rationale in
test_rank_stats_properties.py). Pinned semantics:

- good_turing_mass: missing mass = singleton share N1/N over per-group
  word counts.
- stratified_hash_sample: survival is the pure key function
  md5-prefix8 mod buckets < round(rate·buckets), per stratum with the
  default-rate fallback — replayed hash-for-hash.
- k-anonymity / l-diversity: group-size and distinct-sensitive counts
  against the thresholds, rows-at-risk summed over failing groups only.
- trimmed_mean: the trimmed SET is the (value, tiebreak) total order
  with floor(n·f) cut from each end — ties must trim deterministically.

All exact.
"""

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as sx
from powerdatapipeline_spark.operators import text as tx

SLOW = replay_settings(8)

SIX = Decimal("0.000001")


def rq(x):
    return float(Decimal(repr(x)).quantize(SIX, rounding=ROUND_HALF_UP))


# --------------------------------------------------------- good_turing_mass

def _gt_model(rows):
    cnt = defaultdict(Counter)
    for g, text in rows:
        cnt[g].update(w for w in text.lower().split() if w)
    out = {}
    for g, ws in cnt.items():
        n = sum(ws.values())
        if n == 0:
            continue
        n1 = sum(1 for c in ws.values() if c == 1)
        n2 = sum(1 for c in ws.values() if c == 2)
        out[g] = (n, len(ws), n1, n2, rq(n1 / n))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25))
def test_good_turing_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = [("g" + str(rng.randrange(3)),
             " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"])
                      for _ in range(rng.randrange(0, 8))))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: (r["n_tokens"], r["vocab"], r["n_singletons"],
                         r["n_doubletons"], r["missing_mass"])
           for r in tx.good_turing_mass(df).collect()}
    assert got == _gt_model(rows)


# --------------------------------------------------- stratified_hash_sample

def _bucket(key, salt, buckets):
    return int(hashlib.md5((salt + str(key)).encode())
               .hexdigest()[:8], 16) % buckets


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       ra=st.sampled_from([0.0, 0.3, 1.0]),
       dflt=st.sampled_from([0.0, 0.5]))
def test_stratified_sample_matches_bruteforce(spark, seed, n, ra, dflt):
    import random
    rng = random.Random(seed)
    rows = [(i, rng.choice(["a", "b", "c"])) for i in range(n)]
    rates = {"a": ra, "b": 0.7}
    df = spark.createDataFrame(rows, "key long, stratum string")
    got = sorted(r["key"] for r in rel.stratified_hash_sample(
        df, "key", "stratum", rates, default_rate=dflt).collect())
    want = sorted(
        i for i, s in rows
        if _bucket(i, "", 10_000)
        < int(round(rates.get(s, dflt) * 10_000)))
    assert got == want


# ------------------------------------------------- k-anonymity / l-diversity

@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       k=st.sampled_from([2, 3, 5]), l=st.sampled_from([2, 3]))
def test_privacy_audits_match_bruteforce(spark, seed, n, k, l):
    import random
    rng = random.Random(seed)
    rows = [(rng.choice("xy"), rng.randrange(3), rng.choice("PQRS"))
            for _ in range(n)]
    df = spark.createDataFrame(rows, "q1 string, q2 long, s string")

    sizes = Counter((a, b) for a, b, _ in rows)
    div = {g: len({s for a, b, s in rows if (a, b) == g}) for g in sizes}

    r = sx.k_anonymity_audit(df, ["q1", "q2"], k=k).collect()[0]
    unsafe = [g for g, c in sizes.items() if c < k]
    assert (r["n_groups"], r["n_unsafe_groups"], r["n_rows_at_risk"],
            r["min_group_size"], r["k_anonymous"]) == (
        len(sizes), len(unsafe), sum(sizes[g] for g in unsafe),
        min(sizes.values()), not unsafe)

    r2 = sx.l_diversity_audit(df, ["q1", "q2"], "s", l=l).collect()[0]
    low = [g for g in sizes if div[g] < l]
    assert (r2["n_groups"], r2["n_low_diversity_groups"],
            r2["n_rows_at_risk"], r2["min_distinct_sensitive"],
            r2["l_diverse"]) == (
        len(sizes), len(low), sum(sizes[g] for g in low),
        min(div.values()), not low)


# -------------------------------------------------------------- trimmed_mean

def _trim_model(rows, f):
    per = defaultdict(list)
    for g, v, i in rows:
        per[g].append((float(v), i))
    out = {}
    for g, vs in per.items():
        vs.sort()
        cut = math.floor(len(vs) * f)
        kept = vs[cut:len(vs) - cut]
        if kept:
            out[g] = (len(kept),
                      rq(float(sum(int(v) for v, _ in kept))
                         / len(kept)))
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       f=st.sampled_from([0.0, 0.1, 0.25, 0.49]))
def test_trimmed_mean_matches_bruteforce(spark, seed, n, f):
    import random
    rng = random.Random(seed)
    rows = [("g" + str(rng.randrange(2)), float(rng.randrange(6)), i)
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    got = {r["g"]: (r["n_kept"], r["trimmed_mean"])
           for r in sx.trimmed_mean(df, "v", group_by=["g"], trim_frac=f,
                                    tiebreak="i").collect()}
    assert got == _trim_model(rows, f)
