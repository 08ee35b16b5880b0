"""Property-based brute-force checks for winnow_fingerprints and the
count-min sketch (cms_build + cms_estimate) — the fifteenth
independent-replay suite (rationale in test_rank_stats_properties.py).
Pinned semantics:

- winnowing: the selected set is EXACTLY the per-window minima of the
  md5-prefix k-gram hashes (the existing tests pin the shared-substring
  guarantee, not the selection), with the min-of-all short-document
  edge and per-document distinctness.
- cms: every (row, bucket) cell replayed through the md5-prefix chain;
  point estimates are the min over depth rows with absent cells read
  as 0 (never dropped, never min-over-survivors) — including keys the
  build never saw.
"""

import hashlib
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import stats as sx
from powerdatapipeline_spark.operators import text as tx

SLOW = replay_settings(8)


def _h8(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _h15(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------- winnowing

def _winnow_model(rows, k=5, w=4):
    out = set()
    for i, text in rows:
        c = text.lower()
        hs = [_h8(c[j:j + k]) for j in range(len(c) - k + 1)]
        if not hs:
            continue
        if len(hs) >= w:
            fps = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
        else:
            fps = {min(hs)}
        out |= {(i, fp) for fp in fps}
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 12),
       k=st.sampled_from([2, 5]), w=st.sampled_from([2, 4]))
def test_winnow_fingerprints_matches_bruteforce(spark, seed, n, k, w):
    import random
    rng = random.Random(seed)
    rows = [(i, "".join(rng.choice("abAB ")
                        for _ in range(rng.randrange(0, 25))))
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["fp"])
           for r in tx.winnow_fingerprints(df, k=k, w=w).collect()}
    assert got == _winnow_model(rows, k, w)


# ---------------------------------------------------------------- count-min

def _cms_model(keys, width, depth):
    cells = Counter()
    for key in keys:
        for j in range(depth):
            cells[(j, _h15(f"cms{j}:{key}") % width)] += 1
    return dict(cells)


def _cms_estimate_model(cells, key, width, depth):
    return min(cells.get((j, _h15(f"cms{j}:{key}") % width), 0)
               for j in range(depth))


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 40),
       width=st.sampled_from([4, 16]), depth=st.sampled_from([1, 3]))
def test_cms_build_and_estimate_match_bruteforce(spark, seed, n, width,
                                                 depth):
    import random
    rng = random.Random(seed)
    keys = [rng.randrange(12) for _ in range(n)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sketch = sx.cms_build(df, "k", width=width, depth=depth)
    got = {(r["j"], r["b"]): r["n"] for r in sketch.collect()}
    cells = _cms_model(keys, width, depth)
    assert got == cells

    true = Counter(keys)
    probe_keys = sorted(set(keys)) + [999]   # 999 never in the build
    probes = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    est = {r["k"]: r["cms_estimate"]
           for r in sx.cms_estimate(sketch, probes, "k").collect()}
    for k in probe_keys:
        want = _cms_estimate_model(cells, k, width, depth)
        assert est[k] == want, (k, est[k], want)
        assert est[k] >= true.get(k, 0)      # CMS never underestimates
