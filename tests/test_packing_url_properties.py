"""Property-based brute-force checks for the packing/URL family —
pack_sequences, chunk_documents, corpus_ngram_counts, url_dedup,
filter_blocked_domains. Fourteenth independent-replay suite (rationale
in test_rank_stats_properties.py). Pinned semantics:

- pack_sequences: a document belongs to the pack where its FIRST token
  lands — pack_id = floor(start_offset/budget) over the per-shard
  id-ordered cumulative token count.
- chunk_documents: ceil-division chunk count spelled as
  1 + floor((extra + stride − 1)/stride), tail chunks shorter, empty
  documents still emitting one empty chunk.
- corpus_ngram_counts: NON-distinct occurrence counts (unlike the
  dedup shingles) with the (count desc, ngram asc) rank order.
- url_dedup / canonical_url: the ordered rule chain (scheme, www.,
  query/fragment, ONE trailing slash) on lowercased URLs; domain =
  everything before the first '/'.
- filter_blocked_domains: subdomain-closed blocking after userinfo /
  port / trailing-dot normalization — the classic bypass encodings
  must not get through.

All exact (counting and string rewriting only).
"""

import math
import re
from collections import Counter, defaultdict

from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import text as tx

SLOW = replay_settings(8)

WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def toks(text):
    return [w for w in WS_RE.split(text.lower()) if w]


VOCAB = ["aa", "bb", "cc", "dd"]


def _doc(rng, max_words=8):
    return " ".join(rng.choice(VOCAB)
                    for _ in range(rng.randrange(0, max_words)))


# ------------------------------------------------------------ pack_sequences

def _pack_model(rows, budget):
    per = defaultdict(list)
    for i, s, t in rows:
        per[s].append((i, len(toks(t))))
    out = {}
    for s, docs in per.items():
        docs.sort()
        cum = 0
        packs = defaultdict(lambda: [0, 0, None, None])
        for i, nt in docs:
            pid = math.floor(float(cum) / budget)
            p = packs[pid]
            p[0] += 1
            p[1] += nt
            p[2] = i if p[2] is None else min(p[2], i)
            p[3] = i if p[3] is None else max(p[3], i)
            cum += nt
        for pid, p in packs.items():
            out[(s, pid)] = tuple(p)
    return out


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25),
       budget=st.sampled_from([3, 5, 9]))
def test_pack_sequences_matches_bruteforce(spark, seed, n, budget):
    import random
    rng = random.Random(seed)
    rows = [(i, "s" + str(rng.randrange(2)), _doc(rng))
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    got = {(r["shard"], r["pack_id"]): (r["n_docs"], r["n_tokens"],
                                        r["first_doc"], r["last_doc"])
           for r in tx.pack_sequences(df, budget=budget).collect()}
    assert got == _pack_model(rows, budget)


# ----------------------------------------------------------- chunk_documents

def _chunk_model(rows, ct, ov):
    stride = ct - ov
    out = []
    for i, t in rows:
        ws = toks(t)
        extra = max(len(ws) - ct, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        for c in range(n_chunks):
            piece = ws[c * stride:c * stride + ct]
            out.append((i, c, len(piece), " ".join(piece)))
    return sorted(out)


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 15),
       ct=st.sampled_from([3, 5]), ov=st.sampled_from([0, 1, 2]))
def test_chunk_documents_matches_bruteforce(spark, seed, n, ct, ov):
    import random
    rng = random.Random(seed)
    rows = [(i, _doc(rng, 14)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"],
                  r["chunk_text"])
                 for r in tx.chunk_documents(df, chunk_tokens=ct,
                                             overlap=ov).collect())
    assert got == _chunk_model(rows, ct, ov)


# -------------------------------------------------------- corpus_ngram_counts

def _ngram_model(rows, n=2, k=20):
    occ = Counter()
    docs = defaultdict(set)
    for i, t in rows:
        ws = toks(t)
        for j in range(len(ws) - n + 1):
            g = " ".join(ws[j:j + n])
            occ[g] += 1
            docs[g].add(i)
    ranked = sorted(occ, key=lambda g: (-occ[g], g))[:k]
    return [(g, occ[g], len(docs[g]), r)
            for r, g in enumerate(ranked, 1)]


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 20))
def test_corpus_ngram_counts_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = [(i, _doc(rng, 10)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["ngram"], r["n_occurrences"], r["n_docs"], r["rank"])
           for r in tx.corpus_ngram_counts(df).collect()]
    assert got == _ngram_model(rows)


# ------------------------------------------------------------------ URLs

CANON_RULES = (r"^https?://", r"^www\.", r"[?#].*$", r"/$")


def _canon(url):
    out = url.lower()
    for pat in CANON_RULES:
        out = re.sub(pat, "", out)
    return out


def _url_rows(rng, n):
    hosts = ["a.example", "spam.example", "cdn.spam.example",
             "good.org", "spam.example.", "u:p@spam.example",
             "good.org:8080"]
    rows = []
    for i in range(n):
        u = (rng.choice(["http://", "https://", "", "HTTP://"])
             + rng.choice(["www.", ""]) + rng.choice(hosts)
             + rng.choice(["", "/x", "/x/", "/"])
             + rng.choice(["", "?q=1", "#frag"]))
        rows.append((i, u))
    return rows


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25))
def test_url_dedup_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = _url_rows(rng, n)
    df = spark.createDataFrame(rows, "doc_id long, url string")
    want = {}
    for i, u in rows:
        c = _canon(u)
        if c not in want:
            want[c] = [i, 0]
        want[c][0] = min(want[c][0], i)
        want[c][1] += 1
    wantd = {c: (re.match(r"^([^/]*)", c).group(1), v[1], v[0])
             for c, v in want.items()}
    got = {r["canonical_url"]: (r["domain"], r["n_docs"], r["first_doc"])
           for r in tx.url_dedup(df).collect()}
    assert got == wantd


@SLOW
@given(seed=st.integers(0, 10 ** 6), n=st.integers(1, 25))
def test_blocked_domains_matches_bruteforce(spark, seed, n):
    import random
    rng = random.Random(seed)
    rows = _url_rows(rng, n)
    blocked = ["spam.example"]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = sorted(r["doc_id"] for r in
                 tx.filter_blocked_domains(df, blocked).collect())

    def host_of(u):
        c = _canon(u)
        h = re.match(r"^([^/]*)", c).group(1)
        h = re.sub(r"^[^/@]*@", "", h)
        h = re.sub(r":[0-9]+$", "", h)
        return re.sub(r"\.$", "", h)

    want = sorted(i for i, u in rows
                  if not any(host_of(u) == b or
                             host_of(u).endswith("." + b)
                             for b in blocked))
    assert got == want
