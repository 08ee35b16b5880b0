"""Behavioral tests for the round-7 curation operators (span dedup,
mixture resampling, quality buckets, sequence packing, RRF fusion, corpus
n-grams) on tiny planted corpora — the oracle-parity sweep proves
cross-engine value equality; these pin the SEMANTICS (what gets removed,
selected, packed, fused) on cases constructed to exercise each rule."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import text as tx

BOILER = "subscribe to our newsletter for updates every single day"  # 9 words


def test_remove_repeated_spans_drops_shared_boilerplate(spark):
    """A span repeated across documents is removed from ALL of them;
    unique spans survive in original order; an empty document yields an
    empty clean_text (not a crash or a dropped row)."""
    # span_words=3 → BOILER's first 9 words form 3 identical spans in
    # docs 1 and 2; each doc also has 3 words of unique content
    rows = [
        Row(doc_id=1, text=BOILER + " unique alpha one"),
        Row(doc_id=2, text=BOILER + " unique beta two"),
        Row(doc_id=3, text="entirely original content here nothing shared"),
        Row(doc_id=4, text=""),
    ]
    out = {r.doc_id: r for r in
           tx.remove_repeated_spans(spark.createDataFrame(rows),
                                    span_words=3, min_docs=2).collect()}
    assert out[1].n_spans == 4 and out[1].n_removed == 3
    assert out[1].clean_text == "unique alpha one"
    assert out[2].clean_text == "unique beta two"
    assert out[3].n_removed == 0
    assert out[3].clean_text == "entirely original content here nothing shared"
    assert out[4].n_spans == 0 and out[4].clean_text == ""


def test_remove_repeated_spans_preserves_order_of_kept_spans(spark):
    """Kept spans concatenate in span_id order even when the boilerplate
    sits in the MIDDLE of a document."""
    mid = "aaa bbb ccc " + "dup dup dup" + " xxx yyy zzz"
    rows = [Row(doc_id=1, text=mid), Row(doc_id=2, text="dup dup dup")]
    out = {r.doc_id: r.clean_text for r in
           tx.remove_repeated_spans(spark.createDataFrame(rows),
                                    span_words=3, min_docs=2).collect()}
    assert out[1] == "aaa bbb ccc xxx yyy zzz"
    assert out[2] == ""


def _mix_corpus(spark):
    rows = [Row(doc_id=i, source=f"s{i % 4}") for i in range(200)]
    return spark.createDataFrame(rows)


def test_mixture_plan_rates_and_no_upsampling(spark):
    """50 docs per stratum; weights 0.5/0.25/0.125/0.125 → the binding
    stratum is s0 (rate exactly 1.0), others keep w_s·T/n_s; a stratum
    outside the mix gets weight/rate 0 and selects nothing."""
    plan = {r.stratum: r for r in rel.mixture_resample_plan(
        _mix_corpus(spark),
        {"s0": 0.5, "s1": 0.25, "s2": 0.125}).collect()}
    assert plan["s0"].rate == 1.0 and plan["s0"].n_selected == 50
    assert plan["s1"].rate == 0.5
    assert plan["s2"].rate == 0.25
    assert plan["s3"].target_weight == 0.0 and plan["s3"].n_selected == 0
    for r in plan.values():
        assert r.rate <= 1.0  # never upsample


def test_mixture_plan_non_dyadic_binding_rate_keeps_whole_stratum(spark):
    """FP regression (round-7 review): with a non-power-of-two weight the
    binding stratum's rate computes as 0.999...9 in IEEE doubles; the
    threshold must still be `buckets` (whole stratum kept), not
    buckets−1 silently dropping ~1/buckets of it."""
    # s0 binds: T = 21/0.07 = 300 < 320/0.93; the FP product
    # 0.07 * (21/0.07) / 21 evaluates to 0.9999999999999998
    rows = [Row(doc_id=i, source="s0" if i < 21 else "s1")
            for i in range(341)]
    plan = {r.stratum: r for r in rel.mixture_resample_plan(
        spark.createDataFrame(rows),
        {"s0": 0.07, "s1": 0.93}).collect()}
    assert plan["s0"].n_selected == 21  # every doc of the binding stratum
    assert plan["s0"].rate == 1.0


def test_mixture_resample_rows_match_plan_counts(spark):
    """The action half returns exactly the rows the plan counts, with the
    input schema preserved."""
    df = _mix_corpus(spark)
    weights = {"s0": 0.5, "s1": 0.25, "s2": 0.125}
    plan = {r.stratum: r.n_selected for r in
            rel.mixture_resample_plan(df, weights).collect()}
    picked = rel.mixture_resample(df, weights)
    assert picked.columns == df.columns
    got = {r.source: r.cnt for r in
           picked.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for s, n in plan.items():
        assert got.get(s, 0) == n


def test_mixture_resample_is_deterministic_and_stable(spark):
    """Hash-rule selection: same ids selected on re-run, and a stratum's
    selected set at a LOWER rate is a subset of the higher-rate set
    (threshold monotonicity — adding strata never reshuffles survivors)."""
    df = _mix_corpus(spark)
    a = {r.doc_id for r in rel.mixture_resample(df, {"s1": 1.0}).collect()}
    b = {r.doc_id for r in rel.mixture_resample(df, {"s1": 1.0}).collect()}
    assert a == b
    # s1 binding alone → rate 1; adding s0 with big weight lowers s1's rate
    small = {r.doc_id for r in rel.mixture_resample(
        df, {"s0": 0.8, "s1": 0.2}).collect()
        if r.source == "s1"}
    assert small <= a


def test_quality_buckets_partition_and_monotone(spark):
    rows = [Row(doc_id=i,
                text=("common " * 20 if i < 20
                      else f"rare{i} unique{i} token{i}"))
            for i in range(40)]
    out = tx.quality_buckets(spark.createDataFrame(rows),
                             n_buckets=4).collect()
    assert len(out) == 4
    assert sum(r.n_docs for r in out) == 40
    by_b = sorted(out, key=lambda r: r.bucket)
    # equal-frequency buckets over a total order: ranges must be
    # non-overlapping and non-decreasing
    for lo, hi in zip(by_b, by_b[1:]):
        assert lo.max_nlp <= hi.min_nlp
    # the all-common docs (low cross-entropy) land in bucket 1
    assert by_b[0].max_nlp < by_b[-1].min_nlp


def test_quality_buckets_approx_path_is_distributed_and_sane(spark):
    """The 100 TB path (percentile_approx boundaries + broadcast range
    map): no unpartitioned window in the plan, totals preserved, ranges
    monotone non-overlapping, and on a well-separated two-population
    corpus the approx split agrees with the exact one."""
    rows = [Row(doc_id=i,
                text=("common " * 20 if i < 20
                      else f"rare{i} unique{i} token{i}"))
            for i in range(40)]
    df = spark.createDataFrame(rows)
    out = tx.quality_buckets(df, n_buckets=2, approx=True).collect()
    assert sum(r.n_docs for r in out) == 40
    by_b = sorted(out, key=lambda r: r.bucket)
    for lo, hi in zip(by_b, by_b[1:]):
        assert lo.max_nlp <= hi.min_nlp
    # two clearly separated populations → approx == exact split
    exact = {r.bucket: r.n_docs for r in
             tx.quality_buckets(df, n_buckets=2).collect()}
    assert {r.bucket: r.n_docs for r in out} == exact
    # the approx plan must not contain the single-task unpartitioned
    # ntile Window node (note: "percentile_approx" contains "ntile", so
    # match the operator, not the substring)
    plan = tx.quality_buckets(df, n_buckets=2, approx=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    exact_plan = tx.quality_buckets(df, n_buckets=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in exact_plan  # the node the approx path removes


def test_pack_sequences_first_token_rule(spark):
    """Docs of 10 tokens each, budget 25, one shard: token stream cuts at
    25/50/… — doc3 starts at token 20 (pack 0), doc4 at 30 (pack 1):
    membership follows the FIRST token, packs may overflow the budget."""
    rows = [Row(doc_id=i, source="s", text=" ".join(["w"] * 10))
            for i in range(1, 7)]
    out = {r.pack_id: r for r in
           tx.pack_sequences(spark.createDataFrame(rows), budget=25,
                             shard_col="source").collect()}
    assert out[0].n_docs == 3 and out[0].first_doc == 1 and out[0].last_doc == 3
    assert out[0].n_tokens == 30          # overflow allowed past 25
    assert out[1].n_docs == 2 and out[1].first_doc == 4
    assert out[2].n_docs == 1 and out[2].first_doc == 6
    assert sum(r.n_docs for r in out.values()) == 6


def test_pack_sequences_is_per_shard(spark):
    """Packing never crosses shards: identical doc streams in two shards
    produce identical per-shard pack layouts."""
    rows = [Row(doc_id=i, source=s, text=" ".join(["w"] * 10))
            for s in ("a", "b") for i in range(1, 4)]
    out = tx.pack_sequences(spark.createDataFrame(rows), budget=100,
                            shard_col="source").collect()
    assert {(r.shard, r.pack_id, r.n_docs, r.n_tokens) for r in out} == \
        {("a", 0, 3, 30), ("b", 0, 3, 30)}


def test_rrf_fuse_hand_computed(spark):
    """Fusion on hand-built rankings: shared doc sums both reciprocal
    terms; single-list docs still score; ties break on id."""
    a = spark.createDataFrame([Row(doc_id=1, rank=1), Row(doc_id=2, rank=2)])
    b = spark.createDataFrame([Row(doc_id=2, rank=1), Row(doc_id=9, rank=2)])
    out = {r.doc_id: r for r in
           sim.rrf_fuse(a, b, id_col="doc_id", k=10, c=60).collect()}
    assert out[2].rrf_score == pytest.approx(
        round(1 / 62 + 1 / 61, 6))          # ranked by both lists
    assert out[1].rrf_score == pytest.approx(round(1 / 61, 6))
    assert out[9].rrf_score == pytest.approx(round(1 / 62, 6))
    assert out[2].rank == 1                  # fused winner
    assert out[1].rank == 2 and out[9].rank == 3   # 1/61 > 1/62
    assert out[9].rank_a is None and out[9].rank_b == 2


def test_rrf_fuse_k_cut_and_determinism(spark):
    a = spark.createDataFrame([Row(doc_id=i, rank=i) for i in range(1, 8)])
    b = spark.createDataFrame([Row(doc_id=i, rank=9 - i) for i in range(1, 8)])
    out = sim.rrf_fuse(a, b, id_col="doc_id", k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]


def test_corpus_ngram_counts_exact_on_planted_corpus(spark):
    rows = [Row(doc_id=1, text="a b a b c"),
            Row(doc_id=2, text="a b x"),
            Row(doc_id=3, text="z")]          # 1 token → no bigram
    out = {r.ngram: r for r in
           tx.corpus_ngram_counts(spark.createDataFrame(rows),
                                  n=2, k=10).collect()}
    assert out["a b"].n_occurrences == 3 and out["a b"].n_docs == 2
    assert out["b a"].n_occurrences == 1
    assert out["a b"].rank == 1
    # total-order tie-break: "b a", "b c", "b x" all count 1 → alpha order
    ranks = sorted((r.rank, g) for g, r in out.items())
    assert [g for _, g in ranks][:4] == ["a b", "b a", "b c", "b x"]


def test_canonical_url_collapses_messy_variants(spark):
    """Scheme/www/query/trailing-slash/case variants of the same page must
    map to one canonical key; distinct paths must stay distinct."""
    rows = [
        Row(doc_id=1, url="https://www.Example.com/A/B?utm_source=x"),
        Row(doc_id=2, url="HTTP://example.COM/a/b#frag"),
        Row(doc_id=3, url="example.com/a/b/"),
        Row(doc_id=4, url="https://example.com/a/c"),
        Row(doc_id=5, url="https://sub.example.com/a/b"),
    ]
    out = {r.canonical_url: r for r in
           tx.url_dedup(spark.createDataFrame(rows)).collect()}
    assert out["example.com/a/b"].n_docs == 3
    assert out["example.com/a/b"].first_doc == 1
    assert out["example.com/a/b"].domain == "example.com"
    assert out["example.com/a/c"].n_docs == 1
    assert out["sub.example.com/a/b"].domain == "sub.example.com"


def test_filter_blocked_domains(spark):
    """Blocks the exact host, every subdomain, and explicit ports — the
    bypasses an exact-host isin would allow (round-7 review)."""
    rows = [Row(doc_id=1, url="https://www.SPAM.example/a"),
            Row(doc_id=2, url="https://good.example/b"),
            Row(doc_id=3, url="spam.example/c?x=1"),
            Row(doc_id=4, url="https://cdn.spam.example/asset"),
            Row(doc_id=5, url="https://spam.example:8080/alt"),
            Row(doc_id=6, url="https://notspam.example/ok"),
            Row(doc_id=7, url="https://user:pw@spam.example/login"),
            Row(doc_id=8, url="https://spam.example./trailing-dot")]
    kept = {r.doc_id for r in tx.filter_blocked_domains(
        spark.createDataFrame(rows), ["spam.example"]).collect()}
    assert kept == {2, 6}


def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of length >= w+k-1 (= 8 for k=5, w=4) must
    contribute at least one common fingerprint; disjoint-alphabet docs
    share none; fingerprint sets are deterministic."""
    shared = "abcdefghij"  # length 10 >= 8
    rows = [Row(doc_id=1, text="xxxx" + shared + "yyyyy"),
            Row(doc_id=2, text="qqq" + shared + "rrrr"),
            Row(doc_id=3, text="zzzzzzzzzzzzzzz")]
    df = spark.createDataFrame(rows)
    fps = tx.winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]            # the winnowing guarantee
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    again = {}
    for r in tx.winnow_fingerprints(df, k=5, w=4).collect():
        again.setdefault(r.doc_id, set()).add(r.fp)
    assert again == by_doc                   # deterministic


def test_winnowing_short_document_edges(spark):
    """len < k → no fingerprints (no rows); k <= len < k+w-1 → exactly one
    fingerprint (min of all hashes, the standard short-doc edge)."""
    rows = [Row(doc_id=1, text="abc"),        # 3 < k=5 → nothing
            Row(doc_id=2, text="abcdefg")]    # 3 hashes < w=4 → min-of-all
    out = tx.winnow_fingerprints(spark.createDataFrame(rows),
                                 k=5, w=4).collect()
    docs = [r.doc_id for r in out]
    assert docs.count(1) == 0
    assert docs.count(2) == 1


def test_ngram_jaccard_word_unit_exact_values(spark):
    """Word-shingle Jaccard on planted docs: identical docs score 1.0;
    one-word edits score the exact |A∩B|/|A∪B|; unrelated pairs are cut
    by the threshold."""
    from powerdatapipeline_spark.operators import dedup as dd
    rows = [Row(doc_id=1, text="a b c d e f"),
            Row(doc_id=2, text="a b c d e f"),
            Row(doc_id=3, text="a b c d e g"),   # 3 of 4 shingles differ
            Row(doc_id=4, text="p q r s t u")]
    out = {(r.id_a, r.id_b): r.jaccard for r in dd.ngram_jaccard_pairs(
        spark.createDataFrame(rows), n=3, threshold=0.3,
        unit="word").collect()}
    assert out[(1, 2)] == 1.0
    # docs 1 and 3: shingles {abc,bcd,cde,def} vs {abc,bcd,cde,deg}
    # → |∩|=3, |∪|=5 → 0.6
    assert out[(1, 3)] == pytest.approx(0.6)
    assert (1, 4) not in out and (2, 4) not in out


def test_winnow_neardup_pairs_finds_shared_rare_content(spark):
    """Two docs sharing a long rare passage pair up; a passage present in
    most of the corpus is pruned by the df cap (the MOSS common-
    fingerprint rule) and creates no pairs."""
    common = "every document in this corpus repeats this exact sentence"
    rare = "the rare shared passage that only two documents contain here"
    rows = [Row(doc_id=i, text=common + f" filler{i} pad{i} distinct{i}")
            for i in range(40)]
    rows += [Row(doc_id=100, text=rare + " tail one hundred"),
             Row(doc_id=101, text=rare + " other ending text")]
    out = {(r.id_a, r.id_b): r.n_shared for r in
           tx.winnow_neardup_pairs(spark.createDataFrame(rows),
                                   min_shared=3,
                                   max_df_frac=0.1).collect()}
    assert (100, 101) in out and out[(100, 101)] >= 3
    # the 40 common-passage docs must NOT pair via the common content
    assert all(a == 100 for a, _ in out), out


# ---------------------------------------------- Gopher rules (round 8)

def test_gopher_rules_each_rule_discriminates(spark):
    from pyspark.sql import functions as F
    from powerdatapipeline_spark.operators import text as tx
    good = " ".join(["the", "and", "with"] + ["word"] * 60)   # passes all
    short = "the and word"                                     # < 50 words
    longwords = " ".join(["the", "and"] + ["x" * 30] * 60)     # mean len > 10
    symbols = " ".join(["the", "and"] + ["word"] * 60) + " " + "#" * 40
    nostop = " ".join(["word"] * 60)                           # 0 stopwords
    empty = ""
    docs = spark.createDataFrame(
        list(enumerate([good, short, longwords, symbols, nostop, empty])),
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.gopher_quality_flags(docs).collect()}
    assert out[0]["passes"]
    assert not out[1]["ok_word_count"]
    assert not out[2]["ok_mean_len"]
    assert not out[3]["ok_symbols"]
    assert out[3]["symbol_ratio"] > 0.1
    assert not out[4]["ok_stopwords"]
    # empty doc: NULL metrics, failed conjunction (never silently passes)
    assert out[5]["n_words"] == 0
    assert out[5]["mean_word_len"] is None
    assert not out[5]["passes"]


def test_dsir_importance_matches_pure_python_replay(spark):
    """dsir_importance (q131) vs an independent pure-python replay of the
    DSIR formula — same md5 bucket hashing, λ-smoothing, per-term ln
    rounding, and tie-broken top-k — on a planted corpus where the target
    slice has a distinctive vocabulary. Target-like docs must outscore
    noise docs and fill the selection."""
    import hashlib
    import math
    from collections import Counter

    rows = [
        # target slice: "domain" vocabulary
        (0, "grid load power grid load", True),
        (1, "power grid voltage load power", True),
        # raw-only: same domain (should score high, target-like)
        (2, "load power grid grid", False),
        # raw-only: off-domain noise (should score low)
        (3, "banana umbrella trombone xylophone", False),
        (4, "", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = {r["doc_id"]: r for r in
           tx.dsir_importance(df, F.col("t"), n_buckets=64,
                              top_k=3).collect()}

    def bucket(term):
        h = hashlib.md5(("dsir" + term).encode()).hexdigest()[:8]
        return int(h, 16) % 64

    tf = {d: Counter(t.split()) for d, t, _ in rows}
    ct_t, ct_r = Counter(), Counter()
    for d, _, is_t in rows:
        for term, n in tf[d].items():
            ct_r[bucket(term)] += n
            if is_t:
                ct_t[bucket(term)] += n
    tt, tr = sum(ct_t.values()), sum(ct_r.values())
    lam, lam_b = 0.5, 0.5 * 64
    lr = {b: round(math.log((ct_t[b] + lam) / (tt + lam_b)), 6)
          - round(math.log((ct_r[b] + lam) / (tr + lam_b)), 6)
          for b in ct_r}
    for d, _, _ in rows:
        want = round(sum(n * lr[bucket(term)]
                         for term, n in tf[d].items()), 6)
        assert abs(out[d]["log_importance"] - want) < 1e-9, d
        assert out[d]["n_tokens"] == sum(tf[d].values())
    # domain docs outscore the noise doc; top-3 excludes noise and empty
    assert out[3]["log_importance"] < min(
        out[i]["log_importance"] for i in (0, 1, 2))
    assert {d for d in out if out[d]["selected"]} == {0, 1, 2}
    assert out[4]["n_tokens"] == 0 and not out[4]["selected"]


def test_keyword_route_argmax_tiebreak_and_default(spark):
    """keyword_route (q132): hand-computed integer scores, deterministic
    topic-name tie-break on equal scores, and the default route for docs
    hitting no keyword (including the empty doc)."""
    topics = {"alpha": {"cat": 2, "dog": 1},
              "beta": {"dog": 2, "fish": 1}}
    rows = [
        (0, "cat cat dog"),        # alpha: 2*2+1=5, beta: 2 → alpha
        (1, "dog dog fish"),       # alpha: 2, beta: 2*2+1=5 → beta
        (2, "dog"),                # alpha: 1, beta: 2 → beta
        (3, "cat fish"),           # alpha: 2, beta: 1 → alpha
        (4, "cat cat dog dog"),    # alpha: 4+2=6, beta: 4 → alpha
        (5, "dog cat"),            # alpha: 2+1=3, beta: 2 → alpha
        (6, "fish fish cat"),      # alpha: 2, beta: 2 → tie → 'alpha'
        (7, "zebra quux"),         # no hits → default
        (8, ""),                   # empty → default
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.keyword_route(df, topics).collect()}
    assert (out[0]["topic"], out[0]["score"]) == ("alpha", 5)
    assert (out[1]["topic"], out[1]["score"]) == ("beta", 5)
    assert (out[2]["topic"], out[2]["score"]) == ("beta", 2)
    assert (out[3]["topic"], out[3]["score"]) == ("alpha", 2)
    assert (out[4]["topic"], out[4]["score"]) == ("alpha", 6)
    assert (out[5]["topic"], out[5]["score"]) == ("alpha", 3)
    assert (out[6]["topic"], out[6]["score"]) == ("alpha", 2)  # tie
    assert out[6]["n_terms_hit"] == 1  # the winning topic hit 'cat' only
    assert (out[7]["topic"], out[7]["score"]) == ("none", 0)
    assert (out[8]["topic"], out[8]["score"]) == ("none", 0)
    assert len(out) == 9


def test_ngram_novelty_planted_overlap(spark):
    """ngram_novelty (q133): a doc sharing its opening 8-gram run with
    another doc loses exactly those grams from its novel count; a fully
    original doc is 100% novel; short docs get 0 grams and NULL frac."""
    shared = "one two three four five six seven eight"          # 8 words
    rows = [
        (0, shared + " alpha"),   # grams: [w1..w8], [w2..alpha] → 1 shared
        (1, shared + " beta"),    # symmetric
        (2, "totally fresh words nine ten eleven twelve thirteen"),
        (3, "too short"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.ngram_novelty(df, n=8).collect()}
    assert out[0]["n_grams"] == 2 and out[0]["n_novel"] == 1
    assert out[0]["novelty_frac"] == 0.5
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 1
    assert out[2]["n_grams"] == 1 and out[2]["n_novel"] == 1
    assert out[2]["novelty_frac"] == 1.0
    assert out[3]["n_grams"] == 0 and out[3]["novelty_frac"] is None
    assert out[4]["n_grams"] == 0 and out[4]["novelty_frac"] is None


def test_source_vocab_overlap_hand_computed(spark):
    """source_vocab_overlap (q136): exact Jaccard on planted vocabularies,
    including a zero-overlap pair (kept, jaccard 0) and within-source
    duplicate terms (vocabulary is a set, not a bag)."""
    rows = [
        (0, "a", "cat dog cat"),        # vocab(a) = {cat, dog}
        (1, "a", "dog fish"),           # vocab(a) = {cat, dog, fish}
        (2, "b", "dog fish bird"),      # vocab(b) = {dog, fish, bird}
        (3, "c", "zebra"),              # vocab(c) = {zebra} — disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["g_a"], r["g_b"]): r for r in
           tx.source_vocab_overlap(df).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (3, 3, 2)
    assert ab["jaccard"] == 0.5  # |{dog,fish}| / |{cat,dog,fish,bird}|
    ac = out[("a", "c")]
    assert ac["n_common"] == 0 and ac["jaccard"] == 0.0


def test_centroid_cosine_matrix_collinear_and_orthogonal(spark):
    """centroid_cosine_matrix (q137): groups whose centroids are
    parallel score 1, orthogonal score 0, opposite score −1; counts ride
    along; a zero-centroid group yields NULL cosine (guarded division)."""
    rows = [
        (0, [1.0, 0.0], 1), (1, [3.0, 0.0], 1),     # centroid (2, 0)
        (2, [0.0, 5.0], 2),                          # centroid (0, 5)
        (3, [2.0, 0.0], 3),                          # centroid (2, 0)
        (4, [-4.0, 0.0], 4),                         # centroid (−4, 0)
        (5, [1.0, 1.0], 5), (6, [-1.0, -1.0], 5),    # centroid (0, 0)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r["g_a"], r["g_b"]): r for r in
           sim.centroid_cosine_matrix(df).collect()}
    assert len(out) == 10  # C(5,2), zero-overlap pairs kept
    assert out[(1, 3)]["cosine"] == 1.0
    assert out[(1, 2)]["cosine"] == 0.0
    assert out[(1, 4)]["cosine"] == -1.0
    assert out[(1, 5)]["cosine"] is None  # zero-norm guard
    assert (out[(1, 2)]["n_a"], out[(1, 2)]["n_b"]) == (2, 1)
