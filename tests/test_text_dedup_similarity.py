"""Text / dedup / similarity operator tests on tiny controlled corpora."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import text as tx


def _docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        Row(doc_id=3, text="the quick brown fox jumped over the lazy dog"),  # near dup
        Row(doc_id=4, text="completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows)


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([Row(text="The  quick   Fox")])
    r = df.select(tx.tokens("text").alias("t"), tx.token_count("text").alias("n")).first()
    assert r.t == ["the", "quick", "fox"]  # lowercased, empties dropped
    assert r.n == 3


def test_tokenization_cross_engine_on_vertical_tab(spark):
    """tx.WS_CLASS spells out the whitespace class because Java's \\s
    matches \\x0B while RE2's does not — a \\x0B-containing document must
    tokenize and fingerprint identically in Spark and DuckDB (same latent
    divergence ADVICE r5 flagged for the PII rules)."""
    import duckdb

    s = "hello\x0bworld and\ttabs\nnewlines  doublespace"
    g = (spark.createDataFrame([Row(text=s)])
         .select(tx.tokens("text").alias("t"),
                 tx.fingerprint("text").alias("fp"),
                 tx.rolling_fingerprint("text").alias("rfp")).first())
    w = duckdb.sql(r"""
        SELECT list_filter(regexp_split_to_array(lower(?::VARCHAR),
                 '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t,
               md5(trim(regexp_replace(lower(?::VARCHAR),
                 '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS fp
    """, params=[s, s]).fetchone()
    assert g.t == w[0] == ["hello", "world", "and", "tabs",
                          "newlines", "doublespace"]
    assert g.fp == w[1]


def test_bpe_pieces_and_rolling_fingerprint(spark):
    df = spark.createDataFrame([Row(text="Hello, world! 42")])
    r = df.select(tx.bpe_pieces("text").alias("p"),
                  tx.bpe_piece_count("text").alias("n"),
                  tx.rolling_fingerprint("text").alias("fp")).first()
    # letters / single symbols / digit runs, cased down
    assert r.p == ["hello", ",", "world", "!", "42"]
    assert r.n == 5
    # hand-computed Rabin–Karp over "hello, world! 42"
    fp = 0
    for ch in "hello, world! 42":
        fp = (fp * 131 + ord(ch)) % 1_000_000_007
    assert r.fp == fp
    # normalization: whitespace runs collapse before hashing
    a, b = spark.createDataFrame(
        [Row(text="a  b"), Row(text="a b")]).select(
        tx.rolling_fingerprint("text").alias("fp")).collect()
    assert a.fp == b.fp


def test_char_ngrams(spark):
    r = spark.createDataFrame([Row(text="abcd")]).select(
        tx.char_ngrams("text", 3).alias("g")).first()
    assert r.g == ["abc", "bcd"]


def test_word_ngrams(spark):
    r = spark.createDataFrame([Row(text="a b c")]).select(
        tx.word_ngrams("text", 2).alias("g")).first()
    assert r.g == ["a b", "b c"]


def test_stopword_ratio_and_langid(spark):
    df = spark.createDataFrame([Row(text="the cat is on the mat"),
                                Row(text="zzz qqq xxx")])
    out = df.select("text", F.round(tx.stopword_ratio("text"), 3).alias("r"),
                    tx.langid_heuristic("text").alias("lang")).collect()
    by_text = {r.text: (r.r, r.lang) for r in out}
    assert by_text["the cat is on the mat"] == (pytest.approx(4 / 6, abs=1e-3), "en")
    assert by_text["zzz qqq xxx"] == (0.0, "other")


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([Row(text="Hello   World"), Row(text="hello world ")])
    fps = {r[0] for r in df.select(tx.fingerprint("text")).collect()}
    assert len(fps) == 1


def test_exact_dedup_groups(spark):
    out = dd.exact_dedup(_docs(spark))
    rows = {r.doc_id: r.n_copies for r in out.collect()}
    assert rows == {1: 2, 3: 1, 4: 1}  # min-id representative, copy counts


def test_minhash_signature_shape_and_determinism(spark):
    df = _docs(spark)
    a = df.select(tx.minhash_signature("text", 8).alias("s")).collect()
    b = df.select(tx.minhash_signature("text", 8).alias("s")).collect()
    assert a == b
    assert all(len(r.s) == 8 for r in a)


def test_minhash_lsh_finds_dups_not_distinct(spark):
    # 8 bands × 2 rows: catch probability for the j≈0.84 near-dup pair is
    # 1−(1−j²)^8 ≈ 0.9998, so the assertion doesn't sit on a hash-family
    # roll (4×4 banding has a ~5% deterministic miss chance per family)
    out = dd.minhash_lsh_pairs(_docs(spark), num_perm=16, bands=8, threshold=0.5)
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup: all slots agree
    assert (1, 3) in pairs or (2, 3) in pairs        # near dup caught by LSH
    assert not any(4 in p for p in pairs)            # distinct doc never pairs


def test_lsh_verified_pairs_exact_jaccard(spark):
    out = dd.lsh_verified_pairs(_docs(spark), threshold=0.5, bands=8)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0  # jumped/jumps share most 3-grams


def test_simhash_pairs_hamming(spark):
    # NOTE: on very short docs a one-word change flips many SimHash bits
    # (vote margins over ~40 shingles are tiny), so only the exact dup is
    # guaranteed within small Hamming distance — MinHash-LSH is the near-dup
    # detector for short text; SimHash targets long documents.
    out = dd.simhash_pairs(_docs(spark), max_hamming=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert pairs[(1, 2)] == 0          # identical text → identical fingerprint
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_pairs_threshold(spark):
    out = dd.ngram_jaccard_pairs(_docs(spark), threshold=0.8)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def _emb(spark, n=50, dim=8):
    import numpy as np
    rng = np.random.default_rng(0)
    vs = rng.standard_normal((n, dim)).astype("float32")
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vs[i]]) for i in range(n)])


def test_brute_force_topk_self_is_rank1(spark):
    emb = _emb(spark)
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = sim.brute_force_topk(emb, qs, k=5)
    top1 = {r.query_id: r.vec_id for r in out.where("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}  # each query's nearest neighbor is itself
    assert out.groupBy("query_id").count().agg(F.min("count")).first()[0] == 5


def test_hyperplane_lsh_subset_of_bruteforce_scores(spark):
    emb = _emb(spark, dim=8)
    qs = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = sim.hyperplane_lsh_topk(emb, qs, k=5, n_planes=4, dim=8)
    # approximate: self always lands in its own bucket → rank 1 cosine = 1
    self_rows = out.where("rank = 1").collect()
    assert all(r.cosine == pytest.approx(1.0, abs=1e-5) for r in self_rows)


def test_ivf_topk_probes_cells(spark):
    emb = _emb(spark, dim=8)
    qs = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = sim.ivf_topk(emb, qs, k=3, n_cells=4, n_probe=4, dim=8)
    # probing ALL cells makes IVF exact: self is rank 1
    top1 = {r.query_id: r.vec_id for r in out.where("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1}


def _clustered_corpus(spark, n=300, dim=16, n_clusters=6, seed=1):
    """Clustered corpus where ANN recall is meaningful: true neighbors are
    cluster-mates, so losing a bucket/cell visibly costs recall."""
    import numpy as np
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3
    pts = centers[rng.integers(0, n_clusters, n)] + \
        rng.standard_normal((n, dim)) * 0.5
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in pts[i]]) for i in range(n)])


def _recall_vs_brute(df, brute_sets):
    got = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    return sum(len(got.get(q, set()) & s) / len(s)
               for q, s in brute_sets.items()) / len(brute_sets)


def _brute_sets(emb, qs, k=10):
    out = {}
    for r in sim.brute_force_topk(emb, qs, k=k).collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_multiprobe_lsh_recall_floor(spark):
    """Multi-probe must beat single-probe AND clear a fixed recall@10 bar —
    the quality gate the single-probe implementation lacked (round-1/2
    finding: boundary neighbors silently lost)."""
    emb = _clustered_corpus(spark).cache()
    qs = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    bf = _brute_sets(emb, qs)
    r1 = _recall_vs_brute(
        sim.hyperplane_lsh_topk(emb, qs, k=10, n_planes=8, dim=16, n_probe=1), bf)
    r4 = _recall_vs_brute(
        sim.hyperplane_lsh_topk(emb, qs, k=10, n_planes=8, dim=16, n_probe=4), bf)
    # deterministic fixture: measured r1≈0.84, r4≈0.91
    assert r4 > r1, f"multi-probe {r4:.3f} must improve over single {r1:.3f}"
    assert r4 >= 0.88, f"multi-probe recall@10 {r4:.3f} below floor"


def test_lsh_n_probe_validation(spark):
    emb = _clustered_corpus(spark, n=10)
    qs = emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError):
        sim.hyperplane_lsh_topk(emb, qs, n_planes=4, dim=16, n_probe=6)
    with pytest.raises(ValueError):
        sim.hyperplane_lsh_topk(emb, qs, n_planes=63, dim=16)


def test_lsh_wide_bucket_no_overflow(spark):
    """n_planes in the 32..62 range packs bucket bits past int32 — the old
    pow(2.0, bit).cast('int') probe-flip overflowed at bit 31 (ADVICE r4).
    With 1L<<bit the multi-probe path must still return ranked rows and
    never produce a negative bucket collision."""
    emb = _clustered_corpus(spark).cache()
    qs = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = sim.hyperplane_lsh_topk(emb, qs, k=5, n_planes=40, dim=16,
                                  n_probe=8)
    rows = out.collect()
    assert len(rows) > 0
    assert {r.query_id for r in rows} <= {0, 1, 2, 3}


def test_ivf_fitted_recall(spark):
    """k-means-fitted centroids must be deterministic from the seed and beat
    the random-centroid fallback's recall (round-1/2 finding: noise
    centroids → unbalanced cells, uncontrolled recall)."""
    emb = _clustered_corpus(spark).cache()
    qs = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    bf = _brute_sets(emb, qs)
    rn = _recall_vs_brute(
        sim.ivf_topk(emb, qs, k=10, n_cells=8, n_probe=2, dim=16, fit_iters=0), bf)
    rf = _recall_vs_brute(
        sim.ivf_topk(emb, qs, k=10, n_cells=8, n_probe=2, dim=16, fit_iters=3), bf)
    assert rf >= rn, f"fitted {rf:.3f} must not lose to noise centroids {rn:.3f}"
    assert rf >= 0.95, f"fitted IVF recall@10 {rf:.3f} below floor"
    c1 = sim.fit_ivf_centroids(emb, n_cells=8, dim=16, iters=2)
    c2 = sim.fit_ivf_centroids(emb, n_cells=8, dim=16, iters=2)
    assert c1 == c2  # bit-deterministic from the seed
    import math
    assert all(abs(math.fsum(x * x for x in c) - 1.0) < 1e-9 for c in c1)


def test_embedding_neardup_recall(spark):
    """Planted near-duplicate corpus: embedding_neardup_pairs must recover
    ≥80% of the true cosine≥0.9 pairs (banded hyperplane LSH recall
    1−(1−p^k)^L ≈ 0.96 at these params) with zero false positives (exact
    verify) — and be deterministic."""
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 16))
    rows = []
    vid = 0
    for b in base:                      # each base vector + 2 near-dups
        for _ in range(3):
            v = b + rng.standard_normal(16) * 0.05
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows).cache()

    # ground truth: exact cosine ≥ 0.9 over all pairs (tiny corpus)
    import itertools
    vecs = {r.vec_id: np.array(r.embedding) for r in rows}
    truth = set()
    for i, j in itertools.combinations(sorted(vecs), 2):
        c = vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
        if c >= 0.9:
            truth.add((i, j))
    assert len(truth) >= 25  # the plant worked

    got = {(r.id_a, r.id_b): r.cosine for r in
           dd.embedding_neardup_pairs(df, threshold=0.9, n_tables=6,
                                      n_planes=8, dim=16).collect()}
    assert set(got) <= truth              # exact verify: no false positives
    recall = len(set(got) & truth) / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} below floor"
    got2 = {(r.id_a, r.id_b): r.cosine for r in
            dd.embedding_neardup_pairs(df, threshold=0.9, n_tables=6,
                                       n_planes=8, dim=16).collect()}
    assert got == got2                    # deterministic from the seed


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The IVF 100 TB story, executed: corpus written partitioned by fitted
    cell id; a search probing n_probe cells must (1) carry the cell
    predicate in PartitionFilters (directory pruning at planning time),
    (2) return exactly what the in-memory ivf_topk returns with the same
    centroids."""
    emb = _clustered_corpus(spark).cache()
    cents = sim.fit_ivf_centroids(emb, n_cells=8, dim=16, iters=2)
    path = str(tmp_path / "ivf_index")
    sim.write_ivf_index(emb, path, cents)

    qs = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = sim.ivf_search_indexed(spark, path, qs, cents, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "cell" in pf  # probe predicate prunes directories, not rows

    expect = {(r.query_id, r.rank): r.vec_id for r in
              sim.ivf_topk(emb, qs, k=5, n_cells=8, n_probe=2, dim=16,
                           centroids=cents).collect()}
    got = {(r.query_id, r.rank): r.vec_id for r in out.collect()}
    assert got == expect


def test_ivf_search_indexed_large_batch_distributed_path(spark, tmp_path):
    """VERDICT r6 #6: past ``collect_threshold`` the indexed search must
    NOT collect the query batch — cells are ranked distributively with the
    shared _probe_frame expression. Both paths must return identical
    (query, rank) → vec_id assignments (argsort tie-break parity), and the
    distributed plan must keep the equi-join (no nested loop)."""
    emb = _clustered_corpus(spark).cache()
    cents = sim.fit_ivf_centroids(emb, n_cells=8, dim=16, iters=2)
    path = str(tmp_path / "ivf_index")
    sim.write_ivf_index(emb, path, cents)

    qs = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding")
    served = sim.ivf_search_indexed(spark, path, qs, cents, k=5, n_probe=2)
    bulk = sim.ivf_search_indexed(spark, path, qs, cents, k=5, n_probe=2,
                                  collect_threshold=4)  # force the big path
    got_served = {(r.query_id, r.rank): r.vec_id for r in served.collect()}
    got_bulk = {(r.query_id, r.rank): r.vec_id for r in bulk.collect()}
    assert got_bulk == got_served and len(got_bulk) == 12 * 5

    plan = bulk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_lazy_plan_has_no_nested_loop(spark):
    """The lazy (materialize=False) variants expose the full logical plan —
    assert the band self-join is a hash join, never a nested loop (the plan
    the eager checkpoint would otherwise hide from audits)."""
    plan = dd.minhash_lsh_pairs(_docs(spark), materialize=False)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_dedup_clusters_chain_and_islands(spark):
    """Min-label propagation finds the component minimum across CHAINED
    pairs — (1,2),(2,3) is one cluster even though (1,3) was never a
    candidate — and a long path (diameter 4) forces multiple propagation
    rounds, so convergence (not round-1 luck) is what's tested."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (13, 14)],
        "id_a long, id_b long")
    got = {r.node: r.label for r in dd.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
                   10: 10, 11: 10, 12: 10, 13: 10, 14: 10}


def test_dedup_clusters_merges_across_keys(spark):
    """Two cliques sharing one member collapse to one component."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 7), (7, 9)], "id_a long, id_b long")
    got = {r.node: r.label for r in dd.dedup_clusters(pairs).collect()}
    assert set(got.values()) == {1}


def test_blocked_pairs_union_and_max_block(spark):
    df = spark.createDataFrame(
        [(1, "aa", "x"), (2, "aa", "y"), (3, "bb", "y"), (4, "bb", "z"),
         (5, "cc", "z")],
        "doc_id long, k1 string, k2 string")
    got = {(r.id_a, r.id_b) for r in
           dd.blocked_pairs(df, [F.col("k1"), F.col("k2")],
                            id_col="doc_id").collect()}
    # k1 blocks: {1,2}, {3,4}; k2 blocks: {2,3}, {4,5} — union, id_a < id_b
    assert got == {(1, 2), (3, 4), (2, 3), (4, 5)}
    # max_block=1 drops every block (all have 2 members) for k1; k2 likewise
    assert dd.blocked_pairs(df, [F.col("k1")], id_col="doc_id",
                            max_block=1).count() == 0
    # null keys never pair
    dfn = spark.createDataFrame([(1, None), (2, None), (3, "a"), (4, "a")],
                                "doc_id long, k string")
    got_n = {(r.id_a, r.id_b) for r in
             dd.blocked_pairs(dfn, [F.col("k")], id_col="doc_id").collect()}
    assert got_n == {(3, 4)}


def test_fuzzy_blocked_match_distances(spark):
    df = spark.createDataFrame(
        [(1, "kitten", "b1"), (2, "sitting", "b1"), (3, "kitchen", "b1"),
         (4, "kitten", "b2")],  # same name, different block: never compared
        "pk long, name string, blk string")
    out = dd.fuzzy_blocked_match(df, "name", [F.col("blk")], id_col="pk",
                                 max_dist=3)
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    # sitting→kitchen is distance 4 > max_dist, so (2,3) is verified away
    assert got == {(1, 2): 3, (1, 3): 2}
    assert all(r.name_a is not None for r in out.collect())


def test_dedup_clusters_raises_on_nonconvergence(spark):
    """A 26-node chain has diameter 25: an exhausted iteration budget must
    RAISE, not return a component silently split into ~max_iter labels."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(25)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.dedup_clusters(chain, max_iter=5)
    # enough budget: one component labeled by its minimum
    got = {r.label for r in dd.dedup_clusters(chain, max_iter=30).collect()}
    assert got == {0}


def test_blocked_pairs_empty_keys_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, k string")
    with pytest.raises(ValueError, match="blocking key"):
        dd.blocked_pairs(df, [], id_col="doc_id")


def test_ivf_search_indexed_derives_probe_schema(spark, tmp_path):
    """String query ids and array<double> query vectors must survive the
    probe frame round-trip — a hardcoded 'long, array<float>' schema would
    crash on the former and silently narrow the latter."""
    emb = _clustered_corpus(spark, n=60).cache()
    cents = sim.fit_ivf_centroids(emb, n_cells=4, dim=16, iters=1)
    path = str(tmp_path / "ivf_idx_str")
    sim.write_ivf_index(emb, path, cents)
    qs = emb.where(F.col("vec_id") < 3).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("query_id"), "embedding")
    out = sim.ivf_search_indexed(spark, path, qs, cents, k=3, n_probe=2)
    rows = out.collect()
    assert {r.query_id for r in rows} == {"q0", "q1", "q2"}
    assert dict(out.dtypes)["query_id"] == "string"
    # self is rank 1 in its own probed cell with exact (un-narrowed) vectors
    self_hits = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert self_hits == {"q0": 0, "q1": 1, "q2": 2}


def test_redact_pii_crafted_and_cross_engine(spark):
    """The fixture corpus has no real PII, so the parity sweep alone never
    exercises a replacement — this test feeds crafted strings through BOTH
    engines' pipelines (Spark redact_pii/pii_counts vs the q73 oracle's
    DuckDB SQL applied to the same rows) and checks the actual scrubbing."""
    import duckdb

    from powerdatapipeline_spark.queries import REGISTRY

    rows = [
        (1, "contact me at alice.smith+x@example.co.uk or visit "
            "https://example.com/a?b=c#d thanks"),
        (2, "server at 10.0.0.1 and 192.168.254.3, not 1234.5.6.7890"),
        (3, "mixed: http://u:p@host/path then bob@site.org after"),
        (4, "clean document with no identifiers at all"),
        (5, "trailing url http://x.io"),
        # \x0B (vertical tab): Java \s matches it, RE2 \s does not — the
        # PII rules spell the whitespace class explicitly so both engines
        # stop the URL match at the same byte (ADVICE r5)
        (6, "vt-adjacent http://a.b/c\x0bxyz and 1.2.3.4\x0btail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (df.select("doc_id", *tx.pii_counts("text"),
                     tx.redact_pii("text").alias("clean_text"))
           .orderBy("doc_id").collect())
    # hand-checked expectations
    assert [r.n_url for r in got] == [1, 0, 1, 0, 1, 1]
    assert [r.n_email for r in got] == [1, 0, 1, 0, 0, 0]
    # row 2: 1234.5.6.7890 must NOT match (\b + 1-3 digit octets)
    assert [r.n_ipv4 for r in got] == [0, 2, 0, 0, 0, 1]
    assert "<EMAIL>" in got[0].clean_text and "<URL>" in got[0].clean_text
    assert "alice" not in got[0].clean_text
    assert got[1].clean_text.count("<IP>") == 2
    assert "1234.5.6.7890" in got[1].clean_text
    assert got[3].clean_text == rows[3][1]
    # row 6: the URL match must stop AT the vertical tab in both engines
    assert got[5].clean_text == "vt-adjacent <URL>\x0bxyz and <IP>\x0btail"
    # cross-engine: run the registered oracle SQL on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = REGISTRY["q73_redact_pii"][1]
    want = {r[0]: r for r in con.execute(oracle).fetchall()}
    for r in got:
        o = want[r.doc_id]
        assert (r.n_url, r.n_email, r.n_ipv4, r.clean_text) == o[1:], r.doc_id


def test_repetition_stats_crafted_and_cross_engine(spark):
    """Fixture docs are single-line with little repetition, so the parity
    sweep never exercises the interesting branches — crafted docs cover
    duplicate lines, a dominant bigram, short docs, and the empty-bigram
    guard, checked against the q74 oracle SQL on the same rows."""
    import duckdb

    from powerdatapipeline_spark.queries import REGISTRY

    rows = [
        (1, "buy now\nbuy now\nbuy now\nlimited offer"),   # 3 dup lines of 4
        (2, "click here click here click here click here"),  # dominant bigram
        (3, "word"),                                         # <2 tokens
        (4, "a normal sentence with all distinct word pairs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.repetition_stats(df).collect()}
    assert got[1].n_lines == 4 and got[1].dup_line_frac == 0.5
    # doc 2: bigrams = [click here, here click] * — "click here" 4 of 7
    assert got[2].top_bigram_frac == round(4 / 7, 6)
    assert got[3].top_bigram_frac == 0.0 and got[3].n_lines == 1
    assert got[4].top_bigram_frac == round(1 / 7, 6)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: r for r in
            con.execute(REGISTRY["q74_repetition_stats"][1]).fetchall()}
    for did, r in got.items():
        assert (r.n_lines, r.dup_line_frac, r.top_bigram_frac) == want[did][1:], did


def test_contamination_report_crafted(spark):
    """Hand-checked n-gram collision: train doc 10 copies a benchmark
    phrase verbatim (one shared 3-gram window of 4 tokens -> two distinct
    3-grams), doc 11 shares nothing."""
    bench = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta")])
    train = spark.createDataFrame([
        Row(doc_id=10, text="xx alpha beta gamma delta yy"),
        Row(doc_id=11, text="totally disjoint words here"),
    ])
    out = {r.doc_id: r for r in
           tx.contamination_report(train, bench, n=3).collect()}
    assert set(out) == {10}
    # bench 3-grams: {alpha beta gamma, beta gamma delta}; doc 10 has both
    assert out[10].n_colliding_ngrams == 2
    assert out[10].n_bench_docs == 1


def test_contamination_short_docs_no_ngrams(spark):
    """Docs shorter than n produce no shingles and can never collide."""
    bench = spark.createDataFrame([Row(doc_id=1, text="a b")])
    train = spark.createDataFrame([Row(doc_id=2, text="a b")])
    assert tx.contamination_report(train, bench, n=3).count() == 0


def test_chunk_documents_values(spark):
    """10 tokens, chunk=4, overlap=2 (stride 2): chunks start at token
    1,3,5,7 -> ceil((10-4)/2)+1 = 4 chunks; the last is full (tokens
    7-10)."""
    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    rows = sorted(tx.chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t2 t3 t4 t5"
    assert rows[3].chunk_text == "t6 t7 t8 t9"
    assert all(r.n_tokens == 4 for r in rows)


def test_chunk_documents_short_and_ragged(spark):
    """A short doc yields ONE whole-doc chunk; a ragged doc's final chunk
    is partial."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="one two"),
        Row(doc_id=2, text="a b c d e"),  # chunk=4, stride 2 -> chunks 0,1
    ])
    rows = {(r.doc_id, r.chunk_id): r for r in
            tx.chunk_documents(df, chunk_tokens=4, overlap=2).collect()}
    assert rows[(1, 0)].chunk_text == "one two"
    assert rows[(1, 0)].n_tokens == 2
    assert rows[(2, 1)].chunk_text == "c d e"  # partial tail chunk
    assert len([k for k in rows if k[0] == 2]) == 2
    with pytest.raises(ValueError, match="overlap"):
        tx.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_tfidf_top_terms_values(spark):
    """3 docs, hand-computed scores: 'rare' appears only in doc 1 (idf
    ln(3/1)), 'common' in all (idf ln(1)=0 -> score 0 regardless of tf)."""
    import math

    df = spark.createDataFrame([
        Row(doc_id=1, text="rare common common"),
        Row(doc_id=2, text="common filler words"),
        Row(doc_id=3, text="common other tokens"),
    ])
    out = {(r.doc_id, r.term): r for r in
           tx.tfidf_top_terms(df, k=3).collect()}
    r = out[(1, "rare")]
    assert r.tf == 1 and r.doc_freq == 1
    assert r.score == pytest.approx(round(1 * round(math.log(3.0), 6), 6))
    assert out[(1, "common")].score == 0.0  # idf of an everywhere-term
    # rank is a total order: score desc then term asc
    doc1 = sorted((r for (d, _), r in out.items() if d == 1),
                  key=lambda r: r.rank)
    assert [r.term for r in doc1] == ["rare", "common"]


def test_decontaminate_drops_only_contaminated(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta")])
    train = spark.createDataFrame([
        Row(doc_id=10, text="xx alpha beta gamma delta yy"),
        Row(doc_id=11, text="totally disjoint words here"),
        Row(doc_id=12, text="more clean unrelated content"),
    ])
    kept = {r.doc_id for r in
            tx.decontaminate(train, bench, n=3).collect()}
    assert kept == {11, 12}
    # min_hits above the collision count keeps everything
    kept_all = {r.doc_id for r in
                tx.decontaminate(train, bench, n=3, min_hits=5).collect()}
    assert kept_all == {10, 11, 12}


def test_unigram_logprob_hand_computed(spark):
    """Corpus: 4 tokens total — 'a' x3 (p=3/4), 'z' x1 (p=1/4). Doc 1 =
    'a a a' -> H = -ln(3/4); doc 2 = 'z' -> H = -ln(1/4) (rarer -> higher
    surprise)."""
    import math

    df = spark.createDataFrame([
        Row(doc_id=1, text="a a a"),
        Row(doc_id=2, text="z"),
    ])
    out = {r.doc_id: r for r in tx.unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert out[1].avg_neg_logprob == pytest.approx(
        round(-round(math.log(3 / 4), 6), 6))
    assert out[2].avg_neg_logprob == pytest.approx(
        round(-round(math.log(1 / 4), 6), 6))
    assert out[2].avg_neg_logprob > out[1].avg_neg_logprob


@pytest.mark.parametrize("n_tok", [0, 1, 3, 4, 5, 6, 8, 9, 23])
def test_chunk_documents_reconstruction_property(spark, n_tok):
    """Lossless-coverage invariant at the boundary lengths where
    off-by-ones hide (len < chunk, == chunk, == chunk+1, == chunk+stride,
    ragged tail): chunk 0 plus every later chunk minus its overlap prefix
    reconstructs the exact token sequence."""
    chunk, overlap = 4, 2
    stride = chunk - overlap
    toks = [f"w{i}" for i in range(n_tok)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks) or " ")])
    rows = sorted(tx.chunk_documents(df, chunk_tokens=chunk,
                                     overlap=overlap).collect(),
                  key=lambda r: r.chunk_id)
    rebuilt = []
    for r in rows:
        ct = r.chunk_text.split(" ") if r.chunk_text else []
        rebuilt.extend(ct if r.chunk_id == 0 else ct[overlap:])
        assert r.n_tokens == len(ct)
        assert r.n_tokens <= chunk
    assert rebuilt == toks
    # every chunk except possibly the last is full when the doc overflows
    if n_tok > chunk:
        assert all(r.n_tokens == chunk for r in rows[:-1])


def test_bm25_topk_hand_computed(spark):
    """3-doc corpus, query {cat}: doc 1 has tf=2 and is shortest, doc 2
    tf=1, doc 3 no hit. Hand-compute BM25 (k1=1.2, b=0.75) and check
    ordering + exact rounded scores."""
    import math

    df = spark.createDataFrame([
        Row(doc_id=1, text="cat cat"),
        Row(doc_id=2, text="cat dog bird fish"),
        Row(doc_id=3, text="dog dog dog"),
    ])
    out = tx.bm25_topk(df, ["cat"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # no doc 3 (no hit)
    n, avgdl = 3, 3.0  # lengths 2, 4, 3
    idf = round(math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5)), 6)

    def s(tf, dl):
        return round(idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)

    by_id = {r.doc_id: r for r in out}
    assert by_id[1].score == pytest.approx(round(s(2, 2), 6))
    assert by_id[2].score == pytest.approx(round(s(1, 4), 6))
    assert by_id[1].n_query_terms_hit == 1
    # multi-term query accumulates per-term scores
    multi = {r.doc_id: r for r in
             tx.bm25_topk(df, ["cat", "dog"], k=10).collect()}
    assert multi[2].n_query_terms_hit == 2
    assert multi[3].n_query_terms_hit == 1


def test_contamination_plan_broadcasts_bench_side(spark, sf_dir):
    """Scale-shape proof for the curation joins: the contamination check
    must be a BroadcastHashJoin (bench side broadcast — the corpus never
    shuffles for the probe) and decontaminate a broadcast ANTI join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    plan = (tx.contamination_report(train, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    anti = (tx.decontaminate(train, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in anti and "LeftAnti" in anti


def test_bm25_single_index_pass_and_topk_plan(spark, sf_dir):
    """The corpus is scanned ONCE into the persisted (doc, term) index —
    scoring filters that index to the query terms (isin present in the
    optimized plan) and the top-k rides TakeOrderedAndProject, never a
    full materialized sort. materialize=False exposes the logical plan
    (the materialized default returns a checkpointed result)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tx.bm25_topk(docs, ["spark", "join"], k=5, materialize=False)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("IN (spark,join)") >= 1  # index filtered to terms
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert phys.count("InMemoryTableScan") >= 2  # index reused, not re-scanned


def test_incremental_dedup_crafted(spark):
    """Batch: an internal dup pair, a corpus dup, and a fresh doc — only
    the fresh doc and one representative of the internal pair survive."""
    seen = spark.createDataFrame([
        Row(doc_id=1, text="already ingested document"),
        Row(doc_id=2, text="another known document"),
    ])
    new = spark.createDataFrame([
        Row(doc_id=10, text="Already  INGESTED document"),  # dup of corpus (normalized)
        Row(doc_id=11, text="brand new content"),
        Row(doc_id=12, text="repeated in batch"),
        Row(doc_id=13, text="repeated  in batch"),          # dup within batch
    ])
    out = {r.doc_id: r.n_copies_in_batch for r in
           dd.incremental_dedup(new, seen).collect()}
    assert out == {11: 1, 12: 2}  # corpus dup dropped; min-id rep kept


def test_random_projection_preserves_pairwise_distances(spark):
    """JL sanity on real embeddings: at k=16 the per-pair distance ratio
    has std ≈ √(2/k) ≈ 0.35, so individual pairs tail past ±75% — the
    lemma's testable face here is the AGGREGATE: mean ratio ≈ 1 and the
    bulk of pairs inside a generous band (deterministic for this fixed
    seed + fixture), plus bit-determinism across calls."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .where(F.col("vec_id") < 30)
    rows = {r.vec_id: (np.array(r.embedding, dtype=float),
                       np.array(r.proj, dtype=float))
            for r in sim.random_projection(emb, out_dim=16).collect()}
    assert all(len(p) == 16 for _, p in rows.values())
    ids = sorted(rows)
    ratios = []
    for a, b in zip(ids[:-1], ids[1:]):
        d_orig = float(np.sum((rows[a][0] - rows[b][0]) ** 2))
        d_proj = float(np.sum((rows[a][1] - rows[b][1]) ** 2))
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    assert ratios
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.7 <= mean_ratio <= 1.3, mean_ratio
    in_band = sum(1 for r in ratios if 0.3 <= r <= 2.2) / len(ratios)
    assert in_band >= 0.8, (in_band, sorted(ratios))
    again = {r.vec_id: tuple(r.proj) for r in
             sim.random_projection(emb, out_dim=16).collect()}
    assert again == {k: tuple(p) for k, (_, p) in rows.items()}


# ------------------------------------------------ SemDeDup (round 8)

def test_semdedup_drops_planted_semantic_dup_keeps_farthest(spark):
    """Two near-identical vectors in the same cell: the one CLOSER to the
    centroid drops, the farther (least prototypical) one survives —
    Abbas et al.'s keep rule. An unrelated orthogonal vector is
    untouched, and a near-dup of the centroid itself survives only as
    the farthest member of its pair."""
    import math
    c0 = [1.0] + [0.0] * 7          # centroid A
    c1 = [0.0, 1.0] + [0.0] * 6     # centroid B
    # v10/v11: same direction, v11 slightly farther from c0
    v10 = [0.9, 0.1] + [0.0] * 6
    v11 = [0.88, 0.14] + [0.0] * 6
    v20 = [0.0, 0.0, 1.0] + [0.0] * 5   # alone in whatever cell it lands
    rows = [(0, c0), (1, c1), (10, v10), (11, v11), (20, v20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame([(0, c0), (1, c1)],
                                  "centroid_id long, cvec array<double>")
    out = {r["vec_id"]: r for r in
           dd.semdedup(emb, cents, tau=0.95).collect()}
    assert len(out) == 5                      # every row present with a flag
    # v10 and v11 are semantic dups (cos ~0.998) in cell 0; v11 has the
    # lower centroid similarity -> v11 kept, v10 dropped
    assert out[10]["cell_id"] == 0 and out[11]["cell_id"] == 0
    assert out[11]["cent_sim"] < out[10]["cent_sim"]
    assert out[11]["is_kept"] and not out[10]["is_kept"]
    # the orthogonal vector has no >=tau neighbor -> kept
    assert out[20]["is_kept"]
    # centroid vectors themselves: c0 is a dup pair with v10/v11? cos(c0,
    # v10) = 0.9/|v10| ~ 0.993 >= 0.95 -> c0 is in the dup group too; the
    # keep rule still keeps exactly the farthest member overall
    kept_cell0 = [i for i in (0, 10, 11) if out[i]["is_kept"]]
    assert kept_cell0 == [11]


def test_semdedup_tau_one_keeps_everything_except_exact_dups(spark):
    vecs = [(i, [float(i + 1), 1.0, 0.0]) for i in range(4)]
    vecs.append((9, [2.0, 1.0, 0.0]))  # exact same direction as vec_id=1
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                                  "centroid_id long, cvec array<double>")
    out = {r["vec_id"]: r["is_kept"] for r in
           dd.semdedup(emb, cents, tau=1.0).collect()}
    # cos(v1, v9) = 1.0 exactly (same direction); same cent_sim, so the
    # id tie-break keeps the SMALLER id
    assert out[1] and not out[9]
    assert all(out[i] for i in (0, 2, 3))


def test_semdedup_rejects_swapped_centroid_frame(spark):
    emb = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    swapped = spark.createDataFrame([([1.0, 0.0], 0)],
                                    "cvec array<double>, centroid_id long")
    with pytest.raises(ValueError, match="centroid_id, vector"):
        dd.semdedup(emb, swapped)


def test_derive_n_planes_rule():
    """The occupancy-constant sizing rule (VERDICT r14 #1): smallest k
    with 2^k * 8 >= n, clamped to [4, 24] — pinned against the round-14
    probe's measured-good ladder and its DuckDB integer twin."""
    import duckdb

    # measured ladder from SCALE.md "ANN-family ×100 probe": 8 bits at
    # n=2000 (x1), 15 bits at n=200000 (x100)
    assert dd.derive_n_planes(2000) == 8
    assert dd.derive_n_planes(200_000) == 15
    # test-fixture corpora: 500 vectors at sf0.001/sf0.01 -> 6 bits
    assert dd.derive_n_planes(500) == 6
    # clamps: tiny corpora floor at 4 bits, huge ones cap at 24
    assert dd.derive_n_planes(0) == 4
    assert dd.derive_n_planes(1) == 4
    assert dd.derive_n_planes(10**12) == 24
    # exact powers of two around the boundary (the reason the rule is
    # integer-exact, not ceil(log2(float))): n = 8 * 2^k is exactly k
    for k in range(4, 25):
        assert dd.derive_n_planes(8 * 2**k) == min(k, 24)
        assert dd.derive_n_planes(8 * 2**k + 1) == min(k + 1, 24)
    # DuckDB twin (the q60 oracle's nb CTE) computes the identical k
    for n in [0, 1, 7, 8, 9, 63, 64, 65, 500, 2000, 2048, 2049,
              20_000, 200_000, 10**9]:
        got = duckdb.sql(
            f"SELECT GREATEST(4, LEAST(24, CASE WHEN m <= 1 THEN 0 "
            f"ELSE length(bin(m - 1)) END)) AS k FROM "
            f"(SELECT CAST(({n} + 7) // 8 AS BIGINT) AS m)").fetchone()[0]
        assert got == dd.derive_n_planes(max(n, 1)), n


def test_embedding_neardup_default_planes_prefix_stable(spark):
    """n_planes=None derives the width from the corpus, and the derived
    run is IDENTICAL to the same-width explicit run (prefix-stable plane
    draw) — the property the adaptive oracle depends on."""
    import numpy as np
    rng = np.random.default_rng(11)
    rows = [Row(vec_id=i, embedding=[float(x) for x in rng.standard_normal(16)])
            for i in range(40)]  # 40 vectors -> ceil(40/8)=5 -> 3 bits -> clamp 4
    df = spark.createDataFrame(rows).cache()
    derived = {(r.id_a, r.id_b): r.cosine for r in
               dd.embedding_neardup_pairs(df, threshold=0.0, n_tables=2,
                                          dim=16).collect()}
    explicit = {(r.id_a, r.id_b): r.cosine for r in
                dd.embedding_neardup_pairs(df, threshold=0.0, n_tables=2,
                                           n_planes=4, dim=16).collect()}
    assert derived == explicit and derived
