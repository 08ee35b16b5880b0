"""Text analysis operators for training-data pipelines (BASELINE.json north
star; SURVEY.md §2.12): tokenization, quality scoring, language-ID heuristic,
document fingerprinting. All built-in string/array functions — JVM-side, no
Python in the data path, so a 100 TB document scan stays in whole-stage
codegen with the regexes compiled once per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small, fixed English stopword list used by the quality/lang-ID heuristics.
# Deliberately tiny and embedded in the plan as literals (broadcast-free).
STOPWORDS = (
    "the a an and or of to in is are was were be been it that this with as "
    "for on at by from not but".split()
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Whitespace class with identical Java-regex (Spark) and RE2 (DuckDB)
#: semantics. Java's ``\s`` is exactly ``[ \t\n\x0B\f\r]`` but RE2's
#: excludes vertical tab, so every tokenizer/normalizer that pairs with a
#: DuckDB oracle spells the class out — same fix as the PII rules
#: (ADVICE r5). This class == Java ``\s`` exactly, so Spark-side behavior
#: (and every recorded hash) is unchanged.
WS_CLASS = r"[ \t\n\r\f\x0B]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of lowercased text; empty strings dropped.
    The BPE-ish regex variant is :func:`regex_tokens`."""
    return F.filter(F.split(F.lower(_c(col)), WS_CLASS + "+"),
                    lambda t: t != "")


def regex_tokens(col: str | Column) -> Column:
    """BPE-ish tokenizer: word pieces = runs of letters, digits, or a single
    non-space symbol (approximates byte-pair pre-tokenization)."""
    return F.filter(
        F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


#: BPE-style pre-tokenization classes (GPT-2's pattern minus lookaheads,
#: which RE2 engines reject): letter runs, digit runs, single symbols.
BPE_PIECE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f\x0B]"


def bpe_pieces(col: str | Column) -> Column:
    """BPE-ish word pieces: the pre-tokenization split every byte-pair
    tokenizer starts from (letters / digits / individual symbols, cased
    down). Piece COUNT approximates LLM token count far better than
    whitespace words on punctuation-heavy text."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_PIECE_RE), F.lit(0))


def bpe_piece_count(col: str | Column) -> Column:
    return F.size(bpe_pieces(col))


def rolling_fingerprint(col: str | Column, base: int = 131,
                        mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash (Rabin–Karp) of the normalized text:
    ``fp = Σ code(c_i)·base^(n-i) mod p``, folded left-to-right so every
    engine computes the identical value (the mod keeps intermediates under
    2^37 — safe for ANSI long arithmetic, no overflow). Unlike the md5
    :func:`fingerprint` this hash is *incrementally updatable* (append a
    char = one multiply-add), the property streaming/windowed fingerprint
    maintenance needs.

    The char codes come from ``split(norm, '')`` — ONE evaluation of the
    normalization chain as the HOF's argument. The previous
    ``substr(norm, i, 1)``-inside-a-lambda form re-ran the regex
    normalization once per character, O(L²) per document (the
    higher-order-function re-evaluation trap; see word_ngrams)."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), WS_CLASS + "+", " "))
    codes = F.transform(F.split(norm, ""),
                        lambda ch: F.ascii(ch).cast("long"))
    # ascii('') = 0 (the empty-text split artifact) — a 0 code is the
    # fold's no-op only when the accumulator is 0, i.e. empty text keeps
    # fp = 0 exactly as before
    return F.aggregate(codes, F.lit(0).cast("long"),
                       lambda acc, x: (acc * base + x) % mod)


def _shifted_grams(arr: Column, count: Column, n: int, sep: str) -> Column:
    """n-grams over ``arr`` in LINEAR time: the gram at position i is
    built by zip_with-chaining ``arr`` with its k-shifted copies — every
    reference to the source array is a HOF *argument* (evaluated once per
    row), never a subexpression inside a lambda body. The previous
    ``slice(arr, i+1, n)``-inside-``transform`` form re-evaluated the
    whole array expression once per gram: measured 70× slower (19.8 s vs
    0.3 s) at 8k tokens and growing quadratically — fatal on real
    long-document corpora even though the short-doc fixture hid it.
    ``count`` = number of full grams (may be ≤ 0 → empty)."""
    g = arr
    for k in range(1, n):
        shifted = F.slice(arr, k + 1, F.greatest(F.size(arr) - k, F.lit(0)))
        # zip_with pads the shorter (shifted) side with NULL; the partial
        # tail grams that produces are cut by the count slice below
        g = F.zip_with(g, shifted,
                       lambda a, b: F.concat_ws(sep, a, b))
    return F.when(count > 0, F.slice(g, 1, count)) \
            .otherwise(F.array().cast("array<string>"))


def char_ngrams(col: str | Column, n: int = 3) -> Column:
    """Character n-gram shingles (for Jaccard/MinHash): substrings of
    length ``n`` over the lowercased text, distinct. Built from the
    char-split array via :func:`_shifted_grams` (linear, not the
    quadratic substring-per-lambda form); short strings yield an empty
    array explicitly."""
    c = F.lower(_c(col))
    return F.array_distinct(
        _shifted_grams(F.split(c, ""), F.length(c) - (n - 1), n, ""))


def word_ngrams(col: str | Column, n: int = 2) -> Column:
    """Distinct n-word shingles via :func:`_shifted_grams` (same
    short-input guard as char_ngrams, same linear-cost construction)."""
    t = tokens(col)
    return F.array_distinct(
        _shifted_grams(t, F.size(t) - (n - 1), n, " "))


def stopword_ratio(col: str | Column) -> Column:
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, n_sw / F.size(t)).otherwise(F.lit(0.0))


def _quality_exprs(text_col: str | Column):
    """The shared C4/Gopher feature expressions — ONE definition consumed
    by both :func:`quality_score` and the funnel rules
    (:func:`_funnel_rules`), so the two documented-as-one rule families
    cannot silently diverge: (n_tokens, n_chars, mean_word_len,
    punct_ratio)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    n_chars = F.length(_c(text_col))
    mean_word_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok)
    punct = F.length(F.regexp_replace(_c(text_col), r"[^.,;:!?]", ""))
    punct_ratio = F.when(n_chars > 0,
                         punct.cast("double") / n_chars).otherwise(0.0)
    return n_tok, n_chars, mean_word_len, punct_ratio


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features (length, mean word length,
    punctuation density, stopword ratio) + a composite score in [0, 1].
    Mirrors common LLM-corpus quality filters (C4/Gopher-style rules)."""
    n_tok, n_chars, mean_word_len, punct_ratio = _quality_exprs(text_col)
    sw_ratio = stopword_ratio(text_col)
    score = (
        F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(sw_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def langid_heuristic(col: str | Column) -> Column:
    """N-gram/stopword language-ID heuristic: classify as 'en' when the
    English stopword ratio clears a threshold, else 'other'. (A real system
    scores several stopword lists; the testdata corpus is synthetic-English,
    so one list demonstrates the operator shape.)"""
    return F.when(stopword_ratio(col) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed) text. Engine-portable (md5 is
    identical in Spark/DuckDB/anything), so exact-dup detection can be
    verified across systems."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), WS_CLASS + "+", " "))
    return F.md5(norm)


def shingles(col: str | Column, n: int = 3, unit: str = "word") -> Column:
    """Distinct shingles for near-dup detection.

    ``unit='word'`` (default) = n-word sequences — the standard choice for
    text dedup (Gopher/RefinedWeb-style pipelines use word 5-grams): on a
    natural or small-vocabulary corpus, character n-grams of any two long
    documents overlap almost completely (every doc contains most of the
    trigram universe), which drives MinHash-LSH candidate pairs to O(n²).
    Word shingles keep random-pair Jaccard near zero so candidates scale
    with true duplicate density. ``unit='char'`` remains for short strings.
    """
    return word_ngrams(col, n) if unit == "word" else char_ngrams(col, n)


#: modulus for the double-hashing permutation family: 2^31 − 1 (prime);
#: every intermediate stays far inside BIGINT range in any engine
MINHASH_PRIME = 2147483647


def minhash_signature(col: str | Column, num_perm: int = 16, shingle_n: int = 3,
                      shingle_unit: str = "char") -> Column:
    """MinHash signature over shingles via Kirsch–Mitzenmacher double
    hashing: each shingle is md5-hashed ONCE, split into two 32-bit halves
    ``(h1, h2)``, and permutation ``i`` is ``(h1 + i·h2) mod (2^31−1)`` —
    a valid MinHash family (K–M 2006 shows two independent hashes generate
    the whole linear family) at 1/``num_perm`` of the hash cost of salting
    md5 per permutation (measured 4.3 s → sub-second for the signature pass
    at sf0.1). Pure integer arithmetic after the single md5, so the
    signature stays bit-for-bit portable to the DuckDB oracle.

    Shape: the min-update runs as ONE ``aggregate`` pass over the hashed
    shingle array (accumulator = the ``num_perm`` running minima), so the
    md5 subtree is referenced exactly once — ``num_perm`` independent
    ``array_min`` subtrees would re-hash the document per permutation.
    Empty shingle sets yield ``MINHASH_PRIME`` in every slot (the
    identity of ``least``), never NULL.

    Cost: per-row array work only — no shuffle; at 100 TB the signature
    computation is embarrassingly parallel.
    """
    sh = shingles(col, shingle_n, shingle_unit)
    h12 = F.transform(
        F.transform(sh, lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h2")))
    idx = F.sequence(F.lit(0), F.lit(num_perm - 1))
    return F.aggregate(
        h12,
        F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_perm),
        lambda acc, st: F.zip_with(
            acc, idx,
            lambda m, i: F.least(m, (st["h1"] + i.cast("long") * st["h2"])
                                 % F.lit(MINHASH_PRIME))))


def simhash64(col: str | Column, shingle_n: int = 3,
              hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash over character shingles.

    Classic construction: each shingle hashes to 64 bits; each bit
    position accumulates +1/-1 across shingles; the sign vector is the
    fingerprint. Expressed with higher-order array functions (shiftright /
    bitwise-and per bit) — JVM-side, no UDF.

    ``hash_fn``: ``"xxhash64"`` (default — the fast JVM intrinsic, right
    for the 100 TB hot path) or ``"portable60"`` (60 bits from the md5
    hex prefix — slower, but reproducible in any engine with md5, which
    is what lets q33's DuckDB oracle replay the whole pipeline; the top 4
    fingerprint bits are then always 0, which only widens one LSH slice's
    collision rate). The CONSTRUCTION (votes, slices, Hamming) is
    identical for either hash.
    """
    if hash_fn not in ("xxhash64", "portable60"):
        raise ValueError(f"unknown simhash hash_fn {hash_fn!r}")
    sh = char_ngrams(col, shingle_n)
    if hash_fn == "xxhash64":
        h = F.transform(sh, lambda s: F.xxhash64(s))
    else:
        h = F.transform(sh, lambda s: F.conv(
            F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    bits_idx = F.sequence(F.lit(0), F.lit(63))
    # ONE pass over the hash array: the accumulator is the 64-counter vote
    # vector, the bit index is a lambda variable — so shingling/hashing is
    # evaluated once per row, not once per bit (64 independent aggregate
    # subtrees re-tokenized the document 64×). call_function("shiftright")
    # because F.shiftright only accepts a Python int for the bit count.
    votes = F.aggregate(
        h, F.array_repeat(F.lit(0), 64),
        lambda acc, x: F.zip_with(
            acc, bits_idx,
            lambda a, b: a + F.when(
                F.call_function("shiftright", x, b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1))))
    # sign vector → 64-bit fingerprint; shiftleft(1L, 63) wraps to
    # Long.MIN_VALUE in two's complement (a Python 1 << 63 literal would
    # overflow LongType), OR-folded in one aggregate.
    bit_vals = F.zip_with(
        votes, bits_idx,
        lambda v, b: F.when(v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), b))
                      .otherwise(F.lit(0).cast("long")))
    return F.aggregate(bit_vals, F.lit(0).cast("long"),
                       lambda acc, x: acc.bitwiseOR(x))


# ---------------------------------------------------------------------------
# PII redaction (training-data curation: scrub contact/identifier strings
# before a corpus ships to training). Patterns deliberately use only regex
# constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB) — char classes, bounded repetition, alternation, \b — so the
# operator is oracle-verifiable engine-to-engine.
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) in APPLICATION ORDER — URLs first so an
#: email-shaped userinfo inside a URL is consumed by the URL rule, not
#: half-redacted by the email rule. The whitespace class is spelled out
#: rather than written `\s` because Java's `\s` matches vertical tab
#: (\x0B) while RE2's does not — the explicit class keeps Spark and the
#: DuckDB oracle byte-identical even on documents containing \x0B.
PII_RULES = (
    ("url", r"https?://[^ \t\n\r\f\x0B]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(col: str | Column) -> Column:
    """Scrub URLs, emails, and IPv4 literals to typed placeholder tokens.
    One chained ``regexp_replace`` per rule — codegen'd, no Python, scales
    as a narrow map over a 100 TB corpus."""
    out = _c(col)
    for _name, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: str | Column) -> list[Column]:
    """Per-rule match counts (aliased ``n_<rule>``) — the audit side of
    :func:`redact_pii`: counts are computed on the ORIGINAL text with the
    same patterns, so redact+count is one pass, two expressions."""
    cols = []
    text = _c(col)
    for name, pat, _repl in PII_RULES:
        cols.append(F.size(F.regexp_extract_all(text, F.lit(pat), 0))
                    .alias(f"n_{name}"))
    return cols


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    duplicate lines and the share of all word-bigrams taken by the single
    most frequent bigram — the two workhorse filters for boilerplate and
    template spam in LLM corpus curation (Rae et al. 2021 §A1.3).

    Line stats are a narrow map (array ops per row). Bigram stats are
    explode → two grouped aggregations keyed by (id, bigram) then id —
    map-side combine on both, shuffle volume bounded by distinct bigrams
    per doc, never corpus-global state. Short docs (<2 tokens) keep
    top_bigram_frac = 0 via the left join + coalesce."""
    lines = F.split(_c(text_col), "\n")
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    base = df.select(F.col(id_col), F.round(dup_frac, 6).alias("dup_line_frac"),
                     n_lines.cast("int").alias("n_lines"), tokens(text_col).alias("__t"))
    t = F.col("__t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.concat_ws(" ", F.element_at(t, i),
                                          F.element_at(t, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bg = (base.select(id_col, F.explode(bigrams).alias("bg"))
          .groupBy(id_col, "bg").count()
          .groupBy(id_col)
          .agg((F.max("count").cast("double") / F.sum("count"))
               .alias("__frac")))
    return (base.drop("__t").join(bg, id_col, "left")
            .select(id_col, "n_lines", "dup_line_frac",
                    F.round(F.coalesce(F.col("__frac"), F.lit(0.0)), 6)
                    .alias("top_bigram_frac")))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a small-file source up to the session's default
    parallelism before per-row-expensive work (shingling, hashing) — a
    single-split corpus otherwise runs the whole expression pipeline in
    ONE task (measured 3.5 s → 0.9 s for contamination at sf0.1; the
    dedup/similarity operators import this same helper). No-op when the
    input is already wide, as a 100 TB scan is. Delegates to
    ``relational.widen_narrow_scan`` (round 12), the shared keyed
    generalization — one implementation, one set of AQE caveats."""
    from powerdatapipeline_spark.operators.relational import \
        widen_narrow_scan

    return widen_narrow_scan(df)


def _term_index(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The persisted (doc, term) count index — ONE corpus scan serving
    every corpus statistic (tf, document/corpus frequencies, lengths,
    totals). Shared by TF-IDF, unigram log-prob, and BM25 so the index
    shape can never silently diverge between them; the caller owns the
    persist lifetime (unpersist after materializing its small result)."""
    return (_spread(df)
            .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
            .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
            .persist())


def contamination_report(train: DataFrame, bench: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 8,
                         broadcast_bench: bool = True) -> DataFrame:
    """Benchmark-contamination detection for training corpora: flag every
    training document sharing at least one word ``n``-gram with an eval/
    benchmark set (the GPT-3 appendix-C / PaLM decontamination rule —
    Brown et al. 2020 use 13-gram collision; the default 8 suits shorter
    synthetic docs). Returns ``(id, n_colliding_ngrams, n_bench_docs)``
    for contaminated documents only.

    Scale shape: both sides shingle to DISTINCT word n-grams per doc
    (word_ngrams), and the join key is ``md5(ngram)`` — a uniform 32-byte
    digest, never the raw n-gram text, so the shuffle is narrow and
    unskewed no matter how long the shingles are. Benchmarks are small by
    nature (an eval set, not a corpus), so the bench side broadcasts by
    default and the 100 TB training corpus NEVER shuffles — the collision
    check is a map-side hash probe + partial count agg."""
    tg = (_spread(train)
          .select(F.col(id_col),
                  F.explode(word_ngrams(text_col, n)).alias("g"))
          .select(id_col, F.md5("g").alias("gh")))
    bg = (bench.select(F.col(id_col).alias("__bench_id"),
                       F.explode(word_ngrams(text_col, n)).alias("g"))
          .select("__bench_id", F.md5("g").alias("gh")))
    if broadcast_bench:
        bg = F.broadcast(bg)
    return (tg.join(bg, "gh")
            .groupBy(id_col)
            .agg(F.countDistinct("gh").alias("n_colliding_ngrams"),
                 F.countDistinct("__bench_id").alias("n_bench_docs")))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    packing step that turns a curated corpus into training examples
    (context-window-sized pieces, stride = ``chunk_tokens - overlap``).
    Returns ``(id, chunk_id, n_tokens, chunk_text)``.

    1→N explode on a computed chunk count, then per-chunk ``slice`` of the
    tokenized array — a narrow partition-preserving expansion (no shuffle;
    the same shape as frame_sample). Chunk count uses integer-safe
    ceil-division spelled as ``floor((extra + stride - 1) / stride)`` so
    the DuckDB oracle computes the identical value."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens "
                         f"({chunk_tokens})")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    extra = F.greatest(F.size(t) - chunk_tokens, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + (stride - 1)).cast("double")
                                   / stride)).cast("int")
    return (df.select(F.col(id_col), t.alias("__t"),
                      F.explode(F.sequence(F.lit(0), n_chunks - 1))
                       .alias("chunk_id"))
            .select(id_col, "chunk_id",
                    F.slice("__t", F.col("chunk_id") * stride + 1,
                            chunk_tokens).alias("__c"))
            .select(id_col, "chunk_id",
                    F.size("__c").cast("int").alias("n_tokens"),
                    F.concat_ws(" ", "__c").alias("chunk_text")))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    materialize: bool = True) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF (``tf · ln(N/df)``) — the
    classic salience score used for corpus topic profiling and quality
    filtering. Returns ``(id, term, tf, doc_freq, score, rank)`` with a
    TOTAL order (score desc, term asc) so results are deterministic.

    Shape: ONE corpus pass builds the persisted (doc, term) count index
    (the bm25_topk pattern — without it the tf and doc-freq branches
    each re-scan and re-tokenize); doc-freqs derive from the index and
    broadcast back, N comes from a pruned id-only scan via a single-row
    broadcast cross join (NOT from the index — zero-token documents
    count toward N), and the per-doc top-k window is pruned by
    WindowGroupLimit. ln() is transcendental → rounded to 6 per the
    engine parity rules before ranking."""
    index = _term_index(df, text_col, id_col)
    dfreq = (index.groupBy("term")
             .agg(F.countDistinct(id_col).alias("doc_freq")))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    scored = (index.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score", F.round(
                  F.col("tf") * F.round(
                      F.log(F.col("__n").cast("double") / F.col("doc_freq")),
                      6), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select(id_col, "term", "tf", "doc_freq", "score", "rank"))
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    index.unpersist()
    return out


def decontaminate(train: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """Remove benchmark-contaminated documents from a training corpus:
    the action half of :func:`contamination_report` (detect → drop, the
    GPT-3 App. C remediation). Keeps every training row whose colliding
    n-gram count is below ``min_hits``.

    Shape: the contaminated-id set (small — scales with contamination
    density, not corpus size) anti-joins against the corpus; AQE turns
    that into a broadcast anti-join, so the 100 TB side again never
    shuffles."""
    hits = (contamination_report(train, bench, text_col, id_col, n)
            .where(F.col("n_colliding_ngrams") >= min_hits)
            .select(id_col))
    return train.join(hits, id_col, "left_anti")


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM cross-entropy per document — the perplexity-proxy
    quality signal (CCNet buckets corpora by LM perplexity; a unigram
    model is its SQL-expressible little sibling):
    ``avg_neg_logprob = −Σ tf·ln(ct/T) / Σ tf`` with corpus term counts
    ``ct`` and total token count ``T``. High values = rare-token soup
    (noise, mojibake); low = stopword-heavy boilerplate.

    Shape: ONE corpus pass builds the persisted (doc, term) count index
    (the bm25_topk pattern); corpus term counts, the total token count,
    and the per-doc entropy all derive from it — vocabulary and total
    broadcast back, never a driver collect. ln() rounded to 6 per parity
    rules; the weighted sum runs in decimal so the fold is
    partition-order-independent."""
    index = _term_index(df, text_col, id_col)
    ct = index.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = index.select(F.sum("tf").alias("__total"))
    lnp = F.round(F.log(F.col("ct").cast("double") / F.col("__total")), 6)
    out = (index.join(F.broadcast(ct), "term")
           .crossJoin(F.broadcast(total))
           .groupBy(id_col)
           .agg(F.sum("tf").cast("bigint").alias("n_tokens"),
                F.round(
                    (-F.sum((F.col("tf") * lnp).cast("decimal(28,12)"))
                     .cast("double")
                     / F.sum("tf")), 6).alias("avg_neg_logprob"))
           .localCheckpoint(eager=True))
    index.unpersist()
    return out


def bm25_topk(df: DataFrame, query_terms: list[str],
              text_col: str = "text", id_col: str = "doc_id",
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              materialize: bool = True) -> DataFrame:
    """BM25 keyword search over the corpus (Robertson–Spärck Jones):
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))``
    with ``idf = ln(1 + (N−df+0.5)/(df+0.5))`` — the inverted-index
    ranking workload (Robertson & Zaragoza 2009). Returns the top ``k``
    documents ``(id, n_query_terms_hit, score)``, total-ordered by
    (score desc, id) so results are deterministic.

    Shape: ONE corpus pass builds the (doc, term) count index — the
    inverted-index core — and is persisted; document lengths, tf,
    document frequencies, and N/avgdl all derive from it (without the
    persist each branch would re-scan and re-tokenize the corpus — the
    plan audit showed 4 scans). N/avgdl/df arrive via single-row and
    per-term broadcasts, never a driver collect. Per-term scores round
    transcendentals to 6 and fold in decimal so the per-doc sum is
    partition-order-independent. At 100 TB the persisted index is the
    artifact a real deployment writes to disk once and queries many
    times."""
    terms = [t.lower() for t in query_terms]
    index = _term_index(df, text_col, id_col)
    dl = index.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.select(F.count("*").alias("__n"),
                      F.avg("dl").alias("__avgdl"))
    tf = index.where(F.col("term").isin(terms))
    dfreq = (tf.groupBy("term")
             .agg(F.countDistinct(id_col).alias("df")))
    idf = F.round(F.log(F.lit(1.0)
                        + (F.col("__n") - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))), 6)
    tf_part = (F.col("tf") * (k1 + 1.0)
               / (F.col("tf")
                  + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * F.col("dl") / F.col("__avgdl"))))
    per_term = F.round(idf * tf_part, 6)
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .select(F.col(id_col), per_term.alias("s")))
    out = (scored.groupBy(id_col)
           .agg(F.count("*").cast("int").alias("n_query_terms_hit"),
                F.round(F.sum(F.col("s").cast("decimal(28,12)"))
                        .cast("double"), 6).alias("score"))
           .orderBy(F.desc("score"), F.asc(id_col))
           .limit(k))
    if not materialize:
        # lazy variant for plan audits / composition; caller owns the
        # persisted index's lifetime (the dedup._finish convention)
        return out
    # materialize the (tiny) top-k, then release the index cache —
    # without this every bm25_topk call leaks a persisted frame
    out = out.localCheckpoint(eager=True)
    index.unpersist()
    return out


def remove_repeated_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", span_words: int = 8,
                          min_docs: int = 2) -> DataFrame:
    """Substring-level (span) deduplication: segment each document into
    consecutive non-overlapping ``span_words``-word spans, count each
    span's cross-document frequency corpus-wide, and drop every span that
    appears in ≥ ``min_docs`` distinct documents — the fixed-length
    approximation of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", which
    removes repeated ≥50-token matches; boilerplate headers/footers are
    the classic target). Returns ``(id, n_spans, n_removed, clean_text)``
    with ``clean_text`` reconstructed from the KEPT spans in original
    order; zero-token documents survive with an empty clean_text.

    Scale shape: spans never leave their partition until the doc-frequency
    aggregate, whose key is ``md5(span)`` — a uniform 32-byte digest, so
    the shuffle is narrow and skew-free regardless of span text length.
    The repeated-span set is duplication-density-scaled (small), broadcast
    back via the frequency join; reconstruction is one per-doc aggregate
    (sort_array over collected (span_id, text) structs — each doc's spans,
    not the corpus, sit in one group)."""
    toks = tokens(text_col)
    n_spans = F.floor((F.size(toks) + (span_words - 1)).cast("double")
                      / span_words).cast("int")
    # zero-token guard: Spark's sequence(0, -1) DESCENDS (unlike DuckDB's
    # empty generate_series), so the index list must be empty explicitly
    idx = F.when(n_spans > 0, F.sequence(F.lit(0), n_spans - 1)) \
           .otherwise(F.array().cast("array<int>"))
    spans = (_spread(df)
             .select(F.col(id_col), toks.alias("__t"),
                     F.explode(idx).alias("span_id"))
             .select(id_col, "span_id",
                     F.concat_ws(" ", F.slice(
                         "__t", F.col("span_id") * span_words + 1,
                         span_words)).alias("span_text"))
             .withColumn("__fp", F.md5("span_text")))
    # broadcast ONLY the repeated-span set (duplication-density-scaled),
    # not every distinct span's frequency — at corpus scale the full
    # distinct-span frame is data-sized and must never be broadcast
    repeated = (spans.groupBy("__fp")
                .agg(F.countDistinct(id_col).alias("__ndocs"))
                .where(F.col("__ndocs") >= min_docs)
                .select("__fp", F.lit(True).alias("__drop")))
    flagged = (spans.join(F.broadcast(repeated), "__fp", "left")
               .withColumn("__drop", F.coalesce("__drop", F.lit(False))))
    rebuilt = (flagged.groupBy(id_col)
               .agg(F.count("*").cast("int").alias("n_spans"),
                    F.sum(F.col("__drop").cast("int")).cast("int")
                     .alias("n_removed"),
                    F.concat_ws(" ", F.transform(
                        F.sort_array(F.collect_list(F.when(
                            ~F.col("__drop"),
                            F.struct(F.col("span_id"),
                                     F.col("span_text"))))),
                        lambda s: s["span_text"])).alias("clean_text")))
    return (df.select(id_col).join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))


def remove_repeated_substrings_exact(df: DataFrame, text_col: str = "text",
                                     id_col: str = "doc_id",
                                     min_tokens: int = 8,
                                     min_docs: int = 2) -> DataFrame:
    """EXACT substring-level deduplication at token granularity — the
    Lee et al. (2021) semantics :func:`remove_repeated_spans` only
    approximates (VERDICT r7 "What's missing" #2): remove every token
    covered by SOME repeated ``>= min_tokens``-token contiguous window
    occurring in ``>= min_docs`` distinct documents, at ANY offset.

    Exactness argument: a repeated substring of length L >= min_tokens
    covers exactly the tokens covered by its length-``min_tokens``
    sub-windows, each of which also repeats — so sliding a STRIDE-1
    window of width ``min_tokens`` over every document and flagging the
    cross-document repeats identifies precisely the token set the
    suffix-array method removes (no alignment blind spot: the aligned
    stride-``w`` variant misses a duplicated block whose offsets differ
    mod w; stride-1 cannot).

    Returns ``(id, n_tokens, n_removed_tokens, clean_text)`` with
    ``clean_text`` rebuilt from the uncovered tokens in order
    (whitespace-normalized, like remove_repeated_spans).

    Scale shape: the window stream is ``L`` rows/doc versus the aligned
    variant's ``L/w`` — a documented w× shuffle-volume premium for
    exactness (SCALE.md quantifies the trade). The shuffle key is
    ``md5(window)`` (uniform, skew-free); only the REPEATED window set
    (duplication-density-scaled) broadcasts back; covered-interval
    merging is a per-doc sort-window (gaps-and-islands), never global;
    and reconstruction references MATERIALIZED token/interval arrays in
    its lambdas (the O(L²) inline-expression trap from the parity
    rules)."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    w = min_tokens
    toks = (df.select(F.col(id_col), tokens(text_col).alias("__t"))
            .withColumn("__n", F.size("__t")))
    # stride-1 window starts, 1-based; docs shorter than w emit none
    starts = F.when(F.col("__n") >= w,
                    F.sequence(F.lit(1), F.col("__n") - w + 1)) \
              .otherwise(F.array().cast("array<int>"))
    wins = (toks.select(id_col, F.explode(starts).alias("__a"),
                        F.col("__t"))
            .select(id_col, "__a",
                    F.md5(F.concat_ws(" ", F.slice("__t", F.col("__a"),
                                                   w))).alias("__fp")))
    repeated = (wins.groupBy("__fp")
                .agg(F.countDistinct(id_col).alias("__ndocs"))
                .where(F.col("__ndocs") >= min_docs)
                .select("__fp"))
    flagged = wins.join(F.broadcast(repeated), "__fp").select(id_col, "__a")
    # merge overlapping/adjacent covered intervals [a, a+w-1] per doc:
    # island breaks where a start opens past the running max end + 1
    win_prev = (Window.partitionBy(id_col).orderBy("__a")
                .rowsBetween(Window.unboundedPreceding, -1))
    islands = (flagged
               .withColumn("__prev_end",
                           F.max(F.col("__a") + (w - 1)).over(win_prev))
               .withColumn("__brk", (F.col("__a")
                                     > F.coalesce(F.col("__prev_end"),
                                                  F.lit(0)) + 1).cast("int"))
               .withColumn("__isl", F.sum("__brk").over(
                   Window.partitionBy(id_col).orderBy("__a")
                   .rowsBetween(Window.unboundedPreceding, 0))))
    ivs = (islands.groupBy(id_col, "__isl")
           .agg(F.min("__a").alias("lo"),
                (F.max("__a") + (w - 1)).alias("hi"))
           .groupBy(id_col)
           .agg(F.collect_list(F.struct("lo", "hi")).alias("__ivs"),
                F.sum(F.col("hi") - F.col("lo") + 1).cast("int")
                .alias("__n_removed")))
    joined = (toks.join(ivs, id_col, "left")
              .withColumn("__ivs", F.coalesce(
                  "__ivs", F.array().cast(
                      "array<struct<lo:int,hi:int>>"))))
    # kept tokens: positions p in 1..n outside every merged interval —
    # lambdas reference the materialized __t/__ivs columns only
    clean = F.concat_ws(" ", F.filter(
        F.transform(F.col("__t"), lambda t, i: F.when(
            F.size(F.filter(F.col("__ivs"),
                            lambda iv: (i + 1 >= iv["lo"])
                            & (i + 1 <= iv["hi"]))) == 0, t)),
        lambda t: t.isNotNull()))
    return joined.select(
        id_col, F.col("__n").alias("n_tokens"),
        F.coalesce("__n_removed", F.lit(0)).alias("n_removed_tokens"),
        clean.alias("clean_text"))


def _bucket_stats(bucketed: DataFrame) -> DataFrame:
    """Shared per-bucket aggregate for both quality-bucketing paths."""
    return (bucketed.groupBy("bucket")
            .agg(F.count("*").cast("int").alias("n_docs"),
                 F.min("avg_neg_logprob").alias("min_nlp"),
                 F.max("avg_neg_logprob").alias("max_nlp"),
                 F.round(F.sum(F.col("avg_neg_logprob")
                               .cast("decimal(28,12)")).cast("double")
                         / F.count("*"), 6).alias("avg_nlp"),
                 F.round(F.sum(F.col("n_tokens").cast("decimal(28,12)"))
                         .cast("double") / F.count("*"), 6)
                  .alias("avg_tokens")))


def quality_buckets(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 10,
                    approx: bool = False) -> DataFrame:
    """CCNet-style quality bucketing: rank every document by its unigram-LM
    cross-entropy (:func:`unigram_logprob`) and split the corpus into
    ``n_buckets`` equal-frequency buckets. Returns per bucket:
    ``(bucket, n_docs, min_nlp, max_nlp, avg_nlp, avg_tokens)`` — the
    head/middle/tail corpus split CCNet feeds to different training
    mixes.

    Two paths, same output schema:

    * ``approx=False`` (oracle-exact): ntile over a TOTAL order (score,
      then id — ties deterministic). The unpartitioned window runs in ONE
      task over the narrow per-doc score frame (id + 2 numbers; ~16 GB per
      1e9 docs) — fine to ~1e8 docs, the single-task point is documented.
    * ``approx=True`` (the 100 TB path): bucket BOUNDARIES come from one
      distributed ``percentile_approx`` aggregate over the score frame;
      each document maps to ``1 + #(boundaries < score)`` via a single-row
      broadcast of the (n_buckets−1)-float boundary array — fully
      distributed, no unpartitioned window, no driver collect. Edges are
      approximate (and heavy score ties can leave a bucket empty); the
      pytest pins the exact path against the oracle and checks the approx
      path for monotone non-overlapping ranges + preserved totals."""
    u = unigram_logprob(df, text_col, id_col)
    if approx:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = u.select(F.percentile_approx(
            "avg_neg_logprob", qs, 10_000).alias("__bs"))
        bucketed = (u.crossJoin(F.broadcast(bounds))
                    .withColumn("bucket", (F.lit(1) + F.size(F.filter(
                        "__bs", lambda b: b < F.col("avg_neg_logprob"))))
                        .cast("int")))
    else:
        w = Window.orderBy(F.col("avg_neg_logprob").asc(),
                           F.col(id_col).asc())
        bucketed = u.withColumn("bucket", F.ntile(n_buckets).over(w))
    return _bucket_stats(bucketed)


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", budget: int = 256,
                   shard_col: str = "source") -> DataFrame:
    """Sequence packing for training-batch construction: within each shard
    (``shard_col``), documents are concatenated in ``id`` order into a
    token stream that is cut every ``budget`` tokens; a document belongs
    to the pack where its FIRST token lands (GPT-style pack-then-split —
    the step that turns a curated corpus into fixed-cost training rows).
    Returns ``(shard, pack_id, n_docs, n_tokens, first_doc, last_doc)``.

    Scale shape: the running token count is a cumulative-sum window
    PARTITIONED BY shard — real pipelines pack per input shard/file
    exactly so the operation parallelizes; no unpartitioned global sort
    exists here. One shuffle on the shard key, then one aggregate."""
    # materialize the token count once per row — inlining token_count into
    # the window arg, the start offset, and the output would tokenize each
    # document three times
    base = df.select(F.col(shard_col).alias("shard"), F.col(id_col),
                     token_count(text_col).alias("__nt"))
    cum = F.sum("__nt").over(
        Window.partitionBy("shard").orderBy(F.col(id_col))
              .rowsBetween(Window.unboundedPreceding, 0))
    packed = base.withColumn(
        "pack_id",
        F.floor((cum - F.col("__nt")).cast("double") / budget).cast("int"))
    return (packed.groupBy("shard", "pack_id")
            .agg(F.count("*").cast("int").alias("n_docs"),
                 F.sum("__nt").cast("bigint").alias("n_tokens"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc")))


def corpus_ngram_counts(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 2,
                        k: int = 20) -> DataFrame:
    """Corpus-wide top-``k`` word n-grams by occurrence count (vocabulary /
    collocation induction — the counting pass a BPE-merge or phrase-table
    build starts from). Counts are NON-distinct (every occurrence), unlike
    the dedup shingles. Returns ``(ngram, n_occurrences, n_docs, rank)``
    total-ordered by (count desc, ngram asc).

    Scale shape: per-doc (ngram → count) partial aggregation happens
    map-side before the corpus-wide shuffle; the final top-k is a
    TakeOrdered over the aggregated (distinct-ngram-sized) frame, never a
    global sort of the raw stream. The token array is MATERIALIZED in
    its own projection before the gram transform — inlining ``tokens()``
    into the lambda body re-runs the regex split once per gram, O(L²)
    tokenization per document (the winnow_fingerprints trap)."""
    t = F.col("__t")
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)) \
           .otherwise(F.array().cast("array<int>"))
    grams = (_spread(df)
             .select(F.col(id_col), tokens(text_col).alias("__t"))
             .select(F.col(id_col),
                     F.explode(F.transform(
                         idx, lambda i: F.concat_ws(
                             " ", F.slice(t, i + 1, n)))).alias("ngram")))
    counted = (grams.groupBy("ngram")
               .agg(F.count("*").cast("bigint").alias("n_occurrences"),
                    F.countDistinct(id_col).cast("int").alias("n_docs")))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    return (counted.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(k)
            .withColumn("rank", F.row_number().over(w).cast("int")))


#: URL canonicalization rules, applied in order (each is a Java-regex /
#: RE2-identical pattern): strip scheme, strip leading www., drop query
#: string + fragment, drop ONE trailing slash. Lowercasing happens first
#: (hosts are case-insensitive; path case-folding is a documented
#: simplification that trades path-case sensitivity for dedup recall —
#: the choice CCNet-style URL dedup makes).
URL_CANON_RULES = (
    r"^https?://", r"^www\.", r"[?#].*$", r"/$",
)


def canonical_url(col: str | Column) -> Column:
    """Canonical form of a URL for URL-level dedup (the first dedup pass
    of every web-corpus pipeline — CCNet/RefinedWeb dedup by URL before
    touching content): lowercase, strip scheme and leading ``www.``, drop
    query/fragment (where tracking params live), drop the trailing slash.
    A chain of codegen'd ``regexp_replace`` — narrow map, no shuffle."""
    out = F.lower(_c(col))
    for pat in URL_CANON_RULES:
        out = F.regexp_replace(out, pat, "")
    return out


def url_domain(col: str | Column) -> Column:
    """Registrable host part of an ALREADY-CANONICAL url (everything
    before the first ``/``) — the key for domain-level stats and
    blocklist filtering."""
    return F.regexp_extract(_c(col), r"^([^/]+)", 1)


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup report: one row per canonical URL with its domain,
    the number of documents sharing it, and the kept representative
    (min id) — the exact-dedup shape (q26) keyed on the canonical URL
    instead of a content fingerprint. Single uniform-key shuffle; the
    canonicalization is a narrow map."""
    return (df.withColumn("canonical_url", canonical_url(url_col))
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias("first_doc"),
                 F.count("*").cast("bigint").alias("n_docs"))
            .withColumn("domain", url_domain("canonical_url"))
            .select("canonical_url", "domain", "n_docs", "first_doc"))


def filter_blocked_domains(df: DataFrame, blocked: list[str],
                           url_col: str = "url") -> DataFrame:
    """Drop rows whose canonical URL belongs to a blocklisted registrable
    domain — the standard quality/safety gate. A blocklist entry blocks
    the exact host AND every subdomain (``spam.example`` blocks
    ``cdn.spam.example``); the matched host is normalized first so none
    of the classic encodings bypass the gate: ``user:pass@`` userinfo is
    stripped, an explicit ``:port`` is stripped, and a trailing-dot FQDN
    (``spam.example.`` resolves identically) is stripped. An exact-host
    ``isin`` would let every one of those through. Literal codegen'd
    predicates for the list sizes configs carry; swap to a broadcast
    anti-join when the list is a table."""
    raw = url_domain(canonical_url(url_col))
    host = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(raw, r"^[^/@]*@", ""),
                         r":[0-9]+$", ""),
        r"\.$", "")
    cond = F.lit(False)
    for b in blocked:
        b = b.lower().rstrip(".")
        cond = cond | (host == b) | host.endswith("." + b)
    return df.where(~cond)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram,
    slide a window of ``w`` consecutive hashes, keep each window's
    MINIMUM, return the distinct selected hashes as exploded
    ``(id, fp)`` rows. Guarantees: any shared substring of length ≥
    ``w + k − 1`` contributes at least one common fingerprint, while only
    ~2/(w+1) of hashes are kept — position-robust substring matching at a
    fraction of the full k-gram set.

    Hashes are the engine-portable md5-prefix integers (the hash_bucket
    idiom), so the fingerprint sets are bit-identical in any engine.

    The k-gram hash array is MATERIALIZED in its own projection before
    the window pass: a single-expression form would re-evaluate the
    entire ~n-element md5 transform inside every window lambda —
    measured 189 s → 1 s at sf0.001 (same quadratic-expression trap
    ``similarity._with_cell`` documents). Narrow map + explode, zero
    shuffle; downstream fingerprint joins shuffle 8-byte ints."""
    c = F.lower(_c(text_col))
    n_grams = F.length(c) - (k - 1)
    gidx = F.when(n_grams > 0, F.sequence(F.lit(1), n_grams)) \
            .otherwise(F.array().cast("array<int>"))
    hs = F.transform(gidx, lambda i: F.conv(
        F.substring(F.md5(F.substring(c, i, k)), 1, 8), 16, 10)
        .cast("bigint"))
    n_wins = F.size("__hs") - (w - 1)
    widx = F.when(n_wins > 0, F.sequence(F.lit(1), n_wins)) \
            .otherwise(F.array().cast("array<int>"))
    wins = F.transform(widx, lambda j: F.array_min(F.slice("__hs", j, w)))
    # shorter-than-one-window documents keep min-of-all (standard edge)
    short = F.when(F.size("__hs") > 0, F.array(F.array_min("__hs"))) \
             .otherwise(F.array().cast("array<bigint>"))
    fps = F.array_distinct(F.when(n_wins > 0, wins).otherwise(short))
    return (_spread(df)
            .select(F.col(id_col), hs.alias("__hs"))
            .select(id_col, F.explode(fps).alias("fp")))


def winnow_neardup_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5, w: int = 4,
                         min_shared: int = 2,
                         max_df_frac: float = 0.05) -> DataFrame:
    """Near-dup pairs from shared winnowing fingerprints — the MOSS match
    step: documents sharing ≥ ``min_shared`` RARE fingerprints are
    reported with the shared count. "Rare" = fingerprint document
    frequency ≤ ``max_df_frac`` of the corpus (MOSS equally ignores
    overly-common fingerprints): without the cap the fp self-join costs
    Σ df(fp)² rows, measured 590M at sf0.1 on this fixture because a
    handful of common-substring fingerprints hit df ≈ N. With the cap,
    join volume tracks true shared-rare-content density. Returns
    ``(id_a, id_b, n_shared)``, id_a < id_b.

    Scale shape: fingerprints are 8-byte ints; the df-count aggregate is
    map-side-combined; pruning happens BEFORE the self-join via a
    broadcast ANTI-join against the COMMON-fingerprint set — the small
    side by construction (at most corpus_docs/cap_docs fingerprints can
    exceed the df cap), where broadcasting the RARE set would ship a
    distinct-fingerprint-sized (i.e. data-sized) frame. The (id, fp)
    frame is persisted for its two consumers (df counts + the join) so
    the winnowing expression runs one corpus pass, then released."""
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
    fps = winnow_fingerprints(df, text_col, id_col, k, w).persist()
    dfreq = fps.groupBy("fp").agg(F.countDistinct(id_col).alias("__df"))
    common = (dfreq.crossJoin(F.broadcast(n_docs))
              .where(F.col("__df") > F.greatest(
                  F.lit(2),
                  F.floor(F.lit(float(max_df_frac)) * F.col("__n"))))
              .select("fp"))
    pruned = fps.join(F.broadcast(common), "fp", "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    try:
        out = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                      & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
               .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b"))
               .agg(F.count("*").cast("bigint").alias("n_shared"))
               .where(F.col("n_shared") >= min_shared)
               .localCheckpoint(eager=True))
    finally:
        # a failed checkpoint job must not leak the data-sized persisted
        # (id, fp) frame for the session lifetime
        fps.unpersist()
    return out


#: The C4/Gopher-style curation funnel, in application order. Each entry is
#: (rule_name, predicate builder over the text column). Order matters for
#: the audit semantics: stage i's drop count is measured among stage
#: i−1's survivors, the way a production pipeline reports its funnel.
def _funnel_rules(text_col: str):
    n_tok, n_chars, mwl, punct_ratio = _quality_exprs(text_col)
    lines = F.filter(F.split(_c(text_col), "\n"),
                     lambda x: F.trim(x) != "")
    dup_line_frac = F.when(
        F.size(lines) > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double")
        / F.size(lines)).otherwise(0.0)
    return [
        ("min_tokens", n_tok >= 5),
        ("max_tokens", n_tok <= 100_000),
        ("mean_word_len", (mwl >= 2) & (mwl <= 12)),
        ("stopword_ratio", stopword_ratio(text_col) >= 0.05),
        ("punct_ratio", punct_ratio <= 0.2),
        ("dup_lines", dup_line_frac <= 0.3),
    ]


def filter_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Curation filter-funnel audit: apply the ordered C4/Gopher-style
    rule list and report, per stage, how many documents entered, were
    dropped BY THAT RULE (among the prior stages' survivors), and
    survived — the observability table every corpus-curation run ships
    with, so a rule that silently deletes half the corpus is visible at
    a glance rather than buried in a final row count.

    Shape: every rule is a codegen'd boolean over one document scan; the
    cumulative-AND columns reduce in a SINGLE map-side-combined aggregate
    (one row), which then explodes into the per-stage audit rows — cost
    is one corpus pass regardless of rule count, no shuffle of document
    text, no per-rule job. Output is total-ordered by stage.
    """
    rules = _funnel_rules(text_col)
    cums: list[Column] = []
    acc = None
    for _, pred in rules:
        ok = F.coalesce(pred, F.lit(False))
        acc = ok if acc is None else (acc & ok)
        cums.append(acc)
    agg = df.agg(
        F.count("*").alias("n0"),
        *[F.sum(c.cast("bigint")).alias(f"c{i}")
          for i, c in enumerate(cums)])
    stages = F.array(*[
        F.struct(F.lit(i + 1).alias("stage"),
                 F.lit(name).alias("rule"),
                 (F.col("n0") if i == 0 else F.col(f"c{i-1}"))
                 .alias("n_in"),
                 F.col(f"c{i}").alias("n_kept"))
        for i, (name, _) in enumerate(rules)])
    return (agg.select(F.explode(stages).alias("s"))
            .select(F.col("s.stage").cast("int").alias("stage"),
                    "s.rule",
                    F.col("s.n_in").cast("bigint").alias("n_in"),
                    F.col("s.n_kept").cast("bigint").alias("n_kept"),
                    (F.col("s.n_in") - F.col("s.n_kept")).cast("bigint")
                    .alias("n_dropped"))
            .orderBy("stage"))


def apply_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The keep-side of :func:`filter_funnel`: documents passing ALL
    rules, one codegen'd predicate over one scan."""
    pred = None
    for _, p in _funnel_rules(text_col):
        ok = F.coalesce(p, F.lit(False))
        pred = ok if pred is None else (pred & ok)
    return df.where(pred)


def cumulative_sum_bucketed(df: DataFrame, keys: list[str], order_col: str,
                            value_col: str, out_col: str = "cum",
                            n_buckets: int = 64) -> DataFrame:
    """Per-key running total over a global order WITHOUT a single-partition
    window — the distributed prefix-sum. A plain
    ``sum() OVER (PARTITION BY key ORDER BY ...)`` funnels each key's
    entire history through ONE task; for a key holding half a 100 TB
    corpus that task is the job. Two-phase instead:

    1. range-bucket rows by ``order_col`` (bounds from a 1-row min/max
       agg — a fixed-size collect, not data), local running total inside
       each (key, bucket) partition;
    2. per-(key, bucket) totals — a tiny ``keys × n_buckets`` frame —
       get their own running total, and the resulting per-bucket OFFSETS
       broadcast back; final cum = local + offset of the preceding
       buckets.

    Requires ``order_col`` to be unique per key (it is the total order).
    tests pin bucketed ≡ global-window on every row (the
    ffill_bucketed/sliding_windows_bucketed twin pattern).
    """
    if n_buckets < 1:
        # n_buckets=0 would silently clamp every row into bucket −1 and
        # degenerate to the one-task-per-key window this function exists
        # to avoid
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("decimal(38,10)"))
    span = max(float(hi) - float(lo), 1e-12)
    bucket = F.least(
        F.floor((F.col(order_col).cast("double") - float(lo))
                / F.lit(span) * n_buckets),
        F.lit(n_buckets - 1)).cast("int")
    b = df.withColumn("__bkt", bucket)
    local_w = (Window.partitionBy(*keys, "__bkt").orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    val = F.col(value_col).cast("decimal(38,10)")
    b = b.withColumn("__local", F.sum(val).over(local_w))
    totals = (b.groupBy(*keys, "__bkt").agg(F.sum(val).alias("__tot")))
    off_w = (Window.partitionBy(*keys).orderBy("__bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(*keys, "__bkt",
                            F.coalesce(F.sum("__tot").over(off_w),
                                       F.lit(0).cast("decimal(38,10)"))
                            .alias("__off"))
    return (b.join(F.broadcast(offsets), [*keys, "__bkt"])
            .withColumn(out_col, (F.col("__local") + F.col("__off"))
                        .cast("decimal(38,10)"))
            .drop("__bkt", "__local", "__off"))


def enforce_token_quota(df: DataFrame, quota_tokens: int,
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-source token-budget cap — the mixture-building step after
    :func:`mixture (relational.mixture_resample)` decides proportions:
    admit documents in deterministic ``id_col`` order until the source's
    token budget is exhausted; a document is admitted iff the budget is
    not already spent BEFORE it (so the quota may be exceeded by at most
    one document, the standard greedy-fill rule, and a quota smaller
    than the first document still admits it — an all-or-nothing budget
    would silently zero out small quotas).

    Runs on the distributed prefix-sum (:func:`cumulative_sum_bucketed`)
    keyed by source — a skewed giant source does NOT serialize through
    one task the way a plain partition-window cumsum would. Returns the
    admitted documents with their running token totals.
    """
    if quota_tokens < 0:
        raise ValueError(f"quota_tokens must be >= 0, got {quota_tokens}")
    with_n = df.withColumn("__ntok",
                           token_count(text_col).cast("bigint"))
    cum = cumulative_sum_bucketed(with_n, [source_col], id_col, "__ntok",
                                  out_col="__cum")
    return (cum.where((F.col("__cum") - F.col("__ntok"))
                      < F.lit(quota_tokens))
            .select(F.col(id_col), F.col(source_col),
                    F.col("__ntok").alias("n_tokens"),
                    F.col("__cum").cast("bigint").alias("cum_tokens")))


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon character entropy (nats) — the classic
    gibberish/mojibake/base64-blob detector: natural text sits in a
    narrow entropy band, keyboard mash and encoded binary fall outside
    it. ``H = −Σ (c/n)·ln(c/n)`` over character counts.

    Shape: entirely higher-order functions on ONE row — sort the
    character array, find run boundaries, turn boundary gaps into run
    lengths, fold the entropy terms — so a 100 TB corpus computes
    entropy with ZERO shuffle (contrast the explode→groupBy(doc, char)
    formulation, which shuffles every character of the corpus). Per the
    cross-engine parity rules each ``ln`` term is rounded to 6 decimals;
    the weighted fold is a plain-double LEFT fold over the sorted runs —
    a DEFINED evaluation order both engines replay exactly (the q98
    lesson: HOF decimal accumulators trip Spark's lambda type-widening,
    so fixed-order double is the portable fold), making the sum
    bit-reproducible without decimal.
    """
    # each stage MATERIALIZES its array as a bound column before the next
    # lambda references it: an expression tree inlined into a HOF lambda
    # re-evaluates per element (the winnow_fingerprints O(L²) trap — here
    # it would re-sort the char array once per character)
    n = F.col("__n")
    cs = F.col("__cs")
    idx = F.col("__idx")
    # Java's split keeps the empty match at end-of-input (limit −1), so
    # the lookahead char split yields one trailing "" — drop it, or it
    # counts as a phantom distinct character
    staged = _spread(df).select(
        F.col(id_col), F.length(_c(text_col)).alias("__n"),
        F.array_sort(F.filter(F.split(_c(text_col), "(?!^)"),
                              lambda x: x != "")).alias("__cs"))
    # no short-circuit in SQL: guard the i−1 lookup at i=1 (element_at is
    # 1-based and raises on 0) — the self-compare is false, the OR true.
    # The n = 0 guard matters too: sequence(1, 0) DESCENDS to [1, 0] and
    # the 0 would reach element_at
    staged = staged.withColumn(
        "__idx",
        F.when(n > 0, F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1) |
            (F.element_at(cs, i) !=
             F.element_at(cs, F.greatest(i - 1, F.lit(1))))))
        .otherwise(F.array().cast("array<int>")))
    k = F.size(idx)
    staged = staged.withColumn(
        "__lens",
        F.transform(idx, lambda s, j: F.when(j < k - 1,
                                             F.element_at(idx, j + 2))
                    .otherwise(n + 1) - s))
    term = lambda c: (c.cast("double") *
                      F.round(F.log(c.cast("double") / n.cast("double")),
                              6))
    ssum = F.aggregate(F.col("__lens"), F.lit(0.0),
                       lambda acc, c: acc + term(c))
    h = F.when(n > 0, F.round(-ssum / n.cast("double"), 6)) \
         .otherwise(0.0)
    return staged.select(
        F.col(id_col),
        n.cast("int").alias("n_chars"),
        F.when(n > 0, k).otherwise(0).cast("int")
        .alias("n_distinct_chars"),
        h.alias("char_entropy"))


def pmi_bigrams(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_count: int = 5,
                k: int = 20) -> DataFrame:
    """Top-``k`` adjacent word pairs by pointwise mutual information —
    collocation mining (``PMI = ln p(ab) − ln p(a) − ln p(b)`` with
    bigram/unigram MLE probabilities), the standard phrase-induction
    signal on a corpus; raw bigram counts (q90) surface stopword pairs,
    PMI surfaces "new york".

    Shape: the unigram and bigram counting passes are map-side-combined
    grouped aggregates; ``min_count`` prunes the bigram frame FIRST so
    only candidate pairs (a tiny frame) join the unigram counts — the
    candidate side broadcasts into the vocabulary scan twice, so the
    full vocabulary never shuffles for the join. Corpus totals ride
    along as 1-row broadcasts. Each ``ln`` rounds to 6 per the parity
    rules; the final ranking is total-ordered (pmi desc, ngram asc).
    """
    toks = (_spread(df)
            .select(F.col(id_col), tokens(text_col).alias("__t")))
    uni = (toks.select(F.explode("__t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c1"))
           .persist())
    t = F.col("__t")
    seq = F.when(F.size(t) >= 2, F.sequence(F.lit(0), F.size(t) - 2)) \
           .otherwise(F.array().cast("array<int>"))
    # persisted: three consumers (total, candidates, scoring) would each
    # replay the corpus gram scan otherwise — measured 6 parquet scans in
    # the un-persisted plan; both count frames are distinct-term-sized,
    # far below the corpus
    bi = (toks.select(F.explode(F.transform(
            seq, lambda i: F.struct(
                F.element_at(t, i + 1).alias("w1"),
                F.element_at(t, i + 2).alias("w2")))).alias("g"))
          .groupBy("g.w1", "g.w2").agg(F.count("*").alias("c2"))
          .persist())
    n1 = uni.agg(F.sum("c1").cast("double").alias("__n1"))
    n2 = bi.agg(F.sum("c2").cast("double").alias("__n2"))
    cand = bi.where(F.col("c2") >= min_count)
    lnp = lambda c, tot: F.round(F.log(c.cast("double") / F.col(tot)), 6)
    ua = uni.select(F.col("w").alias("w1"), F.col("c1").alias("ca"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c1").alias("cb"))
    scored = (ua.join(F.broadcast(cand), "w1")
              .join(F.broadcast(ub.join(
                  F.broadcast(cand.select("w2").distinct()), "w2")), "w2")
              .crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(n2))
              .select(
                  F.concat_ws(" ", "w1", "w2").alias("ngram"),
                  F.col("c2").cast("bigint").alias("n_pair"),
                  F.round(lnp(F.col("c2"), "__n2")
                          - lnp(F.col("ca"), "__n1")
                          - lnp(F.col("cb"), "__n1"), 6).alias("pmi")))
    w = Window.orderBy(F.desc("pmi"), F.asc("ngram"))
    try:
        out = (scored.orderBy(F.desc("pmi"), F.asc("ngram")).limit(k)
               .withColumn("rank", F.row_number().over(w).cast("int"))
               .localCheckpoint(eager=True))
    finally:
        uni.unpersist()
        bi.unpersist()
    return out


def zipf_fit(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             top_k: int = 1000) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ``ln(count)`` against ``ln(rank)`` over the top-``top_k`` terms —
    slope ≈ −1 is the natural-language signature; a flat or cliff-shaped
    spectrum flags template spam or synthetic text (the corpus-level
    sibling of the per-document entropy check).

    Shape: one corpus term-count pass (map-side combined), then
    TakeOrdered truncates to ``top_k`` BEFORE any rank window — ranking
    the full vocabulary would funnel it through one task at 100 TB, but
    ranking a bounded top-k frame is constant work. The fit reuses
    stats.grouped_ols' exact-decimal moment machinery (6-rounded ln
    inputs), so slope/intercept/r are bit-reproducible.
    """
    from powerdatapipeline_spark.operators import stats as st

    counts = (_spread(df)
              .select(F.explode(tokens(text_col)).alias("term"))
              .groupBy("term").agg(F.count("*").alias("c")))
    top = counts.orderBy(F.desc("c"), F.asc("term")).limit(top_k)
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    pts = (top.withColumn("rank", F.row_number().over(w))
           .select(F.round(F.log(F.col("rank").cast("double")), 6)
                   .alias("ln_rank"),
                   F.round(F.log(F.col("c").cast("double")), 6)
                   .alias("ln_count")))
    return st.grouped_ols(pts, [], "ln_rank", "ln_count")


#: the Gopher doc-level stopword list (Rae et al. 2021, App. A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_len: float = 3.0,
                         max_mean_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         min_alpha_frac: float = 0.8,
                         min_stopwords: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
    App. A1.1) — the canonical doc-level heuristic filter battery next to
    the repo's continuous quality score (q28) and CCNet buckets (q87):
    word-count bounds, mean-word-length window, symbol-to-word ratio
    (``#`` and ``…``), alphabetic-word fraction, and a minimum stopword
    count. Returns every document with its per-rule measurements AND
    booleans plus the conjunction ``passes`` — keep the measurements,
    not just the verdict, so threshold tuning is a filter change, not a
    recompute.

    All rules are single-pass column expressions over one materialized
    token array (zero shuffle, zero Python); ratios are 6-rounded for
    engine portability. Defaults are the paper's thresholds; callers
    tune per corpus."""
    toks_col = tokens(text_col)
    base = df.select(F.col(id_col), F.col(text_col).alias("__raw"),
                     toks_col.alias("__t"))
    n = F.size("__t")
    sum_len = F.aggregate(F.transform(F.col("__t"), F.length),
                          F.lit(0).cast("bigint"),
                          lambda acc, x: acc + x)
    # n == 0 guard on every ratio: double/0 is engine-divergent
    # (JVM Infinity vs DuckDB inf/NULL) — NULL metrics, failed rules
    mean_len = F.when(n > 0, F.round(sum_len.cast("double") / n, 6))
    n_symbols = (F.length("__raw")
                 - F.length(F.replace(F.col("__raw"), F.lit("#"), F.lit("")))
                 + F.length("__raw")
                 - F.length(F.replace(F.col("__raw"), F.lit("…"),
                                      F.lit(""))))
    sym_ratio = F.when(n > 0, F.round(n_symbols.cast("double") / n, 6))
    n_alpha = F.size(F.filter(F.col("__t"), lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n > 0, F.round(n_alpha.cast("double") / n, 6))
    n_stop = F.size(F.filter(F.col("__t"),
                             lambda x: x.isin(*GOPHER_STOPWORDS)))
    out = (base
           .withColumn("n_words", n.cast("bigint"))
           .withColumn("mean_word_len", mean_len)
           .withColumn("symbol_ratio", sym_ratio)
           .withColumn("alpha_frac", alpha_frac)
           .withColumn("n_stopwords", n_stop.cast("bigint")))
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_len": (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len),
        "ok_symbols": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "ok_stopwords": F.col("n_stopwords") >= min_stopwords,
    }
    passes = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        passes = passes & F.col(name)
    return out.withColumn("passes", passes).drop("__raw", "__t")


def source_vocab_overlap(df: DataFrame, group_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus slices (sources,
    snapshots, languages) — the corpus-level overlap matrix curation
    teams read before mixing sources (near-identical vocabularies →
    candidate for dedup across sources; disjoint → safe to mix). One
    row per unordered group pair with both vocab sizes, the shared-term
    count, and ``jaccard = |A∩B| / |A∪B|``; zero-overlap pairs are kept
    (jaccard 0), not silently dropped.

    Scale shape: the (group, term) vocabulary is one distinct over the
    exploded token stream; the intersection is an inverted-index
    self-join keyed on the term, so per-term cost is bounded by
    #groups², never by corpus size; group sizes are a #groups-row
    aggregate joined back broadcast. The pair universe comes from an
    equi-join of the group list with itself on a constant key (a
    BroadcastHashJoin, deliberately not a crossJoin, so the plan audit
    stays BNLJ-free)."""
    vocab = (_spread(df)
             .select(F.col(group_col).alias("g"),
                     F.explode(tokens(text_col)).alias("term"))
             .distinct()
             .persist())
    sizes = vocab.groupBy("g").agg(F.count("*").cast("bigint").alias("n"))
    inter = (vocab.select(F.col("g").alias("g_a"), "term")
             .join(vocab.select(F.col("g").alias("g_b"), "term"), "term")
             .filter(F.col("g_a") < F.col("g_b"))
             .groupBy("g_a", "g_b")
             .agg(F.count("*").cast("bigint").alias("n_common")))
    one = F.lit(1).alias("__k")
    pairs = (sizes.select(F.col("g").alias("g_a"),
                          F.col("n").alias("n_a"), one)
             .join(F.broadcast(sizes.select(F.col("g").alias("g_b"),
                                            F.col("n").alias("n_b"), one)),
                   "__k")
             .filter(F.col("g_a") < F.col("g_b"))
             .drop("__k"))
    out = (pairs.join(inter, ["g_a", "g_b"], "left")
           .select("g_a", "g_b", "n_a", "n_b",
                   F.coalesce("n_common", F.lit(0)).cast("bigint")
                   .alias("n_common"),
                   F.round(F.coalesce("n_common", F.lit(0)).cast("double")
                           / (F.col("n_a") + F.col("n_b")
                              - F.coalesce("n_common", F.lit(0))), 6)
                   .alias("jaccard"))
           .localCheckpoint(eager=True))
    vocab.unpersist()
    return out


def ngram_novelty(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Per-document n-gram novelty — the fraction of a document's
    distinct word n-grams that occur in NO other document. The inverse
    of the contamination/boilerplate signal: novelty ≈ 1 marks original
    content, novelty ≈ 0 marks template/duplicated text that span dedup
    (q85) or near-dup removal (q94) should be catching. Same 8-gram
    granularity as the decontamination family so the signals compose.

    Scale shape: distinct grams explode once per doc (linear-time
    shifted-gram construction); document frequency is a groupBy on the
    md5 gram fingerprint (never the raw gram string — fixed-width
    shuffle keys); the per-doc rollup joins the frequency table back on
    the same fingerprint, an equi-join co-partitioned with the groupBy
    so AQE coalesces rather than reshuffles. No driver collect, no
    broadcast of anything corpus-sized."""
    grams = (_spread(df)
             .select(F.col(id_col),
                     F.explode(word_ngrams(text_col, n)).alias("gram"))
             .select(F.col(id_col), F.md5("gram").alias("fp")))
    dfreq = grams.groupBy("fp").agg(
        F.countDistinct(id_col).alias("nd"))
    per_doc = (grams.join(dfreq, "fp")
               .groupBy(id_col)
               .agg(F.count("*").cast("bigint").alias("n_grams"),
                    F.sum(F.when(F.col("nd") == 1, 1).otherwise(0))
                    .cast("bigint").alias("n_novel")))
    return (df.select(id_col)
            .join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
                    F.when(F.coalesce("n_grams", F.lit(0)) > 0,
                           F.round(F.col("n_novel").cast("double")
                                   / F.col("n_grams"), 6))
                    .alias("novelty_frac")))


def keyword_route(df: DataFrame, topics: dict[str, dict[str, int]],
                  text_col: str = "text", id_col: str = "doc_id",
                  default_topic: str = "none") -> DataFrame:
    """Weighted-keyword domain router — the cheap, auditable stand-in for
    a topic classifier that mixture builders (q86) and per-source quotas
    (q104) key on when no model-based domain label exists. Each topic is
    a {term: integer weight} bag; a document's topic score is
    ``Σ tf·weight`` and it routes to the argmax topic (ties broken by
    topic name, so routing is deterministic). Docs hitting no keyword
    route to ``default_topic`` with score 0.

    Scale shape: the keyword table is literal-small and broadcast; scoring
    is one hash-partitioned (doc, topic) aggregate over the shared term
    index; argmax is a per-doc window (partitioned by doc — no global
    sort). Integer weights × integer tf keep every score exact, so
    cross-engine parity needs no rounding discipline at all."""
    rows = [(topic, term, int(w))
            for topic, tw in sorted(topics.items())
            for term, w in sorted(tw.items())]
    kw = df.sparkSession.createDataFrame(
        rows, "topic string, term string, w int")
    index = _term_index(df, text_col, id_col)
    scored = (index.join(F.broadcast(kw), "term")
              .groupBy(id_col, "topic")
              .agg(F.sum(F.col("tf") * F.col("w")).cast("bigint")
                   .alias("score"),
                   F.countDistinct("term").cast("bigint")
                   .alias("n_terms_hit")))
    w_best = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                                F.asc("topic"))
    best = (scored.withColumn("__rn", F.row_number().over(w_best))
            .filter(F.col("__rn") == 1).drop("__rn"))
    out = (df.select(id_col)
           .join(best, id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("topic", F.lit(default_topic)).alias("topic"),
                   F.coalesce("score", F.lit(0)).cast("bigint")
                   .alias("score"),
                   F.coalesce("n_terms_hit", F.lit(0)).cast("bigint")
                   .alias("n_terms_hit"))
           .localCheckpoint(eager=True))
    index.unpersist()
    return out


def dsir_importance(df: DataFrame, is_target: Column,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 1024, smoothing: float = 0.5,
                    top_k: int = 100) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every document by how target-like its hashed
    n-gram distribution is, then keep the top-k. The importance weight is
    the log-likelihood ratio of two λ-smoothed bag-of-hashed-unigrams
    models — ``log w(d) = Σ_b tf_b(d)·[ln p_target(b) − ln p_raw(b)]``
    over ``n_buckets`` hash buckets, with ``p(b) = (ct_b + λ) /
    (T + λ·B)``. ``is_target`` marks the in-domain exemplar docs (e.g.
    ``F.col("lang") == "en"``); the raw model is the whole corpus.

    Scale shape: one corpus pass builds the shared (doc, term) index
    (the q81 pattern); terms hash to a FIXED-size bucket table
    (``n_buckets`` rows regardless of corpus size) via the portable
    md5-prefix primitive, so both model fits are a bounded groupBy and
    the fitted log-ratio table broadcasts back. Per-doc scoring is one
    hash-partitioned aggregate; top-k selection is TakeOrderedAndProject
    (distributed heap per partition + driver merge of k rows), never a
    global sort. No driver collect anywhere; the only data-independent
    structures are the B-row ratio table and the k-row selection.

    Parity discipline: each ln() is rounded to 6 before the subtraction;
    the tf-weighted fold runs in decimal(28,12) so partition order can't
    move the sum; the final score is 6-rounded. Selection orders by the
    rounded score with ``id_col`` as tie-break, so membership is
    deterministic across engines."""
    from powerdatapipeline_spark.operators.relational import (
        _md5_prefix_bigint)
    lam = float(smoothing)
    lam_b = lam * n_buckets
    flags = df.select(F.col(id_col), is_target.alias("__is_t"))
    index = _term_index(df, text_col, id_col)
    bucketed = (index
                .withColumn("bucket",
                            _md5_prefix_bigint(F.col("term"), "dsir", 8)
                            % n_buckets)
                .join(flags, id_col))
    per_bucket = (bucketed.groupBy("bucket")
                  .agg(F.sum(F.when(F.col("__is_t"), F.col("tf"))
                             .otherwise(F.lit(0))).alias("ct_t"),
                       F.sum("tf").alias("ct_r")))
    totals = per_bucket.select(F.sum("ct_t").alias("__tt"),
                               F.sum("ct_r").alias("__tr"))
    lr = (per_bucket.crossJoin(F.broadcast(totals))
          .select("bucket",
                  (F.round(F.log((F.col("ct_t").cast("double") + lam)
                                 / (F.col("__tt") + lam_b)), 6)
                   - F.round(F.log((F.col("ct_r").cast("double") + lam)
                                   / (F.col("__tr") + lam_b)), 6))
                  .alias("lr")))
    scored = (bucketed.join(F.broadcast(lr), "bucket")
              .groupBy(id_col)
              .agg(F.sum("tf").cast("bigint").alias("n_tokens"),
                   F.round(F.sum((F.col("tf") * F.col("lr"))
                                 .cast("decimal(28,12)"))
                           .cast("double"), 6).alias("log_importance")))
    selected = (scored
                .orderBy(F.desc("log_importance"), F.asc(id_col))
                .limit(top_k)
                .select(F.col(id_col), F.lit(True).alias("__sel")))
    out = (df.select(id_col)
           .join(scored, id_col, "left")
           .join(F.broadcast(selected), id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                   F.coalesce("log_importance", F.lit(0.0))
                   .alias("log_importance"),
                   F.coalesce("__sel", F.lit(False)).alias("selected"))
           .localCheckpoint(eager=True))
    index.unpersist()
    return out


def length_bucketed_batches(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            batch_size: int = 32,
                            salt: str = "") -> DataFrame:
    """Length-bucketed batch assembly — the padding-efficiency step of
    sequence-model training (TF bucket_by_sequence_length / HF
    LengthGroupedSampler, made a distributed operator): documents are
    bucketed by the power-of-two ceiling of their BPE-piece count
    (``length_bucket = 2^ceil(log2(n))``), ordered INSIDE each bucket
    by a deterministic key hash, and cut into fixed-size batches.

    Returns one row per document: id, ``n_pieces``, ``length_bucket``,
    ``batch_id`` (globally unique as bucket·2^20 + ordinal) and
    ``batch_pos``. Batching within near-equal lengths is what bounds
    padding waste (≤ 2× by construction inside a pow-2 bucket vs
    unbounded under random batching); the hash order keeps the batch
    composition reproducible across runs/engines/cluster sizes (the
    same no-RNG-state contract as relational.hash_split).

    Scale shape: the length + bucket are narrow maps; the ordinal is a
    row_number per bucket — ONE hash-partition shuffle over ~30 bucket
    keys. Buckets are coarse (pow-2), so at 100 TB each bucket is large
    but the per-bucket sort spills executor-side; skew across buckets
    is bounded because real corpora concentrate in ~6 adjacent pow-2
    classes — if a single bucket dominates, sub-salt it with the same
    rule applied to ``hash(key) mod k`` sub-buckets."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    from powerdatapipeline_spark.operators.relational import \
        uniform_from_key
    n = bpe_piece_count(text_col)
    # pow-2 ceiling via bit length of (n-1): portable as
    # floor(log2(x)) = length-of-binary-string - 1 in both engines;
    # n <= 1 pins to bucket 1
    base = df.select(F.col(id_col), n.alias("n_pieces"))
    # F.shiftleft only takes a literal shift, so the column-shift spells
    # as a SQL expression over the named bit-length column
    base = base.withColumn(
        "__nb", F.length(F.conv((F.col("n_pieces") - 1).cast("string"),
                                10, 2)).cast("int"))
    bucket = F.when(F.col("n_pieces") <= 1, F.lit(1).cast("bigint")) \
              .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), __nb)"))
    base = base.withColumn("length_bucket", bucket.cast("bigint")) \
               .drop("__nb")
    w = (Window.partitionBy("length_bucket")
         .orderBy(uniform_from_key(id_col, salt), F.col(id_col)))
    base = base.withColumn("__ord", F.row_number().over(w) - 1)
    return (base.select(
        id_col, "n_pieces", "length_bucket",
        (F.col("length_bucket") * F.lit(1 << 20)
         + F.floor(F.col("__ord") / batch_size)).cast("bigint")
        .alias("batch_id"),
        (F.col("__ord") % batch_size).cast("int").alias("batch_pos")))


def batch_padding_report(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", batch_size: int = 32,
                         salt: str = "") -> DataFrame:
    """Per-batch padding-waste audit over
    :func:`length_bucketed_batches`: each batch pads to its own max
    piece count, so ``padding_waste = n_docs·max_pieces − Σ pieces``
    and ``pad_ratio = waste / (n_docs·max_pieces)``. One row per batch
    (fixed-size output); the training-efficiency number a curation team
    reads before locking a bucketing config."""
    batches = length_bucketed_batches(df, id_col, text_col, batch_size,
                                      salt)
    return (batches.groupBy("length_bucket", "batch_id")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.max("n_pieces").cast("bigint").alias("max_pieces"),
                 F.sum(F.col("n_pieces").cast("bigint")).cast("bigint")
                 .alias("sum_pieces"))
            .withColumn("padding_waste",
                        (F.col("n_docs") * F.col("max_pieces")
                         - F.col("sum_pieces")).cast("bigint"))
            .withColumn("pad_ratio",
                        F.round(F.col("padding_waste")
                                / (F.col("n_docs") * F.col("max_pieces")),
                                6)))


def vocab_top_k(df: DataFrame, text_col: str = "text",
                vocab_size: int = 500) -> DataFrame:
    """Corpus vocabulary: the ``vocab_size`` most frequent lowercased
    whitespace tokens (ties by term asc — deterministic cut). One
    explode + map-side-combined count + a global top-k; the output is
    the fixed-size frame every tokenizer/coverage job broadcasts."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = df.select(F.explode(tokens(F.lower(_c(text_col))))
                     .alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").cast("bigint")
                                      .alias("term_freq"))
    w = Window.orderBy(F.col("term_freq").desc(), F.col("term").asc())
    return (counts.withColumn("vocab_rank",
                              F.row_number().over(w).cast("bigint"))
            .where(F.col("vocab_rank") <= vocab_size))


def oov_report(df: DataFrame, vocab: DataFrame,
               group_col: str = "source", text_col: str = "text"
               ) -> DataFrame:
    """Out-of-vocabulary audit against a fixed vocabulary: per group,
    total tokens, OOV tokens, and the OOV rate (6-rounded) — the
    tokenizer-fit health metric (a rising OOV rate on new data means
    the vocab no longer covers the corpus). The vocab frame (from
    :func:`vocab_top_k` or an external tokenizer dump) is broadcast;
    the corpus explodes once and reduces map-side — no shuffle carries
    token rows, only the per-group partials."""
    toks = df.select(F.col(group_col),
                     F.explode(tokens(F.lower(_c(text_col))))
                     .alias("term"))
    flagged = (toks.join(F.broadcast(vocab.select("term")
                                     .withColumn("__in", F.lit(1))),
                         "term", "left")
               .withColumn("__oov", F.col("__in").isNull().cast("bigint")))
    return (flagged.groupBy(group_col)
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.sum("__oov").cast("bigint").alias("n_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("n_oov") / F.col("n_tokens"), 6)))


def bpe_merge_candidates(df: DataFrame, text_col: str = "text",
                         top_n: int = 20) -> DataFrame:
    """One BPE-learning statistic pass (Sennrich et al. 2016): count
    every ADJACENT PIECE PAIR inside the pre-tokenized piece stream
    and rank the top merge candidates — the exact frequency table a
    byte-pair tokenizer trainer consumes per merge iteration (the
    driver loop applies the winning merge and re-runs, the q47 Lloyd
    pattern: the corpus never moves, one tiny winner row per round
    does).

    Pairs come from each document's piece array zipped with its own
    tail — a narrow map (no explode-then-self-join on position, which
    would shuffle token rows); the count reduces map-side into the
    piece-pair keyspace and only top-n survives the final TakeOrdered.
    Ties rank (count desc, left asc, right asc) for a deterministic
    merge choice."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    pieces = bpe_pieces(_c(text_col))
    pairs = F.zip_with(F.slice(pieces, 1, F.greatest(F.size(pieces) - 1,
                                                     F.lit(0))),
                       F.slice(pieces, 2, F.greatest(F.size(pieces) - 1,
                                                     F.lit(0))),
                       lambda a, b: F.struct(a.alias("left_piece"),
                                             b.alias("right_piece")))
    exploded = (df.select(F.explode(pairs).alias("p"))
                .select("p.left_piece", "p.right_piece"))
    counts = (exploded.groupBy("left_piece", "right_piece")
              .agg(F.count("*").cast("bigint").alias("pair_count")))
    w = Window.orderBy(F.col("pair_count").desc(),
                       F.col("left_piece").asc(),
                       F.col("right_piece").asc())
    return (counts.withColumn("merge_rank",
                              F.row_number().over(w).cast("bigint"))
            .where(F.col("merge_rank") <= top_n))


def boilerplate_line_stats(df: DataFrame, group_col: str = "source",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Per-(group, line) document frequency — the statistic behind
    line-level boilerplate detection (CCNet / jusText heritage):
    headers, footers, nav chrome repeat VERBATIM across a source's
    pages, so a line's within-source doc frequency separates template
    from content. Lines are newline-split, whitespace-trimmed,
    md5-keyed; empty lines drop. One explode + distinct(doc, line) +
    map-side count — the line TEXT itself stays out of the shuffle key
    (md5 key), and the stats frame is vocabulary-sized, not
    corpus-sized."""
    lines = (df.select(F.col(group_col), F.col(id_col),
                       F.explode(F.split(_c(text_col), "\n"))
                       .alias("line"))
             .select(group_col, id_col, F.trim("line").alias("line"))
             .where(F.col("line") != ""))
    per_doc = lines.select(group_col, id_col,
                           F.md5(F.col("line")).alias("line_key")) \
                   .distinct()
    docs_per_group = (df.groupBy(group_col)
                      .agg(F.count("*").cast("bigint").alias("n_docs")))
    return (per_doc.groupBy(group_col, "line_key")
            .agg(F.count("*").cast("bigint").alias("line_df"))
            .join(F.broadcast(docs_per_group), group_col)
            .withColumn("df_frac",
                        F.round(F.col("line_df") / F.col("n_docs"), 6)))


def remove_boilerplate_lines(df: DataFrame, group_col: str = "source",
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             max_df_frac: float = 0.5,
                             min_df: int = 2) -> DataFrame:
    """Line-level boilerplate removal: drop every line whose
    within-source document frequency reaches BOTH ``min_df`` docs and
    ``max_df_frac`` of the source (the two-guard rule keeps rare lines
    and singleton sources intact), then reassemble each document in
    original line order. Returns ``(id, clean_text, n_lines_kept,
    n_lines_removed)``.

    Scale shape: the boilerplate line SET per source is tiny (template
    chrome) — it broadcasts back as an md5-key semi-join filter; the
    reassembly is one concat_ws over a per-doc collect_list pinned to
    line order by sortWithinPartitions on (doc, line index), never a
    global sort. Blank lines are dropped (they carry no content and
    their 'df' is meaningless)."""
    if not 0.0 < max_df_frac <= 1.0:
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")
    stats = boilerplate_line_stats(df, group_col, id_col, text_col)
    bp = (stats.where((F.col("line_df") >= min_df)
                      & (F.col("df_frac") >= max_df_frac))
          .select(group_col, "line_key"))
    lines = (df.select(F.col(group_col), F.col(id_col),
                       F.posexplode(F.split(_c(text_col), "\n"))
                       .alias("line_idx", "line"))
             .withColumn("line", F.trim("line"))
             .where(F.col("line") != "")
             .withColumn("line_key", F.md5(F.col("line"))))
    kept = lines.join(F.broadcast(bp), [group_col, "line_key"],
                      "left_anti")
    n_all = (lines.groupBy(id_col)
             .agg(F.count("*").cast("bigint").alias("__n_lines")))
    agg = (kept.groupBy(id_col)
           .agg(F.concat_ws(
                    "\n", F.array_sort(F.collect_list(
                        F.struct("line_idx", "line"))).getField("line"))
                .alias("clean_text"),
                F.count("*").cast("bigint").alias("n_lines_kept")))
    return (n_all.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines_kept", F.lit(0).cast("bigint"))
                    .alias("n_lines_kept"),
                    (F.col("__n_lines")
                     - F.coalesce("n_lines_kept", F.lit(0).cast("bigint")))
                    .cast("bigint").alias("n_lines_removed")))


def cdc_chunk_rows(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", window: int = 8,
                   modulus: int = 64) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS rule storage dedup and
    shift-robust corpus dedup are built on): cut after every position
    whose trailing ``window``-gram hashes to ``0 mod modulus``, so
    boundaries depend on CONTENT, not offsets — insert a byte at the
    head of a document and every later chunk realigns, where
    fixed-width chunking (q85's approximation) loses every boundary.
    Expected chunk length ≈ ``modulus`` chars. Returns one row per
    chunk: ``(id, chunk_idx, chunk_md5, chunk_len)``.

    Everything is a pure column HOF pipeline (sequence → filter →
    zip_with → posexplode): per-doc, zero shuffle; the md5-prefix
    boundary hash is the repo's engine-portable primitive, so the
    oracle replays every boundary decision. Cost is O(len·window)
    hashing per doc — window stays small (8) by design; a production
    variant swaps in the O(len) rolling polynomial (q61's fold) once
    both engines agree on its incremental form. Empty documents emit
    no chunks."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if modulus < 2:
        raise ValueError(f"modulus must be >= 2, got {modulus}")
    t = f"`{text_col}`"
    bnds = (f"filter(sequence({window}, length({t})), i -> "
            f"CAST(conv(substring(md5(substring({t}, i - {window - 1}, "
            f"{window})), 1, 8), 16, 10) AS BIGINT) % {modulus} = 0)")
    # The boundary array is needed TWICE in the spans expression (starts
    # and ends). Higher-order-function expressions containing lambdas are
    # excluded from Spark's subexpression elimination (SPARK-35410 class),
    # so inlining `bnds` twice would run the O(len·window) md5 scan — the
    # operator's entire cost — twice per row. Materialize it once in a
    # prior projection and reference the column: CollapseProject refuses
    # to re-inline a non-cheap alias used more than once, which the
    # plan-shape pytest (test_round12_plan_shapes.py) pins.
    spans = (f"filter(zip_with("
             f"concat(array(1), transform(__cdc_bnds, b -> b + 1)), "
             f"concat(__cdc_bnds, array(length({t}))), "
             f"(s, e) -> struct(s AS s, e AS e)), p -> p.e >= p.s)")
    from powerdatapipeline_spark.operators.relational import \
        widen_narrow_scan

    # widen BEFORE the per-character md5 scan: a narrow scan pins the
    # O(len·window) hashing — this operator's entire cost — to one task
    # (no-op when the input already arrives as >= parallelism splits)
    base = (widen_narrow_scan(
                df.where(F.length(F.col(text_col)) > 0)
                  .select(F.col(id_col), F.col(text_col)),
                by=id_col)
            .select(F.col(id_col), F.col(text_col),
                    F.expr(bnds).alias("__cdc_bnds"))
            .select(F.col(id_col), F.col(text_col),
                    F.posexplode(F.expr(spans)).alias("chunk_idx", "p")))
    return base.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.md5(F.expr(f"substring({t}, p.s, p.e - p.s + 1)"))
        .alias("chunk_md5"),
        (F.col("p.e") - F.col("p.s") + 1).cast("bigint")
        .alias("chunk_len"))


def cdc_dedup_report(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", window: int = 8,
                     modulus: int = 64, top_n: int = 10) -> DataFrame:
    """Corpus-level chunk-dedup report over :func:`cdc_chunk_rows`:
    the ``top_n`` most-repeated chunk fingerprints (count desc, md5
    asc) with the corpus totals — total chunks, distinct chunks, and
    the dedupable share ``1 − distinct/total`` — repeated on each row.
    The storage-dedup estimate a 100 TB ingest runs before deciding
    chunk-level dedup is worth a pass; chunk rows reduce map-side to
    the fingerprint keyspace and only that frame is ranked."""
    chunks = cdc_chunk_rows(df, id_col, text_col, window, modulus)
    counts = (chunks.groupBy("chunk_md5")
              .agg(F.count("*").cast("bigint").alias("n_occurrences"),
                   F.min("chunk_len").cast("bigint").alias("chunk_len")))
    w_all = Window.partitionBy()
    enriched = (counts
                .withColumn("n_chunks_total",
                            F.sum("n_occurrences").over(w_all)
                            .cast("bigint"))
                .withColumn("n_distinct_chunks",
                            F.count("*").over(w_all).cast("bigint"))
                .withColumn("dup_share", F.round(
                    F.lit(1.0) - F.col("n_distinct_chunks")
                    / F.col("n_chunks_total"), 6)))
    wr = Window.orderBy(F.col("n_occurrences").desc(),
                        F.col("chunk_md5").asc())
    return (enriched.withColumn("dup_rank",
                                F.row_number().over(wr).cast("bigint"))
            .where(F.col("dup_rank") <= top_n)
            .select("dup_rank", "chunk_md5", "n_occurrences", "chunk_len",
                    "n_chunks_total", "n_distinct_chunks", "dup_share"))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.8) -> DataFrame:
    """Interpolated bigram-LM cross-entropy per document — the next
    step up from :func:`unigram_logprob` toward the KenLM-style
    perplexity filter CCNet (Wenzek et al. 2019) buckets corpora by:
    ``p(w2|w1) = λ·c(w1,w2)/c(w1,·) + (1−λ)·c(w2)/T`` with the model
    fit on the corpus itself, so every document bigram is observed and
    the probability is always positive (no OOV smoothing edge cases).
    The left-context count ``c(w1,·)`` is derived from the bigram
    counts themselves (Σ over w2), NOT the unigram count — so rows
    where w1 ends a document don't inflate the denominator.

    Output one row per document with ≥ 2 tokens:
    ``(doc_id, n_bigrams, avg_neg_logprob)`` where
    ``avg_neg_logprob = −Σ tf·ln(p̂) / Σ tf``. High = incoherent word
    soup; low = templated boilerplate — exactly the tails a curation
    pass drops.

    Scale shape: bigrams come from a NARROW per-doc transform (each
    token array zipped with its own tail — the q150 BPE pattern, no
    posexplode self-join); one shuffle builds the per-doc bigram index,
    corpus bigram/left-context counts reduce from it map-side and join
    back on the SAME (w1,w2)/(w1) keys (exchange-reusable; unlike the
    unigram vocab these tables are NOT force-broadcast — a 100 TB
    corpus's bigram vocabulary doesn't fit an executor, so AQE picks
    broadcast only when it actually fits), and only the scalar total
    broadcasts unconditionally. ln() rounded to 6 and
    the weighted sum folded in decimal per the parity rules; the inner
    interpolation is plain IEEE double arithmetic written with the
    same association on both engines."""
    toks = tokens(text_col)
    base = (_spread(df)
            .select(F.col(id_col), toks.alias("t")))
    pairs = (base.where(F.size("t") >= 2)
             .select(id_col,
                     F.explode(F.transform(
                         F.sequence(F.lit(2), F.size("t")),
                         lambda i: F.struct(
                             F.element_at("t", i - 1).alias("w1"),
                             F.element_at("t", i).alias("w2")))).alias("bg"))
             .select(id_col, "bg.w1", "bg.w2"))
    dtf = (pairs.groupBy(id_col, "w1", "w2")
           .agg(F.count("*").alias("tf")).persist())
    c12 = dtf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = (base.select(F.explode("t").alias("w2")))
    c2 = uni.groupBy("w2").agg(F.count("*").alias("c2"))
    total = uni.select(F.count("*").alias("__total"))
    p_hat = (F.lit(lam) * (F.col("c12").cast("double")
                           / F.col("c1").cast("double"))
             + F.lit(1.0 - lam) * (F.col("c2").cast("double")
                                   / F.col("__total")))
    lnp = F.round(F.log(p_hat), 6)
    out = (dtf.join(c12, ["w1", "w2"])
           .join(c1, "w1")
           .join(c2, "w2")
           .crossJoin(F.broadcast(total))
           .groupBy(id_col)
           .agg(F.sum("tf").cast("bigint").alias("n_bigrams"),
                F.round(
                    (-F.sum((F.col("tf") * lnp).cast("decimal(28,12)"))
                     .cast("double")
                     / F.sum("tf")), 6).alias("avg_neg_logprob"))
           .localCheckpoint(eager=True))
    dtf.unpersist()
    return out


def heaps_law_fit(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heaps'-law fit of vocabulary growth — ``V(N) ≈ k·N^β`` with N
    cumulative tokens and V cumulative distinct terms — the corpus-
    composition companion to the Zipf rank-frequency fit (q111): β far
    from the ~0.4-0.6 natural-text band flags templated/synthetic text
    (β→0, vocabulary saturates) or id-soup (β→1, every token new).

    One corpus pass: per-term FIRST-occurrence doc (min doc id) and
    per-doc token counts; running sums over the doc spine turn those
    into (ln N_d, ln V_d) points — the streaming-order trick that makes
    cumulative-distinct cheap: V_d = Σ_{d'≤d} #{terms first seen at d'},
    so no per-prefix distinct scans. The running sums are the
    distributed two-pass prefix (relational.global_prefix: range
    shuffle + per-partition cumsums + P-row offset broadcast), not a
    single-task global window — the doc spine is corpus-sized (round
    13). OLS in closed form over decimal-folded sums (the q68
    discipline). At 100 TB sample the doc spine at log-spaced
    checkpoints instead of every doc; the running sums are otherwise
    identical. Returns one row:
    ``(n_points, total_tokens, total_vocab, beta, log_k)``."""
    from powerdatapipeline_spark.operators.relational import \
        global_prefix

    base = _spread(df).select(F.col(id_col).alias("d"),
                              tokens(text_col).alias("t"))
    ntok = base.select("d", F.size("t").alias("nt"))
    fo = (base.select("d", F.explode("t").alias("w"))
          .groupBy("w").agg(F.min("d").alias("fd")))
    newv = fo.groupBy("fd").agg(F.count("*").alias("nv"))
    spine = (ntok.join(newv, ntok["d"] == newv["fd"], "left")
             .select("d", "nt", F.coalesce("nv", F.lit(0)).alias("nv")))
    pts = (global_prefix(
               spine, ["d"],
               sums={"ct": F.col("nt").cast("bigint"),
                     "cv": F.col("nv").cast("bigint")})
           .withColumn("ct", F.col("ct").cast("bigint"))
           .withColumn("cv", F.col("cv").cast("bigint"))
           .where((F.col("ct") > 0) & (F.col("cv") > 0))
           .select(F.round(F.log(F.col("ct").cast("double")), 6).alias("x"),
                   F.round(F.log(F.col("cv").cast("double")), 6).alias("y"),
                   "ct", "cv"))
    agg = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("ct").alias("total_tokens"),
        F.max("cv").alias("total_vocab"),
        F.sum(F.col("x").cast("decimal(38,12)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,12)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)"))
        .cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("double").alias("sxx"))
    nd = F.col("n").cast("double")
    beta = ((nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (nd * F.col("sxx") - F.col("sx") * F.col("sx")))
    logk = (F.col("sy") - beta * F.col("sx")) / nd
    return agg.select(
        F.col("n").alias("n_points"), "total_tokens", "total_vocab",
        F.round(beta, 6).alias("beta"), F.round(logk, 6).alias("log_k"))


def js_divergence_matrix(df: DataFrame, text_col: str = "text",
                         group_col: str = "source") -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between per-group
    unigram distributions — the distribution-level drift measure
    beside the set-level vocabulary Jaccard (source_vocab_overlap) and
    the binned PSI (psi_drift): symmetric, bounded [0,1] in base 2,
    finite even on disjoint supports, and sensitive to FREQUENCY
    shifts a vocabulary set comparison cannot see.

    Decomposition (no full-outer union-vocabulary join anywhere):
    with h(z) = −z·log2(z) and JSD = H(M) − (H(P)+H(Q))/2,
    each group's one-sided terms Σ_w [h(p/2) − h(p)/2] reduce
    PER GROUP (a word absent from the other side contributes exactly
    that), and only words in BOTH groups need the pair equi-join
    correction h((p+q)/2) − (h(p)+h(q))/2 − solo(p) − solo(q). So the
    corpus-scaled work is one token count + one intersection
    equi-join on word; the #groups²-row pair universe comes from the
    tiny totals frame.

    Parity: every per-word term is 6-rounded then decimal-summed, and
    the published JSD combines five such exact sums — an exact
    multiple of 1e-6 in the reals, never a round-6 midpoint, so the
    final round is tie-safe by construction. Returns one row per
    unordered group pair: ``(src_a, src_b, n_common, jsd_bits)``."""
    def h(z):
        return -(z * F.log2(z))

    tok = _spread(df).select(F.col(group_col).alias("s"),
                             F.explode(tokens(text_col)).alias("w"))
    cnt = tok.groupBy("s", "w").agg(F.count("*").cast("bigint").alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").cast("bigint").alias("n"))
    pw = (cnt.join(tot, "s")
          .select("s", "w",
                  (F.col("c").cast("double") / F.col("n")).alias("p")))
    solo = pw.select(
        "s", "w", "p",
        F.round(h(F.col("p") / 2) - h(F.col("p")) / 2, 6).alias("solo6"))
    ssum = solo.groupBy("s").agg(
        F.sum(F.col("solo6").cast("decimal(18,6)")).cast("double")
        .alias("sv"))
    a = solo.select(F.col("s").alias("sa"), "w",
                    F.col("p").alias("pa"), F.col("solo6").alias("solo_a"))
    b = solo.select(F.col("s").alias("sb"), F.col("w").alias("wb"),
                    F.col("p").alias("pb"), F.col("solo6").alias("solo_b"))
    m = (F.col("pa") + F.col("pb")) / 2
    c6 = F.round(h(m) - (h(F.col("pa")) + h(F.col("pb"))) / 2, 6)
    inter = (a.join(b, (F.col("w") == F.col("wb"))
                    & (F.col("sa") < F.col("sb")))
             .groupBy("sa", "sb")
             .agg(F.count("*").cast("bigint").alias("n_common"),
                  F.sum(c6.cast("decimal(18,6)")).cast("double")
                  .alias("ci"),
                  F.sum(F.col("solo_a").cast("decimal(18,6)"))
                  .cast("double").alias("sai"),
                  F.sum(F.col("solo_b").cast("decimal(18,6)"))
                  .cast("double").alias("sbi")))
    ta = tot.select(F.col("s").alias("sa"))
    tb = tot.select(F.col("s").alias("sb"))
    pairs = ta.join(tb, F.col("sa") < F.col("sb"))
    sa_ = ssum.select(F.col("s").alias("sa"), F.col("sv").alias("sva"))
    sb_ = ssum.select(F.col("s").alias("sb"), F.col("sv").alias("svb"))
    return (pairs
            .join(F.broadcast(sa_), "sa").join(F.broadcast(sb_), "sb")
            .join(F.broadcast(inter), ["sa", "sb"], "left")
            .select(F.col("sa").alias("src_a"), F.col("sb").alias("src_b"),
                    F.coalesce("n_common", F.lit(0)).cast("bigint")
                    .alias("n_common"),
                    F.round((((F.col("sva") + F.col("svb"))
                              + F.coalesce(F.col("ci"), F.lit(0.0)))
                             - F.coalesce(F.col("sai"), F.lit(0.0)))
                            - F.coalesce(F.col("sbi"), F.lit(0.0)), 6)
                    .alias("jsd_bits")))


def good_turing_mass(df: DataFrame, text_col: str = "text",
                     group_col: str = "source") -> DataFrame:
    """Good-Turing missing-mass estimate per group — "how much of this
    source's distribution have I NOT seen yet": the total probability
    of unseen vocabulary is estimated by the singleton share N₁/N
    (Good 1953), the quantity that tells a curation plan whether a
    source is saturated (missing mass → 0, more scraping adds little)
    or still rich in unseen content — the probabilistic complement to
    the Heaps'-law growth CURVE (heaps_law_fit).

    One token-count pass per (group, word), then a per-group reduce
    over the count-of-counts — map-side combined, output is
    #groups-sized. Returns ``(group, n_tokens, vocab, n_singletons,
    n_doubletons, missing_mass)`` with the mass a 6-rounded count
    ratio (the tie-safe class)."""
    tok = _spread(df).select(F.col(group_col).alias("g"),
                             F.explode(tokens(text_col)).alias("w"))
    cnt = tok.groupBy("g", "w").agg(F.count("*").cast("bigint").alias("c"))
    return (cnt.groupBy("g")
            .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                 F.count("*").cast("bigint").alias("vocab"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_singletons"),
                 F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
                 .cast("bigint").alias("n_doubletons"))
            .select(F.col("g").alias(group_col), "n_tokens", "vocab",
                    "n_singletons", "n_doubletons",
                    F.round(F.col("n_singletons") / F.col("n_tokens"), 6)
                    .alias("missing_mass")))


def _regex_quote(s: str) -> str:
    """Java-regex literal quoting via \\Q...\\E (handles embedded \\E)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _regex_repl_quote(s: str) -> str:
    """Escape regexp_replace replacement metacharacters ($ and \\)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _bpe_pack(ps: Column) -> Column:
    """Piece array → one separator-framed string: each piece
    %-escaped ('%'→'%A', so the 2-char separator '%B' can never occur
    inside a piece), joined AND bracketed by '%B'. The packed form is
    what makes a merge application LINEAR (one regexp scan) instead of
    the O(pieces²) array-accumulator fold it replaced (round 15): the
    fold copied the whole accumulator array per element, which made
    bpe_encode's k chained merges quadratic in document length."""
    return F.concat(F.lit("%B"),
                    F.array_join(F.transform(
                        ps, lambda p: F.replace(p, F.lit("%"),
                                                F.lit("%A"))), "%B"),
                    F.lit("%B"))


def _bpe_unpack(s: Column) -> Column:
    """Inverse of :func:`_bpe_pack`: split on '%B', drop the empty
    boundary cells, un-escape '%A'→'%'. Pieces are never empty
    (BPE_PIECE_RE has no empty match), so every empty cell is a frame
    boundary."""
    return F.transform(
        F.filter(F.split(s, "%B"), lambda x: x != F.lit("")),
        lambda p: F.replace(p, F.lit("%A"), F.lit("%")))


def _bpe_apply_merge_packed(s: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of ONE learned BPE merge to a
    PACKED piece string (:func:`_bpe_pack`): every non-overlapping
    adjacent ``(left, right)`` occurrence collapses into the
    space-joined token ``left + ' ' + right``. One linear
    ``regexp_replace`` scan: the pattern anchors both ends on the
    piece separator with LOOKAROUND (``(?<=%B) … (?=%B)``), so the
    trailing separator is not consumed and abutting occurrences
    ``l,r,l,r`` both merge, while an odd run ``x,x,x`` under the merge
    ``(x,x)`` yields ``['x x', x]`` — the Sennrich convention, and
    exactly the semantics of the accumulator fold this replaced
    (within one application a merged token can never re-match: the
    match region is consumed and the replacement contains no
    separator). Merged tokens are collision-free because original
    pieces never contain spaces (BPE_PIECE_RE excludes them), so
    later rounds can merge merged tokens further — ``left``/``right``
    with spaces escape-then-quote to exactly the packed bytes earlier
    rounds produced."""
    el = left.replace("%", "%A")
    er = right.replace("%", "%A")
    pat = f"(?<=%B){_regex_quote(el)}%B{_regex_quote(er)}(?=%B)"
    return F.regexp_replace(s, pat, _regex_repl_quote(f"{el} {er}"))


def _bpe_apply_merge(ps: Column, left: str, right: str) -> Column:
    """Array-in/array-out wrapper over the packed linear merge — the
    shape bpe_train's per-round re-checkpoint consumes; bpe_encode
    packs ONCE and chains k packed merges instead."""
    return _bpe_unpack(_bpe_apply_merge_packed(_bpe_pack(ps), left, right))


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 3) -> DataFrame:
    """The BPE trainer's OUTER LOOP (Sennrich et al. 2016) — the
    bounded k-merge iteration q150's single statistic pass feeds,
    completing the tokenizer-training story: per round, count adjacent
    piece pairs (q150's map-side-combined statistic), pick the winner
    ((count desc, left asc, right asc) — q150's deterministic
    tie-break), apply it greedily to every document, repeat on the
    merged stream.

    The q47 Lloyd discipline at 100 TB: the corpus never moves —
    documents hold their (checkpointed) piece arrays and each round
    re-shuffles only map-side-combined PAIR PARTIALS into the
    pair-count keyspace; the driver collects exactly ONE winner row
    per round (k rows total over the whole run, the fixed-size-collect
    ledger class in SCALE.md) and re-broadcasts it as two string
    literals inside the next round's fold. Lineage is cut per round
    with an eager localCheckpoint (swap for a reliable checkpoint dir
    on a real cluster). Raises if a round finds no pair (corpus too
    small for ``n_merges`` — loud, not a silent short table).

    Returns the learned merge table, one row per round:
    ``(merge_rank, left_piece, right_piece, pair_count, merged)``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    docs = (df.select(bpe_pieces(_c(text_col)).alias("ps"))
            .localCheckpoint(eager=True))
    out = []
    for rank in range(1, n_merges + 1):
        pairs = F.zip_with(
            F.slice(F.col("ps"), 1,
                    F.greatest(F.size("ps") - 1, F.lit(0))),
            F.slice(F.col("ps"), 2,
                    F.greatest(F.size("ps") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")))
        win = (docs.select(F.explode(pairs).alias("p"))
               .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
               .agg(F.count("*").cast("bigint").alias("c"))
               .orderBy(F.col("c").desc(), F.col("l").asc(),
                        F.col("r").asc())
               .limit(1).collect())
        if not win:
            raise ValueError(
                f"bpe_train: no adjacent pair left at merge round {rank} "
                f"(corpus supports only {rank - 1} merges)")
        l, r, c = win[0]["l"], win[0]["r"], win[0]["c"]
        out.append((rank, l, r, c, f"{l} {r}"))
        if rank < n_merges:
            docs = (docs.select(_bpe_apply_merge(F.col("ps"), l, r)
                                .alias("ps"))
                    .localCheckpoint(eager=True))
    return spark.createDataFrame(
        out, "merge_rank bigint, left_piece string, right_piece string, "
             "pair_count bigint, merged string")


def bpe_encode(df: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """The APPLY half of the tokenizer story (:func:`bpe_train` learns,
    this encodes): re-play a learned merge table over the corpus piece
    stream — each merge applies greedily left-to-right in RANK ORDER
    (the same `_bpe_apply_merge` fold the trainer used, so train-then-
    encode round-trips bit-identically), appended as a ``tokens``
    column next to the raw ``pieces``.

    ``merges`` is an ordered sequence of ``(left, right)`` pairs (e.g.
    ``[(r.left_piece, r.right_piece) for r in bpe_train(...).collect()]``
    — k tiny rows, the fixed-size driver hand-off class). The k folds
    chain lazily into ONE narrow pass over the corpus: zero shuffles,
    embarrassingly parallel at 100 TB, the tokenizer-inference shape
    that runs ahead of every token-count/packing consumer (q61, q140).
    """
    pairs = [(str(l), str(r)) for l, r in merges]
    out = df.withColumn("pieces", bpe_pieces(_c(text_col)))
    # pack ONCE, chain the k linear regexp merges, unpack ONCE (round
    # 15): the per-merge array fold this replaced was O(pieces²) per
    # document PER MERGE (whole-accumulator copy per element)
    toks = _bpe_pack(F.col("pieces"))
    for l, r in pairs:
        toks = _bpe_apply_merge_packed(toks, l, r)
    return out.withColumn("tokens", _bpe_unpack(toks))


def hellinger_tv_matrix(df: DataFrame, text_col: str = "text",
                        group_col: str = "source") -> DataFrame:
    """Pairwise Hellinger distance and total-variation distance between
    per-group unigram distributions — two more distribution-drift
    geometries beside JS divergence (:func:`js_divergence_matrix`):
    TV is the worst-case probability gap (the testing bound), Hellinger
    upper-bounds TV and tensorizes across independent components.

    Same no-outer-join decomposition as JSD: with intersection I,
    TV(P,Q) = ½[Σ_I |p−q| + (1 − Σ_I p) + (1 − Σ_I q)] — a word absent
    from the other side contributes exactly its own mass, which folds
    PER PAIR from three intersection sums; the Bhattacharyya
    coefficient BC = Σ √(pq) is zero off-intersection, and
    Hellinger = √(1 − BC). Corpus-scaled work: one token count + one
    intersection equi-join on word; the #groups²-row pair universe
    comes from the tiny totals frame (the q175 audited shape).
    Parity: per-word |p−q| and √(pq) terms are 6-rounded then
    decimal-folded; the published combos are fixed double expressions,
    floor6. Returns one row per unordered pair:
    ``(src_a, src_b, n_common, tv, bc, hellinger)``."""
    tok = _spread(df).select(F.col(group_col).alias("s"),
                             F.explode(tokens(text_col)).alias("w"))
    cnt = tok.groupBy("s", "w").agg(F.count("*").cast("bigint").alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").cast("bigint").alias("n"))
    pw = (cnt.join(tot, "s")
          .select("s", "w",
                  (F.col("c").cast("double") / F.col("n")).alias("p")))
    a = pw.select(F.col("s").alias("sa"), "w", F.col("p").alias("pa"))
    b = pw.select(F.col("s").alias("sb"), F.col("w").alias("wb"),
                  F.col("p").alias("pb"))
    d6 = lambda c: F.round(c, 6).cast("decimal(18,6)")
    inter = (a.join(b, (F.col("w") == F.col("wb"))
                    & (F.col("sa") < F.col("sb")))
             .groupBy("sa", "sb")
             .agg(F.count("*").cast("bigint").alias("n_common"),
                  F.sum(d6(F.abs(F.col("pa") - F.col("pb"))))
                  .cast("double").alias("ti"),
                  F.sum(d6(F.sqrt(F.col("pa") * F.col("pb"))))
                  .cast("double").alias("bci"),
                  F.sum(d6(F.col("pa"))).cast("double").alias("ma"),
                  F.sum(d6(F.col("pb"))).cast("double").alias("mb")))
    ta = tot.select(F.col("s").alias("sa"))
    tb = tot.select(F.col("s").alias("sb"))
    pairs = ta.join(tb, F.col("sa") < F.col("sb"))
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    ti = F.coalesce(F.col("ti"), F.lit(0.0))
    bci = F.coalesce(F.col("bci"), F.lit(0.0))
    ma = F.coalesce(F.col("ma"), F.lit(0.0))
    mb = F.coalesce(F.col("mb"), F.lit(0.0))
    tv = (ti + (F.lit(1.0) - ma) + (F.lit(1.0) - mb)) / F.lit(2.0)
    # BC can exceed 1 by accumulated 1e-6 rounding on near-identical
    # distributions; clamp so hellinger never goes NaN
    bc_c = F.least(bci, F.lit(1.0))
    return (pairs
            .join(F.broadcast(inter), ["sa", "sb"], "left")
            .select(F.col("sa").alias("src_a"), F.col("sb").alias("src_b"),
                    F.coalesce("n_common", F.lit(0)).cast("bigint")
                    .alias("n_common"),
                    fl6(tv).alias("tv"), fl6(bci).alias("bc"),
                    fl6(F.sqrt(F.lit(1.0) - bc_c)).alias("hellinger")))


def tokenizer_fertility(df: DataFrame, text_col: str = "text",
                        group_col: str = "source") -> DataFrame:
    """Tokenizer fertility per group: BPE-ish pieces per whitespace
    word — the cost model a token-budgeted pipeline (quota q104,
    packing q88, batching q140) needs per SOURCE, because fertility is
    where punctuation-heavy or non-prose sources silently blow a token
    budget computed from word counts. Pure per-document size
    expressions (zero shuffle beyond the one keyed agg); both counts
    are exact BIGINT sums, ratios are fixed double expressions floor6.
    Returns ``(group, n_docs, n_words, n_pieces, fertility,
    pieces_per_doc)`` with fertility NULL for a group with no words."""
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    per = (df.where(F.col(text_col).isNotNull()
                    & F.col(group_col).isNotNull())
           .groupBy(F.col(group_col).alias("grp"))
           .agg(F.count("*").cast("bigint").alias("n_docs"),
                F.sum(token_count(text_col).cast("bigint"))
                .cast("bigint").alias("n_words"),
                F.sum(bpe_piece_count(text_col).cast("bigint"))
                .cast("bigint").alias("n_pieces")))
    return per.select(
        "grp", "n_docs", "n_words", "n_pieces",
        F.when(F.col("n_words") > 0,
               fl6(F.col("n_pieces").cast("double")
                   / F.col("n_words").cast("double"))).alias("fertility"),
        F.when(F.col("n_docs") > 0,
               fl6(F.col("n_pieces").cast("double")
                   / F.col("n_docs").cast("double")))
        .alias("pieces_per_doc"))


def ngram_cosine_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       top_k: int = 25,
                       max_df: int | None = None) -> DataFrame:
    """Sparse TF-IDF cosine similarity between DOCUMENT PAIRS over word
    n-gram vectors — the all-pairs companion to query-side TF-IDF/BM25
    (q77/q83): which documents point the same direction in n-gram
    space? Complements Jaccard (q91: set overlap, ignores counts) and
    MinHash (q29: approximate) with the exact count-weighted measure.

    Scale design — inverted-index candidate generation, never doc x
    doc: postings join on md5(gram) (uniform 32-byte key, narrow
    shuffle), so candidate cost is Σ_g df(g)² over the n-GRAM
    dictionary — n ≥ 3 keeps df small where a unigram index would
    degenerate on a stopword (pass ``max_df`` to drop grams above a
    document-frequency cap: the standard stopword prune, applied
    identically in the oracle). Weights are the q77 recipe
    (round(tf · round(ln(N/df), 6), 6)); dot products and squared
    norms are decimal(38,10) sums of double products (partition-order
    free); sqrt is IEEE-exact; the final cosine is floor6 with a
    (cosine desc, id_a, id_b) total order. Returns
    ``(id_a, id_b, dot, cosine)`` top-k rows."""
    t = tokens(text_col)
    grams = _shifted_grams(t, F.size(t) - (n - 1), n, " ")
    ti = (_spread(df)
          .select(F.col(id_col), F.explode(grams).alias("g"))
          .select(id_col, F.md5("g").alias("gh"))
          .groupBy(id_col, "gh")
          .agg(F.count("*").cast("bigint").alias("tf"))
          .persist())
    dfreq = ti.groupBy("gh").agg(F.count("*").cast("bigint").alias("df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df") <= max_df)
    nd = df.agg(F.count_distinct(F.col(id_col)).cast("bigint").alias("N"))
    idf6 = F.round(F.log(F.col("N").cast("double")
                         / F.col("df").cast("double")), 6)
    # persist the weight frame too (round 15): w feeds THREE branches
    # (norms + both sides of the postings self-join) and without the
    # cache each branch re-runs the ti⋈dfreq join and the idf rounding
    # from the cached index — measured 4.7 → 3.9 s at sf0.1
    w = (ti.join(dfreq, "gh").crossJoin(F.broadcast(nd))
         .select(id_col, "gh",
                 F.round(F.col("tf").cast("double") * idf6, 6).alias("w"))
         .persist())
    norms = (w.groupBy(id_col)
             .agg(F.sqrt(F.sum((F.col("w") * F.col("w"))
                               .cast("decimal(38,10)")).cast("double"))
                  .alias("nrm")))
    a = w.select(F.col(id_col).alias("id_a"), "gh", F.col("w").alias("wa"))
    b = w.select(F.col(id_col).alias("id_b"),
                 F.col("gh").alias("gh2"), F.col("w").alias("wb"))
    dots = (a.join(b, (F.col("gh") == F.col("gh2"))
                   & (F.col("id_a") < F.col("id_b")))
            .groupBy("id_a", "id_b")
            .agg(F.sum((F.col("wa") * F.col("wb"))
                       .cast("decimal(38,10)")).alias("dot")))
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nb"))
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    out = (dots.join(na, "id_a").join(nb, "id_b")
           .where((F.col("na") > 0) & (F.col("nb") > 0))
           .select("id_a", "id_b",
                   fl6(F.col("dot").cast("double")).alias("dot"),
                   fl6(F.col("dot").cast("double")
                       / (F.col("na") * F.col("nb"))).alias("cosine"))
           .orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
           .limit(top_k))
    res = out.localCheckpoint(eager=True)
    ti.unpersist()
    w.unpersist()
    return res


def token_coverage_curve(df: DataFrame, text_col: str = "text",
                         ks=(1, 2, 5, 10, 20)) -> DataFrame:
    """Corpus token-mass coverage curve — what share of ALL tokens do
    the top-k vocabulary terms cover? The tokenizer/vocab-sizing
    companion to Zipf (q111 fits the slope) and Heaps (q165 fits
    growth): a fast-saturating curve says a small vocab suffices; a
    flat one says the tail matters.

    One map-side-combined unigram count (|vocab| rows), a total-order
    rank window over the vocab frame only (count desc, term asc), one
    cumulative sum, then each requested k reads off a pure monotone
    aggregate. Returns ``(k, n_terms, covered_tokens, coverage)``
    ordered by k — coverage floor6, exact BIGINT token counts."""
    counts = (_spread(df)
              .select(F.explode(tokens(text_col)).alias("term"))
              .groupBy("term")
              .agg(F.count("*").cast("bigint").alias("c")))
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    wc = (Window.orderBy(F.desc("c"), F.asc("term"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = counts.agg(F.sum("c").cast("bigint").alias("tot"))
    staged = (counts.withColumn("rk", F.row_number().over(w))
              .withColumn("cum", F.sum("c").over(wc))
              .crossJoin(F.broadcast(tot))
              .withColumn("k", F.explode(F.array(
                  *[F.lit(int(k)) for k in ks])))
              .where(F.col("rk") <= F.col("k")))
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    return (staged.groupBy("k")
            .agg(F.max("rk").cast("bigint").alias("n_terms"),
                 F.max("cum").cast("bigint").alias("covered_tokens"),
                 fl6(F.max("cum").cast("double")
                     / F.max(F.col("tot").cast("double")))
                 .alias("coverage"))
            .orderBy("k"))


def vocab_richness(df: DataFrame, text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Per-group vocabulary richness — type-token ratio and hapax
    share, the lexical-diversity screen beside Heaps' growth fit
    (q165) and tokenizer fertility (q198): a source whose TTR
    collapses is template/boilerplate-heavy; a high hapax share means
    the vocabulary tail is still growing (deduplication and
    quality-filter tuning both read this).

    One (group, term) count aggregate (map-side combined), then one
    |group-vocab|-row reduction — the corpus is scanned once and
    never re-shuffled. Exact BIGINT counts; ratios floor6. Returns
    ``(group, n_tokens, n_types, n_hapax, ttr, hapax_share)``."""
    per = (_spread(df)
           .where(F.col(group_col).isNotNull())
           .select(F.col(group_col).alias("g"),
                   F.explode(tokens(text_col)).alias("term"))
           .groupBy("g", "term")
           .agg(F.count("*").cast("bigint").alias("c")))
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    return (per.groupBy(F.col("g").alias(group_col))
            .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                 F.count("*").cast("bigint").alias("n_types"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_hapax"))
            .select(group_col, "n_tokens", "n_types", "n_hapax",
                    fl6(F.col("n_types").cast("double")
                        / F.col("n_tokens").cast("double")).alias("ttr"),
                    fl6(F.col("n_hapax").cast("double")
                        / F.col("n_types").cast("double"))
                    .alias("hapax_share"))
            .orderBy(group_col))


def script_audit(df: DataFrame, text_col: str = "text",
                 group_col: str = "source") -> DataFrame:
    """Per-group character-class composition — the cheap multilingual
    curation screen before a real language-ID model: what fraction of
    each source's bytes are ASCII letters / digits / whitespace /
    punctuation-and-other? Sudden shifts in the "other" mass catch
    encoding breaks, markup floods, and non-Latin script drift that
    token-level quality rules (q28) are blind to.

    Pure length arithmetic — every class count is
    ``length(text) − length(regexp_replace(text, class, ''))``, an
    exact BIGINT in any engine; one map-side-combined groupBy on the
    group key; ratios are single double divisions, floor6. Returns one
    row per group: ``(group, n_docs, n_chars, letter_ratio,
    digit_ratio, space_ratio, other_ratio)`` ordered by group."""
    t = _c(text_col)
    n_chars = F.length(t).cast("bigint")

    def cls(pattern: str) -> Column:
        return (F.length(t)
                - F.length(F.regexp_replace(t, pattern, ""))).cast("bigint")

    letters = cls("[A-Za-z]")
    digits = cls("[0-9]")
    spaces = cls(WS_CLASS)
    base = (df.where(_c(group_col).isNotNull() & t.isNotNull())
            .select(_c(group_col).alias("__g"),
                    n_chars.alias("__n"), letters.alias("__l"),
                    digits.alias("__d"), spaces.alias("__s")))
    agg = base.groupBy("__g").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("__n").cast("bigint").alias("n_chars"),
        F.sum("__l").cast("bigint").alias("__lt"),
        F.sum("__d").cast("bigint").alias("__dt"),
        F.sum("__s").cast("bigint").alias("__st"))
    fl6 = lambda c: (F.floor(c * F.lit(1_000_000.0) + F.lit(0.5))
                     .cast("double") / F.lit(1_000_000.0))
    nd = F.col("n_chars").cast("double")
    r = lambda c: F.when(F.col("n_chars") > 0, fl6(c.cast("double") / nd)) \
        .otherwise(F.lit(0.0))
    return (agg.select(
        F.col("__g").alias("group"), "n_docs", "n_chars",
        r(F.col("__lt")).alias("letter_ratio"),
        r(F.col("__dt")).alias("digit_ratio"),
        r(F.col("__st")).alias("space_ratio"),
        r(F.col("n_chars") - F.col("__lt") - F.col("__dt")
          - F.col("__st")).alias("other_ratio"))
        .orderBy("group"))
