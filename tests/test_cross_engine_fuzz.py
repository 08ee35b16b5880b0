"""Deterministic cross-engine fuzz: the tokenizer/fingerprint surface must
agree byte-for-byte between Spark (Java regex/UTF-8) and DuckDB (RE2/UTF-8)
on ADVERSARIAL documents — mixed unicode, every whitespace control char
(incl. the Java-vs-RE2 \\x0B divergence the explicit WS_CLASS guards),
punctuation runs, empty and whitespace-only strings. The driver regenerates
fixtures every round, so any divergence here is a future hash-mismatch on a
currently-green query; this test finds it before a fixture does.

Seeded RNG, fixed corpus: zero flake surface.
"""

import random

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import text as tx

ALPHABET = (
    list("abcXYZ0129.,;:!?#@/-_'\"()")
    + ["é", "ß", "中", "ñ", "Ω"]                    # multibyte codepoints
    + [" ", "\t", "\n", "\r", "\f", "\x0b", "  "]   # incl. vertical tab
)


def _corpus(n_docs=24, max_len=60, seed=1234):
    rng = random.Random(seed)
    docs = [(i, "".join(rng.choice(ALPHABET)
                        for _ in range(rng.randrange(0, max_len))))
            for i in range(n_docs)]
    # pin the pathological shapes explicitly
    docs += [(100, ""), (101, " \t\n\x0b "), (102, "one"),
             (103, "\x0bhttp://a.b\x0b"), (104, "é中 ß\tΩ ñ")]
    return docs


@pytest.fixture(scope="module")
def fuzz_frames(spark):
    docs = _corpus()
    sdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    yield sdf, con
    con.close()


def test_tokens_and_fingerprints_agree(fuzz_frames):
    sdf, con = fuzz_frames
    got = {r.doc_id: (r.t, r.fp, r.rfp, r.np) for r in sdf.select(
        "doc_id",
        tx.tokens("text").alias("t"),
        tx.fingerprint("text").alias("fp"),
        tx.rolling_fingerprint("text").alias("rfp"),
        tx.bpe_piece_count("text").alias("np")).collect()}
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(rf"""
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                 '[ \t\n\r\f\x0B]+'), x -> x <> ''),
               md5(trim(regexp_replace(lower(text),
                 '[ \t\n\r\f\x0B]+', ' ', 'g'))),
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, length(trim(
                   regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))),
                   i -> CAST(ascii(substr(trim(regexp_replace(lower(text),
                        '[ \t\n\r\f\x0B]+', ' ', 'g')), i, 1)) AS BIGINT))),
                 (acc, x) -> (acc * 131 + x) % 1000000007),
               CAST(len(regexp_extract_all(lower(text),
                 '{tx.BPE_PIECE_RE}')) AS INT)
        FROM documents""").fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], f"doc {i}: {got[i]} vs {want[i]}"


def test_word_shingle_digests_agree(fuzz_frames):
    """The contamination/minhash join keys — md5 over word 3-grams — must
    collide identically across engines on the nasty corpus."""
    sdf, con = fuzz_frames
    got = {r.doc_id: sorted(r.g) for r in sdf.select(
        "doc_id",
        F.transform(tx.word_ngrams("text", 3), F.md5).alias("g")).collect()}
    want = {r[0]: sorted(r[1]) for r in con.execute(r"""
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                   '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
          FROM documents)
        SELECT doc_id,
               list_transform(list_distinct(list_transform(
                 generate_series(1, greatest(len(t) - 2, 0)),
                 i -> array_to_string(list_slice(t, i, i + 2), ' '))),
                 g -> md5(g))
        FROM toks""").fetchall()}
    assert got == want


def test_pii_redaction_agrees(fuzz_frames):
    sdf, con = fuzz_frames
    got = {r.doc_id: r.c for r in
           sdf.select("doc_id", tx.redact_pii("text").alias("c")).collect()}
    url, email, ip = (p for _, p, _ in tx.PII_RULES)
    want = {r[0]: r[1] for r in con.execute(f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '{url}', '<URL>', 'g'),
                 '{email}', '<EMAIL>', 'g'),
                 '{ip}', '<IP>', 'g')
        FROM documents""").fetchall()}
    assert got == want


def test_char_entropy_agrees(fuzz_frames):
    """q105's zero-shuffle entropy vs the oracle's grouped-count ordered
    fold — the char-split surface (Spark lookahead split vs DuckDB
    substr indexing) must agree on multibyte codepoints, control chars,
    and empty/whitespace-only docs."""
    sdf, con = fuzz_frames
    got = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.char_entropy)
           for r in tx.char_entropy(sdf).collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute("""
        WITH ch AS (
          SELECT doc_id, substr(text, i, 1) AS c
          FROM (SELECT doc_id, text,
                       unnest(generate_series(1, length(text))) AS i
                FROM documents)),
        cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        pl AS (SELECT doc_id, list(CAST(n AS BIGINT) ORDER BY c) AS lens,
                      CAST(count(*) AS INT) AS k
               FROM cnt GROUP BY 1)
        SELECT d.doc_id, CAST(length(d.text) AS INT),
               COALESCE(pl.k, 0),
               CASE WHEN length(d.text) > 0 THEN
                 round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(pl.lens,
                         c -> CAST(c AS DOUBLE) *
                              round(ln(CAST(c AS DOUBLE)
                                       / length(d.text)), 6))),
                     (acc, x) -> acc + x) / length(d.text), 6)
               ELSE 0.0 END
        FROM documents d LEFT JOIN pl USING (doc_id)""").fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], f"doc {i}: {got[i]} vs {want[i]}"


def test_funnel_rule_booleans_agree(fuzz_frames):
    """q103's per-rule keep/drop decisions on the adversarial corpus:
    the funnel aggregates must match the oracle's boolean cascade (line
    splitting, trim semantics, null-guard coalescing)."""
    sdf, con = fuzz_frames
    got = [(r["stage"], r["rule"], r["n_in"], r["n_kept"], r["n_dropped"])
           for r in tx.filter_funnel(sdf).collect()]
    want = con.execute(r"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(lower(text),
                   '[ \t\n\r\f\x0B]+'), x -> x != '')) AS n_tok,
                 length(text) AS n_chars,
                 len(list_filter(regexp_split_to_array(lower(text),
                   '[ \t\n\r\f\x0B]+'), x -> x IN ('the','a','an','and',
                   'or','of','to','in','is','are','was','were','be','been',
                   'it','that','this','with','as','for','on','at','by',
                   'from','not','but'))) AS n_stop,
                 length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                   AS n_punct,
                 list_filter(string_split(text, chr(10)),
                             x -> trim(x) <> '') AS lines
          FROM documents),
        b AS (
          SELECT
            COALESCE(n_tok >= 5, FALSE) AS b1,
            COALESCE(n_tok <= 100000, FALSE) AS b2,
            COALESCE(CASE WHEN n_tok > 0 THEN
                CAST(n_chars AS DOUBLE)/n_tok >= 2
                AND CAST(n_chars AS DOUBLE)/n_tok <= 12 END, FALSE) AS b3,
            COALESCE(CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE)/n_tok
                          ELSE 0.0 END >= 0.05, FALSE) AS b4,
            COALESCE(CASE WHEN n_chars > 0 THEN
                          CAST(n_punct AS DOUBLE)/n_chars
                          ELSE 0.0 END <= 0.2, FALSE) AS b5,
            COALESCE(CASE WHEN len(lines) > 0 THEN
                1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines)
                ELSE 0.0 END <= 0.3, FALSE) AS b6
          FROM t),
        c AS (
          SELECT b1 AS c1, b1 AND b2 AS c2, b1 AND b2 AND b3 AS c3,
                 b1 AND b2 AND b3 AND b4 AS c4,
                 b1 AND b2 AND b3 AND b4 AND b5 AS c5,
                 b1 AND b2 AND b3 AND b4 AND b5 AND b6 AS c6
          FROM b),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
                 CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
                 CAST(sum(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS s5,
                 CAST(sum(CASE WHEN c6 THEN 1 ELSE 0 END) AS BIGINT) AS s6
          FROM c)
        SELECT CAST(1 AS INT), 'min_tokens', n0, s1, n0 - s1 FROM a
        UNION ALL SELECT 2, 'max_tokens', s1, s2, s1 - s2 FROM a
        UNION ALL SELECT 3, 'mean_word_len', s2, s3, s2 - s3 FROM a
        UNION ALL SELECT 4, 'stopword_ratio', s3, s4, s3 - s4 FROM a
        UNION ALL SELECT 5, 'punct_ratio', s4, s5, s4 - s5 FROM a
        UNION ALL SELECT 6, 'dup_lines', s5, s6, s5 - s6 FROM a
        ORDER BY 1""").fetchall()
    assert got == [tuple(r) for r in want]
