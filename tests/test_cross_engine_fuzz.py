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
