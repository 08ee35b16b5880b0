"""Laws for line-level boilerplate removal (q151) and the one-pass
correlation matrix (q152)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import text as tx


def test_boilerplate_removed_content_kept(spark):
    docs = spark.createDataFrame([
        Row(source="s", doc_id=1, text="NAV\nhello world\nFOOTER"),
        Row(source="s", doc_id=2, text="NAV\nother content\nFOOTER"),
        Row(source="s", doc_id=3, text="NAV\nthird thing\nFOOTER"),
        # different source: its NAV appears once there -> kept
        Row(source="t", doc_id=4, text="NAV\nunrelated\n"),
    ])
    out = {r.doc_id: r for r in tx.remove_boilerplate_lines(
        docs, max_df_frac=0.5, min_df=2).collect()}
    assert out[1].clean_text == "hello world"
    assert out[2].clean_text == "other content"
    assert out[1].n_lines_removed == 2  # NAV + FOOTER
    # source t: NAV df=1 < min_df -> kept, blank line dropped silently
    assert out[4].clean_text == "NAV\nunrelated"
    assert out[4].n_lines_removed == 0


def test_boilerplate_preserves_line_order(spark):
    docs = spark.createDataFrame([
        Row(source="s", doc_id=i,
            text="SPAM\n" + "\n".join(f"line{i}_{j}" for j in range(5)))
        for i in range(4)])
    out = tx.remove_boilerplate_lines(docs).collect()
    for r in out:
        body = r.clean_text.split("\n")
        assert body == sorted(body, key=lambda s: int(s.split("_")[1]))
        assert all(p.startswith(f"line{r.doc_id}_") for p in body)


def test_boilerplate_all_removed_yields_empty(spark):
    docs = spark.createDataFrame(
        [Row(source="s", doc_id=i, text="ONLY BOILER") for i in range(3)])
    out = tx.remove_boilerplate_lines(docs).collect()
    assert all(r.clean_text == "" and r.n_lines_kept == 0
               and r.n_lines_removed == 1 for r in out)
    with pytest.raises(ValueError, match="max_df_frac"):
        tx.remove_boilerplate_lines(docs, max_df_frac=0.0)


def test_correlation_matrix_exact_values(spark):
    rows = [Row(a=float(i), b=2.0 * i + 1, c=float(-i), d=5.0)
            for i in range(50)]
    df = spark.createDataFrame(rows)
    out = {(r.col_a, r.col_b): r for r in
           st.correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")].corr == 1.0     # perfectly linear
    assert out[("a", "c")].corr == -1.0
    assert out[("a", "d")].corr is None    # zero-variance column -> NULL
    assert out[("a", "b")].n_rows == 50


def test_correlation_matrix_complete_case(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (3.0, 2.0), (4.0, 4.0)], "a DOUBLE, b DOUBLE")
    out = st.correlation_matrix(df, ["a", "b"]).collect()[0]
    assert out.n_rows == 3  # the NULL row is excluded once, up front
    # hand Pearson over (1,1),(3,2),(4,4)
    xs, ys = [1, 3, 4], [1, 2, 4]
    n = 3
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(n * sum(x * x for x in xs) - sum(xs) ** 2) * \
        math.sqrt(n * sum(y * y for y in ys) - sum(ys) ** 2)
    assert abs(out.corr - round(num / den, 6)) <= 1e-6
    with pytest.raises(ValueError, match="at least 2"):
        st.correlation_matrix(df, ["a"])


# ------------------------------------------------------------ CDC chunking

def _chunks(spark, txt, doc_id=1):
    df = spark.createDataFrame([Row(doc_id=doc_id, text=txt)])
    return sorted(tx.cdc_chunk_rows(df).collect(),
                  key=lambda r: r.chunk_idx)


def test_cdc_chunks_partition_the_document(spark):
    import hashlib
    import random
    rnd = random.Random(11)
    txt = "".join(rnd.choice("abcdefgh ") for _ in range(2000))
    rows = _chunks(spark, txt)
    assert sum(r.chunk_len for r in rows) == 2000
    assert len(rows) > 5  # ~2000/64 expected boundaries
    # chunk hashes are md5 of the actual substrings, in order
    pos = 0
    for r in rows:
        seg = txt[pos:pos + r.chunk_len]
        assert hashlib.md5(seg.encode()).hexdigest() == r.chunk_md5
        pos += r.chunk_len


def test_cdc_shift_robustness(spark):
    """A prefix edit must realign: all chunks after the first boundary
    are IDENTICAL between the original and the prefixed document —
    the property fixed-width chunking lacks."""
    import random
    rnd = random.Random(7)
    txt = "".join(rnd.choice("abcdefgh ") for _ in range(1500))
    a = {r.chunk_md5 for r in _chunks(spark, txt)}
    b = {r.chunk_md5 for r in _chunks(spark, "PREFIX-EDIT " + txt, 2)}
    shared = a & b
    assert len(shared) >= len(a) - 2  # only the head chunk may differ


def test_cdc_report_counts_shared_footer(spark):
    import random
    rnd = random.Random(13)
    # high-entropy FIXED tail: periodic text has too few distinct
    # 8-grams to guarantee a boundary inside the shared region
    tail = "".join(rnd.choice("abcdefgh ") for _ in range(600))
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique head {i} " * 20 + tail)
         for i in range(6)])
    rep = tx.cdc_dedup_report(docs).collect()
    # shared-tail chunks repeat in every doc (intra-doc repeats from the
    # periodic head may rank even higher — also correct detection)
    assert any(r.n_occurrences >= 6 for r in rep)
    assert rep[0].dup_share > 0.2
    with pytest.raises(ValueError, match="window"):
        tx.cdc_chunk_rows(docs, window=1)
    with pytest.raises(ValueError, match="modulus"):
        tx.cdc_chunk_rows(docs, modulus=1)
