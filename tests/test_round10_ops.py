"""Round-10-born operators: the BPE trainer outer loop (q185) and the
streaming ROC-AUC twin."""
import pytest
from pyspark.sql import Row

from powerdatapipeline_spark.operators import text as tx


def _docs(spark, texts):
    return spark.createDataFrame([Row(text=t) for t in texts])


class TestBpeTrain:
    def test_two_merge_hand_corpus(self, spark):
        """Hand-derivable 2-merge corpus:
        doc1 pieces [low, er, low, er, low]; doc2 [low, est].
        Round 1 pairs: (low,er)x2, (er,low)x2, (low,est)x1 — tie on 2
        breaks to (er,low) < (low,er)?? No: tie-break is (count desc,
        LEFT asc, right asc) -> 'er' < 'low', winner (er, low) c=2.
        Apply to doc1: [low, 'er low', 'er low'] (greedy left-to-right:
        positions 2 and 4 match, non-overlapping).
        Round 2 pairs: (low,'er low')x1, ('er low','er low')x1,
        (low,est)x1 — all 1, left asc: 'er low' < 'low', winner
        ('er low', 'er low') c=1."""
        out = tx.bpe_train(
            _docs(spark, ["low er low er low", "low est"]), n_merges=2)
        rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
        assert rows == [
            (1, "er", "low", 2, "er low"),
            (2, "er low", "er low", 1, "er low er low"),
        ]

    def test_repeated_token_greedy_nonoverlap(self, spark):
        # [x x x x x]: 4 adjacent (x,x) pairs counted, but greedy
        # application merges floor(5/2)=2 pairs -> [xx, xx, x]; round
        # 2 ties at count 1 between ('x x','x x') and ('x x','x') and
        # the (left asc, right asc) break picks 'x' < 'x x'
        out = tx.bpe_train(_docs(spark, ["x x x x x"]), n_merges=2)
        rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
        assert rows[0] == (1, "x", "x", 4, "x x")
        assert rows[1] == (2, "x x", "x", 1, "x x x")

    def test_exhausted_corpus_raises(self, spark):
        with pytest.raises(ValueError, match="supports only 1 merges"):
            tx.bpe_train(_docs(spark, ["a b"]), n_merges=2)

    def test_bad_n_merges_raises(self, spark):
        with pytest.raises(ValueError, match="n_merges"):
            tx.bpe_train(_docs(spark, ["a b"]), n_merges=0)

    def test_merged_tokens_chain_across_rounds(self, spark):
        # round-1 winner (a,b) -> 'a b'; round 2 must see 'a b' as an
        # ordinary token and merge ('a b', c)
        out = tx.bpe_train(
            _docs(spark, ["a b c", "a b c", "a b"]), n_merges=2)
        rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
        assert rows == [
            (1, "a", "b", 3, "a b"),
            (2, "a b", "c", 2, "a b c"),
        ]


class TestStreamingBinaryAuc:
    def _write_csv(self, d, name, rows):
        import os
        import time
        f = d / name
        with open(f, "w") as fh:
            fh.write("score,label\n")
            for s, y in rows:
                fh.write(f"{'' if s is None else s},"
                         f"{'' if y is None else str(y).lower()}\n")
        return f

    def test_streaming_equals_batch_across_microbatches(self, spark,
                                                        tmp_path):
        from pyspark.sql import types as T

        from powerdatapipeline_spark.operators import stats as st
        from powerdatapipeline_spark.streaming.stateful import (
            finalize_binary_auc, streaming_binary_auc)

        # ties across batches + NULL rows: the per-score partials for
        # score 0.5 land in BOTH batches and must merge by addition;
        # the NULL rows must be excluded by the shared half
        b1 = [(0.9, True), (0.5, True), (0.5, False), (0.1, False),
              (None, True)]
        b2 = [(0.5, True), (0.5, False), (0.7, True), (0.1, False),
              (0.2, None)]
        src = tmp_path / "in"
        src.mkdir()
        import os
        import time
        f1 = self._write_csv(src, "a.csv", b1)
        f2 = self._write_csv(src, "b.csv", b2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))

        schema = T.StructType([T.StructField("score", T.DoubleType()),
                               T.StructField("label", T.BooleanType())])
        stream = (spark.readStream.schema(schema).option("header", "true")
                  .option("maxFilesPerTrigger", "1").csv(str(src)))
        q = streaming_binary_auc(stream, "score", "label",
                                 str(tmp_path / "partials"),
                                 str(tmp_path / "ckpt"))
        assert q.awaitTermination(120)
        got = finalize_binary_auc(spark,
                                  str(tmp_path / "partials")).collect()

        batch_df = spark.createDataFrame(b1 + b2, schema)
        want = st.binary_auc(batch_df, "score", "label").collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
        r = got[0]
        # score 0.2 appears only with a NULL label, so it is excluded
        # entirely: 4 surviving distinct scores
        assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (4, 4, 4)
