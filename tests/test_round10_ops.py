"""Round-10-born operators: the BPE trainer outer loop (q185) and encode
half (q186), the streaming ROC-AUC twin, chi-square independence (q187),
Spearman rank correlation (q188), and value-mass Gini (q189)."""
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


class TestChisqIndependence:
    def test_perfect_association_2x2(self, spark):
        # a->0 x3, b->1 x3: chi2 = N = 6 exactly, V = 1, with two
        # EMPTY cells exercising the analytic zero-cell correction
        from powerdatapipeline_spark.operators import stats as st
        rows = [("a", "0")] * 3 + [("b", "1")] * 3
        df = spark.createDataFrame(rows, "x string, y string")
        r = st.chisq_independence(df, "x", "y").collect()[0]
        assert (r["n"], r["x_levels"], r["y_levels"], r["dof"]) \
            == (6, 2, 2, 1)
        assert r["chi2"] == 6.0
        assert r["cramers_v"] == 1.0

    def test_dense_table_hand_value(self, spark):
        # a0:2 a1:1 b0:1 b1:2 -> each cell term (0.25/1.5) rounds to
        # 0.166667; four terms sum to 0.666668 (rounding discipline:
        # per-term 6-round into exact decimal)
        from powerdatapipeline_spark.operators import stats as st
        rows = ([("a", "0")] * 2 + [("a", "1")] + [("b", "0")]
                + [("b", "1")] * 2)
        df = spark.createDataFrame(rows, "x string, y string")
        r = st.chisq_independence(df, "x", "y").collect()[0]
        assert r["chi2"] == 0.666668

    def test_null_rows_excluded_and_single_level_degenerate(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        rows = [("a", "0"), ("a", "1"), (None, "0"), ("a", None)]
        df = spark.createDataFrame(rows, "x string, y string")
        r = st.chisq_independence(df, "x", "y").collect()[0]
        assert (r["n"], r["x_levels"], r["dof"]) == (2, 1, 0)
        assert r["chi2"] == 0.0
        assert r["cramers_v"] is None


class TestSpearmanCorr:
    def _df(self, spark, pts):
        return spark.createDataFrame(pts, "x double, y double")

    def test_perfect_monotone_nonlinear(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        pts = [(1.0, 1.0), (2.0, 8.0), (3.0, 27.0), (4.0, 64.0)]
        r = st.spearman_corr(self._df(spark, pts), "x", "y").collect()[0]
        assert r["rho"] == 1.0
        assert (r["n"], r["x_distinct"], r["y_distinct"]) == (4, 4, 4)

    def test_perfect_inverse(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        pts = [(1.0, 9.0), (2.0, 4.0), (3.0, 1.0)]
        r = st.spearman_corr(self._df(spark, pts), "x", "y").collect()[0]
        assert r["rho"] == -1.0

    def test_ties_hand_computed(self, spark):
        # x = 1,2,2,3 ; y = 10,20,20,30: tie-averaged ranks are
        # identical (1, 2.5, 2.5, 4) -> rho exactly 1
        from powerdatapipeline_spark.operators import stats as st
        pts = [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 30.0)]
        r = st.spearman_corr(self._df(spark, pts), "x", "y").collect()[0]
        assert r["rho"] == 1.0
        assert (r["x_distinct"], r["y_distinct"]) == (3, 3)

    def test_tie_break_partial_hand_value(self, spark):
        # x = 1,2,3,4 with y = 1,1,2,2: rank_y = (1.5,1.5,3.5,3.5),
        # rank_x = (1,2,3,4). Pearson on ranks:
        # cov = sum(rx*ry) - n*mx*my = (1.5+3+10.5+14) - 4*2.5*2.5 = 4
        # var_x = 30 - 25 = 5 ; var_y = (2.25+2.25+12.25+12.25) - 25 = 4
        # rho = 4 / sqrt(20) = 0.894427
        from powerdatapipeline_spark.operators import stats as st
        pts = [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 2.0)]
        r = st.spearman_corr(self._df(spark, pts), "x", "y").collect()[0]
        assert r["rho"] == 0.894427

    def test_constant_column_null_and_nulls_excluded(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        pts = [(1.0, 5.0), (2.0, 5.0), (None, 1.0), (3.0, None)]
        r = st.spearman_corr(self._df(spark, pts), "x", "y").collect()[0]
        assert r["n"] == 2
        assert r["rho"] is None


class TestGiniConcentration:
    def test_hand_values(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        # group a: [1,1,2] sorted -> sum i*x = 1+2+6 = 9; total 4, n 3
        #   G = 2*9/(3*4) - 4/3 = 1.5 - 1.333333... -> floor6 0.166667
        # group b: perfect equality [5,5] -> G = 2*15/(2*10) - 3/2 = 0
        # group c: total concentration [0,0,7]
        #   sum i*x = 21, G = 42/(3*7) - 4/3 = 2 - 1.333333 = 0.666667
        rows = ([("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 5),
                 ("c", 0), ("c", 0), ("c", 7)])
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["g"]: r for r in
               st.gini_concentration(df, "v", keys=("g",)).collect()}
        assert (out["a"]["n"], out["a"]["total"]) == (3, 4)
        assert out["a"]["gini"] == 0.166667
        assert out["b"]["gini"] == 0.0
        assert out["c"]["gini"] == 0.666667

    def test_zero_total_and_nulls_and_negatives(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        rows = [("z", 0), ("z", 0), ("z", None), ("z", -3)]
        df = spark.createDataFrame(rows, "g string, v long")
        r = st.gini_concentration(df, "v", keys=("g",)).collect()[0]
        # NULL and negative values excluded; zero-mass group -> NULL G
        assert (r["n"], r["total"]) == (2, 0)
        assert r["gini"] is None


class TestStreamingKsDrift:
    def test_streaming_equals_batch_ks(self, spark, tmp_path):
        import os
        import time

        from pyspark.sql import types as T

        from powerdatapipeline_spark.operators import stats as st
        from powerdatapipeline_spark.streaming.stateful import (
            finalize_ks_drift, streaming_ks_drift)

        ref_vals = [1.0, 2.0, 2.0, 3.0, 5.0]
        b1 = [2.0, 4.0, None]
        b2 = [4.0, 6.0, 2.0]

        src = tmp_path / "in"
        src.mkdir()
        for i, batch in enumerate([b1, b2]):
            f = src / f"{i}.csv"
            with open(f, "w") as fh:
                fh.write("v\n")
                for x in batch:
                    fh.write(("" if x is None else str(x)) + "\n")
            t0 = time.time() - 60 * (2 - i)
            os.utime(f, (t0, t0))

        schema = T.StructType([T.StructField("v", T.DoubleType())])
        stream = (spark.readStream.schema(schema)
                  .option("header", "true")
                  .option("maxFilesPerTrigger", "1").csv(str(src)))
        q = streaming_ks_drift(stream, "v", str(tmp_path / "p"),
                               str(tmp_path / "ck"))
        assert q.awaitTermination(120)

        ref = spark.createDataFrame([(x,) for x in ref_vals],
                                    "v double")
        got = finalize_ks_drift(spark, ref, "v",
                                str(tmp_path / "p")).collect()[0]

        # batch oracle: same rows through ks_test with a group column
        rows = ([("a", x) for x in ref_vals]
                + [("b", x) for x in b1 + b2 if x is not None])
        both = spark.createDataFrame(rows, "g string, v double")
        want = st.ks_test(both, "v", "g", "a", "b").collect()[0]
        assert got.asDict() == want.asDict()
        # hand check (n_a = n_b = 5): cum_a = 1,3,4,4,5,5 and
        # cum_b = 0,2,2,4,4,5 over sorted values 1,2,3,4,5,6 ->
        # |cum_a - cum_b| peaks at v=3 (4 vs 2) -> D = 2/5
        assert got["d"] == 0.4
        assert got["d_at"] == 3.0
