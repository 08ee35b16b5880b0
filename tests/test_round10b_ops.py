"""Round-10b operators: one-way ANOVA F (q191), Kruskal-Wallis H
(q192), and the rest of the late-round-10 cohort — each pinned to
hand-computed values on corpora small enough to verify by hand."""
import math

import pytest
from pyspark.sql import Row

from powerdatapipeline_spark.operators import stats as st


def _gv(spark, pairs):
    return spark.createDataFrame([Row(g=g, v=float(v)) for g, v in pairs])


class TestAnovaF:
    def test_hand_two_groups(self, spark):
        # a: [1,2,3] mean 2, ss 2; b: [5,7] mean 6, ss 2
        # grand mean 3.6; ssb = 3*(2-3.6)^2 + 2*(6-3.6)^2 = 7.68+11.52
        # = 19.2; ssw = 4; F = (19.2/1)/(4/3) = 14.4
        out = st.anova_f(
            _gv(spark, [("a", 1), ("a", 2), ("a", 3), ("b", 5), ("b", 7)]),
            "v", "g").collect()[0]
        assert out["k"] == 2 and out["n"] == 5
        assert out["df_between"] == 1 and out["df_within"] == 3
        assert out["ssb"] == pytest.approx(19.2, abs=1e-6)
        assert out["ssw"] == pytest.approx(4.0, abs=1e-6)
        assert out["f_stat"] == pytest.approx(14.4, abs=1e-6)
        assert out["eta_sq"] == pytest.approx(19.2 / 23.2, abs=1e-6)

    def test_identical_groups_f_zero(self, spark):
        out = st.anova_f(
            _gv(spark, [("a", 1), ("a", 3), ("b", 1), ("b", 3)]),
            "v", "g").collect()[0]
        assert out["ssb"] == pytest.approx(0.0, abs=1e-6)
        assert out["f_stat"] == pytest.approx(0.0, abs=1e-6)

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", v=1.0), Row(g="a", v=2.0), Row(g="a", v=3.0),
             Row(g="b", v=5.0), Row(g="b", v=7.0),
             Row(g=None, v=99.0), Row(g="b", v=None)])
        out = st.anova_f(df, "v", "g").collect()[0]
        assert out["n"] == 5 and out["f_stat"] == pytest.approx(14.4, 1e-6)

    def test_single_group_raises(self, spark):
        with pytest.raises(Exception, match="anova_f"):
            st.anova_f(_gv(spark, [("a", 1), ("a", 2)]), "v", "g").collect()

    def test_all_singletons_raises(self, spark):
        with pytest.raises(Exception, match="anova_f"):
            st.anova_f(_gv(spark, [("a", 1), ("b", 2)]), "v", "g").collect()

    def test_guard_survives_column_pruning(self, spark):
        out = st.anova_f(_gv(spark, [("a", 1), ("a", 2)]), "v", "g")
        with pytest.raises(Exception, match="anova_f"):
            out.select("eta_sq").collect()


class TestKruskalWallis:
    def test_hand_no_ties(self, spark):
        # a: [1,2] ranks {1,2} R=3; b: [3,4,5] ranks {3,4,5} R=12
        # H = 12/(5*6) * (9/2 + 144/3) - 3*6 = 0.4*52.5 - 18 = 3.0
        out = st.kruskal_wallis(
            _gv(spark, [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("b", 5)]),
            "v", "g").collect()[0]
        assert out["k"] == 2 and out["n"] == 5 and out["n_values"] == 5
        assert out["h"] == pytest.approx(3.0, abs=1e-6)
        assert out["tie_correction"] == pytest.approx(1.0, abs=1e-6)
        assert out["h_adj"] == pytest.approx(3.0, abs=1e-6)

    def test_hand_with_ties(self, spark):
        # values: a=[1,2,2], b=[2,3]; ranks: 1->1, 2->avg(2,3,4)=3, 3->5
        # R_a = 1+3+3 = 7, R_b = 3+5 = 8
        # H = 12/(5*6) * (49/3 + 64/2) - 18 = 0.4*(16.3333+32) - 18
        #   = 19.33333 - 18 = 1.333333
        # ties: t=3 at v=2 -> sum(t^3-t)=24; C = 1 - 24/120 = 0.8
        out = st.kruskal_wallis(
            _gv(spark, [("a", 1), ("a", 2), ("a", 2), ("b", 2), ("b", 3)]),
            "v", "g").collect()[0]
        assert out["h"] == pytest.approx(1.333333, abs=1e-5)
        assert out["tie_correction"] == pytest.approx(0.8, abs=1e-6)
        assert out["h_adj"] == pytest.approx(1.333333 / 0.8, abs=1e-5)

    def test_all_values_identical_h_adj_null(self, spark):
        out = st.kruskal_wallis(
            _gv(spark, [("a", 2), ("a", 2), ("b", 2)]), "v", "g").collect()[0]
        assert out["n_values"] == 1
        assert out["tie_correction"] == pytest.approx(0.0, abs=1e-6)
        assert out["h_adj"] is None

    def test_single_group_raises(self, spark):
        with pytest.raises(Exception, match="kruskal_wallis"):
            st.kruskal_wallis(
                _gv(spark, [("a", 1), ("a", 2)]), "v", "g").collect()

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", v=1.0), Row(g="a", v=2.0), Row(g="b", v=3.0),
             Row(g="b", v=4.0), Row(g="b", v=5.0), Row(g=None, v=0.5),
             Row(g="a", v=None)])
        out = st.kruskal_wallis(df, "v", "g").collect()[0]
        assert out["n"] == 5 and out["h"] == pytest.approx(3.0, abs=1e-6)


class TestCrossCorrelation:
    def _ev(self, spark, rows):
        df = spark.createDataFrame(
            [Row(ts=float(t), event_type=e) for t, e in rows])
        return df.selectExpr("timestamp_seconds(ts) AS ts", "event_type")

    def test_perfect_lag_one(self, spark):
        # clicks per hour [1,2,3]; purchases one hour later [1,2,3]:
        # r at lag 1 = 1.0 over the 3 aligned pairs; lag 0 pairs
        # (1,1),(2,2) on hours 1,2 -> also 1.0 but only 2 pairs
        rows = []
        for h, c in enumerate([1, 2, 3]):
            rows += [(h * 3600 + 1, "click")] * c
            rows += [((h + 1) * 3600 + 2, "purchase")] * c
        from powerdatapipeline_spark.operators.timeseries import \
            cross_correlation
        out = {r["lag"]: r for r in cross_correlation(
            self._ev(spark, rows), "ts", "event_type", "click",
            "purchase", max_lag=2).collect()}
        assert out[1]["n_pairs"] == 3
        assert out[1]["r"] == pytest.approx(1.0, abs=1e-6)
        assert out[0]["n_pairs"] == 2

    def test_constant_side_null_r(self, spark):
        rows = []
        for h, c in enumerate([1, 2, 3]):
            rows += [(h * 3600 + 1, "click")] * c
            rows += [(h * 3600 + 2, "purchase")] * 2  # constant
        from powerdatapipeline_spark.operators.timeseries import \
            cross_correlation
        out = cross_correlation(self._ev(spark, rows), "ts", "event_type",
                                "click", "purchase", max_lag=0).collect()
        assert out[0]["r"] is None

    def test_bad_lag_raises(self, spark):
        from powerdatapipeline_spark.operators.timeseries import \
            cross_correlation
        with pytest.raises(ValueError, match="max_lag"):
            cross_correlation(self._ev(spark, [(0.0, "click")]), "ts",
                              "event_type", "click", "purchase",
                              max_lag=-1)


class TestMannKendall:
    def _series(self, spark, day_vals):
        rows = [Row(ts=float(d * 86400 + 10), value=float(v))
                for d, v in enumerate(day_vals)]
        return spark.createDataFrame(rows).selectExpr(
            "timestamp_seconds(ts) AS ts", "value")

    def test_strictly_increasing(self, spark):
        # 4 days strictly rising: S = 6 (all pairs +1), no ties,
        # var = 4*3*13/18 = 8.6667; z = 5/sqrt(8.6667) = 1.698494...
        # slopes all pairs of [1,2,3,4]: six slopes all 1.0 -> sen = 1
        from powerdatapipeline_spark.operators.timeseries import \
            mann_kendall
        out = mann_kendall(self._series(spark, [1, 2, 3, 4])).collect()[0]
        assert out["n_buckets"] == 4 and out["n_pairs"] == 6
        assert out["s"] == 6
        assert out["var_s"] == pytest.approx(8.666667, abs=1e-5)
        assert out["z"] == pytest.approx(5 / math.sqrt(26 / 3), abs=1e-5)
        assert out["sen_slope"] == pytest.approx(1.0, abs=1e-6)

    def test_flat_series_zero(self, spark):
        # all equal: S=0, every tie in one group of 4 ->
        # var = (4*3*13 - 4*3*13)/18 = 0 -> z NULL, sen 0
        from powerdatapipeline_spark.operators.timeseries import \
            mann_kendall
        out = mann_kendall(self._series(spark, [5, 5, 5, 5])).collect()[0]
        assert out["s"] == 0 and out["var_s"] == 0.0
        assert out["z"] is None
        assert out["sen_slope"] == pytest.approx(0.0, abs=1e-6)

    def test_sen_slope_lower_median_hand(self, spark):
        # days [0,1,2] values [0, 10, 2]: slopes 10, 1, -8 ->
        # sorted [-8, 1, 10], lower median (pos 2) = 1
        from powerdatapipeline_spark.operators.timeseries import \
            mann_kendall
        out = mann_kendall(self._series(spark, [0, 10, 2])).collect()[0]
        assert out["sen_slope"] == pytest.approx(1.0, abs=1e-6)
        assert out["s"] == 1  # +1 (0<10), +1 (0<2), -1 (10>2)


class TestRankingMetrics:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            [Row(doc_id=i, score=float(s), rel=r)
             for i, (s, r) in enumerate(rows)])

    def test_hand_ndcg(self, spark):
        # ranked by score desc: rels [2, 0, 1]; gains [3, 0, 1]
        # DCG = 3/log2(2) + 0/log2(3) + 1/log2(4) = 3 + 0 + 0.5 = 3.5
        # ideal rels [2, 1, 0]: IDCG = 3 + 1/log2(3) + 0
        #   1/log2(3) = 0.630930 -> IDCG = 3.630930
        # NDCG = 3.5/3.63093 = 0.963996...; first rel>=2 at pos 1 ->
        # mrr 1.0; hits(>=2)=1 -> p@3 = 1/3
        from powerdatapipeline_spark.operators.similarity import \
            ranking_metrics
        out = ranking_metrics(
            self._frame(spark, [(0.9, 2), (0.8, 0), (0.7, 1)]),
            rel_col="rel", k=3).collect()[0]
        assert out["n_ranked"] == 3
        assert out["dcg"] == pytest.approx(3.5, abs=1e-6)
        assert out["idcg"] == pytest.approx(3.630930, abs=1e-6)
        assert out["ndcg"] == pytest.approx(3.5 / 3.630930, abs=1e-5)
        assert out["mrr"] == pytest.approx(1.0, abs=1e-6)
        assert out["precision_at_k"] == pytest.approx(1 / 3, abs=1e-6)

    def test_no_relevant_hit_mrr_zero(self, spark):
        from powerdatapipeline_spark.operators.similarity import \
            ranking_metrics
        out = ranking_metrics(
            self._frame(spark, [(0.9, 1), (0.8, 0)]),
            rel_col="rel", k=5).collect()[0]
        assert out["mrr"] == 0.0 and out["precision_at_k"] == 0.0
        # all candidates still score DCG on their graded gains
        assert out["ndcg"] is not None

    def test_k_truncates_and_tie_break(self, spark):
        # score tie at 0.8: doc_id asc breaks it -> the rel=2 doc with
        # the smaller id lands at pos 2 inside k=2
        from powerdatapipeline_spark.operators.similarity import \
            ranking_metrics
        df = spark.createDataFrame(
            [Row(doc_id=5, score=0.8, rel=0), Row(doc_id=3, score=0.8,
             rel=2), Row(doc_id=9, score=0.9, rel=0)])
        out = ranking_metrics(df, rel_col="rel", k=2).collect()[0]
        assert out["n_ranked"] == 2
        assert out["mrr"] == pytest.approx(0.5, abs=1e-6)  # hit at pos 2

    def test_bad_k_raises(self, spark):
        from powerdatapipeline_spark.operators.similarity import \
            ranking_metrics
        with pytest.raises(ValueError, match="k must be"):
            ranking_metrics(self._frame(spark, [(0.9, 1)]), rel_col="rel",
                            k=0)


class TestStreamingHeavyHitters:
    def test_streaming_equals_batch_sketch(self, spark, tmp_path):
        """Terms split across two micro-batches: the merged partials
        must rebuild the EXACT batch sketch (cell addition commutes)
        and the exact top-N."""
        import os
        import time

        from pyspark.sql import types as T

        from powerdatapipeline_spark.operators.stats import (cms_build,
                                                             cms_estimate)
        from powerdatapipeline_spark.streaming.stateful import (
            finalize_heavy_hitters, streaming_heavy_hitters)

        b1 = ["the quick the fox", "the lazy dog"]
        b2 = ["quick quick fox", "the dog"]
        src = tmp_path / "in"
        src.mkdir()
        for name, lines, age in (("a.txt", b1, 60), ("b.txt", b2, 0)):
            f = src / name
            f.write_text("\n".join(lines) + "\n")
            now = time.time()
            os.utime(f, (now - age, now - age))
        stream = (spark.readStream
                  .schema(T.StructType([T.StructField("value",
                                                      T.StringType())]))
                  .option("maxFilesPerTrigger", "1").text(str(src)))
        from powerdatapipeline_spark.operators.text import tokens
        terms = stream.select(
            __import__("pyspark.sql.functions", fromlist=["F"])
            .explode(tokens("value")).alias("term"))
        q = streaming_heavy_hitters(terms, "term",
                                    str(tmp_path / "partials"),
                                    str(tmp_path / "ckpt"))
        assert q.awaitTermination(120)
        got = {r["term"]: r for r in finalize_heavy_hitters(
            spark, str(tmp_path / "partials"), top_n=10).collect()}

        # batch twin over the union
        from pyspark.sql import functions as F
        batch = spark.createDataFrame(
            [Row(value=l) for l in b1 + b2]).select(
            F.explode(tokens("value")).alias("term"))
        counts = batch.groupBy("term").agg(
            F.count("*").cast("bigint").alias("c"))
        top = counts.orderBy(F.desc("c"), F.asc("term")).limit(10)
        est = cms_estimate(cms_build(batch, "term"), top, "term")
        want = {r["term"]: r for r in
                top.join(est, "term").collect()}
        assert set(got) == set(want)
        for t in want:
            assert got[t]["exact_count"] == want[t]["c"]
            assert got[t]["cms_estimate"] == want[t]["cms_estimate"]
            assert got[t]["no_underestimate"]
        assert got["the"]["exact_count"] == 4
        assert got["quick"]["exact_count"] == 3

    def test_cms_build_count_col_equals_raw(self, spark):
        """cms_build(reduced, count_col) ≡ cms_build(raw) — the merge
        identity the streaming finalizer relies on."""
        from pyspark.sql import functions as F

        from powerdatapipeline_spark.operators.stats import cms_build
        raw = spark.createDataFrame(
            [Row(t=w) for w in "a a a b b c".split()])
        reduced = raw.groupBy("t").agg(
            F.count("*").cast("bigint").alias("c"))
        s1 = {(r["j"], r["b"]): r["n"]
              for r in cms_build(raw, "t", width=64, depth=2).collect()}
        s2 = {(r["j"], r["b"]): r["n"]
              for r in cms_build(reduced, "t", width=64, depth=2,
                                 count_col="c").collect()}
        assert s1 == s2


class TestHellingerTv:
    def test_hand_two_sources(self, spark):
        # A: "x x y" -> p(x)=2/3, p(y)=1/3; B: "x z" -> p(x)=1/2,
        # p(z)=1/2. Intersection {x}: |2/3-1/2| = 1/6 = 0.166667;
        # TV = (0.166667 + (1-0.666667) + (1-0.5))/2 = 0.5
        # BC = sqrt(2/3 * 1/2) = sqrt(1/3) = 0.577350
        # H = sqrt(1 - 0.577350) = 0.650115...
        from powerdatapipeline_spark.operators.text import \
            hellinger_tv_matrix
        df = spark.createDataFrame([Row(source="A", text="x x y"),
                                    Row(source="B", text="x z")])
        out = hellinger_tv_matrix(df).collect()[0]
        assert (out["src_a"], out["src_b"], out["n_common"]) == ("A", "B", 1)
        assert out["tv"] == pytest.approx(0.5, abs=2e-6)
        assert out["bc"] == pytest.approx(0.57735, abs=2e-6)
        assert out["hellinger"] == pytest.approx(
            math.sqrt(1 - 0.57735), abs=2e-5)

    def test_identical_sources_zero_distance(self, spark):
        from powerdatapipeline_spark.operators.text import \
            hellinger_tv_matrix
        df = spark.createDataFrame([Row(source="A", text="a b c"),
                                    Row(source="B", text="a b c")])
        out = hellinger_tv_matrix(df).collect()[0]
        assert out["tv"] == pytest.approx(0.0, abs=2e-6)
        assert out["bc"] == pytest.approx(1.0, abs=3e-6)
        # clamped sqrt never NaN even when bc rounds above 1
        assert out["hellinger"] == pytest.approx(0.0, abs=2e-3)

    def test_disjoint_sources_max_distance(self, spark):
        from powerdatapipeline_spark.operators.text import \
            hellinger_tv_matrix
        df = spark.createDataFrame([Row(source="A", text="a b"),
                                    Row(source="B", text="c d")])
        out = hellinger_tv_matrix(df).collect()[0]
        assert out["n_common"] == 0
        assert out["tv"] == pytest.approx(1.0, abs=1e-6)
        assert out["bc"] == 0.0
        assert out["hellinger"] == pytest.approx(1.0, abs=1e-6)


class TestTokenizerFertility:
    def test_hand_counts(self, spark):
        # "hi, there" -> words ["hi,", "there"] = 2;
        # pieces ["hi", ",", "there"] = 3 -> fertility 1.5
        from powerdatapipeline_spark.operators.text import \
            tokenizer_fertility
        df = spark.createDataFrame([Row(source="s", text="hi, there")])
        out = tokenizer_fertility(df).collect()[0]
        assert out["n_docs"] == 1
        assert out["n_words"] == 2 and out["n_pieces"] == 3
        assert out["fertility"] == pytest.approx(1.5, abs=1e-6)
        assert out["pieces_per_doc"] == pytest.approx(3.0, abs=1e-6)

    def test_empty_text_null_fertility(self, spark):
        from powerdatapipeline_spark.operators.text import \
            tokenizer_fertility
        df = spark.createDataFrame([Row(source="s", text="   ")])
        out = tokenizer_fertility(df).collect()[0]
        assert out["n_words"] == 0 and out["n_pieces"] == 0
        assert out["fertility"] is None


class TestLeveneBF:
    def test_hand_spread_difference(self, spark):
        # a: [0, 10] (lower median 0 -> ad [0, 10]);
        # b: [5, 5, 5] (median 5 -> ad [0, 0, 0])
        # anova on ad: mean_a 5, mean_b 0, grand 2
        # ssb = 2*(5-2)^2 + 3*(0-2)^2 = 18+12 = 30
        # ssw = (0-5)^2+(10-5)^2 + 0 = 50; F = (30/1)/(50/3) = 1.8
        out = st.levene_bf(
            _gv(spark, [("a", 0), ("a", 10), ("b", 5), ("b", 5), ("b", 5)]),
            "v", "g").collect()[0]
        assert out["k"] == 2 and out["n"] == 5
        assert out["ssb"] == pytest.approx(30.0, abs=1e-6)
        assert out["ssw"] == pytest.approx(50.0, abs=1e-6)
        assert out["f_stat"] == pytest.approx(1.8, abs=1e-6)

    def test_equal_spread_f_zero(self, spark):
        # both groups have the same |v - med| multiset -> ssb = 0
        out = st.levene_bf(
            _gv(spark, [("a", 1), ("a", 3), ("b", 11), ("b", 13)]),
            "v", "g").collect()[0]
        assert out["ssb"] == pytest.approx(0.0, abs=1e-6)
        assert out["f_stat"] == pytest.approx(0.0, abs=1e-6)

    def test_lower_median_even_group(self, spark):
        # group a: [1, 2, 3, 4] -> lower median 2 (pos (4+1)//2 = 2)
        # ad = [1, 0, 1, 2]; sanity: runs through anova without raise
        out = st.levene_bf(
            _gv(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4),
                        ("b", 7), ("b", 9)]), "v", "g").collect()[0]
        # group b: median 7 -> ad [0, 2]
        # means: a 1.0, b 1.0 -> ssb 0
        assert out["ssb"] == pytest.approx(0.0, abs=1e-6)


class TestStreamingKsDrift:
    def test_stream_equals_batch_ks(self, spark, tmp_path):
        """click-vs-view KS via streamed per-value partials must equal
        batch ks_test over the same rows (q199's registry contract)."""
        import os
        import time

        from pyspark.sql import types as T

        from powerdatapipeline_spark.streaming.stateful import (
            finalize_ks_drift, streaming_ks_drift)

        b1 = [1.0, 2.0, 2.0, 5.0]
        b2 = [2.0, 3.0, 7.0]
        ref_vals = [1.0, 1.5, 2.0, 6.0]
        src = tmp_path / "in"
        src.mkdir()
        for name, vals, age in (("a.csv", b1, 60), ("b.csv", b2, 0)):
            f = src / name
            f.write_text("v\n" + "\n".join(str(v) for v in vals) + "\n")
            now = time.time()
            os.utime(f, (now - age, now - age))
        stream = (spark.readStream
                  .schema(T.StructType([T.StructField("v",
                                                      T.DoubleType())]))
                  .option("header", "true")
                  .option("maxFilesPerTrigger", "1").csv(str(src)))
        q = streaming_ks_drift(stream, "v", str(tmp_path / "partials"),
                               str(tmp_path / "ckpt"))
        assert q.awaitTermination(120)
        ref = spark.createDataFrame([Row(v=v) for v in ref_vals])
        got = finalize_ks_drift(spark, ref, "v",
                                str(tmp_path / "partials")).collect()

        batch = spark.createDataFrame(
            [Row(g="a", v=v) for v in ref_vals]
            + [Row(g="b", v=v) for v in b1 + b2])
        want = st.ks_test(batch, "v", "g", "a", "b").collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
        assert got[0]["n_a"] == 4 and got[0]["n_b"] == 7


class TestQuantileNormalize:
    def test_hand_mapping(self, spark):
        # a: [1, 2] -> q 0, 1; b: [10, 20, 30] -> q 0, 0.5, 1
        # global sorted [1, 2, 10, 20, 30], N=5
        # q=0   -> pos floor(0*4+.5)+1  = 1 -> 1
        # q=0.5 -> pos floor(2.5)+1     = 3 -> 10
        # q=1   -> pos floor(4.5)+1     = 5 -> 30
        from powerdatapipeline_spark.operators.stats import \
            quantile_normalize
        df = spark.createDataFrame(
            [Row(id=1, g="a", v=1), Row(id=2, g="a", v=2),
             Row(id=3, g="b", v=10), Row(id=4, g="b", v=20),
             Row(id=5, g="b", v=30)])
        out = {r["id"]: r for r in
               quantile_normalize(df, "v", "g", "id").collect()}
        assert len(out) == 5
        assert out[1]["norm_value"] == 1 and out[2]["norm_value"] == 30
        assert out[3]["norm_value"] == 1
        assert out[4]["norm_value"] == 10
        assert out[5]["norm_value"] == 30
        assert out[4]["quantile"] == pytest.approx(0.5, abs=1e-6)

    def test_ties_share_target(self, spark):
        # duplicate values inside a group share the LOW rank and
        # therefore the same normalized target
        from powerdatapipeline_spark.operators.stats import \
            quantile_normalize
        df = spark.createDataFrame(
            [Row(id=1, g="a", v=5), Row(id=2, g="a", v=5),
             Row(id=3, g="a", v=9), Row(id=4, g="b", v=1),
             Row(id=5, g="b", v=2)])
        out = {r["id"]: r for r in
               quantile_normalize(df, "v", "g", "id").collect()}
        assert out[1]["norm_value"] == out[2]["norm_value"]
        assert out[1]["quantile"] == out[2]["quantile"] == 0.0

    def test_singleton_group_maps_to_middle(self, spark):
        from powerdatapipeline_spark.operators.stats import \
            quantile_normalize
        df = spark.createDataFrame(
            [Row(id=1, g="solo", v=999), Row(id=2, g="b", v=1),
             Row(id=3, g="b", v=2), Row(id=4, g="b", v=3)])
        out = {r["id"]: r for r in
               quantile_normalize(df, "v", "g", "id").collect()}
        # N=4: q=0.5 -> pos floor(0.5*3+0.5)+1 = 3 ->
        # sorted [1,2,3,999][2] = 3
        assert out[1]["quantile"] == pytest.approx(0.5, abs=1e-6)
        assert out[1]["norm_value"] == 3


class TestSequenceNgrams:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [Row(ts=float(t), user_id=u, event_id=i, event_type=e)
             for i, (t, u, e) in enumerate(rows)]).selectExpr(
            "timestamp_seconds(ts) AS ts", "user_id", "event_id",
            "event_type")

    def test_hand_trigrams(self, spark):
        # user 1: a b c a b c -> trigrams abc, bca, cab, abc
        # user 2: a b c       -> abc
        from powerdatapipeline_spark.operators.timeseries import \
            sequence_ngrams
        rows = ([(t, 1, e) for t, e in
                 enumerate(["a", "b", "c", "a", "b", "c"])]
                + [(t, 2, e) for t, e in enumerate(["a", "b", "c"])])
        out = {(r["s1"], r["s2"], r["s3"]): r["n_occurrences"]
               for r in sequence_ngrams(self._ev(spark, rows), "ts",
                                        "user_id", "event_type",
                                        tiebreak_col="event_id").collect()}
        assert out[("a", "b", "c")] == 3
        assert out[("b", "c", "a")] == 1
        assert out[("c", "a", "b")] == 1
        assert len(out) == 3  # no cross-user grams

    def test_short_sequences_emit_nothing(self, spark):
        from powerdatapipeline_spark.operators.timeseries import \
            sequence_ngrams
        rows = [(0, 1, "a"), (1, 1, "b")]  # length 2 < n=3
        out = sequence_ngrams(self._ev(spark, rows), "ts", "user_id",
                              "event_type",
                              tiebreak_col="event_id").collect()
        assert out == []

    def test_bad_n_raises(self, spark):
        from powerdatapipeline_spark.operators.timeseries import \
            sequence_ngrams
        with pytest.raises(ValueError, match="n must be"):
            sequence_ngrams(self._ev(spark, [(0, 1, "a")]), "ts",
                            "user_id", "event_type", n=1)


class TestAssociationRules:
    def test_hand_lift(self, spark):
        # baskets: {1: a b}, {2: a b}, {3: a c}, {4: b}
        # N=4; n_a=3, n_b=3, n_c=1; pair (a,b) n=2
        # support 0.5; conf both 2/3; lift = 4*2/(3*3) = 0.888889
        from powerdatapipeline_spark.operators.relational import \
            association_rules
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
                (3, "a"), (3, "c"), (4, "b")]
        df = spark.createDataFrame([Row(b=b, i=i) for b, i in rows])
        out = association_rules(df, "b", "i", min_pair_count=2).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["item_a"], r["item_b"]) == ("a", "b")
        assert (r["n_pairs"], r["n_a"], r["n_b"]) == (2, 3, 3)
        assert r["support"] == pytest.approx(0.5, abs=1e-6)
        assert r["conf_a_to_b"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["lift"] == pytest.approx(8 / 9, abs=1e-6)

    def test_duplicate_basket_rows_deduped(self, spark):
        # the same (basket, item) row twice must not double-count
        from powerdatapipeline_spark.operators.relational import \
            association_rules
        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame([Row(b=b, i=i) for b, i in rows])
        out = association_rules(df, "b", "i", min_pair_count=2).collect()
        assert out[0]["n_pairs"] == 2 and out[0]["n_a"] == 2

    def test_max_basket_guard_raises(self, spark):
        from powerdatapipeline_spark.operators.relational import \
            association_rules
        rows = [(1, x) for x in "abcde"] + [(2, "a"), (2, "b")]
        df = spark.createDataFrame([Row(b=b, i=i) for b, i in rows])
        with pytest.raises(Exception, match="max_basket_size"):
            association_rules(df, "b", "i", min_pair_count=1,
                              max_basket_size=3).collect()


class TestSeasonalQuantileBands:
    def test_hand_quantiles(self, spark):
        # one slot (hour 0), values 1..10: n=10
        # p10 pos floor(.1*9+.5)+1 = 2 -> 2; p50 pos floor(5)+1 = 6 -> 6
        # p90 pos floor(8.6)+1 = 9 -> 9
        from powerdatapipeline_spark.operators.timeseries import \
            seasonal_quantile_bands
        rows = [Row(ts=float(60 * i), value=float(i + 1))
                for i in range(10)]
        df = spark.createDataFrame(rows).selectExpr(
            "timestamp_seconds(ts) AS ts", "value")
        out = seasonal_quantile_bands(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["slot"], r["n"]) == (0, 10)
        assert (r["q_10"], r["q_50"], r["q_90"]) == (2.0, 6.0, 9.0)

    def test_slots_independent(self, spark):
        from powerdatapipeline_spark.operators.timeseries import \
            seasonal_quantile_bands
        rows = ([Row(ts=10.0, value=1.0)]                # hour 0
                + [Row(ts=3610.0, value=100.0)])         # hour 1
        df = spark.createDataFrame(rows).selectExpr(
            "timestamp_seconds(ts) AS ts", "value")
        out = {r["slot"]: r for r in
               seasonal_quantile_bands(df).collect()}
        assert out[0]["q_50"] == 1.0 and out[1]["q_50"] == 100.0

    def test_bad_quantile_raises(self, spark):
        from powerdatapipeline_spark.operators.timeseries import \
            seasonal_quantile_bands
        df = spark.createDataFrame([Row(ts=1.0, value=1.0)]).selectExpr(
            "timestamp_seconds(ts) AS ts", "value")
        with pytest.raises(ValueError, match="quantiles"):
            seasonal_quantile_bands(df, quantiles=(0.0, 0.5))


class TestKCore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [Row(src=a, dst=b) for a, b in pairs])

    def test_triangle_with_tail_peels_tail(self, spark):
        # triangle 1-2-3 plus tail 3-4: node 4 (deg 1) peels first,
        # then everyone left has deg 2 -> 2-core = {1, 2, 3}
        from powerdatapipeline_spark.operators.graph import k_core
        out = {r["node"]: r["core_degree"] for r in k_core(
            self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]),
            k=2).collect()}
        assert out == {1: 2, 2: 2, 3: 2}

    def test_chain_peels_to_empty(self, spark):
        # a path has no 2-core: peeling cascades from both ends
        from powerdatapipeline_spark.operators.graph import k_core
        out = k_core(self._edges(spark, [(1, 2), (2, 3), (3, 4)]),
                     k=2).collect()
        assert out == []

    def test_cascading_peel_needs_multiple_rounds(self, spark):
        # triangle + chain 3-4-5-6: round1 drops 6, round2 drops 5,
        # round3 drops 4 -> core {1,2,3}; exercises >1 peel round
        from powerdatapipeline_spark.operators.graph import k_core
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        out = {r["node"] for r in
               k_core(self._edges(spark, edges), k=2).collect()}
        assert out == {1, 2, 3}

    def test_round_budget_raises(self, spark):
        from powerdatapipeline_spark.operators.graph import k_core
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        with pytest.raises(RuntimeError, match="max_rounds"):
            k_core(self._edges(spark, edges), k=2, max_rounds=1)

    def test_bad_k_raises(self, spark):
        from powerdatapipeline_spark.operators.graph import k_core
        with pytest.raises(ValueError, match="k must be"):
            k_core(self._edges(spark, [(1, 2)]), k=0)
