"""Round-10c operators (q206-q229): fuzzy dictionary matching, grid
nearest join, load/coincidence factors, change-point, DQ expectations,
exceedance report, OLS trend, the streaming quantile monitor's shared
finalizer, n-gram cosine pairs, RFM scores, class balance, label
canonicalization, forecast backtest, state durations, Lorenz deciles,
k-fold report, last-touch attribution, reconciliation audit,
time-to-convert, cohort LTV, duplicate transactions, ABC
classification, fan-out audit and token coverage — each pinned to
hand-computed values on corpora small enough to verify by hand."""
import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import timeseries as ts


class TestFuzzyDictPairs:
    def _df(self, spark):
        rows = (["red bolt"] * 3 + ["rad bolt"] + ["blue bolt"] * 2
                + ["red gear"] + [None])
        return spark.createDataFrame([Row(v=r) for r in rows])

    def test_hand_pairs(self, spark):
        out = dd.fuzzy_dict_pairs(self._df(spark), "v",
                                  max_dist=4).collect()
        # same last-token block "bolt"; "red gear" is in another block
        # ("blue" -> "red" and "blue" -> "rad" are both 4 edits)
        assert [(r["value_a"], r["value_b"], r["dist"], r["n_a"], r["n_b"])
                for r in out] == [
            ("rad bolt", "red bolt", 1, 1, 3),
            ("blue bolt", "rad bolt", 4, 2, 1),
            ("blue bolt", "red bolt", 4, 2, 3)]

    def test_threshold_prunes(self, spark):
        out = dd.fuzzy_dict_pairs(self._df(spark), "v",
                                  max_dist=1).collect()
        assert len(out) == 1 and out[0]["dist"] == 1

    def test_dict_cap_raises(self, spark):
        with pytest.raises(Exception, match="fuzzy_dict_pairs"):
            dd.fuzzy_dict_pairs(self._df(spark), "v", max_dist=3,
                                max_dict_size=2).collect()


class TestGridNearestJoin:
    def test_nearest_in_cell_and_out_of_ring_dropped(self, spark):
        pts = spark.createDataFrame(
            [Row(pid=1, lat=0.5, lon=0.5), Row(pid=2, lat=50.0, lon=50.0)])
        sites = spark.createDataFrame(
            [Row(sid=10, lat=1.0, lon=1.0), Row(sid=20, lat=20.0, lon=20.0)])
        out = {r["pid"]: r for r in rel.grid_nearest_join(
            pts, sites, "pid", "sid").collect()}
        # pid=1 matches sid=10 in its own cell; pid=2 has no site within
        # the 3x3 ring of 10-degree cells and is dropped
        assert set(out) == {1}
        assert out[1]["sid"] == 10
        # haversine((0.5,0.5),(1,1)) ~ 78.6 km
        assert 70 < out[1]["dist_km"] < 90

    def test_date_line_wrap(self, spark):
        pts = spark.createDataFrame([Row(pid=1, lat=0.0, lon=179.5)])
        sites = spark.createDataFrame([Row(sid=7, lat=0.0, lon=-179.5)])
        out = rel.grid_nearest_join(pts, sites, "pid", "sid").collect()
        assert len(out) == 1 and out[0]["sid"] == 7
        # 1 degree of longitude at the equator ~ 111.19 km
        assert 100 < out[0]["dist_km"] < 120

    def test_tie_breaks_on_site_id(self, spark):
        pts = spark.createDataFrame([Row(pid=1, lat=0.0, lon=0.0)])
        sites = spark.createDataFrame(
            [Row(sid=2, lat=1.0, lon=0.0), Row(sid=1, lat=-1.0, lon=0.0)])
        out = rel.grid_nearest_join(pts, sites, "pid", "sid").collect()
        assert out[0]["sid"] == 1


class TestLoadCoincidence:
    def test_hand_factors(self, spark):
        rows = [("a", 100.0, 4.0), ("a", 200.0, 6.0),      # a@h0 = 10
                ("a", 3700.0, 20.0),                       # a@h1 = 20
                ("b", 50.0, 30.0),                         # b@h0 = 30
                ("b", 3650.0, 5.0)]                        # b@h1 = 5
        df = spark.createDataFrame(
            [Row(event_type=g, ts=t, value=v) for g, t, v in rows])
        out = {r["event_type"]: r for r in
               ts.load_coincidence(df).collect()}
        a, b = out["a"], out["b"]
        assert a["peak_load"] == 20.0 and a["peak_bucket"] == 1
        assert a["load_factor"] == pytest.approx(0.75, abs=1e-6)
        assert b["peak_load"] == 30.0 and b["peak_bucket"] == 0
        assert b["load_factor"] == pytest.approx(17.5 / 30, abs=1e-6)
        # system hourly: h0=40 (peak), h1=25 -> CF = 40 / (20+30)
        assert a["load_at_system_peak"] == 10.0
        assert b["load_at_system_peak"] == 30.0
        assert a["coincidence_factor"] == pytest.approx(0.8, abs=1e-6)
        assert b["coincidence_factor"] == pytest.approx(0.8, abs=1e-6)

    def test_group_absent_at_system_peak_is_zero(self, spark):
        df = spark.createDataFrame([
            Row(event_type="a", ts=100.0, value=50.0),
            Row(event_type="b", ts=3700.0, value=10.0)])
        out = {r["event_type"]: r for r in
               ts.load_coincidence(df).collect()}
        assert out["b"]["load_at_system_peak"] == 0.0


class TestChangepoint:
    def test_hand_step(self, spark):
        df = spark.createDataFrame(
            [Row(ts=float(d) * 86400.0, value=v)
             for d, v in [(0, 1.0), (1, 1.0), (2, 5.0), (3, 5.0)]])
        out = ts.changepoint_binary_seg(df).collect()[0]
        # gains: k=1 -> 5.333, k=2 -> 16, k=3 -> 5.333
        assert out["split_bucket"] == 1 and out["n_buckets"] == 4
        assert out["gain"] == pytest.approx(16.0, abs=1e-6)
        assert out["mean_left"] == pytest.approx(1.0, abs=1e-6)
        assert out["mean_right"] == pytest.approx(5.0, abs=1e-6)

    def test_tie_picks_earliest_bucket(self, spark):
        # symmetric series: k=1 and k=3 tie; k=2 has zero gain
        df = spark.createDataFrame(
            [Row(ts=float(d) * 86400.0, value=v)
             for d, v in [(0, 4.0), (1, 0.0), (2, 0.0), (3, 4.0)]])
        out = ts.changepoint_binary_seg(df).collect()[0]
        assert out["split_bucket"] == 0


class TestDqExpectations:
    def test_hand_metrics(self, spark):
        d0 = dt.datetime(1970, 1, 1, 0, 0, 0)
        df = spark.createDataFrame([
            Row(k=1, name="ab", t=d0),
            Row(k=2, name="abcd", t=d0 + dt.timedelta(seconds=100)),
            Row(k=2, name=None, t=None),
            Row(k=None, name="ab", t=d0)])
        spec = {"k": "numeric", "name": "string", "t": "timestamp"}
        out = {(r["col_name"], r["metric"]): r["value"]
               for r in st.dq_expectations(df, spec).collect()}
        assert out[("k", "completeness")] == pytest.approx(0.75)
        assert out[("k", "n_distinct")] == 2.0
        assert out[("k", "min")] == 1.0 and out[("k", "max")] == 2.0
        assert out[("k", "mean")] == pytest.approx(5.0 / 3, abs=1e-6)
        assert out[("name", "completeness")] == pytest.approx(0.75)
        assert out[("name", "n_distinct")] == 2.0
        assert out[("name", "min_len")] == 2.0
        assert out[("name", "max_len")] == 4.0
        assert out[("name", "avg_len")] == pytest.approx(8.0 / 3, abs=1e-6)
        assert out[("t", "completeness")] == pytest.approx(0.75)
        assert out[("t", "min_epoch")] == 0.0
        assert out[("t", "max_epoch")] == 100.0

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame([Row(k=1)])
        with pytest.raises(ValueError, match="unknown kind"):
            st.dq_expectations(df, {"k": "blob"})


class TestExceedanceReport:
    def test_hand_tail(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", v=float(i)) for i in range(1, 11)])
        out = st.exceedance_report(df, "v", "g", q=0.9).collect()[0]
        # pos = floor(0.9*9+0.5)+1 = 9 -> threshold 9; exceed {10}
        assert out["n"] == 10 and out["threshold"] == 9.0
        assert out["n_exceed"] == 1
        assert out["mean_excess"] == pytest.approx(1.0, abs=1e-6)
        assert out["max_value"] == 10.0

    def test_no_exceedance_gives_zero_and_null(self, spark):
        df = spark.createDataFrame([Row(g="a", v=5.0)] * 4)
        out = st.exceedance_report(df, "v", "g", q=0.5).collect()[0]
        assert out["n_exceed"] == 0 and out["mean_excess"] is None
        assert out["threshold"] == 5.0 and out["max_value"] == 5.0

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", v=float(i)) for i in range(1, 11)]
            + [Row(g="a", v=None), Row(g=None, v=999.0)])
        out = st.exceedance_report(df, "v", "g", q=0.9).collect()
        assert len(out) == 1 and out[0]["n"] == 10


class TestOlsTrend:
    def test_exact_line(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", x=float(x), y=2.0 * x + 1.0) for x in range(4)])
        out = st.ols_trend(df, "x", "y", "g").collect()[0]
        assert out["n"] == 4
        assert out["slope"] == pytest.approx(2.0, abs=1e-6)
        assert out["intercept"] == pytest.approx(1.0, abs=1e-6)
        assert out["r2"] == pytest.approx(1.0, abs=1e-6)

    def test_hand_noisy(self, spark):
        # x=[0,1,2], y=[0,2,3]: slope=1.5, intercept=1/6, r2=27/28
        df = spark.createDataFrame(
            [Row(g="a", x=0.0, y=0.0), Row(g="a", x=1.0, y=2.0),
             Row(g="a", x=2.0, y=3.0)])
        out = st.ols_trend(df, "x", "y", "g").collect()[0]
        assert out["slope"] == pytest.approx(1.5, abs=1e-6)
        assert out["intercept"] == pytest.approx(1.0 / 6, abs=1e-6)
        assert out["r2"] == pytest.approx(27.0 / 28, abs=1e-6)

    def test_degenerate_groups_null(self, spark):
        df = spark.createDataFrame(
            [Row(g="single", x=1.0, y=1.0),
             Row(g="novar", x=2.0, y=1.0), Row(g="novar", x=2.0, y=5.0),
             Row(g="flat", x=0.0, y=3.0), Row(g="flat", x=1.0, y=3.0)])
        out = {r["g"]: r for r in
               st.ols_trend(df, "x", "y", "g").collect()}
        assert out["single"]["slope"] is None
        assert out["novar"]["slope"] is None       # zero x-variance
        assert out["flat"]["slope"] == pytest.approx(0.0, abs=1e-6)
        assert out["flat"]["r2"] is None           # zero y-variance


class TestQuantilesFromValueCounts:
    def _per(self, spark, rows):
        return spark.createDataFrame(
            [Row(__v=float(v), c=c) for v, c in rows])

    def test_hand_positions(self, spark):
        out = st.quantiles_from_value_counts(
            self._per(spark, [(1.0, 2), (2.0, 3), (3.0, 5)])).collect()[0]
        # n=10: q50 pos 6 -> 3.0; q90 pos 9 -> 3.0; q99 pos 9 -> 3.0
        assert out["n"] == 10
        assert (out["q_50"], out["q_90"], out["q_99"]) == (3.0, 3.0, 3.0)

    def test_partials_merge_by_addition(self, spark):
        whole = st.quantiles_from_value_counts(
            self._per(spark, [(1.0, 4), (2.0, 3), (5.0, 3)])).collect()
        split = st.quantiles_from_value_counts(
            self._per(spark, [(1.0, 1), (1.0, 3), (2.0, 3),
                              (5.0, 2), (5.0, 1)])).collect()
        assert whole == split

    def test_streaming_finalizer_matches_batch(self, spark, tmp_path):
        from powerdatapipeline_spark.streaming.stateful import \
            finalize_quantile_monitor
        p = str(tmp_path / "partials")
        self._per(spark, [(1.0, 2), (2.0, 1)]) \
            .write.mode("append").parquet(p)
        self._per(spark, [(2.0, 2), (9.0, 5)]) \
            .write.mode("append").parquet(p)
        got = finalize_quantile_monitor(spark, p).collect()
        want = st.quantiles_from_value_counts(
            self._per(spark, [(1.0, 2), (2.0, 3), (9.0, 5)])).collect()
        assert got == want


class TestNgramCosinePairs:
    def test_hand_cosine(self, spark):
        from powerdatapipeline_spark.operators import text as tx
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b c e"),
             Row(doc_id=3, text="x y z w")])
        out = tx.ngram_cosine_pairs(docs, n=3).collect()
        # only (1,2) share a trigram ("a b c"); doc 3 shares nothing
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        idf_shared = round(math.log(3 / 2), 6)
        idf_unique = round(math.log(3 / 1), 6)
        w_shared = round(1 * idf_shared, 6)
        w_unique = round(1 * idf_unique, 6)
        dot = w_shared * w_shared
        nrm = math.sqrt(w_shared ** 2 + w_unique ** 2)
        assert r["dot"] == pytest.approx(dot, abs=1e-6)
        assert r["cosine"] == pytest.approx(dot / (nrm * nrm), abs=1e-6)

    def test_tf_weighting_counts_repeats(self, spark):
        from powerdatapipeline_spark.operators import text as tx
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c a b c"),   # tf("a b c") = 2
             Row(doc_id=2, text="a b c x")])
        r = tx.ngram_cosine_pairs(docs, n=3).collect()[0]
        idf = round(math.log(2 / 2), 6)           # shared gram: idf 0
        # all of doc2's grams are unique except "a b c" whose idf is 0,
        # so the dot collapses to 0 — the stopword property of idf
        assert r["dot"] == pytest.approx(0.0, abs=1e-6)
        assert idf == 0.0


class TestRfmScores:
    def test_hand_quintiles(self, spark):
        day = 86400.0
        rows = []
        # A: 3 orders, last at day 10, total 300
        rows += [Row(cust=1, ts=d * day, amt=a)
                 for d, a in [(8, 100.0), (9, 100.0), (10, 100.0)]]
        # B: 2 orders, last at day 5, total 200
        rows += [Row(cust=2, ts=d * day, amt=a)
                 for d, a in [(4, 100.0), (5, 100.0)]]
        # C: 1 order at day 0, total 100
        rows += [Row(cust=3, ts=0.0, amt=100.0)]
        out = {r["cust"]: r for r in rel.rfm_scores(
            spark.createDataFrame(rows), "cust", "ts", "amt").collect()}
        a, b, c = out[1], out[2], out[3]
        assert (a["recency_days"], b["recency_days"],
                c["recency_days"]) == (0, 5, 10)
        assert (a["frequency"], b["frequency"], c["frequency"]) == (3, 2, 1)
        assert (a["monetary"], b["monetary"], c["monetary"]) \
            == (300.0, 200.0, 100.0)
        # n=3 quintile positions -> thresholds (v1, v2, v2, v3):
        # best gets 4, middle 2, worst 1 on every dimension
        assert (a["r_score"], a["f_score"], a["m_score"]) == (4, 4, 4)
        assert (b["r_score"], b["f_score"], b["m_score"]) == (2, 2, 2)
        assert (c["r_score"], c["f_score"], c["m_score"]) == (1, 1, 1)
        assert (a["rfm_cell"], b["rfm_cell"], c["rfm_cell"]) \
            == (444, 222, 111)


class TestClassBalance:
    def test_equalizes_to_minority(self, spark):
        df = spark.createDataFrame(
            [Row(id=i, label="a") for i in range(5)]
            + [Row(id=10 + i, label="b") for i in range(2)])
        out = rel.class_balance(df, "label", "id").collect()
        per = {}
        for r in out:
            per.setdefault(r["label"], []).append(r["id"])
        assert len(per["a"]) == 2 and len(per["b"]) == 2
        assert set(per["b"]) == {10, 11}
        assert all(r["draw_rank"] <= 2 for r in out)

    def test_deterministic_across_runs(self, spark):
        df = spark.createDataFrame(
            [Row(id=i, label="a") for i in range(8)]
            + [Row(id=100, label="b")])
        one = rel.class_balance(df, "label", "id").collect()
        two = rel.class_balance(df, "label", "id").collect()
        assert one == two


class TestCanonicalizeLabels:
    def test_chain_cluster_and_singleton_excluded(self, spark):
        rows = (["red bolt"] * 3 + ["rad bolt"] + ["old bolt"] * 2
                + ["cold bolt"] + ["green gear"] * 5)
        df = spark.createDataFrame([Row(v=r) for r in rows])
        out = dd.canonicalize_labels(df, "v", max_dist=2).collect()
        # chain rad-red(1), red-old(2), old-cold(1): one 4-value cluster;
        # "green gear" has no match and stays out (singleton contract)
        assert len(out) == 4
        assert all(r["canonical"] == "red bolt" for r in out)
        assert all(r["cluster_size"] == 4 for r in out)
        got = {r["value"]: r["n"] for r in out}
        assert got == {"red bolt": 3, "rad bolt": 1,
                       "old bolt": 2, "cold bolt": 1}

    def test_tie_breaks_lexicographic(self, spark):
        df = spark.createDataFrame(
            [Row(v="red bolt"), Row(v="rad bolt")])
        out = dd.canonicalize_labels(df, "v", max_dist=2).collect()
        assert all(r["canonical"] == "rad bolt" for r in out)


class TestForecastBacktest:
    def test_hand_weekly_naive(self, spark):
        h = 3600.0
        rows = [(0, 10.0), (1, 5.0), (168, 12.0), (169, 5.0)]
        df = spark.createDataFrame(
            [Row(event_type="a", ts=b * h + 1.0, value=v)
             for b, v in rows])
        out = ts.forecast_backtest_naive(df).collect()[0]
        # scored pairs: (b168 vs b0): e=2, (b169 vs b1): e=0
        assert out["n_scored"] == 2
        assert out["mae"] == pytest.approx(1.0, abs=1e-6)
        assert out["rmse"] == pytest.approx(math.sqrt(2.0), abs=1e-6)
        assert out["bias"] == pytest.approx(1.0, abs=1e-6)
        assert out["mape"] == pytest.approx((2 / 12 + 0) / 2, abs=1e-6)

    def test_no_pairs_group_absent(self, spark):
        df = spark.createDataFrame(
            [Row(event_type="a", ts=0.0, value=1.0)])
        assert ts.forecast_backtest_naive(df).collect() == []


class TestStateDurations:
    def test_hand_intervals(self, spark):
        rows = [(1, 0.0, "A", 1), (1, 10.0, "B", 2), (1, 25.0, "A", 3),
                (2, 0.0, "B", 4), (2, 5.0, "B", 5)]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=s, event_id=e)
             for u, t, s, e in rows])
        out = {r["state"]: r for r in ts.state_durations(df).collect()}
        # last event per user is right-censored and dropped
        assert out["A"]["n_intervals"] == 1
        assert out["A"]["total_seconds"] == 10.0
        assert out["B"]["n_intervals"] == 2
        assert out["B"]["total_seconds"] == 20.0
        assert out["B"]["mean_seconds"] == pytest.approx(10.0, abs=1e-6)
        assert out["B"]["max_seconds"] == 15.0

    def test_tiebreak_orders_equal_timestamps(self, spark):
        rows = [(1, 0.0, "A", 2), (1, 0.0, "B", 1), (1, 5.0, "C", 3)]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=s, event_id=e)
             for u, t, s, e in rows])
        out = {r["state"]: r for r in ts.state_durations(df).collect()}
        # order is (ts, event_id): B(0) -> A(0) -> C(5)
        assert out["B"]["total_seconds"] == 0.0
        assert out["A"]["total_seconds"] == 5.0
        assert "C" not in out


class TestLorenzDeciles:
    def test_hand_curve(self, spark):
        df = spark.createDataFrame(
            [Row(e=i, amt=float(i)) for i in (1, 2, 3, 4)])
        out = {r["decile"]: r for r in
               st.lorenz_deciles(df, "e", "amt").collect()}
        assert len(out) == 10
        assert (out[1]["cum_entities"], out[1]["cum_share"]) == (1, 0.1)
        assert (out[3]["cum_entities"], out[3]["cum_share"]) == (2, 0.3)
        assert (out[6]["cum_entities"], out[6]["cum_share"]) == (3, 0.6)
        assert (out[8]["cum_entities"], out[8]["cum_share"]) == (4, 1.0)
        assert out[10]["cum_share"] == 1.0

    def test_multiple_rows_per_entity_summed(self, spark):
        df = spark.createDataFrame(
            [Row(e=1, amt=0.5), Row(e=1, amt=0.5),
             Row(e=2, amt=9.0)])
        out = {r["decile"]: r for r in
               st.lorenz_deciles(df, "e", "amt").collect()}
        assert out[5]["cum_share"] == pytest.approx(0.1, abs=1e-6)
        assert out[10]["cum_share"] == 1.0


class TestKfoldReport:
    def test_partition_and_determinism(self, spark):
        import hashlib
        df = spark.createDataFrame(
            [Row(id=i, label=i % 3) for i in range(60)])
        out = rel.kfold_report(df, "id", "label", k=5).collect()
        assert sum(r["n"] for r in out) == 60
        assert {r["fold"] for r in out} <= set(range(5))
        # engine-portable hash pin for one id
        f0 = int(hashlib.md5(b"kfold7").hexdigest()[:15], 16) % 5
        got = {(r["fold"], r["label"]): r["n"] for r in out}
        assert any(f == f0 and lb == 7 % 3 for (f, lb) in got)
        assert out == rel.kfold_report(df, "id", "label", k=5).collect()


class TestLastTouchAttribution:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et, value=v, event_id=e)
             for u, t, et, v, e in rows],
            schema="user_id long, ts double, event_type string, "
                   "value double, event_id long")

    def test_hand_attribution(self, spark):
        rows = [
            (1, 0.0, "view", None, 1),
            (1, 100.0, "click", None, 2),
            (1, 200.0, "purchase", 50.0, 3),     # -> click
            (2, 0.0, "view", None, 4),
            (2, 8000.0, "purchase", 30.0, 5),    # touch too old -> none
            (3, 10.0, "purchase", 20.0, 6),      # never touched -> none
        ]
        out = {r["channel"]: r for r in ts.last_touch_attribution(
            self._ev(spark, rows)).collect()}
        assert out["click"]["n_conversions"] == 1
        assert out["click"]["total_value"] == 50.0
        assert out["(none)"]["n_conversions"] == 2
        assert out["(none)"]["total_value"] == 50.0
        assert "view" not in out

    def test_same_instant_touch_credits(self, spark):
        rows = [(1, 100.0, "view", None, 1),
                (1, 100.0, "purchase", 10.0, 2)]
        out = ts.last_touch_attribution(self._ev(spark, rows)).collect()
        assert out[0]["channel"] == "view"

    def test_null_purchase_value_counts_as_zero(self, spark):
        rows = [(1, 0.0, "click", None, 1),
                (1, 10.0, "purchase", None, 2)]
        out = ts.last_touch_attribution(self._ev(spark, rows)).collect()
        assert out[0]["n_conversions"] == 1
        assert out[0]["total_value"] == 0.0


class TestReconciliationAudit:
    def test_hand_diffs(self, spark):
        hdr = spark.createDataFrame(
            [Row(k=1, total=100.0), Row(k=2, total=50.0),
             Row(k=3, total=7.5)])
        lines = spark.createDataFrame(
            [Row(k=1, amt=60.0), Row(k=1, amt=40.0),   # exact match
             Row(k=2, amt=45.0)])                      # 5 short
        out = rel.reconciliation_audit(
            hdr, lines, "k", "total", F.col("amt")).collect()
        # worst first: k=3 has NO lines (diff 7.5), then k=2 (5), k=1 (0)
        assert [(r["k"], r["diff"]) for r in out] \
            == [(3, 7.5), (2, 5.0), (1, 0.0)]
        assert out[0]["recomputed"] == 0.0

    def test_expression_amount(self, spark):
        hdr = spark.createDataFrame([Row(k=1, total=110.0)])
        lines = spark.createDataFrame(
            [Row(k=1, price=100.0, disc=0.0, tax=0.1)])
        amount = (F.col("price") * (F.lit(1.0) - F.col("disc"))
                  * (F.lit(1.0) + F.col("tax")))
        out = rel.reconciliation_audit(
            hdr, lines, "k", "total", amount).collect()
        assert out[0]["diff"] == pytest.approx(0.0, abs=1e-6)


class TestTimeToConvert:
    def test_hand_latency(self, spark):
        rows = [(1, 0.0, "view"), (1, 100.0, "purchase"),
                (1, 50.0, "purchase"),          # earliest at-or-after t0
                (2, 10.0, "purchase"),          # never viewed -> excluded
                (3, 100.0, "view"), (3, 50.0, "purchase"),  # pre-view only
                (4, 0.0, "view"), (4, 200.0, "purchase")]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et) for u, t, et in rows])
        out = ts.time_to_convert(df).collect()[0]
        # durations {50, 200}: nearest-rank p50/p90 both land on 200
        assert out["n_converted"] == 2
        assert out["q_50"] == 200.0 and out["q_90"] == 200.0
        assert out["mean_seconds"] == pytest.approx(125.0, abs=1e-6)


class TestCohortLtv:
    def test_hand_triangle(self, spark):
        wk = 604800.0
        rows = [(1, 100.0, "view", None),
                (1, 200.0, "purchase", 10.0),
                (1, wk + 5.0, "purchase", 20.0),
                (2, wk + 1.0, "signup", None),
                (2, wk + 2.0, "purchase", 5.0)]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et, value=v)
             for u, t, et, v in rows],
            schema="user_id long, ts double, event_type string, "
                   "value double")
        out = {(r["cohort_week"], r["age_weeks"]): r
               for r in ts.cohort_ltv(df).collect()}
        assert out[(0, 0)]["n_buyers"] == 1
        assert out[(0, 0)]["revenue"] == 10.0
        assert out[(0, 1)]["revenue"] == 20.0
        assert out[(1, 0)]["n_buyers"] == 1
        assert out[(1, 0)]["revenue"] == 5.0
        assert len(out) == 3


class TestDuplicateTransactions:
    def test_hand_pairs_and_rounding_groups(self, spark):
        rows = [(1, 0.0, 10.0), (1, 100.0, 10.0), (1, 150.0, 10.4),
                (1, 200.0, 10.6),          # rounds to 11 -> other group
                (2, 0.0, 10.0)]            # different user
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, value=v) for u, t, v in rows])
        out = rel.duplicate_transactions(
            df, "user_id", "ts", "value",
            max_gap_seconds=600.0, amount_decimals=0).collect()
        assert [(r["user_id"], r["gap_seconds"]) for r in out] \
            == [(1, 50.0), (1, 100.0)]
        assert all(r["amount"] == 10.0 for r in out)

    def test_gap_threshold(self, spark):
        df = spark.createDataFrame(
            [Row(user_id=1, ts=0.0, value=5.0),
             Row(user_id=1, ts=999.0, value=5.0)])
        assert rel.duplicate_transactions(
            df, "user_id", "ts", "value",
            max_gap_seconds=500.0).collect() == []


class TestAbcClassification:
    def test_hand_classes(self, spark):
        df = spark.createDataFrame(
            [Row(k=1, amt=80.0), Row(k=2, amt=15.0), Row(k=3, amt=5.0)])
        out = {r["abc_class"]: r for r in
               rel.abc_classification(df, "k", "amt").collect()}
        # cum shares desc: 0.80 -> A, 0.95 -> B, 1.00 -> C
        assert out["A"]["n_entities"] == 1
        assert out["A"]["revenue"] == 80.0
        assert out["A"]["revenue_share"] == pytest.approx(0.8, abs=1e-6)
        assert out["B"]["revenue"] == 15.0
        assert out["C"]["revenue"] == 5.0

    def test_single_entity_all_in_c(self, spark):
        # one entity holds 100% > b_cut: the crossing value opens C
        df = spark.createDataFrame([Row(k=1, amt=10.0)])
        out = rel.abc_classification(df, "k", "amt").collect()
        assert len(out) == 1 and out[0]["abc_class"] == "C"


class TestFanoutAudit:
    def test_hand_distribution(self, spark):
        parents = spark.createDataFrame([Row(pk=i) for i in (1, 2, 3, 4)])
        children = spark.createDataFrame(
            [Row(fk=k) for k in (1, 1, 1, 2, 3)])
        out = rel.fanout_audit(parents, children, "pk", "fk").collect()[0]
        assert out["n_parents"] == 4 and out["n_children"] == 5
        assert out["parents_no_children"] == 1
        assert out["min_fanout"] == 0 and out["max_fanout"] == 3
        # sorted fanouts [0,1,1,3]: p50 pos 3 -> 1; p95 pos 4 -> 3
        assert out["p50_fanout"] == 1 and out["p95_fanout"] == 3
        assert out["mean_fanout"] == pytest.approx(1.25, abs=1e-6)


class TestTokenCoverageCurve:
    def test_hand_curve(self, spark):
        from powerdatapipeline_spark.operators import text as tx
        df = spark.createDataFrame(
            [Row(text="a a a b"), Row(text="b c")])
        out = {r["k"]: r for r in
               tx.token_coverage_curve(df).collect()}
        # counts: a=3, b=2, c=1; total 6
        assert out[1]["covered_tokens"] == 3
        assert out[1]["coverage"] == pytest.approx(0.5, abs=1e-6)
        assert out[2]["coverage"] == pytest.approx(5 / 6, abs=1e-6)
        assert out[5]["n_terms"] == 3 and out[5]["coverage"] == 1.0
        assert out[20]["coverage"] == 1.0
        assert len(out) == 5


class TestCentroidShift:
    def test_hand_shift(self, spark):
        from powerdatapipeline_spark.operators import similarity as sim
        rows = [(1, 0, [1.0, 0.0]), (2, 0, [3.0, 0.0]),
                (3, 1, [0.0, 4.0])]
        df = spark.createDataFrame(
            [Row(vec_id=i, label=l, embedding=v) for i, l, v in rows])
        out = {r["label"]: r for r in
               sim.centroid_shift_report(df).collect()}
        # centroids: label0 = (2,0), label1 = (0,4); global = (4/3, 4/3)
        import math
        g = (4 / 3, 4 / 3)
        s0 = math.sqrt((2 - g[0]) ** 2 + (0 - g[1]) ** 2)
        s1 = math.sqrt((0 - g[0]) ** 2 + (4 - g[1]) ** 2)
        assert out[0]["n_vectors"] == 2
        assert out[0]["l2_shift"] == pytest.approx(s0, abs=1e-6)
        assert out[1]["n_vectors"] == 1
        assert out[1]["l2_shift"] == pytest.approx(s1, abs=1e-6)


class TestStreamingPsi:
    def test_finalizer_matches_batch(self, spark, tmp_path):
        from powerdatapipeline_spark.operators.stats import psi_drift
        from powerdatapipeline_spark.streaming.stateful import \
            finalize_psi_drift
        ref = spark.createDataFrame(
            [Row(value=float(v)) for v in (5, 25, 45, 65, 85, 105)])
        cur1 = [float(v) for v in (5, 5, 25, 145)]
        cur2 = [float(v) for v in (165, 185, 25)]
        p = str(tmp_path / "partials")
        from powerdatapipeline_spark.operators.stats import histogram
        for chunk in (cur1, cur2):
            (histogram(spark.createDataFrame(
                [Row(value=v) for v in chunk]), "value", 0.0, 200.0, 10)
             .select("bin", F.col("n").cast("bigint").alias("n"))
             .write.mode("append").parquet(p))
        got = finalize_psi_drift(spark, ref, "value", p).collect()
        want = psi_drift(ref, spark.createDataFrame(
            [Row(value=v) for v in cur1 + cur2]),
            "value", lo=0.0, hi=200.0, nbins=10).collect()
        assert got == want


class TestPeriodogram:
    def test_pure_daily_cycle(self, spark):
        # hourly samples of a clean 24 h cosine, amplitude 3, two days
        rows = [Row(ts=float(h) * 3600.0,
                    value=10.0 + 3.0 * math.cos(2 * math.pi * h / 24.0))
                for h in range(48)]
        out = {r["period_seconds"]: r for r in
               ts.periodogram(spark.createDataFrame(rows)).collect()}
        assert set(out) == {21600, 43200, 86400, 604800}
        # the 24 h probe recovers the amplitude; off-frequency probes
        # over an integer number of their periods stay near zero
        assert out[86400]["amplitude"] == pytest.approx(3.0, abs=1e-3)
        assert out[21600]["amplitude"] < 0.01
        assert out[43200]["amplitude"] < 0.01

    def test_constant_series_zero_power(self, spark):
        rows = [Row(ts=float(h) * 3600.0, value=7.0) for h in range(24)]
        out = ts.periodogram(spark.createDataFrame(rows)).collect()
        assert all(r["amplitude"] == pytest.approx(0.0, abs=1e-6)
                   for r in out)


class TestSessionEntryExit:
    def test_hand_sessions(self, spark):
        rows = [
            (1, 0.0, "view", 1), (1, 100.0, "click", 2),   # s1: view->click
            (1, 5000.0, "purchase", 3),                    # s2: bounce
            (2, 0.0, "view", 4),                           # s3: bounce
            (2, 10.0, "view", 5),                          # same session
        ]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et, event_id=e)
             for u, t, et, e in rows])
        out = {(r["entry_type"], r["exit_type"]): r
               for r in ts.session_entry_exit(df).collect()}
        assert out[("view", "click")]["n_sessions"] == 1
        assert out[("view", "click")]["n_bounces"] == 0
        assert out[("purchase", "purchase")]["n_bounces"] == 1
        assert out[("view", "view")]["n_sessions"] == 1
        assert out[("view", "view")]["avg_events"] == 2.0

    def test_same_ts_tiebreak(self, spark):
        rows = [(1, 0.0, "b", 2), (1, 0.0, "a", 1)]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et, event_id=e)
             for u, t, et, e in rows])
        out = ts.session_entry_exit(df).collect()[0]
        # order is (ts, event_id): entry a, exit b
        assert (out["entry_type"], out["exit_type"]) == ("a", "b")


class TestLoadCorrelationPivot:
    def test_correlated_and_anticorrelated(self, spark):
        from powerdatapipeline_spark.operators import stats as st
        rows = []
        for b in range(20):
            rows.append(Row(b=b, x=float(b), y=2.0 * b + 1.0,
                            z=float(-b)))
        df = spark.createDataFrame(rows)
        out = {(r["col_a"], r["col_b"]): r["corr"]
               for r in st.correlation_matrix(df, ["x", "y", "z"])
               .collect()}
        assert out[("x", "y")] == pytest.approx(1.0, abs=1e-6)
        assert out[("x", "z")] == pytest.approx(-1.0, abs=1e-6)


class TestHitsScores:
    def test_hand_two_rounds_exact(self, spark):
        from powerdatapipeline_spark.operators import graph as gr
        edges = spark.createDataFrame(
            [Row(src="u1", dst="p1"), Row(src="u1", dst="p2"),
             Row(src="u2", dst="p1"), Row(src="u2", dst="p1")])  # dup
        out = gr.hits_scores(edges, rounds=2).collect()
        # a1: p1=2, p2=1; h1: u1=3, u2=2; a2: p1=5, p2=3
        assert [(r["node"], r["authority_int"]) for r in out] \
            == [("p1", 5), ("p2", 3)]
        assert out[0]["authority"] == 1.0
        assert out[1]["authority"] == pytest.approx(0.6, abs=1e-6)


class TestVocabRichness:
    def test_hand_ttr_hapax(self, spark):
        from powerdatapipeline_spark.operators import text as tx
        df = spark.createDataFrame(
            [Row(text="a a b", source="A"), Row(text="c", source="B")])
        out = {r["source"]: r for r in tx.vocab_richness(df).collect()}
        a = out["A"]
        assert (a["n_tokens"], a["n_types"], a["n_hapax"]) == (3, 2, 1)
        assert a["ttr"] == pytest.approx(2 / 3, abs=1e-6)
        assert a["hapax_share"] == pytest.approx(0.5, abs=1e-6)
        b = out["B"]
        assert (b["n_tokens"], b["n_types"], b["ttr"]) == (1, 1, 1.0)


class TestBurstiness:
    def test_periodic_and_bursty(self, spark):
        rows = [(1, 0.0, "X", 1), (1, 10.0, "X", 2), (1, 20.0, "X", 3),
                (2, 0.0, "Y", 4), (2, 0.0, "Y", 5), (2, 30.0, "Y", 6)]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=et, event_id=e)
             for u, t, et, e in rows])
        out = {r["event_type"]: r for r in
               ts.burstiness_report(df).collect()}
        # X: gaps [10,10] -> sigma 0 -> B = -1 (periodic)
        assert out["X"]["n_gaps"] == 2
        assert out["X"]["mean_gap_s"] == 10.0
        assert out["X"]["cv"] == pytest.approx(0.0, abs=1e-6)
        assert out["X"]["burstiness"] == pytest.approx(-1.0, abs=1e-6)
        # Y: gaps [0,30] -> mu = sigma = 15 -> B = 0, cv = 1
        assert out["Y"]["cv"] == pytest.approx(1.0, abs=1e-6)
        assert out["Y"]["burstiness"] == pytest.approx(0.0, abs=1e-6)


class TestParetoFrontier:
    def test_hand_skyline(self, spark):
        pts = [(1.0, 5), (1.0, 5), (2.0, 3), (2.0, 7), (3.0, 3),
               (3.0, 1)]
        df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
        out = rel.pareto_frontier_2d(df, "x", "y").collect()
        # (2,7) dominated by (2,3); (3,3) dominated by (2,3)
        assert [(r["x"], r["y"], r["n_rows"]) for r in out] \
            == [(1.0, 5, 2), (2.0, 3, 1), (3.0, 1, 1)]

    def test_duplicates_do_not_dominate_each_other(self, spark):
        df = spark.createDataFrame([Row(x=1.0, y=1), Row(x=1.0, y=1)])
        out = rel.pareto_frontier_2d(df, "x", "y").collect()
        assert len(out) == 1 and out[0]["n_rows"] == 2


class TestIncrementalAggMerge:
    def test_merge_equals_recompute(self, spark):
        from powerdatapipeline_spark.queries import (
            load_events, q238_incremental_agg)
        sf = "/root/testdata/sf0.001"
        got = q238_incremental_agg(spark, sf).collect()
        ev = load_events(spark, sf).where(
            F.col("event_type").isNotNull() & F.col("value").isNotNull()
            & F.col("ts").isNotNull())
        direct = (ev.groupBy("event_type")
                  .agg(F.count("*").cast("bigint").alias("n"),
                       F.sum(F.col("value").cast("decimal(38,10)"))
                       .alias("s"))
                  .orderBy("event_type").collect())
        assert [(r["event_type"], r["n"]) for r in got] \
            == [(r["event_type"], r["n"]) for r in direct]
        for g, d in zip(got, direct):
            assert g["total"] == pytest.approx(float(d["s"]), abs=1e-6)


class TestScd2AsofRead:
    def test_one_version_per_key_within_range(self, spark):
        from powerdatapipeline_spark.queries import (
            _ASOF_T, q129_scd2_merge, q239_scd2_asof_read)
        sf = "/root/testdata/sf0.001"
        got = q239_scd2_asof_read(spark, sf).collect()
        keys = [r["user_id"] for r in got]
        assert len(keys) == len(set(keys))
        dim = {(r["user_id"], r["valid_from"]): r
               for r in q129_scd2_merge(spark, sf).collect()}
        for r in got:
            v = dim[(r["user_id"], r["valid_from"])]
            assert v["valid_from"] <= _ASOF_T
            assert v["valid_to"] is None or v["valid_to"] > _ASOF_T


class TestChangepointTwoLevel:
    def test_hand_three_segments(self, spark):
        # levels 1,1,5,5,9,9: best global split at day 3 (1,1,5,5 | 9,9
        # or 1,1 | 5,5,9,9 — symmetric gains, earliest bucket wins),
        # second split separates the remaining two levels
        df = spark.createDataFrame(
            [Row(ts=float(d) * 86400.0, value=v)
             for d, v in [(0, 1.0), (1, 1.0), (2, 5.0), (3, 5.0),
                          (4, 9.0), (5, 9.0)]])
        out = ts.changepoint_two_level(df).collect()[0]
        assert out["n_buckets"] == 6
        assert {out["split1_bucket"], out["split2_bucket"]} == {1, 3}
        assert out["mean_seg1"] == pytest.approx(1.0, abs=1e-6)
        assert out["mean_seg2"] == pytest.approx(5.0, abs=1e-6)
        assert out["mean_seg3"] == pytest.approx(9.0, abs=1e-6)

    def test_too_short_series_empty(self, spark):
        df = spark.createDataFrame(
            [Row(ts=0.0, value=1.0), Row(ts=86400.0, value=9.0)])
        assert ts.changepoint_two_level(df).collect() == []


class TestCopurchaseHitrate:
    def test_hand_hit_and_miss(self, spark):
        rows = [
            # train (t < 100): baskets {1: p1,p2}, {2: p1,p2}, {3: p1,p3}
            (1, "p1", 0.0), (1, "p2", 0.0),
            (2, "p1", 0.0), (2, "p2", 0.0),
            (3, "p1", 0.0), (3, "p3", 0.0),
            # test (t >= 100): basket 10 has p1+p2 (hit for p1->p2 and
            # p2->p1), basket 11 has p1 alone (miss), basket 12 has p9
            # (no rec trained)
            (10, "p1", 100.0), (10, "p2", 100.0),
            (11, "p1", 100.0), (12, "p9", 100.0),
        ]
        df = spark.createDataFrame(
            [Row(basket=b, item=i, ts=t) for b, i, t in rows])
        out = rel.copurchase_hitrate(df, "basket", "item", "ts",
                                     split_epoch=100.0).collect()[0]
        # recs: p1 -> p2 (2 co-baskets beats p3's 1), p2 -> p1, p3 -> p1
        assert out["n_train_baskets"] == 3
        assert out["n_test_items"] == 4
        assert out["n_scored"] == 3       # p9 has no trained rec
        assert out["n_hits"] == 2         # both items of basket 10
        assert out["hit_rate"] == pytest.approx(2 / 3, abs=1e-6)

    def test_no_test_rows(self, spark):
        df = spark.createDataFrame(
            [Row(basket=1, item="a", ts=0.0),
             Row(basket=1, item="b", ts=0.0)])
        out = rel.copurchase_hitrate(df, "basket", "item", "ts",
                                     split_epoch=100.0).collect()[0]
        assert out["n_test_items"] == 0 and out["hit_rate"] is None
