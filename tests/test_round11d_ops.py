"""Value pins for the round-11d operators: join-size pre-flight,
ramp-rate report, deterministic negative sampling."""

import hashlib
import math

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import timeseries as ts

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


def test_join_size_estimate_hand_case(spark):
    left = spark.createDataFrame(
        [(1,)] * 3 + [(2,)] * 2 + [(3,)] * 1 + [(9,)], "k bigint")
    right = spark.createDataFrame(
        [(1,)] * 4 + [(2,)] * 1 + [(8,)], "k bigint")
    got = {r.key: r for r in
           rel.join_size_estimate(left, right, "k", "k").collect()}
    # common keys: 1 -> 3*4 = 12, 2 -> 2*1 = 2; total 14
    assert set(got) == {1, 2}
    assert got[1].contrib == 12 and got[2].contrib == 2
    assert got[1].est_total_rows == 14
    assert got[1].share == fl6(12 / 14)
    assert got[1].n_left == 3 and got[1].n_right == 4


def test_ramp_rates_hand_case(spark):
    # one series: values 0, 10 (1h later), 10 (1h), 40 (2h) ->
    # ramps 10, 0, 15 per hour
    rows = [(1, 0.0, 0.0), (1, 3600.0, 10.0), (1, 7200.0, 10.0),
            (1, 14400.0, 40.0)]
    df = (spark.createDataFrame(rows, "u bigint, e double, v double")
          .select("u", F.col("e").cast("timestamp").alias("ts"), "v",
                  F.lit("t1").alias("g")))
    got = ts.ramp_rates(df, "ts", "v", "g", ["u"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_ramps == 3
    assert r.mean_ramp == fl6((10 + 0 + 15) / 3)
    assert r.p50_ramp == 10.0  # sorted ramps [0, 10, 15], pos floor(.5*2+.5)+1=2
    assert r.p90_ramp == 15.0
    assert r.max_ramp == 15.0


def test_ramp_rates_zero_dt_excluded(spark):
    rows = [(1, 0.0, 0.0), (1, 0.0, 99.0), (1, 3600.0, 10.0)]
    df = (spark.createDataFrame(rows, "u bigint, e double, v double")
          .select("u", F.col("e").cast("timestamp").alias("ts"), "v",
                  F.lit("t").alias("g")))
    r = ts.ramp_rates(df, "ts", "v", "g", ["u"]).collect()[0]
    assert r.n_ramps == 1  # the duplicate-timestamp pair is dropped


def test_negative_sampling_deterministic_and_k(spark):
    df = spark.createDataFrame(
        [(7, 3), (7, 3), (8, 1)], "u bigint, i bigint")  # dup positive
    out = rel.negative_sampling(df, "u", "i", n_items=5, k=2).collect()
    # exactly k rows per DISTINCT positive
    by_pair = {}
    for r in out:
        by_pair.setdefault((r.user, r.pos_item), []).append(r)
    assert set(by_pair) == {(7, 3), (8, 1)}
    assert all(len(v) == 2 for v in by_pair.values())
    # reproducible: md5-derived shift trick over (user, pos, slot) —
    # the positive is in the draw key (ADVICE r11 #3) — never the own
    # positive
    for r in out:
        d = int(hashlib.md5(
            f"|neg{r.user}|{r.pos_item}|{r.slot}".encode()).hexdigest()[:15],
            16) % 4 + 1
        want = d + 1 if d >= r.pos_item else d
        assert r.neg_item == want
        assert r.neg_item != r.pos_item
        assert 1 <= r.neg_item <= 5
    # second run identical (pure hash, no RNG)
    again = rel.negative_sampling(df, "u", "i", n_items=5, k=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_sampling_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 1)], "u bigint, i bigint")
    with pytest.raises(ValueError, match="k"):
        rel.negative_sampling(df, "u", "i", n_items=5, k=0)
    with pytest.raises(ValueError, match="n_items"):
        rel.negative_sampling(df, "u", "i", n_items=1)


def test_policy_replay_hand_case(spark):
    from powerdatapipeline_spark.operators import stats as st
    # logged arms a/b; target policy always picks 'a'
    rows = [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0), ("b", 0.0)]
    df = spark.createDataFrame(rows, "arm string, r double")
    out = st.policy_replay_eval(df, "arm", F.col("r"),
                                F.lit("a")).collect()
    per = {r.arm: r for r in out}
    assert per["a"].n_matched == 3 and per["a"].reward_rate == fl6(2 / 3)
    assert per["b"].n_matched == 0 and per["b"].reward_rate is None
    overall = per[None]
    assert overall.n_logged == 5 and overall.n_matched == 3
    assert overall.reward_rate == fl6(2 / 3)
    assert overall.match_rate == fl6(3 / 5)
    assert out[-1].arm is None  # overall row last


def test_schema_contract_all_statuses(spark):
    from powerdatapipeline_spark.sources import readers as rd
    df = spark.createDataFrame([(1, "x", 2.0)],
                               "id bigint, name string, score double")
    got = {r.column: r.status for r in rd.schema_contract(
        df, {"id": "bigint", "name": "int", "missing_col": "string"}
    ).collect()}
    assert got == {"id": "ok", "name": "type_mismatch",
                   "missing_col": "missing", "score": "unexpected"}


def test_stratified_exact_split_proportions_and_partition(spark):
    rows = [(f"k{i:03d}", f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "k string, g string")
    out = rel.stratified_exact_split(df, "k", "g").collect()
    per = {}
    for r in out:
        per.setdefault(r.stratum, {})[r.split] = r.n_rows
    for g, d in per.items():
        assert sum(d.values()) == 100
        assert d["train"] == 80 and d["val"] == 10 and d["test"] == 10
    # reproducible checksums
    again = rel.stratified_exact_split(df, "k", "g").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # different salt -> different assignment (checksums move)
    other = rel.stratified_exact_split(df, "k", "g", salt="v2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_stratified_exact_split_validation(spark):
    import pytest

    df = spark.createDataFrame([("a", "g")], "k string, g string")
    with pytest.raises(ValueError, match="sum to 1"):
        rel.stratified_exact_split(df, "k", "g", fractions=(0.5, 0.4),
                                   names=("a", "b"))
    with pytest.raises(ValueError, match="align"):
        rel.stratified_exact_split(df, "k", "g", fractions=(0.5, 0.5),
                                   names=("a", "b", "c"))


def test_cosine_threshold_curve_twin(spark):
    import numpy as np
    from powerdatapipeline_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((10, 6)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)],
        "vec_id bigint, embedding array<float>")
    got = {r.threshold: r for r in
           sim.cosine_threshold_curve(df, thresholds=(0.0, 0.5)).collect()}
    v = vecs.astype("float64")
    n = np.linalg.norm(v, axis=1)
    cos = [round((v[i] @ v[j]) / (n[i] * n[j]), 6)
           for i in range(10) for j in range(i + 1, 10)]
    assert got[0.0].n_pairs_total == 45
    assert got[0.0].n_pairs_ge == sum(1 for c in cos if c >= 0.0)
    assert got[0.5].n_pairs_ge == sum(1 for c in cos if c >= 0.5)


def test_join_size_estimate_no_common_keys_empty(spark):
    l = spark.createDataFrame([(1,), (2,)], "k bigint")
    r = spark.createDataFrame([(3,), (4,)], "k bigint")
    assert rel.join_size_estimate(l, r, "k", "k").count() == 0


def test_policy_replay_no_matches_overall_null_rate(spark):
    from powerdatapipeline_spark.operators import stats as st
    df = spark.createDataFrame([("a", 1.0), ("b", 0.0)],
                               "arm string, r double")
    out = {r.arm: r for r in st.policy_replay_eval(
        df, "arm", F.col("r"), F.lit("zzz")).collect()}
    assert out[None].n_matched == 0
    assert out[None].reward_rate is None
    assert out[None].match_rate == 0.0


def test_schema_contract_array_and_exact_match(spark):
    from powerdatapipeline_spark.sources import readers as rd
    df = spark.createDataFrame([(1, [1.0])],
                               "vec_id bigint, embedding array<float>")
    got = {r.column: (r.status, r.actual_type) for r in rd.schema_contract(
        df, {"vec_id": "bigint", "embedding": "array<float>"}).collect()}
    assert got == {"vec_id": ("ok", "bigint"),
                   "embedding": ("ok", "array<float>")}


def test_mutual_knn_two_vectors_fully_mutual(spark):
    from powerdatapipeline_spark.operators import similarity as sim
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id bigint, embedding array<float>")
    r = sim.mutual_knn_rate(df, k=1).collect()[0]
    assert (r.n_vectors, r.n_edges, r.n_mutual, r.mutual_rate) \
        == (2, 2, 2, 1.0)


def test_cosine_threshold_curve_single_vector_no_pairs(spark):
    from powerdatapipeline_spark.operators import similarity as sim
    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id bigint, embedding array<float>")
    out = sim.cosine_threshold_curve(df, thresholds=(0.5,)).collect()
    assert len(out) == 1
    assert out[0].n_pairs_total == 0 and out[0].share == 0.0
