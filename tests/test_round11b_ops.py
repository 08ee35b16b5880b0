"""Value pins for the round-11b operators: Krippendorff alpha, WOE/IV,
script audit, sketch calibration, label propagation, anisotropy."""

import math

import pyspark.sql.functions as F

from powerdatapipeline_spark.operators import dedup as dd
from powerdatapipeline_spark.operators import graph as gr
from powerdatapipeline_spark.operators import similarity as sim
from powerdatapipeline_spark.operators import stats as st
from powerdatapipeline_spark.operators import text as tx

fl6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6


# ---------------------------------------------------- krippendorff_alpha
def test_krippendorff_textbook_case(spark):
    # Krippendorff's own nominal example (2011 tutorial, 2 observers,
    # 12 units, 2 with missing data dropped by the m>=2 rule is not
    # exercised here — both rate all 10 pairable units):
    # pairs: (a,a)x6? Use a simple verifiable case instead:
    # 4 units x 3 raters: unit1 all 'x' (agree), unit2 all 'y',
    # unit3 x,x,y, unit4 x,y,y
    rows = [(1, "x")] * 3 + [(2, "y")] * 3 \
        + [(3, "x"), (3, "x"), (3, "y")] \
        + [(4, "x"), (4, "y"), (4, "y")]
    df = spark.createDataFrame(rows, "u bigint, c string")
    got = st.krippendorff_alpha(df, "u", "c").collect()[0]
    # D_o = (1/12)·Σ n_uc(m−n_uc)/(m−1): units 3,4 each contribute
    # (2·1 + 1·2)/2 = 2 → Σ = 4 → D_o = 4/12
    # n_x = 6, n_y = 6, n = 12 → D_e = (6·6 + 6·6)/(12·11) = 72/132
    d_o, d_e = 4 / 12, 72 / 132
    assert got.n_units == 4 and got.n_ratings == 12 and got.n_labels == 2
    assert got.d_o == fl6(d_o)
    assert got.d_e == fl6(d_e)
    assert got.alpha == fl6(1 - d_o / d_e)


def test_krippendorff_perfect_and_single_rating_units(spark):
    rows = [(1, "a"), (1, "a"), (2, "b"), (2, "b"),
            (3, "a")]  # unit 3 has one rating -> dropped
    df = spark.createDataFrame(rows, "u bigint, c string")
    got = st.krippendorff_alpha(df, "u", "c").collect()[0]
    assert got.n_units == 2 and got.n_ratings == 4
    assert got.d_o == 0.0 and got.alpha == 1.0


# ------------------------------------------------------------------ woe_iv
def test_woe_iv_hand_case(spark):
    # bucket 0: 2 pos, 8 neg; bucket 1: 8 pos, 2 neg; G = B = 10
    rows = ([(0, True)] * 2 + [(0, False)] * 8
            + [(1, True)] * 8 + [(1, False)] * 2)
    df = spark.createDataFrame(rows, "b int, y boolean")
    out = {r.bucket: r for r in
           st.woe_iv(df, F.col("b"), F.col("y")).collect()}
    w0 = round(math.log((2 / 10) / (8 / 10)), 6)
    w1 = round(math.log((8 / 10) / (2 / 10)), 6)
    iv = fl6((2 / 10 - 8 / 10) * w0 + (8 / 10 - 2 / 10) * w1)
    assert out[0].woe == w0 and out[1].woe == w1
    assert out[0].iv_total == iv and out[1].iv_total == iv


def test_woe_iv_degenerate_bucket_null_not_smoothed(spark):
    rows = [(0, True), (0, False), (1, True)]  # bucket 1: no negatives
    df = spark.createDataFrame(rows, "b int, y boolean")
    out = {r.bucket: r for r in
           st.woe_iv(df, F.col("b"), F.col("y")).collect()}
    assert out[1].woe is None and out[1].iv is None
    assert out[0].woe is not None


# ------------------------------------------------------------ script_audit
def test_script_audit_exact_counts(spark):
    df = spark.createDataFrame(
        [("s1", "ab1 !"), ("s1", "XY"), ("s2", "12 34")],
        "source string, text string")
    out = {r.group: r for r in tx.script_audit(df).collect()}
    # s1: chars 7, letters 4, digits 1, spaces 1, other 1
    assert out["s1"].n_chars == 7
    assert out["s1"].letter_ratio == fl6(4 / 7)
    assert out["s1"].digit_ratio == fl6(1 / 7)
    assert out["s1"].space_ratio == fl6(1 / 7)
    assert out["s1"].other_ratio == fl6(1 / 7)
    # s2: chars 5, digits 4, space 1
    assert out["s2"].letter_ratio == 0.0
    assert out["s2"].digit_ratio == fl6(4 / 5)


# ------------------------------------------------------ sketch_calibration
def test_sketch_calibration_aggregates(spark):
    pairs = spark.createDataFrame(
        [(0.5, 0.4), (0.5, 0.6), (0.75, 0.8)],
        "est_jaccard double, jaccard double")
    out = {r.est: r for r in dd.sketch_calibration(pairs).collect()}
    assert out[0.5].n_pairs == 2
    assert out[0.5].mean_exact == 0.5
    assert out[0.5].mean_abs_err == fl6(0.1)
    assert out[0.5].bias == 0.0
    assert out[0.75].bias == fl6(0.05)


# ------------------------------------------------------- label_propagation
def test_label_propagation_two_cliques(spark):
    # two triangles joined by nothing: communities = each triangle,
    # labels flood to the min node id
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.label: r.n_nodes
           for r in gr.label_propagation(df, rounds=2).collect()}
    assert got == {1: 3, 10: 3}


def test_label_propagation_validation_and_tiebreak(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="rounds"):
        gr.label_propagation(df, rounds=0)
    # single edge: after round 1 both nodes hold the other's label; the
    # min tiebreak is vacuous (one neighbor each); round 2 swaps back —
    # deterministic either way: labels are {1: from node 2, 2: from 1}
    got = {r.label: r.n_nodes
           for r in gr.label_propagation(df, rounds=2).collect()}
    assert sum(got.values()) == 2


# ---------------------------------------------------- embedding_anisotropy
def test_embedding_anisotropy_twin(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(4)
    vecs = np.stack([base + 0.1 * rng.standard_normal(4)
                     for _ in range(50)]).astype("float32")
    df = spark.createDataFrame(
        [([float(x) for x in v],) for v in vecs],
        "embedding array<float>")
    got = sim.embedding_anisotropy(df, dim=4).collect()[0]
    v = vecs.astype("float64")
    mu = v.mean(axis=0)
    mu2 = float(mu @ mu)
    mean_n2 = float(np.mean([fl6(float(x @ x)) for x in v]))
    assert got.n_vectors == 50 and got.dim == 4
    assert abs(got.mu_norm_sq - fl6(mu2)) <= 2e-6
    assert abs(got.mean_norm_sq - fl6(mean_n2)) <= 2e-6
    assert abs(got.anisotropy - fl6(mu2 / mean_n2)) <= 1e-4
    # clustered-around-a-direction vectors are highly anisotropic
    assert got.anisotropy > 0.5
