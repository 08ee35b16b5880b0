"""Laws for the Poisson bootstrap CI (q153) and key-skew report (q154)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import relational as rel
from powerdatapipeline_spark.operators import stats as st


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    df = spark.createDataFrame([Row(k=i, v=float(i % 100))
                                for i in range(4000)])
    r = st.poisson_bootstrap_ci(df, "v", "k", n_replicas=40).collect()[0]
    assert r.n_rows == 4000 and r.n_replicas == 40
    assert abs(r.point_mean - 49.5) < 1e-6
    # CI must bracket the true mean and be tight-ish at n=4000
    assert r.boot_lo <= 49.5 <= r.boot_hi
    assert r.boot_hi - r.boot_lo < 5.0
    assert r.boot_se is not None and 0 < r.boot_se < 3.0
    # deterministic: identical rerun, partitioning-invariant
    r2 = st.poisson_bootstrap_ci(df.repartition(17), "v", "k",
                                 n_replicas=40).collect()[0]
    assert (r.boot_lo, r.boot_hi, r.boot_se) == \
        (r2.boot_lo, r2.boot_hi, r2.boot_se)


def test_bootstrap_ci_salt_and_validation(spark):
    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(500)])
    a = st.poisson_bootstrap_ci(df, "v", "k", n_replicas=20).collect()[0]
    b = st.poisson_bootstrap_ci(df, "v", "k", n_replicas=20,
                                salt="other").collect()[0]
    assert (a.boot_lo, a.boot_hi) != (b.boot_lo, b.boot_hi)
    with pytest.raises(ValueError, match="n_replicas"):
        st.poisson_bootstrap_ci(df, "v", "k", n_replicas=2)
    with pytest.raises(ValueError, match="lo_q"):
        st.poisson_bootstrap_ci(df, "v", "k", lo_q=0.9, hi_q=0.1)


def test_skew_report_uniform_vs_skewed(spark):
    uniform = spark.createDataFrame([Row(k=i % 50, v=i)
                                     for i in range(1000)])
    u = rel.skew_report(uniform, "k").collect()
    assert u[0].gini == 0.0  # perfectly uniform: 20 rows per key
    assert u[0].n_keys == 50
    assert abs(u[0].share - 0.02) < 1e-6

    skewed = spark.createDataFrame(
        [Row(k=0, v=i) for i in range(900)]
        + [Row(k=i, v=i) for i in range(1, 101)])
    s = rel.skew_report(skewed, "k").collect()
    top = next(r for r in s if r.skew_rank == 1)
    assert top.key_value == 0 and top.n_rows_key == 900
    assert top.share == 0.9
    assert top.gini > 0.8  # one key owns 90% of rows


def test_skew_report_excludes_nulls_and_validates(spark):
    df = spark.createDataFrame([(None, 1), (1, 2), (1, 3)], "k INT, v INT")
    rows = rel.skew_report(df, "k").collect()
    assert len(rows) == 1 and rows[0].n_rows_key == 2
    with pytest.raises(ValueError, match="top_n"):
        rel.skew_report(df, "k", top_n=0)
