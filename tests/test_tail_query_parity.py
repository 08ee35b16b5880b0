"""Value-level oracle parity for registry TAIL queries.

The driver's correctness snapshot records only the first 50 registry
entries; the tail (approximate-by-nature entries plus queries whose
operator coverage is redundant with a head entry) would otherwise have no
recorded harness answer. This test pins each oracle-paired tail query
against its own DuckDB oracle at sf0.001 with the same canonical compare
`tools/check_parity.py` uses — so "past the snapshot cap" never again
means "unverified".
"""

import math

import duckdb
import pytest

from powerdatapipeline_spark.queries import REGISTRY, _TAIL

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ORACLE_TAIL = [n for n in _TAIL if REGISTRY[n][1] is not None]


def _canon(df):
    cols = sorted(df.columns)
    df = df[cols]

    def fmt(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return sorted(tuple(fmt(v) for v in row)
                  for row in df.itertuples(index=False))


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_TAIL)
def test_tail_query_matches_oracle(spark, sf_dir, oracle_con, name):
    fn, oracle = REGISTRY[name]
    got = _canon(fn(spark, sf_dir).toPandas())
    want = _canon(oracle_con.execute(oracle).df())
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle"
