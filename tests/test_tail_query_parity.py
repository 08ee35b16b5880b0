"""Value-level oracle parity for registry TAIL queries.

The driver's correctness snapshot records only the first 50 registry
entries; the tail (queries whose operator coverage is redundant with a
head entry, plus rotation parking spots) would otherwise have no recorded
harness answer. This test pins each oracle-paired tail query against its
own DuckDB oracle with the same canonical compare ``tools/check_parity.py``
uses — at BOTH sf0.001 (fast) and sf0.01, the driver's own scale factor,
so small-sf coincidences (regex classes or guards that only diverge on
rows absent at sf0.001) can't hide (VERDICT r5 #5).

Structural guards (VERDICT r5 #6) make the cap un-fallible: every
registry entry past position 50 must be an explicit ``_TAIL`` member, so
a newly added query can never silently land past the recorded window.
"""

import math

import duckdb
import pytest

from powerdatapipeline_spark.queries import REGISTRY, _TAIL

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ORACLE_TAIL = [n for n in _TAIL if REGISTRY[n][1] is not None]

#: sf0.001 = iteration speed; sf0.01 = the driver's correctness scale
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


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


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def tail_sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def oracle_con(tail_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{tail_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_TAIL)
def test_tail_query_matches_oracle(spark, tail_sf_dir, oracle_con, name):
    fn, oracle = REGISTRY[name]
    got = _canon(fn(spark, tail_sf_dir).toPandas())
    want = _canon(oracle_con.execute(oracle).df())
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle"


def test_every_entry_past_the_cap_is_declared_tail():
    """The driver records the first 50 queries() entries. Anything past
    position 50 MUST be an explicit _TAIL member (and thus parity-covered
    above) — a new @register can never silently land unverified."""
    names = list(REGISTRY)
    past_cap = names[50:]
    assert set(past_cap) <= set(_TAIL), (
        f"registry entries past the 50-entry snapshot cap are not in "
        f"_TAIL (unrecorded AND unpinned): {set(past_cap) - set(_TAIL)}")
    # _TAIL members must actually sit past the cap, not burn head slots
    assert set(past_cap) == set(_TAIL)


def test_head_is_at_most_fifty_and_oracle_paired():
    names = list(REGISTRY)
    head = names[:len(names) - len(_TAIL)]
    assert len(head) <= 50
    rows_only = [n for n in head if REGISTRY[n][1] is None]
    assert not rows_only, (
        f"head entries without an oracle waste recorded-window slots "
        f"(driver would log a weaker rows-only check): {rows_only}")
