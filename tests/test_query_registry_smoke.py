"""Full-registry analysis smoke test.

Round 4 post-mortem: the driver regenerated the events fixture with a new
physical schema and a single loader line made 20 queries fail *analysis* —
a failure mode no targeted unit test caught because each test exercised its
own operator, not every registered query against the real fixtures.

This test forces Catalyst analysis (schema resolution) of EVERY registry
entry against the sf0.001 fixtures, so a fixture-schema drift or an
analysis bug can never again reach the driver unseen. Streaming queries
execute for real (their builders run the availableNow micro-batch and
return the materialized sink), which doubles as an end-to-end check.
"""

import pytest

from powerdatapipeline_spark.queries import REGISTRY

# Streaming builders execute the stream inside fn(); everything else is
# analysis-only (df.schema) and costs milliseconds.
STREAMING = {"q45_streaming_downsample", "q65_stream_stream_join"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_entry_analyzes(spark, sf_dir, name):
    fn, _oracle = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.schema.fieldNames(), f"{name} produced an empty schema"
    if name in STREAMING:
        # already materialized by the builder; prove it is collectable
        df.limit(1).collect()
