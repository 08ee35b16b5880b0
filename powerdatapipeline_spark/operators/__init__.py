from powerdatapipeline_spark.operators import (  # noqa: F401
    dedup,
    relational,
    similarity,
    text,
    timeseries,
)
