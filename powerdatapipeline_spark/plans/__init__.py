from powerdatapipeline_spark.plans.pipeline import (  # noqa: F401
    build_pipeline,
    extract,
    transform,
)
