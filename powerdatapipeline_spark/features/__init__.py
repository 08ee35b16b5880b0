from powerdatapipeline_spark.features.featurespace import (  # noqa: F401
    FeatureSpace,
    FeatureSpec,
)
