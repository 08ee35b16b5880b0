from powerdatapipeline_spark.config.model import (  # noqa: F401
    DataPipelineConfig,
    Extraction,
    RunConfig,
    Transformation,
    load_config,
)
