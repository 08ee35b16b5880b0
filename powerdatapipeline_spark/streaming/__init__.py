from powerdatapipeline_spark.streaming.pipeline import (  # noqa: F401
    read_stream_csv,
    streaming_downsample_mean,
    streaming_dedup,
    streaming_interval_stats,
    streaming_sessionize,
    stream_stream_join,
    write_stream_parquet,
)
