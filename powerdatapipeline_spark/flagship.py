"""Flagship pipeline: the reference's signature end-to-end time-series chain
(SURVEY.md §7 P1) re-expressed as ONE declarative DataFrame plan over the
``events`` stream table.

Reference chain (examples/datapipeline_test.py:26-61 → SURVEY.md §3.1):
scan → derive ``datetimestampseconds`` → select → interval audit →
resample (downsample to a coarser grid, mean fill) → normalize → cyclical
time features. Here each stage is a Catalyst-visible transformation; the
whole thing is two shuffles (one groupBy on the resample bucket, one tiny
stats aggregate for z-score) regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powerdatapipeline_spark.functions.datetime_funcs import _cyclical


def flagship(spark: SparkSession, sf_dir: str, bucket_seconds: int = 3600) -> DataFrame:
    from powerdatapipeline_spark.queries import load_events

    ev = load_events(spark, sf_dir)
    # derive epoch seconds (reference tfdataset_utilities.py:122-140):
    # DoubleType to keep sub-second precision without overflow
    ev = ev.select(
        "event_type",
        F.col("ts").cast("double").alias("datetimestampseconds"),
        "value",
    )
    # tumbling-window mean downsample (reference pandas resample().mean(),
    # pandas_utilities.py:115-129) + interval/cadence stats per bucket
    bucket = (F.floor(F.col("datetimestampseconds") / bucket_seconds)
              * bucket_seconds).alias("bucket_seconds")
    agg = (ev.groupBy(bucket, "event_type")
             .agg(F.avg("value").alias("avg_value"),
                  F.count("*").alias("n_events"),
                  F.min("datetimestampseconds").alias("first_seen"),
                  F.max("datetimestampseconds").alias("last_seen")))
    # z-score the bucket means (reference normalizer, tfdataset_utilities.py:
    # 81-105): stats via one tiny agg — population variance, Appendix A.10
    stats = agg.agg(F.avg("avg_value").alias("m"),
                    F.var_pop("avg_value").alias("v")).first()
    denom = (stats.v or 0.0) ** 0.5 or 1.0
    z = ((F.col("avg_value") - F.lit(stats.m)) / F.lit(denom)).alias("avg_value_z")
    # cyclical time features of the bucket start (reference datapipeline.py
    # :523-566; exact π per Appendix A.1)
    cyc = _cyclical("bucket_seconds", ["hour", "day"])
    return agg.select("bucket_seconds", "event_type", "avg_value", "n_events",
                      "first_seen", "last_seen", z, *cyc)
