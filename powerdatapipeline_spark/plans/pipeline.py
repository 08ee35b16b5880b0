"""Config-driven end-to-end pipeline builder — the Spark analog of the
reference's orchestration layer (``get_dictdataset_from_csv`` →
``add_select_resample_csvdataset`` → featurize → window → split; reference
datapipeline/datapipeline.py:34-82, 619-650, 427-503; SURVEY.md §3).

One declarative DataFrame chain per config; no eager probes in the plan
(the reference forces partial execution repeatedly with ``take(1)`` debug
prints — SURVEY.md §3.4; here verbosity is the caller's problem).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powerdatapipeline_spark.config.model import RunConfig
from powerdatapipeline_spark.functions.datetime_funcs import with_derived_columns
from powerdatapipeline_spark.operators import timeseries as ts
from powerdatapipeline_spark.sources.readers import read_csv, read_parquet


def extract(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    """Extraction stage (reference ``get_dictdataset_from_csv``,
    datapipeline.py:34-82): scan with projection pushdown → equality filter.

    * ``use_streaming`` switches to a Structured Streaming file source (the
      reference declares this knob but nothing consumes it — reference
      config/config.py:89-90).
    * ``use_df`` stages through pandas then ``createDataFrame`` (the
      reference's branch dies with a NameError, SURVEY.md Appendix A.4;
      bounded reads only — this path exists for parity/QA, not scale).
    """
    ex = cfg.datapipeline.extraction
    paths = [os.path.join(ex.data_folder, f) if ex.data_folder else f
             for f in ex.data_files]
    if ex.use_streaming:
        from powerdatapipeline_spark.sources.readers import schema_for_columns
        from powerdatapipeline_spark.streaming.pipeline import read_stream_csv

        src = ex.streaming_data_source or (paths[0] if paths else ex.data_folder)
        schema = schema_for_columns(ex.columns_original, ex.column_dtypes)
        df = read_stream_csv(spark, src, schema,
                             header=ex.use_existing_columnnames)
    elif ex.use_df:
        import pandas as pd

        # honor the same header/column semantics as the Spark CSV branch,
        # and apply n_rows as a TOTAL limit, not per file
        kw = {}
        if not ex.use_existing_columnnames:
            kw = {"header": None, "names": ex.columns_original or None}
        pdf = pd.concat([pd.read_csv(p, nrows=ex.n_rows, **kw) for p in paths],
                        ignore_index=True)
        if ex.n_rows is not None:
            pdf = pdf.head(ex.n_rows)
        df = spark.createDataFrame(pdf)
    elif ex.file_format == "parquet":
        df = read_parquet(spark, paths[0] if len(paths) == 1 else paths)  # type: ignore[arg-type]
    else:
        overrides = dict(ex.column_dtypes)
        if ex.filtered_column and ex.filtered_value is not None:
            # a string-valued equality filter implies the column is text —
            # otherwise the name-driven float default nulls it out
            try:
                float(ex.filtered_value)
            except ValueError:
                overrides.setdefault(ex.filtered_column, "string")
        df = read_csv(spark, paths, columns=ex.columns_original or None,
                      header=ex.use_existing_columnnames,
                      limit=ex.n_rows, dtype_overrides=overrides)
    if ex.filtered_column and ex.filtered_value is not None:
        # equality KEEP-filter — the reference's filter_out_string keeps
        # matching rows despite its name (datapipeline.py:85-90, Appendix A.2)
        df = df.where(F.col(ex.filtered_column) == F.lit(ex.filtered_value))
    return df


def transform(df: DataFrame, cfg: RunConfig) -> DataFrame:
    """Transformation stage (reference ``add_select_resample_csvdataset``,
    datapipeline.py:619-650): derive datetime columns → select → interval
    audit → resample."""
    ex = cfg.datapipeline.extraction
    tr = cfg.datapipeline.transformation
    if ex.columns_added:
        dt_map = {}
        if ex.column_date:
            dt_map["date"] = ex.column_date
        if ex.column_time:
            dt_map["time"] = ex.column_time
        if ex.column_datetime:
            dt_map["datetime"] = ex.column_datetime
        df = with_derived_columns(df, ex.columns_added, dt_map)
    feats = (tr.features or (tr.input_features + tr.target_features)
             or list(ex.columns_selected))
    sec_col = "datetimestampseconds" if "datetimestampseconds" in (df.columns + list(ex.columns_added)) else ex.column_datetime
    keep = [c for c in dict.fromkeys(feats + ([sec_col] if sec_col else []))
            if c in df.columns or c in ex.columns_added]
    if keep:
        df = df.select(*keep)
    if tr.time_interval_original and sec_col and not df.isStreaming:
        # the audit is an action — on a stream, cadence monitoring is the
        # streaming_interval_stats job instead (streaming/pipeline.py)
        ts.check_intervals(
            df.withColumn("__ts", F.col(sec_col)), "__ts",
            float(tr.time_interval_original))
    if tr.resample and tr.time_interval_original and tr.time_interval_desired and sec_col:
        vcols = [c for c in feats if c != sec_col]
        if (df.isStreaming and tr.resample_method == "mean"
                and tr.time_interval_desired > tr.time_interval_original):
            # the one resample flavor that is a stateful aggregation: on a
            # stream it needs a watermark + window, not a batch groupBy —
            # route to the streaming twin (same bucket grid: F.window
            # aligns to epoch 0 exactly like floor(epoch/i)*i). This is the
            # reference's use_streaming knob finally consuming its declared
            # semantics end-to-end (reference config/config.py:89-90).
            from powerdatapipeline_spark.streaming.pipeline import (
                streaming_downsample_mean)

            df = streaming_downsample_mean(
                df.withColumn("__ts", F.timestamp_seconds(F.col(sec_col))),
                "__ts", tr.time_interval_desired, vcols)
        elif df.isStreaming and tr.resample_method == "linear":
            # upsample_linear interpolates toward the NEXT observation via
            # lead() over a Window (timeseries.py) — Spark rejects
            # non-time-window functions on streaming DataFrames, and the
            # semantics are inherently future-peeking; fail at build time
            # with a real message instead of at query start
            raise ValueError(
                "resample_method='linear' is not supported on a streaming "
                "source (linear interpolation needs the next row via "
                "lead()); use 'repeat' upsampling or run the linear "
                "resample as a batch job")
        else:
            # modulo downsample and repeat upsample are narrow (filter /
            # explode) — stream-safe as-is
            df = ts.resample(df, sec_col, tr.time_interval_original,
                             tr.time_interval_desired, value_cols=vcols,
                             method=tr.resample_method)
    if tr.downsampling_rate and not df.isStreaming:
        # df.sample is unsupported on streams; streaming subsampling would
        # be a modulo filter on the event id/timestamp instead
        df = df.sample(fraction=tr.downsampling_rate, seed=42)
    df = featurize(df, cfg)
    if tr.window_size and sec_col and sec_col in df.columns and not df.isStreaming:
        # row-based sliding windows are not supported on streams; the
        # streaming counterparts are F.window tumbling/sliding aggs
        # (streaming/pipeline.py) and applyInPandasWithState
        df = ts.sliding_windows(df, sec_col, tr.window_size,
                                [c for c in df.columns if c != sec_col])
    return df


def featurize(df: DataFrame, cfg: RunConfig) -> DataFrame:
    """FeatureSpace stage (reference get_featurespace/apply_featurespace,
    datapipeline.py:273-401): z-score numeric features (honoring
    ``skip_normalization``), one-hot the ``onehot_features`` (int, depth 5 —
    reference hard-codes 5, Appendix A.7); stats fitted on the first
    ``n_rows_to_adapt_featurespace`` rows, exactly the reference's adapt
    semantics. No-op when neither normalize nor one-hot is requested."""
    tr = cfg.datapipeline.transformation
    if not (tr.normalize or tr.onehot_features) or df.isStreaming:
        # FeatureSpace.fit is an action; for streams, fit on a batch sample
        # and apply the fitted expressions to the stream (caller's choice)
        return df
    from powerdatapipeline_spark.features import FeatureSpace, FeatureSpec

    specs, keep = [], []
    numeric = {"double", "float", "int", "bigint", "smallint"}
    for c, t in df.dtypes:
        if c in tr.onehot_features:
            specs.append(FeatureSpec(c, "int", "one_hot"))
        elif tr.normalize and t in numeric:
            specs.append(FeatureSpec(c, "float", "normalized",
                                     skip_normalization=c in tr.skip_normalization))
        else:
            keep.append(c)
    fs = FeatureSpace(specs).fit(df, n_rows=tr.n_rows_to_adapt_featurespace)
    return fs.transform(df, keep=keep)


def split(df: DataFrame, cfg: RunConfig, ts_col: str):
    """Ordered prefix split stage (reference datapipeline.py:404-424,
    Appendix A.9)."""
    tr = cfg.datapipeline.transformation
    return ts.prefix_split(df, ts_col, tr.train_fraction, tr.test_fraction)


def build_pipeline(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    """extract → transform → featurize → window (the implicit 'load' stage
    is the caller's sink: parquet write, ``toPandas`` ML hand-off, or
    streaming sink; ``split()`` is separate because it returns three
    frames)."""
    return transform(extract(spark, cfg), cfg)
