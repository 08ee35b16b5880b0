"""powerdatapipeline_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``ANL-CEEESA/powerdatapipeline``.

The reference (/root/reference, read-only snapshot @ 2025-08-24) is a
single-node, config-driven ETL + feature-engineering pipeline for power-grid
time-series built on tf.data / pandas / Keras preprocessing layers. This
package re-expresses every one of its dataflow operators — scans, projections,
filters, derived datetime columns, resampling, interval validation,
normalization, one-hot encoding, cyclical time features, sliding windows,
ordered splits, missing-value fill — as idiomatic PySpark DataFrame plans that
Catalyst can optimize, plus the relational / dedup / similarity / text
operators a large-scale training-data pipeline needs (SURVEY.md §2.12).

Design rules (SURVEY.md §4.2):
  * DataFrame/SQL only; no RDDs; no custom Catalyst rules.
  * Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only where
    built-ins genuinely cannot express the semantics (multimodal decode).
  * Order is explicit: every order-sensitive op takes a timestamp/ordering
    column; nothing relies on file order (unlike the reference, which trusts
    CSV row order — reference datapipeline/tfdataset.py:37-40).
  * Two-phase fit/transform (normalizer/vocab/min-max) = aggregate → collect
    tiny stats → literal expressions, never per-row Python.
"""

__version__ = "0.1.0"

from powerdatapipeline_spark.session import get_spark  # noqa: F401

# Plugin registry for model/transform builders, mirroring the reference's
# ``model_registry`` pattern (reference powerdatapipeline/__init__.py:1,
# config/config.py:11-24) without any Keras dependency.
model_registry: dict = {}
