"""Spark-ML interop for the FeatureSpace (SURVEY.md §2.9: the reference's
feature pipeline exists to FEED model training — reference
``get_final_dataset`` hands Keras a ``tf.data`` stream, datapipeline.py:
484-503). Here the training stack is Spark's own ``pyspark.ml``, so the
engine's fitted FeatureSpace plugs into a standard ``pyspark.ml.Pipeline``:

  * :class:`FeatureSpaceEstimator` — an ``Estimator`` whose ``fit()`` runs
    FeatureSpace's one-job adapt pass and returns a
    :class:`FeatureSpaceModel`.
  * :class:`FeatureSpaceModel` — a ``Transformer`` applying the fitted
    column expressions (pure codegen'd built-ins — the ML pipeline gains
    no Python in the data path).
  * :func:`assemble_vector` — flattened feature columns → one
    ``ml.linalg`` vector column (``VectorAssembler``), the hand-off every
    ``pyspark.ml`` algorithm expects — the Spark analog of the reference's
    feature-concat step (tfdataset.py:163-195).

Composes as ``Pipeline(stages=[FeatureSpaceEstimator(...), assembler,
LinearRegression(...)])`` — fit once, transform anywhere, including
``save``/``load`` of the surrounding pipeline (the FeatureSpace state
itself persists via its JSON form, featurespace.py:162-182).
"""

from __future__ import annotations

from pyspark.ml import Estimator, Model
from pyspark.sql import DataFrame

from powerdatapipeline_spark.features.featurespace import FeatureSpace, FeatureSpec


class FeatureSpaceModel(Model):
    """Fitted FeatureSpace as a ``pyspark.ml`` Model: ``transform`` selects
    ``keep`` passthrough columns + every fitted feature expression."""

    def __init__(self, feature_space: FeatureSpace,
                 keep: list[str] | None = None):
        super().__init__()
        if not feature_space.fitted:
            raise ValueError("FeatureSpaceModel needs a FITTED FeatureSpace")
        self.feature_space = feature_space
        self.keep = list(keep or [])

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.feature_space.transform(dataset, keep=self.keep)

    def output_names(self) -> list[str]:
        return self.feature_space.output_names()


class FeatureSpaceEstimator(Estimator):
    """FeatureSpace adapt phase as a ``pyspark.ml`` Estimator: ``fit(df)``
    runs the single-aggregation stats pass (featurespace.py:58-95) on the
    first ``n_rows`` (or all rows) and returns a :class:`FeatureSpaceModel`.
    Each ``fit`` call fits a FRESH FeatureSpace — the estimator itself stays
    stateless, as the ``pyspark.ml`` contract expects."""

    def __init__(self, specs: list[FeatureSpec],
                 n_rows: int | None = None,
                 keep: list[str] | None = None):
        super().__init__()
        self.specs = list(specs)
        self.n_rows = n_rows
        self.keep = list(keep or [])

    def _fit(self, dataset: DataFrame) -> FeatureSpaceModel:
        fs = FeatureSpace(specs=[FeatureSpec(**s.__dict__) for s in self.specs])
        fs.fit(dataset, n_rows=self.n_rows)
        return FeatureSpaceModel(fs, keep=self.keep)


def assemble_vector(input_cols: list[str], output_col: str = "features"):
    """``VectorAssembler`` over the FeatureSpace's flattened output names —
    the bridge from named feature columns to the single ``ml.linalg``
    vector column every ``pyspark.ml`` algorithm consumes. Kept as a
    factory (not a wrapper) so the returned stage is a bona fide Spark
    transformer inside ``Pipeline.save``/``load``."""
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(input_cols), outputCol=output_col)
