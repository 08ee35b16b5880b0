"""Declarative pipeline config — the "query document" (reference
config/config.py:82-154: ``RunConfig`` → ``DataPipelineConfig`` →
``Extraction``/``Transformation``).

Kept pydantic (backend-neutral, as SURVEY.md §1.1 recommends) with the
reference's validation semantics: at least one of features/input_features
(config/config.py:76-80), at least one data file (config.py:108),
empty-string → None coercion (config.py:70-74, 110-114). Spark-only knobs
(``use_streaming`` was declared-but-dead in the reference, config.py:89-90 —
here it actually switches to Structured Streaming) extend the schema.
"""

from __future__ import annotations

import json
from typing import Optional

from pydantic import BaseModel, field_validator, model_validator


def _empty_to_none(v):
    if isinstance(v, str) and v.strip() == "":
        return None
    return v


class Extraction(BaseModel):
    data_folder: str = ""
    data_files: list[str] = []
    file_format: str = "csv"            # csv | parquet (reference: CSV only)
    use_df: bool = False                # pandas staging path (reference config.py:91)
    use_existing_columnnames: bool = True
    n_rows: Optional[int] = None
    columns_original: list[str] = []
    columns_selected: list[str] = []
    columns_added: list[str] = []
    column_datetime: Optional[str] = None
    column_date: Optional[str] = None
    column_time: Optional[str] = None
    filtered_column: Optional[str] = None   # equality predicate knobs
    filtered_value: Optional[str] = None    # (reference config.py:100-101)
    column_dtypes: dict[str, str] = {}      # per-column dtype overrides (engine extension)
    use_streaming: bool = False             # reference declared-unimplemented (config.py:89-90)
    streaming_data_source: Optional[str] = None

    _coerce = field_validator("column_datetime", "filtered_column",
                              "filtered_value", "streaming_data_source",
                              "column_date", "column_time",
                              mode="before")(_empty_to_none)

    @model_validator(mode="after")
    def _at_least_one_file(self):
        if not self.data_files and not self.use_streaming:
            raise ValueError("extraction needs at least one data file")
        return self


class Transformation(BaseModel):
    features: list[str] = []
    input_features: list[str] = []
    target_features: list[str] = []
    onehot_features: list[str] = []
    skip_normalization: list[str] = []
    time_interval_original: Optional[int] = None
    time_interval_desired: Optional[int] = None
    resample: bool = False
    resample_method: str = "modulo"     # modulo | mean (downsample flavors)
    window_size: Optional[int] = None
    batch_size: int = 16
    normalize: bool = False
    n_rows_to_adapt_featurespace: int = 1000
    train_fraction: float = 0.8
    test_fraction: float = 0.1
    downsampling_rate: Optional[float] = None  # reference declared-unused (config.py:118-119) → df.sample here

    @model_validator(mode="after")
    def _at_least_one_feature(self):
        # reference config/config.py:76-80
        if not self.features and not self.input_features:
            raise ValueError("need features or input_features")
        return self


class DataPipelineConfig(BaseModel):
    extraction: Extraction
    transformation: Transformation


class RunConfig(BaseModel):
    datapipeline: DataPipelineConfig
    name: str = "run"


def load_config(path: str, validate: bool = True) -> RunConfig | dict:
    """JSON file → validated RunConfig (reference utilities/utilities.py:13-30)."""
    with open(path) as f:
        raw = json.load(f)
    return RunConfig(**raw) if validate else raw
