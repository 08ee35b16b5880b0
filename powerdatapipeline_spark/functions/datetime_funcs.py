"""Derived datetime columns & cyclical time encodings (SURVEY.md §2.5).

The reference derives two columns via per-row ``tf.py_function`` escapes —
``datetimestamp`` = ``"{date} {time}"`` (reference
tfdataset_utilities.py:114-120,130-134) and ``datetimestampseconds`` =
``pd.to_datetime(s).timestamp()`` as float64 (tfdataset_utilities.py:122-128,
136-140) — and encodes time cyclically as sin/cos of epoch seconds at
minute/hour/day periods (reference datapipeline.py:511-566,
tfdataset.py:137-152). Every kernel here is a built-in column expression:
JVM-side, codegen-able, no Python in the data path.

Parity note (SURVEY.md Appendix A.1): the reference hard-codes π = 3.14 in
its executed cyclical paths; this engine uses exact π (required for DuckDB
oracle parity) and records the divergence here.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi

#: period lengths in seconds, matching the reference's numpy variant
#: (datapipeline_utilities.py:80-106): second=1, minute=60, hour=3600,
#: day=86400, year=365.2425·day (the Gregorian mean year).
_PERIODS = {
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "year": 365.2425 * 86400.0,
}


def concat_date_time(date_col: str | Column, time_col: str | Column) -> Column:
    """``datetimestamp`` = '{date} {time}' (reference
    tfdataset_utilities.py:114-120)."""
    return F.concat_ws(" ", F.col(date_col) if isinstance(date_col, str) else date_col,
                       F.col(time_col) if isinstance(time_col, str) else time_col)


def epoch_seconds(col: str | Column, fmt: str | None = None) -> Column:
    """datetime (string or timestamp) → epoch seconds as DoubleType
    (reference tfdataset_utilities.py:122-128; float64 per
    tfdataset.py:26-34 'to avoid precision errors for large numbers').

    Cast-to-double, NOT ``unix_timestamp`` — the latter truncates to whole
    seconds, while the reference's ``pd.to_datetime(s).timestamp()`` keeps
    the sub-second fraction.
    """
    c = F.col(col) if isinstance(col, str) else col
    ts = F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c)
    return ts.cast("double")


def _cyc(seconds: Column, period: float, kind: str) -> Column:
    # (s mod p)·(2π/p), not s·(2π/p): mathematically identical (sin/cos are
    # p-periodic) but numerically far better — epoch-sized arguments push
    # sin/cos into large-argument reduction where libm implementations
    # diverge at the 1e-6 level, while arguments in [0, 2π) agree to ulps
    # across engines (required for DuckDB oracle parity).
    angle = (seconds % F.lit(period)) * F.lit(TWO_PI / period)
    return F.sin(angle) if kind == "sin" else F.cos(angle)


def cyclical_minute(seconds: str | Column, prefix: str = "") -> list[Column]:
    """sin/cos at 60 s period (reference datapipeline.py:540-546, π exact)."""
    return _cyclical(seconds, ["minute"], prefix)


def cyclical_hour(seconds: str | Column, prefix: str = "") -> list[Column]:
    return _cyclical(seconds, ["hour"], prefix)


def cyclical_day(seconds: str | Column, prefix: str = "") -> list[Column]:
    return _cyclical(seconds, ["day"], prefix)


def cyclical_minute_hour_day(seconds: str | Column, prefix: str = "") -> list[Column]:
    """All three periods (reference datapipeline.py:523-537 dispatcher,
    tfdataset.py:137-152 ``pack_time_features``)."""
    return _cyclical(seconds, ["minute", "hour", "day"], prefix)


def _cyclical(seconds: str | Column, periods: list[str], prefix: str = "") -> list[Column]:
    s = F.col(seconds) if isinstance(seconds, str) else seconds
    out = []
    for p in periods:
        out.append(_cyc(s, _PERIODS[p], "sin").alias(f"{prefix}sin_{p}"))
        out.append(_cyc(s, _PERIODS[p], "cos").alias(f"{prefix}cos_{p}"))
    return out


def seconds_to_days_minutes_seconds(col: str | Column) -> list[Column]:
    """Integer div/mod decomposition of a seconds span (reference
    datapipeline_utilities.py:182-191)."""
    s = F.col(col) if isinstance(col, str) else col
    days = F.floor(s / 86400).alias("days")
    minutes = F.floor((s % 86400) / 60).alias("minutes")
    secs = (s % 60).alias("seconds")
    return [days, minutes, secs]


def synthetic_datetime(df: DataFrame, order_by: str | Column | None = None,
                       start: str = "2023-01-01 00:00:00", step_seconds: int = 1,
                       col_name: str = "datetime") -> DataFrame:
    """Synthesize an evenly-spaced datetime column, the Spark analog of
    ``pd.date_range(start='2023-01-01', freq='S')`` insertion (reference
    pandas_utilities.py:39-42).

    Requires an explicit ordering column when order matters (Spark has no
    stable file order); falls back to a monotonic id for test fixtures.

    Scale note: ``row_number`` over a global window collapses to one task —
    acceptable for fixture synthesis only, never in the hot path.
    """
    from pyspark.sql import Window

    if order_by is not None:
        w = Window.orderBy(order_by)
    else:
        df = df.withColumn("__mid", F.monotonically_increasing_id())
        w = Window.orderBy("__mid")
    idx = F.row_number().over(w) - 1
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start), "yyyy-MM-dd HH:mm:ss") + idx * step_seconds
    )
    out = df.withColumn(col_name, ts)
    return out.drop("__mid") if order_by is None else out


def with_derived_columns(df: DataFrame, columns_added: list[str],
                         column_datetimedict: dict[str, str]) -> DataFrame:
    """Config-driven add-columns dispatcher (reference
    tfdataset_utilities.py:142-160): supports ``datetimestamp`` (date+time
    concat) and ``datetimestampseconds`` (epoch seconds); anything else is
    unsupported, matching the reference's behavior.
    """
    for name in columns_added:
        if name == "datetimestamp":
            df = df.withColumn(
                name,
                concat_date_time(column_datetimedict["date"], column_datetimedict["time"]),
            )
        elif name == "datetimestampseconds":
            src = column_datetimedict.get("datetime", "datetimestamp")
            df = df.withColumn(name, epoch_seconds(src))
        else:
            raise ValueError(f"derived column '{name}' not supported")
    return df
