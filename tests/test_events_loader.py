"""Dispatch tests for the schema-tolerant events loaders.

The driver regenerates ``events.parquet`` between rounds with different
physical encodings (round 3: TIMESTAMP(NANOS); round 4+: timestamp[us]);
round 4 was lost to a loader that assumed one of them. These tests pin
BOTH dispatch branches of ``load_events`` / ``events_stream_source``
against synthetic fixtures, independent of whatever encoding the current
driver fixture happens to use.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from powerdatapipeline_spark.queries import (EVENTS_COLUMNS, events_stream_source,
                                             events_ts_unit, load_events)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
ROWS = [(1, T0, 10, "click", 1.5, "{}"),
        (2, T0 + dt.timedelta(seconds=90), 10, "purchase", 2.5, "{}")]
EXPECTED_EPOCH = [1704067200.0, 1704067290.0]


def _write_events(dirpath: str, unit: str) -> str:
    ts_type = pa.int64() if unit == "int64" else pa.timestamp(unit)
    ts_vals = ([int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
                for r in ROWS] if unit == "int64" else [r[1] for r in ROWS])
    table = pa.table({
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": pa.array(ts_vals, ts_type),
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS]),
        "value": pa.array([r[4] for r in ROWS]),
        "props": pa.array([r[5] for r in ROWS]),
    })
    pq.write_table(table, os.path.join(dirpath, "events.parquet"),
                   version="2.6")
    return dirpath


@pytest.mark.parametrize("unit", ["us", "ns", "ms", "int64"])
def test_load_events_all_physical_encodings(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path), unit)
    assert events_ts_unit(sf_dir) == (None if unit == "int64" else unit)
    df = load_events(spark, sf_dir)
    assert df.columns == EVENTS_COLUMNS
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r.es for r in
           df.select(F.col("ts").cast("double").alias("es"))
             .orderBy("event_id").collect()]
    assert got == EXPECTED_EPOCH


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_stream_source_matches_batch(spark, tmp_path, unit):
    import uuid

    sf_dir = _write_events(str(tmp_path), unit)
    stream = events_stream_source(spark, sf_dir)
    assert stream.isStreaming
    name = f"ev_sink_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {(r.event_id, r.ts) for r in spark.table(name).collect()}
    want = {(r.event_id, r.ts) for r in load_events(spark, sf_dir).collect()}
    assert got == want and len(want) == 2


def test_load_events_rejects_missing_column(spark, tmp_path):
    table = pa.table({"event_id": pa.array([1], pa.int64()),
                      "ts": pa.array([T0], pa.timestamp("us"))})
    pq.write_table(table, os.path.join(str(tmp_path), "events.parquet"))
    with pytest.raises(ValueError, match="events fixture drifted"):
        load_events(spark, str(tmp_path))
