"""Event-stream source seam: every source kind normalizes `ts` through the
same projection, so the SAME streaming query runs over staged epoch-ns
files, raw parquet in either timestamp encoding, or (when jars exist) a
Kafka topic."""

from __future__ import annotations

import glob
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emulating_hadoop_with_mpi_spark.operators.events import q50_time_buckets
from emulating_hadoop_with_mpi_spark.streaming import run_to_memory, windowed_counts
from emulating_hadoop_with_mpi_spark.streaming.events import events_source


def _write_split(sf_dir: str, out_dir, ts_type) -> str:
    """Write the events table as two time-ordered parquet files with `ts`
    in the given arrow timestamp encoding."""
    src = pq.read_table(glob.glob(f"{sf_dir}/events.parquet")[0])
    order = pa.compute.sort_indices(src, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
    src = src.take(order)
    ts = src.column("ts").cast(ts_type)
    src = src.set_column(src.schema.get_field_index("ts"), pa.field("ts", ts_type), ts)
    half = src.num_rows // 2
    out_dir.mkdir()
    pq.write_table(src.slice(0, half), str(out_dir / "batch_0.parquet"))
    time.sleep(1.1)  # file-stream ordering is by modification time
    pq.write_table(src.slice(half), str(out_dir / "batch_1.parquet"))
    return str(out_dir)


def _closed_window_counts(spark, path, name):
    stream = events_source(spark, kind="parquet", path=path)
    out = run_to_memory(windowed_counts(stream), name).collect()
    return {(r.bucket_start, r.event_type): r.n_events for r in out}


@pytest.mark.parametrize(
    "label,ts_type",
    [
        ("ntz_us", pa.timestamp("us")),
        ("ns_int64", pa.int64()),
        ("utc_us", pa.timestamp("us", tz="UTC")),
    ],
)
def test_raw_parquet_stream_any_encoding_matches_batch(
    spark, sf_dir, tmp_path, label, ts_type
):
    """events_source('parquet') streams a raw parquet dir in ANY ts
    encoding — every CLOSED window must equal the batch q50 buckets."""
    if ts_type == pa.int64():
        # stage epoch-ns int64 exactly like the replay format
        src = pq.read_table(glob.glob(f"{sf_dir}/events.parquet")[0])
        ns = pa.compute.multiply(
            src.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), 1000
        )
        src = src.set_column(
            src.schema.get_field_index("ts"), pa.field("ts", pa.int64()), ns
        )
        order = pa.compute.sort_indices(src, sort_keys=[("ts", "ascending")])
        src = src.take(order)
        half = src.num_rows // 2
        d = tmp_path / label
        d.mkdir()
        pq.write_table(src.slice(0, half), str(d / "batch_0.parquet"))
        time.sleep(1.1)
        pq.write_table(src.slice(half), str(d / "batch_1.parquet"))
        path = str(d)
    else:
        path = _write_split(sf_dir, tmp_path / label, ts_type)

    got = _closed_window_counts(spark, path, f"seam_{label}")
    expect = {
        (r.bucket_start, r.event_type): r.n_events
        for r in q50_time_buckets(spark, sf_dir).collect()
    }
    assert got, "no closed windows emitted"
    for k, v in got.items():
        assert expect[k] == v, (k, v, expect.get(k))


def test_events_source_factory_kinds(spark, sf_dir, tmp_path):
    path = _write_split(sf_dir, tmp_path / "factory", pa.timestamp("us"))
    df = events_source(spark, kind="parquet", path=path)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.isStreaming
    with pytest.raises(ValueError, match="unknown event source kind"):
        events_source(spark, kind="pulsar", path=path)


def test_kafka_source_fails_cleanly_without_jars(spark):
    """The Kafka seam is isolated to one function: without the connector
    jars it must raise at source construction, not poison the query."""
    from pyspark.errors import AnalysisException

    try:
        df = events_source(spark, kind="kafka", brokers="localhost:9092", topic="events")
    except AnalysisException:
        return  # expected: DATA_SOURCE_NOT_FOUND
    # if jars ARE present, the plan must carry the normalized contract
    assert dict(df.dtypes)["ts"] == "timestamp"
