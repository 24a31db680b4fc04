"""Regression tests for events.ts writer-type normalization.

Round-5 failure mode: the driver regenerated testdata and events.ts changed
physical type from parquet TIMESTAMP(NANOS) (scanned as bigint under
nanosAsLong) to naive TIMESTAMP(MICROS) (scanned as TIMESTAMP_NTZ in
Spark 4), and the loader only normalized the former — every downstream
epoch-math site threw DATATYPE_MISMATCH at analysis time.

These tests write the SAME instants in all three physical encodings a real
parquet writer might choose and assert ``load_table`` yields an identical
session-tz ``timestamp`` column for each — so the next testdata
regeneration cannot silently break the loader again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emulating_hadoop_with_mpi_spark.sources.tables import load_table

# Deterministic instants (epoch µs), including one not divisible by 1000
# so ns→µs truncation is exercised.
INSTANTS_US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_712_345_678_000_001]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    """One sf_dir per physical encoding, same logical instants."""
    root = tmp_path_factory.mktemp("ts_variants")
    dirs = {}

    # naive TIMESTAMP(MICROS) → Spark 4 scans TIMESTAMP_NTZ (current driver)
    d = root / "ntz_us"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array(INSTANTS_US, pa.timestamp("us")),
    )
    dirs["timestamp_ntz"] = str(d)

    # TIMESTAMP(NANOS) → scans bigint under nanosAsLong (round<=4 driver)
    d = root / "nanos"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array([us * 1000 for us in INSTANTS_US], pa.timestamp("ns")),
    )
    dirs["bigint_nanos"] = str(d)

    # UTC-adjusted TIMESTAMP(MICROS) → scans plain timestamp (no-op path)
    d = root / "utc_us"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array(INSTANTS_US, pa.timestamp("us", tz="UTC")),
    )
    dirs["timestamp_utc"] = str(d)
    return dirs


def test_all_writer_variants_normalize_to_timestamp(spark, variant_dirs):
    for variant, sf_dir in variant_dirs.items():
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", variant


def test_all_writer_variants_agree_on_instants(spark, variant_dirs):
    from pyspark.sql import functions as F

    results = {}
    for variant, sf_dir in variant_dirs.items():
        df = load_table(spark, sf_dir, "events")
        rows = (
            df.select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .collect()
        )
        results[variant] = [(r.event_id, r.us) for r in rows]
    expected = list(zip([1, 2, 3], INSTANTS_US))
    for variant, got in results.items():
        assert got == expected, variant


def test_downstream_epoch_math_works_on_all_variants(spark, variant_dirs):
    """The exact expression shapes that broke in round 5: F.unix_micros and
    cast(ts as long) must analyze and execute on every variant."""
    from pyspark.sql import functions as F

    for variant, sf_dir in variant_dirs.items():
        df = load_table(spark, sf_dir, "events")
        out = df.select(
            F.unix_micros("ts").alias("us"),
            F.expr("(cast(ts as long) div 3600) * 3600").alias("bucket"),
        ).collect()
        assert len(out) == 3, variant
        assert all(r.bucket == (r.us // 1_000_000 // 3600) * 3600 for r in out), variant


def test_driver_testdata_loads_as_timestamp(spark, sf_dir):
    """Whatever physical type the CURRENT driver testdata uses, the loader
    must hand downstream operators a plain timestamp column."""
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip("driver testdata absent")
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
