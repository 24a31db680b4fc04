"""Structured Streaming over the `events` table.

The reference is strictly batch — its phases are barrier-synchronized
(``MPI_Barrier`` at ``program.c:180, 357, 412``) and nothing is incremental.
This module adds the streaming category from SURVEY §2.15: event-time
windows, watermarks + late-data drops, streaming dedup, sessionization, and
a custom stateful operator via applyInPandasWithState.

Design: every streaming query is the incremental twin of a batch query in
operators/events.py (q50/q51) — tests replay the events table through a
file stream with availableNow and assert the streaming result equals the
batch result.  At scale the same code reads Kafka instead of parquet files;
watermark state is bounded per key by the gap/window, and the shuffle is
hash-partitioned on the group key exactly as in batch.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch-ns INT64 (replay staging writes this)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def normalize_event_stream(raw: DataFrame) -> DataFrame:
    """The SEAM every event source flows through: normalize `ts` to a
    session-tz timestamp whatever the wire/file encoding was — epoch-ns
    INT64 (the replay staging format), TIMESTAMP_NTZ (naive-µs parquet),
    or already-correct TIMESTAMP.  Downstream operators (watermarks,
    windows, session gaps, stream-stream joins) never see the source's
    physical type.  Pure projections — valid on streaming plans."""
    from emulating_hadoop_with_mpi_spark.sources.tables import _normalize_ts

    return _normalize_ts(raw)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based event stream in the replay staging layout (epoch-ns
    INT64 `ts`; one file per micro-batch in tests via maxFilesPerTrigger)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return normalize_event_stream(raw)


def events_stream_auto(spark: SparkSession, path: str) -> DataFrame:
    """File stream over ANY events parquet encoding: probe the static
    schema once (one driver-side file listing — readStream requires an
    explicit schema), then normalize through the seam.  This is what makes
    a raw driver-written events.parquet streamable without the DuckDB
    epoch-ns staging step."""
    static_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(static_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return normalize_event_stream(raw)


def kafka_events_stream(
    spark: SparkSession, brokers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Kafka-shaped source through the same seam: JSON events on the wire
    (`ts` as epoch-ns int64, matching the replay staging contract), value
    parsed with from_json, then ts-normalized like every other source.

    The spark-sql-kafka connector jars are NOT in this container, so
    .load() raises at stream start — the factory seam isolates that
    limitation to exactly this function; swapping a test's file source for
    Kafka is a one-argument change in events_source()."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e")
    ).select("e.*")
    return normalize_event_stream(parsed)


def events_source(spark: SparkSession, kind: str = "replay", **kw) -> DataFrame:
    """Factory over every event-stream source, all sharing the
    normalization seam:

    - 'replay':      staged epoch-ns parquet files (path=...)
    - 'parquet':     raw parquet in any timestamp encoding (path=...)
    - 'kafka':       Kafka topic, JSON values (brokers=..., topic=...)
    """
    if kind == "replay":
        return events_stream(spark, kw["path"])
    if kind == "parquet":
        return events_stream_auto(spark, kw["path"])
    if kind == "kafka":
        return kafka_events_stream(spark, kw["brokers"], kw["topic"], kw.get("starting_offsets", "earliest"))
    raise ValueError(f"unknown event source kind: {kind!r}")


def windowed_counts(stream: DataFrame, window: str = "6 hours", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window aggregate with watermark — the streaming
    twin of q50_time_buckets.  Append mode: a window emits once its end
    passes the watermark; later-than-watermark events are dropped."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal state → the streamed sum is exact and order-free,
            # so q90 can be value-compared against the DuckDB oracle
            F.sum(F.col("value").cast("decimal(18,2)")).alias("tv_dec"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            F.round(F.col("tv_dec"), 2).cast("double").alias("total_value"),
        )
    )


def sessionized(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) — the streaming twin of
    q51_sessionize's gaps-and-islands."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal state → exact, oracle-comparable (see windowed_counts)
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv_dec"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("session_start"),
            F.unix_timestamp(F.col("sw.end")).alias("session_end"),
            "n_events",
            F.round(F.col("sv_dec"), 2).cast("double").alias("session_value"),
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    dropDuplicatesWithinWatermark keeps ids only inside the watermark
    horizon — the streaming form of q70's hash-group dedup."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value total across micro-batches (the kind of
    accumulator the reference's reducerFunction hardwires, kept as
    explicit streaming state here)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            m = pdf["ts"].max()
            last_ts = m if last_ts is None else max(last_ts, m)
        state.update((n, float(total)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def purchase_click_join(
    stream: DataFrame, max_gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval self-join: each purchase matched to every
    click by the same user within the preceding `max_gap`.  Both sides
    carry watermarks and the join condition bounds event-time distance, so
    Spark can expire join state (otherwise a stream-stream join buffers
    forever).  The batch dual is a plain inner join with the same
    interval predicate (tested equal on a full replay)."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "click_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        "purchase_value",
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming query to completion on all currently-available
    input (availableNow) into an in-memory table; returns the result as a
    batch DataFrame.  Test/smoke harness only."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def split_events_for_replay(sf_dir: str, out_dir: str, n_files: int = 4) -> str:
    """Split the events table into n time-ordered parquet files so the file
    stream replays them as separate micro-batches (the watermark actually
    advances between batches).  `ts` is written as plain INT64 nanoseconds
    to match EVENTS_SCHEMA."""
    import time

    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    total = con.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    per = (total + n_files - 1) // n_files
    for i in range(n_files):
        con.sql(
            f"""
            COPY (SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value, props
                  FROM '{sf_dir}/events.parquet'
                  ORDER BY ts, event_id LIMIT {per} OFFSET {i * per})
            TO '{out_dir}/batch_{i}.parquet' (FORMAT PARQUET)
            """
        )
        # file-stream ordering is by modification time; keep it strict
        time.sleep(1.1)
    return out_dir
