"""Event-table operators: time bucketing, sessionization, JSON extraction.

These are the batch duals of the streaming module (streaming/ runs the same
shapes incrementally with watermarks).  The reference is strictly batch
(barrier-synchronized phases, ``program.c:180, 357, 412``) — SURVEY §2.15
adds this category.

Determinism notes: all timestamps leave as epoch-second BIGINTs;
`events.ts` is nanosecond parquet on disk, loaded as µs (floor) on the Spark
side — the oracle casts TIMESTAMP_NS → TIMESTAMP (same truncation) before
epoch math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.common import dec
from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@query(
    "q50_time_buckets",
    oracle="""
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600 AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY bucket_start, event_type
    ORDER BY bucket_start, event_type
    """,
)
def q50_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows per event type via F.window — the batch form
    of the streaming windowed aggregate.  Window starts align to the unix
    epoch in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("bucket_start", "event_type")
    )


@query(
    "q51_sessionize",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           epoch_us(CAST(MIN(ts) AS TIMESTAMP)) // 1000000 AS session_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q51_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as gaps-and-islands: lag + cumulative sum over a
    per-user window, 30-minute inactivity gap.  The order-dependent state
    the reference could not express at all (its shuffle destroys nothing —
    it replicates everything) is one window + one groupBy here; the
    streaming twin is stream_sessionize in streaming/events.py."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ADVICE r1: with duplicate (user_id, ts) rows the ROWS-frame peer order
    # is unspecified unless event_id joins the ORDER BY on BOTH sides.
    frame = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > gap_us, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(frame).cast("int"))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            (F.unix_micros(F.min("ts")) / 1_000_000).cast("long").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q52_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS n_high,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q52_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via ONE from_json parse into a typed
    struct (schema-full parsing; subsumes the former q54, merged round 3
    to fit the driver's 50-query cap, NOTES.md): every aggregate reads
    the same parsed field, so each document's JSON is decoded once.

    Through round 9 this query deliberately ran BOTH JVM parse paths —
    from_json for sum_k, get_json_object('$.k') for n_high — to pin
    their equivalence per bench run; that made it the worst basket entry
    vs its r1 baseline (1.24×: two full JSON decodes per row).  Measured
    r10 at sf0.1: dual ~0.76-0.96 s vs single-parse ~0.52-0.58 s (~35%
    off).  The dual-path equivalence pin moved to
    tests/test_events.py::test_json_parse_paths_agree, where it runs
    per-suite instead of per-benchmark."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    k = F.from_json("props", schema)["k"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(F.when(k > 50, 1)).alias("n_high"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q55_map_functions",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           list_sort(json_keys(props))[1] AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_id % 40 = 0
    ORDER BY event_id
    """,
)
def q55_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType parsing + map functions: from_json into map<string,bigint>,
    then map_keys / element_at — the schemaless-JSON path (vs the typed
    struct path inside q52)."""
    from pyspark.sql.types import LongType, MapType, StringType

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 40 == 0)
    m = F.from_json("props", MapType(StringType(), LongType()))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_min(F.map_keys(m)).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
    ).orderBy("event_id")


@query(
    "q53_event_funnel",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
               AS purchase_value
    FROM events
    GROUP BY user_id
    HAVING COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
    ORDER BY user_id
    """,
)
def q53_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel rollup (conditional counts) with a HAVING filter."""
    ev = load_table(spark, sf_dir, "events")

    def n_of(t: str, alias: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(alias)

    return (
        ev.groupBy("user_id")
        .agg(
            n_of("view", "n_view"),
            n_of("click", "n_click"),
            n_of("purchase", "n_purchase"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", dec("value")).otherwise(F.lit(0))),
                2,
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .filter(F.col("n_purchase") > 0)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Continuous-aggregate cascade (hypertable-style rollup): coarse time
# buckets derived by MERGING fine buckets, never rescanning raw events.
# At 100 TB this is the difference between re-reading the corpus per
# resolution and one raw scan + tiny re-aggregations (the coarse input is
# |buckets| rows, not |events|).  Mergeability holds because the kept
# state is (count, exact decimal sum) — both associative; averages etc.
# are derived at render time.  API + tests (driver cap full, NOTES.md).
# ---------------------------------------------------------------------------


def time_bucket_agg(ev: DataFrame, bucket_seconds: int) -> DataFrame:
    """(bucket_start, event_type, n_events, total_dec): tumbling buckets
    straight from raw events.  total_dec stays DECIMAL so downstream
    merges are exact."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive (got {bucket_seconds})")
    return (
        ev.groupBy(
            F.expr(f"(cast(ts as long) div {bucket_seconds}) * {bucket_seconds}").alias(
                "bucket_start"
            ),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).alias("total_dec"),
        )
    )


def coarsen_buckets(buckets: DataFrame, coarse_seconds: int) -> DataFrame:
    """Re-aggregate an existing bucket table to a coarser resolution.
    Every fine bucket must nest inside one coarse bucket — callers pass
    resolutions where coarse % fine == 0 (asserted in tests; the fine
    bucket_start values themselves carry the alignment)."""
    if coarse_seconds <= 0:
        raise ValueError(f"coarse_seconds must be positive (got {coarse_seconds})")
    return (
        buckets.groupBy(
            F.expr(f"(bucket_start div {coarse_seconds}) * {coarse_seconds}").alias(
                "bucket_start"
            ),
            "event_type",
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_dec").alias("total_dec"),
        )
    )
