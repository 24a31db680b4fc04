"""Window functions (rank / lag / lead / frames) — SURVEY §2.15: not in the
reference, added for capability breadth over orders/lineitem.

Scale notes: a window partitioned by a key is one shuffle on that key plus a
per-partition sort — the same cost shape as a groupBy.  Unpartitioned windows
(single global ordering) are avoided; global top-k goes through
TakeOrderedAndProject (q22) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.common import dec
from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


@query(
    "q30_window_topk_per_customer",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q30_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ROW_NUMBER (total tie-break order)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q31_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS running_total,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                      - COALESCE(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
                                 OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey), 0), 2)
                AS DOUBLE) AS delta_prev
    FROM orders
    WHERE o_custkey % 10 = 0
    ORDER BY o_custkey, o_orderkey
    """,
)
def q31_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame + LAG delta.  Decimal inside
    the frame keeps the running sums exact (order within a frame is total,
    so double would *usually* match — decimal removes the 'usually')."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = dec("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(price).over(frame), 2).cast("double").alias("running_total"),
        F.round(price - F.coalesce(F.lag(price).over(w), F.lit(0)), 2)
        .cast("double")
        .alias("delta_prev"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q32_window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    WHERE user_id % 5 = 0
    ORDER BY user_id, event_id
    """,
)
def q32_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame (moving average) + LEAD on event streams."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(dec("value")).over(frame).cast("double") / F.count(F.lit(1)).over(frame), 6
        ).alias("moving_avg"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("user_id", "event_id")


@query(
    "q33_window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS INT) AS quartile
    FROM part
    ORDER BY p_brand, p_partkey
    """,
)
def q33_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK (tie-aware, deterministic on ties by definition)
    and NTILE with a total order."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    wt = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
        F.ntile(4).over(wt).cast("int").alias("quartile"),
    ).orderBy("p_brand", "p_partkey")


def rolling_percentile(
    ev: DataFrame, value_col: str = "value", frame_rows: int = 20, p: float = 0.5
) -> DataFrame:
    """Percentile over a sliding row frame (rolling median by default) per
    user — the last backlog item of SURVEY §2.15's window family.  Spark
    evaluates exact `percentile` as a window aggregate over the frame;
    cost is one shuffle on the partition key plus a per-frame sort of
    ≤ frame_rows values — frame size, not partition size, bounds the
    per-row work, so the op scales like any keyed window.  API + tests
    (driver cap full, NOTES.md); exactness is pinned against a per-row
    Python recomputation in tests/test_pipeline_ops.py."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.expr(f"percentile({value_col}, {p}D)").over(w).alias("rolling_p"),
    )
