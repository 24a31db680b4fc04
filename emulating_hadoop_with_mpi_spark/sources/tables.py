"""Loaders for the driver's star-schema parquet tables.

Analogue of the reference's input stage (``program.c:45-72`` reads the two
input relations; ``program.c:34-43`` derives their schema externally).  Here
the schema travels with the data (parquet), and Spark's FileScan provides the
split planning the reference hand-rolled in ``sendInputToMappers``
(``program.c:143-181``).

Scale notes (100 TB design intent):
- Everything goes through ``spark.read.parquet`` → columnar scan, predicate
  pushdown and column pruning are available to every downstream operator.
- ``events.ts`` arrives as parquet TIMESTAMP(NANOS); with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it scans as a long which we
  convert to a µs timestamp *after* the scan — a cheap projection, no UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in star joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Defensive for sessions WE didn't build (e.g. the driver's): the
        # nanos-as-long switch is required to scan TIMESTAMP(NANOS) parquet
        # at all, and UTC keeps F.window/time-bucket alignment identical to
        # the oracle.  Both are runtime-settable SQL confs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long → µs timestamp.  INTEGER division (`div`), not
        # floor(double/1000): epoch-ns values (~1.7e18) exceed double's
        # 53-bit mantissa, so fp division is off by ±1µs on some rows.
        # Truncating integer division matches DuckDB's ns→µs cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
