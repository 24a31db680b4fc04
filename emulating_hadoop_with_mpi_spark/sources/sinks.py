"""Sinks — the write half of SURVEY §2.15.

The reference writes results twice: every reducer appends ``"(i,k):sum"``
lines to one shared text file via MPI shared file pointers
(``program.c:437-439``), and the master re-parses that file into a dense
matrix render (``program.c:447-477``).  Spark's equivalents: per-task
part-files with a commit protocol (no shared-pointer contention), and a
pivot for the dense render.

Also provides the standard columnar sinks (parquet/csv) used by any
downstream pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, key_cols: tuple[str, str] = ("i", "k"), value_col: str = "v") -> None:
    """Write ``(i,k):v`` lines — the reference's reducer sink format
    (``program.c:438``), as per-partition part-files instead of one shared
    file pointer."""
    (
        df.select(
            F.concat(
                F.lit("("),
                F.col(key_cols[0]).cast("string"),
                F.lit(","),
                F.col(key_cols[1]).cast("string"),
                F.lit("):"),
                F.col(value_col).cast("string"),
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Re-parse ``(i,k):v`` lines (the reference's ``readResultsFromFile``
    sscanf loop, ``program.c:455-462``) with one regexp per field —
    JVM-side, distributed."""
    lines = spark.read.text(path)
    pat = r"^\((\d+),(\d+)\):(-?\d+)$"
    return lines.select(
        F.regexp_extract("value", pat, 1).cast("int").alias("i"),
        F.regexp_extract("value", pat, 2).cast("int").alias("k"),
        F.regexp_extract("value", pat, 3).cast("long").alias("v"),
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
