"""Deterministic synthetic matrix generation.

Replaces ``filecreation.c`` (cells ``rand()%10`` seeded from wall-clock
``time(0)``, ``filecreation.c:8,11`` — i.e. unreproducible).  We keep the
cell domain [0, 10) but derive values from a seeded hash so every run —
and every cluster size — generates identical data.

Two paths:
- ``generate_matrix_df``: fully distributed, ``spark.range`` + ``xxhash64``;
  this is the 100 TB path (no driver-side materialization at all).
- ``generate_matrix_file``: small NumPy writer for ``.dat`` fixtures in the
  reference's own on-disk format.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_matrix_df(
    spark: SparkSession, rows: int, cols: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """COO DataFrame (i, j, v) with v = deterministic hash in [0, 10)."""
    rng = spark.range(rows * cols, numPartitions=num_partitions)
    return rng.select(
        (F.col("id") / cols).cast("int").alias("i"),
        (F.col("id") % cols).cast("int").alias("j"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(10)).cast("int").alias("v"),
    )


def generate_matrix_numpy(rows: int, cols: int, seed: int = 42) -> np.ndarray:
    """Same domain, NumPy-side (for oracle comparisons and .dat fixtures)."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 10, size=(rows, cols)).astype(np.int32)


def generate_matrix_file(directory: str, rows: int, cols: int, seed: int = 42, file_id=1) -> str:
    from emulating_hadoop_with_mpi_spark.sources.matrix import write_matrix_dat

    return write_matrix_dat(generate_matrix_numpy(rows, cols, seed), directory, file_id)
