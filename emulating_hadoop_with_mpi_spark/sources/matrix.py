"""Reader/writer for the reference's headerless binary matrix format.

Format (``filecreation.c:19-28`` / ``program.c:45-72``): a dense row-major
int32 matrix, no header/footer, exactly ``rows*cols*4`` bytes; the dimensions
are encoded in the file name as ``Array_<rows>x<cols>_<id>.dat``
(parsed by ``getArrayDimensions``, ``program.c:34-43`` — the reference scans
from a hardcoded char index; we use a regex).

Scale design: instead of slurping the whole file on one node (the reference
reads everything on rank 0, ``program.c:94-96``, then broadcasts it to every
process, ``program.c:97-98``), we read it as *fixed-length records* — one
record per matrix row — via ``sc.binaryRecords``.  Records are distributed
across partitions, each partition decodes its rows with NumPy into COO
``(i, j, v)`` triples, and no node ever holds the full matrix.  A 100 TB
matrix streams through like any other datasource.
"""

from __future__ import annotations

import os
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

COO_SCHEMA = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("v", IntegerType(), False),
    ]
)

_NAME_RE = re.compile(r"Array_(\d+)x(\d+)_\w+\.dat$")


def matrix_dims_from_name(path: str) -> tuple[int, int]:
    """Parse ``Array_<rows>x<cols>_<id>.dat`` → (rows, cols).

    Robust replacement for the reference's fixed-index filename scan
    (``program.c:34-43`` / ``checking.c:20-29``).
    """
    m = _NAME_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"not a matrix file name (want Array_<R>x<C>_<id>.dat): {path}")
    return int(m.group(1)), int(m.group(2))


def read_matrix_coo(
    spark: SparkSession, path: str, dims: tuple[int, int] | None = None
) -> DataFrame:
    """Read a ``.dat`` matrix into a COO DataFrame ``(i INT, j INT, v INT)``.

    Mirrors ``readArraysFromFile`` (``program.c:45-72``) but distributed:
    each fixed-length binary record is one matrix row; partitions decode
    independently.
    """
    rows, cols = dims if dims is not None else matrix_dims_from_name(path)
    record_len = cols * 4

    def decode(part_iter):
        for row_bytes, i in part_iter:
            vals = np.frombuffer(row_bytes, dtype="<i4")
            i = int(i)
            for j in range(cols):
                yield (i, j, int(vals[j]))

    # binaryRecords preserves file order; zipWithIndex turns record position
    # into the row index i.
    rdd = spark.sparkContext.binaryRecords(path, record_len).zipWithIndex()
    df = spark.createDataFrame(rdd.mapPartitions(decode), COO_SCHEMA)
    if rows * cols == 0:
        return spark.createDataFrame([], COO_SCHEMA)
    return df


def matrix_coo_from_numpy(spark: SparkSession, arr: np.ndarray) -> DataFrame:
    """In-memory ndarray → COO DataFrame (test helper)."""
    rows, cols = arr.shape
    ii, jj = np.indices((rows, cols))
    data = list(zip(ii.ravel().tolist(), jj.ravel().tolist(), arr.ravel().tolist()))
    return spark.createDataFrame(data, COO_SCHEMA)


def coo_to_numpy(df: DataFrame, rows: int, cols: int, value_col: str = "v") -> np.ndarray:
    """Collect a COO result into a dense ndarray (small matrices only —
    the final-render step, like ``readResultsFromFile`` ``program.c:447-477``)."""
    out = np.zeros((rows, cols), dtype=np.int64)
    for r in df.select("i", "k" if "k" in df.columns else "j", value_col).collect():
        out[r[0], r[1]] = r[2]
    return out


def write_matrix_dat(arr: np.ndarray, directory: str, file_id: int | str = 1) -> str:
    """Write an ndarray in the reference's format + naming convention
    (``filecreation.c:19-28, 33``): raw little-endian int32, row-major,
    named ``Array_<rows>x<cols>_<id>.dat``."""
    rows, cols = arr.shape
    path = os.path.join(directory, f"Array_{rows}x{cols}_{file_id}.dat")
    arr.astype("<i4").tofile(path)
    return path
