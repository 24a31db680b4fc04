"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query (smoke, sf0.001): the reference's
  matrix-multiply job (program.c:479-514) re-expressed as a Gram-matrix
  join-then-aggregate over the embeddings table.
- ``queries()``      — every operator registered in
  emulating_hadoop_with_mpi_spark.registry (SURVEY §2 inventory).
- ``oracle_sql()``   — the DuckDB oracle for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emulating_hadoop_with_mpi_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from emulating_hadoop_with_mpi_spark.operators.matrix_queries import q60_matmul_gram

    return q60_matmul_gram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver records a rows-only check for those)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
