"""Matrix-multiply as an oracle-checked query on shared tables.

The flagship matmul job (mapreduce/matmul.py) reads the reference's `.dat`
files, which the DuckDB oracle can't see — so for the correctness gate we
run the SAME join-then-aggregate plan over a matrix derived from the
`embeddings` table: E = int-quantized embedding rows, C = E × Eᵀ (a Gram
matrix).  Values are quantized via floor(double(v)*1000) so both engines do
exact integer arithmetic — order-independent and engine-independent.

This makes the reference's one job (``program.c:479-514``) a first-class,
hash-checked entry in the driver's correctness run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.mapreduce.matmul import matmul_coo
from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

N_VECS = 12  # keep the dense result small (N_VECS² rows)


def _quantized_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_VECS)
    return emb.select(
        F.col("vec_id").cast("int").alias("i"),
        F.posexplode("embedding").alias("j", "val"),
    ).select(
        "i",
        "j",
        F.floor(F.col("val").cast("double") * 1000).cast("int").alias("v"),
    )


@query(
    "q60_matmul_gram",
    oracle=f"""
    WITH coo AS (
        -- DuckDB 1.0 can't parameterize generate_series by a column, so
        -- cross-join a constant index range and filter to the list length.
        SELECT CAST(vec_id AS INT) AS i,
               CAST(u.pos - 1 AS INT) AS j,
               CAST(FLOOR(CAST(embedding[CAST(u.pos AS INT)] AS DOUBLE) * 1000) AS INT) AS v
        FROM embeddings, range(1, 4097) AS u(pos)
        WHERE vec_id < {N_VECS} AND u.pos <= len(embedding)
    )
    SELECT a.i, b.i AS k,
           -- CAST the SUM itself: DuckDB SUM(BIGINT) returns HUGEINT, which
           -- the driver's value-hash serializes differently from int64.
           CAST(SUM(CAST(a.v AS BIGINT) * CAST(b.v AS BIGINT)) AS BIGINT) AS v
    FROM coo a JOIN coo b ON a.j = b.j
    GROUP BY a.i, b.i
    ORDER BY a.i, k
    """,
)
def q60_matmul_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship job as a checked query: C = E × Eᵀ through
    the exact join-then-aggregate plan of matmul_coo (SURVEY §2.7/2.12)."""
    coo = _quantized_coo(spark, sf_dir)
    # Eᵀ in COO form: swap coordinates.
    coo_t = coo.select(F.col("j").alias("i"), F.col("i").alias("j"), "v")
    return matmul_coo(coo, coo_t).orderBy("i", "k")
