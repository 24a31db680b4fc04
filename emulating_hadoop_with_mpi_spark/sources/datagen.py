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


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    doc_len: int = 60,
    vocab: int = 200_000,
    seed: int = 42,
    near_dup_every: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic (doc_id, text) corpus with a Zipf(~1) word
    distribution — the long-tail regime real web corpora live in, and the
    one where prefix-filtered set joins (``functions.dedup.ppjoin_pairs``)
    beat the direct shingle self-join (most shingles are rare, so prefixes
    prune nearly everything; the driver's ~40-word-vocab synthetic corpus
    is the OPPOSITE regime).

    Word ranks are drawn by inverse-CDF log-uniform sampling
    (rank = floor(exp(u * ln(vocab)))) from seeded xxhash64 streams —
    P(rank = r) ∝ 1/r, fully distributed, no driver data.

    Every ``near_dup_every``-th doc pair (2k, 2k+1) is a planted near-dup:
    the odd doc re-derives the even doc's words, mutating ~8% of
    positions, so exact-Jaccard answers are non-trivial at every size."""
    base = spark.range(n_docs, numPartitions=num_partitions).select(
        F.col("id").alias("doc_id")
    )
    is_planted = (F.col("doc_id") % (2 * near_dup_every) == 1) if near_dup_every else F.lit(False)
    # planted odd docs sample words from their even predecessor's stream
    src_doc = F.when(is_planted, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    M = 1_000_003  # prime modulus for the uniform draw
    import math

    ln_vocab = math.log(vocab)

    def word_at(pos):
        u = (F.pmod(F.xxhash64(src_doc, pos, F.lit(seed)), F.lit(M)) + 1) / M
        rank = F.floor(F.exp(u * ln_vocab)).cast("long")
        mutated = F.concat(F.lit("m"), rank, F.lit("_"), F.col("doc_id"))
        plain = F.concat(F.lit("w"), rank)
        mutate = is_planted & (F.pmod(F.xxhash64(F.col("doc_id"), pos, F.lit(seed + 1)), F.lit(12)) == 0)
        return F.when(mutate, mutated).otherwise(plain)

    words = F.transform(F.sequence(F.lit(1), F.lit(doc_len)), word_at)
    return base.select("doc_id", F.array_join(words, " ").alias("text"))
