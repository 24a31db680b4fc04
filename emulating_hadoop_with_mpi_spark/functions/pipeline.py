"""End-to-end corpus curation: the operators of this package composed into
the pipeline a training-data run actually executes —

    quality gate → exact dedup → context-window chunking →
    sequence packing → leakage-safe split → sharded parquet

Every stage is one of the individually-tested ops (quality_scores,
chunk_documents, pack_sequences, split_column, write-side sharding); this
module only wires them, so the composition inherits their scale
properties: JVM-only expressions, bounded shuffles (dedup groupBy, pack
range hash, shard repartition), no driver state.  Runnable from the CLI:
``python -m emulating_hadoop_with_mpi_spark.cli pipeline SF_DIR --out DIR``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.sampling import split_column
from emulating_hadoop_with_mpi_spark.functions.text import (
    chunk_documents,
    pack_sequences,
    quality_scores,
)

# chunk_id = doc_id * FACTOR + chunk_idx: keeps one sortable key through
# packing so bins preserve document locality (a doc's chunks pack
# adjacently), and decodes back without a join.
CHUNK_ID_FACTOR = 1 << 20

DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.2,
    window: int = 64,
    stride: int = 48,
    budget: int = 256,
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Chunk-level curated table: (doc_id, chunk_idx, chunk_id, split,
    n_tokens, bin_id, bin_fill, chunk_text).

    - quality gate: keep docs with quality >= min_quality (exact integer
      scoring, functions/text.quality_scores);
    - exact dedup: one hash shuffle, winner = lowest doc_id per identical
      text (the q70 rule);
    - split: hashed on the ORIGINAL doc_id, so every chunk of a document
      (and every exact duplicate, post-dedup trivially) lands in the same
      split — the train/test-leakage guard a row-level random split lacks;
    - chunking: zero-shuffle window/stride explode;
    - packing: distributed prefix sum over chunk_ids GROUPED BY split —
      bins of `budget` tokens, document-local by key construction and
      split-pure by grouping (splitting happens BEFORE packing precisely
      so no training bin straddles splits; bin_ids restart per split).
    """
    if window > budget:
        raise ValueError(f"window {window} exceeds pack budget {budget}")
    splits = splits or DEFAULT_SPLITS

    scored = quality_scores(docs).select("doc_id", "quality")
    kept = docs.join(scored, "doc_id").filter(F.col("quality") >= min_quality)

    hashed = kept.withColumn("__h", F.xxhash64("text"))
    winners = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    uniq = hashed.join(winners, ["__h", "doc_id"], "left_semi").drop("__h")

    chunks = chunk_documents(uniq, window=window, stride=stride).withColumn(
        "split", split_column("doc_id", splits, salt=salt)
    )
    as_docs = chunks.select(
        "split",
        (F.col("doc_id") * CHUNK_ID_FACTOR + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packed = pack_sequences(as_docs, budget=budget, group_col="split").select(
        "split", F.col("doc_id").alias("chunk_id"), "n_tokens", "bin_id", "bin_fill"
    )
    return (
        packed.withColumn("doc_id", F.expr(f"chunk_id div {CHUNK_ID_FACTOR}"))
        .withColumn(
            "chunk_idx", F.pmod("chunk_id", F.lit(CHUNK_ID_FACTOR)).cast("int")
        )
        .join(
            chunks.select("doc_id", "chunk_idx", "chunk_text"),
            ["doc_id", "chunk_idx"],
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_id",
            "split",
            "n_tokens",
            "bin_id",
            "bin_fill",
            "chunk_text",
        )
    )


def write_curated_shards(
    curated: DataFrame, path: str, bins_per_shard: int = 64
) -> None:
    """Sharded sink of the curated table: ``split=<s>/shard=<n>``
    directories, one parquet file per (split, shard) — same
    repartition-before-partitionBy small-files guarantee as
    sources/sinks.write_training_shards."""
    sharded = curated.withColumn(
        "shard", F.expr(f"bin_id div {int(bins_per_shard)}").cast("long")
    )
    (
        sharded.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(path)
    )
