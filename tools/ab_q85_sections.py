"""Stage attribution for q85: time each union section separately with the
noop sink, fresh-session semantics (clearCache between reps).

Usage: python tools/ab_q85_sections.py <sf_dir> <reps>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark.functions.text import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    DECON_SECTION_MOD,
    DECON_SECTION_N,
    DECON_SECTION_PROMPT,
    BPE_TRAIN_SECTION_K,
    chunk_documents,
    tokens_col,
)
from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_q85", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    from emulating_hadoop_with_mpi_spark.functions.bpe import bpe_train
    from emulating_hadoop_with_mpi_spark.functions.pipeline import decontaminate
    from emulating_hadoop_with_mpi_spark.registry import all_queries

    registry = all_queries()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def t_chunk():
        chunk_documents(docs, window=CHUNK_WINDOW, stride=CHUNK_STRIDE).write.format(
            "noop"
        ).mode("overwrite").save()

    def t_decon():
        bench = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(DECON_SECTION_MOD)) == 0
        ).select(
            F.concat_ws(" ", F.slice(tokens_col(), 1, DECON_SECTION_PROMPT)).alias(
                "text"
            )
        )
        decontaminate(docs, bench, n=DECON_SECTION_N).write.format("noop").mode(
            "overwrite"
        ).save()

    def t_bpe():
        bpe_train(
            docs.select("doc_id", "text"),
            num_merges=BPE_TRAIN_SECTION_K,
            min_pair_count=1,
            batch_k=1,
        )

    def t_full():
        registry["q85_chunk_documents"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for label, fn in (("chunk", t_chunk), ("decon", t_decon), ("bpe48", t_bpe),
                      ("full_q85", t_full)):
        legs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            legs.append(round(time.perf_counter() - t0, 3))
        print(f"SECTION {label}: min={min(legs)} legs={legs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
