"""Stage attribution for q84 at any SF: postings build (persist), df agg,
tfidf window, bm25 section, full query.

Usage: python tools/ab_q84_stages.py <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_q84", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    from emulating_hadoop_with_mpi_spark.functions.search import (
        bm25_topk,
        corpus_postings,
    )
    from emulating_hadoop_with_mpi_spark.functions.text import (
        BM25_SECTION_K,
        BM25_SECTION_QUERIES,
    )
    from emulating_hadoop_with_mpi_spark.registry import all_queries

    registry = all_queries()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    for rep in range(reps):
        spark.catalog.clearCache()
        t = {}
        t0 = time.perf_counter()
        postings = corpus_postings(docs).persist()
        postings.count()
        t["postings_persist"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        df = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        df.write.format("noop").mode("overwrite").save()
        t["df_agg"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n_docs = postings.agg(F.countDistinct("doc_id").alias("__n_docs"))
        scored = (
            postings.select("doc_id", "term", "tf")
            .join(df.hint("shuffle_hash"), "term")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id", "term", "tf", "df",
                F.round((F.col("tf") * F.col("__n_docs")).cast("double") / F.col("df"), 6).alias("score"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
        tfidf_rows = (
            scored.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= 5)
        )
        tfidf_rows.write.format("noop").mode("overwrite").save()
        t["tfidf_join_window"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        bm25_topk(docs, list(BM25_SECTION_QUERIES), k=BM25_SECTION_K,
                  postings=postings).write.format("noop").mode("overwrite").save()
        t["bm25"] = round(time.perf_counter() - t0, 3)

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry["q84_tfidf_top_terms"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t["full_q84"] = round(time.perf_counter() - t0, 3)
        print(f"REP {rep}: {t}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
