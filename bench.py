#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Results are materialized with the noop sink (full execution, no driver
collect) — measuring the engine, not the driver's row transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emulating_hadoop_with_mpi_spark import get_spark
from emulating_hadoop_with_mpi_spark.registry import all_queries

HEADLINE = [
    # relational core
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q14_distinct_agg",
    # windows / events
    "q30_window_topk_per_customer",
    "q31_window_running_total",
    "q50_time_buckets",
    "q51_sessionize",
    "q52_json_extract",
    "q23_asof_join",
    # flagship matmul
    "q60_matmul_gram",
    # LLM-pipeline ops
    "q70_dedup_exact",
    "q72_ngram_jaccard_pairs",
    "q73_minhash_lsh_neardup",
    "q76_cosine_topk",
    "q80_token_stats",
    "q81_quality_score",
    "q83_fingerprint",
    "q84_tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm the JVM + file listing with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run_timed(build) -> float:
        """min of two runs — steady-state, less single-JVM JIT/GC noise"""
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        # queries that cache intermediates (q72/q73) must not carry memory
        # pressure into the next measurement
        spark.catalog.clearCache()
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        timings[name] = run_timed(lambda: q.fn(spark, sf_dir))

    # flagship matrix-multiply at generated scale (the reference's own job;
    # 768^3 = 906M scalar products vs its 32^3 default)
    from emulating_hadoop_with_mpi_spark.mapreduce import matmul_block, matmul_coo
    from emulating_hadoop_with_mpi_spark.sources.datagen import generate_matrix_df

    for label, n, fn in (
        ("matmul_coo_768", 768, lambda a, b: matmul_coo(a, b)),
        ("matmul_block_768", 768, lambda a, b: matmul_block(a, b, block=128)),
    ):
        a = generate_matrix_df(spark, n, n, seed=1, num_partitions=int(cpus))
        b = generate_matrix_df(spark, n, n, seed=2, num_partitions=int(cpus))
        timings[label] = run_timed(lambda: fn(a, b))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
