"""Instrument curate_frames: time each _CURATE_CACHE.lookup anchor
materialization + the eager selection bounds + final consumption, as
q85's curate section drives them.

Usage: python tools/ab_curate_stages.py <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_curate", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from emulating_hadoop_with_mpi_spark.functions import pipeline as P
    from emulating_hadoop_with_mpi_spark.functions.text import (
        CURATE_DSIR_KEEP,
        CURATE_LM_KEEP,
        CURATE_MIN_QUALITY,
        CURATE_MIXTURE,
        CURATE_MIX_SALT,
        CURATE_SPAN_N,
        CURATE_TOKEN_BUDGET,
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        DECON_SECTION_MOD,
        DECON_SECTION_N,
        DECON_SECTION_PROMPT,
        PACK_BUDGET,
        PLANTED_PII_DOCS,
        quality_gate_scores,
        tokens_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    # wrap the anchor lookup with timing
    orig_lookup = P._CURATE_CACHE.lookup
    anchor_times = []

    def timed_lookup(df):
        t0 = time.perf_counter()
        out = orig_lookup(df)
        anchor_times.append(round(time.perf_counter() - t0, 3))
        return out

    P._CURATE_CACHE.lookup = timed_lookup

    for rep in range(reps):
        spark.catalog.clearCache()
        P.release_curate_cache()
        anchor_times.clear()
        planted = spark.createDataFrame(
            PLANTED_PII_DOCS, schema="doc_id long, text string, lang string"
        )
        docs_cur = docs.select("doc_id", "text", "lang").unionByName(planted)
        bench = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(DECON_SECTION_MOD)) == 0
        ).select(
            F.concat_ws(" ", F.slice(tokens_col(), 1, DECON_SECTION_PROMPT)).alias("text")
        )
        scored_cur = quality_gate_scores(docs_cur).select(
            "doc_id", "n_tokens", "quality"
        )
        t0 = time.perf_counter()
        fr = P.curate_frames(
            docs_cur,
            min_quality=CURATE_MIN_QUALITY,
            window=CHUNK_WINDOW,
            stride=CHUNK_STRIDE,
            budget=PACK_BUDGET,
            benchmark=bench,
            decon_ngram=DECON_SECTION_N,
            cut_span_ngram=CURATE_SPAN_N,
            dsir_target=F.col("lang") == "en",
            dsir_keep_frac=CURATE_DSIR_KEEP,
            lm_keep_frac=CURATE_LM_KEEP,
            mixture=CURATE_MIXTURE,
            mixture_salt=CURATE_MIX_SALT,
            token_budget=CURATE_TOKEN_BUDGET,
            redact=True,
            redact_patterns=P.PII_PATTERNS_RE2,
            scored=scored_cur,
        )
        t_construct = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        counts = {}
        for k in ("quality", "decon", "span_cut", "dsir", "lm", "mixture", "budget"):
            if k in fr:
                counts[k] = fr[k].count()
        t_counts = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fr["curated"].write.format("noop").mode("overwrite").save()
        t_final = round(time.perf_counter() - t0, 3)
        print(
            f"REP {rep}: construct={t_construct} (anchors={anchor_times}) "
            f"stage_counts={t_counts} final={t_final} counts={counts}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
