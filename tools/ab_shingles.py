"""A/B the round-18 shingles_df shuffle removal (array_distinct before
the explode vs .distinct() after it): equality pin + interleaved
min-of-reps on the consumers that pay the exchange (q73's combined
stage, q72's exact pairs, decontaminate's corpus pass).

Usage: python tools/ab_shingles.py equal <sf_dir...>
       python tools/ab_shingles.py time  <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions import dedup as DD
from emulating_hadoop_with_mpi_spark.functions import pipeline as P
from emulating_hadoop_with_mpi_spark.functions.text import tokens_col
from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def shingles_old(docs, n: int = 3):
    """The pre-round-18 formulation: explode then a full .distinct()
    exchange."""
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off) for off in range(n)]),
    )
    return (
        docs.select("doc_id", tokens_col().alias("toks"))
        .filter(F.size(toks) >= n)
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def main() -> None:
    mode = sys.argv[1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_shingles", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "equal":
        for sf_dir in sys.argv[2:]:
            docs = load_table(spark, sf_dir, "documents")
            a = sorted(tuple(r) for r in DD.shingles_df(docs).collect())
            b = sorted(tuple(r) for r in shingles_old(docs).collect())
            print(f"{sf_dir}: rows={len(a)} EQUAL={a == b}", flush=True)
        spark.stop()
        return

    sf_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def with_shingles(form, thunk):
        orig = DD.shingles_df
        DD.shingles_df = form
        try:
            return thunk()
        finally:
            DD.shingles_df = orig

    def q73_stage():
        c = DD.minhash_combined(docs)
        c.write.format("noop").mode("overwrite").save()

    def q72_full():
        # NOTE: under the "old" arm this replays the full r17 shipped
        # form (old shingles + plain .cache()): the monkey-patched
        # shingles_df restores the old frame, and the repartition the
        # r18 persist branch adds is skipped via persist=False +
        # explicit cache to mirror r17's layout.
        if DD.shingles_df is shingles_old:
            ds = shingles_old(docs).cache()
            # rebuild the r17 plan exactly: cached old-shingle frame
            from pyspark.sql import functions as FF

            cnt = ds.groupBy("doc_id").agg(FF.count(FF.lit(1)).alias("n"))
            a, b = ds.alias("a"), ds.alias("b")
            pairs = (
                a.join(
                    b,
                    (FF.col("a.shingle") == FF.col("b.shingle"))
                    & (FF.col("a.doc_id") < FF.col("b.doc_id")),
                )
                .groupBy(
                    FF.col("a.doc_id").alias("doc_a"),
                    FF.col("b.doc_id").alias("doc_b"),
                )
                .agg(FF.count(FF.lit(1)).alias("n_common"))
            )
            ca = cnt.select(FF.col("doc_id").alias("doc_a"), FF.col("n").alias("n_a"))
            cb = cnt.select(FF.col("doc_id").alias("doc_b"), FF.col("n").alias("n_b"))
            out = (
                pairs.join(ca, "doc_a")
                .join(cb, "doc_b")
                .filter(DD._jaccard_ge(1, 2))
                .select("doc_a", "doc_b", "n_common", "n_a", "n_b",
                        FF.round(FF.col("n_common").cast("double")
                                 / (FF.col("n_a") + FF.col("n_b") - FF.col("n_common")),
                                 6).alias("jaccard"))
                .orderBy("doc_a", "doc_b")
            )
            out.write.format("noop").mode("overwrite").save()
        else:
            DD.exact_jaccard_pairs(docs, persist=True).write.format("noop").mode(
                "overwrite"
            ).save()

    def decon():
        from emulating_hadoop_with_mpi_spark.functions.text import (
            DECON_SECTION_MOD,
            DECON_SECTION_N,
            DECON_SECTION_PROMPT,
        )

        bench = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(DECON_SECTION_MOD)) == 0
        ).select(
            F.concat_ws(" ", F.slice(tokens_col(), 1, DECON_SECTION_PROMPT)).alias(
                "text"
            )
        )
        P.decontaminate(docs, bench, n=DECON_SECTION_N).write.format("noop").mode(
            "overwrite"
        ).save()

    tasks = {"q73_stage": q73_stage, "q72_full": q72_full, "decon": decon}
    only = os.environ.get("AB_SHINGLES_TASKS")
    if only:
        tasks = {k: v for k, v in tasks.items() if k in only.split(",")}
    arms = [("new", DD.shingles_df), ("old", shingles_old)]
    if os.environ.get("AB_SHINGLES_ORDER") == "old_first":
        arms = arms[::-1]
    legs: dict[str, list[float]] = {}
    for _ in range(reps):
        for tname, thunk in tasks.items():
            for fname, form in arms:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab_shingles:{tname}:{fname}")
                t0 = time.perf_counter()
                with_shingles(form, thunk)
                legs.setdefault(f"{tname}:{fname}", []).append(
                    round(time.perf_counter() - t0, 3)
                )
                spark.sparkContext.setJobDescription(None)
    for k, ls in legs.items():
        print(f"{k}: min={min(ls)} legs={ls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
