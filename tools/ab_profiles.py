"""A/B the round-18 DSIR/LM profile kernels against the retained JVM
twins: profile-frame collect-compare on the real corpus (equality pin)
and interleaved min-of-reps noop timing of the full score passes.

Usage: python tools/ab_profiles.py equal <sf_dir...>
       python tools/ab_profiles.py time  <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def main() -> None:
    mode = sys.argv[1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_profiles", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from emulating_hadoop_with_mpi_spark.functions import dsir as D
    from emulating_hadoop_with_mpi_spark.functions import lm as L

    tgt = F.col("lang") == "en"

    if mode == "equal":
        for sf_dir in sys.argv[2:]:
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "text"
            )
            new_d = sorted(tuple(r) for r in D.doc_bucket_counts(docs, tgt).collect())
            old_d = sorted(
                tuple(r) for r in D._doc_bucket_counts_jvm(docs, tgt).collect()
            )
            new_l = sorted(tuple(r) for r in L.doc_bigram_profile(docs).collect())
            old_l = sorted(
                tuple(r) for r in L._doc_bigram_profile_jvm(docs).collect()
            )
            print(f"{sf_dir}: dsir rows={len(new_d)} EQUAL={new_d == old_d} "
                  f"lm rows={len(new_l)} EQUAL={new_l == old_l}", flush=True)
    elif mode == "time":
        sf_dir = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

        def run(build, label):
            spark.catalog.clearCache()
            df = build()
            spark.sparkContext.setJobDescription(f"ab_profiles:{label}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            return dt

        def dsir_jvm():
            orig = D.doc_bucket_counts
            D.doc_bucket_counts = D._doc_bucket_counts_jvm
            try:
                return D.dsir_scores(docs, is_target=tgt)
            finally:
                D.doc_bucket_counts = orig

        def lm_jvm():
            orig = L.doc_bigram_profile
            L.doc_bigram_profile = L._doc_bigram_profile_jvm
            try:
                return L.bigram_lm_xent(docs.select("doc_id", "text"))
            finally:
                L.doc_bigram_profile = orig

        arms = {
            "dsir_kernel": lambda: D.dsir_scores(docs, is_target=tgt),
            "dsir_jvm": dsir_jvm,
            "lm_kernel": lambda: L.bigram_lm_xent(docs.select("doc_id", "text")),
            "lm_jvm": lm_jvm,
        }
        legs = {k: [] for k in arms}
        for _ in range(reps):
            for k, fn in arms.items():  # interleaved
                legs[k].append(run(fn, k))
        for k, ls in legs.items():
            print(f"{k}: min={min(ls)} legs={ls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
