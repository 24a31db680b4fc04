"""A/B the round-18 quality-feature Arrow kernel against the retained
JVM twin: per-column collect-compare on the real corpus (equality pin)
and interleaved min-of-reps noop timing of the q81-shaped pass.

Usage: python tools/ab_qfeat.py equal <sf_dir...>
       python tools/ab_qfeat.py time  <sf_dir> [reps]
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
    spark = get_spark(app_name="ab_qfeat", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from emulating_hadoop_with_mpi_spark.functions.text import (
        _quality_gate_scores_kernel,
        _quality_scores_jvm,
        quality_gate_scores,
        quality_scores,
    )

    if mode == "equal":
        for sf_dir in sys.argv[2:]:
            docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            new = {r["doc_id"]: r for r in quality_scores(docs).collect()}
            old = {r["doc_id"]: r for r in _quality_scores_jvm(docs).collect()}
            assert set(new) == set(old), (sf_dir, "doc_id sets differ")
            cols = [c for c in quality_scores(docs).columns if c != "doc_id"]
            bad = 0
            for did, r in new.items():
                for c in cols:
                    if r[c] != old[did][c]:
                        bad += 1
                        if bad < 5:
                            print(f"MISMATCH {sf_dir} doc {did} {c}: "
                                  f"new={r[c]!r} old={old[did][c]!r}")
            gnew = {r["doc_id"]: tuple(r)
                    for r in _quality_gate_scores_kernel(docs).collect()}
            gold = {r["doc_id"]: tuple(r) for r in quality_gate_scores(docs).collect()}
            print(f"{sf_dir}: docs={len(new)} full EQUAL={bad == 0} "
                  f"gate EQUAL={gnew == gold}", flush=True)
    elif mode == "time":
        sf_dir = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        docs = load_table(spark, sf_dir, "documents")

        def run(builder, label):
            spark.catalog.clearCache()
            df = builder(docs.select("doc_id", "text").orderBy("doc_id"))
            spark.sparkContext.setJobDescription(f"ab_qfeat:{label}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            return dt

        arms = {"kernel": quality_scores, "jvm": _quality_scores_jvm,
                "gate_kernel": _quality_gate_scores_kernel,
                "gate_jvm": quality_gate_scores}
        legs = {k: [] for k in arms}
        for _ in range(reps):
            for k, fn in arms.items():  # interleaved
                legs[k].append(run(fn, k))
        for k, ls in legs.items():
            print(f"{k}: min={min(ls)} legs={ls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
