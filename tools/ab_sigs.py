"""A/B the STANDALONE minhash_signatures entry point (VERDICT r17 item
2 risk): the r17 kernel form shuffles a per-doc collect_set partial
(O(distinct shingles per doc per map partition)) where the pre-r17
declarative form shuffled 128 fixed int64 partial mins per doc per map
partition.  For q73/q71 the set is needed anyway (verify frame); for
the standalone signature builder on LONG documents the set bytes can
exceed the fixed cost — this measures both forms on real corpora and a
synthetic long-doc corpus.

Usage: python tools/ab_sigs.py <reps> <real_sf_dir...>
       (always also runs the synthetic long-doc corpus)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.dedup import (
    MERSENNE_31,
    NUM_PERM,
    _minhash_signatures_kernel,
    _perm_constants,
    shingles_df,
)
from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def sigs_declarative(ds):
    """The pre-round-17 standalone formulation: 128 declarative min
    aggregates over the permuted hash — fixed 128-long partial state per
    (doc, map partition)."""
    consts = _perm_constants(NUM_PERM)
    hashed = ds.select(
        "doc_id", F.shiftrightunsigned(F.xxhash64("shingle"), 32).alias("h")
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MERSENNE_31))
            ).alias(f"h{i}")
            for i, (a, b) in enumerate(consts)
        ]
    )


def main() -> None:
    reps = int(sys.argv[1])
    real_dirs = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_sigs", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {}
    for d in real_dirs:
        corpora[d] = shingles_df(load_table(spark, d, "documents"))
    # synthetic long docs: 512 docs x 4000 distinct tokens -> ~4000
    # distinct shingles/doc (set partial ~31 KB/doc vs the fixed 1 KB)
    long_docs = spark.range(512).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(3999)),
                lambda i: F.concat(F.lit("t"), (F.col("id") * 7919 + i).cast("string")),
            ),
        ).alias("text"),
    )
    corpora["synthetic_long_4000tok"] = shingles_df(long_docs)

    sig_cols = [f"h{i}" for i in range(NUM_PERM)]
    for name, ds in corpora.items():
        a = sorted(map(tuple, sigs_declarative(ds).select("doc_id", *sig_cols)
                       .limit(0).collect()))  # schema check only
        res = {"decl": [], "kernel": []}
        for _ in range(reps):
            for label, builder in (("decl", sigs_declarative),
                                   ("kernel", _minhash_signatures_kernel)):
                spark.catalog.clearCache()
                df = builder(ds)
                spark.sparkContext.setJobDescription(f"ab_sigs:{name}:{label}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                res[label].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        print(f"AB_SIGS {name}: decl={res['decl']} (min {min(res['decl'])}) "
              f"kernel={res['kernel']} (min {min(res['kernel'])})", flush=True)
    # equality on the synthetic corpus (real SFs pinned in r17 ab_minhash)
    ds = corpora["synthetic_long_4000tok"]
    a_rows = sorted(map(tuple, sigs_declarative(ds).collect()))
    b_rows = sorted(map(tuple, _minhash_signatures_kernel(ds).collect()))
    print(f"EQUAL_SIGNATURES {a_rows == b_rows} n={len(a_rows)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
