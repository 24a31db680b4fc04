"""A/B: JVM ObjectHashAggregate 128-min signature stage vs a vectorized
NumPy mapInArrow signature stage (same single exchange, bit-identical
values).

Usage: python tools/ab_minhash.py <sf_dir> <reps> [stage|full]

- stage: time ONLY the combined-frame materialization (noop sink).
- full:  time minhash_verified_pairs end-to-end with each combined.

Prints min-of-reps for each arm, interleaved A/B/A/B, plus an equality
check (sorted signature rows must match exactly between arms).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from emulating_hadoop_with_mpi_spark.functions.dedup import (
    MERSENNE_31,
    NUM_PERM,
    _perm_constants,
    minhash_verified_pairs,
    shingles_df,
)
from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import functions as F

_CONSTS = np.asarray(_perm_constants(NUM_PERM), dtype=np.int64)


def minhash_combined(docs):
    """The pre-round-17 JVM formulation (collect_set + 128 mins in one
    ObjectHashAggregate) — kept here as the A/B baseline arm after
    functions/dedup.py switched to the Arrow kernel."""
    consts = _perm_constants(NUM_PERM)
    ds = shingles_df(docs)
    hashed = ds.select(
        "doc_id",
        F.xxhash64("shingle").alias("sh"),
        F.shiftrightunsigned(F.xxhash64("shingle"), 32).alias("h"),
    )
    return hashed.groupBy("doc_id").agg(
        F.collect_set("sh").alias("shset"),
        *[
            F.min(
                F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MERSENNE_31))
            ).alias(f"h{i}")
            for i, (a, b) in enumerate(consts)
        ],
    ).cache()


def _sig_batches(it):
    a = _CONSTS[:, 0]
    b = _CONSTS[:, 1]
    for batch in it:
        ids = batch.column(0)
        la = batch.column(1)
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # sliced list arrays: offsets may not start at 0, and the values
        # buffer can extend past the last offset — clamp so reduceat's
        # final segment ends at the last row's end.
        vals = la.values.to_numpy(zero_copy_only=False)[: offs[-1]]
        starts = offs[:-1]
        h = (vals.astype(np.uint64) >> np.uint64(32)).astype(np.int64)
        n = len(offs) - 1
        cols = [ids, la]
        if n == 0:
            empty = pa.array(np.empty(0, dtype=np.int64), type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [ids, la] + [empty] * NUM_PERM,
                names=["doc_id", "shset"] + [f"h{i}" for i in range(NUM_PERM)],
            )
            continue
        for i in range(NUM_PERM):
            y = (h * a[i] + b[i]) % MERSENNE_31
            mins = np.minimum.reduceat(y, starts)
            cols.append(pa.array(mins, type=pa.int64()))
        yield pa.RecordBatch.from_arrays(
            cols, names=["doc_id", "shset"] + [f"h{i}" for i in range(NUM_PERM)]
        )


def minhash_combined_np(docs):
    ds = shingles_df(docs)
    sets = (
        ds.select("doc_id", F.xxhash64("shingle").alias("sh"))
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("shset"))
    )
    schema = "doc_id bigint, shset array<bigint>, " + ", ".join(
        f"h{i} bigint" for i in range(NUM_PERM)
    )
    return sets.mapInArrow(_sig_batches, schema).cache()


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "stage"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_minhash", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm listing

    # equality check once (signatures only; shset is a set — order-free)
    sig_cols = [f"h{i}" for i in range(NUM_PERM)]
    a_rows = sorted(
        minhash_combined(docs).select("doc_id", *sig_cols).collect(),
        key=lambda r: r[0],
    )
    spark.catalog.clearCache()
    b_rows = sorted(
        minhash_combined_np(docs).select("doc_id", *sig_cols).collect(),
        key=lambda r: r[0],
    )
    spark.catalog.clearCache()
    print(f"EQUAL_SIGNATURES {a_rows == b_rows} n={len(a_rows)}", flush=True)

    res = {"jvm": [], "np": []}
    for r in range(reps):
        for label, builder in (("jvm", minhash_combined), ("np", minhash_combined_np)):
            t0 = time.perf_counter()
            if mode == "stage":
                c = builder(docs)
                c.write.format("noop").mode("overwrite").save()
            else:
                out = minhash_verified_pairs(docs, combined=builder(docs))
                out.write.format("noop").mode("overwrite").save()
            res[label].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    print(f"AB_RESULT mode={mode} sf_dir={sf_dir} jvm={res['jvm']} np={res['np']} "
          f"min_jvm={min(res['jvm'])} min_np={min(res['np'])}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
