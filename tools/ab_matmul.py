#!/usr/bin/env python
"""Interleaved block-vs-coo matmul A/B (VERDICT r12 item 2).

Round 12 could not show matmul_block_768 within 2× of its r11 reading
(2.479 s calm) from any official artifact — same-code runs read
7.6/9.3/13.2/14.25 across one degrading day while coo stayed ~2-2.4×
calm, and the judge's own interleaved probes oscillated 1.3-2.4× on
minute timescales.  Dense BLAS bursts are the most throttle-sensitive
work in the suite, so a cross-process comparison can never settle it
(NOTES r12: the box stripes process-to-process).  This script is the
prescribed settle: ONE process, the two variants strictly ALTERNATED
leg-by-leg (any stripe window hits both variants, so the RATIO is
throttle-robust), min-of-5 per variant, a fixed-work python canary
bracketing every leg.  Decision rule from the verdict: block:coo >= 3
on a calm box (canaries ~<=1.3× ref) means profile the tile path
(gate abs-sum pass, partition geometry, Arrow batch sizing); r11's calm
ratio was 1.37.  Prints one JSON line and appends nothing — paste the
result into NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark import get_spark  # noqa: E402
from emulating_hadoop_with_mpi_spark.mapreduce import (  # noqa: E402
    matmul_block,
    matmul_coo,
)
from emulating_hadoop_with_mpi_spark.sources.datagen import (  # noqa: E402
    generate_matrix_df,
)

CANARY_N = 2_000_000       # 1/10-scale of bench.py's canary loop
CANARY_REF_SEC = 0.17      # calm-load reference (bench.py PROBE_REF_SEC)
REPS = 5


def _canary() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(CANARY_N):
        acc += i * i & 1023
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_matmul",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 768
    a = generate_matrix_df(spark, n, n, seed=1, num_partitions=int(cpus))
    b = generate_matrix_df(spark, n, n, seed=2, num_partitions=int(cpus))

    variants = {
        "coo": lambda: matmul_coo(a, b),
        "block": lambda: matmul_block(a, b, block=128),
    }
    legs: dict[str, list[float]] = {k: [] for k in variants}
    canaries: list[float] = [_canary()]

    # one throwaway warm leg per variant (JIT/codegen), then the
    # alternating measured legs
    for name, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            legs[name].append(round(time.perf_counter() - t0, 3))
            canaries.append(_canary())

    # the 2048^3 extra, same interleave, min-of-2 (legs are ~10x longer)
    big_a = generate_matrix_df(spark, 2048, 2048, seed=1, num_partitions=int(cpus))
    big_b = generate_matrix_df(spark, 2048, 2048, seed=2, num_partitions=int(cpus))
    legs2048: dict[str, list[float]] = {"coo_2048": [], "block_2048": []}
    for _ in range(2):
        for name, fn in (
            ("coo_2048", lambda: matmul_coo(big_a, big_b)),
            ("block_2048", lambda: matmul_block(big_a, big_b, block=256)),
        ):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            legs2048[name].append(round(time.perf_counter() - t0, 3))
            canaries.append(_canary())

    spark.stop()
    mins = {k: min(v) for k, v in {**legs, **legs2048}.items()}
    out = {
        "metric": "ab_matmul_block_vs_coo",
        "legs_768": legs,
        "legs_2048": legs2048,
        "min_768": {k: mins[k] for k in ("coo", "block")},
        "ratio_768_block_over_coo": round(mins["block"] / mins["coo"], 2),
        "ratio_2048_block_over_coo": round(
            mins["block_2048"] / mins["coo_2048"], 2
        ),
        "canaries": canaries,
        "canary_ref_sec": CANARY_REF_SEC,
        "canary_worst_over_ref": round(max(canaries) / CANARY_REF_SEC, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
