"""A/B: q27's single mixed distinct+sketch aggregate (distinct-rewrite
drags GK/percentile partial state through a per-(flag,orderkey) group)
vs split aggregates (distinct agg and sketch agg each over lineitem,
joined on the 3-row group key).  Checks result equality first.

Usage: python tools/ab_q27.py <sf_dir> <reps>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emulating_hadoop_with_mpi_spark.operators.advanced import (
    _GK_ACCURACY,
    _GK_RANK_PAD,
    _HLL_RSD,
    q27_approx_sketches,
)
from emulating_hadoop_with_mpi_spark.session import get_spark
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from pyspark.sql import functions as F


def q27_split(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = _GK_RANK_PAD
    ps = (0.5, 0.9, 0.99)
    lo = [max(0.0, p - d) for p in ps]
    hi = [min(1.0, p + d) for p in ps]
    cents = li.select(
        "l_returnflag",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cts"),
    )
    exact = cents.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    sketch = cents.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=_HLL_RSD).alias("approx_orders"),
        F.expr(
            f"approx_percentile(cts, array({', '.join(f'{p}D' for p in ps)}), {_GK_ACCURACY})"
        ).alias("approx_p"),
        F.expr(
            "percentile(cts, array("
            + ", ".join(f"{p}D" for p in list(lo) + list(hi) + [0.5])
            + "))"
        ).alias("exact_p"),
        F.count(F.lit(1)).alias("n"),
    )
    agg = sketch.join(F.broadcast(exact), "l_returnflag")
    k = len(ps)
    flags = [
        (F.col("approx_p")[i].cast("double") >= F.col("exact_p")[i])
        & (F.col("approx_p")[i].cast("double") <= F.col("exact_p")[k + i])
        for i in range(k)
    ]
    hll_ok = (
        F.abs(F.col("approx_orders") - F.col("exact_orders"))
        <= 3 * _HLL_RSD * F.col("exact_orders")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n",
        F.col("exact_p")[2 * k].alias("exact_median_cents"),
        hll_ok.alias("hll_within_3rsd"),
        flags[0].alias("gk_median_in_bounds"),
        flags[1].alias("gk_p90_in_bounds"),
        flags[2].alias("gk_p99_in_bounds"),
    ).orderBy("l_returnflag")


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_q27", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    a = q27_approx_sketches(spark, sf_dir).collect()
    b = q27_split(spark, sf_dir).collect()
    print(f"EQUAL {a == b}", flush=True)
    if a != b:
        print("A:", a)
        print("B:", b)
    res = {"mixed": [], "split": []}
    for _ in range(reps):
        for label, fn in (("mixed", q27_approx_sketches), ("split", q27_split)):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res[label].append(round(time.perf_counter() - t0, 3))
    print(f"AB_RESULT sf={sf_dir} mixed={res['mixed']} split={res['split']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
