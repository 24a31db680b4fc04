"""Skew utilities: salting preserves join semantics on a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.skew import salted_join


def _skewed(spark, n=20000):
    # 90% of rows share key 7 — the classic hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 11).alias("dim")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("dim").alias("d")
    )
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("dim").alias("d")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_equals_plain_groupby(spark):
    from emulating_hadoop_with_mpi_spark.operators.skew import salted_agg

    big = _skewed(spark).withColumn("n_rows", F.lit(1))
    plain = big.groupBy("k").agg(
        F.sum("payload").alias("payload"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("payload").alias("min_p"),
        F.max("payload").alias("max_p"),
    )
    salted = salted_agg(
        big.withColumn("min_p", F.col("payload")).withColumn("max_p", F.col("payload")),
        "k",
        {"payload": "sum", "n_rows": "count", "min_p": "min", "max_p": "max"},
    )
    assert sorted(map(tuple, plain.select("k", "payload", "n_rows", "min_p", "max_p").collect())) == sorted(
        map(tuple, salted.select("k", "payload", "n_rows", "min_p", "max_p").collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark, 5000)
    small = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("dim"))
    plain = big.join(small, "k", "left").count()
    salted = salted_join(big, small, "k", how="left").count()
    assert plain == salted == 5000
