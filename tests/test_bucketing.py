"""Bucketing: pre-shuffled storage so repeated joins/aggs on the bucket key
skip the Exchange entirely — the storage-level answer to the reference's
per-job re-partitioning (program.c:143-181 re-splits every run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan


@pytest.fixture(scope="module")
def warehouse(spark, tables, tmp_path_factory):
    (
        tables["lineitem"]
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    (
        tables["orders"]
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_avoids_shuffle(spark, warehouse):
    # disable auto-broadcast so the planner actually exercises the bucketed
    # sort-merge path (with a broadcastable side it rightly prefers BHJ and
    # ignores bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("lineitem_bucketed")
        orders = spark.table("orders_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, f"bucketed scan not used:\n{plan}"
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, warehouse, tables):
    bucketed = (
        spark.table("lineitem_bucketed")
        .join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    plain = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bucketed == plain