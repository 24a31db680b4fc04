"""Set operations — SURVEY §2.15: not in the reference, added for breadth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


@query(
    "q40_set_ops_nations",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'customer_only' AS side, nationkey
      FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT 'both' AS side, nationkey
      FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT 'supplier_only' AS side, nationkey
      FROM (SELECT nationkey FROM supp_nations EXCEPT SELECT nationkey FROM cust_nations)
    ORDER BY side, nationkey
    """,
)
def q40_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL over nation keys of customers vs
    suppliers, tagged by which side each key came from."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    tagged = (
        cust.exceptAll(supp).select(F.lit("customer_only").alias("side"), "nationkey")
        .unionAll(cust.intersect(supp).select(F.lit("both").alias("side"), "nationkey"))
        .unionAll(supp.exceptAll(cust).select(F.lit("supplier_only").alias("side"), "nationkey"))
    )
    return tagged.orderBy("side", "nationkey")


@query(
    "q41_union_high_value_parties",
    oracle="""
    SELECT kind, key, name, CAST(acctbal AS DOUBLE) AS acctbal FROM (
        SELECT 'customer' AS kind, c_custkey AS key, c_name AS name, c_acctbal AS acctbal
        FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT 'supplier' AS kind, s_suppkey AS key, s_name AS name, s_acctbal AS acctbal
        FROM supplier WHERE s_acctbal > 9000
    )
    ORDER BY kind, key
    """,
)
def q41_union_high_value_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous relations aligned to a common schema."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.lit("customer").alias("kind"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.lit("supplier").alias("kind"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )
    return cust.unionAll(supp).orderBy("kind", "key")
