"""Set operations — SURVEY §2.15: not in the reference, added for breadth.

Round 7: the former q40 (EXCEPT/INTERSECT/UNION over nation keys) and q41
(UNION ALL across heterogeneous relations) are consolidated into ONE
registered query so the registry stays at the driver's 50-entry cap while
q76b (the IVF==brute equivalence proof) takes a slot.  Both operator
families remain oracle-checked — the merged output carries each under its
own `section` tag with a NULL-padded common schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


@query(
    "q40_set_ops",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
    setops AS (
        SELECT 'customer_only' AS tag, nationkey
          FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
        UNION ALL
        SELECT 'both' AS tag, nationkey
          FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
        UNION ALL
        SELECT 'supplier_only' AS tag, nationkey
          FROM (SELECT nationkey FROM supp_nations EXCEPT SELECT nationkey FROM cust_nations)
    ),
    high_value AS (
        SELECT 'customer' AS tag, c_custkey AS key, c_name AS name,
               CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT 'supplier' AS tag, s_suppkey AS key, s_name AS name,
               CAST(s_acctbal AS DOUBLE) AS acctbal
        FROM supplier WHERE s_acctbal > 9000
    )
    SELECT section, tag, key, name, acctbal FROM (
        SELECT 'nations_setops' AS section, tag, CAST(nationkey AS BIGINT) AS key,
               CAST(NULL AS VARCHAR) AS name, CAST(NULL AS DOUBLE) AS acctbal
        FROM setops
        UNION ALL
        SELECT 'high_value_union' AS section, tag, key, name, acctbal FROM high_value
    )
    ORDER BY section, tag, key
    """,
)
def q40_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family, two sections under one tagged output:

    - `nations_setops`: EXCEPT / INTERSECT / UNION ALL over nation keys of
      customers vs suppliers, tagged by which side each key came from.
    - `high_value_union`: UNION ALL across heterogeneous relations
      (customer/supplier) aligned to a common schema.

    (Former q40 + q41, merged round 7 to hold the registry at the
    driver's 50-query cap.)"""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    setops = (
        cust_n.exceptAll(supp_n).select(F.lit("customer_only").alias("tag"), "nationkey")
        .unionAll(cust_n.intersect(supp_n).select(F.lit("both").alias("tag"), "nationkey"))
        .unionAll(
            supp_n.exceptAll(cust_n).select(F.lit("supplier_only").alias("tag"), "nationkey")
        )
        .select(
            F.lit("nations_setops").alias("section"),
            "tag",
            F.col("nationkey").cast("bigint").alias("key"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("double").alias("acctbal"),
        )
    )
    cust_hv = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.lit("high_value_union").alias("section"),
            F.lit("customer").alias("tag"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
    )
    supp_hv = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.lit("high_value_union").alias("section"),
            F.lit("supplier").alias("tag"),
            F.col("s_suppkey").alias("key"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )
    return setops.unionAll(cust_hv).unionAll(supp_hv).orderBy("section", "tag", "key")
