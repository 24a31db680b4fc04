"""Relational operator breadth over the driver's star schema.

The reference has exactly one relational shape: a hand-rolled replicated
equi-join (map emit ``program.c:184-222``) feeding a per-key sum
(``program.c:415-445``).  This module exposes the full relational surface a
user of such an engine needs — scans, filters, projections, joins of every
flavor, aggregation (plain/distinct/rollup/cube/having), scalar functions,
pivots — each as a declarative DataFrame query Catalyst can optimize
(predicate pushdown into the parquet scans, broadcast joins for the small
dimensions, partial aggregation before every shuffle).

Scale notes (100 TB):
- Dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle of the fact table for star joins.  At real scale `customer`
  stops being broadcastable; the plan degrades gracefully to a shuffled
  hash join on the AQE-chosen side.
- Every aggregate is expressed so Spark's HashAggregate runs
  partial (map-side) + final — shuffle carries one row per (partition,
  group), not per input row.
- Filters are plain column comparisons on scan columns → pushed to parquet
  row-group pruning (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.common import (
    avg_from_sum,
    dec,
    money_sum,
)
from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def _revenue() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))


_SQL_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({rev}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({rev} * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-03'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """.format(rev=_SQL_REV),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates.

    The direct descendant of the reference's reduce stage (per-key sums,
    ``program.c:424-436``) — but partial-aggregated map-side and shuffled
    by group key instead of gathered to rank 0 (``program.c:244-273``)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "1998-09-03")
    qty, price = dec("l_quantity"), dec("l_extendedprice")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(qty, "sum_qty"),
            money_sum(price, "sum_base_price"),
            money_sum(_revenue(), "sum_disc_price"),
            money_sum(_revenue() * (F.lit(1).cast("decimal(18,2)") + dec("l_tax")), "sum_charge"),
            avg_from_sum(F.sum(qty), F.count(F.lit(1)), "avg_qty"),
            avg_from_sum(F.sum(price), F.count(F.lit(1)), "avg_price"),
            avg_from_sum(F.sum(dec("l_discount")), F.count(F.lit(1)), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection: filters push down to the parquet scan
    (PushedFilters), projection prunes the read schema to 6 of 11 columns.

    Unregistered from the driver registry in round 3 to fit the driver's
    50-query cap (NOTES.md): its capabilities remain driver-evidenced by
    q06 (pushed filters on lineitem) and q15 (projection breadth), and its
    pushdown/pruning plan shape stays pinned by
    tests/test_plans.py::test_q02_filter_pushdown_and_column_pruning,
    which calls this function directly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.round(_revenue(), 2).cast("double").alias("revenue"),
    )


@query(
    "q03_top_revenue_orders",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + aggregate + total-order top-k.
    customer is broadcast; lineitem⋈orders shuffles on the join key."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(_revenue(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q04_semi_anti_joins",
    oracle="""
    SELECT * FROM (
        SELECT 'semi_priority' AS section, o_orderpriority AS grp,
               COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'anti_idle' AS section, c_mktsegment AS grp,
               COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    ) ORDER BY section, grp
    """,
)
def q04_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS and NOT EXISTS under one section-tagged contract (merged
    former q04 + q07 to hold the driver's 50-query cap, the q40_set_ops
    precedent — round 8; both sides unchanged, same plans):

    - ``semi_priority``: EXISTS as a left-semi join (TPC-H Q4 shape); the
      semi join carries only the keys — no lineitem payload crosses the
      shuffle.
    - ``anti_idle``: NOT EXISTS as a left-anti join — customers who never
      ordered, grouped by market segment.

    ``key_sum`` checksums the surviving keys on both sides (order keys /
    customer keys), so the hash check sees which ROWS survived the
    semi/anti filters, not just how many."""
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    semi = (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        .select(F.lit("semi_priority").alias("section"), "grp", "n", "key_sum")
    )
    cust = load_table(spark, sf_dir, "customer")
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        )
        .select(F.lit("anti_idle").alias("section"), "grp", "n", "key_sum")
    )
    return semi.unionAll(anti).orderBy("section", "grp")


@query(
    "q05_region_revenue",
    oracle=f"""
    SELECT r_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(ROUND(SUM({_SQL_REV}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation   ON c_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY r_name, order_year
    ORDER BY r_name, order_year
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-table star join.  All dimensions broadcast — the
    fact table never shuffles until the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(money_sum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "order_year")
    )


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — the whole query is one
    pushed-down scan plus a two-stage (partial/final) agg, no join."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(dec("l_extendedprice") * dec("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q08_outer_join_order_fill",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(li.l_orderkey) AS n_with_heavy_items
    FROM orders o LEFT JOIN (
        SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 48
    ) li ON o.o_orderkey = li.l_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q08_outer_join_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware counting (COUNT(col) skips nulls)."""
    orders = load_table(spark, sf_dir, "orders")
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("l_orderkey").alias("n_with_heavy_items"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q14_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q14_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) beside plain aggregates — Spark expands to a
    two-phase aggregate; distinct state shuffles only the distinct pairs."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice"), "total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q15_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR  FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
           CAST(EXTRACT(DAY   FROM o_orderdate) AS INT) AS d,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
           UPPER(o_orderpriority) AS prio_upper,
           CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_num,
           CONCAT(o_orderstatus, '-', CAST(o_orderkey % 10 AS VARCHAR)) AS tag,
           LENGTH(o_orderpriority) AS prio_len,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CEIL(o_totalprice)  AS BIGINT) AS price_ceil,
           o_orderkey % 7 AS key_mod
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth: date extraction/arithmetic, string ops,
    math — all JVM-side builtins (the reference's only scalar layer is
    sprintf/sscanf string building, ``program.c:203-212, 432``)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.concat_ws("-", F.col("o_orderstatus"), (F.col("o_orderkey") % 10).cast("string")).alias(
            "tag"
        ),
        F.length("o_orderpriority").alias("prio_len"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "q16_having",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) >= 20
    ORDER BY c_mktsegment
    """,
)
def q16_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(dec("c_acctbal"), "total_balance"),
        )
        .filter(F.col("n_customers") >= 20)
        .orderBy("c_mktsegment")
    )


@query(
    "q17_above_brand_avg",
    oracle="""
    WITH brand_stats AS (
        SELECT p_brand,
               SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS brand_sum,
               COUNT(*) AS brand_cnt
        FROM part GROUP BY p_brand
    )
    SELECT p_partkey, p_name, p_brand,
           CAST(p_retailprice AS DOUBLE) AS retailprice
    FROM part JOIN brand_stats USING (p_brand)
    WHERE CAST(p_retailprice AS DECIMAL(18,2)) * brand_cnt > brand_sum
    ORDER BY p_partkey
    """,
)
def q17_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (price above the brand average), decorrelated
    into aggregate + join.  The comparison is multiplied through
    (price*cnt > sum) so it stays in exact decimal arithmetic."""
    part = load_table(spark, sf_dir, "part")
    stats = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.sum(dec("p_retailprice")).alias("brand_sum"),
        F.count(F.lit(1)).alias("brand_cnt"),
    )
    return (
        part.join(F.broadcast(stats), part.p_brand == stats.b_brand)
        .filter(dec("p_retailprice") * F.col("brand_cnt") > F.col("brand_sum"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q18_in_subquery",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q18_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) as a broadcast left-semi join through the dimension
    chain customer→nation→region."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    return (
        orders.join(F.broadcast(asia_cust), orders.o_custkey == asia_cust.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice"), "total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q19_grouping_sets",
    oracle="""
    SELECT 'rollup' AS variant, l_returnflag AS key1, l_linestatus AS key2,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS agg_val,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'sets' AS variant, l_returnflag AS key1, l_linestatus AS key2,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS agg_val,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    UNION ALL
    SELECT 'cube' AS variant, o_orderstatus AS key1, o_orderpriority AS key2,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS agg_val,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY variant, key1 NULLS FIRST, key2 NULLS FIRST
    """,
)
def q19_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three grouping-set constructs under one tagged contract:
    ROLLUP (DataFrame API) and explicit GROUPING SETS (SQL API) over
    lineitem, CUBE (DataFrame API) over orders — each with grouping_id,
    the bit vector that distinguishes a subtotal NULL from a data NULL
    (both engines follow the SQL-standard encoding: first listed column =
    most significant bit).  (q19+q24 merged round 3; q20_cube folded in
    round 8 to free a slot for q71_fuzzy_dedup_pipeline under the
    driver's 50-query cap — NOTES.md.  Not in the reference; SURVEY
    §2.15 breadth.)"""
    li = load_table(spark, sf_dir, "lineitem")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            money_sum(dec("l_quantity"), "agg_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("rollup").alias("variant"),
            F.col("l_returnflag").alias("key1"),
            F.col("l_linestatus").alias("key2"),
            "gid",
            "agg_val",
            "n",
        )
    )
    li.createOrReplaceTempView("lineitem_gs")
    sets = spark.sql(
        """
        SELECT 'sets' AS variant, l_returnflag AS key1, l_linestatus AS key2,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS agg_val,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    cube = (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            money_sum(dec("o_totalprice"), "agg_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("cube").alias("variant"),
            F.col("o_orderstatus").alias("key1"),
            F.col("o_orderpriority").alias("key2"),
            "gid",
            "agg_val",
            "n",
        )
    )
    return rollup.unionAll(sets).unionAll(cube).orderBy(
        "variant",
        F.col("key1").asc_nulls_first(),
        F.col("key2").asc_nulls_first(),
    )


@query(
    "q21_pivot_status_flag",
    oracle=f"""
    SELECT l_returnflag,
           CAST(ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN {_SQL_REV} END), 0), 2) AS DOUBLE) AS rev_open,
           CAST(ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN {_SQL_REV} END), 0), 2) AS DOUBLE) AS rev_filled,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q21_pivot_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (explicit aliases keep the schema
    oracle-alignable, unlike .pivot()'s generated column names)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = _revenue()
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.coalesce(F.sum(F.when(F.col("l_linestatus") == "O", rev)), F.lit(0)), 2)
            .cast("double")
            .alias("rev_open"),
            F.round(F.coalesce(F.sum(F.when(F.col("l_linestatus") == "F", rev)), F.lit(0)), 2)
            .cast("double")
            .alias("rev_filled"),
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_filled"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q22_top_parts",
    oracle="""
    SELECT p_partkey, p_name, p_brand, CAST(p_retailprice AS DOUBLE) AS retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 10
    """,
)
def q22_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — a per-partition heap
    + driver merge, never a full sort of the table."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
    )
