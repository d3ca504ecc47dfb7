"""Relational workload — the interactive-SQL surface.

The reference delegates interactive queries over its Iceberg lake to an
external SQL engine (SURVEY.md §0, §2.8: ORDER BY/LIMIT/UNION and all
ad-hoc aggregation "delegated to Athena"); in this engine that surface
IS Spark SQL/Catalyst. These queries prove the full relational menu on
the lake tables: multi-way joins (broadcast + shuffle), semi/anti joins,
grouped/windowed/rollup/pivot aggregation, set ops, top-k.

Scale notes (100 TB): dimension tables (region/nation/customer/supplier/
part) are broadcast; fact-fact joins (orders x lineitem) shuffle on the
join key and benefit from AQE skew handling; every query filters and
projects before joining so parquet pushdown minimizes scan bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from matano_spark.workloads import query
from matano_spark.workloads.util import davg, dsum, sql_davg, sql_dsum, t


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan-filter-aggregate with 8 aggregates.

    Single shuffle on 6 grouping values; map-side partial aggregation
    keeps shuffle bytes tiny at any scale.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: broadcast dim filter + fact-fact join + top-k.

    The broadcast customer join applies BELOW the fact-fact shuffle:
    orders is pruned to the BUILDING segment (~1/5 of rows) map-side
    before its orderkey exchange, so the orders⋈lineitem shuffle moves
    only matching orders (guide §2.3 "project before the exchange" +
    §3.2's reduce-the-big-side idea, with the broadcast itself as the
    filter). Both fact sides project to just the join/agg columns
    before shuffling. Top-k is a total-order LIMIT — Spark computes
    it with per-partition partial top-k (TakeOrderedAndProject), no full
    sort at scale. Ties broken by (o_orderdate, l_orderkey) so the
    result set is deterministic.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    ord_b = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(ord_b, li.l_orderkey == ord_b.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS as a left-semi join + aggregate."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join, dims broadcast, facts shuffled once."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure scan-filter-aggregate; all predicates push
    to the parquet scan (verify via PushedFilters in explain)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: returned-item revenue per customer, top 20."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {sql_dsum('l_extendedprice * (1 - l_discount)')} * 100.0 AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional aggregation over a broadcast join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (dsum(promo) / dsum(disc_price) * 100.0).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 55
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: HAVING over a fact aggregate, then joins."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 55)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@query(
    "top_customers_per_nation",
    oracle=f"""
    WITH rev AS (
      SELECT c_custkey, c_name, n_name,
             {sql_dsum('o_totalprice')} AS total_spend
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT n_name, c_custkey, c_name, total_spend, rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY n_name ORDER BY total_spend DESC, c_custkey) AS rk
      FROM rev
    ) WHERE rk <= 3
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (SURVEY §2.8: Spark-native
    sort/limit surface). Deterministic tie-break on c_custkey."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum("o_totalprice").alias("total_spend"))
    )
    w = W.partitionBy("n_name").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rk")
    )


@query(
    "rollup_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (SURVEY §2.4 note: grouping sets come free via
    Spark SQL; exposed here as first-class)."""
    orders = t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority, one column per status."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .withColumnsRenamed({"O": "status_o", "F": "status_f", "P": "status_p"})
    )


@query(
    "monthly_running_revenue",
    oracle=f"""
    WITH monthly AS (
      SELECT l_suppkey, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS rev
      FROM lineitem
      WHERE l_suppkey <= 10
      GROUP BY 1, 2
    )
    SELECT l_suppkey, month, rev,
           CAST(SUM(CAST(ROUND(rev * 1000000.0, 0) AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 1000000.0 AS running_rev
    FROM monthly
    """,
)
def monthly_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window over a pre-aggregated monthly series."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    monthly = (
        li.groupBy(
            "l_suppkey", F.date_trunc("month", F.col("l_shipdate")).alias("month")
        ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scaled = F.round(F.col("rev") * F.lit(1000000.0), 0).cast("bigint")
    return monthly.withColumn(
        "running_rev", F.sum(scaled).over(w).cast("double") / F.lit(1000000.0)
    )


@query(
    "setops_active_not_partial",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setops_active_not_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT DISTINCT) — SURVEY §2.8 set-op surface."""
    orders = t(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    part_c = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.subtract(part_c)  # EXCEPT DISTINCT semantics


@query(
    "setops_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def setops_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT: customers ordering in both years."""
    orders = t(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk, {sql_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l_extendedprice')} AS total_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: correlated aggregate decorrelated into a
    self-aggregation join — revenue of below-half-average-quantity
    line items. The per-part average reuses the lineitem shuffle key
    (l_partkey) so AQE can co-locate both sides."""
    li = t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_prospects_anti_join",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_davg('c_acctbal')} AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_prospects_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: scalar-subquery threshold + anti join
    (customers above average balance with no orders before 1996)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "quantile_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           quantile_cont(l_quantity, 0.5) AS med_qty,
           quantile_cont(l_extendedprice, 0.95) AS p95_price,
           quantile_cont(l_extendedprice, 0.99) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + distinct counts (the
    'delegated to Athena' analytics surface, SURVEY §2.4 note). Both
    engines use linear interpolation over the sorted values, so even
    these match bit-for-bit. At 100 TB the approximate forms
    (approx_percentile / approx_count_distinct) swap in per-call."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.percentile("l_quantity", 0.5).alias("med_qty"),
        F.percentile("l_extendedprice", 0.95).alias("p95_price"),
        F.percentile("l_extendedprice", 0.99).alias("p99_price"),
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bidirectional nation-pair trade volume — the
    same dimension table joined twice under different roles."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    cn = t(spark, sf_dir, "nation").alias("cn")
    sn = t(spark, sf_dir, "nation").alias("sn")
    pair = (
        (F.col("cn.n_name") == "NATION_1") & (F.col("sn.n_name") == "NATION_2")
    ) | ((F.col("cn.n_name") == "NATION_2") & (F.col("sn.n_name") == "NATION_1"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cn), F.col("cn.n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(sn), F.col("sn.n_nationkey") == F.col("s_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q19_disjunctive_filters",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size <= 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_type LIKE 'PROMO%' AND p_size <= 10
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunctive multi-table predicates — the OR
    spans both join sides so it evaluates post-join; per-branch
    single-side conjuncts are still pushdown candidates for Catalyst."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            F.col("p_type").startswith("PROMO")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q11_supplier_concentration",
    oracle=f"""
    WITH per_supp AS (
      SELECT s_nationkey, s_suppkey,
             {sql_dsum('s_acctbal')} AS bal
      FROM supplier GROUP BY s_nationkey, s_suppkey
    ),
    tot AS (SELECT {sql_dsum('s_acctbal')} AS total FROM supplier)
    SELECT s_nationkey, s_suppkey, bal,
           bal / total AS share
    FROM per_supp, tot
    WHERE bal / total > 0.02
    """,
)
def q11_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: share-of-global-total via a broadcast scalar
    aggregate — suppliers holding > 2% of total account balance."""
    supp = t(spark, sf_dir, "supplier")
    per_supp = supp.groupBy("s_nationkey", "s_suppkey").agg(
        dsum("s_acctbal").alias("bal")
    )
    tot = supp.agg(dsum("s_acctbal").alias("total"))
    return (
        per_supp.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("bal") / F.col("total"))
        .filter(F.col("share") > 0.02)
        .select("s_nationkey", "s_suppkey", "bal", "share")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    mincost AS (
      SELECT l_partkey AS mk, MIN(unit_cost) AS min_cost
      FROM cost GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           cost.unit_cost AS min_cost
    FROM part
    JOIN cost ON p_partkey = cost.l_partkey
    JOIN mincost ON p_partkey = mincost.mk
               AND cost.unit_cost = mincost.min_cost
    JOIN supplier ON cost.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: per-part minimum-cost supplier via a join back
    onto a grouped MIN (the correlated-scalar-subquery shape, decorrelated
    the way Catalyst itself rewrites it). With no partsupp table in the
    testdata, (l_partkey, l_suppkey, min unit price) plays the part-supplier
    catalog (ref delegates this surface to Athena SQL; SURVEY §2.8).

    SCALE: both aggregates are map-side-partial groupBys on l_partkey;
    the min-cost join back is on (partkey, cost) — co-partitioned with
    the cost aggregate, so one shuffle; dims broadcast.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    mincost = cost.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        cost.join(
            mincost,
            (cost.l_partkey == mincost.mk) & (cost.unit_cost == mincost.min_cost),
        )
        .join(F.broadcast(part), F.col("p_partkey") == cost.l_partkey)
        .join(F.broadcast(supp), F.col("s_suppkey") == cost.l_suppkey)
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("unit_cost").alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q8_nation_market_share",
    oracle=f"""
    WITH flows AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {sql_dsum('volume')} AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one nation's share of a region's market by
    year — conditional aggregation as a ratio of two sums over the same
    8-way join (dims broadcast, facts shuffle once on orderkey)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = t(spark, sf_dir, "nation").alias("cn")
    sn = t(spark, sf_dir, "nation").alias("sn")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flows = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn.n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("cn.n_regionkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn.n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return flows.groupBy("o_year").agg(
        (dsum(nat_vol) / dsum("volume")).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)'
                     ' - 0.1 * p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit by supplier nation and year. The
    ps_supplycost term becomes 10% of retail price (no partsupp table);
    the shape — LIKE-filtered part driving a 5-way join into a two-key
    rollup — is the same."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nat = t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (l_linestatus standing in for l_shipmode, which
    the testdata lacks): conditional counts split by order priority."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: customers-per-order-count histogram — LEFT
    OUTER join with a compound join condition (customers with zero
    qualifying orders must appear as c_count = 0), then a second
    aggregation over the first."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: supplier(s) achieving the quarter's maximum
    revenue — a scalar-subquery MAX over a derived aggregate, realized
    as a 1-row broadcast joined back (exact double equality is safe:
    both sides carry the identical scaled-integer sum)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_cnt_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 5, 15, 25, 35, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct-supplier counts per part attribute,
    excluding suppliers with negative balances (the 'complaints' NOT IN
    becomes a broadcast left-anti join)."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 5, 15, 25, 35, 45)
    )
    li = t(spark, sf_dir, "lineitem")
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@query(
    "q20_excess_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey AS pk, SUM(qty) AS total
      FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN shipped ON s_suppkey = shipped.l_suppkey
    JOIN tot ON shipped.l_partkey = tot.pk
    JOIN part ON p_partkey = shipped.l_partkey
    WHERE p_name LIKE '%blue%' AND qty > 0.3 * total
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers who shipped more than 30% of a
    blue part's yearly volume — nested aggregation (per-pair, then
    per-part totals) feeding a semi-join-shaped DISTINCT projection.
    l_quantity values are integral doubles, so the plain SUMs are exact
    in both engines at any aggregation order."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supp = t(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total")
    )
    return (
        shipped.join(tot, shipped.l_partkey == tot.pk)
        .join(F.broadcast(part), F.col("p_partkey") == shipped.l_partkey)
        .join(F.broadcast(supp), F.col("s_suppkey") == shipped.l_suppkey)
        .filter(F.col("qty") > 0.3 * F.col("total"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "q21_waiting_sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM li GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(DISTINCT li.l_orderkey) AS numwait
    FROM li
    JOIN per_order ON li.l_orderkey = per_order.l_orderkey
    JOIN supplier ON li.l_suppkey = s_suppkey
    WHERE li.late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers solely responsible for late completed
    orders (shipdate > orderdate + 60 days stands in for the missing
    receipt/commit dates). The EXISTS / NOT EXISTS pair decorrelates
    into per-order distinct-supplier counts joined back to the late rows
    — one shuffle on orderkey feeds both the aggregate and the join."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = (
        t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        li.filter(F.col("late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "cube_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l_quantity * 1000000.0, 0) AS BIGINT))
                AS DOUBLE) / 1000000.0 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with GROUPING() ids — all four aggregation
    levels (detail, per-flag, per-status, grand total) in one pass;
    the GROUPING flags disambiguate a NULL dimension value from a
    subtotal row. Map-side partials expand per grouping set, still one
    shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status",
            "n_items", "sum_qty",
        )
    )


@query(
    "window_rank_functions",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS balance_rank,
           PERCENT_RANK() OVER w AS balance_pct_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS balance_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family over one window: dense_rank,
    percent_rank (exact rational (rank-1)/(n-1) — bit-identical both
    engines), and ntile quartiles, partitioned per nation. One shuffle
    on the partition key; no global sort."""
    cust = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).cast("bigint").alias("balance_rank"),
        F.percent_rank().over(w).alias("balance_pct_rank"),
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
    )


@query(
    "unpivot_measures",
    oracle=f"""
    SELECT l_returnflag, 'l_quantity' AS measure,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS total
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT l_returnflag, 'l_extendedprice',
           COUNT(*), {sql_dsum('l_extendedprice')}
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT l_returnflag, 'l_discount',
           COUNT(*), {sql_dsum('l_discount')}
    FROM lineitem GROUP BY 1
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long reshape, the inverse of the pivot query):
    three lineitem measures melt into (measure, value) rows and
    aggregate per (returnflag, measure). Spark's unpivot is a
    projection-level Expand — one scan, no extra shuffle beyond the
    final aggregation; the oracle states the same relation as three
    grouped scans unioned."""
    li = t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("total"),
    )


@query(
    "nation_revenue_share",
    oracle="""
    WITH nat_rev AS (
      SELECT n_name, r_name,
             SUM(CAST(ROUND(o_totalprice * 1000000.0, 0) AS BIGINT)) AS sv
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n_regionkey
      GROUP BY n_name, r_name
    )
    SELECT n_name, r_name,
           CAST(sv AS DOUBLE) / 1000000.0 AS revenue,
           CAST(sv AS DOUBLE)
             / CAST(SUM(sv) OVER (PARTITION BY r_name) AS DOUBLE)
             AS region_share
    FROM nat_rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total within a group (ratio_to_report): each nation's
    share of its region's order revenue via a partition-sum window over
    the pre-aggregated nation level — no self-join, no scalar subquery,
    one extra window pass over ~25 rows. The windowed denominator sums
    <= 25 exact scaled values per region, so even the double division
    is engine-identical."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    sv = F.sum(
        F.round(F.col("o_totalprice") * F.lit(1000000.0), 0).cast("bigint")
    ).alias("sv")
    nat_rev = (
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(sv)
    )
    w = W.partitionBy("r_name")
    return nat_rev.select(
        "n_name",
        "r_name",
        (F.col("sv").cast("double") / F.lit(1000000.0)).alias("revenue"),
        (
            F.col("sv").cast("double")
            # sum the exact scaled BIGINTS in the window (association-
            # free), convert once — a windowed double-sum would be
            # order-dependent at large magnitudes
            / F.sum("sv").over(w).cast("double")
        ).alias("region_share"),
    )


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS n FROM part),
    grams AS (
      SELECT DISTINCT n, substr(n, i, 3) AS g
      FROM names, unnest(range(1, len(n) - 1)) AS t(i)
    ),
    capped AS (
      SELECT * FROM grams WHERE g IN (
        SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 30)
    ),
    cands AS (
      SELECT DISTINCT a.n AS name_a, b.n AS name_b
      FROM capped a JOIN capped b ON a.g = b.g AND a.n < b.n
      WHERE abs(len(a.n) - len(b.n)) <= 2
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_distance
    FROM cands
    WHERE levenshtein(name_a, name_b) <= 2
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / fuzzy matching: near-identical name pairs by
    edit distance <= 2, blocked by shared character 3-grams so the
    verification join is an equi-join over gram buckets — never an
    all-pairs Levenshtein. The record-linkage primitive behind
    vendor/host/user canonicalization in security data and
    source-name normalization in corpus curation.

    Blocking guarantee: 2 edits destroy at most 6 of a name's 3-grams,
    so any <=2-distance pair of names with >= 9 grams still shares one
    — recall loss only on very short strings, exactly like MinHash
    banding. Hot grams (stop-syllables) are df-capped before the
    self-join (drop_hot_keys), bounding the worst bucket.

    SCALE: runs on the DISTINCT name dictionary — orders smaller than
    the row count; the gram self-join shuffles on the gram (capped);
    Levenshtein runs only on candidates, JVM-side (both engines use
    the standard ins/del/sub definition, so distances hash-match).
    """
    from matano_spark.operators.dedup import drop_hot_keys

    part = t(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("n")).distinct()
    idx = F.sequence(F.lit(1), F.length("n") - 2)
    grams = (
        names.filter(F.length("n") >= 3)
        .select(
            "n",
            F.explode(
                F.transform(idx, lambda i: F.col("n").substr(i, F.lit(3)))
            ).alias("g"),
        )
        .distinct()
    )
    capped = drop_hot_keys(grams, ["g"], cap=30)
    a, b = capped.alias("a"), capped.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.n") < F.col("b.n")),
        )
        .filter(
            F.abs(F.length(F.col("a.n")) - F.length(F.col("b.n"))) <= 2
        )
        .select(F.col("a.n").alias("name_a"), F.col("b.n").alias("name_b"))
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cands.select(
        "name_a", "name_b", dist.cast("bigint").alias("edit_distance")
    ).filter(F.col("edit_distance") <= 2)
