"""Additional TPC-H-pattern queries: correlated subqueries, outer-join
distributions, existence quantifiers — the Catalyst features (subquery
decorrelation, null-aware anti join) the base set doesn't touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table, load_tables


def _ntz(lit: str) -> F.Column:
    return F.expr(f"TIMESTAMP_NTZ '{lit}'")


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS correlated subquery → left-semi join."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"], register=False)
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= _ntz("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1996-10-01 00:00:00"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        ords.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    ORDER BY cust_nation, supp_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume, two aliases of one dim."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"], register=False)
    cn = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join + double aggregation (order-count histogram)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"], register=False)
    ords = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery — decorrelated to an agg join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"], register=False)
    part = t["part"].filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    avg_qty = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.avg("l_quantity") * 0.5).alias("half_avg_qty"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT segment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substr(c_name, 1, 10) AS segment, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
    GROUP BY segment
    ORDER BY segment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery + anti join.

    The scalar average arrives via broadcast crossJoin — one plan, no
    separate driver job.
    """
    t = load_tables(spark, sf_dir, ["customer", "orders"], register=False)
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(F.substring("c_name", 1, 10).alias("segment"), "c_acctbal")
        .groupBy("segment")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("segment")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: derived-table reuse + scalar-max filter.

    The scalar max rides in as a broadcast crossJoin, so the whole query
    is ONE plan (no driver-side `.first()` between jobs) and AQE sees
    all of it.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"], register=False)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        t["supplier"]
        .join(
            F.broadcast(
                revenue.crossJoin(F.broadcast(max_rev)).filter(
                    F.col("total_revenue") == F.col("_max_rev")
                )
            ),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 40 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_type = 'PROMO' AND l_quantity >= 20)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicates over a join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"], register=False)
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 20) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 20))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'CHINA' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region   ON n1.n_regionkey = r_regionkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of regional revenue by year."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation", "region"], register=False
    )
    n1 = t["nation"].select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    asia = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(asia), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "CHINA", rev).otherwise(0.0)) / F.sum(rev), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))
                          - 0.8::DECIMAL(18,6) * p_retailprice::DECIMAL(18,6) * l_quantity::DECIMAL(18,6)),
                      2) AS DOUBLE) AS profit
    FROM lineitem JOIN part     ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE contains(p_name, 'a')
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year (retailprice
    stands in for ps_supplycost — no partsupp table in this schema).

    The revenue−cost cancellation amplifies float summation-order noise
    across engines, so the money math runs in exact DECIMAL on both
    sides: the sum is order-independent and rounds identically.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "orders", "nation"], register=False)
    parts = t["part"].filter(F.col("p_name").contains("a")).select("p_partkey", "p_retailprice")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    profit = dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount"))) - dec(
        F.lit(0.8)
    ) * dec(F.col("p_retailprice")) * dec(F.col("l_quantity"))
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the same fact.

    The sole supplier whose lineitem was returned on a multi-supplier
    finalized order ('kept others waiting'). Both quantifiers become
    semi/anti joins on (orderkey) with a supplier-mismatch predicate.
    """
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders"], register=False)
    li = t["lineitem"]
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("e_okey"), F.col("l_suppkey").alias("e_skey"))
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("e_okey")) & (F.col("l_suppkey") != F.col("e_skey")),
        "left_semi",
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("n_okey"), F.col("l_suppkey").alias("n_skey"))
    )
    sole_returner = exists_other.join(
        l3,
        (F.col("l_orderkey") == F.col("n_okey")) & (F.col("l_suppkey") != F.col("n_skey")),
        "left_anti",
    )
    return (
        sole_returner.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(round(l_extendedprice / l_quantity, 4)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eligible AS (
      SELECT c.l_partkey, c.unit_cost, s_name, s_acctbal, n_name
      FROM costs c JOIN supplier ON s_suppkey = c.l_suppkey
                   JOIN nation ON s_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'),
    mc AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM eligible GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_retailprice, unit_cost
    FROM eligible e JOIN mc ON e.l_partkey = mc.l_partkey AND e.unit_cost = mc.min_cost
                    JOIN part ON p_partkey = e.l_partkey
    WHERE p_size BETWEEN 10 AND 30 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per part.

    The reference schema has no partsupp, so the part↔supplier offer
    relation is derived from lineitem (min observed unit price per
    (part, supplier)). The correlated MIN subquery decorrelates into a
    per-part aggregate joined back on (partkey, cost) — Catalyst's
    standard Q2 plan. Dims broadcast; the only big shuffle is the
    lineitem groupBy.
    """
    t = load_tables(
        spark, sf_dir, ["lineitem", "supplier", "nation", "region", "part"], register=False
    )
    from pyspark.sql.window import Window

    costs = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias("unit_cost"))
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nat = t["nation"].join(F.broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey"))
    eligible = (
        costs.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    # per-part MIN as a window over ONE pass of eligible (a join-back
    # decorrelation would scan and aggregate lineitem twice)
    w = Window.partitionBy("l_partkey")
    parts = t["part"].filter(
        F.col("p_size").between(10, 30) & (F.col("p_type") == "STANDARD")
    )
    return (
        eligible.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_retailprice", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS ps_partkey,
             sum(l_extendedprice::DECIMAL(15,4) * l_quantity::DECIMAL(8,2)) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT ps_partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM v, (SELECT sum(value) AS total FROM v) t
    WHERE value * 1000 > total
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value vs a global-total
    scalar (HAVING > fraction-of-total), one nation's suppliers.

    value = Σ extendedprice·quantity stands in for supplycost·availqty
    (no partsupp table). The derived table is computed once and reused
    for both the per-part values and the grand total; the scalar total
    joins back via broadcast crossJoin — a single plan, DECIMAL-exact
    on both sides of the threshold comparison.
    """
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"], register=False)
    nat = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    v = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,4)")
                * F.col("l_quantity").cast("decimal(8,2)")
            ).alias("value")
        )
    )
    total = v.agg(F.sum("value").alias("_total"))
    return (
        v.crossJoin(F.broadcast(total))
        # integer multiplier keeps the comparison DECIMAL-exact without
        # widening past either engine's decimal range
        .filter(F.col("value") * F.lit(1000) > F.col("_total"))
        .select("ps_partkey", F.round("value", 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding a NOT-IN supplier denylist (negative balance stands in
    for the complaints-comment filter; s_comment isn't in this schema).

    NOT IN over a non-nullable key → plain anti join; the distinct
    count shuffles (brand, type, size, suppkey) once, then counts.
    """
    t = load_tables(spark, sf_dir, ["part", "lineitem", "supplier"], register=False)
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100)
    ORDER BY s_name
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers of one nation
    who moved real volume of a part family in a year.

    The inner IN (parts by name prefix) is a broadcast semi join inside
    the aggregate; the outer IN becomes a semi join from supplier to
    the HAVING-filtered aggregate. Sum threshold stands in for the
    availqty comparison (no partsupp table).
    """
    t = load_tables(spark, sf_dir, ["supplier", "nation", "lineitem", "part"], register=False)
    parts = t["part"].filter(F.col("p_name").startswith("small")).select("p_partkey")
    movers = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
