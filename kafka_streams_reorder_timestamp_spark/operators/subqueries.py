"""Correlated-subquery and LIKE-heavy relational shapes (TPC-H
q4/q13/q16/q17/q18/q21/q22 adapted to the synthetic catalog, which has
no partsupp table and no comment columns — the subquery *shapes* are
what matters: EXISTS, NOT EXISTS, IN with HAVING, NOT IN, correlated
scalar aggregate, and scalar-subquery thresholds, each expressed so
Catalyst decorrelates them into semi/anti/aggregate joins rather than
per-row re-execution).

The reference has no relational surface at all (SURVEY.md §2.2); this
module extends the mandated coverage to the subquery family the
registry previously lacked.

Scale notes (100 TB posture):
  - EXISTS/NOT EXISTS become left-semi / left-anti hash joins on the
    correlation key — one shuffle each, no per-row subquery.
  - Correlated scalar aggregates (q17) are decorrelated by hand into a
    per-key aggregate joined back on the key, which is exactly the
    plan Catalyst would pick and keeps the aggregate partial
    (map-side) before its single shuffle.
  - Scalar thresholds over aggregates (q18/q22) avoid cross-engine
    float drift by comparing in exact integer/decimal space
    (cross-multiplying instead of dividing where an average appears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

DEC = "decimal(25,6)"


@register(
    "q4_late_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS — orders with at least one "
    "late shipment (>90 days after order date; the catalog has no "
    "commit/receipt dates so ship-vs-order lateness stands in), "
    "counted by priority. Spark plans the EXISTS as a left-semi hash "
    "join on orderkey with the lateness predicate inside the join "
    "condition: one shuffle, no per-row subquery.",
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority NOT LIKE '%URGENT'
       AND o.o_orderpriority NOT LIKE '%-HIGH'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: order-count distribution with a LIKE-heavy "
    "join filter (the catalog has no o_comment, so the NOT LIKE "
    "patterns run against o_orderpriority). The predicate lives in the "
    "LEFT JOIN's ON clause — customers whose every order is excluded "
    "still appear with c_count=0, which a WHERE would silently drop. "
    "Two hash aggregations; the second groups on a tiny domain.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    keep = ~F.col("o_orderpriority").like("%URGENT") & ~F.col(
        "o_orderpriority"
    ).like("%-HIGH")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey) & keep, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape: supplier-count-per-part-group with NOT LIKE, "
    "an IN size list, and a NOT IN subquery excluding distrusted "
    "suppliers (negative balance stands in for the complaint LIKE; "
    "lineitem stands in for partsupp as the part-supplier "
    "association). The NOT IN side is a handful of keys — Spark plans "
    "a broadcast left-anti join (null-aware); part filters push to the "
    "scan; COUNT(DISTINCT) expands per-group, one extra shuffle.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("STANDARD%")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(25,6))) / 7.0, 2)::DOUBLE
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated scalar aggregate — lines whose "
    "quantity is below 20% of their part's average. Decorrelated into "
    "a per-partkey aggregate joined back on partkey (the plan Catalyst "
    "produces for the subquery form): partial agg before one shuffle, "
    "then a key-equi join. The threshold compare is safe cross-engine: "
    "quantities are small integers, so the double sum/avg is exact. "
    "The brand filter applies only to the outer side, as in Q17 — the "
    "inner average runs over every supplier of the part.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           ROUND(CAST(CASE WHEN isfinite(o.o_totalprice) THEN o.o_totalprice END AS DECIMAL(25,6)), 2)::DOUBLE AS totalprice,
           ROUND(SUM(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_qty
    FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: IN over an aggregate-with-HAVING subquery — "
    "orders totalling >300 units. Spark decorrelates the IN into a "
    "left-semi join against the aggregated key set; the big-side "
    "aggregation is partial before its shuffle, and AQE broadcasts the "
    "tiny qualifying-key set at runtime.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)), 2)
            .cast("double")
            .alias("sum_qty")
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.col("o_totalprice").cast(DEC), 2)
            .cast("double")
            .alias("totalprice"),
            "sum_qty",
        )
    )


@register(
    "q21_sole_failing_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: correlated EXISTS + NOT EXISTS with an "
    "inequality correlation — suppliers who were the ONLY supplier "
    "with returned lines on a finished multi-supplier order "
    "(returnflag='R' stands in for the receipt-after-commit lateness "
    "the catalog lacks). The EXISTS is a left-semi and the NOT EXISTS "
    "a left-anti hash join, both on orderkey with the suppkey "
    "inequality as a residual join predicate — no per-row subquery at "
    "any scale; supplier is broadcast.",
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    others = (F.col("l2.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    )
    others_r = (F.col("l3.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l3.l_suppkey") != F.col("l1.l_suppkey")
    )
    return (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(l2, others, "left_semi")
        .join(l3, others_r, "left_anti")
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END AS DECIMAL(25,6))) AS total, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END AS DECIMAL(25,6))), 2)::DOUBLE AS totacctbal
    FROM customer, pos
    WHERE CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END AS DECIMAL(25,6)) * pos.n > pos.total
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: customers richer than the positive-balance "
    "average with no urgent orders, grouped by segment (mktsegment "
    "stands in for the phone country code; 'no urgent order' for 'no "
    "order', which is vacuous in this catalog — every rich customer "
    "ordered). The average threshold is compared cross-multiplied in "
    "exact decimal space (bal*n > total) — a decimal-division average "
    "rounds differently across engines. The one-row aggregate "
    "broadcasts; NOT EXISTS is a left-anti join on custkey with the "
    "priority filter pushed to the anti side's scan.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast(DEC)).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n") > F.col("total"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q2_min_unitprice_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(25,6)))::DOUBLE
               / SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6)))::DOUBLE AS unit_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT p.p_partkey, s.s_name, n.n_name AS nation,
           ROUND(u.unit_cost, 6) AS unit_cost
    FROM part p
      JOIN unit u ON u.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = u.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size < 10
      AND u.unit_cost = (
        SELECT MIN(u2.unit_cost) FROM unit u2
        WHERE u2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H Q2 shape: cheapest supplier per part — a correlated MIN "
    "over a derived per-(part,supplier) aggregate (realized unit price "
    "from lineitem stands in for partsupp supply cost). Decorrelated "
    "into a per-part window MIN over ONE pass: the selective part "
    "filter joins BEFORE the aggregate (25x less agg input), and the "
    "single shuffle on l_partkey satisfies the (partkey, suppkey) "
    "groupBy, the partkey window, and the correlated filter — zero "
    "further exchanges (a two-branch min-join recomputed the lineitem "
    "agg twice). The MIN equality is engine-safe: both unit costs are "
    "the SAME double (exact decimal sums cast to double, IEEE "
    "division), so ties surface identically.",
)
def q2_min_unitprice_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 10)
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # Join the filtered parts first (AQE broadcasts the small side at
    # runtime; never forced — part scales with SF), so the aggregate
    # only sees qualifying partkeys. The join's hash partitioning on
    # l_partkey is a superset-compatible distribution for everything
    # downstream: groupBy(l_partkey, l_suppkey), the per-partkey MIN
    # window, and the min-equality filter all reuse it.
    li_f = li.join(p, li.l_partkey == p.p_partkey)
    unit = li_f.groupBy("p_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
            / F.sum(F.col("l_quantity").cast(DEC)).cast("double")
        ).alias("unit_cost")
    )
    win = Window.partitionBy("p_partkey")
    return (
        unit.withColumn("min_cost", F.min("unit_cost").over(win))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))) AS v
      FROM lineitem GROUP BY 1
    ), tot AS (SELECT SUM(v) AS t FROM val)
    SELECT l_partkey, ROUND(v, 2)::DOUBLE AS part_value
    FROM val, tot
    WHERE v * 3000 > t
    """,
    doc="TPC-H Q11 shape: parts whose revenue exceeds 1/3000 of the "
    "global total — a HAVING against a scalar aggregate over the same "
    "derived view. The threshold compare is cross-multiplied in exact "
    "decimal space (v*3000 > t) instead of dividing the total, so no "
    "engine-specific decimal division is involved; the one-row total "
    "broadcasts and the per-part agg shuffles once (partial map-side): "
    "the per-part view is persisted so the total and the probe side "
    "share ONE lineitem scan+shuffle (Catalyst gives the two consumers "
    "different column prunings, so exchange reuse alone does not "
    "dedupe them — round-5 plan audit measured the doubled scan). The "
    "persist is LAZY: nothing executes at plan-build time (registry "
    "enumeration and plan-shape gates must see the real plan, not a "
    "checkpointed Scan ExistingRDD), and within the one real action "
    "the broadcast job computes the total first, filling the cache "
    "the probe side then reads. The cache is reclaimed by "
    "clearCache/ContextCleaner like the AllPairs shingle cache.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    val = li.groupBy("l_partkey").agg(F.sum(rev).alias("v")).persist()
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v") * 3000 > F.col("t"))
        .select(
            "l_partkey", F.round("v", 2).cast("double").alias("part_value")
        )
    )


@register(
    "q20_heavy_blue_suppliers",
    oracle="""
    SELECT s_suppkey, s_name,
           ROUND(CAST(CASE WHEN isfinite(s_acctbal) THEN s_acctbal END AS DECIMAL(25,6)), 2)::DOUBLE AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
      )
      GROUP BY l_suppkey
      HAVING SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6))) > 2200
    )
    """,
    doc="TPC-H Q20 shape: nested IN subqueries with an aggregate "
    "HAVING — suppliers who moved >2200 units of blue-named parts "
    "(name LIKE stands in for the forest%% filter; lineitem for "
    "partsupp availability). Spark plans both INs as left-semi hash "
    "joins — the part-id set broadcasts into the lineitem scan's "
    "semi-join, the qualifying supplier-key set broadcasts into the "
    "supplier scan; the aggregate is partial before its single "
    "shuffle.",
)
def q20_heavy_blue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    blue = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")
    ).select("p_partkey")
    heavy = (
        li.join(blue, li.l_partkey == blue.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 2200)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal").cast(DEC), 2).cast("double").alias("acctbal"),
        )
    )


@register(
    "q15_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6)))
               AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total, 2)::DOUBLE AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT MAX(total) FROM revenue)
    """,
    doc="TPC-H Q15 shape: scalar MAX subquery over a derived revenue "
    "view (ties all surface, as in the spec). Exact decimal sums make "
    "the MAX comparison engine-independent. Spark evaluates the scalar "
    "subquery once and broadcasts it; the revenue agg is partial "
    "before its one shuffle, and supplier joins broadcast.",
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
            "total"
        )
    )
    top = rev.agg(F.max("total").alias("max_total"))
    return (
        rev.join(F.broadcast(top), rev.total == F.col("max_total"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total"), 2).cast("double").alias("total_revenue"),
        )
    )
