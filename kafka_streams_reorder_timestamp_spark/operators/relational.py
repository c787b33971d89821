"""Relational core over the TPC-H-ish catalog tables.

The reference contains no relational operators at all (SURVEY.md §2.2
marks every category Absent), so this module IS the extension surface
mandated by the north star: scans, projection, filters, all join
shapes, hash aggregation, window functions, sort/limit, set ops,
rollup — each expressed declaratively so Catalyst plans them
(pushdown, broadcast, AQE) with zero custom physical code.

Scale notes (100 TB posture):
  - Dimension joins (region, nation) are always broadcast — sizes are
    fixed regardless of SF.
  - Fact-fact joins (orders x lineitem) shuffle on the join key; AQE
    handles skew/coalescing. At cluster scale, bucketing both tables
    by orderkey removes the shuffle entirely; the declarative plan
    here picks that up for free when the tables are bucketed.
  - Every filter is written against the scan column so it reaches the
    parquet reader (PushedFilters), and projections keep ReadSchema
    minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# Money arithmetic: the synthetic data's money/discount/tax columns are
# exact 2-decimal values, so products have ≤6 true decimal digits and a
# per-row cast to decimal(25,6) recovers the exact value on both Spark
# and DuckDB. Summing decimals is exact integer arithmetic — the result
# is independent of partitioning/summation order, unlike double sums,
# which drift by ulps and flip the cent after ROUND (the round-1
# hash-mismatch on q3/q10). Every money aggregate below follows:
#   ROUND(SUM(CAST(expr AS DECIMAL(25,6))), 2)::DOUBLE
# identically on the Spark and oracle sides.
DEC = "decimal(25,6)"


def _money_sum(expr: F.Column, scale: int = 2) -> F.Column:
    """Order-independent money sum: exact decimal sum, rounded, as double."""
    return F.round(F.sum(expr.cast(DEC)), scale).cast("double")


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6))), 2)::DOUBLE      AS sum_qty,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_base_price,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE                 AS sum_disc_price,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount) * (1 + l_tax)) THEN l_extendedprice * (1 - l_discount) * (1 + l_tax) END AS DECIMAL(25,6))), 2)::DOUBLE                 AS sum_charge,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6)))::DOUBLE / COUNT(*), 4)      AS avg_qty,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(25,6)))::DOUBLE / COUNT(*), 4) AS avg_price,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_discount) THEN l_discount END AS DECIMAL(25,6)))::DOUBLE / COUNT(*), 4)      AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: scan+filter+hash agg; map-side partial agg, one shuffle.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity")).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / cnt, 4).alias("avg_price"),
            F.round(F.sum(F.col("l_discount").cast(DEC)).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_segment_revenue",
    oracle="""
    SELECT o.o_orderkey,
           ROUND(SUM(CAST(CASE WHEN isfinite(l.l_extendedprice * (1 - l.l_discount)) THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    doc="TPC-H Q3 shape: 3-way join (dim filter first) + agg.",
)
def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        # Emit the date as a yyyy-MM-dd string: DATE round-trips through
        # pandas differently in Spark (datetime.date) vs DuckDB
        # (datetime64), which breaks value-hash comparison even when the
        # values agree.
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@register(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(CAST(CASE WHEN isfinite(l.l_extendedprice * (1 - l.l_discount)) THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey   = c.c_custkey
      JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
                     AND s.s_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: snowflake join; dims broadcast, facts shuffle on keys.",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # supplier scales with SF (10k rows/SF) so it gets NO broadcast hint
    # — at cluster scale a forced broadcast would OOM; AQE/the 64MB
    # autoBroadcastJoinThreshold decide at runtime. Only the fixed-size
    # dims (region=5, nation=25 rows at every SF) are hinted.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * l_discount) THEN l_extendedprice * l_discount END AS DECIMAL(25,6))), 2)::DOUBLE
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan+filter+global agg; every predicate pushes to parquet.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(CAST(CASE WHEN isfinite(l.l_extendedprice * (1 - l.l_discount)) THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name
    FROM customer c
      JOIN orders o   ON o.o_custkey  = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
    )


@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rk
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part
    ) WHERE rk <= 3
    """,
    doc="Top-K per group via ranking window (deterministic tie-break on key).",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    )


@register(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(25,6)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS running_spend
    FROM orders
    """,
    doc="Analytic window: running sum per customer (frame spec).",
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # DuckDB evaluates window sums with a segment tree (different
    # addition order than Spark's sequential accumulation), so the sum
    # runs in exact decimal on both sides.
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    doc="Anti join (NOT EXISTS) + agg; orders side date-restricted so the "
    "result is non-empty (every customer has SOME order in the test data).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "urgent_and_low_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="Set operation: INTERSECT (distinct semantics).",
)
def urgent_and_low_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


@register(
    "rollup_lineitem_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- Spark expands ROLLUP via Expand + a grouped agg, so an EMPTY
    -- relation yields ZERO rows (no grand-total row); standard SQL /
    -- DuckDB emit the () set's row. Drop it on empty input only —
    -- every real group has COUNT(*) >= 1 (round-12 degenerate gate).
    HAVING COUNT(*) > 0
    """,
    doc="Hierarchical aggregate: ROLLUP with subtotals + grand total. "
    "The fact table is aggregated to the finest grouping FIRST and "
    "Expand runs over those few rows — decomposable measures (decimal "
    "sums, counts) re-aggregate exactly, and the 100 TB scan never "
    "pays the xN Expand row blowup.",
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("s0"),
        F.count(F.lit(1)).alias("n0"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("s0"), 2).cast("double").alias("sum_qty"),
            F.sum("n0").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "suppliers_with_returns",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
    """,
    doc="Left semi join (EXISTS): suppliers with at least one returned item.",
)
def suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_nationkey"
    )


@register(
    "all_account_parties",
    oracle="""
    SELECT party_key, ROUND(acctbal, 2) AS acctbal, kind FROM (
      SELECT c_custkey AS party_key, c_acctbal AS acctbal, 'customer' AS kind
      FROM customer
      UNION ALL
      SELECT s_suppkey, s_acctbal, 'supplier' FROM supplier
    )
    """,
    doc="UNION ALL of customers and suppliers into one party ledger.",
)
def all_account_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionAll(s)


@register(
    "urgent_not_low_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="Set operation: EXCEPT (distinct semantics).",
)
def urgent_not_low_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep rows
    # whose multiplicity in `urgent` merely exceeds that in `low`.
    return urgent.subtract(low)


@register(
    "cube_order_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(25,6))), 2)::DOUBLE AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    HAVING COUNT(*) > 0 -- align empty-input semantics with Spark's
                        -- Expand-based CUBE (see rollup_lineitem_status)
    """,
    doc="CUBE: all grouping-set combinations over priority x status, "
    "pre-aggregated to the finest grain before Expand (same "
    "decomposable-measure trick as rollup_lineitem_status).",
)
def cube_order_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("s0"),
    )
    return (
        base.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum("n0").alias("n_orders"),
            F.round(F.sum("s0"), 2).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "top10_orders_global",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k: ORDER BY + LIMIT (Spark plans TakeOrderedAndProject — "
    "per-partition top-k then a k-row merge on the driver, no full sort).",
)
def top10_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "customer_order_profile",
    oracle="""
    SELECT c.c_custkey, n.n_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(CAST(CASE WHEN isfinite(o.o_totalprice) THEN o.o_totalprice END AS DECIMAL(25,6))),
                          0), 2)::DOUBLE AS total_spend
    FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY c.c_custkey, n.n_name
    """,
    doc="Left outer join preserving order-less customers + agg over nullable side.",
)
def customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC)),
                2,
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: fact-fact join + conditional (CASE-guarded) "
    "aggregation. The date filter prunes lineitem at the scan; the "
    "join shuffles on orderkey; at scale the same bucketing as q3/q10 "
    "removes that shuffle (sources/bucketed.py).",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    WITH sums AS (
      -- rev = price(2dp) * (1 - discount(2dp)) is EXACTLY 4dp, so the
      -- 10000-scaled sum is an exact integer on both engines; the old
      -- *100 scaling left a .5 fraction that Spark truncated while
      -- DuckDB rounded.
      SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))
                 ELSE CAST(0 AS DECIMAL(25,6)) END) * 10000 AS BIGINT)
          AS promo_e4,
        CAST(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6)))
             * 10000 AS BIGINT) AS total_e4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
    ), cents AS (
      -- exact integer half-up from 4dp to cents (values are >= 0)
      SELECT (promo_e4 + 50) // 100 AS promo_cents,
             (total_e4 + 50) // 100 AS total_cents,
             promo_e4, total_e4
      FROM sums
    )
    SELECT promo_cents / 100.0 AS promo_revenue,
           total_cents / 100.0 AS total_revenue,
           -- ratio at 4dp via exact bigint half-up (see
           -- events_daily_from_hourly): decimal division diverges
           -- between engines, integer arithmetic cannot.
           ((2 * 1000000 * promo_e4 + total_e4)
            // (2 * total_e4)) / 10000.0 AS promo_pct
    FROM cents
    """,
    doc="TPC-H Q14 shape: promo revenue share — join to part, CASE-"
    "split decimal sums. rev is exactly 4dp, so the sum is scaled by "
    "10000 (not 100) before the bigint cast: the scaled sum is an exact "
    "integer on both engines and cents are derived by explicit integer "
    "half-up, making the result truly engine-independent.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    zero = F.lit(0).cast("decimal(25,6)")
    sums = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)) * 10000)
            .cast("long")
            .alias("promo_e4"),
            (F.sum(rev) * 10000).cast("long").alias("total_e4"),
        )
    )
    return (
        sums.withColumn("promo_cents", F.expr("(promo_e4 + 50) div 100"))
        .withColumn("total_cents", F.expr("(total_e4 + 50) div 100"))
        .select(
            (F.col("promo_cents") / 100.0).alias("promo_revenue"),
            (F.col("total_cents") / 100.0).alias("total_revenue"),
            (
                F.expr(
                    "(2 * 1000000 * promo_e4 + total_e4) div (2 * total_e4)"
                )
                / 10000.0
            ).alias("promo_pct"),
        )
    )


@register(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
    FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral shipping volume between two nations "
    "by year — the same dimension (nation) joined TWICE under "
    "different roles with a cross-role disjunction. Both nation joins "
    "broadcast (25 rows at any SF); the n1/n2 name filters cannot "
    "push to either scan alone (the disjunction spans roles) and "
    "evaluate post-join in codegen; the fact-fact joins shuffle on "
    "their keys.",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.withColumnRenamed("n_name", "supp_nation").alias("n1")
    n2 = n.withColumnRenamed("n_name", "cust_nation").alias("n2")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN part ON p_partkey = l_partkey
      WHERE n1.n_regionkey = 0 AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(25,6)) END)::DOUBLE
                 / SUM(volume)::DOUBLE, 4) AS mkt_share
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of ECONOMY-part revenue "
    "sold into region 0, by year — a 7-way join feeding a conditional-"
    "numerator ratio. Both ratio terms are exact decimal sums cast to "
    "double before one IEEE division, so the share is engine-exact. "
    "nation (twice), supplier and the filtered part side broadcast; "
    "the customer-region filter prunes before the orders join.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n1 = n.filter(F.col("n_regionkey") == 0).select(F.col("n_nationkey").alias("cn_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"), "inner")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(zero)
                ).cast("double")
                / F.sum(volume).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(l_shipdate) AS l_year,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))
                     - CAST(CASE WHEN isfinite(p_retailprice * l_quantity * 0.5) THEN p_retailprice * l_quantity * 0.5 END AS DECIMAL(25,6))),
                 2)::DOUBLE AS profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and year for a "
    "LIKE-selected part family (the catalog has no partsupp, so half "
    "the retail price stands in for supply cost — both factors are "
    "exact <=3dp values, so the decimal casts are engine-exact). The "
    "part LIKE filter prunes before the join; supplier and nation "
    "broadcast; one partial+final agg after the fact joins.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC) - (
        F.col("p_retailprice") * F.col("l_quantity") * 0.5
    ).cast(DEC)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice * (1 - l_discount)) THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(25,6))), 2)::DOUBLE AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive predicates across "
    "both join sides. Catalyst splits the OR into per-side filters "
    "(common-factor extraction) so each scan still prunes; the residual "
    "cross-side disjunction evaluates post-join inside codegen.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    return j.filter(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
