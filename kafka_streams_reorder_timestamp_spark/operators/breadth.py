"""Relational breadth: the remaining standard-operator categories from
SURVEY §2.2 not covered by relational.py — full outer join, GROUPING
SETS (via the engine's SQL entry path), analytic window functions
(lead/lag/ntile/percent_rank), scalar function families
(string/date/math), and multi-column distinct aggregation.

All shapes are Catalyst built-ins; scale notes per query in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import finite
from ..functions.rank import global_rank_buckets
from ..sources.catalog import load_table
from .registry import register

DEC = "decimal(25,6)"


@register(
    "nation_balance_fulljoin",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey,
             ROUND(SUM(CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END AS DECIMAL(25,6))), 2)::DOUBLE AS cust_bal,
             COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nationkey,
             ROUND(SUM(CAST(CASE WHEN isfinite(s_acctbal) THEN s_acctbal END AS DECIMAL(25,6))), 2)::DOUBLE AS supp_bal,
             COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           c.cust_bal, c.n_cust, s.supp_bal, s.n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    doc="Full outer join of two pre-aggregated sides — aggregate FIRST "
    "(25 nation keys), join tiny results; never full-table outer join.",
)
def nation_balance_fulljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.round(F.sum(F.col("c_acctbal").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("cust_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.round(F.sum(F.col("s_acctbal").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("supp_bal"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select("nationkey", "cust_bal", "n_cust", "supp_bal", "n_supp")
    )


@register(
    "grouping_sets_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           ROUND(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    HAVING COUNT(*) > 0 -- align empty-input semantics with Spark's
                        -- Expand-based grouping sets
    """,
    doc="Explicit GROUPING SETS via the engine's SQL entry path (the "
    "DataFrame and SQL APIs build the same Catalyst plan; this "
    "exercises the SQL front door). The fact scan aggregates to the "
    "finest (returnflag, linestatus) grain BEFORE the grouping-sets "
    "Expand, so Expand multiplies a handful of partial rows instead "
    "of the raw table — decomposable measures re-aggregate exactly "
    "(2x at sf0.1; the win grows with the Expand factor at scale).",
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        WITH base AS (
          SELECT l_returnflag, l_linestatus, COUNT(*) AS n0,
                 -- Spark has no isfinite(); BETWEEN ±DBL_MAX is the
                 -- same guard (NaN sorts above DBL_MAX, ±Inf outside)
                 SUM(CAST(CASE WHEN l_quantity BETWEEN -1.7976931348623157E308
                                                  AND 1.7976931348623157E308
                               THEN l_quantity END AS DECIMAL(25,6))) AS s0
          FROM lineitem_v GROUP BY 1, 2
        )
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(n0) AS BIGINT) AS n,
               CAST(ROUND(SUM(s0), 2) AS DOUBLE) AS sum_qty
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "customer_order_gaps",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ), seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LAG(o_orderdate) OVER w AS prev_date,
             LEAD(o_orderdate) OVER w AS next_date,
             CAST((4 * (rn - 1)) // n + 1 AS INT) AS price_quartile
      FROM ranked
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) AS orderdate_us,
           datediff('day', prev_date, o_orderdate) AS days_since_prev,
           datediff('day', o_orderdate, next_date) AS days_until_next,
           price_quartile
    FROM seq
    WHERE prev_date IS NOT NULL
    """,
    doc="Analytic windows: lag/lead inter-order gaps per customer + a "
    "global price quartile. The quartile comes from the DISTRIBUTED "
    "rank helper (functions/rank.py: range-partition + local "
    "row_number + broadcast offsets) — never a bare Window.orderBy, "
    "which would funnel every orders row through one task. The oracle "
    "uses the same arithmetic bucket (4*(rn-1) div n + 1) so both "
    "engines agree exactly.",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    ranked = global_rank_buckets(
        o,
        bucket_col="o_totalprice",
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        n_groups=4,
        out_col="price_quartile",
        descending=True,
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        ranked.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
            F.lead("o_orderdate").over(w).alias("next_date"),
            "price_quartile",
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            # o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the
            # cast to TIMESTAMP is value-preserving.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            F.datediff("o_orderdate", "prev_date").alias("days_since_prev"),
            F.datediff("next_date", "o_orderdate").alias("days_until_next"),
            "price_quartile",
        )
    )


@register(
    "part_scalar_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 8)) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_slug,
           ABS(p_retailprice - 1000.0) AS price_dist,
           CAST(CEIL(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
           MOD(p_partkey, 7) AS k7
    FROM part
    WHERE p_size BETWEEN 10 AND 20
    """,
    doc="Scalar function families (string/math) in one pushdown-"
    "friendly projection — every function a JVM codegen built-in.",
)
def part_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dist"),
        F.ceil(F.col("p_retailprice") / 100.0).cast("bigint").alias("price_bucket"),
        (F.col("p_partkey") % 7).alias("k7"),
    )


@register(
    "orders_date_functions",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY 1, 2, 3
    """,
    doc="Date extraction + MULTIPLE distinct aggregates in one "
    "aggregation (Catalyst plans Expand + two-phase distinct agg).",
)
def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
            F.quarter("o_orderdate").cast("int").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


@register(
    "parts_above_brand_avg",
    oracle="""
    SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS retailprice
    FROM part p
    WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) * 1.04
                           FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    doc="Correlated-scalar-subquery shape (price > 1.04x brand average; prices cluster tightly around the brand mean). "
    "Spark expresses it as a window average — identical semantics, one "
    "shuffle on the correlation key instead of a rejoin.",
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("brand_avg") * 1.04)
        .select(
            "p_partkey", "p_brand", F.round("p_retailprice", 2).alias("retailprice")
        )
    )


@register(
    "lineitem_quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(q, 0.25), 4) AS p25,
           ROUND(quantile_cont(q, 0.50), 4) AS p50,
           ROUND(quantile_cont(q, 0.90), 4) AS p90,
           ROUND(quantile_cont(q, 0.99), 4) AS p99
    -- robust-statistics contract: a NaN/Inf quantity is excluded
    -- from the order statistic (as NULL) on both engines — the
    -- engines' interpolation semantics differ once a non-finite
    -- value enters the sorted run
    FROM (SELECT l_returnflag,
                 CASE WHEN isfinite(l_quantity) THEN l_quantity END AS q
          FROM lineitem)
    GROUP BY 1
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB quantile_cont). Exact percentiles sort within groups; "
    "at 100 TB switch to approx_percentile (t-digest sketch, "
    "mergeable partials) — kept exact here for oracle comparability.",
)
def lineitem_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile(finite("l_quantity"), F.lit(q)), 4).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.90, "p90"), (0.99, "p99")]
        ]
    )


PRICE_BANDS = [
    ("economy", 0.0, 925.0),
    ("standard", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, float("inf")),
]


@register(
    "price_band_parts",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('economy', 0.0, 925.0),
             ('standard', 925.0, 950.0),
             ('premium', 950.0, 975.0),
             ('luxury', 975.0, 1e308)
    )
    SELECT b.band,
           COUNT(*) AS n_parts,
           ROUND(AVG(p.p_retailprice), 2) AS avg_price,
           ROUND(MIN(p.p_retailprice), 2) AS min_price,
           ROUND(MAX(p.p_retailprice), 2) AS max_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY 1
    """,
    doc="Range (band) join: parts matched to a literal price-band dim "
    "on a pure inequality condition. The dim is broadcast, so the "
    "physical plan is a BroadcastNestedLoopJoin over 4 rows — the ONLY "
    "sane shape for a non-equi join whose small side fits in memory; "
    "the fact side streams once, nothing shuffles until the 4-group agg.",
)
def price_band_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_retailprice")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_by_type",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
             AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             AS view
    FROM events
    GROUP BY 1
    """,
    doc="Pivot: long→wide counts per event type. The value list is "
    "declared, not discovered — an undeclared pivot needs an extra "
    "distinct-collection job and yields an SF-dependent schema, both "
    "wrong at scale. One partial+final agg shuffle.",
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@register(
    "priority_multiset_diff",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="Multiset EXCEPT ALL: keeps multiplicity (a customer with 3 "
    "urgent and 1 low order appears twice) — completes the set-op "
    "family next to UNION/INTERSECT/EXCEPT DISTINCT. One shuffle on "
    "the value.",
)
def priority_multiset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.exceptAll(low)


@register(
    "part_unpivot_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_size > 45
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part WHERE p_size > 45
    """,
    doc="Unpivot (wide→long): the inverse of pivot, a zero-shuffle "
    "Expand that emits one row per (row, measure). Filter pushed below "
    "the Expand so only matching rows widen.",
)
def part_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "top_tokens",
    oracle="""
    SELECT t AS token, COUNT(*) AS n
    FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE text IS NOT NULL
    )
    GROUP BY 1
    ORDER BY n DESC, token
    LIMIT 20
    """,
    doc="The canonical word count: explode tokens → hash agg → top-k. "
    "Partial aggregation collapses each task's token stream before the "
    "one shuffle; the final ORDER BY + LIMIT plans TakeOrderedAndProject "
    "(k-row merge, no global sort).",
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "orders_upsert_latest",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             1 AS version
      FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             cents + 1000 AS cents, 2 AS version
      FROM base WHERE o_orderkey % 100 = 0
    ), unioned AS (
      SELECT * FROM base UNION ALL SELECT * FROM updates
    ), merged AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderkey ORDER BY version DESC) AS rn
      FROM unioned
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM merged WHERE rn = 1
    GROUP BY o_orderstatus
    """,
    doc="SCD1 upsert (MERGE INTO semantics in plain DataFrame algebra): "
    "a derived update batch (every 100th order re-priced, re-statused, "
    "version 2) merges over the base table by keep-latest-version per "
    "key — union + one key-partitioned window, the engine-agnostic "
    "merge shape. At 100 TB the union's window shuffles on the "
    "(uniform) primary key; with the base stored partitioned/bucketed "
    "by that key the shuffle touches only the update partitions "
    "(sources/bucketed.py is that storage path). Money stays in exact "
    "integer cents throughout.",
)
def orders_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        cents.alias("cents"),
        F.lit(1).alias("version"),
    )
    updates = base.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("cents") + 1000).alias("cents"),
        F.lit(2).alias("version"),
    )
    win = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


@register(
    "brand_price_rank_kinds",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    doc="The full ranking-function family in one pass: row_number / "
    "rank / dense_rank / percent_rank / ntile over the SAME "
    "brand-partitioned window — ties resolved by key so every rank is "
    "deterministic. percent_rank divides two small exact integers "
    "((rank-1)/(n-1)): correctly-rounded identical doubles on both "
    "engines, rounded to 6dp for the hash. Unlike customer_order_gaps' "
    "historical global ntile, this ntile is PARTITIONED — no "
    "single-task sort at any scale.",
)
def brand_price_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "orders_scd2_history",
    oracle="""
    SELECT o_custkey,
           o_orderkey AS version_key,
           epoch_us(o_orderdate) AS valid_from_us,
           epoch_us(LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
             AS valid_to_us,
           CAST(LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             IS NULL AS INTEGER) AS is_current,
           ROUND(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(25,6)), 2)::DOUBLE AS amount
    FROM orders WHERE o_custkey < 200
    """,
    doc="SCD Type-2 history construction: each customer's orders become "
    "versioned rows with [valid_from, valid_to) ranges via lead() — "
    "valid_to = next version's start, NULL marks the current row. The "
    "slowly-changing-dimension pattern every warehouse maintains, as "
    "ONE window pass per entity partition (no self-join on "
    "date < next_date). Complements orders_upsert_latest (SCD1 — "
    "keep-latest): SCD2 keeps the full change history queryable "
    "as-of any time. Restricted to o_custkey<200 for compact checked "
    "output.",
)
def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.unix_micros(ts).alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        nxt.isNull().cast("int").alias("is_current"),
        F.round(F.col("o_totalprice").cast(DEC), 2)
        .cast("double")
        .alias("amount"),
    )


@register(
    "segment_revenue_pareto",
    oracle="""
    WITH cust AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             SUM(CAST(CASE WHEN isfinite(o.o_totalprice) THEN o.o_totalprice END AS DECIMAL(25,6))) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT seg, rev,
             SUM(rev) OVER (PARTITION BY seg
                            ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER (PARTITION BY seg) AS total,
             COUNT(*) OVER (PARTITION BY seg) AS n_cust
    FROM cust
    )
    SELECT seg,
           CAST(MIN(n_cust) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN (cum - rev) * 100 < total * 80
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_to_80pct
    FROM ranked GROUP BY seg
    """,
    doc="Pareto concentration per market segment: how many top "
    "customers cover 80% of segment revenue. A customer is in the "
    "80% head iff the cumulative revenue BEFORE them is under the "
    "threshold — compared as (cum - rev)*100 < total*80 in exact "
    "decimal (no float division, no ulp drift at the boundary). "
    "Cumulative sums are per-SEGMENT windows (no global sort); two "
    "shuffles (per-customer agg, segment window) at any scale.",
)
def segment_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    wc = (
        Window.partitionBy("seg")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("seg")
    ranked = cust.select(
        "seg",
        "rev",
        F.sum("rev").over(wc).alias("cum"),
        F.sum("rev").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_cust"),
    )
    head = F.when(
        (F.col("cum") - F.col("rev")) * 100 < F.col("total") * 80, 1
    ).otherwise(0)
    return ranked.groupBy("seg").agg(
        F.min("n_cust").cast("bigint").alias("n_customers"),
        F.sum(head).cast("bigint").alias("n_to_80pct"),
    )


@register(
    "customer_rfm_scores",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             epoch_us(MAX(o_orderdate)) AS r_us,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(round(CASE WHEN isfinite(o_totalprice)
                                      THEN o_totalprice END * 100)
                           AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM orders
      -- a NULL customer key is a failed upstream lookup, not a
      -- customer: scoring would pool all such orders into one
      -- pseudo-customer, and the engine's score-reassembly equi-join
      -- drops NULL keys anyway (round-12 degenerate gate) — exclude
      -- at the scan on both sides
      WHERE o_custkey IS NOT NULL
      GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n FROM cust)
    SELECT o_custkey,
           CAST((4 * (ROW_NUMBER() OVER (ORDER BY r_us DESC, o_custkey) - 1))
                // n.n + 1 AS INTEGER) AS r_score,
           CAST((4 * (ROW_NUMBER() OVER (ORDER BY f DESC, o_custkey) - 1))
                // n.n + 1 AS INTEGER) AS f_score,
           CAST((4 * (ROW_NUMBER() OVER (ORDER BY m_cents DESC, o_custkey) - 1))
                // n.n + 1 AS INTEGER) AS m_score
    FROM cust CROSS JOIN n
    """,
    doc="RFM (recency/frequency/monetary) quartile scoring per "
    "customer — the classic segmentation primitive, with all three "
    "global quartiles computed by the DISTRIBUTED rank "
    "(functions/rank.py: value-bucket + local row_number + offset "
    "prefix-sum), never a single-task global window sort; the oracle "
    "uses plain global ROW_NUMBER, which is fine for DuckDB but would "
    "be the classic straggler on a cluster. Quartile = "
    "(4*(rn-1)) div N + 1 — remainder spread evenly, reproducible in "
    "any ANSI engine. Monetary is exact integer cents; recency is "
    "epoch-us of the last order.",
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL custkey excluded at the scan (pushed-down IsNotNull): it is
    # not a customer, and the three-way score reassembly join below
    # would silently drop the NULL-key group while the oracle's
    # single-pass ranking kept it — see the oracle comment.
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    # Lazy persist: each of the three rank passes reads the customer
    # aggregate THREE times (bounds agg, per-bucket counts agg, main
    # branch) — chaining the passes compounded that into up to 27
    # re-executions of this subtree (round-5 plan audit); ranking the
    # three measures independently off the cache and joining the
    # (custkey, score) outputs makes it one orders scan + three
    # cached-input rank passes + two co-partitioned small joins.
    cust = (
        o.groupBy("o_custkey").agg(
            F.unix_micros(F.max(F.col("o_orderdate").cast("timestamp"))).alias(
                "r_us"
            ),
            F.count(F.lit(1)).alias("f"),
            F.sum(
                F.round(finite("o_totalprice") * 100).cast("bigint")
            ).alias("m_cents"),
        )
    ).persist()
    scored = None
    for col, out in (("r_us", "r_score"), ("f", "f_score"), ("m_cents", "m_score")):
        part = global_rank_buckets(
            cust.select("o_custkey", col),
            bucket_col=col,
            order_by=[F.col(col).desc(), F.col("o_custkey")],
            n_groups=4,
            out_col=out,
            descending=True,
        ).select("o_custkey", out)
        scored = part if scored is None else scored.join(part, "o_custkey")
    return scored.select("o_custkey", "r_score", "f_score", "m_score")


@register(
    "orders_time_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           COUNT(*) AS n_orders,
           ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(25,6))), 2)::DOUBLE AS rev
    FROM orders
    GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate),
                    month(o_orderdate))
    HAVING COUNT(*) > 0 -- align empty-input semantics with Spark's
                        -- Expand-based ROLLUP
    """,
    doc="Time-hierarchy rollup (year > quarter > month): every grain "
    "of the reporting calendar in one pass via ROLLUP — month rows, "
    "quarter subtotals, year subtotals, grand total. Spark "
    "pre-aggregates to the finest grain before Expand multiplies "
    "rows (the multidim-agg posture), so the x4 applies to ~36 "
    "month rows, not the fact scan. Exact decimal money.",
)
def orders_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            F.year(d).cast("bigint").alias("yr"),
            F.quarter(d).cast("bigint").alias("qtr"),
            F.month(d).cast("bigint").alias("mon"),
            F.col("o_totalprice").cast(DEC).alias("p"),
        )
        .rollup("yr", "qtr", "mon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("p"), 2).cast("double").alias("rev"),
        )
    )


@register(
    "dq_orders_audit",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders) AS n_rows,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL
         OR o_orderdate IS NULL OR o_custkey IS NULL) AS n_null_critical,
      (SELECT COUNT(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
        AS n_dup_pk,
      (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_custkey,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
        AS n_nonpositive_price
    """,
    doc="Data-quality audit in one row: volume, critical-column nulls, "
    "duplicate primary keys (groupBy-HAVING, one digest-keyed "
    "shuffle), referential orphans (left-anti join against the "
    "customer dim — broadcast when the dim fits, shuffle-hash "
    "otherwise), and domain violations. The contract-check stage "
    "every ingest pipeline runs before promoting a batch; each check "
    "is its own bounded aggregate and Spark unions them into one "
    "row.",
)
def dq_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n_rows = o.agg(F.count(F.lit(1)).alias("n_rows"))
    n_null = o.filter(
        F.col("o_totalprice").isNull()
        | F.col("o_orderdate").isNull()
        | F.col("o_custkey").isNull()
    ).agg(F.count(F.lit(1)).alias("n_null_critical"))
    n_dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n_dup_pk"))
    )
    n_orphan = o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_orphan_custkey"))
    n_nonpos = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count(F.lit(1)).alias("n_nonpositive_price")
    )
    return (
        n_rows.crossJoin(n_null)
        .crossJoin(n_dup)
        .crossJoin(n_orphan)
        .crossJoin(n_nonpos)
    )


@register(
    "nation_revenue_share",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name,
             ROUND(SUM(CAST(CASE WHEN isfinite(o.o_totalprice) THEN o.o_totalprice END AS DECIMAL(25,6))), 2)::DOUBLE
               AS nation_rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT r.r_name, nat.n_name, nat.nation_rev,
           ROUND(nat.nation_rev * 100 / SUM(nat.nation_rev)
                 OVER (PARTITION BY nat.n_regionkey), 4) AS region_share_pct
    FROM nat JOIN region r ON r.r_regionkey = nat.n_regionkey
    """,
    doc="Percent-of-parent: each nation's share of its region's "
    "revenue — aggregate once at nation grain (exact decimal, "
    "rounded to cents BEFORE the share division so both engines "
    "divide identical doubles), then one 25-row window computes the "
    "regional denominators; the fact table is scanned once and the "
    "share arithmetic touches only the aggregate. region/nation "
    "broadcast.",
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2)
            .cast("double")
            .alias("nation_rev")
        )
    )
    w = Window.partitionBy("n_regionkey")
    return (
        nat.join(F.broadcast(r), nat["n_regionkey"] == r["r_regionkey"])
        .select(
            "r_name",
            "n_name",
            "nation_rev",
            F.round(
                F.col("nation_rev") * 100 / F.sum("nation_rev").over(w), 4
            ).alias("region_share_pct"),
        )
    )


@register(
    "brand_market_basket",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ), totals AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY 1
    )
    SELECT p.brand_a, p.brand_b, p.n_orders,
           ROUND(p.n_orders * 1.0 / ta.n, 6) AS confidence_a_to_b
    FROM pairs p JOIN totals ta ON ta.p_brand = p.brand_a
    WHERE p.n_orders >= 10
    """,
    doc="Market-basket analysis: brand pairs co-purchased in the same "
    "order, with confidence(A->B) = P(B in order | A in order) — the "
    "association-rule primitive. Shape: ONE shuffle of (order, brand) "
    "builds per-order sorted brand baskets (collect_set dedups "
    "in-agg, basket width bounded by TPC-H's <= 7 lines/order at any "
    "SF); unordered pairs explode IN-ROW from each basket (never an "
    "orderkey self-join, which would re-shuffle the table and "
    "recompute the join subtree for the totals branch); the pair agg "
    "and the 25-row brand totals are tiny aggs over the one persisted "
    "basket table. Support >= 10 prunes the tail; counts exact, one "
    "rounded division.",
)
def brand_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, F.size(F.col("brands"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(
            F.col("pr.brand_a").alias("brand_a"),
            F.col("pr.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 10)
    )
    totals = F.broadcast(
        baskets.select(F.explode("brands").alias("brand_a"))
        .groupBy("brand_a")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    return pairs.join(totals, "brand_a").select(
        "brand_a",
        "brand_b",
        "n_orders",
        F.round(F.col("n_orders") * 1.0 / F.col("n_a"), 6).alias(
            "confidence_a_to_b"
        ),
    )


@register(
    "lineitem_returnflag_pivot",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A'
                 THEN CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6)) END), 2)::DOUBLE
             AS qty_a,
           ROUND(SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6)) END), 2)::DOUBLE
             AS qty_n,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6)) END), 2)::DOUBLE
             AS qty_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="PIVOT: quantity totals by line status with return flags spread "
    "into columns — the long-to-wide reshape surface "
    "(relational `df.groupBy().pivot().agg()`). The pivot values are "
    "DECLARED ('A','N','R'), not discovered, so no extra distinct-scan "
    "job runs and the plan is one partial+final aggregation exactly "
    "like the un-pivoted groupBy — at 100 TB pivot costs nothing over "
    "the agg; sums in exact decimal, rounded once. Oracle = the "
    "equivalent conditional aggregation.",
)
def lineitem_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(qty))
    )
    return out.select(
        "l_linestatus",
        F.round(F.col("A"), 2).cast("double").alias("qty_a"),
        F.round(F.col("N"), 2).cast("double").alias("qty_n"),
        F.round(F.col("R"), 2).cast("double").alias("qty_r"),
    )


@register(
    "customer_cohort_retention",
    oracle="""
    WITH fo AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY 1
    ), act AS (
      SELECT DISTINCT o.o_custkey, f.cohort,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
             - (year(f.cohort) * 12 + month(f.cohort)) AS month_n
      FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey
    )
    SELECT epoch_us(cohort) AS cohort_month_us,
           CAST(month_n AS BIGINT) AS month_n,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: customers grouped by first-order "
    "month, counted as active in each later month — the "
    "(cohort x months-since) retention triangle behind every growth "
    "dashboard. Month offsets are exact integer arithmetic "
    "(year*12+month), so the matrix is engine-independent. Shape: one "
    "min-agg per customer, one co-partitioned join back onto orders "
    "(both sides hash on o_custkey — single shuffle each), one "
    "distinct + count. No window functions, no skew (custkey is "
    "uniform).",
)
def customer_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    fo = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cidx = F.year("cohort") * 12 + F.month("cohort")
    act = (
        o.join(fo, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            (midx - cidx).cast("long").alias("month_n"),
        )
        .distinct()
    )
    return act.groupBy(
        F.unix_micros(F.col("cohort").cast("timestamp")).alias("cohort_month_us"),
        "month_n",
    ).agg(F.count(F.lit(1)).alias("n_active"))


@register(
    "lineitem_measures_unpivot",
    oracle="""
    WITH agg AS (
      SELECT ROUND(SUM(CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(25,6))), 2) AS l_quantity,
             ROUND(SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(25,6))), 2)
               AS l_extendedprice,
             ROUND(SUM(CAST(CASE WHEN isfinite(l_discount) THEN l_discount END AS DECIMAL(25,6))), 2) AS l_discount
      FROM lineitem
    )
    SELECT 'l_quantity' AS measure, l_quantity::DOUBLE AS total FROM agg
    UNION ALL
    SELECT 'l_extendedprice', l_extendedprice::DOUBLE FROM agg
    UNION ALL
    SELECT 'l_discount', l_discount::DOUBLE FROM agg
    """,
    doc="UNPIVOT (melt): per-measure totals reshaped wide-to-long — the "
    "inverse of lineitem_returnflag_pivot, completing the reshape "
    "surface (relational `df.unpivot`). Scale shape: aggregate FIRST "
    "(one decimal-exact partial+final agg over the fact scan), then "
    "unpivot the ONE-ROW result — the Expand multiplication applies "
    "to one row, not the corpus; unpivoting the raw table before "
    "aggregating would push 3x the rows through the shuffle for the "
    "same answer. Oracle = UNION ALL of the three aggregates.",
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        *[
            F.round(F.sum(F.col(c).cast(DEC)), 2).alias(c)
            for c in ("l_quantity", "l_extendedprice", "l_discount")
        ]
    )
    return agg.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount"], "measure", "total"
    ).select("measure", F.col("total").cast("double").alias("total"))


@register(
    "join_key_skew_report",
    oracle="""
    WITH li AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ), ev AS (
      SELECT user_id AS k, COUNT(*) AS c FROM events
      WHERE user_id IS NOT NULL GROUP BY 1
    ), stats AS (
      SELECT 'lineitem.l_orderkey' AS join_key,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_rows,
             ROUND(MEDIAN(c), 1) AS median_rows
      FROM li
      UNION ALL
      SELECT 'events.user_id', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(c) AS BIGINT), CAST(MAX(c) AS BIGINT),
             ROUND(MEDIAN(c), 1)
      FROM ev
    )
    SELECT join_key, n_keys, n_rows, max_rows, median_rows,
           ROUND(max_rows * 1.0 / median_rows, 2) AS skew_factor
    FROM stats
    """,
    doc="Join-key skew diagnostic — the report an operator reads "
    "BEFORE choosing a salting/AQE strategy for a 100 TB join: per "
    "candidate key, the cardinality, total rows, hottest-key row "
    "count, median-key row count, and their ratio (skew_factor; ~1 = "
    "uniform, >>1 = a straggler task in any hash-partitioned join on "
    "that key). Shape: one partial-agg shuffle per key column (counts "
    "combine map-side), then a handful of per-key-table rows reduce "
    "to one stats row each — MEDIAN over key counts is per-group "
    "bounded, never over raw rows (reported interpolated, rounded "
    "to 1 dp — a CAST would round half-values engine-differently). "
    "The blocked-Jaccard salt "
    "(dedup.py) and AQE skew-join this report motivates are both "
    "already in the engine; this closes the observe->decide loop.",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(df: DataFrame, key: str, label: str) -> DataFrame:
        counts = (
            df.filter(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return counts.agg(
            F.lit(label).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_rows"),
            F.round(F.expr("median(c)"), 1).alias("median_rows"),
        )

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    e = load_table(spark, sf_dir, "events").select("user_id")
    out = stats(l, "l_orderkey", "lineitem.l_orderkey").unionByName(
        stats(e, "user_id", "events.user_id")
    )
    return out.select(
        "join_key",
        "n_keys",
        "n_rows",
        "max_rows",
        "median_rows",
        F.round(F.col("max_rows") * 1.0 / F.col("median_rows"), 2).alias(
            "skew_factor"
        ),
    )


def _interleave8_sql(a: str, b: str) -> str:
    """16-bit Morton (z-order) code from two 8-bit inputs, as portable
    integer SQL (same text runs in Spark SQL and DuckDB)."""
    terms = []
    for i in range(8):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZORDER_ORACLE = f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms FROM lineitem
    ), coded AS (
      SELECT l_partkey, l_suppkey,
             {_interleave8_sql(
                 "((l_partkey * 256) // (mp + 1))",
                 "((l_suppkey * 256) // (ms + 1))",
             )} AS z
      FROM lineitem, mx
    )
    SELECT CAST(z >> 11 AS BIGINT) AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_partkey,
           CAST(MAX(l_partkey) AS BIGINT) AS max_partkey,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_suppkey,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_suppkey
    FROM coded GROUP BY 1
"""


@register(
    "lineitem_zorder_zonemap",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton-curve) zone maps over (l_partkey, l_suppkey) "
    "— the data-layout move behind multi-column data skipping: scale "
    "both keys to an 8-bit grid (integer div by the data max — no "
    "float boundaries), interleave bits into a 16-bit z-code, and "
    "bucket rows by the top 5 z bits into 32 zones. The output IS the "
    "zone map a writer would persist per file: within every zone BOTH "
    "columns' min/max spans are ~1/sqrt(32) of the global range (a "
    "single-column sort bounds one and leaves the other unbounded), "
    "so point/range predicates on EITHER key prune most zones at "
    "scan planning time. Shape: the two maxes are one 1-row agg "
    "broadcast back; the z-code is pure per-row integer arithmetic "
    "(the same generated SQL text runs on both engines); one "
    "partial-agg shuffle of 32 groups. At 100 TB this SELECT becomes "
    "repartitionByRange(z)+sortWithinPartitions(z) at write time; "
    "the zone stats come free from parquet footers.",
)
def lineitem_zorder_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = l.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    )
    z = F.expr(
        _interleave8_sql(
            "((l_partkey * 256) div (mp + 1))",
            "((l_suppkey * 256) div (ms + 1))",
        )
    )
    return (
        l.crossJoin(F.broadcast(mx))
        .select("l_partkey", "l_suppkey", z.alias("z"))
        .groupBy(F.expr("z >> 11").cast("long").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").cast("long").alias("min_partkey"),
            F.max("l_partkey").cast("long").alias("max_partkey"),
            F.min("l_suppkey").cast("long").alias("min_suppkey"),
            F.max("l_suppkey").cast("long").alias("max_suppkey"),
        )
    )


@register(
    "source_drift_psi",
    oracle="""
    WITH binned AS (
      SELECT source,
             LEAST(CAST(n_chars // 200 AS BIGINT), 9) AS bin
      FROM documents WHERE n_chars IS NOT NULL
    ), per_source AS (
      SELECT source, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
    ), totals AS (
      SELECT source, SUM(c) AS n FROM per_source GROUP BY 1
    ), global_bins AS (
      SELECT bin, SUM(c) AS gc FROM per_source GROUP BY 1
    ), gtotal AS (
      SELECT SUM(gc) AS gn FROM global_bins
    ), terms AS (
      SELECT p.source,
             ((p.c + 0.5) / (t.n + 5.0)
              - (g.gc + 0.5) / (gt.gn + 5.0))
             * ln(((p.c + 0.5) / (t.n + 5.0))
                  / ((g.gc + 0.5) / (gt.gn + 5.0))) AS term
      FROM per_source p
      JOIN totals t USING (source)
      JOIN global_bins g USING (bin)
      CROSS JOIN gtotal gt
    )
    SELECT source, ROUND(SUM(term), 6) AS psi
    FROM terms GROUP BY source
    """,
    doc="Population Stability Index of the document-length "
    "distribution per source vs the whole corpus — the standard "
    "ingestion drift monitor (PSI < 0.1 stable, > 0.25 shifted): a "
    "new crawl whose length profile diverges from the corpus shows "
    "up as a high-PSI source before any model ever trains on it. "
    "Ten fixed 200-char bins capped at 2000 (deterministic, no "
    "data-dependent quantiles), add-half smoothing on BOTH sides so "
    "empty bins contribute finite terms identically in each engine. "
    "Shape: one partial-agg shuffle to (source, bin) counts "
    "(bounded: sources x 10 rows), then all joins run on that tiny "
    "table — the corpus is scanned once, and at 100 TB the drift "
    "report costs one aggregation regardless of corpus size.",
)
def source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    binned = d.select(
        "source",
        F.least(F.floor(F.col("n_chars") / 200), F.lit(9))
        .cast("long")
        .alias("bin"),
    )
    per_source = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = per_source.groupBy("source").agg(F.sum("c").alias("n"))
    global_bins = per_source.groupBy("bin").agg(F.sum("c").alias("gc"))
    gtotal = global_bins.agg(F.sum("gc").alias("gn"))
    p_frac = (F.col("c") + 0.5) / (F.col("n") + 5.0)
    g_frac = (F.col("gc") + 0.5) / (F.col("gn") + 5.0)
    term = (p_frac - g_frac) * F.log(p_frac / g_frac)
    return (
        per_source.join(F.broadcast(totals), "source")
        .join(F.broadcast(global_bins), "bin")
        .crossJoin(F.broadcast(gtotal))
        .select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


@register(
    "docs_k_anonymity_audit",
    oracle="""
    WITH quasi AS (
      SELECT lang, source,
             CAST(n_chars // 100 AS BIGINT) AS size_bucket,
             COUNT(*) AS group_n
      FROM documents
      GROUP BY 1, 2, 3
    )
    SELECT lang, source, size_bucket, CAST(group_n AS BIGINT) AS group_n
    FROM quasi WHERE group_n < 5
    """,
    doc="k-anonymity audit over the quasi-identifier tuple (lang, "
    "source, 100-char size bucket): every combination matched by "
    "FEWER than k=5 documents is a re-identification risk — metadata "
    "alone pins those docs down, the check privacy review runs "
    "before releasing corpus metadata alongside redacted text "
    "(docs_pii_redaction handles the text side; this handles the "
    "metadata side). One partial-agg shuffle over the quasi key; "
    "output is only the violating groups, so result size is the risk "
    "surface, not the corpus.",
)
def docs_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / 100).cast("long").alias("size_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_n"))
        .filter(F.col("group_n") < 5)
    )


@register(
    "brand_discount_elasticity",
    oracle="""
    WITH sums AS (
      SELECT p.p_brand,
             COUNT(*) AS n,
             CAST(SUM(CAST(CASE WHEN isfinite(l.l_discount) THEN l.l_discount END AS DECIMAL(18,6))) AS DOUBLE)
               AS sx,
             CAST(SUM(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(18,6))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(CASE WHEN isfinite(l.l_discount) THEN l.l_discount END AS DECIMAL(18,6))
                      * CAST(CASE WHEN isfinite(l.l_discount) THEN l.l_discount END AS DECIMAL(18,6))) AS DOUBLE)
               AS sxx,
             CAST(SUM(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(18,6))
                      * CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(18,6))) AS DOUBLE)
               AS syy,
             CAST(SUM(CAST(CASE WHEN isfinite(l.l_discount) THEN l.l_discount END AS DECIMAL(18,6))
                      * CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(18,6))) AS DOUBLE)
               AS sxy
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS pearson_r
    FROM sums
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="In-engine OLS: per-brand regression of quantity on discount "
    "(slope + Pearson r) computed from the five SUFFICIENT STATISTICS "
    "(n, Sx, Sy, Sxx, Syy, Sxy) — the closed form that makes linear "
    "regression a ONE-PASS partial aggregation at any scale, no "
    "iterative solver, no second pass for means. The sums accumulate "
    "in DECIMAL (exact, order-independent) and only the final "
    "slope/r arithmetic runs in doubles over those exact sums, so "
    "both engines agree bit-for-bit despite float addition being "
    "non-associative — the same discipline as the engine's revenue "
    "aggregates. Built-ins like corr()/regr_slope() exist in both "
    "engines but accumulate in floats with engine-specific order; "
    "this formulation is the portable exact one.",
)
def brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.col("l_discount").cast("decimal(18,6)")
    y = F.col("l_quantity").cast("decimal(18,6)")
    sums = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.filter((varx > 0) & (vary > 0))
        .select(
            "p_brand",
            n.cast("long").alias("n_lines"),
            F.round(cov / varx, 6).alias("slope"),
            F.round(cov / F.sqrt(varx * vary), 6).alias("pearson_r"),
        )
    )


@register(
    "customer_decile_transitions",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS custkey,
             CASE WHEN o_orderdate < DATE '1997-01-01' THEN 'p1'
                  ELSE 'p2' END AS period,
             SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,2))) AS s
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1, 2
    ), ranked AS (
      SELECT custkey, period,
             ROW_NUMBER() OVER (
               PARTITION BY period ORDER BY s, custkey) AS rn,
             COUNT(*) OVER (PARTITION BY period) AS n
      -- a NULL spend (every order in the period non-finite) is not
      -- rankable — and the engines disagree on NULL sort position
      -- (Spark NULLS FIRST asc, DuckDB NULLS LAST) — exclude
      FROM spend WHERE s IS NOT NULL
    ), bucketed AS (
      SELECT custkey, period,
             CAST((10 * (rn - 1)) // n + 1 AS INT) AS decile
      FROM ranked
    )
    SELECT a.decile AS decile_p1, b.decile AS decile_p2,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM bucketed a JOIN bucketed b
      ON a.custkey = b.custkey AND a.period = 'p1' AND b.period = 'p2'
    GROUP BY 1, 2
    """,
    doc="Customer spend-decile TRANSITION MATRIX between 1996 and "
    "1997: where did each decile's customers migrate — the retention/"
    "value-migration readout every CRM runs. Deciles use the "
    "arithmetic equal-count rule ((10*(rn-1)) div n + 1, "
    "functions/rank.py's formula) rather than ntile(), because the "
    "arithmetic form is reproducible in any ANSI engine from (rn, n) "
    "alone; ranks order by (spend, custkey) — DECIMAL spend, total "
    "order, engine-stable. Shape: one orders scan reduces to "
    "(customer, period) spend; per-period ranking routes through the "
    "distributed value-bucket rank in the Spark plan (the oracle's "
    "bare window is sf-bounded); the self-join on custkey matches "
    "two ~customer-count tables; output is the 10x10 matrix.",
)
def customer_decile_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rank import global_rank_buckets

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    spend = (
        o.withColumn(
            "period",
            F.when(F.col("o_orderdate") < "1997-01-01", "p1").otherwise("p2"),
        )
        .groupBy(F.col("o_custkey").alias("custkey"), "period")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .filter(F.col("s").isNotNull())
        .withColumn("sd", F.col("s").cast("double"))
    )
    def deciles(period: str):
        part = spend.filter(F.col("period") == period)
        return global_rank_buckets(
            part, "sd", [F.col("sd"), F.col("custkey")], n_groups=10,
            out_col="decile",
        ).select("custkey", F.col("decile").alias(f"decile_{period}"))

    return (
        deciles("p1")
        .join(deciles("p2"), "custkey")
        .groupBy("decile_p1", "decile_p2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
