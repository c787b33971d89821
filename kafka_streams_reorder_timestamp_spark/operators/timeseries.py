"""Time-series operators: gap filling with LOCF, interval range frames,
first/last frames, ordered path arrays, and an explicit salted join —
the resample/rollup surface a metrics or training-telemetry pipeline
needs on top of the relational core.

Reference tie-in: the reference's only time-series behavior is
event-time resequencing (Application.java:72-83); everything here is
the mandated extension surface (SURVEY §2.2) expressed as pure
Catalyst plans.

Design for 100 TB:
  - gap filling generates the dense time axis FROM THE GROUP BOUNDS
    (one row per (group, step)) instead of cross-joining a calendar
    table against the fact table; the series explode is proportional
    to output size, not input size;
  - LOCF is `last(value, ignorenulls=True)` over an ordered window —
    one shuffle on the series key, no self-join, no Python;
  - the trailing-interval sum uses a RANGE frame over epoch seconds —
    Spark evaluates it in one pass per partition (no point-interval
    self-join blowup);
  - the salted join spreads hot keys over `salt` sub-keys; result
    equality with the unsalted plan is oracle-checked here.

Timestamp parity with DuckDB: all emitted timestamps are epoch-µs
BIGINT (`unix_micros` / `epoch_us`), the repo-wide convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import finite
from ..functions.skew import salted_join
from ..sources.catalog import load_table
from .registry import register

DEC = "decimal(25,6)"


@register(
    "events_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
    ), axis AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT a.event_type, epoch_us(a.h) AS hour_us,
           COALESCE(hy.n, 0) AS n_events,
           CAST(hy.n IS NULL AS INTEGER) AS is_gap,
           last_value(hy.n IGNORE NULLS) OVER (
             PARTITION BY a.event_type ORDER BY a.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_locf
    FROM axis a LEFT JOIN hourly hy
      ON hy.event_type = a.event_type AND hy.h = a.h
    """,
    doc="Resample-to-hourly with gap filling: build the dense hour axis "
    "per event type from the group's own [min,max] bounds (sequence + "
    "explode — output-sized, never a calendar cross join), left-join "
    "the real hourly counts, and forward-fill missing hours with LOCF "
    "(`last(n) ignore nulls` over an ordered window). The whole plan "
    "is two shuffles (hourly agg, series join) + one window pass; "
    "gaps are flagged so downstream quality checks can count them.",
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    axis = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        axis.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.unix_micros("h").alias("hour_us"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().cast("int").alias("is_gap"),
            F.last("n", ignorenulls=True).over(w).alias("n_locf"),
        )
    )


@register(
    "orders_trailing_90d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(25,6))) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 1000000
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS trailing_90d
    FROM orders WHERE o_custkey < 300
    """,
    doc="Trailing-interval aggregate: per customer, the 90-day rolling "
    "spend via a RANGE frame over epoch seconds — the moving-window "
    "rollup a metrics store computes, in ONE window pass per customer "
    "partition (a point-vs-interval self-join would be O(n·k) rows; "
    "the frame is O(n)). Peers with equal timestamps fall in the same "
    "frame on both engines, and the sum runs in exact decimal, so the "
    "cross-engine hash is stable. Restricted to custkey<300 to keep "
    "the checked output compact.",
)
def orders_trailing_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    # Exact integer epoch-seconds ordering: a double seconds axis has
    # ~16 significant digits at 2020-era epochs — right at the ulp
    # cliff where two engines could disagree on frame boundaries.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 1000000"
            )
        )
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("trailing_90d"),
    )


@register(
    "customer_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           last_value(o_orderkey) OVER w AS last_order,
           COUNT(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value / nth_value / last_value over an unbounded frame: "
    "the customer-journey endpoints (first order, second order, most "
    "recent order) in one window pass + distinct — the navigational "
    "frame surface (SURVEY §2.2 window-functions row) beyond "
    "rank/lag. Deterministic tie-break on (date, key) keeps both "
    "engines' frames identical.",
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    ).distinct()


@register(
    "user_event_paths",
    oracle="""
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id, event_type)
             AS path,
           COUNT(*) AS n_events
    FROM events WHERE user_id < 50
    GROUP BY user_id
    """,
    doc="Ordered event paths: per user, the chronological sequence of "
    "event types as one '>'-joined string — the session-path/journey "
    "representation sequence models train on. Spark has no ordered "
    "string aggregate, so the plan collects (ts, event_id, type) "
    "structs, array_sorts by the struct's lexicographic order (= the "
    "oracle's ORDER BY), projects the type and joins — one "
    "partial-agg shuffle on user_id, no window, no Python. Emitted as "
    "a string (not array<string>) because the driver's canonicalizer "
    "cannot hash array cells. Restricted to user_id<50 to keep "
    "checked output compact.",
)
def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_agg(
                F.struct("ts", "event_id", "event_type")
            ).alias("raw"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.array_join(
                F.transform(F.array_sort("raw"), lambda s: s["event_type"]),
                ">",
            ).alias("path"),
            "n_events",
        )
    )


@register(
    "skew_salted_user_tiers",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT user_id, user_id % 7 AS tier FROM events
    )
    SELECT d.tier, COUNT(*) AS n_events,
           ROUND(SUM(CAST(CASE WHEN isfinite(e.value) THEN e.value END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_value
    FROM events e JOIN dim d ON d.user_id = e.user_id
    GROUP BY d.tier
    """,
    doc="Explicit salted join (functions/skew.py): the fact side's hot "
    "keys are spread over 16 salt sub-keys, the dim side replicated "
    "16x, joined on (key, salt) — the de-skew pattern for joins AQE "
    "cannot fix (broadcast-ineligible dim, one key with double-digit "
    "row share). The oracle is the UNSALTED join: hash-equality "
    "proves the salt never changes results, only the partition "
    "layout. Aggregated to tier level so the checked output is tiny.",
)
def skew_salted_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.col("user_id") % 7)
    )
    joined = salted_join(ev, dim, on=["user_id"], salt=16)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast(DEC)), 2)
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "user_value_ema",
    oracle="""
    WITH ordered AS (
      SELECT user_id, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS k
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(CAST(round(CASE WHEN isfinite(value)
                                     THEN value END * 100) AS BIGINT)
                     * CAST(POW(2, 20 - k) AS BIGINT))
                 / (100.0 * 1048576), 6) AS ema_value,
           COUNT(*) AS n_used
    FROM ordered WHERE k <= 20 AND user_id < 200
    GROUP BY user_id
    """,
    doc="Exponential moving average (alpha=1/2) over each user's last "
    "20 events — the smoothing/trend primitive. EMA looks inherently "
    "sequential, but with alpha=1/2 the weights are powers of two, so "
    "the weighted sum runs in EXACT BIGINT (cents x 2^(20-k)) — "
    "order-independent, partitioning-independent, and bit-identical "
    "across engines; only the final single division returns to "
    "doubles. One ranking window + one partial agg, no sequential "
    "state. Restricted to user_id<200 for compact checked output.",
)
def user_value_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.withColumn("k", F.row_number().over(w)).filter(F.col("k") <= 20)
    cents = F.round(finite("value") * 100).cast("bigint")
    weight = F.pow(F.lit(2), F.lit(20) - F.col("k")).cast("bigint")
    return ranked.groupBy("user_id").agg(
        F.round(
            F.sum(cents * weight) / F.lit(100.0 * 1048576), 6
        ).alias("ema_value"),
        F.count(F.lit(1)).alias("n_used"),
    )


@register(
    "rolling_7d_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ), contrib AS (
      SELECT user_id,
             unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
               AS win_day
      FROM du
    ), days AS (
      SELECT DISTINCT date_trunc('day', ts) AS win_day FROM events
    )
    SELECT epoch_us(c.win_day) AS day_us,
           COUNT(DISTINCT c.user_id) AS active_users_7d
    FROM contrib c JOIN days USING (win_day)
    GROUP BY 1
    """,
    doc="Rolling 7-day distinct active users per day — the DAU/WAU "
    "retention metric. COUNT(DISTINCT) over a sliding window has no "
    "direct window-function form, so each (day, user) observation is "
    "EXPLODED into the 7 window-end days it contributes to and the "
    "count-distinct runs per day — a 7x multiplication of the tiny "
    "distinct (day,user) table, never of raw events (the same "
    "contribute-explode trick streaming sliding windows use). "
    "Restricted to days that actually occur (join with the observed "
    "day set) so leading partial windows match the oracle exactly. "
    "Two shuffles: the (day,user) distinct and the final per-day "
    "distinct agg.",
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(
                "d",
                F.col("d") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("win_day"),
    )
    days = ev.select(F.date_trunc("day", "ts").alias("win_day")).distinct()
    return (
        contrib.join(days, "win_day")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(
            F.unix_micros("win_day").alias("day_us"), "active_users_7d"
        )
    )


@register(
    "orders_backlog_monthly",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             date_trunc('month', o.o_orderdate) AS open_m,
             date_trunc('month', MAX(l.l_shipdate)) AS close_m
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT open_m AS m, 1 AS d FROM spans
      UNION ALL
      SELECT close_m, -1 FROM spans
    ), monthly AS (
      SELECT m, SUM(d) AS delta FROM deltas GROUP BY 1
    )
    SELECT strftime(m, '%Y-%m') AS month,
           CAST(SUM(delta) AS BIGINT) AS net_change,
           CAST(SUM(SUM(delta)) OVER (ORDER BY m) AS BIGINT) AS backlog
    FROM monthly GROUP BY m
    """,
    doc="Open-order backlog over time by DIFFERENCE ARRAY — the "
    "interval-stabbing shape that scales: each order contributes "
    "exactly two delta rows (+1 at its open month, -1 at the month "
    "its last lineitem is received) instead of one row per month it "
    "spans, so the expansion is O(orders), never O(orders x "
    "lifetime). An order counts in [open month, close month); the "
    "running sum over the ~84-month delta table turns deltas into "
    "levels. Shape: one join+agg shuffle to per-order spans (the "
    "only corpus-sized work), a tiny month-keyed agg, and the "
    "cumulative window runs over the bounded month axis — the "
    "classic reduce-THEN-window pattern that keeps the global "
    "ordered window off raw data at any SF.",
)
def orders_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    spans = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.first(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "open_m"
            ),
            F.date_trunc("month", F.max("l_shipdate")).alias("close_m"),
        )
    )
    deltas = spans.select(
        F.col("open_m").alias("m"), F.lit(1).alias("d")
    ).unionAll(spans.select(F.col("close_m").alias("m"), F.lit(-1).alias("d")))
    monthly = deltas.groupBy("m").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        F.col("delta").cast("long").alias("net_change"),
        F.sum("delta").over(w).cast("long").alias("backlog"),
    )


# z-normalized spike template for events_pattern_similarity: a flat
# baseline with a 3-hour burst. Normalized in Python once so both
# engines compare against identical literals.
_PATTERN_RAW = [0.0, 0.0, 1.0, 3.0, 1.0, 0.0, 0.0, 0.0]


def _znorm(xs: list[float]) -> list[float]:
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / len(xs)
    s = var ** 0.5
    return [(x - m) / s for x in xs]


_PATTERN_Z = _znorm(_PATTERN_RAW)


@register(
    "events_pattern_similarity",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ), windows AS (
      SELECT h,
             list(CAST(cnt AS DOUBLE)) OVER (
               ORDER BY h ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING
             ) AS w
      FROM hourly
    ), sized AS (
      SELECT h, w,
             list_sum(w) / 8 AS m,
             list_sum(list_transform(w, x -> x * x)) / 8 AS m2
      FROM windows WHERE len(w) = 8
    ), scored AS (
      SELECT h,
             ROUND(sqrt(list_sum(list_transform(
               list_zip(w, {list(_PATTERN_Z)}),
               p -> ((p[1] - m) / sqrt(m2 - m * m) - p[2])
                    * ((p[1] - m) / sqrt(m2 - m * m) - p[2])
             ))), 4) AS dist
      FROM sized WHERE m2 - m * m > 0
    )
    SELECT strftime(h, '%Y-%m-%d %H') AS window_start, dist
    FROM scored ORDER BY dist, h LIMIT 10
    """,
    doc="Time-series subsequence similarity search (the UCR/Matrix-"
    "Profile z-normalized Euclidean primitive, EDBT'19 streaming-"
    "similarity family): every 8-hour sliding window of the hourly "
    "event-count series scores against a fixed spike template — both "
    "z-normalized, so the match is SHAPE, invariant to level and "
    "amplitude — and the 10 best windows return. The template is "
    "normalized ONCE in Python and embedded as literals, so both "
    "engines fold identical 8-element sums left-to-right (bit-stable "
    "rounding at 4 dp). Shape: the raw table reduces to hourly "
    "counts first (one partial-agg shuffle); windows build over the "
    "REDUCED series via a frame collect, flat windows (zero "
    "variance) drop before the sqrt, TakeOrderedAndProject picks the "
    "top 10. At 100 TB the series length is hours-not-rows — the "
    "window pass is bounded however big events gets; per-key "
    "(user/type) variants just add the key to both groupings.",
)
def events_pattern_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    win = Window.orderBy("h").rowsBetween(0, 7)
    windows = hourly.select(
        "h", F.collect_list("cnt").over(win).alias("w")
    ).filter(F.size("w") == 8)
    pat = F.array(*[F.lit(p) for p in _PATTERN_Z])
    m = F.expr("aggregate(w, 0D, (a, x) -> a + x)") / 8
    m2 = F.expr("aggregate(w, 0D, (a, x) -> a + x * x)") / 8
    sized = windows.select("h", "w", m.alias("m"), m2.alias("m2")).filter(
        F.col("m2") - F.col("m") * F.col("m") > 0
    )
    s = F.sqrt(F.col("m2") - F.col("m") * F.col("m"))
    diff = F.zip_with(
        F.col("w"), pat, lambda x, p: ((x - F.col("m")) / s - p) ** 2
    )
    dist = F.round(
        F.sqrt(F.expr("aggregate(_diff, 0D, (a, x) -> a + x)")), 4
    )
    return (
        sized.withColumn("_diff", diff)
        .select(
            F.date_format("h", "yyyy-MM-dd HH").alias("window_start"),
            dist.alias("dist"),
            F.col("h"),
        )
        .orderBy("dist", "h")
        .limit(10)
        .drop("h")
    )


@register(
    "orders_rolling_median_daily",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, COUNT(*) AS c
      FROM orders GROUP BY 1
    ), framed AS (
      SELECT d, c,
             list(c) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
             ) AS w
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(c AS BIGINT) AS n_orders,
           CAST(list_sort(w)[(len(w) + 1) // 2] AS BIGINT)
             AS rolling_median7
    FROM framed WHERE len(w) = 7
    """,
    doc="Exact rolling 7-day MEDIAN of daily order counts — the "
    "robust-baseline smoother (median ignores single-day spikes that "
    "drag a rolling mean; the pair of this query and "
    "orders_trailing_90d_spend covers both frame families). No "
    "native windowed-median exists in either engine, so the frame "
    "collects its 7 values and takes the lower middle of the sorted "
    "array in-row — integer counts, zero float drift. Shape: the "
    "orders table reduces to ~2400 daily rows FIRST; the ordered "
    "frame walks that bounded axis (reduce-then-window, like "
    "orders_backlog_monthly), each row carrying a constant 7-element "
    "array — never a per-row sort of raw data.",
)
def orders_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    framed = daily.select(
        "d", "c", F.collect_list("c").over(w).alias("w")
    ).filter(F.size("w") == 7)
    med = F.element_at(
        F.sort_array("w"), ((F.size("w") + 1) / 2).cast("int")
    )
    return framed.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("long").alias("n_orders"),
        med.cast("long").alias("rolling_median7"),
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, d, c,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             SUM(c) OVER (PARTITION BY event_type) AS total
      FROM daily
    ), cs AS (
      SELECT event_type, d, n_days, total,
             SUM(n_days * c - total) OVER (
               PARTITION BY event_type ORDER BY d) AS cusum
      FROM tot
    ), pk AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ABS(cusum) DESC, d) AS rn
      FROM cs
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT) AS total_events,
           strftime(d, '%Y-%m-%d') AS peak_day,
           CAST(cusum AS BIGINT) AS peak_cusum
    FROM pk WHERE rn = 1
    """,
    doc="CUSUM changepoint detection on daily event volume, per type: "
    "the cumulative sum of deviations from the series mean peaks (in "
    "absolute value) at the most likely level-shift point — the "
    "classic offline changepoint locator, complementing "
    "events_hourly_anomalies (point outliers) and source_drift_psi "
    "(distribution drift) in the monitoring family. INTEGER-EXACT by "
    "scaling: deviation = n_days * count - total (all bigint, sums "
    "to zero over the series), so the running sum needs no float "
    "mean and both engines agree bit-for-bit; ties on |CUSUM| break "
    "to the earliest day. Shape: reduce-then-window — events "
    "collapse to ~30 daily rows per type FIRST, every window walks "
    "that bounded axis (one shuffle on event_type), and the argmax "
    "is a row_number filter, never a global sort of raw data.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    part = Window.partitionBy("event_type")
    tot = daily.select(
        "event_type",
        "d",
        "c",
        F.count(F.lit(1)).over(part).alias("n_days"),
        F.sum("c").over(part).alias("total"),
    )
    ordered = Window.partitionBy("event_type").orderBy("d")
    cs = tot.select(
        "event_type",
        "d",
        "n_days",
        "total",
        F.sum(F.col("n_days") * F.col("c") - F.col("total"))
        .over(ordered)
        .alias("cusum"),
    )
    peak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("d").asc()
    )
    return (
        cs.withColumn("rn", F.row_number().over(peak))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("total").cast("long").alias("total_events"),
            F.date_format("d", "yyyy-MM-dd").alias("peak_day"),
            F.col("cusum").cast("long").alias("peak_cusum"),
        )
    )
