"""Registry queries over the `events` table — the reorder operator's
driver-checkable surface plus event-time analytics.

The reference's only operator is the event-time re-sequencer
(reference: src/main/java/org/example/Application.java:86-94 ingest,
72-83 ordered flush). `reorder_events` runs its batch form over the
driver's events table with a DuckDB oracle, so the core semantics
(first-arrival dedup on event timestamp + chronological emission) get a
per-round correctness row, not just a pytest.

Timestamp parity: Spark timestamps are epoch-µs; the DuckDB views read
the same parquet as TIMESTAMP(NANOS). Both sides emit `epoch_us` BIGINT
so the driver's value-hash compares integers, never tz-rendered strings.

Scale notes (100 TB posture):
  - reorder_events: dedup is one shuffle on ts (high-cardinality key, no
    skew); ordered emission range-partitions on the same column. AQE
    coalesces both.
  - hourly rollup: map-side partial agg on (hour, type) — tiny group
    cardinality, one shuffle of partial aggregates only.
  - user sessionization: one shuffle on user_id; the session walk is a
    window lag/cumsum, all JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import finite, is_finite
from ..sources.catalog import load_table
from .dedup import _audit_bucket_sql
from .registry import register
from .reorder import reorder_batch


@register(
    "reorder_events",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    WHERE ts IS NOT NULL
    QUALIFY ROW_NUMBER() OVER (PARTITION BY ts ORDER BY event_id) = 1
    ORDER BY ts
    """,
    doc="The reference's reorder semantics (batch): first-arrival dedup "
    "on event timestamp + chronological order (Application.java:86-94,72-83).",
)
def reorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = reorder_batch(ev, ts_col="ts", arrival_col="event_id")
    return out.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


@register(
    "events_hourly_by_type",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time rollup per event type (the batch "
    "analog of a streaming windowed aggregation) + distinct agg.",
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@register(
    "user_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: 30-min inactivity gap via lag + running sum "
    "(the batch analog of session_window); one shuffle on user_id.",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = 30 * 60 * 1_000_000
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    return (
        marked.withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


@register(
    "event_type_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Per-user event-type transition matrix (lag window + agg).",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_daily_from_hourly",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(date_trunc('day', ts)) AS day_us,
             event_type,
             COUNT(*) AS n,
             SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(25,6))) AS sum_exact,
             CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(25,6))) * 1000000 AS BIGINT)
               AS sum_micros
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT day_us, event_type, n AS n_events,
           ROUND(sum_exact, 2)::DOUBLE AS sum_value,
           -- avg at 4dp via exact integer half-up rounding: decimal/int
           -- division is DOUBLE in DuckDB but DECIMAL in Spark, so both
           -- sides use bigint micros to dodge the representation split.
           ((2 * sum_micros + n * 100) // (2 * n * 100)) / 10000.0
             AS avg_value
    FROM daily
    """,
    doc="Hierarchical rollup (the hypertable/continuous-aggregate "
    "pattern): daily stats computed by RE-AGGREGATING hourly partials "
    "— sums and counts merge losslessly, avg = merged sum / merged "
    "count (never avg-of-avgs). The oracle aggregates the raw table "
    "directly, proving the two-level rollup is exact. At 100 TB the "
    "hourly layer is what you materialize; every coarser granularity "
    "derives from it without touching raw data again.",
)
def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("sum_value_exact"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("w.start")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_exact").alias("sum_exact"),
        )
        .withColumn("sum_micros", (F.col("sum_exact") * 1_000_000).cast("long"))
        .select(
            F.unix_micros("day").alias("day_us"),
            "event_type",
            "n_events",
            F.round("sum_exact", 2).cast("double").alias("sum_value"),
            # exact bigint half-up rounding to 4dp — see oracle comment
            (
                F.expr(
                    "(2 * sum_micros + n_events * 100) div (2 * n_events * 100)"
                )
                / 10000.0
            ).alias("avg_value"),
        )
    )


@register(
    "events_json_props",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           ROUND(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(25,6))), 2)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Semi-structured access: JSON field extraction from the props "
    "column + agg (scalar JSON functions).",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket",
            F.get_json_object("props", "$.k").cast("bigint") % 10,
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "events_approx_sketches",
    oracle=None,  # sketch outputs are implementation-specific (Spark
    # HLL++ / KLL vs DuckDB's sketches would never hash-match — HLL++
    # at rsd=0.01 already estimates 151 for an exact 150 at sf0.01),
    # so the driver keeps a rows-only check; the exact twin below
    # feeds parity.py's guarantee checker instead.
    # Exact twin for the APPROX_GUARANTEES checker: exact distincts
    # plus the value bounds at rank q +/- 1/accuracy — the GK
    # guarantee says each approx_percentile(accuracy=10000) estimate
    # must land between them. quantile_disc returns an element of the
    # column (as Spark's estimate is), so the bound comparison never
    # interpolates.
    approx_oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           quantile_disc(value, 0.4999) AS lo_p50,
           quantile_disc(value, 0.5001) AS hi_p50,
           quantile_disc(value, 0.9499) AS lo_p95,
           quantile_disc(value, 0.9501) AS hi_p95,
           quantile_disc(value, 0.9899) AS lo_p99,
           quantile_disc(value, 0.9901) AS hi_p99,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    doc="Sketch aggregations per event_type: HyperLogLog++ distinct "
    "users (rsd=0.01) and quantile sketch of value (p50/p95/p99). The "
    "100 TB answer to COUNT(DISTINCT)/percentile: mergeable, bounded-"
    "memory partials instead of exact shuffles of raw values — state "
    "per group is KB-scale regardless of input size. Quantiles are "
    "projected to scalar p50/p95/p99 columns (never a raw array) so the "
    "driver's rows-only canonicalizer can sort the result.",
)
def events_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.approx_percentile(
                "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), 10_000
            ).alias("q"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p95"),
            F.col("q")[2].alias("p99"),
            "n_events",
        )
    )


@register(
    "events_exact_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Exact COUNT(DISTINCT) twin of events_approx_sketches: the "
    "same per-type user cardinality the HLL sketch estimates, so the "
    "sketch's error is measurable from two green registry rows each "
    "round (and pinned by test_approx_sketches_within_bounds). The "
    "exact distinct pays the second Expand shuffle the sketch "
    "exists to avoid at 100 TB — keeping both makes that trade "
    "visible in the bench.",
)
def events_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS cw FROM ud GROUP BY user_id
    )
    SELECT c.cw AS cohort_week,
           u.wk - c.cw AS week_offset,
           COUNT(*) AS n_users
    FROM ud u JOIN cohort c ON u.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-activity "
    "week, counted per week-offset of later activity — the "
    "engagement-analysis staple. Week buckets are exact integer "
    "arithmetic (epoch days div 7), immune to engine-specific "
    "week-truncation conventions. Two user-keyed shuffles (distinct "
    "activity weeks, then cohort join); state scales with users x "
    "active weeks, never raw events — partial aggregation collapses "
    "each user's events map-side first.",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), date '1970-01-01') div 7").alias("wk"),
    ).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        ud.join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "signup_purchase_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_signed,
           COUNT(p.user_id) AS n_purchased_after,
           COUNT(CASE WHEN p.purchase_us - s.signup_us
                           <= CAST(604800000000 AS BIGINT) THEN 1 END)
             AS n_converted_7d
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    """,
    doc="Conversion funnel: users who signed up, then purchased, then "
    "purchased within 7 days of signup — the product-analytics staple. "
    "All time math in exact epoch-microsecond integers (no interval/"
    "timezone semantics to diverge across engines). Two user-keyed "
    "partial-agg shuffles + one user-keyed join; both aggregates "
    "collapse each user's events map-side first, so shuffle volume is "
    "user-count-bounded at any event volume.",
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    joined = s.join(p, "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_signed"),
        F.count("purchase_us").alias("n_purchased_after"),
        F.count(
            F.when(
                F.col("purchase_us") - F.col("signup_us")
                <= 7 * 86400 * 1_000_000,
                1,
            )
        ).alias("n_converted_7d"),
    )


@register(
    "events_debounce",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id, event_type, COUNT(*) AS n_kept,
           epoch_us(MIN(ts)) AS first_kept_us
    FROM lagged
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 5 MINUTE
    GROUP BY user_id, event_type
    HAVING user_id < 100
    """,
    doc="Debounce: drop repeats of the same (user, event_type) arriving "
    "within 5 minutes of the previous KEPT... strictly, of the previous "
    "event — the lag-based form (each event compares to its immediate "
    "predecessor), which is the one-window-pass approximation every "
    "telemetry pipeline uses (exact chain-debounce needs sequential "
    "state). Extends the reference's duplicate-timestamp drop "
    "(Application.java:89-93) from exact-equality to a proximity "
    "window. One shuffle on (user_id, event_type); aggregated so the "
    "checked output is compact.",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = 5 * 60 * 1_000_000
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    return (
        lagged.filter(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > gap_us)
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.unix_micros(F.min("ts")).alias("first_kept_us"),
        )
        .filter(F.col("user_id") < 100)
    )


@register(
    "user_type_value_map",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(round(CASE WHEN isfinite(value)
                                      THEN value END * 100)
                           AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE user_id < 100
      GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN cents END) AS click_cents,
           MAX(CASE WHEN event_type = 'purchase' THEN cents END)
             AS purchase_cents,
           MAX(CASE WHEN event_type = 'error' THEN cents END) AS error_cents
    FROM per_type GROUP BY user_id
    """,
    doc="MapType surface: per user, a map<event_type, cents> built with "
    "map_from_entries over the per-type aggregates, then probed with "
    "element_at / size — the typed key-value aggregation shape (map "
    "columns shuffle as one value, no row explosion). Values are "
    "exact integer cents; the emitted columns are scalar probes so "
    "the driver canonicalizer (which cannot hash map cells) sees only "
    "hashable primitives. The oracle is the equivalent conditional "
    "aggregation.",
)
def user_type_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    cents = F.sum(F.round(finite("value") * 100).cast("bigint")).alias("cents")
    per_type = ev.groupBy("user_id", "event_type").agg(cents)
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cents"))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("bigint").alias("n_types"),
        F.element_at("m", "click").alias("click_cents"),
        F.element_at("m", "purchase").alias("purchase_cents"),
        F.element_at("m", "error").alias("error_cents"),
    )


@register(
    "events_hourly_anomalies",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM hourly GROUP BY 1
    )
    SELECT h.event_type, epoch_us(h.h) AS hour_us, h.n,
           CAST(
             CAST(CASE WHEN isfinite(h.n * t.c - t.s) THEN h.n * t.c - t.s END AS DECIMAL(38,0))
               * CAST(CASE WHEN isfinite(h.n * t.c - t.s) THEN h.n * t.c - t.s END AS DECIMAL(38,0))
             > 9 * CAST(CASE WHEN isfinite(t.c * t.s2 - t.s * t.s) THEN t.c * t.s2 - t.s * t.s END AS DECIMAL(38,0))
             AS INTEGER) AS is_anomaly
    FROM hourly h JOIN stats t USING (event_type)
    WHERE CAST(CASE WHEN isfinite(h.n * t.c - t.s) THEN h.n * t.c - t.s END AS DECIMAL(38,0))
            * CAST(CASE WHEN isfinite(h.n * t.c - t.s) THEN h.n * t.c - t.s END AS DECIMAL(38,0))
          > 4 * CAST(CASE WHEN isfinite(t.c * t.s2 - t.s * t.s) THEN t.c * t.s2 - t.s * t.s END AS DECIMAL(38,0))
    """,
    doc="Hourly volume anomaly detection per event type: flag hours "
    "whose count deviates more than 3 sigma (report from 2 sigma) "
    "from the type's mean — WITHOUT ever computing a float mean or "
    "stddev. |n - mu| > k*sigma is cross-multiplied into the exact "
    "integer/decimal inequality (n*c - s)^2 > k^2 * (c*s2 - s^2) "
    "over the (count, sum, sum-of-squares) triple, so the flag is "
    "bit-identical on every engine and partitioning (float z-scores "
    "drift in the last ulp). Two tiny shuffles: the hourly rollup and "
    "the per-type stats broadcast back onto it.",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    dec = "decimal(38,0)"
    dev = (F.col("n") * F.col("c") - F.col("s")).cast(dec)
    var_term = (
        F.col("c") * F.col("s2") - F.col("s") * F.col("s")
    ).cast(dec)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > 4 * var_term)
        .select(
            "event_type",
            F.unix_micros("h").alias("hour_us"),
            "n",
            (dev * dev > 9 * var_term).cast("int").alias("is_anomaly"),
        )
    )


@register(
    "events_daypart_counts",
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN hour(ts) BETWEEN 0 AND 5 THEN 1 END) AS night,
           COUNT(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 END) AS morning,
           COUNT(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 END) AS afternoon,
           COUNT(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 END) AS evening,
           COUNT(*) AS total
    FROM events GROUP BY event_type
    """,
    doc="Multi-band conditional aggregation (TPC-DS q88 shape): four "
    "day-part counts per event type from ONE scan — conditional "
    "COUNT(CASE ...) instead of four self-joined subqueries, the "
    "single-pass rewrite that matters when the scan is 100 TB. One "
    "partial-agg shuffle of 5-row groups.",
)
def events_daypart_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(lo, hi, name):
        return F.count(F.when(h.between(lo, hi), 1)).alias(name)

    return ev.groupBy("event_type").agg(
        band(0, 5, "night"),
        band(6, 11, "morning"),
        band(12, 17, "afternoon"),
        band(18, 23, "evening"),
        F.count(F.lit(1)).alias("total"),
    )


@register(
    "top_event_type_per_user",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE user_id < 300 GROUP BY 1, 2
    ), ranked AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT user_id, event_type AS top_type, n AS n_top
    FROM ranked WHERE rk = 1
    """,
    doc="Per-group mode (argmax): each user's most frequent event "
    "type, ties to the lexicographically first type. Two bounded "
    "shuffles — the (user, type) count partial agg, then a "
    "user-keyed window over at most |event types| rows per user "
    "(never raw events). The categorical-profile primitive feature "
    "stores compute per entity.",
)
def top_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", F.col("event_type").alias("top_type"),
            F.col("n").alias("n_top"),
        )
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           -- exact-sum, cast to DOUBLE, one division, UNROUNDED:
           -- mirrors Spark's sum/count exactly at every magnitude.
           -- Not ROUND(,6): DuckDB's x*1e6 round path is lossy past
           -- 2^53.  Not SUM(g)*1.0: DuckDB parses 1.0 as DECIMAL and
           -- routes the division through decimal scale rules, which
           -- disagree with the double two-step in the last ulp.
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc="Inter-arrival time statistics per event type — the "
    "throughput/burstiness profile. Gaps are exact integer "
    "microsecond differences from one lag window; the average is a "
    "single correctly-rounded division of an exact BIGINT sum "
    "(unrounded — see the in-query note on DuckDB's lossy ROUND at "
    "large magnitudes), so the stats hash-match across engines. One "
    "window shuffle on event_type + one bounded partial agg.",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        # Exact BIGINT sum, one final double division, NO rounding:
        # F.avg's double accumulation drifts by ulps, and a ROUND(,6)
        # at >= ~1e10 µs magnitudes is lossy inside DuckDB's x*1e6
        # path (> 2^53) while Spark rounds via BigDecimal — the bare
        # division of identical exact operands is the only form both
        # engines compute bit-identically at every gap magnitude.
        (F.sum("gap_us") / F.count("gap_us")).alias("avg_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "event_type_audience_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz FROM tu GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.sz AS n_a, sb.sz AS n_b,
           ROUND(i.n_both * 1.0 / (sa.sz + sb.sz - i.n_both), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
    doc="Audience overlap between event types: Jaccard similarity of "
    "user sets for every type pair — the cohort-overlap analysis "
    "behind funnel design. The self-join runs on the DISTINCT "
    "(type, user) table keyed by user (fan-out bounded by "
    "|types|^2 per user, 5 types here), intersection and union "
    "sizes are exact integers, and the one division is correctly "
    "rounded — hash-stable. Two shuffles: the distinct and the "
    "user-keyed pair join; the per-type sizes broadcast. This EXACT "
    "variant is the sf-bounded ORACLE TWIN: its cost is quadratic in "
    "audience size, so at corpus scale the default is "
    "audience_overlap_matrix_theta, the same matrix from KB-sized "
    "Theta sketches (error-bound-pinned against this twin in pytest); "
    "the audit of THAT path at 100 TB is the user_sample_frac knob "
    "on this builder (audience_overlap_sampled registers the knob's "
    "production point).",
)
def event_type_audience_overlap(
    spark: SparkSession, sf_dir: str, user_sample_frac: float = 1.0
) -> DataFrame:
    """`user_sample_frac` is the 100 TB audit knob (round 10, mirroring
    `lsh_recall_audit`): the exact pairwise Jaccard runs on a
    deterministic md5-bucket sample of the USER universe — uniform
    user sampling approximately preserves each cell's Jaccard
    (intersection and union shrink together, but the ratio is a ratio
    estimator: consistent, with O(1/n) bias at sampled-audience size
    n, and conditioned on a non-empty union), so the sampled exact
    matrix audits audience_overlap_matrix_theta at a scan-bounded
    cost. Defaults = full sf-bounded universe."""
    from .dedup import _audit_sample_pred

    ev = load_table(spark, sf_dir, "events")
    pred = _audit_sample_pred("user_id", user_sample_frac, None)
    if pred is not None:
        ev = ev.filter(pred)
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = F.broadcast(
        sizes.select(F.col("event_type").alias("type_a"), F.col("sz").alias("n_a"))
    )
    sb = F.broadcast(
        sizes.select(F.col("event_type").alias("type_b"), F.col("sz").alias("n_b"))
    )
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "audience_overlap_sampled",
    # The SAMPLED exact-overlap audit — the production monitoring
    # shape for audience_overlap_matrix_theta (DEPLOY.md): user
    # universe = deterministic md5-bucket half of the user ids, exact
    # pairwise Jaccard only on that sample. Registered alongside the
    # full twin so BOTH points of the audit-cost/estimate-variance
    # tradeoff are hash-checked, exactly as round 10 did for the LSH
    # recall audit and the sampled exact clusters.
    # user bucket generated by dedup._audit_bucket_sql — single source
    # of truth for the md5 bucket scheme across all sampled audits.
    oracle=f"""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE {_audit_bucket_sql("user_id", 0.5)}
    ), sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz FROM tu GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.sz AS n_a, sb.sz AS n_b,
           ROUND(i.n_both * 1.0 / (sa.sz + sb.sz - i.n_both), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
    doc="The SAMPLED exact audience-overlap audit — the 100 TB "
    "monitoring shape for audience_overlap_matrix_theta (DEPLOY.md): "
    "exact pairwise Jaccard over a deterministic md5-bucket HALF of "
    "the USER universe, pushed down to the events scan. Uniform user "
    "sampling approximately preserves each cell's Jaccard (a ratio "
    "estimator: consistent, bias O(1/n) at sampled-audience size n), "
    "so comparing this sampled exact "
    "matrix against the sketch matrix is the alert-on-divergence "
    "loop at a cost bounded by the sample, never the full audience. "
    "The oracle replays the bucket (property-pinned cross-engine) "
    "plus the same exact set algebra as the full twin.",
)
def audience_overlap_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_type_audience_overlap(spark, sf_dir, user_sample_frac=0.5)


@register(
    "audience_overlap_matrix_theta",
    # Exact pairwise set algebra as the oracle: Theta sketches below
    # the nominal-entries threshold are in EXACT mode, so every cell
    # of the matrix must hash-match the inclusion-exclusion counts at
    # oracle SF (the pytest pin vs event_type_audience_overlap still
    # governs beyond the exact regime).
    oracle="""
    WITH sizes AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n
      FROM events GROUP BY 1
    ), aud AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM aud a JOIN aud b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT sa.event_type AS type_a,
           sb.event_type AS type_b,
           CAST(COALESCE(i.n_both, 0) AS BIGINT) AS n_both_est,
           CAST(sa.n AS BIGINT) AS n_a_est,
           CAST(sb.n AS BIGINT) AS n_b_est,
           CASE WHEN sa.n + sb.n - COALESCE(i.n_both, 0) > 0
                THEN ROUND(COALESCE(i.n_both, 0) * 1.0
                           / (sa.n + sb.n - COALESCE(i.n_both, 0)), 6)
                ELSE 0.0 END AS jaccard_est
    FROM sizes sa
    JOIN sizes sb ON sa.event_type < sb.event_type
    LEFT JOIN inter i
      ON i.type_a = sa.event_type AND i.type_b = sb.event_type
    """,
    doc="THE 100 TB audience-overlap path: the full pairwise Jaccard "
    "matrix computed from per-type Theta sketches instead of the "
    "exact user-level self-join. ONE sketch pass over events (partial "
    "aggregation — user ids never shuffle, only KB-sized sketch "
    "partials), then every (type_a, type_b) cell is an intersection/"
    "union of two sketches: O(|types|^2) merges of KB objects, "
    "independent of audience size, where the exact twin "
    "(event_type_audience_overlap) shuffles and joins the whole "
    "DISTINCT (type, user) table — quadratic fan-out per hot user and "
    "audience-sized shuffles at corpus scale. The tiny per-type sketch "
    "table self-joins via broadcast.",
)
def audience_overlap_matrix_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    n_both = F.theta_sketch_estimate(
        F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
    )
    n_union = F.theta_sketch_estimate(
        F.theta_union(F.col("sk_a"), F.col("sk_b"))
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.round(n_both, 1).alias("n_both_est"),
        F.round(F.theta_sketch_estimate("sk_a"), 1).alias("n_a_est"),
        F.round(F.theta_sketch_estimate("sk_b"), 1).alias("n_b_est"),
        # disjoint audiences estimate to union 0 only when both sketches
        # are empty; guard the division so the matrix never emits null
        F.when(n_union > 0, F.round(n_both / n_union, 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


@register(
    "events_weekly_users_hll",
    # The EXACT set-algebra twin as the oracle: at oracle SF the
    # Datasketches HLL sketch is in its sparse/coupon regime, where
    # estimates are exact — so the weekly COUNT(DISTINCT) IS the
    # expected value, and a codepath/merge bug (wrong grouping, lost
    # daily sketch, bad union) hash-fails instead of hiding behind a
    # rows-only check. Beyond the exact regime the pytest error-bound
    # pin (vs exact weekly distincts) still governs.
    oracle="""
    SELECT event_type,
           epoch_us(date_trunc('week', ts)) AS week_us,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_weekly_users,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
             AS n_days_merged
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    doc="Mergeable-sketch rollup: DAILY per-type HLL sketches "
    "(Datasketches hll_sketch_agg) are UNIONED up to weekly distinct-"
    "user estimates without touching raw events again — the 100 TB "
    "re-aggregation pattern: sketch once at the finest grain, derive "
    "every coarser grain by merging KB-sized sketches (exact "
    "COUNT(DISTINCT) cannot re-aggregate: distinct counts do not "
    "sum). Two shuffles: the daily sketch build over raw events, "
    "then a (type, week) merge of sketch bytes only.",
)
def events_weekly_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL event time is not on the event-time axis (same contract as
    # reorder/window queries — F.window drops it implicitly; date_trunc
    # grouping would keep a NULL-week group, so filter explicitly).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type", "week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_weekly_users"
            ),
            F.count(F.lit(1)).alias("n_days_merged"),
        )
        .select(
            "event_type",
            F.unix_micros("week").alias("week_us"),
            "approx_weekly_users",
            "n_days_merged",
        )
    )


@register(
    "events_audience_theta_setops",
    # Exact set-algebra twin as the oracle: a Theta sketch below its
    # nominal-entries threshold (4096) is in EXACT mode — estimates
    # equal true cardinalities, and union/intersection/difference
    # follow inclusion-exclusion — so at oracle SF the sketch query
    # must hash-match exact distinct counts. Beyond the exact regime
    # the pytest error-bound pin still governs.
    oracle="""
    WITH aud AS (
      SELECT
        COUNT(DISTINCT CASE WHEN event_type = 'click'
                            THEN user_id END) AS c,
        COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                            THEN user_id END) AS p,
        COUNT(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                            THEN user_id END) AS u
      FROM events
    )
    SELECT CAST(c AS BIGINT) AS click_users,
           CAST(p AS BIGINT) AS purchase_users,
           CAST(u AS BIGINT) AS union_users,
           CAST(c + p - u AS BIGINT) AS both_users,
           CAST(c - (c + p - u) AS BIGINT) AS click_only_users
    FROM aud
    """,
    doc="Sketch set algebra: per-audience Theta sketches of users "
    "support UNION, INTERSECTION and DIFFERENCE estimates — the "
    "overlap analytics HLL cannot express (HLL only unions). Both "
    "audience sketches build in ONE conditional global aggregation "
    "(single scan, single partial agg — no per-type shuffle, no "
    "crossJoin stitch; round 12), then all set ops run on KB-sized "
    "sketches: at 100 TB the exact pairwise self-join "
    "(event_type_audience_overlap, the exact twin) is quadratic in "
    "audience size, while this is O(audiences^2) sketch merges. Emits "
    "click/purchase set-op estimates.",
)
def events_audience_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE global conditional aggregation builds both audience sketches
    # in a single scan + partial agg — no per-type groupBy shuffle, no
    # crossJoin stitching (round 12; previously groupBy→filter×2→
    # crossJoin). Also fixes degenerate semantics: a global agg emits
    # exactly one row even over an empty/absent audience (empty theta
    # sketch ⇒ estimate 0), matching the oracle's COUNT(DISTINCT CASE)
    # which is 0, never a vanished report row.
    both = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_b"),
    )
    return both.select(
        F.theta_sketch_estimate(F.col("sk_a")).alias("click_users"),
        F.theta_sketch_estimate(F.col("sk_b")).alias("purchase_users"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("sk_a"), F.col("sk_b"))
        ).alias("union_users"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("both_users"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).alias("click_only_users"),
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT v.user_id,
           epoch_us(v.t1) AS view_us,
           epoch_us(c.t2) AS click_us,
           epoch_us(p.t3) AS purchase_us,
           CAST(1 + (c.t2 IS NOT NULL)::INT + (p.t3 IS NOT NULL)::INT
                AS BIGINT) AS funnel_depth
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="Ordered funnel: per user, the first view, the first click "
    "AFTER that view, and the first purchase AFTER that click — "
    "step timestamps must be causally ordered, which a naive "
    "per-type MIN gets wrong (a click before the first view must not "
    "count). Three aggregations and two joins, ALL keyed on user_id: "
    "one hash partitioning serves every stage (co-partitioned joins, "
    "no re-shuffle), per-step state is one row per user, and "
    "timestamps stay exact epoch-µs integers. The LLM-pipeline "
    "relevance: identical shape to multi-stage document lineage "
    "(crawled -> cleaned -> deduped 'first time after' chains).",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t1").alias("view_us"),
            F.unix_micros("t2").alias("click_us"),
            F.unix_micros("t3").alias("purchase_us"),
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).cast("long").alias("funnel_depth"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimation (completes the sketch
# family: HLL = cardinality, DDSketch/KLL = quantiles, Misra-Gries =
# heavy hitters, Theta = set algebra, CMS = arbitrary-key frequency)

CMS_DEPTH = 4
CMS_WIDTH = 1024
# splitmix64-derived odd multipliers, one per CMS row (fixed seeds so
# the sketch is deterministic across runs/engines)
CMS_SEEDS = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
             0xD6E8FEB86659FD93)


def _cms_cols(keys: "np.ndarray") -> "np.ndarray":
    """[depth, n] column indices for int64 keys — vectorized
    multiply-shift hashing, identical wherever numpy runs."""
    import numpy as np

    k = keys.astype(np.uint64)
    out = np.empty((CMS_DEPTH, len(k)), dtype=np.int64)
    for i, seed in enumerate(CMS_SEEDS):
        h = k * np.uint64(seed)
        h ^= h >> np.uint64(33)
        out[i] = (h % np.uint64(CMS_WIDTH)).astype(np.int64)
    return out


def cms_aggregate(df: DataFrame, key_col: str) -> "np.ndarray":
    """Merged [CMS_DEPTH, CMS_WIDTH] Count-Min matrix over a key
    column. One Arrow pass emits a 4 KB partial per batch (counters,
    not keys — the whole point: state is O(d*w) however many distinct
    keys or rows exist); a ~4k-row element shuffle sums partials; the
    driver folds the single merged row. Same model-fit contract as
    pca_fit (bounded build-time action)."""
    import numpy as np
    import pandas as pd

    def _partial(it):
        for pdf in it:
            keys = pdf[key_col].dropna().to_numpy(dtype=np.int64)
            if len(keys) == 0:
                continue
            m = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
            cols = _cms_cols(keys)
            for i in range(CMS_DEPTH):
                np.add.at(m[i], cols[i], 1)
            yield pd.DataFrame({"m": [m.ravel().tolist()]})

    parts = df.select(key_col).mapInPandas(_partial, schema="m array<long>")
    flat = (
        parts.select(F.posexplode("m").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
        .toPandas()
        .sort_values("i")["v"]
        .to_numpy()
    )
    if flat.size == 0:  # no non-null keys anywhere -> empty sketch
        return np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    return flat.reshape(CMS_DEPTH, CMS_WIDTH)


def cms_estimate(matrix: "np.ndarray", keys: "np.ndarray") -> "np.ndarray":
    """Point estimates: min over depths of the hashed counters —
    never an underestimate; overshoot <= e/WIDTH * N w.h.p."""
    import numpy as np

    cols = _cms_cols(np.asarray(keys, dtype=np.int64))
    ests = np.stack(
        [matrix[i, cols[i]] for i in range(CMS_DEPTH)], axis=0
    )
    return ests.min(axis=0)


@register(
    "events_cms_user_counts",
    # Exact per-key counts as the oracle: with 4x1024 counters and the
    # oracle-SF key cardinality (~150 users), the min-over-depths
    # estimate is collision-free and equals the exact count — so a
    # hashing/fold/merge bug hash-fails instead of hiding inside the
    # error bound. The pytest CMS-guarantee pin (est >= exact,
    # overshoot <= eps*N) still governs at any cardinality.
    oracle="""
    WITH probes AS (
      SELECT DISTINCT user_id FROM events
      WHERE user_id IS NOT NULL ORDER BY user_id LIMIT 20
    )
    SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS est_count
    FROM probes p JOIN events e ON e.user_id = p.user_id
    GROUP BY 1
    """,
    doc="Count-Min point-frequency estimates for the 20 lowest "
    "user_ids over the events stream — the sketch that answers 'how "
    "often did key X occur' for ANY key with O(d*w) memory (4x1024 "
    "counters = 32 KB here) when exact per-key counting would need "
    "state proportional to the key space. Counters are mergeable by "
    "addition, so the partial-per-Arrow-batch + element-sum shuffle "
    "IS the one-pass sketch of the whole table, and the identical "
    "fold works as streaming state (the MG/HLL/DDSketch pattern in "
    "streaming/stateful.py). Estimates never undercount; overshoot "
    "is bounded by e/width * N per row w.h.p. — both pinned in "
    "pytest vs exact counts.",
)
def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    probes = [
        r["user_id"]
        for r in ev.select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(20)
        .collect()
    ]
    matrix = cms_aggregate(ev, "user_id")
    ests = cms_estimate(matrix, np.asarray(probes))
    return spark.createDataFrame(
        [(int(u), int(e)) for u, e in zip(probes, ests)],
        "user_id long, est_count long",
    )


@register(
    "purchase_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_touch
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT COALESCE(last_touch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4))), 2)::DOUBLE
             AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch purchase attribution: every purchase credits the "
    "most recent PRIOR non-purchase event of the same user (IGNORE "
    "NULLS last_value over an unbounded-preceding frame — the window "
    "idiom that carries the latest qualifying row forward without a "
    "self-join); purchases with no prior touch credit 'direct'. "
    "Value sums run in DECIMAL and round once, so the engines agree "
    "bit-for-bit despite float addition being order-sensitive. One "
    "shuffle on user_id for the window, then a tiny channel agg — "
    "the marketing-funnel complement to events_funnel_conversion "
    "(which measures ordered step completion, not credit).",
)
def purchase_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    seq = ev.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("direct")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
            )
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "experiment_assignment_lift",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)),
                              1, 4) < '8000'
                  THEN 'control' ELSE 'treatment' END AS arm
      FROM (SELECT DISTINCT user_id FROM events
            WHERE user_id IS NOT NULL)
    ), metrics AS (
      SELECT a.arm, e.user_id,
             COUNT(*) FILTER (WHERE e.event_type = 'purchase')
               AS purchases,
             SUM(CAST(CASE WHEN isfinite(e.value) THEN e.value END AS DECIMAL(18,4)))
               FILTER (WHERE e.event_type = 'purchase') AS spend
      FROM events e JOIN assigned a USING (user_id)
      GROUP BY 1, 2
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) FILTER (WHERE purchases > 0) AS BIGINT)
             AS n_converted,
           CAST(SUM(purchases) AS BIGINT) AS total_purchases,
           ROUND(COALESCE(SUM(spend), 0), 2)::DOUBLE AS total_spend
    FROM metrics GROUP BY arm
    """,
    doc="Deterministic A/B experiment readout: users hash into "
    "control/treatment by md5 over a SALTED key ('exp1:' || user_id "
    "— the experiment-id salt is what makes assignments independent "
    "ACROSS experiments; unsalted hashing reuses the same split "
    "every time), then per-arm conversion and spend aggregate from "
    "the events stream. Decimal spend keeps engines bit-identical. "
    "Shape: distinct-user pass + one user-keyed join/agg + a 2-row "
    "arm rollup; assignment is a pure hash predicate evaluable at "
    "the scan, never a stored mapping table — the property that "
    "lets a 100 TB backfill recompute arms byte-identically.",
)
def experiment_assignment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
            1,
            4,
        )
        < "8000",
        "control",
    ).otherwise("treatment")
    is_purchase = F.col("event_type") == "purchase"
    metrics = (
        ev.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.count(F.when(is_purchase, 1)).alias("purchases"),
            F.sum(
                F.when(is_purchase, F.col("value").cast("decimal(18,4)"))
            ).alias("spend"),
        )
    )
    return metrics.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("purchases") > 0, 1)).alias("n_converted"),
        F.sum("purchases").cast("long").alias("total_purchases"),
        F.round(F.coalesce(F.sum("spend"), F.lit(0)), 2)
        .cast("double")
        .alias("total_spend"),
    )


@register(
    "events_weekday_seasonality",
    oracle="""
    WITH counts AS (
      SELECT dayofweek(ts) + 1 AS dow, COUNT(*) AS c
      FROM events GROUP BY 1
    ), tot AS (SELECT SUM(c) AS n, COUNT(*) AS k FROM counts)
    SELECT CAST(counts.dow AS INT) AS dow,
           CAST(c AS BIGINT) AS n_events,
           ROUND(c * 7.0 / t.n, 6) AS rate_vs_uniform,
           ROUND((c - t.n / 7.0) * (c - t.n / 7.0) / (t.n / 7.0), 4)
             AS chi2_term
    FROM counts CROSS JOIN tot t
    """,
    doc="Day-of-week seasonality profile with per-day chi-square "
    "terms against the uniform baseline — the quick test for whether "
    "an event stream has weekly structure (sum the chi2_term column "
    "against the chi-square(6) critical value). Counts are exact "
    "integers; the only floats are final per-row ratios over the "
    "1-row total, so both engines agree bit-for-bit. One partial-agg "
    "shuffle of 7 groups. Convention pinned explicitly: Spark's "
    "dayofweek is 1=Sunday while DuckDB's is 0=Sunday, so the oracle "
    "adds 1 — the kind of off-by-one a dual-engine hash check exists "
    "to catch.",
)
def events_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.agg(F.sum("c").alias("n"))
    exp = F.col("n") / 7.0
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("c").cast("long").alias("n_events"),
            F.round(F.col("c") * 7.0 / F.col("n"), 6).alias(
                "rate_vs_uniform"
            ),
            F.round((F.col("c") - exp) * (F.col("c") - exp) / exp, 4).alias(
                "chi2_term"
            ),
        )
    )


@register(
    "events_value_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS d
      -- non-finite amounts have no leading digit: NaN passes the
      -- >=1 filter under both engines' total order (NaN sorts
      -- largest), then DuckDB's BIGINT cast aborts and Spark's
      -- floor() maps NaN to digit 0 → ANSI 1/0 — exclude at the scan
      FROM events WHERE value IS NOT NULL AND isfinite(value)
        AND value * 100 >= 1
    ), counts AS (
      SELECT d, COUNT(*) AS c FROM digits GROUP BY d
    ), tot AS (SELECT SUM(c) AS n FROM counts)
    SELECT CAST(d AS INT) AS leading_digit,
           CAST(c AS BIGINT) AS n_values,
           ROUND(c * 1.0 / t.n, 6) AS observed_freq,
           ROUND(log10(1 + 1.0 / d), 6) AS benford_freq
    FROM counts CROSS JOIN tot t
    """,
    doc="Benford's-law audit of the events value column: leading-"
    "digit frequencies of the integer cent amounts vs the log10(1 + "
    "1/d) expectation — the classic forensic DQ check for fabricated "
    "or truncated numeric columns (natural multi-scale amounts "
    "follow Benford; uniform synthetic generators do not, and THIS "
    "corpus's flat profile is exactly what the check should report "
    "for it). Digits extract via floor(value*100) then integer/string "
    "ops — floor() is explicit because bare double->BIGINT casts "
    "TRUNCATE in Spark but ROUND in DuckDB; "
    "only the final per-row ratios are floats. One 9-group "
    "partial-agg shuffle.",
)
def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # is_finite mirrors the oracle's isfinite(value) scan guard: a
    # NaN amount passes *100>=1 under the engines' shared total order
    # and then breaks digit extraction on both sides.
    ev = load_table(spark, sf_dir, "events").filter(
        is_finite("value") & (F.col("value") * 100 >= 1)
    )
    digits = ev.select(
        F.substring(
            F.floor(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("n"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("int").alias("leading_digit"),
            F.col("c").cast("long").alias("n_values"),
            F.round(F.col("c") * 1.0 / F.col("n"), 6).alias("observed_freq"),
            F.round(F.log10(1 + 1.0 / F.col("d")), 6).alias("benford_freq"),
        )
    )
