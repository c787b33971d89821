"""As-of (nearest-timestamp) join — a first-class temporal operator
Spark lacks, built as a composition of existing DataFrame ops.

The reference has no joins at all (SURVEY §2.2: joins ABSENT); this is
extension surface. The classic implementations are (a) a range join
(explodes: every left row matches MANY right rows before the per-left
top-1) or (b) a per-key sorted merge. `asof_join` is (b) expressed
declaratively: tag both sides, union, ONE shuffle on the join keys,
then a running `last(..., ignorenulls=True)` window carries the most
recent right row forward onto each left row. No range fan-out, no
Python, and the single hash-partition shuffle is exactly what a
distributed merge-join would need anyway — the shape survives 100 TB
(state per task = one window frame row, not a buffered range).

Tie semantics: a right row at exactly `left_ts` matches (inclusive,
like DuckDB/pandas `ASOF JOIN`); among equal-timestamp right rows the
caller should pre-dedup (the window order would otherwise pick one
nondeterministically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    how: str = "inner",
    right_order: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    `right_ts` <= `left_ts` (direction="backward") or smallest
    `right_ts` >= `left_ts` ("forward"), matching on the equi-keys
    `on`.

    Returns all left columns plus the right side's non-key columns
    (right's timestamp column included, so callers can compute lags).
    `how="inner"` drops unmatched left rows; `how="left"` keeps them
    with nulls.

    `right_order` makes equal-timestamp right rows deterministic
    WITHOUT a pre-dedup shuffle: ties resolve to the row greatest under
    the given columns (e.g. `right_order=["event_id"]` keeps the max
    event_id per timestamp, matching a groupBy(..., max(event_id))
    pre-pass at zero extra cost).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on)
    right_payload = [c for c in right.columns if c not in on]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    # One unioned relation: right rows carry the payload struct, left
    # rows carry their own columns; `_side` breaks timestamp ties so a
    # right row AT left_ts is visible to that left row (inclusive).
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*right_payload).alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # Right rows sort before left at equal _ts (inclusive match); among
    # equal-ts right rows, `right_order` ascending means the LAST one in
    # the frame — the max under right_order — is what last() captures.
    tie = [F.col("_r")[c].asc() for c in right_order]
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), *tie]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), *tie]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(c) for c in right_payload],
    )


@register(
    "purchase_last_signup",
    oracle="""
    WITH signups AS (
      SELECT user_id, ts, MAX(event_id) AS signup_event_id
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           p.value,
           s.signup_event_id,
           epoch_us(s.ts) AS signup_ts_us,
           epoch_us(p.ts) - epoch_us(s.ts) AS wait_us
    FROM purchases p ASOF JOIN signups s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join: each purchase event matched to the user's most "
    "recent signup at-or-before it. Spark side is the union+window "
    "merge (one shuffle on user_id); oracle is DuckDB's native ASOF "
    "JOIN — two independent implementations of the same semantics.",
)
def purchase_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # No pre-dedup shuffle: right_order resolves equal-timestamp
    # signups to the max event_id inside the one asof window pass —
    # identical to the oracle's GROUP BY ... MAX(event_id) CTE.
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_event_id"),
    )
    out = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        right_order=["signup_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        "value",
        "signup_event_id",
        F.unix_micros("signup_ts").alias("signup_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("signup_ts")).alias("wait_us"),
    )
