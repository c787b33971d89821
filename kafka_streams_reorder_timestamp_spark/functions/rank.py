"""Distributed global ranking — no single-task window sort.

A bare ``Window.orderBy(...)`` (no partitionBy) funnels every row
through ONE task: the classic straggler-maker that works at sf0.1 and
dies at 100 TB. The scale-safe equivalent of a global ``row_number``:

  1. assign every row a DETERMINISTIC, order-compatible bucket computed
     from the leading sort column's value: equal-width ranges derived
     from a tiny (1-row) min/max aggregate that is broadcast back.
     Value-based bucketing (not ``spark_partition_id`` after a
     ``repartitionByRange``) is deliberate: partition ids are
     non-deterministic across the two consumers of a self-joined
     lineage (AQE coalescing / boundary resampling can disagree),
     whereas a bucket computed from the row's own value is identical
     no matter how many times the plan re-executes;
  2. partition-local ``row_number`` per bucket — each bucket ranks its
     rows in parallel;
  3. a tiny per-bucket counts aggregate → exclusive-prefix-sum offsets
     (``n_buckets`` rows, broadcast back).

``global_rank = local_row_number + offset_of_my_bucket``.

Skew note: equal-width value buckets are balanced when the sort column
is roughly uniform (prices, timestamps); a pathological distribution
concentrates rows in few buckets, degrading parallelism but never
correctness. Raise ``n_buckets`` (default = shuffle partitions) to
subdivide further.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sort_exprs(order_by: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def global_row_number(
    df: DataFrame,
    bucket_col: str,
    order_by: Sequence[Column | str],
    out_col: str = "rn",
    descending: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Global 1-based row_number over ``order_by`` without a
    single-partition sort. ``bucket_col`` must be the LEADING numeric
    sort column (the bucketing is derived from its value range and must
    agree with the sort direction, given by ``descending``). The
    ordering should be total (tie-broken by a unique column) for
    reproducible ranks."""
    return _ranked(
        df, bucket_col, order_by, out_col, descending, n_buckets,
        with_total=False,
    )


def global_rank_buckets(
    df: DataFrame,
    bucket_col: str,
    order_by: Sequence[Column | str],
    n_groups: int,
    out_col: str = "bucket",
    descending: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Equal-count arithmetic rank grouping:
    ``group = (n_groups * (rn - 1)) div N + 1``.

    NOT ntile() — ntile puts the remainder rows in the FIRST groups,
    this formula spreads them evenly; the arithmetic form needs only
    (rn, N), both of which the distributed rank already produces, and
    is reproducible in any ANSI engine for oracle parity."""
    ranked = _ranked(
        df, bucket_col, order_by, "_grb_rn", descending, n_buckets,
        with_total=True,
    )
    return ranked.withColumn(
        out_col,
        F.expr(f"({n_groups} * (_grb_rn - 1)) div _grb_total + 1").cast("int"),
    ).drop("_grb_rn", "_grb_total")


def _ranked(
    df: DataFrame,
    bucket_col: str,
    order_by: Sequence[Column | str],
    out_col: str,
    descending: bool,
    n_buckets: int | None,
    with_total: bool,
) -> DataFrame:
    sort = _sort_exprs(order_by)
    k = n_buckets or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # 1-row bounds aggregate; its values are deterministic, so the
    # broadcast cross join is safe under re-execution (unlike pid-based
    # schemes).
    bounds = df.agg(
        F.min(bucket_col).cast("double").alias("_lo"),
        F.max(bucket_col).cast("double").alias("_hi"),
    )
    v = F.col(bucket_col).cast("double")
    span = F.col("_hi") - F.col("_lo")
    frac = F.when(span > 0, (v - F.col("_lo")) / span).otherwise(F.lit(0.0))
    pos = F.when(F.lit(descending), 1.0 - frac).otherwise(frac)
    bucket = F.least(
        F.floor(pos * k).cast("int"), F.lit(k - 1)
    )
    staged = df.join(F.broadcast(bounds)).withColumn("_bkt", bucket).drop(
        "_lo", "_hi"
    )
    # tiny: one row per bucket
    counts = staged.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_prev = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_offset"),
        F.sum("_cnt")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_grb_total"),
    )
    if not with_total:
        offsets = offsets.drop("_grb_total")
    w_local = Window.partitionBy("_bkt").orderBy(*sort)
    return (
        staged.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, F.row_number().over(w_local) + F.col("_offset"))
        .drop("_bkt", "_offset")
    )
