"""Event-time re-sequencing (batch form).

Semantics of the reference's reorder processor
(reference: src/main/java/org/example/Application.java:86-94 ingest,
72-83 flush, 145 key synthesis):

1. Records whose event timestamp was already seen are DROPPED —
   first-writer-wins (the store key is derived solely from the event
   time and `process()` only puts when `get(storeKey) == null`,
   Application.java:89-93).
2. Surviving records are emitted in ascending event-time order (the
   store iteration at Application.java:73-79 walks the RocksDB keys
   `"key-<13-digit-millis>"` lexicographically, i.e. chronologically).

In batch, Spark built-ins express both halves exactly:
dedup-keeping-first is a per-timestamp min over an arrival column, and
ordered emission is a global sort. At 100 TB both steps are single
shuffles on the same key: the dedup shuffles on the event-time column
and the sort range-partitions on it; AQE coalesces/split-skews both.
We deliberately sort on the numeric/timestamp column rather than the
reference's string trick (Application.java:145), which is strictly
more correct (SURVEY §2.1 note 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reorder_batch(
    df: DataFrame,
    ts_col: str,
    arrival_col: str | None = None,
    drop_duplicate_timestamps: bool = True,
) -> DataFrame:
    """Re-sequence `df` by event time with the reference's dedup rule.

    Parameters
    ----------
    ts_col:
        Event-time column (timestamp or numeric epoch) — the analog of
        the Avro `time` field (electronic_order.avsc:10).
    arrival_col:
        Column defining arrival order, used to break ties the way the
        reference does (first arrival wins, Application.java:89-93).
        When None, an arbitrary-but-deterministic-per-plan first row is
        kept via ``dropDuplicates`` (fine when callers don't care which
        duplicate survives, e.g. exact duplicates).
    drop_duplicate_timestamps:
        Set False to keep all rows (pure re-sort, no dedup).

    Rows with a NULL event time are dropped (they cannot be sequenced
    on the event-time axis) — matching the streaming form and Kafka
    Streams' generic invalid-timestamp drop semantics
    (LogAndSkipOnInvalidTimestamp); the reference's own extractor
    returns a non-nullable Avro long and never produces this edge.
    """
    out = df.filter(F.col(ts_col).isNotNull())
    if drop_duplicate_timestamps:
        if arrival_col is not None:
            w = Window.partitionBy(ts_col).orderBy(F.col(arrival_col).asc())
            out = (
                out.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            out = out.dropDuplicates([ts_col])
    return out.orderBy(F.col(ts_col).asc())
