"""Streaming event-time re-sequencer — the reference's core operator.

Reproduces the Kafka Streams reorder processor
(reference: src/main/java/org/example/Application.java):

- ingest half (Application.java:86-94): buffer each record in
  persistent state keyed by event timestamp; a record whose event
  timestamp is already buffered is DROPPED (first-writer-wins dedup,
  Application.java:89-93);
- stream-time punctuation (Application.java:65-69, grace at :144):
  a timer in the EVENT-TIME domain, here an event-time timeout that
  fires when the watermark passes `first-buffered-event-time + grace`;
- ordered flush (Application.java:72-83): on fire, emit the ENTIRE
  buffer sorted ascending by event time and clear it (flush-all, not
  flush-older-than-watermark — SURVEY §2.1 note 4). A straggler that
  arrives after its epoch was flushed lands in the next flush batch,
  exactly like the reference.

Deliberate divergences (SURVEY §2.1 notes 2-3, §7.4 risk 3): output
rows keep their original columns — we do not overwrite the record key
with the synthetic store key nor restamp records with the punctuation
timestamp; the reference's own test asserts values+order only, which
this operator preserves.

Spark-first shape: state lives in the Structured Streaming state store
(RocksDB provider — same durability model as the reference's RocksDB
KV store), transport is Arrow-batched `applyInPandasWithState`, and
eviction/timers ride the engine's watermark. The per-key buffer is the
only Python-side logic; everything before/after is ordinary DataFrame
code. On Spark 4.x `transformWithStateInPandas` offers finer-grained
list state for the same design; `applyInPandasWithState` is used here
because its timeout contract is stable across 3.4+.

Serialization is BATCH-oriented, never per-row: each micro-batch's new
rows are encoded as ONE column-oriented JSON chunk (timestamps
vectorized to epoch-µs), and flush decodes chunk-at-a-time and sorts
with one argsort. The Arrow batch is already columnar in hand — paying
`iloc[i]` + `json.dumps` per row would make ingest Python-bound at the
reference's real duty (hours of buffered stream per key).

Parallelism: with `key_cols` the order is restored per key group (the
reference orders per Kafka partition; its demo runs 1 partition). With
`key_cols=None` a constant grouping key yields one global order at
parallelism 1 — the same trade-off the reference makes (SURVEY §7.4
risk 2).
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_GLOBAL_KEY = "__reorder_key"

# State per key group: when the pending punctuation fires (epoch ms),
# buffered event times (epoch µs, parallel to the concatenated chunk
# rows), and one column-oriented JSON chunk per ingest batch.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("fire_at_ms", T.LongType()),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("chunks", T.ArrayType(T.StringType())),
    ]
)


def _grace_ms(grace: str) -> int:
    """Parse '10 hours' / '30 seconds' / '5 minutes' → milliseconds."""
    qty, _, unit = grace.strip().partition(" ")
    unit = unit.rstrip("s")
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(float(qty) * factor)


def reorder_stream(
    df: DataFrame,
    ts_col: str,
    grace: str = "10 hours",
    key_cols: Sequence[str] | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Re-sequence a streaming DataFrame by event time.

    Parameters
    ----------
    df: streaming DataFrame; `ts_col` must be TimestampType.
    ts_col: event-time column (the Avro `time` field analog).
    grace: punctuation interval in event time (Application.java:144).
    key_cols: restore order within these key groups; None = one global
        order (single state group — the reference's 1-partition demo).
    watermark_delay: watermark lag on `ts_col`; defaults to `grace`,
        matching the reference where grace IS the lateness horizon.
        Records later than this are dropped by the engine — a stronger
        late-data policy than the reference, which buffers arbitrarily
        late records for the next flush (SURVEY §2.1 note 4 sanctions
        adopting watermark semantics and documenting the difference);
        stragglers WITHIN the horizon land in the next flush exactly
        like the reference.
    """
    if watermark_delay is None:
        watermark_delay = grace

    out_schema = df.schema
    field_types = {f.name: f.dataType for f in out_schema.fields}
    ts_fields = [
        f.name for f in out_schema.fields if isinstance(f.dataType, T.TimestampType)
    ]
    columns = [f.name for f in out_schema.fields]
    grace_ms = _grace_ms(grace)

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Punctuation: drain the whole buffer in event-time order
            # (Application.java:72-83) and clear. The next record to
            # arrive re-registers a timer, which is observationally the
            # reference's periodic schedule (a periodic fire over an
            # empty store forwards nothing).
            _, ts_us, chunks = state.get
            state.remove()
            yield _decode_chunks_sorted(
                chunks, np.asarray(ts_us, dtype="int64"), columns, field_types
            )
            return

        exists = state.exists
        if exists:
            fire_at_ms, ts_us, chunks = state.get
            ts_us, chunks = list(ts_us), list(chunks)
        else:
            fire_at_ms, ts_us, chunks = 0, [], []
        seen = set(ts_us)

        for pdf in pdfs:
            new, new_ts = _dedup_batch(pdf, ts_col, seen)
            if new is None:
                continue
            seen.update(new_ts)
            ts_us.extend(new_ts)
            chunks.append(_encode_batch(new, ts_fields))

        if not ts_us:
            state.remove() if exists else None
            return

        if fire_at_ms == 0:
            # First buffered record after a flush schedules the next
            # punctuation one grace later in event time.
            fire_at_ms = min(ts_us) // 1000 + grace_ms
        state.update((fire_at_ms, ts_us, chunks))
        # The engine clears timeout info on every invocation, so it is
        # re-armed here each time; event-time timeouts must be set
        # strictly later than the current watermark.
        state.setTimeoutTimestamp(max(fire_at_ms, state.getCurrentWatermarkMs() + 1))
        return
        yield  # pragma: no cover — makes `handle` a generator

    # A NULL event time cannot be placed on the event-time axis (no
    # watermark comparison, no buffer sort key) — drop the record, the
    # analog of Kafka Streams' GENERIC invalid-timestamp handling
    # (LogAndSkipOnInvalidTimestamp). The reference itself never hits
    # this: its extractor (Application.java:99) returns the
    # non-nullable Avro `time` long directly, so NULL is an edge only
    # this engine's nullable-column inputs can produce. Pinned by
    # tests/test_reorder_stream.py::test_all_null_event_time_rows_are_dropped.
    stream = df.filter(F.col(ts_col).isNotNull()).withWatermark(
        ts_col, watermark_delay
    )
    if key_cols:
        grouped = stream.groupBy(*key_cols)
    else:
        stream = stream.withColumn(_GLOBAL_KEY, F.lit(0))
        grouped = stream.groupBy(_GLOBAL_KEY)

    out = grouped.applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(*columns)


def _dedup_batch(
    pdf: pd.DataFrame, ts_col: str, seen: set
) -> tuple[pd.DataFrame | None, list[int]]:
    """Vectorized first-writer-wins (Application.java:89-93): drop rows
    whose event timestamp is already buffered or duplicated earlier in
    this batch. Returns (kept rows, their epoch-µs timestamps)."""
    if pdf.empty:
        return None, []
    micros = pdf[ts_col].astype("datetime64[us]").astype("int64")
    keep = (~micros.duplicated()) & (~micros.isin(seen))
    if not keep.any():
        return None, []
    new = pdf.loc[keep.values]
    return new, micros.loc[keep.values].tolist()


def _encode_batch(pdf: pd.DataFrame, ts_fields: list[str]) -> str:
    """One ingest batch → one column-oriented JSON chunk. Timestamp
    columns are vectorized to epoch-µs ints (NaT → null); other columns
    pass through `tolist()` (numpy → native) with NaN/None → null."""
    cols: dict[str, list] = {}
    for c in pdf.columns:
        s = pdf[c]
        if c in ts_fields:
            dt = s.astype("datetime64[us]")
            ints = dt.astype("int64").astype(object)
            ints[dt.isna().values] = None
            cols[c] = ints.tolist()
        else:
            cols[c] = [
                None if _isna_scalar(v) else v for v in s.tolist()
            ]
    return json.dumps(cols)


def _isna_scalar(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float):
        return v != v  # NaN
    return v is pd.NaT


def _decode_chunks_sorted(
    chunks: Sequence[str],
    ts_us: np.ndarray,
    columns: list[str],
    field_types: dict[str, T.DataType],
) -> pd.DataFrame:
    """Decode buffered chunks, concatenate column-wise, and return the
    rows in event-time order (one stable argsort over all buffered
    timestamps). Dtype restore is null-safe: integer columns with nulls
    use pandas' nullable Int64 instead of raising on astype."""
    decoded = [json.loads(ch) for ch in chunks]
    cols = {
        c: [v for d in decoded for v in d[c]] for c in columns
    }
    pdf = pd.DataFrame(cols, columns=columns)
    order = np.argsort(ts_us, kind="stable")
    pdf = pdf.iloc[order].reset_index(drop=True)
    for name, dtype in field_types.items():
        if isinstance(dtype, T.TimestampType):
            pdf[name] = pd.to_datetime(pdf[name], unit="us")
        elif isinstance(dtype, (T.LongType, T.IntegerType)):
            if pdf[name].isna().any():
                pdf[name] = pdf[name].astype("Int64")
            else:
                pdf[name] = pdf[name].astype("int64")
        elif isinstance(dtype, (T.DoubleType, T.FloatType)):
            pdf[name] = pdf[name].astype("float64")
    return pdf
