"""Streaming event-time re-sequencer on the Spark 4.x
`transformWithStateInPandas` API — same semantics as
`reorder.reorder_stream` (see that module for the reference mapping,
Application.java:65-94), different state backend.

Why both backends exist: `applyInPandasWithState` (3.4+) carries the
whole buffer as ONE state tuple — every micro-batch rewrites it.
`transformWithStateInPandas` (4.0+) exposes composable typed state:
append-only ListStates (RocksDB merge instead of full rewrite) plus a
ValueState for the pending punctuation, and timers are first-class
(`registerTimer` persists until fired, closer to the reference's
`context.schedule`, Application.java:65-69).

State layout (all writes O(new data) per batch, never O(buffer)):
  - `seen`   ListState<ts BIGINT>  — every buffered event timestamp,
    appended per batch; read (ints only, no JSON decode) for the
    first-writer-wins dedup;
  - `chunks` ListState<chunk STRING> — ONE column-oriented JSON chunk
    per ingest batch (vectorized encode, see reorder._encode_batch);
  - `fire`   ValueState<fire_at_ms BIGINT> — pending punctuation.
Flush decodes chunk-at-a-time, concatenates columns, and emits in one
stable argsort over the buffered timestamps.

Environment requirement: the transformWithState runtime speaks
protobuf to the JVM (`google.protobuf` must be importable on driver
and executors — it ships with any standard PySpark cluster install).
`tws_available()` gates callers; containers without protobuf use
`reorder.reorder_stream`, which has no extra dependency.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .reorder import (
    _decode_chunks_sorted,
    _dedup_batch,
    _encode_batch,
    _grace_ms,
)

_GLOBAL_KEY = "__reorder_key"


def tws_available() -> bool:
    """True if the transformWithState protobuf runtime can load."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class _ReorderProcessor(StatefulProcessor):
    """Buffer-insert / timer / ordered-flush, one instance per task."""

    def __init__(
        self,
        columns: list[str],
        ts_fields: list[str],
        field_types: dict,
        ts_col: str,
        grace_ms: int,
    ):
        self._columns = columns
        self._ts_fields = ts_fields
        self._field_types = field_types
        self._ts_col = ts_col
        self._grace_ms = grace_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getListState("seen", "ts_us BIGINT")
        self._chunks = handle.getListState("chunks", "chunk STRING")
        self._fire = handle.getValueState("fire", "fire_at_ms BIGINT")
        self._handle = handle

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        seen = {r[0] for r in self._seen.get()}
        new_ts: list[int] = []
        new_chunks: list[tuple[str]] = []
        for pdf in rows:
            new, ts = _dedup_batch(pdf, self._ts_col, seen)
            if new is None:
                continue
            seen.update(ts)
            new_ts.extend(ts)
            new_chunks.append((_encode_batch(new, self._ts_fields),))
        if not new_ts:
            return iter(())

        # append-only: O(new rows) state writes per batch
        self._seen.appendList([(t,) for t in new_ts])
        self._chunks.appendList(new_chunks)
        if self._fire.get() is None:
            # First record after a flush schedules the punctuation one
            # grace later in event time; registerTimer persists across
            # batches until it fires (unlike the applyInPandasWithState
            # timeout, which is re-armed per invocation).
            fire_at = min(new_ts) // 1000 + self._grace_ms
            fire_at = max(fire_at, timerValues.getCurrentWatermarkInMs() + 1)
            self._fire.update((fire_at,))
            self._handle.registerTimer(fire_at)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # Ordered flush-all (Application.java:72-83): emit the ENTIRE
        # buffer sorted by event time, clear state.
        ts_us = np.asarray([r[0] for r in self._seen.get()], dtype="int64")
        chunks = [r[0] for r in self._chunks.get()]
        self._seen.clear()
        self._chunks.clear()
        self._fire.clear()
        if not len(ts_us):
            return iter(())
        return iter(
            [
                _decode_chunks_sorted(
                    chunks, ts_us, self._columns, self._field_types
                )
            ]
        )

    def close(self) -> None:
        pass


def reorder_stream_tws(
    df: DataFrame,
    ts_col: str,
    grace: str = "10 hours",
    key_cols: Sequence[str] | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """`reorder_stream` on the transformWithStateInPandas backend.
    Same parameters and semantics (see reorder.reorder_stream)."""
    if watermark_delay is None:
        watermark_delay = grace

    out_schema = df.schema
    field_types = {f.name: f.dataType for f in out_schema.fields}
    ts_fields = [
        f.name for f in out_schema.fields if isinstance(f.dataType, T.TimestampType)
    ]
    columns = [f.name for f in out_schema.fields]

    proc = _ReorderProcessor(
        columns, ts_fields, field_types, ts_col, _grace_ms(grace)
    )

    stream = df.withWatermark(ts_col, watermark_delay)
    if key_cols:
        grouped = stream.groupBy(*key_cols)
    else:
        stream = stream.withColumn(_GLOBAL_KEY, F.lit(0))
        grouped = stream.groupBy(_GLOBAL_KEY)

    out = grouped.transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="eventTime",
    )
    return out.select(*columns)
