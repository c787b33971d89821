"""Streaming event-time re-sequencer on the Spark 4.x
`transformWithStateInPandas` API — same semantics as
`reorder.reorder_stream` (see that module for the reference mapping,
Application.java:65-94), different state backend.

Why both backends exist: `applyInPandasWithState` (3.4+) carries the
whole buffer as ONE state tuple — every micro-batch rewrites it.
`transformWithStateInPandas` (4.0+) exposes composable typed state:
the buffer is a ListState (append-only writes per batch — RocksDB
merge instead of full rewrite) plus a ValueState for the pending
punctuation, and timers are first-class (`registerTimer` persists
until fired, closer to the reference's `context.schedule`,
Application.java:65-69). At large buffered volumes per key the
ListState append path writes O(new rows) per batch instead of
O(buffer), which is the scale argument for this backend.

Environment requirement: the transformWithState runtime speaks
protobuf to the JVM (`google.protobuf` must be importable on driver
and executors — it ships with any standard PySpark cluster install).
`tws_available()` gates callers; containers without protobuf use
`reorder.reorder_stream`, which has no extra dependency.
"""

from __future__ import annotations

from typing import Iterator, Sequence

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

from .reorder import _grace_ms, _row_to_json, _rows_to_pdf

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
        self._buf = handle.getListState("buffer", "ts_us BIGINT, payload STRING")
        self._fire = handle.getValueState("fire", "fire_at_ms BIGINT")
        self._handle = handle

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        buffered = list(self._buf.get())
        seen = {t for t, _ in buffered}
        added: list[tuple[int, str]] = []
        for pdf in rows:
            if pdf.empty:
                continue
            micros = pdf[self._ts_col].astype("datetime64[us]").astype("int64")
            for i in range(len(pdf)):
                t = int(micros.iloc[i])
                if t in seen:
                    continue  # first-writer-wins (Application.java:89-93)
                seen.add(t)
                added.append((t, _row_to_json(pdf.iloc[i], self._ts_fields)))
        if not added:
            return iter(())

        if buffered:
            self._buf.put(buffered + added)  # appendList when available
        else:
            self._buf.put(added)
        if self._fire.get() is None:
            # First record after a flush schedules the punctuation one
            # grace later in event time; registerTimer persists across
            # batches until it fires (unlike the applyInPandasWithState
            # timeout, which is re-armed per invocation).
            fire_at = min(t for t, _ in added) // 1000 + self._grace_ms
            fire_at = max(fire_at, timerValues.getCurrentWatermarkInMs() + 1)
            self._fire.update((fire_at,))
            self._handle.registerTimer(fire_at)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # Ordered flush-all (Application.java:72-83): emit the ENTIRE
        # buffer sorted by event time, clear state.
        buffered = list(self._buf.get())
        self._buf.clear()
        self._fire.clear()
        if not buffered:
            return iter(())
        buffered.sort(key=lambda p: p[0])
        import json

        rows = [json.loads(payload) for _, payload in buffered]
        return iter([_rows_to_pdf(rows, self._columns, self._field_types)])

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
