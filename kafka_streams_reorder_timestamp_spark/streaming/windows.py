"""Streaming windowed aggregation + dedup helpers.

The reference has no windowed aggregations (its punctuation timer is a
flush schedule, not a window — SURVEY §2.2); these are the standard
Structured Streaming surfaces a user of this engine expects next to
the reorder operator, built entirely from engine primitives:
`window()` / `session_window()` + `withWatermark` for state eviction,
`dropDuplicates`(`WithinWatermark`) for streaming dedup (the
generalization of the reorder operator's timestamp dedup,
reference: src/main/java/org/example/Application.java:89-93).

State sizing at scale: every helper keys its state by (window x group
key), so state is bounded by watermark horizon x group cardinality —
the same bound the reference gets from grace-period flushes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Non-overlapping event-time windows: one state entry per
    (window, group); closed windows emit once the watermark passes."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            *aggs.keys(),
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide).alias("w"), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            *aggs.keys(),
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Dynamic-length sessions closed by `gap` of event-time
    inactivity — the streaming counterpart of the batch sessionization
    in events_queries.user_sessions."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            *aggs.keys(),
        )
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "10 hours",
) -> DataFrame:
    """Streaming first-writer-wins dedup on `key_cols`, state evicted
    by the watermark — the reference's put-if-absent check
    (Application.java:89-93) generalized beyond the timestamp key.

    Uses `dropDuplicatesWithinWatermark` so two records with the same
    key are collapsed whenever they arrive within the watermark delay
    of each other, and state for old keys is dropped (bounded state —
    plain streaming dropDuplicates would keep every key forever)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    before: str = "0 seconds",
    after: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on equi-keys plus an event-time interval:
    right rows within [left_ts - before, left_ts + after].

    `how`: "inner" or "left_outer". The outer form emits an
    all-null right side for left rows with no interval match — but only
    once the watermark proves no match can still arrive, which is why
    outer stream-stream joins REQUIRE the time-bound condition (Spark
    rejects an unbounded outer join: the null verdict would never be
    safe to emit).

    Both sides carry watermarks, so Spark bounds the join state to the
    interval + watermark horizon on each side (otherwise a
    stream-stream join would buffer both streams forever). State per
    key ~ (rate x (interval + watermark)) — the knob that keeps this
    viable at cluster scale.

    Works identically on batch DataFrames (watermark is a no-op there),
    which is how the test pins stream-vs-batch equivalence. Key columns
    are returned once (from the left side); both timestamp columns are
    kept. Non-key column names must not collide (rename before
    joining).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("interval_join supports inner and left_outer")
    on = list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    l_w = left.withWatermark(left_ts, watermark).alias("l")
    r_w = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lo = F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {before}")
    hi = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {after}")
    cond = cond & F.col(f"r.{right_ts}").between(lo, hi)
    joined = l_w.join(r_w, cond, how)
    keep = (
        [F.col(f"l.{k}").alias(k) for k in on]
        + [F.col(f"l.{c}").alias(c) for c in left.columns if c not in on]
        + [F.col(f"r.{c}").alias(c) for c in right.columns if c not in on]
    )
    return joined.select(*keep)


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream with a dimension table.

    No watermark needed — static side state is not streaming state; the
    dim is (re)read per micro-batch. `broadcast_dim` ships it to every
    task, the right default for dimension tables (a shuffled stream-
    static join would re-partition every micro-batch on the join key).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=list(on), how=how)


_VIEW_MANIFEST = "_LATEST"


def _view_fs(spark, path: str):
    """Hadoop FileSystem + Path for `path` (works for file:// and any
    cluster FS the session is configured for)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def _list_manifests(fs, root) -> list[tuple[int, "object"]]:
    """All versioned manifests ``_LATEST.<seq>`` under the view root as
    (seq, Path), ascending by seq. A legacy unversioned ``_LATEST`` (from
    a view written by an older build) is returned as seq -1 so any
    versioned manifest supersedes it."""
    if not fs.exists(root):
        return []
    found: list[tuple[int, object]] = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name == _VIEW_MANIFEST:
            found.append((-1, status.getPath()))
        elif name.startswith(_VIEW_MANIFEST + "."):
            suffix = name[len(_VIEW_MANIFEST) + 1 :]
            if suffix.isdigit():
                found.append((int(suffix), status.getPath()))
    found.sort(key=lambda t: t[0])
    return found


def _read_manifest(jvm, fs, manifest_path) -> str:
    stream = fs.open(manifest_path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        ).strip()
    finally:
        stream.close()


def current_view_snapshot(spark, view_path: str) -> str | None:
    """Resolve the live snapshot directory of a maintained view, or
    None if the view was never created. Raises if a manifest exists
    but points at a missing snapshot (corruption must fail loudly, not
    masquerade as an empty first batch).

    The manifest is versioned (``_LATEST.<seq>``; highest seq wins), so
    a swap is a pure create — there is never a moment where data exists
    with no manifest, and a crash between creates leaves the previous
    manifest live."""
    jvm, fs, root = _view_fs(spark, view_path)
    manifests = _list_manifests(fs, root)
    if not manifests:
        if fs.exists(root) and fs.listStatus(root).__len__() > 0:
            raise RuntimeError(
                f"view at {view_path} has data but no {_VIEW_MANIFEST} "
                "manifest — refusing to treat a corrupted view as a "
                "first batch (that would silently discard accumulated "
                "aggregates)"
            )
        return None
    _, live = manifests[-1]
    name = _read_manifest(jvm, fs, live)
    snap = jvm.org.apache.hadoop.fs.Path(root, name)
    if not fs.exists(snap):
        raise RuntimeError(
            f"view manifest {view_path}/{live.getName()} points at "
            f"missing snapshot {name} — view is corrupted; restore "
            "from checkpoint replay or rebuild"
        )
    return str(snap)


def _writer_view_snapshot(
    spark, view_path: str, batch_id: int
) -> str | None:
    """current_view_snapshot for the UPSERT path: a root that holds
    ONLY unpublished attempt dirs of the REPLAYING batch itself
    (``b=<batch_id>a<n>``) and/or manifest tmp files — the state a
    crash between the first snapshot write and the first manifest
    create legitimately leaves behind — resolves to None (the replay
    writes a fresh attempt and publishes it) instead of raising.

    The benign set is keyed to ``batch_id`` on purpose: an attempt dir
    from any OTHER batch can only be manifest-less if its publish
    succeeded and the manifests were later lost — published snapshots
    are also ``b=*`` dirs, so accepting every ``b=*`` here would let
    total manifest loss after N publishes silently rebuild the view
    from the current micro-batch alone (and then prune the orphaned
    snapshots, discarding all prior aggregate state). Foreign ``b=*``
    dirs, real data files, or anything else without a manifest still
    raise: that is manifest loss, not an interrupted first publish."""
    try:
        return current_view_snapshot(spark, view_path)
    except RuntimeError:
        _, fs, root = _view_fs(spark, view_path)
        if _list_manifests(fs, root):
            raise  # manifest exists but points at a missing snapshot
        own_attempt = f"b={batch_id}a"
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            benign = (
                status.isDirectory()
                and name.startswith(own_attempt)
                and name[len(own_attempt) :].isdigit()
            ) or name.startswith("." + _VIEW_MANIFEST + ".tmp.")
            if not benign:
                raise
        return None


def read_view(spark, view_path: str) -> DataFrame:
    """Read the current snapshot of a maintained view."""
    snap = current_view_snapshot(spark, view_path)
    if snap is None:
        raise FileNotFoundError(f"view {view_path} does not exist yet")
    return spark.read.parquet(snap)


def maintain_view(
    agg_stream: DataFrame,
    view_path: str,
    key_cols: Sequence[str],
    checkpoint: str,
):
    """Incremental materialized-view maintenance: an UPDATE-mode
    aggregated stream upserts its changed rows into a parquet view via
    foreachBatch — the continuous-aggregate pattern (keep an hourly
    rollup current forever without ever re-scanning history).

    Each micro-batch delivers only the (key, aggregate) rows whose
    values changed; the upsert anti-joins them out of the stored view
    and unions the replacements in.

    Crash safety: the view is never overwritten in place. Each upsert
    ATTEMPT writes a fresh snapshot directory ``b=<batch_id>a<attempt>``
    (attempt = first unused index, so a replayed micro-batch never
    writes onto the directory its own lazy plan is reading — the
    self-overwrite race a shared ``b=<batch_id>`` name would have) and
    then publishes it by CREATING the next versioned manifest
    ``_LATEST.<seq>``; readers resolve the highest seq. Because the
    swap is a pure create (no delete-then-rename of the live manifest),
    there is no moment where data exists without a manifest, and a
    crash at any point leaves the previous manifest live and complete.
    A manifest that points nowhere, or real data with no manifest,
    raises instead of being misread as "first batch" — with one carve-
    out: a root holding only the replaying batch's OWN unpublished
    attempt dirs ``b=<batch_id>a<n>`` (the state a crash before the
    FIRST publish leaves) is "never created", and the replayed batch
    publishes normally. Attempt dirs of other batches do not qualify —
    manifest-less published snapshots mean manifest loss and raise. Pruning is delayed by
    one generation: the previous live snapshot (and its manifest) are
    kept so a reader that resolved the old manifest just before the
    swap still finds its data; only older generations are deleted. At
    scale the snapshot write rewrites only the view (key, aggregate)
    rows — never history — and can be partitioned by key range so the
    anti-join is partition-local.

    Returns the started StreamingQuery.
    """
    keys = list(key_cols)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)
        jvm, fs, root = _view_fs(spark, view_path)
        snap = _writer_view_snapshot(spark, view_path, batch_id)
        if snap is None:
            merged = batch
        else:
            existing = spark.read.parquet(snap)
            merged = existing.join(
                batch.select(keys), keys, "left_anti"
            ).unionByName(batch)
        # Fresh dir per attempt: never reuse a name that exists (a
        # previous crashed attempt, or — on replay — the live snapshot
        # this merge is lazily reading from).
        attempt = 0
        while True:
            new_name = f"b={batch_id}a{attempt}"
            new_path = jvm.org.apache.hadoop.fs.Path(root, new_name)
            if not fs.exists(new_path):
                break
            attempt += 1
        merged.write.mode("overwrite").parquet(str(new_path))

        # Publish: create the next versioned manifest. Write a temp
        # file then rename to the (nonexistent) final name — atomic on
        # HDFS and POSIX; on object stores pair with a rename-capable
        # metadata layer.
        manifests = _list_manifests(fs, root)
        next_seq = (manifests[-1][0] + 1) if manifests else 0
        final = jvm.org.apache.hadoop.fs.Path(
            root, f"{_VIEW_MANIFEST}.{next_seq}"
        )
        tmp = jvm.org.apache.hadoop.fs.Path(
            root, f".{_VIEW_MANIFEST}.tmp.{batch_id}.{attempt}"
        )
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(new_name.encode("utf-8")))
        finally:
            out.close()
        if not fs.rename(tmp, final):
            raise RuntimeError(f"manifest swap failed for {view_path}")

        # Prune, one generation behind: keep the live snapshot and the
        # previous live one (a concurrent reader may have just resolved
        # it); drop everything older, plus manifests older than the
        # previous generation and any orphaned tmp files.
        keep_names = {new_name}
        keep_seqs = {next_seq}
        if manifests:
            prev_seq, prev_path = manifests[-1]
            keep_seqs.add(prev_seq)
            keep_names.add(_read_manifest(jvm, fs, prev_path))
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if (
                status.isDirectory()
                and name.startswith("b=")
                and name not in keep_names
            ):
                fs.delete(status.getPath(), True)
            elif name.startswith("." + _VIEW_MANIFEST + ".tmp."):
                fs.delete(status.getPath(), False)
            elif name == _VIEW_MANIFEST and -1 not in keep_seqs:
                fs.delete(status.getPath(), False)
            elif (
                name.startswith(_VIEW_MANIFEST + ".")
                and name[len(_VIEW_MANIFEST) + 1 :].isdigit()
                and int(name[len(_VIEW_MANIFEST) + 1 :]) not in keep_seqs
            ):
                fs.delete(status.getPath(), False)

    return (
        agg_stream.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
