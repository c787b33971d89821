"""Streaming window/dedup helpers under Trigger.AvailableNow: file
source → helper → memory sink, deterministic event times.

The final no-data micro-batch advances the watermark past every
window, so all windows close and results are complete — the streaming
answers are then compared against the equivalent batch aggregation
(the Dataflow-style "streaming must converge to the batch answer"
check).
"""

from __future__ import annotations

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_reorder_timestamp_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

BASE = "2024-01-01 00:{m:02d}:00"
ROWS = [
    # user 1: events at 00:00..00:04 and 00:40..00:41 (two sessions at
    # 30-min gap); user 2: 00:02, 00:31
    *[(BASE.format(m=m), 1, 1.0) for m in (0, 1, 2, 3, 4)],
    *[(BASE.format(m=m), 1, 2.0) for m in (40, 41)],
    (BASE.format(m=2), 2, 5.0),
    (BASE.format(m=31), 2, 7.0),
    # watermark sentinel: append mode only emits windows the watermark
    # has passed, so a far-future row closes every window above; its
    # own (still-open) windows are excluded from the comparisons.
    ("2024-01-01 06:00:00", 99, 0.0),
]
SENTINEL_USER = 99


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("stream_in")
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in ROWS], ["ts_s", "user_id", "value"]
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
    df.coalesce(1).write.mode("overwrite").parquet(str(path))
    return str(path)


def run_stream(spark, src_path, build, tmp_path):
    src = spark.readStream.schema(SCHEMA).parquet(src_path)
    out = build(src)
    name = f"mem_{abs(hash(str(tmp_path)))}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_tumbling_matches_batch(spark, stream_input, tmp_path):
    got = run_stream(
        spark,
        stream_input,
        lambda s: tumbling_agg(
            s, "ts", "10 minutes", ["user_id"],
            {"n": F.count(F.lit(1)), "sum_v": F.sum("value")},
            watermark="1 minute",
        ),
        tmp_path,
    ).toPandas()
    batch = (
        spark.read.parquet(stream_input)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n", "sum_v")
        .toPandas()
    )
    got = got[got.user_id != SENTINEL_USER]
    batch = batch[batch.user_id != SENTINEL_USER]
    key = ["window_start", "user_id"]
    got_s = got[key + ["n", "sum_v"]].sort_values(key).reset_index(drop=True)
    batch_s = batch.sort_values(key).reset_index(drop=True)
    assert got_s.equals(batch_s)


def test_sliding_windows_overlap(spark, stream_input, tmp_path):
    got = run_stream(
        spark,
        stream_input,
        lambda s: sliding_agg(
            s, "ts", "10 minutes", "5 minutes", ["user_id"],
            watermark="1 minute",
        ),
        tmp_path,
    ).toPandas()
    # the 00:02 event of user 2 must appear in two overlapping windows
    # (23:55-00:05 and 00:00-00:10)
    u2 = got[got.user_id == 2]
    assert len(u2[u2.n_events > 0]) >= 3


def test_session_windows_close_on_gap(spark, stream_input, tmp_path):
    got = run_stream(
        spark,
        stream_input,
        lambda s: session_agg(
            s, "ts", "30 minutes", ["user_id"], watermark="1 minute"
        ),
        tmp_path,
    ).toPandas()
    got = got[got.user_id != SENTINEL_USER]
    by_user = got.groupby("user_id").size().to_dict()
    # user 1: 00:00-00:04 cluster and 00:40-00:41 cluster → 2 sessions;
    # user 2: 00:02 and 00:31 are 29 min apart → ONE session (gap=30)
    assert by_user == {1: 2, 2: 1}
    u1 = got[got.user_id == 1].sort_values("session_start")
    assert list(u1["n_events"]) == [5, 2]


def test_stream_dedup_within_watermark(spark, tmp_path):
    path = tmp_path / "in"
    rows = [
        ("2024-01-01 00:00:00", 1, 1.0),
        ("2024-01-01 00:00:30", 1, 99.0),  # same user key within watermark → dropped
        ("2024-01-01 00:05:00", 2, 2.0),
    ]
    (
        spark.createDataFrame(rows, ["ts_s", "user_id", "value"])
        .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
        .coalesce(1)
        .write.parquet(str(path))
    )
    got = run_stream(
        spark,
        str(path),
        lambda s: stream_dedup(s, ["user_id"], "ts", watermark="10 minutes"),
        tmp_path,
    ).toPandas()
    assert sorted(got["user_id"]) == [1, 2]
    assert float(got[got.user_id == 1]["value"].iloc[0]) == 1.0


def test_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join converges to the batch join answer:
    clicks within [impression_ts, impression_ts + 10 min] per user."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        interval_join,
    )

    imp_rows = [
        ("2024-01-01 00:00:00", 1, "i1"),
        ("2024-01-01 00:20:00", 1, "i2"),
        ("2024-01-01 00:00:00", 2, "i3"),
        ("2024-01-01 06:00:00", 99, "i-sentinel"),
    ]
    clk_rows = [
        ("2024-01-01 00:05:00", 1, "c1"),   # joins i1
        ("2024-01-01 00:25:00", 1, "c2"),   # joins i2
        ("2024-01-01 00:35:00", 1, "c3"),   # outside both intervals
        ("2024-01-01 00:09:59", 2, "c4"),   # joins i3 (inside bound)
        ("2024-01-01 06:00:00", 99, "c-sentinel"),
    ]
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    spark.createDataFrame(imp_rows, ["ts_s", "user_id", "imp_id"]).select(
        F.to_timestamp("ts_s").alias("imp_ts"), "user_id", "imp_id"
    ).coalesce(1).write.parquet(str(imp_dir))
    spark.createDataFrame(clk_rows, ["ts_s", "user_id", "click_id"]).select(
        F.to_timestamp("ts_s").alias("click_ts"), "user_id", "click_id"
    ).coalesce(1).write.parquet(str(clk_dir))

    imp_schema = "imp_ts timestamp, user_id bigint, imp_id string"
    clk_schema = "click_ts timestamp, user_id bigint, click_id string"

    def join(l, r):
        return interval_join(
            l, r, on=["user_id"], left_ts="imp_ts", right_ts="click_ts",
            before="0 seconds", after="10 minutes", watermark="1 minute",
        )

    q = (
        join(
            spark.readStream.schema(imp_schema).parquet(str(imp_dir)),
            spark.readStream.schema(clk_schema).parquet(str(clk_dir)),
        )
        .writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("ij_out").toPandas()
    batch = join(
        spark.read.parquet(str(imp_dir)), spark.read.parquet(str(clk_dir))
    ).toPandas()

    got = got[got.user_id != 99].sort_values(["imp_id", "click_id"]).reset_index(drop=True)
    batch = batch[batch.user_id != 99].sort_values(["imp_id", "click_id"]).reset_index(drop=True)
    assert set(zip(got.imp_id, got.click_id)) == {
        ("i1", "c1"), ("i2", "c2"), ("i3", "c4"),
    }
    assert got[batch.columns].equals(batch)


def test_interval_join_rejects_column_collision(spark):
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        interval_join,
    )

    l = spark.createDataFrame([], "k bigint, ts timestamp, v double")
    r = spark.createDataFrame([], "k bigint, rts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        interval_join(l, r, on=["k"], left_ts="ts", right_ts="rts")


def test_stream_static_enrich(spark, stream_input, tmp_path):
    """Stream-static broadcast join: every streamed row picks up its
    dimension attributes; rows without a dim match keep nulls (left)."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        enrich_with_static,
    )

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "tier"]
    )
    src = spark.readStream.schema(SCHEMA).parquet(stream_input)
    q = (
        enrich_with_static(src, dim, on=["user_id"])
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("enriched").toPandas()
    assert len(got) == len(ROWS)
    tiers = got.groupby("user_id")["tier"].first()
    assert tiers[1] == "gold" and tiers[2] == "silver"
    assert pd.isna(tiers[SENTINEL_USER])


def test_maintain_view_converges_to_batch_answer(spark, tmp_path):
    """Incremental view maintenance: per-user counts upserted across
    multiple micro-batches (one file each) end up identical to the
    one-shot batch aggregation over all input."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        maintain_view,
        read_view,
    )

    src = tmp_path / "in"
    rows1 = [("2024-01-01 00:00:00", 1, 1.0), ("2024-01-01 00:01:00", 2, 2.0)]
    rows2 = [("2024-01-01 00:02:00", 1, 3.0), ("2024-01-01 00:03:00", 3, 4.0)]
    for rows in (rows1, rows2):
        (
            spark.createDataFrame(rows, ["ts_s", "user_id", "value"])
            .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
            .coalesce(1)
            .write.mode("append").parquet(str(src))
        )

    view = str(tmp_path / "view")
    agg = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force >= 2 upsert batches
        .parquet(str(src))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
    )
    q = maintain_view(agg, view, ["user_id"], str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = (
        read_view(spark, view).toPandas().sort_values("user_id").reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got[batch.columns].equals(batch)


def test_maintain_view_corruption_fails_loudly(spark, tmp_path):
    """A view whose live snapshot is gone (or whose manifest vanished
    while data remains) must raise, never be misread as 'first batch' —
    that silent fallback would discard all accumulated aggregates."""
    import shutil

    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        current_view_snapshot,
        maintain_view,
        read_view,
    )

    src = tmp_path / "in"
    (
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 1, 1.0)], ["ts_s", "user_id", "value"]
        )
        .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(str(src))
    )
    view = tmp_path / "view"
    agg = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src))
        .groupBy("user_id")
        .agg(F.sum("value").alias("sum_v"))
    )
    q = maintain_view(agg, str(view), ["user_id"], str(tmp_path / "ck"))
    q.awaitTermination(300)
    assert read_view(spark, str(view)).count() == 1

    # Manifest points at a deleted snapshot -> loud failure.
    snap = current_view_snapshot(spark, str(view))
    shutil.rmtree(snap.removeprefix("file:"))
    with pytest.raises(RuntimeError, match="missing snapshot"):
        read_view(spark, str(view))

    # Data present but manifests gone -> loud failure, not first-batch.
    (view / "b=999").mkdir()
    for m in view.glob("_LATEST*"):
        m.unlink()
    with pytest.raises(RuntimeError, match="no _LATEST"):
        current_view_snapshot(spark, str(view))


def test_interval_join_left_outer_matches_batch(spark, tmp_path):
    """Left-outer stream-stream interval join: impressions with no
    click inside their interval surface once with a null click side
    (emitted only after the watermark passes), and the streaming
    answer converges to the batch left join."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        interval_join,
    )

    imp_rows = [
        ("2024-01-01 00:00:00", 1, "i1"),    # gets c1
        ("2024-01-01 01:00:00", 3, "i4"),    # NO click -> null row
        ("2024-01-01 06:00:00", 99, "i-sentinel"),
    ]
    clk_rows = [
        ("2024-01-01 00:05:00", 1, "c1"),
        ("2024-01-01 06:00:00", 99, "c-sentinel"),
    ]
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    spark.createDataFrame(imp_rows, ["ts_s", "user_id", "imp_id"]).select(
        F.to_timestamp("ts_s").alias("imp_ts"), "user_id", "imp_id"
    ).coalesce(1).write.parquet(str(imp_dir))
    spark.createDataFrame(clk_rows, ["ts_s", "user_id", "click_id"]).select(
        F.to_timestamp("ts_s").alias("click_ts"), "user_id", "click_id"
    ).coalesce(1).write.parquet(str(clk_dir))

    imp_schema = "imp_ts timestamp, user_id bigint, imp_id string"
    clk_schema = "click_ts timestamp, user_id bigint, click_id string"

    def join(l, r):
        return interval_join(
            l, r, on=["user_id"], left_ts="imp_ts", right_ts="click_ts",
            before="0 seconds", after="10 minutes", watermark="1 minute",
            how="left_outer",
        )

    q = (
        join(
            spark.readStream.schema(imp_schema).parquet(str(imp_dir)),
            spark.readStream.schema(clk_schema).parquet(str(clk_dir)),
        )
        .writeStream.format("memory")
        .queryName("ij_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("ij_outer").toPandas()
    got = got[got.user_id != 99]
    batch = join(
        spark.read.parquet(str(imp_dir)), spark.read.parquet(str(clk_dir))
    ).toPandas()
    batch = batch[batch.user_id != 99]
    key = ["imp_id"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert list(g["imp_id"]) == list(b["imp_id"]) == ["i1", "i4"]
    assert g[g.imp_id == "i4"]["click_id"].isna().all()
    assert b[b.imp_id == "i4"]["click_id"].isna().all()
    assert g[g.imp_id == "i1"]["click_id"].iloc[0] == "c1"


def test_streaming_ema_matches_batch_recurrence(spark, tmp_path):
    """Keyed streaming EMA across >=2 micro-batches equals the plain
    sequential recurrence over the full ordered input — the
    fold-composition property that makes the operator batch-boundary
    independent."""
    from kafka_streams_reorder_timestamp_spark.streaming.stateful import (
        streaming_ema,
    )

    rows1 = [
        ("2024-01-01 00:00:00", 1, 10.0),
        ("2024-01-01 00:01:00", 1, 20.0),
        ("2024-01-01 00:00:30", 2, 5.0),
    ]
    rows2 = [
        ("2024-01-01 00:02:00", 1, 40.0),
        ("2024-01-01 00:03:00", 2, 15.0),
    ]
    src = tmp_path / "in"
    for rows in (rows1, rows2):
        (
            spark.createDataFrame(rows, ["ts_s", "user_id", "value"])
            .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    q = (
        streaming_ema(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            ["user_id"],
            "ts",
            "value",
            alpha=0.5,
        )
        .writeStream.format("memory")
        .queryName("ema_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("ema_out").toPandas()
    # last snapshot per key
    final = (
        got.sort_values(["user_id", "n_events"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )

    # plain recurrence over the full ordered input
    import pandas as pd

    all_rows = pd.DataFrame(
        rows1 + rows2, columns=["ts_s", "user_id", "value"]
    ).sort_values(["user_id", "ts_s"])
    expect = {}
    for uid, grp in all_rows.groupby("user_id"):
        ema = None
        for v in grp["value"]:
            ema = v if ema is None else 0.5 * v + 0.5 * ema
        expect[uid] = ema
    for uid, e in expect.items():
        assert abs(final.loc[uid, "ema"] - e) < 1e-9, (uid, e, final)
    assert int(final.loc[1, "n_events"]) == 3
    assert int(final.loc[2, "n_events"]) == 2


def test_maintain_view_snapshot_generations(spark, tmp_path):
    """Crash-safety mechanics of the versioned-manifest view: each
    upsert publishes a fresh attempt-suffixed snapshot dir via a pure
    manifest CREATE (no delete-then-rename window), pruning lags one
    generation (previous live snapshot + manifest survive for readers
    that resolved just before the swap), and a resumed stream keeps
    upserting into the same view."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        current_view_snapshot,
        maintain_view,
        read_view,
    )

    src = tmp_path / "in"

    def feed(rows):
        (
            spark.createDataFrame(rows, ["ts_s", "user_id", "value"])
            .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    def run():
        agg = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .groupBy("user_id")
            .agg(F.sum("value").alias("sum_v"))
        )
        q = maintain_view(agg, str(view), ["user_id"], str(tmp_path / "ck"))
        q.awaitTermination(300)

    view = tmp_path / "view"
    feed([("2024-01-01 00:00:00", 1, 1.0)])
    feed([("2024-01-01 00:01:00", 1, 2.0), ("2024-01-01 00:02:00", 2, 4.0)])
    run()

    snaps = sorted(p.name for p in view.glob("b=*"))
    manifests = sorted(p.name for p in view.glob("_LATEST.*"))
    # attempt-suffixed names; at most live + previous generation kept
    assert all("a" in s for s in snaps), snaps
    assert 1 <= len(snaps) <= 2, snaps
    assert 1 <= len(manifests) <= 2, manifests
    # the live snapshot must be the one the HIGHEST-seq manifest names
    live = current_view_snapshot(spark, str(view))
    highest = max(manifests, key=lambda m: int(m.split(".")[-1]))
    assert live.split("/")[-1] == (view / highest).read_text().strip()
    assert read_view(spark, str(view)).count() == 2

    # Resume with more data: same checkpoint, view keeps accumulating.
    feed([("2024-01-01 00:03:00", 2, 8.0), ("2024-01-01 00:04:00", 3, 1.5)])
    run()
    got = (
        read_view(spark, str(view))
        .toPandas()
        .set_index("user_id")["sum_v"]
        .sort_index()
    )
    assert got.to_dict() == {1: 3.0, 2: 12.0, 3: 1.5}
    # pruning still bounded after the second run
    assert len(list(view.glob("b=*"))) <= 2
    assert len(list(view.glob("_LATEST.*"))) <= 2


def test_maintain_view_legacy_manifest_compat(spark, tmp_path):
    """A view written by the pre-versioning layout (plain ``_LATEST``
    file) is still readable, and the next upsert supersedes it with a
    versioned manifest without ever leaving the view manifest-less."""
    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        current_view_snapshot,
        maintain_view,
        read_view,
    )

    view = tmp_path / "view"
    view.mkdir()
    (
        spark.createDataFrame([(1, 1.0)], ["user_id", "sum_v"])
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(view / "b=0"))
    )
    (view / "_LATEST").write_text("b=0")
    assert current_view_snapshot(spark, str(view)).endswith("b=0")
    assert read_view(spark, str(view)).count() == 1

    src = tmp_path / "in"
    (
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 2, 5.0)], ["ts_s", "user_id", "value"]
        )
        .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(str(src))
    )
    agg = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src))
        .groupBy("user_id")
        .agg(F.sum("value").alias("sum_v"))
    )
    q = maintain_view(agg, str(view), ["user_id"], str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (
        read_view(spark, str(view))
        .toPandas()
        .set_index("user_id")["sum_v"]
        .sort_index()
    )
    assert got.to_dict() == {1: 1.0, 2: 5.0}
    assert list(view.glob("_LATEST.*")), "versioned manifest should exist"


def test_maintain_view_first_publish_crash_recovers(spark, tmp_path):
    """A crash between the FIRST snapshot write and the first manifest
    create leaves only an unpublished b=* attempt dir. The reader-facing
    resolver still refuses the manifest-less state, but the WRITER must
    recognize it as an interrupted publish and recover: the replayed
    batch writes a fresh attempt and publishes normally."""
    import pytest as _pytest

    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        current_view_snapshot,
        maintain_view,
        read_view,
    )

    view = tmp_path / "view"
    view.mkdir()
    # simulate the orphaned first attempt (no manifest was ever created)
    (
        spark.createDataFrame([(1, 99.0)], ["user_id", "sum_v"])
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(view / "b=0a0"))
    )
    with _pytest.raises(RuntimeError, match="no _LATEST"):
        current_view_snapshot(spark, str(view))  # readers still fail loudly

    src = tmp_path / "in"
    (
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 1, 1.0), ("2024-01-01 00:01:00", 2, 2.0)],
            ["ts_s", "user_id", "value"],
        )
        .select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(str(src))
    )
    agg = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src))
        .groupBy("user_id")
        .agg(F.sum("value").alias("sum_v"))
    )
    q = maintain_view(agg, str(view), ["user_id"], str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (
        read_view(spark, str(view))
        .toPandas()
        .set_index("user_id")["sum_v"]
        .sort_index()
    )
    # the orphaned attempt's contents are NOT merged (it was never
    # published); the replay's own aggregation is the published state
    assert got.to_dict() == {1: 1.0, 2: 2.0}


def test_writer_refuses_foreign_attempt_dirs_as_first_batch(spark, tmp_path):
    """Total manifest loss after N publishes leaves published b=* dirs
    with no manifest. The writer's first-publish carve-out must NOT
    accept those as 'never created' — that would rebuild the view from
    one micro-batch and prune the orphans, silently discarding all
    prior aggregate state. Only the replaying batch's own attempt dirs
    b=<batch_id>a<n> are benign."""
    import pytest as _pytest

    from kafka_streams_reorder_timestamp_spark.streaming.windows import (
        _writer_view_snapshot,
    )

    view = tmp_path / "view"
    view.mkdir()
    df = spark.createDataFrame([(1, 99.0)], ["user_id", "sum_v"]).coalesce(1)
    # two published-then-manifest-lost generations (pruning keeps two)
    df.write.mode("overwrite").parquet(str(view / "b=0a0"))
    df.write.mode("overwrite").parquet(str(view / "b=1a0"))

    # any replaying batch sees at least one foreign b=* dir -> raise
    for bid in (0, 1, 2):
        with _pytest.raises(RuntimeError, match="no _LATEST"):
            _writer_view_snapshot(spark, str(view), bid)

    # but a root holding ONLY the replaying batch's own attempts is the
    # legitimate interrupted-first-publish state and resolves to None
    solo = tmp_path / "solo"
    solo.mkdir()
    df.write.mode("overwrite").parquet(str(solo / "b=7a0"))
    df.write.mode("overwrite").parquet(str(solo / "b=7a1"))
    assert _writer_view_snapshot(spark, str(solo), 7) is None
    with _pytest.raises(RuntimeError, match="no _LATEST"):
        _writer_view_snapshot(spark, str(solo), 8)


def test_streaming_heavy_hitters_mg_guarantee(spark, tmp_path):
    """Streaming Misra-Gries across micro-batches must honor the MG
    bound over the WHOLE stream: after N tokens with capacity c, the
    final snapshot (max seq) contains every token with true count >
    N/c, every reported count is a lower bound within N/c of truth,
    and the candidate set never exceeds c — micro-batch folding is
    exactly the one-pass algorithm over the concatenation."""
    from collections import Counter

    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_heavy_hitters,
    )

    rows, truth = [], Counter()
    for i in range(8000):
        toks = [f"noise{i}_{j}" for j in range(3)]
        if i % 10 == 0:
            toks.append("heavy_alpha")
        if i % 10 == 7:
            toks.append("heavy_beta")
        truth.update(toks)
        rows.append((i, toks))
    cap = 50
    n_total = sum(truth.values())
    assert truth["heavy_alpha"] > n_total / cap  # genuinely heavy

    src_dir, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    # several input files -> several micro-batches (maxFilesPerTrigger=1)
    df.repartition(4).write.parquet(str(src_dir))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    out = streaming_heavy_hitters(stream, "toks", capacity=cap)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = pd.concat(
        pd.read_parquet(p) for p in glob.glob(f"{out_dir}/part-*.parquet")
    )
    assert got["seq"].max() >= 2, "expected multiple micro-batches"
    final = got[got["seq"] == got["seq"].max()]
    assert int(final["n_seen"].iloc[0]) == n_total
    assert len(final) <= cap
    cand = dict(zip(final["token"], final["count_lb"]))
    slack = n_total / cap
    for heavy in ("heavy_alpha", "heavy_beta"):
        assert heavy in cand, f"{heavy} missing from final MG snapshot"
    for tok, c in cand.items():
        assert c <= truth[tok], (tok, c, truth[tok])
        assert c >= truth[tok] - slack, (tok, c, truth[tok], slack)


def test_streaming_distinct_hll_accuracy(spark, tmp_path):
    """Streaming HLL across micro-batches: the final (max-seq) per-key
    estimate must match exact COUNT(DISTINCT) within 5% (p=12 → ~1.6%
    standard error), with repeated values across batches NOT
    re-counted — the register fold is the one-pass sketch over the
    concatenated stream."""
    rows = []
    # key 'a': 700 distinct users, each seen 3 times (across batches);
    # key 'b': 90 distinct users seen once
    for u in range(700):
        rows += [("a", f"user{u}")] * 3
    for u in range(90):
        rows.append(("b", f"buser{u}"))
    df = spark.createDataFrame(rows, ["k", "user"])
    src, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df.repartition(4).write.parquet(str(src))

    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_distinct_hll,
    )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_distinct_hll(stream, "user", key_cols=["k"])
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = pd.concat(
        (pd.read_parquet(p) for p in glob.glob(f"{out_dir}/part-*.parquet")),
        ignore_index=True,
    )
    assert got["seq"].max() >= 2, "expected multiple micro-batches"
    final = got.loc[got.groupby("k")["seq"].idxmax()].set_index("k")
    assert final.loc["a", "n_rows"] == 2100
    assert abs(final.loc["a", "approx_distinct"] - 700) / 700 < 0.05
    assert abs(final.loc["b", "approx_distinct"] - 90) / 90 < 0.05


def test_hll_update_skips_numeric_nulls():
    """SQL NULL in a numeric value column surfaces as NaN in pandas;
    the register fold must skip it (str(nan) would register a phantom
    'nan' distinct that n_rows' notna() count excludes) — an all-null
    key must estimate 0, and nulls must not shift a mixed column."""
    import numpy as np
    import pandas as pd

    from kafka_streams_reorder_timestamp_spark.streaming.stateful import (
        _hll_estimate,
        _hll_update,
    )

    regs = np.zeros(1 << 12, dtype="uint8")
    _hll_update(regs, pd.Series([np.nan, None, pd.NaT], dtype="object"))
    assert _hll_estimate(regs) == 0.0

    all_null = pd.Series([np.nan] * 5, dtype="float64")
    _hll_update(regs, all_null)
    assert _hll_estimate(regs) == 0.0

    mixed = pd.Series([1.0, np.nan, 2.0, np.nan, 1.0], dtype="float64")
    _hll_update(regs, mixed)
    with_nulls = _hll_estimate(regs)
    clean_regs = np.zeros(1 << 12, dtype="uint8")
    _hll_update(clean_regs, pd.Series([1.0, 2.0, 1.0], dtype="float64"))
    assert with_nulls == _hll_estimate(clean_regs)


def test_streaming_quantiles_dd_accuracy(spark, tmp_path):
    """Streaming DDSketch quantiles across micro-batches: the final
    (max-seq) per-key p50/p90/p99 must be within the alpha=0.05
    relative-error bound of the exact quantiles over ALL values seen,
    with non-positive values tallied separately, and the per-key
    counter state staying under the bin cap."""
    import math as _math

    # key 'a': deterministic long-tailed positives (latency-shaped);
    # key 'b': small uniform set + some zeros/negatives
    a_vals = [_math.exp((i % 997) / 150.0) for i in range(6000)]
    b_vals = [float(1 + (i % 50)) for i in range(400)]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    rows += [("b", 0.0), ("b", -7.5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    src, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df.repartition(4).write.parquet(str(src))

    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_quantiles_dd,
    )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_quantiles_dd(stream, "v", key_cols=["k"], alpha=0.05)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = pd.concat(
        (pd.read_parquet(p) for p in glob.glob(f"{out_dir}/part-*.parquet")),
        ignore_index=True,
    )
    assert got["seq"].max() >= 2, "expected multiple micro-batches"
    final = got.loc[got.groupby("k")["seq"].idxmax()].set_index("k")

    assert final.loc["a", "n_values"] == 6000
    assert final.loc["a", "n_nonpos"] == 0
    assert final.loc["b", "n_values"] == 400
    assert final.loc["b", "n_nonpos"] == 2

    for key, vals in (("a", a_vals), ("b", b_vals)):
        srt = sorted(vals)
        for col, qq in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            true = srt[_math.ceil(qq * len(srt)) - 1]
            est = final.loc[key, col]
            assert abs(est - true) <= 0.05 * true + 1e-9, (key, col, est, true)


def test_streaming_near_dup_candidates(spark, tmp_path):
    """Streaming LSH candidates with the inverted index in the state
    store: batch 2's near-duplicates of batch-1 docs (drop last 2 of
    30 tokens) must each surface as a candidate pair against the
    STORED ids (cross-batch state carry), disjoint docs must never
    pair, and the old document must be the pair's first_doc."""
    base = [
        (i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(10)
    ]
    near = [
        (100 + i, " ".join(f"tok{i}_{j}" for j in range(28)))
        for i in range(10)
    ]
    src, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df1 = spark.createDataFrame(base, ["doc_id", "text"])
    df2 = spark.createDataFrame(near, ["doc_id", "text"])
    df1.coalesce(1).write.parquet(str(src))
    import time as _time

    _time.sleep(1.1)  # distinct mtime so file order == batch order
    df2.coalesce(1).write.mode("append").parquet(str(src))

    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_near_dup_candidates,
    )

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_near_dup_candidates(stream, "text", "doc_id")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = pd.concat(
        (pd.read_parquet(p) for p in glob.glob(f"{out_dir}/part-*.parquet")),
        ignore_index=True,
    )
    pairs = {
        (int(r.first_doc), int(r.new_doc)) for _, r in got.iterrows()
    }
    # every planted near-dup pairs with its stored source, old id first
    assert {(i, 100 + i) for i in range(10)} <= pairs, sorted(pairs)
    # and nothing else pairs (disjoint token universes per i)
    assert pairs == {(i, 100 + i) for i in range(10)}, sorted(pairs)


def test_streaming_freq_cms_bounds(spark, tmp_path):
    """Streaming CMS across micro-batches: final (max-seq) estimates
    must satisfy the CMS guarantee vs exact per-value counts — never
    undercount, overshoot <= e/width * N — and the counter fold must
    accumulate across batches (n_rows = total stream rows)."""
    import glob as _glob
    import math

    from kafka_streams_reorder_timestamp_spark.operators.events_queries import (
        CMS_WIDTH,
    )
    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_freq_cms,
    )

    rows = []
    truth = {}
    # value v repeated v+1 times, spread across files/batches
    for v in range(50):
        rows += [("a", v)] * (v + 1)
        truth[v] = v + 1
    df = spark.createDataFrame(rows, ["k", "val"])
    src, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df.repartition(4).write.parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    probes = list(range(0, 50, 5))
    q = (
        streaming_freq_cms(stream, "val", probes, key_cols=["k"])
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = pd.concat(
        (pd.read_parquet(p) for p in _glob.glob(f"{out_dir}/part-*.parquet")),
        ignore_index=True,
    )
    assert got["seq"].max() >= 2, "expected multiple micro-batches"
    final = got[got["seq"] == got["seq"].max()]
    n_total = sum(truth.values())
    assert int(final["n_rows"].iloc[0]) == n_total
    eps = math.e / CMS_WIDTH
    assert len(final) == len(probes)
    for _, r in final.iterrows():
        true = truth[r["probe"]]
        assert r["est_count"] >= true
        assert r["est_count"] - true <= eps * n_total


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """The micro-batch fold must produce EXACTLY the batch sketch over
    the concatenated stream: final streamed estimates == estimates
    from cms_aggregate over the same rows in one pass (counters add,
    so this is an equality, not a bound)."""
    import glob as _glob

    import numpy as np

    from kafka_streams_reorder_timestamp_spark.operators.events_queries import (
        cms_aggregate,
        cms_estimate,
    )
    from kafka_streams_reorder_timestamp_spark.streaming import (
        streaming_freq_cms,
    )

    rows = [("a", v % 17) for v in range(400)]
    df = spark.createDataFrame(rows, ["k", "val"])
    src, out_dir, ck = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    df.repartition(3).write.parquet(str(src))

    probes = list(range(17))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_freq_cms(stream, "val", probes, key_cols=["k"])
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = pd.concat(
        (pd.read_parquet(p) for p in _glob.glob(f"{out_dir}/part-*.parquet")),
        ignore_index=True,
    )
    final = (
        got[got["seq"] == got["seq"].max()]
        .set_index("probe")["est_count"]
        .to_dict()
    )
    batch = cms_estimate(
        cms_aggregate(df.select("val"), "val"), np.asarray(probes)
    )
    assert final == {p: int(e) for p, e in zip(probes, batch)}
