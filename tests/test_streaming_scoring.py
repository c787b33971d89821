"""Streaming model serving (streaming/scoring.py): a document stream
scored with the batch-trained quality classifier must produce
BIT-EQUAL logits to the batch quality_classifier_scores query — the
"streaming converges to the batch answer" discipline applied to model
serving, which simultaneously pins the Python twins of the md5 bucket
hash and tokenizer against their Spark-Column originals."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.operators.classifier import (
    quality_classifier_scores,
)
from kafka_streams_reorder_timestamp_spark.sources import load_table
from kafka_streams_reorder_timestamp_spark.streaming.scoring import (
    export_quality_model,
    score_doc_stream,
)


def test_stream_scores_equal_batch_scores(spark, sf_dir, tmp_path):
    model = export_quality_model(spark, str(sf_dir))

    docs = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    in_dir = tmp_path / "in"
    # several files -> several micro-batch partitions
    docs.repartition(4).write.parquet(str(in_dir))

    src = spark.readStream.schema(docs.schema).parquet(str(in_dir))
    out_dir, ckpt = tmp_path / "out", tmp_path / "ck"
    q = (
        score_doc_stream(src, model)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {}
    for part in glob.glob(f"{out_dir}/part-*.parquet"):
        for r in pq.read_table(part).to_pylist():
            got[r["doc_id"]] = (
                r["n_features"],
                r["logit"],
                r["pred_keep"],
            )

    want = {
        r["doc_id"]: (r["n_features"], r["logit"], r["pred_keep"])
        for r in quality_classifier_scores(spark, str(sf_dir)).collect()
    }
    assert got == want  # bit-equal logits, counts, and predictions
    assert len(want) > 0


def test_stream_scoring_is_stateless(spark, sf_dir, tmp_path):
    """The serving plan must contain NO stateful streaming operator —
    no state store, no watermark requirement — so it runs append-mode
    at any key cardinality. Pinned via the streaming progress'
    stateOperators being empty."""
    model = export_quality_model(spark, str(sf_dir))
    docs = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    in_dir = tmp_path / "in"
    docs.limit(50).coalesce(1).write.parquet(str(in_dir))
    src = spark.readStream.schema(docs.schema).parquet(str(in_dir))
    q = (
        score_doc_stream(src, model)
        .writeStream.format("memory")
        .queryName("scored_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    progress = q.recentProgress
    assert progress, "no micro-batch ran"
    assert all(not p["stateOperators"] for p in progress)
    assert spark.table("scored_stream").count() == 50
