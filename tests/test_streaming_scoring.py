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
            # scoring the training corpus: every feature in vocab
            assert r["n_known"] == r["n_features"], r

    want = {
        r["doc_id"]: (r["n_features"], r["logit"], r["pred_keep"])
        for r in quality_classifier_scores(spark, str(sf_dir)).collect()
    }
    assert got == want  # bit-equal logits, counts, and predictions
    assert len(want) > 0


def test_stream_scores_equal_batch_on_oov_documents(spark, sf_dir, tmp_path):
    """The serving contract OFF the training corpus: documents with
    unseen n-grams must stream-score bit-equal to the batch serving
    path (apply_quality_model) — OOV buckets counted in n_features,
    each scored with the Laplace-default w_oov, n_known reporting the
    vocab hit count. This is exactly the divergence the
    training-corpus-only parity test cannot see (zero OOV there)."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        _doc_features,
        _labeled_toks,
        _totals,
        _weights,
        apply_quality_model,
    )

    model = export_quality_model(spark, str(sf_dir))

    # Perturbed docs: real corpus text prefixed with tokens that cannot
    # be in the training vocabulary, plus a fully-unseen doc and an
    # empty doc.
    base = [
        r["text"]
        for r in load_table(spark, str(sf_dir), "documents")
        .filter(F.col("text").isNotNull())
        .limit(5)
        .collect()
    ]
    rows = [
        (i, f"zzqxunseen{i} glorpfizz{i} " + t) for i, t in enumerate(base)
    ] + [
        (100, "zzqxnothing glorpwords everzz seenzz xyzzyplugh"),
        (101, ""),
    ]
    pert = spark.createDataFrame(rows, "doc_id long, text string")

    # Batch serving path: model trained on the full corpus, applied to
    # the perturbed docs.
    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    lab_train = _labeled_toks(d)
    totals = _totals(lab_train)
    w = _weights(_doc_features(lab_train), totals)
    lab_pert = _labeled_toks(pert.withColumn("n_chars", F.length("text")))
    want = {}
    for r in apply_quality_model(lab_pert, w, totals).collect():
        want[r["doc_id"]] = (
            r["n_features"],
            r["n_known"],
            float(r["logit_dec"]),
            float(r["logit_dec"]) > 0,
        )
    assert any(
        v[1] < v[0] for v in want.values()
    ), "perturbation produced no OOV features; test is vacuous"

    in_dir = tmp_path / "in"
    pert.coalesce(1).write.parquet(str(in_dir))
    src = spark.readStream.schema(pert.schema).parquet(str(in_dir))
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
                r["n_known"],
                r["logit"],
                r["pred_keep"],
            )
    assert got == want


def test_drift_stream_equals_batch_rollup(spark, sf_dir, tmp_path):
    """drift_doc_stream's per-source counters after draining the stream
    must equal the batch serving path's rollup over the same docs with
    the same model — integer totals only, so the equality is exact
    regardless of micro-batch arrival order."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        _labeled_toks,
        _totals,
        _weights,
        apply_quality_model,
    )
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        _doc_features,
    )
    from kafka_streams_reorder_timestamp_spark.streaming.scoring import (
        drift_doc_stream,
    )

    model = export_quality_model(spark, str(sf_dir))
    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    docs = d.select("doc_id", "source", "text")

    # Batch twin: DECIMAL serving path + source join + same rollup.
    lab_train = _labeled_toks(d)
    totals = _totals(lab_train)
    w = _weights(_doc_features(lab_train), totals)
    batch_scores = apply_quality_model(_labeled_toks(d), w, totals)
    want = {
        r["source"]: (
            r["n_docs"],
            r["total_features"],
            r["total_known"],
            r["n_pred_keep"],
        )
        for r in batch_scores.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_features").alias("total_features"),
            F.sum("n_known").alias("total_known"),
            F.sum(
                F.when(F.col("logit_dec") > 0, 1).otherwise(0)
            ).alias("n_pred_keep"),
        )
        .collect()
    }

    in_dir = tmp_path / "in"
    docs.repartition(4).write.parquet(str(in_dir))
    src = spark.readStream.schema(docs.schema).parquet(str(in_dir))
    q = (
        drift_doc_stream(src, model)
        .writeStream.format("memory")
        .queryName("drift_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # the drift rollup IS stateful (bounded per-source counters)
    assert any(p["stateOperators"] for p in q.recentProgress)
    got = {
        r["source"]: (
            r["n_docs"],
            r["total_features"],
            r["total_known"],
            r["n_pred_keep"],
        )
        for r in spark.table("drift_stream").collect()
    }
    assert got == want
    assert len(got) > 1


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
