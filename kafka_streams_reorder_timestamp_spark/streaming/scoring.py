"""Streaming model serving: score a document stream with the
batch-trained quality classifier (operators/classifier.py).

The production pattern the batch/incremental classifier queries point
at: the model (2048-row weight table + two scalars) is trained in
batch, EXPORTED once, and every streaming micro-batch scores documents
STATELESSLY — no streaming aggregation, no state store, no watermark
needed, because the per-doc logit is computable in-row once the weight
vector rides along in the closure (Spark broadcasts task binaries; a
2048-float numpy array is effectively free per executor).

Why an Arrow UDF here when the batch path is pure Column code: the
batch path's per-doc sum is a groupBy over exploded features — a
shuffle. A streaming groupBy(doc_id) would be a STATEFUL aggregation
(unbounded state keyed by doc_id). Folding the sum into one
Arrow-batched pass per micro-batch keeps serving stateless and
append-mode; the trade is re-implementing bucket hashing (md5, first
60 bits, mod 2048) and tokenization in Python — pinned bit-equal to
the batch logits by tests/test_streaming_scoring.py, integer
micro-units standing in for the batch path's DECIMAL(18,6).

Reference tie-in: the reference has no model surface (SURVEY §2.2
extension; LLM-pipeline mandate). Serving-vs-training parity follows
the same "streaming must converge to the batch answer" discipline as
streaming/windows.py.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..operators.classifier import ALPHA, N_BUCKETS

_WS = re.compile(r"\s+")


class QualityModel:
    """Driver-side export of the trained classifier: per-bucket
    adjustment weights in integer MICRO-UNITS (1e-6), plus the prior,
    absence-constant and OOV-default scalars — the exact values the
    batch DECIMAL arithmetic produces, so streaming logits match
    bit-for-bit, INCLUDING on documents with out-of-vocabulary
    n-grams (the apply_quality_model / quality_classifier_incremental
    serving contract: OOV buckets count in n_features and score with
    the Laplace-default presence log-odds w_oov)."""

    def __init__(
        self, adj_micros: np.ndarray, const_micros: int, w_oov_micros: int = 0
    ):
        assert adj_micros.shape == (N_BUCKETS,)
        self.adj_micros = adj_micros  # weight - weight_absent, 1e-6 units
        self.const_micros = const_micros  # prior + sum(weight_absent)
        self.w_oov_micros = w_oov_micros  # Laplace-default per OOV bucket
        # buckets never seen in training keep adj == 0 and instead
        # score with w_oov; track membership separately
        self.in_vocab = np.zeros(N_BUCKETS, dtype=bool)


def export_quality_model(spark, sf_dir: str) -> QualityModel:
    """Collect the trained model (quality_classifier_weights' table +
    the prior / absence scalars) into a QualityModel. The collected
    payload is 2048 rows — constant in corpus size."""
    from ..operators.classifier import (
        _doc_features,
        _labeled_toks,
        _totals,
        _weights,
    )
    from ..sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    lab = _labeled_toks(d)
    totals = _totals(lab)
    # The prior comes out of the SAME Spark expression the batch query
    # evaluates — a Python math.log/round twin can disagree by an ulp /
    # rounding mode (HALF_UP vs banker's) and shift every logit by one
    # micro-unit.
    prior = totals.select(
        F.round(
            F.log((F.col("n_k") + ALPHA) * F.lit(1.0) / (F.col("n_d") + ALPHA)),
            6,
        ).alias("p"),
        # w_oov out of the SAME Spark expression the batch serving path
        # evaluates (apply_quality_model's `oov` term), for the same
        # ulp/rounding-mode reason as the prior.
        F.round(
            F.log(ALPHA * F.lit(1.0) / (F.col("n_k") + 2 * ALPHA))
            - F.log(ALPHA * F.lit(1.0) / (F.col("n_d") + 2 * ALPHA)),
            6,
        ).alias("w_oov"),
    ).collect()[0]
    prior, w_oov = prior["p"], prior["w_oov"]
    w_rows = _weights(_doc_features(lab), totals).collect()

    def micros(x: float) -> int:
        return int(round(x * 1_000_000))

    adj = np.zeros(N_BUCKETS, dtype=np.int64)
    c_micros = 0
    vocab = np.zeros(N_BUCKETS, dtype=bool)
    for r in w_rows:
        b = int(r["bucket"])
        adj[b] = micros(r["weight"]) - micros(r["weight_absent"])
        c_micros += micros(r["weight_absent"])
        vocab[b] = True
    m = QualityModel(adj, micros(prior) + c_micros, micros(w_oov))
    m.in_vocab = vocab
    return m


def _buckets_py(text: str) -> list[int]:
    """Python twin of classifier._bucket over classifier._doc_features'
    unigram+bigram extraction: normalize (lower, trim, collapse ASCII
    whitespace — the corpus is ASCII, where Java's \\s and Python's
    agree), split, distinct md5-hash buckets."""
    toks = [t for t in _WS.sub(" ", text.strip().lower()).split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return sorted(
        {
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            % N_BUCKETS
            for g in grams
        }
    )


def score_doc_stream(
    docs: DataFrame, model: QualityModel, keep_cols: tuple = ()
) -> DataFrame:
    """(doc_id, text, ...) stream -> (doc_id, n_features, n_known,
    logit, pred_keep) stream: stateless per-row scoring, append-mode
    safe.

    OOV contract matches batch serving (apply_quality_model /
    quality_classifier_incremental): out-of-vocabulary buckets COUNT
    in n_features and each contributes the Laplace-default log-odds
    w_oov; n_known reports the vocab hit count, so n_known/n_features
    is the retrain-drift signal DEPLOY.md prescribes. One Arrow batch
    per micro-batch partition; the hot loop is a numpy take+sum over
    the broadcast adjustment vector."""
    adj = model.adj_micros
    vocab = model.in_vocab
    const = model.const_micros
    w_oov = model.w_oov_micros

    @pandas_udf(
        T.StructType(
            [
                T.StructField("n_features", T.LongType()),
                T.StructField("n_known", T.LongType()),
                T.StructField("logit", T.DoubleType()),
                T.StructField("pred_keep", T.BooleanType()),
            ]
        )
    )
    def _score(texts: pd.Series) -> pd.DataFrame:
        n_feats, n_knowns, logits, preds = [], [], [], []
        for t in texts:
            bs = np.asarray(_buckets_py(t or ""), dtype=np.int64)
            known = bs[vocab[bs]] if len(bs) else bs
            micros = (
                const
                + (int(adj[known].sum()) if len(known) else 0)
                + w_oov * (len(bs) - len(known))
            )
            n_feats.append(len(bs))
            n_knowns.append(len(known))
            logits.append(micros / 1_000_000)
            preds.append(micros > 0)
        return pd.DataFrame(
            {
                "n_features": n_feats,
                "n_known": n_knowns,
                "logit": logits,
                "pred_keep": preds,
            }
        )

    return docs.withColumn("_s", _score(F.col("text"))).select(
        "doc_id",
        *keep_cols,
        F.col("_s.n_features").alias("n_features"),
        F.col("_s.n_known").alias("n_known"),
        F.col("_s.logit").alias("logit"),
        F.col("_s.pred_keep").alias("pred_keep"),
    )


def drift_doc_stream(docs: DataFrame, model: QualityModel) -> DataFrame:
    """Per-source running drift totals over a scored document stream —
    the streaming half of quality_model_drift (operators/classifier.py):
    n_docs, total_features, total_known and n_pred_keep per source,
    maintained as a streaming aggregation (complete/update mode).

    Design for unbounded streams: the grouping key is `source`
    (bounded, human-scale cardinality — NOT doc_id), so state is a few
    integer counters per source forever; and the state holds ONLY
    order-independent integer sums — no float accumulation, because
    micro-batch arrival order is nondeterministic and a double sum
    would not be replay-stable. The vocab hit rate (total_known /
    total_features) and keep rate derive from the counters at read
    time. Pinned equal to the batch DECIMAL serving path's rollup by
    tests/test_streaming_scoring.py."""
    scored = score_doc_stream(docs, model, keep_cols=("source",))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_features").alias("total_features"),
        F.sum("n_known").alias("total_known"),
        F.sum(F.when(F.col("pred_keep"), 1).otherwise(0)).alias(
            "n_pred_keep"
        ),
    )
