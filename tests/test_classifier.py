"""Model-based quality classifier (operators/classifier.py): the
DuckDB oracle pins VALUES (tests/test_oracle_parity.py covers the two
registered queries); these tests pin MODEL behavior — the classifier
must actually discriminate, and the helpers must degrade gracefully on
degenerate corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.operators.classifier import (
    _doc_features,
    _labeled_toks,
    _scores_frame,
    _totals,
    _weights,
    quality_classifier_scores,
)
from kafka_streams_reorder_timestamp_spark.sources import load_table


def test_classifier_beats_base_rate(spark, sf_dir):
    """The full-Bernoulli rule must beat always-predict-majority on its
    own training labels AND predict both classes — the regression this
    pins is the presence-only degeneration, where accuracy equalled the
    base rate because every doc scored above threshold."""
    df = quality_classifier_scores(spark, str(sf_dir))
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("pred_keep").cast("int") == F.col("weak_label")).cast(
                "int"
            )
        ).alias("agree"),
        F.sum(F.col("pred_keep").cast("int")).alias("pred_pos"),
        F.sum("weak_label").alias("pos"),
    ).collect()[0]
    base = max(agg["pos"], agg["n"] - agg["pos"]) / agg["n"]
    acc = agg["agree"] / agg["n"]
    assert acc > base + 0.03, f"acc {acc:.3f} vs base {base:.3f}"
    assert 0 < agg["pred_pos"] < agg["n"], "degenerate single-class preds"


def test_classifier_logits_finite_and_labeled_rows_complete(spark, sf_dir):
    """Every non-null-text document gets exactly one finite logit —
    including zero-feature docs, which the left join + coalesce must
    keep (logit = prior + absence constant)."""
    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    df = quality_classifier_scores(spark, str(sf_dir))
    assert df.count() == d.count()
    assert df.filter(F.isnan("logit") | F.col("logit").isNull()).count() == 0


def test_classifier_single_class_corpus_degrades_gracefully(spark):
    """A corpus where every doc carries the SAME label must not crash
    or emit NaN: Laplace smoothing keeps both class probabilities in
    (0, 1), so weights and logits stay finite and every prediction
    lands on the observed class."""
    texts = [
        (
            i,
            "the quick brown fox jumps of and in to is the lazy dog "
            f"number {i} runs far",
        )
        for i in range(8)
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )
    scores = _scores_frame(d)
    rows = scores.collect()
    assert len(rows) == 8
    assert all(r["weak_label"] == 1 for r in rows)  # all keep-class
    assert all(r["logit_dec"] is not None for r in rows)
    lab = _labeled_toks(d)
    w = _weights(_doc_features(lab), _totals(lab)).collect()
    assert all(
        r["weight"] is not None and r["weight_absent"] is not None for r in w
    )
    # with zero drop evidence the smoothed model must still predict keep
    assert all(float(r["logit_dec"]) > 0 for r in rows)


def test_classifier_features_are_distinct_buckets_per_doc(spark):
    """Feature rows are DISTINCT buckets per document (Bernoulli
    presence semantics): a doc repeating one word many times
    contributes each of its buckets once."""
    d = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    feat = _doc_features(_labeled_toks(d)).collect()
    # unigram 'spam' + bigram 'spam spam' = exactly 2 distinct buckets
    assert len(feat) == len({r["bucket"] for r in feat}) == 2


def test_classifier_incremental_scores_batch_with_corpus_model(
    spark, sf_dir
):
    """The production split: only batch docs (id >= 250) are scored,
    OOV features are COUNTED (n_known < n_features somewhere — the
    train-half vocabulary provably misses batch n-grams) rather than
    dropped, the batch-side accuracy still beats the majority rate,
    and both classes appear in the predictions."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        quality_classifier_incremental,
    )

    df = quality_classifier_incremental(spark, str(sf_dir))
    st = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.sum("n_features").alias("nf"),
        F.sum("n_known").alias("nk"),
        F.sum(F.col("pred_keep").cast("int")).alias("pred_pos"),
        F.sum(
            (F.col("pred_keep").cast("int") == F.col("weak_label")).cast(
                "int"
            )
        ).alias("agree"),
        F.sum("weak_label").alias("pos"),
    ).collect()[0]
    assert st["min_id"] >= 250
    assert st["nk"] < st["nf"], "no OOV feature ever hit the default path"
    assert df.filter(F.col("n_known") > F.col("n_features")).count() == 0
    base = max(st["pos"], st["n"] - st["pos"]) / st["n"]
    assert st["agree"] / st["n"] > base + 0.03
    assert 0 < st["pred_pos"] < st["n"]


def test_persisted_weight_table_scores_identically(spark, sf_dir, tmp_path):
    """The production artifact lifecycle: train -> write the weight
    table + class totals to parquet -> reload in a fresh plan -> score.
    Logits must be IDENTICAL to the fused train-and-score query —
    parquet round-trips the 6-dp-rounded doubles exactly and the
    DECIMAL sums are order-independent, so persistence loses nothing."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        apply_quality_model,
        quality_classifier_weights,
    )

    w_path, t_path = tmp_path / "weights", tmp_path / "totals"
    quality_classifier_weights(spark, str(sf_dir)).write.parquet(str(w_path))
    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    _totals(_labeled_toks(d)).write.parquet(str(t_path))

    w = spark.read.parquet(str(w_path))
    totals = spark.read.parquet(str(t_path))
    lab = _labeled_toks(d)
    from_disk = {
        r["doc_id"]: (r["n_features"], float(r["logit_dec"]))
        for r in apply_quality_model(lab, w, totals).collect()
    }
    fused = {
        r["doc_id"]: (r["n_features"], float(r["logit_dec"]))
        for r in _scores_frame(d).collect()
    }
    assert from_disk == fused
    assert len(fused) > 0


def test_classifier_survives_degenerate_documents(spark):
    """Adversarial corpus rows that used to CRASH the classifier under
    ANSI mode (reproduced pre-fix): punctuation-only text (zero word
    matches -> DIVIDE_BY_ZERO in the label panel) and empty /
    whitespace-only text (empty token array -> negative-length
    F.slice in bigram extraction). All must score finitely; the
    degenerate docs get zero features and fail the weak label."""
    rows = [
        (1, "the quick brown fox jumps of and in to is a lazy dog today"),
        (2, "!!! ??? ,,, ;;; :::"),  # zero word-regex matches
        (3, ""),  # empty text
        (4, "   \t  "),  # whitespace-only
        (5, "the small cat sat of and in to is on a warm mat now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )
    got = {r["doc_id"]: r for r in _scores_frame(d).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for r in got.values():
        assert r["logit_dec"] is not None
    # punctuation-only text still has whitespace TOKENS (features come
    # from the whitespace tokenizer, the label from the word regex) —
    # it fails the label but carries features; empty/whitespace docs
    # carry none
    assert got[2]["n_features"] > 0
    for empty in (3, 4):
        assert got[empty]["n_features"] == 0
    for junk in (2, 3, 4):
        assert got[junk]["weak_label"] == 0


def test_apply_quality_model_scores_oov_with_default(spark):
    """The persisted-model serving path must follow the incremental
    query's OOV contract: features absent from the training vocabulary
    are COUNTED and scored with the Laplace default, not silently
    dropped by an inner join (the pre-fix behavior)."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        apply_quality_model,
    )

    train = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps of and in to is a lazy dog")
            for i in range(4)
        ]
        + [(10 + i, "!!!") for i in range(4)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    lab_train = _labeled_toks(train)
    w = _weights(_doc_features(lab_train), _totals(lab_train))

    new = spark.createDataFrame(
        [(100, "zzzunseen wordszz neverzz seenzz before at all honestly")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    row = apply_quality_model(
        _labeled_toks(new), w, _totals(lab_train)
    ).collect()[0]
    # 7 unigrams + 6 bigrams, all OOV (modulo md5-bucket collisions
    # with the tiny training vocab — n_features counts every feature
    # either way)
    assert row["n_features"] >= 10
    assert row["logit_dec"] is not None


def test_auc_matches_bruteforce_pairwise(spark, sf_dir):
    """The histogram rank-sum AUC must equal the O(n_pos * n_neg)
    pairwise definition exactly — 2U = #(pos > neg) * 2 + #(ties) —
    computed per source from the same logits in plain Python. Pins the
    tie-correction and the strictly-below cumulative frame."""
    from collections import defaultdict

    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        quality_classifier_auc,
    )
    from kafka_streams_reorder_timestamp_spark.sources import load_table

    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    rows = (
        _scores_frame(d, extra=("source",))
        .select("source", "logit_dec", "weak_label")
        .collect()
    )
    by_src: dict[str, list] = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append((r["logit_dec"], r["weak_label"]))
    expect = {}
    for src, xs in by_src.items():
        pos = [v for v, y in xs if y == 1]
        neg = [v for v, y in xs if y == 0]
        if not pos or not neg:
            expect[src] = (len(pos), len(neg), None)
            continue
        u2 = sum(
            2 if p > n else (1 if p == n else 0) for p in pos for n in neg
        )
        expect[src] = (
            len(pos),
            len(neg),
            (10000 * u2) // (2 * len(pos) * len(neg)),
        )
    got = {
        r["source"]: (r["n_pos"], r["n_neg"], r["auc_pct4"])
        for r in quality_classifier_auc(spark, str(sf_dir)).collect()
    }
    assert got == expect
    # and the model must actually rank: majority of sources above 0.5
    aucs = [v[2] for v in got.values() if v[2] is not None]
    assert aucs and sorted(aucs)[len(aucs) // 2] > 5000


def test_bucket_collision_histogram_accounts_for_vocabulary(spark, sf_dir):
    """The collision histogram's mass equals the distinct corpus
    vocabulary exactly (sum grams_per_bucket * n_buckets == |distinct
    grams|) and never claims more buckets than the hash range."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        N_BUCKETS,
        _gram_array,
        classifier_bucket_collisions,
    )
    from kafka_streams_reorder_timestamp_spark.sources import load_table

    d = load_table(spark, str(sf_dir), "documents").filter(
        F.col("text").isNotNull()
    )
    n_vocab = (
        _labeled_toks(d)
        .select(F.explode(F.array_distinct(_gram_array())).alias("g"))
        .distinct()
        .count()
    )
    hist = classifier_bucket_collisions(spark, str(sf_dir)).collect()
    assert sum(r["grams_per_bucket"] * r["n_buckets"] for r in hist) == n_vocab
    assert sum(r["n_buckets"] for r in hist) <= N_BUCKETS
    assert all(r["grams_per_bucket"] >= 1 for r in hist)


def test_per_source_selection_matches_per_doc_recompute(spark, sf_dir):
    """quality_selection_per_source's histogram-side cutoff math must
    agree with a direct per-document recompute: within each source,
    quota = ceil(n/4), the cutoff is the logit at the quota-th ranked
    document, and n_kept counts every doc at or above it (whole
    tie-group admitted)."""
    import math

    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        quality_classifier_scores,
        quality_selection_per_source,
    )
    from kafka_streams_reorder_timestamp_spark.sources import load_table

    sel = {
        r.source: r
        for r in quality_selection_per_source(spark, str(sf_dir)).collect()
    }
    scores = quality_classifier_scores(spark, str(sf_dir))
    docs = load_table(spark, str(sf_dir), "documents").select(
        "doc_id", "source"
    )
    per_doc = scores.join(docs, "doc_id").select("source", "logit").collect()
    by_source: dict[str, list[float]] = {}
    for r in per_doc:
        by_source.setdefault(r.source, []).append(r.logit)
    assert set(sel) == set(by_source)
    for src, logits in by_source.items():
        logits.sort(reverse=True)
        n = len(logits)
        quota = math.ceil(n / 4)
        boundary = logits[quota - 1]
        n_kept = sum(1 for x in logits if x >= boundary)
        row = sel[src]
        assert row.n_docs == n, (src, row)
        assert row.quota == quota, (src, row)
        assert row.n_kept == n_kept, (src, row)
        assert row.logit_cutoff == boundary, (src, row)
        assert quota <= row.n_kept <= n


def test_selection_approx_matches_exact_within_tolerance(spark, sf_dir):
    """quality_selection_per_source IS the oracle twin of the approx
    path (SCALE.md round-9): identical source set and n_docs/quota,
    n_kept within the tie-group tolerance, and a cutoff that is an
    actual logit of the source (percentile_approx returns a data
    point, not an interpolation) lying within the source's logit
    range. With accuracy=10000 and well under 10k docs per source at
    test SF, the GK sketch is rank-exact, so the only legitimate
    daylight vs the exact path is the quantile convention at the
    boundary (ceil(n/4)-th from the top vs index 0.75*(n-1)) plus
    tie-group admission."""
    from kafka_streams_reorder_timestamp_spark.operators.classifier import (
        quality_selection_approx,
        quality_selection_per_source,
    )

    spark.catalog.clearCache()
    exact = {
        r["source"]: r
        for r in quality_selection_per_source(spark, str(sf_dir)).collect()
    }
    approx = {
        r["source"]: r
        for r in quality_selection_approx(spark, str(sf_dir)).collect()
    }
    assert set(exact) == set(approx)
    for src, a in approx.items():
        e = exact[src]
        assert a["n_docs"] == e["n_docs"], src
        assert a["quota"] == e["quota"], src
        tol = max(2, e["n_docs"] // 20)
        assert abs(a["n_kept"] - e["n_kept"]) <= tol, (
            src, a["n_kept"], e["n_kept"])
        # the cutoff keeps roughly a quarter: never fewer than
        # quota - tol, never the whole source
        assert a["n_kept"] >= e["quota"] - tol, src
        assert a["n_kept"] < a["n_docs"], src
    spark.catalog.clearCache()
