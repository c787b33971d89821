"""Behavioral invariants of the sampling/profiling family and the
integer PageRank — properties the DuckDB parity check can't express
(reproducibility across runs, statistical rate bounds, rank-mass
conservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.operators import registry
from kafka_streams_reorder_timestamp_spark.sources.catalog import load_table


def _run(spark, sf_dir, name):
    return registry.REGISTRY[name].builder(spark, sf_dir)


def test_bernoulli_sample_reproducible_and_rate(spark, sf_dir):
    a = _run(spark, sf_dir, "sample_bernoulli_docs")
    b = _run(spark, sf_dir, "sample_bernoulli_docs")
    rows_a = sorted(r.doc_id for r in a.collect())
    rows_b = sorted(r.doc_id for r in b.collect())
    assert rows_a == rows_b  # identical kept set, run to run
    total = load_table(spark, sf_dir, "documents").count()
    rate = len(rows_a) / total
    # ~10.16% nominal; wide tolerance for small-SF binomial noise.
    assert 0.03 < rate < 0.20, rate


def test_stratified_sample_exactly_k_per_stratum(spark, sf_dir):
    out = _run(spark, sf_dir, "sample_stratified_docs")
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {
        r.lang
        for r in load_table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    assert set(per) == strata
    for lang, n in per.items():
        assert n == 15, (lang, n)


def test_mixture_rebalance_rates_follow_weights(spark, sf_dir):
    rows = {r.lang: r for r in _run(spark, sf_dir, "sample_mixture_rebalance").collect()}
    # zh threshold 'zzzz' keeps everything.
    assert rows["zh"].n_kept == rows["zh"].n_total
    # en (~20%) must keep a smaller fraction than fr (~80%).
    assert (
        rows["en"].n_kept / rows["en"].n_total
        < rows["fr"].n_kept / rows["fr"].n_total
    )


def test_profile_matches_direct_counts(spark, sf_dir):
    out = {r.column_name: r for r in _run(spark, sf_dir, "profile_documents_columns").collect()}
    d = load_table(spark, sf_dir, "documents")
    assert out["lang"].n_distinct == d.select("lang").distinct().count()
    assert out["doc_id"].n_nulls == d.filter(F.col("doc_id").isNull()).count()
    assert out["text"].n_nulls == d.filter(F.col("text").isNull()).count()


def test_histogram_partitions_all_orders(spark, sf_dir):
    out = _run(spark, sf_dir, "histogram_order_totals")
    rows = out.collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:  # bin boundaries actually bound the bin contents
        assert r.bin * 5_000_000 <= r.min_cents <= r.max_cents < (r.bin + 1) * 5_000_000


def test_tfidf_terms_come_from_the_document(spark, sf_dir):
    out = _run(spark, sf_dir, "tfidf_top_terms")
    rows = out.collect()
    assert rows, "no tf-idf output"
    per_doc: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.rank <= 3
        per_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) <= 3 for v in per_doc.values())
    texts = dict(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    for r in rows[:25]:
        assert r.term in texts[r.doc_id]


def test_pagerank_conserves_mass_and_is_deterministic(spark, sf_dir):
    a = {r.node: r.rank_micro for r in _run(spark, sf_dir, "pagerank_event_transitions").collect()}
    b = {r.node: r.rank_micro for r in _run(spark, sf_dir, "pagerank_event_transitions").collect()}
    assert a == b  # bit-identical across runs
    n = len(a)
    assert n == load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    assert all(r > 0 for r in a.values())
    # Integer truncation only ever LOSES mass: total stays in
    # (n*unit - slack, n*unit]. Slack bound: <= ~1 unit per edge/node
    # per round, thousands of micro-units at most.
    assert n * 1_000_000 - 10_000 < sum(a.values()) <= n * 1_000_000


def test_chunking_covers_every_token_with_overlap(spark, sf_dir):
    """Every token position of every chunked document is inside at
    least one chunk; consecutive chunk starts differ by the stride;
    each non-final chunk is exactly CHUNK tokens."""
    from kafka_streams_reorder_timestamp_spark.operators.chunking import (
        CHUNK,
        STRIDE,
        _tokens,
    )

    chunks = _run(spark, sf_dir, "chunk_documents_sliding").collect()
    n_tok = dict(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") < 60))
        .select("doc_id", F.size(_tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    )
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(n_tok)
    for doc_id, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r.chunk_idx)
        n = n_tok[doc_id]
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        covered = 0  # 1-based exclusive end of covered prefix
        for i, r in enumerate(rs):
            start = i * STRIDE + 1
            assert start <= covered + 1  # no hole before this chunk
            assert r.chunk_tokens == min(CHUNK, n - start + 1)
            covered = max(covered, start + r.chunk_tokens - 1)
        assert covered == n  # full coverage through the last token


def test_chunk_excise_is_surgical(spark, sf_dir):
    """dedup_chunk_excise removes exactly the corpus-duplicated chunks
    and keeps the rest in order: each planted doc (copied 32-token head
    + unique 16-token tail) comes back as ONLY its tail tokens, and
    every output row's clean token count is bounded by the surviving
    chunk budget."""
    from kafka_streams_reorder_timestamp_spark.operators.chunking import (
        DCHUNK,
    )

    rows = _run(spark, sf_dir, "dedup_chunk_excise").collect()
    by_id = {r.doc_id: r for r in rows}
    planted = {i: by_id[i + 5_000_000_000] for i in range(5)
               if i + 5_000_000_000 in by_id}
    assert len(planted) >= 1  # at least one doc 0-4 is >= DCHUNK tokens
    for orig, r in planted.items():
        # copied head excised, unique tail kept verbatim and in order
        assert r.clean_text.split() == [
            f"uq{orig}_{j}" for j in range(16)
        ], (orig, r.clean_text)
        assert r.n_dup_chunks >= 1
    for r in rows:
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert 0 < r.n_dup_chunks <= r.n_chunks
        assert n_clean <= DCHUNK * (r.n_chunks - r.n_dup_chunks)


def test_packing_conserves_tokens_and_orders_bins(spark, sf_dir):
    """Packs partition each language's documents: token mass is
    conserved, pack ids are dense from 0, and doc-id ranges of
    consecutive packs never interleave (offset binning is
    order-stable)."""
    rows = _run(spark, sf_dir, "pack_training_sequences").collect()
    from kafka_streams_reorder_timestamp_spark.operators.chunking import (
        _tokens,
    )

    totals = dict(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy("lang")
        .agg(F.sum(F.size(_tokens(F.col("text")))).alias("t"))
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs = sorted(rs, key=lambda r: r.pack_id)
        assert [r.pack_id for r in rs] == list(range(len(rs)))
        assert sum(r.sum_tokens for r in rs) == totals[lang]
        for a, b in zip(rs, rs[1:]):
            assert a.last_doc < b.first_doc  # no interleaving


def test_dsir_weights_rank_target_sources_higher(spark, sf_dir):
    """DSIR's whole point: importance weights must rank the target
    domain above the raw pool. Mean logw over the target sources must
    exceed mean logw over the rest, and the keep flag must be exactly
    the logw > 0 decision."""
    from kafka_streams_reorder_timestamp_spark.operators.sampling import (
        DSIR_TARGET_SOURCES,
    )

    rows = _run(spark, sf_dir, "dsir_importance_weights").collect()
    assert len(rows) > 0
    target = [r.logw for r in rows if r.source in DSIR_TARGET_SOURCES]
    rest = [r.logw for r in rows if r.source not in DSIR_TARGET_SOURCES]
    assert target and rest
    assert sum(target) / len(target) > sum(rest) / len(rest)
    for r in rows:
        assert r.dsir_keep == (r.logw > 0), r
        assert r.n_tokens >= 0


def test_token_budget_mixture_integer_identities(spark, sf_dir):
    """The plan's integer math must be self-consistent: weights sum to
    10000 bp, target_tokens is the exact floor share of the budget,
    repeat_bp is the exact ceiling ratio, surplus is the difference."""
    from kafka_streams_reorder_timestamp_spark.operators.sampling import (
        MIXTURE_TOKEN_BP,
        TOKEN_BUDGET,
    )

    assert sum(w for _, w in MIXTURE_TOKEN_BP) == 10000
    rows = _run(spark, sf_dir, "token_budget_mixture").collect()
    assert {r.lang for r in rows} == {l for l, _ in MIXTURE_TOKEN_BP}
    bp = dict(MIXTURE_TOKEN_BP)
    for r in rows:
        assert r.weight_bp == bp[r.lang]
        assert r.target_tokens == TOKEN_BUDGET * r.weight_bp // 10000
        avail = max(r.avail_tokens, 1)
        assert r.repeat_bp == (10000 * r.target_tokens + avail - 1) // avail
        assert r.surplus_tokens == r.avail_tokens - r.target_tokens
        assert r.n_docs > 0 and r.avail_tokens > 0


def test_dsir_resample_draw_deterministic_biased_and_topk_shaped(
    spark, sf_dir
):
    """The Gumbel-top-k draw must be (a) a pure function of doc_id —
    identical kept set run to run; (b) actually importance-BIASED —
    the kept docs' mean logw must exceed the corpus mean (that is the
    entire point of resampling); (c) exactly min(K, n_docs) rows with
    draw_key = logw + gumbel decreasing; (d) executed as a distributed
    top-k (TakeOrderedAndProject), never a global sort of the corpus."""
    from kafka_streams_reorder_timestamp_spark import plans
    from kafka_streams_reorder_timestamp_spark.operators.sampling import (
        DSIR_RESAMPLE_K,
        dsir_resample_draw,
        dsir_importance_weights,
    )

    a = dsir_resample_draw(spark, sf_dir).collect()
    b = dsir_resample_draw(spark, sf_dir).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)

    all_w = dsir_importance_weights(spark, sf_dir).collect()
    n_docs = len(all_w)
    assert len(a) == min(DSIR_RESAMPLE_K, n_docs)
    if n_docs > DSIR_RESAMPLE_K:
        corpus_mean = sum(r.logw for r in all_w) / n_docs
        kept_mean = sum(r.logw for r in a) / len(a)
        assert kept_mean > corpus_mean, (kept_mean, corpus_mean)
    for r in a:
        assert abs((r.logw + r.gumbel) - r.draw_key) < 1e-9

    df = dsir_resample_draw(spark, sf_dir)
    p = plans.physical_plan(df, "simple")
    assert "TakeOrderedAndProject" in p, p
    assert plans.single_partition_scan_funnels(df) == []
