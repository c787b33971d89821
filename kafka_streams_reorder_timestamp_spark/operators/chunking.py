"""Document chunking + sequence packing — the tokenizer-adjacent
operators that turn a cleaned corpus into model-ready training rows.

Reference tie-in: absent from the reference (SURVEY §2.2 — mandated
LLM-pipeline extension surface).

Design for 100 TB:
  - chunking is a narrow map + explode: each document produces its own
    chunks without any shuffle, and the explode multiplies rows only by
    ceil(n_tokens/stride) — output-proportional, the same shape at any
    corpus size;
  - packing is ONE window pass per language partition (cumulative token
    sum -> integer bin id) + one partial-agg shuffle — the greedy
    first-fit packers that need sequential state are deliberately
    avoided: offset-bin packing is deterministic, order-stable, and
    embarrassingly parallel (each partition's bins depend only on the
    prefix sums inside that partition);
  - both operators emit md5 chunk fingerprints (strings, not arrays) so
    results are hash-checkable by the driver and joinable back to
    dedup/decontamination stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

CHUNK = 64  # tokens per chunk
STRIDE = 48  # tokens between chunk starts (CHUNK-STRIDE = 16 overlap)
PACK_BUDGET = 2048  # tokens per packed training sequence


def _tokens(col):
    """Whitespace tokens of lowercased text — identical to the oracle's
    regexp_split_to_array + filter."""
    return F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"), lambda t: t != ""
    )


@register(
    "chunk_documents_sliding",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL AND doc_id < 60
    ), starts AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, {STRIDE})) AS s
      FROM tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST((s - 1) / {STRIDE} AS BIGINT) AS chunk_idx,
           len(list_slice(t, s, least(s + {CHUNK} - 1, len(t))))
             AS chunk_tokens,
           md5(array_to_string(
                 list_slice(t, s, least(s + {CHUNK} - 1, len(t))), ' '))
             AS chunk_md5
    FROM starts
    """,
    doc=f"Sliding-window chunking: split each document into "
    f"{CHUNK}-token chunks every {STRIDE} tokens ({CHUNK - STRIDE} "
    "overlap) — the context-window preparation step before "
    "tokenization. Pure narrow map + explode (sequence of starts -> "
    "slice), no shuffle anywhere: each task chunks its own documents "
    "and output scales with chunk count, not corpus size. Chunks are "
    "emitted as md5 fingerprints (joinable to dedup/decontamination, "
    "hashable by the driver). Restricted to doc_id<60 to keep the "
    "checked output compact.",
)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") < 60))
        .select("doc_id", _tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    chunk = F.slice(F.col("t"), F.col("s"), CHUNK)
    return (
        d.select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t"), F.lit(STRIDE))
            ).alias("s"),
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / STRIDE).cast("bigint").alias("chunk_idx"),
            F.size(chunk).alias("chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             t -> t <> '')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ), offsets AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_tok AS off
      FROM tok
    )
    SELECT lang, CAST(off // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM offsets
    GROUP BY 1, 2
    """,
    doc=f"Deterministic sequence packing: per language, documents are "
    "laid out in doc_id order and binned by their cumulative token "
    f"START offset div {PACK_BUDGET} — every engine, run, and cluster "
    "size produces the same packs (unlike greedy first-fit, which "
    "needs sequential state). One window pass (prefix sum) + one "
    "partial-agg shuffle; at 100 TB each language partition computes "
    "its own prefix sums independently. Packs can exceed the budget "
    "by at most one document's tokens — the standard concat-then-cut "
    "training layout tolerates that (the cut happens at tokenization).",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", F.size(_tokens(F.col("text"))).alias("n_tok")
        )
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = d.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        off.groupBy(
            "lang",
            F.expr(f"off div {PACK_BUDGET}").alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


DCHUNK = 32  # tokens per NON-overlapping chunk for chunk-level dedup


def _chunked_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents PLUS planted partial-duplicate docs, exploded into
    non-overlapping DCHUNK-token chunks: (doc_id, s, chunk_text).

    Planted docs = the copied DCHUNK-token head of docs 0-4 + a unique
    16-token tail, ids +5e9 — a document that is PARTIALLY duplicated
    by construction. Shared by dedup_chunk_level (the signal) and
    dedup_chunk_excise (the fix) so their planted corpora are
    identical by construction (the same share-the-split rule as
    dedup.py's _incremental_split). Downstream projections that only
    need the chunk fingerprint prune chunk_text before any shuffle."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _tokens(F.col("text")).alias("t"))
    )
    planted = d.filter(
        (F.col("doc_id") < 5) & (F.size("t") >= DCHUNK)
    ).select(
        # t FIRST: lateral-column-alias resolution is backward-only, so
        # the transform lambda sees the ORIGINAL doc_id (as in the
        # oracles' planted CTE), not the +5e9-shifted alias below.
        F.concat(
            F.slice("t", 1, DCHUNK),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.concat(
                    F.lit("uq"),
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    j.cast("string"),
                ),
            ),
        ).alias("t"),
        (F.col("doc_id") + F.lit(5_000_000_000)).alias("doc_id"),
    )
    all_tok = d.filter(F.size("t") > 0).unionByName(planted)
    chunk = F.slice(F.col("t"), F.col("s"), DCHUNK)
    return all_tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t"), F.lit(DCHUNK))).alias("s"),
        "t",
    ).select("doc_id", "s", F.array_join(chunk, " ").alias("chunk_text"))


@register(
    "dedup_chunk_level",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), planted AS (
      SELECT tok.doc_id + 5000000000 AS doc_id,
             list_concat(
               list_slice(t, 1, {DCHUNK}),
               list_transform(range(0, 16),
                 j -> 'uq' || CAST(tok.doc_id AS VARCHAR) || '_'
                      || CAST(j AS VARCHAR))) AS t
      FROM tok WHERE tok.doc_id < 5 AND len(t) >= {DCHUNK}
    ), all_tok AS (
      SELECT doc_id, t FROM tok WHERE len(t) > 0
      UNION ALL SELECT doc_id, t FROM planted
    ), starts AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, {DCHUNK})) AS s
      FROM all_tok
    ), chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(t, s, least(s + {DCHUNK} - 1, len(t))), ' ')) AS c
      FROM starts
    ), marked AS (
      SELECT doc_id, c, COUNT(*) OVER (PARTITION BY c) AS n
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE n > 1) AS n_dup_chunks
    FROM marked GROUP BY doc_id
    HAVING COUNT(*) FILTER (WHERE n > 1) > 0
    """,
    doc=f"CHUNK-level dedup signal (the CCNet/RefinedWeb paragraph-"
    f"granularity pass): split every document into non-overlapping "
    f"{DCHUNK}-token chunks, fingerprint each, and report per doc how "
    "many of its chunks occur elsewhere in the corpus — catching "
    "PARTIAL duplication (a copied paragraph inside an otherwise "
    "novel document) that whole-document fingerprints cannot see and "
    "near-dup similarity dilutes away on long documents. Planted "
    "partial dups (first chunk of docs 0-4 + a unique 16-token tail, "
    "ids +5e9) prove fractional detection. Shape: narrow chunk "
    "explode (output-proportional), then ONE shuffle on the chunk "
    "fingerprint — uniform 128-bit keys, no skew possible — via a "
    "count window, then a doc-grain partial agg. At 100 TB the "
    "shuffled rows are (doc_id, 16-byte digest) pairs, never text.",
)
def dedup_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5 projects away chunk_text map-side: only (doc_id, digest)
    # rides the count-window shuffle.
    chunks = _chunked_corpus(spark, sf_dir).select(
        "doc_id", F.md5("chunk_text").alias("c")
    )
    w = Window.partitionBy("c")
    marked = chunks.withColumn("n", F.count(F.lit(1)).over(w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("n") > 1).alias("n_dup_chunks"),
        )
        .filter(F.col("n_dup_chunks") > 0)
    )


@register(
    "dedup_chunk_excise",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), planted AS (
      SELECT tok.doc_id + 5000000000 AS doc_id,
             list_concat(
               list_slice(t, 1, {DCHUNK}),
               list_transform(range(0, 16),
                 j -> 'uq' || CAST(tok.doc_id AS VARCHAR) || '_'
                      || CAST(j AS VARCHAR))) AS t
      FROM tok WHERE tok.doc_id < 5 AND len(t) >= {DCHUNK}
    ), all_tok AS (
      SELECT doc_id, t FROM tok WHERE len(t) > 0
      UNION ALL SELECT doc_id, t FROM planted
    ), starts AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1, {DCHUNK})) AS s
      FROM all_tok
    ), chunks AS (
      SELECT doc_id, s,
             array_to_string(
               list_slice(t, s, least(s + {DCHUNK} - 1, len(t))), ' ')
               AS chunk_text
      FROM starts
    ), marked AS (
      SELECT doc_id, s, chunk_text,
             COUNT(*) OVER (PARTITION BY md5(chunk_text)) AS n
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE n > 1) AS n_dup_chunks,
           COALESCE(string_agg(chunk_text, ' ' ORDER BY s)
                      FILTER (WHERE n = 1), '') AS clean_text
    FROM marked GROUP BY doc_id
    HAVING COUNT(*) FILTER (WHERE n > 1) > 0
    """,
    doc="Chunk-level EXCISION — the transformation dedup_chunk_level's "
    "signal exists to drive: rebuild each affected document from only "
    "its non-duplicated chunks (corpus-unique paragraphs), in original "
    "chunk order, instead of dropping the whole document. Emitted only "
    "for documents that lost at least one chunk; a fully-duplicated "
    "document yields an empty clean_text (= drop it). Shape: one "
    "shuffle on the chunk fingerprint (the count window) and one "
    "doc-grain rebuild agg; chunk text necessarily rides the shuffle "
    "once — a rewriting operator's output is corpus-proportional by "
    "definition, and rows are bounded by the chunk size. The same "
    "planted partial dups as dedup_chunk_level prove surgical "
    "excision (planted docs keep their unique tail, lose the copied "
    "head).",
)
def dedup_chunk_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _chunked_corpus(spark, sf_dir)
    w = Window.partitionBy(F.md5("chunk_text"))
    marked = chunks.withColumn("n", F.count(F.lit(1)).over(w))
    kept = F.filter(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("n") == 1,
                    F.struct(F.col("s"), F.col("chunk_text")),
                )
            )
        ),
        lambda x: x.isNotNull(),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("n") > 1).alias("n_dup_chunks"),
            F.array_join(
                F.transform(kept, lambda x: x["chunk_text"]), " "
            ).alias("clean_text"),
        )
        .filter(F.col("n_dup_chunks") > 0)
    )


@register(
    "length_bucket_batches",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(trim(lower(text)),
                 '\\s+'), t -> t <> '')) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ), bucketed AS (
      SELECT doc_id, n_tokens,
             CAST((n_tokens // 16) * 16 AS BIGINT) AS len_bucket,
             ROW_NUMBER() OVER (
               PARTITION BY (n_tokens // 16)
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM toks WHERE n_tokens > 0
    ), batches AS (
      SELECT len_bucket, (rn - 1) // 8 AS batch_id,
             COUNT(*) AS n_docs, SUM(n_tokens) AS real_tokens,
             MAX(n_tokens) * COUNT(*) AS padded_tokens
      FROM bucketed GROUP BY 1, 2
    )
    SELECT len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(real_tokens) AS BIGINT) AS real_tokens,
           CAST(SUM(padded_tokens) AS BIGINT) AS padded_tokens,
           ROUND(1.0 - SUM(real_tokens) * 1.0 / SUM(padded_tokens), 4)
             AS padding_frac
    FROM batches GROUP BY 1
    """,
    doc="Length-grouped batch packing accounting — the padding-"
    "efficiency move for fine-tuning/eval batching (as opposed to "
    "pack_training_sequences' concat-and-split pretraining shape): "
    "docs bucket by token length (width 16), order deterministically "
    "by md5(doc_id) within bucket (reproducible batches, no rand()), "
    "form batches of 8, and each batch pads to ITS max length. "
    "Reported per bucket: batches, docs, real vs padded tokens, and "
    "padding_frac — with bucketing this stays near 0 (max 15/16 "
    "waste bound per doc); unbucketed global batching would pad "
    "every batch to its longest member. Shape: one token-count scan "
    "(no text explode — just len()), one shuffle on the bucket key "
    "for the window, two tiny aggs; at 100 TB the bucket key is the "
    "natural write-partitioning for the batch files.",
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    bucketed = toks.withColumn(
        "len_bucket",
        (F.floor(F.col("n_tokens") / 16) * 16).cast("long"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("len_bucket").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    batches = (
        bucketed.withColumn(
            "batch_id", F.floor((F.col("rn") - 1) / 8)
        )
        .groupBy("len_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("real_tokens"),
            (F.max("n_tokens") * F.count(F.lit(1))).alias("padded_tokens"),
        )
    )
    return batches.groupBy("len_bucket").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("real_tokens").alias("real_tokens"),
        F.sum("padded_tokens").alias("padded_tokens"),
        F.round(
            1.0 - F.sum("real_tokens") * F.lit(1.0) / F.sum("padded_tokens"),
            4,
        ).alias("padding_frac"),
    )
