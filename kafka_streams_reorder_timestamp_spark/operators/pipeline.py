"""The end-to-end corpus-curation pipeline: what a user of this engine
actually runs over raw crawl text before LLM training.

One declarative plan chains the engine's own stages —

    documents
      → exact dedup           (keep lowest doc_id per text fingerprint)
      → quality filter        (token count, alnum ratio)
      → per-(lang, source) corpus accounting

— and stays a single Catalyst query: the dedup window, the filter, and
the final rollup fuse into two shuffles total (fingerprint, then group
keys), with every text-derived expression computed exactly once. That
is the point of composing stages as DataFrames rather than
materializing between steps: at 100 TB the intermediate "surviving
documents" table never hits storage.

The DuckDB oracle mirrors the same CTE chain, so the WHOLE pipeline —
not just its stages — is value-hash-checked per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texthash import normalize_text
from ..sources.catalog import load_table
from .registry import register
from .text import WORD

MIN_TOKENS = 10
MIN_ALNUM_PCT4 = 5000  # alnum/chars ratio >= 0.5, in 1e-4 units


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH deduped AS (
      SELECT doc_id, lang, source, text, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)),
                                               '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM documents
      WHERE text IS NOT NULL
    ), scored AS (
      SELECT doc_id, lang, source, n_chars,
             len(regexp_extract_all(text, '{WORD}')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               AS n_alnum
      FROM deduped WHERE rn = 1
    ), kept AS (
      SELECT * FROM scored
      WHERE n_tokens >= {MIN_TOKENS}
        AND (2 * 10000 * n_alnum + n_chars) // (2 * n_chars)
            >= {MIN_ALNUM_PCT4}
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_alnum) AS BIGINT) AS total_alnum
    FROM kept
    GROUP BY 1, 2
    """,
    doc="Flagship user-story pipeline: dedup → quality-filter → corpus "
    "accounting as ONE fused Catalyst plan (two shuffles end to end; "
    "no materialized intermediates). Every stage reuses the engine's "
    "own primitives; alnum-ratio threshold uses exact bigint "
    "arithmetic so the filter boundary is engine-independent.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    win = Window.partitionBy(
        F.md5(normalize_text(F.col("text")))
    ).orderBy("doc_id")
    deduped = (
        d.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    scored = deduped.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD), 0)).alias(
            "n_tokens"
        ),
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", "")).alias(
            "n_alnum"
        ),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (
            F.expr("(2 * 10000 * n_alnum + n_chars) div (2 * n_chars)")
            >= MIN_ALNUM_PCT4
        )
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_alnum").alias("total_alnum"),
    )
