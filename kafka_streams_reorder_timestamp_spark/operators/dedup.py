"""Deduplication operators over the `documents` table: exact (hash),
n-gram Jaccard, MinHash+LSH near-dup, and embedding-cosine near-dup.

Design for 100 TB:
  - exact dedup is one shuffle on a 128-bit fingerprint (uniform key,
    no skew) — the canonical first pass;
  - pairwise similarity is NEVER all-pairs: candidates come from a
    blocking key (lang/source), LSH band buckets, or hyperplane-sign
    buckets, so the join fan-out is bounded by bucket size;
  - MinHash signatures/banding are pure Column expressions (xxhash64)
    — no Python in the signature path; only candidate verification
    touches the token arrays again.

Reference tie-in: the reference's only dedup is first-writer-wins on
event timestamp (reference: src/main/java/org/example/Application.java:89-93);
`reorder.py` ports that. This module is the corpus-dedup extension
surface mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import (
    minhash_band_buckets,
    normalize_text,
    tokens,
    word_shingles,
)
from ..functions.vectors import as_double, cosine
from ..sources.catalog import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    One shuffle on the md5 fingerprint; ties broken deterministically by
    id. Returns the surviving rows plus their fingerprint and the size
    of the duplicate group they won.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    w = df.select(df["*"], fp)
    from pyspark.sql import Window

    win = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        w.withColumn("rn", F.row_number().over(win))
        .withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_exact_docs",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           COUNT(*) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
             AS group_size
    FROM documents
    WHERE text IS NOT NULL
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ORDER BY doc_id) = 1
    """,
    doc="Exact dedup: group by md5 of normalized text, keep min doc_id. "
    "One shuffle on a uniform 128-bit key — no skew at any scale.",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return exact_dedup(d, "text", "doc_id").select("doc_id", "fingerprint", "group_size")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (blocked exact similarity — the oracle-checkable
# pairwise path; LSH below is the scale path)


@register(
    "dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.t, b.t))
                 / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))), 4) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.t, b.t))
          / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.8
    """,
    doc="Blocked n-gram Jaccard near-dup: candidate pairs only within "
    "(lang, source) blocks, exact unigram-set Jaccard >= 0.8. The join "
    "fan-out is bounded by block size, never all-pairs.",
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("t"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.t"), F.col("b.t")))
    union = F.size(F.col("a.t")) + F.size(F.col("b.t")) - inter
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the scale path)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding.

    Pipeline (each stage a single narrow/shuffle step):
      1. tokens → `shingle_n`-token shingles → `num_hashes` MinHash
         values (all Column exprs, one scan);
      2. split the signature into `bands` bands, hash each band,
         explode → shuffle on (band, band_hash): docs agreeing on any
         band land in the same bucket;
      3. within-bucket self-join (a.id < b.id) → distinct candidate
         pairs — fan-out bounded by bucket size;
      4. verify candidates with the exact shingle-set Jaccard and keep
         pairs >= `threshold`.

    With r = num_hashes/bands rows per band, the match probability is
    the standard 1-(1-j^r)^bands S-curve; defaults (128/32 → r=4) catch
    j>=0.7 with >99% probability.
    """
    docs = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).filter(F.col("_text").isNotNull())
    # Normalize → shingle → MinHash → band in one Arrow-batched pass
    # (see minhash_band_buckets). Band rows carry ONLY (_id, band,
    # bucket) — no text/shingles ride through the bands-times explode
    # and its shuffle.
    banded = docs.select(
        "_id",
        F.posexplode(
            minhash_band_buckets(F.col("_text"), num_hashes, bands, shingle_n)
        ).alias("band", "bucket"),
    )

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verify with exact shingle-set Jaccard. Shingles are computed
    # AFTER the candidate join, so only candidate rows (a tiny set) pay
    # the shingling cost.
    def _sh(col: str):
        return F.array_distinct(word_shingles(tokens(F.col(col)), shingle_n))

    txt_a = docs.select(F.col("_id").alias("doc_a"), F.col("_text").alias("text_a"))
    txt_b = docs.select(F.col("_id").alias("doc_b"), F.col("_text").alias("text_b"))
    paired = (
        cand.join(txt_a, "doc_a")
        .join(txt_b, "doc_b")
        .select("doc_a", "doc_b", _sh("text_a").alias("sh_a"), _sh("text_b").alias("sh_b"))
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        paired.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # hash-function-specific — driver records rows-only;
    # pytest verifies detected pairs against exact Jaccard ground truth.
    doc="MinHash+LSH near-dup over documents plus a deterministic "
    "perturbed sample (20 docs with the last 2 words dropped) so the "
    "operator provably detects the planted near-duplicates.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Plant near-duplicates: copies of the 20 lowest doc_ids with the
    # final 2 tokens removed; new ids offset by 10^9. Deterministic.
    tok = tokens(F.col("text"))
    perturbed = (
        d.orderBy("doc_id")
        .limit(20)
        .select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.array_join(F.slice(tok, 1, F.greatest(F.size(tok) - 2, F.lit(1))), " ")
            .alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(perturbed)
    return minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.7)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup


@register(
    "dedup_embedding_pairs",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    """,
    doc="Embedding-cosine near-dup, blocked by label: exact cosine "
    "within blocks, threshold 0.35. The LSH-bucketed variant in "
    "similarity.py is the unblocked scale path.",
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = cosine(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
