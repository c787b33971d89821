"""Tokenization, shingling, and MinHash signatures as Column exprs.

The MinHash family is built on ``xxhash64`` with a per-function seed
token prepended to the input — k independent hash functions without
leaving the JVM. Signatures are ``array<bigint>``; banding for LSH
happens in the dedup operator (explode → bucket groupBy), which keeps
the candidate generation a single shuffle on (band, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse runs of whitespace: the canonical form used
    for fingerprints and exact dedup."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text, empty strings removed."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")


def word_shingles(tok: Column, n: int = 3) -> Column:
    """n-token shingles (space-joined) from a token array.

    Documents shorter than n tokens yield their full token string as a
    single shingle so they still participate in signatures.
    """
    joined = F.array_join(tok, " ")
    n_tok = F.size(tok)
    sh = F.transform(
        F.sequence(F.lit(0), n_tok - n),
        lambda i: F.array_join(F.slice(tok, i + 1, n), " "),
    )
    return F.when(n_tok >= n, sh).otherwise(F.array(joined))


def char_shingles(col: Column, k: int = 8) -> Column:
    """k-character shingles of the normalized text (for fingerprinting
    short/no-whitespace content)."""
    norm = normalize_text(col)
    ln = F.length(norm)
    sh = F.transform(
        F.sequence(F.lit(1), ln - k + 1), lambda i: F.substring(norm, i, F.lit(k))
    )
    return F.when(ln >= k, sh).otherwise(F.array(norm))


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """MinHash signature: array of `num_hashes` min-over-shingles values.

    Hash function j is ``xxhash64("j:" || shingle)`` — deterministic,
    JVM-side, and independent across j for Jaccard estimation purposes.
    Empty shingle arrays produce an empty signature (callers filter).
    """
    return F.when(F.size(shingles) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda j: F.array_min(
                F.transform(
                    shingles,
                    lambda s: F.xxhash64(F.concat(j.cast("string"), F.lit(":"), s)),
                )
            ),
        )
    )
