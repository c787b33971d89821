"""Tokenization, shingling, and MinHash signatures as Column exprs.

The MinHash family is built on ``xxhash64`` with a per-function seed
token prepended to the input — k independent hash functions without
leaving the JVM. Signatures are ``array<bigint>``; banding for LSH
happens in the dedup operator (explode → bucket groupBy), which keeps
the candidate generation a single shuffle on (band, bucket).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


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


def _minhash_coeffs(num_hashes: int, seed: int = 0x5EED):
    """Deterministic odd multipliers / offsets for the k universal hash
    functions h_j(x) = a_j*x + b_j. Coefficients are 31-bit and x is
    masked to 32 bits, so a*x+b < 2^63 — no ANSI-mode long overflow."""
    import random

    rng = random.Random(seed)
    a = [rng.getrandbits(31) | 1 for _ in range(num_hashes)]
    b = [rng.getrandbits(31) for _ in range(num_hashes)]
    return a, b


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """MinHash signature: array of `num_hashes` min-over-shingles values.

    Each shingle is hashed ONCE with xxhash64 (masked to 32 bits); hash
    function j is then the universal-hash derivation ``a_j*h + b_j``
    (standard MinHash practice), so signature cost is one string hash +
    k multiply-adds per shingle instead of k string hashes.
    Deterministic; all JVM-side arithmetic, overflow-free under ANSI.
    Empty shingle arrays produce an empty signature (callers filter).
    """
    a, b = _minhash_coeffs(num_hashes)
    a_lit = F.array(*[F.lit(x) for x in a])
    b_lit = F.array(*[F.lit(x) for x in b])
    base = F.transform(shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))
    return F.when(F.size(shingles) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda j: F.array_min(
                F.transform(
                    base,
                    lambda h: F.element_at(a_lit, j + 1) * h + F.element_at(b_lit, j + 1),
                )
            ),
        )
    )


def minhash_band_buckets(
    text: Column, num_hashes: int = 128, bands: int = 32, shingle_n: int = 3
) -> Column:
    """LSH band buckets per document: array of `bands` bucket hashes,
    computed from raw text in ONE Arrow-batched pass (normalize →
    tokenize → shingle → MinHash → band).

    Spark does not codegen higher-order array lambdas, so the
    pure-Column `minhash_signature` path pays interpreted-eval per
    shingle x hash; this pandas UDF hashes each shingle once (crc32 —
    C-speed, deterministic across workers, unlike Python's salted
    hash()), derives all `num_hashes` functions with one numpy
    broadcast per document, and collapses each band to one bucket
    hash. Tokenization mirrors `tokens()` (lowercase, \\s+ split).
    Empty/None text yields NULL (callers drop).
    """
    import re

    a, b = _minhash_coeffs(num_hashes)
    a_arr = np.array(a, dtype=np.int64)
    b_arr = np.array(b, dtype=np.int64)
    rows_per_band = num_hashes // bands
    ws = re.compile(r"\s+")

    @pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            if txt is None or not txt.strip():
                out.append(None)
                continue
            tok = ws.split(txt.strip().lower())
            if len(tok) >= shingle_n:
                sh = {
                    " ".join(tok[i : i + shingle_n])
                    for i in range(len(tok) - shingle_n + 1)
                }
            else:
                sh = {" ".join(tok)}
            h = np.fromiter(
                (zlib.crc32(s.encode()) for s in sh), dtype=np.int64, count=len(sh)
            )
            sig = (a_arr[None, :] * h[:, None] + b_arr).min(axis=0)
            bb = sig.reshape(bands, rows_per_band)
            out.append([zlib.crc32(bb[i].tobytes()) for i in range(bands)])
        return pd.Series(out)

    return _buckets(text)
