"""Tokenization, shingling, and MinHash machinery.

Two MinHash implementations with the same universal-hash family
(h_j(x) = (a_j*x + b_j) mod 2^31-1):

- `minhash_signature`: pure Column expressions over xxhash64 — zero
  Python, but Spark interprets higher-order array lambdas per element,
  so it is the reference implementation, not the hot path;
- `minhash_features`: one Arrow-batched numpy pass emitting band
  buckets + the shingle hash set together — what the LSH dedup
  operator actually runs.

Banding happens in the dedup operator (explode → bucket groupBy),
keeping candidate generation a single shuffle on (band, bucket).
"""

from __future__ import annotations

import hashlib
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


_MERSENNE31 = (1 << 31) - 1


def _minhash_coeffs(num_hashes: int, seed: int = 0x5EED):
    """Deterministic coefficients for the k universal hash functions
    h_j(x) = (a_j*x + b_j) mod p with p = 2^31-1 (Mersenne prime) and
    a,b,x all < p, so a*x+b < 2^62 — no ANSI-mode long overflow. The
    modulus is essential and must dominate a*x (a near-miss like
    mod 2^61-1 over 2^63-range products wraps at most a few times,
    leaving the function mostly monotone in x — every 'hash function'
    then selects the same minimum shingle and the signature is
    degenerate)."""
    import random

    rng = random.Random(seed)
    a = [rng.getrandbits(31) % (_MERSENNE31 - 1) + 1 for _ in range(num_hashes)]
    b = [rng.getrandbits(31) % _MERSENNE31 for _ in range(num_hashes)]
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
    base = F.transform(
        shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)) % _MERSENNE31
    )
    return F.when(F.size(shingles) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda j: F.array_min(
                F.transform(
                    base,
                    lambda h: (
                        F.element_at(a_lit, j + 1) * h + F.element_at(b_lit, j + 1)
                    )
                    % F.lit(_MERSENNE31),
                )
            ),
        )
    )


# Rolling-combine mixing constants for token→shingle hashing.
_C1 = np.int64(0x9E3779B1)
_MASK32 = np.int64(0xFFFFFFFF)
_WS = None  # compiled lazily (regex import kept local to call sites)

# Worker-persistent token -> 32-bit-hash cache (same rationale as the
# SimHash cache in operators/simhash.py: Zipf token distribution makes
# the distinct-token count orders of magnitude below the token count).
# Bounded so a pathological vocabulary can't grow executor memory.
_MD5_CACHE: dict[str, int] = {}


def _md5_32(t: str) -> int:
    """The first 4 md5 digest bytes read big-endian — an avalanche
    token hash, and exactly the integer DuckDB computes as
    ('0x' || substring(md5(t),1,8))::HUGEINT, which is what makes the
    dedup_minhash_lsh signature/banding oracle exact (an earlier crc32
    variant was not DuckDB-expressible)."""
    h = _MD5_CACHE.get(t)
    if h is None:
        if len(_MD5_CACHE) >= 1 << 20:
            _MD5_CACHE.clear()
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big")
        _MD5_CACHE[t] = h
    return h


def _shingle_hash_set(txt, shingle_n: int, mask32: bool = True):
    """Distinct shingle hashes of one document (sorted), or None.

    Tokens are md5-prefix-hashed once (`_md5_32`, cache-backed) and
    combined into shingle hashes with a rolling numpy expression — the
    whole shingle set costs one hash per DISTINCT token plus vectorized
    arithmetic. Hashing the shingle *identity* rather than its string
    is fine for Jaccard purposes: any deterministic uniform hash
    estimates set overlap equally. `mask32=True` yields the 32-bit
    universe the MinHash signatures sign over; `mask32=False` keeps the
    full 64-bit mix for callers whose Jaccard must be collision-free in
    practice (birthday bound ~1e-14 at corpus shingle counts).
    Every step (token hash, int64-wrap rolling combine, mask) is
    integer arithmetic DuckDB reproduces bit-exactly in HUGEINT mod
    2^64 — see the dedup_minhash_lsh oracle.
    """
    global _WS
    if _WS is None:
        import re

        _WS = re.compile(r"\s+")
    if txt is None or not txt.strip():
        return None
    tok = _WS.split(txt.strip().lower())
    c = np.fromiter(
        (_md5_32(t) for t in tok), dtype=np.int64, count=len(tok)
    )
    if len(c) >= shingle_n:
        h = c[: len(c) - shingle_n + 1].copy()
        for j in range(1, shingle_n):
            h = h * _C1 + c[j : len(c) - shingle_n + 1 + j]
    else:
        # Sub-shingle-length document: ONE shingle — the same rolling
        # h = h*_C1 + c[j] recurrence applied over all tokens as a
        # single window (exactly the >=n path when len == shingle_n).
        # Order-SENSITIVE by construction: 'aa bb' and 'bb aa' hash
        # differently, matching the whole-document string-shingle
        # convention of the DuckDB oracles and the property-test brute
        # force. (The previous (c * _C2).sum() was commutative, so any
        # permutation pair of short docs falsely collided — round-12
        # fix, pinned by test_short_doc_shingle_order_sensitive.)
        h = c[:1].copy()
        for j in range(1, len(c)):
            h = h * _C1 + c[j : j + 1]
    return np.unique(h & _MASK32 if mask32 else h)


def minhash_features(
    text: Column, num_hashes: int = 128, bands: int = 32, shingle_n: int = 3
) -> Column:
    """Struct column ``(buckets: array<bigint>, shingles: array<bigint>)``
    — LSH band buckets AND the shingle hash set from ONE Arrow pass
    (normalize → tokenize → shingle-hash → MinHash → band).

    Why a pandas UDF: Spark does not codegen higher-order array
    lambdas, so the pure-Column `minhash_signature` path pays
    interpreted-eval per shingle x hash; here the shingle hash set
    costs one crc32 per TOKEN plus vectorized numpy combination
    (`_shingle_hash_set`), all `num_hashes` functions derive from one
    numpy broadcast per document, and each band collapses to one
    bucket hash. The LSH operator needs both outputs (banding for
    candidates, shingle sets for verification); computing them
    together and persisting the projection runs this pipeline once
    instead of once per consumer. Tokenization mirrors `tokens()`
    (lowercase, \\s+ split). Empty/None text yields NULL struct
    fields (callers drop)."""
    a, b = _minhash_coeffs(num_hashes)
    a_arr = np.array(a, dtype=np.int64)
    b_arr = np.array(b, dtype=np.int64)
    rows_per_band = num_hashes // bands

    @pandas_udf("buckets array<bigint>, shingles array<bigint>")
    def _feats(texts: pd.Series) -> pd.DataFrame:
        buckets, shingles = [], []
        for txt in texts:
            h = _shingle_hash_set(txt, shingle_n)
            if h is None:
                buckets.append(None)
                shingles.append(None)
                continue
            sig = ((a_arr[None, :] * (h % _MERSENNE31)[:, None] + b_arr) % _MERSENNE31).min(
                axis=0
            )
            bb = sig.reshape(bands, rows_per_band)
            buckets.append([zlib.crc32(bb[i].tobytes()) for i in range(bands)])
            shingles.append(h.tolist())
        return pd.DataFrame({"buckets": buckets, "shingles": shingles})

    # asNondeterministic (guide §4.4): callers filter on the UDF output
    # (buckets IS NOT NULL), and Catalyst pushes such a filter below the
    # pre-widen repartition by DUPLICATING the UDF — the r13 before-plans
    # show a second full-corpus ArrowEvalPython evaluated single-task
    # under the exchange purely to feed the pushed filter. The function
    # is pure; the flag only forbids the optimizer from duplicating or
    # reordering it, so results are unchanged and the signature pass
    # runs exactly once.
    # CONTRACT for callers (applies to every asNondeterministic column
    # in this module): nondeterministic expressions are only allowed in
    # Project/Filter/Aggregate/Window — using this column DIRECTLY in a
    # join condition, groupBy key, or generator fails analysis. Alias
    # it in a select() first and operate on the materialized column.
    return _feats.asNondeterministic()(text)


def shingle_hashes(text: Column, shingle_n: int = 3) -> Column:
    """Column: sorted distinct shingle hashes per document — the same
    shingle universe `minhash_features` signs over, exposed for
    exact Jaccard verification of LSH candidates (array_intersect on
    bigint arrays, JVM-native)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _hashes(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                (h.tolist() if h is not None else None)
                for h in (_shingle_hash_set(t, shingle_n) for t in texts)
            ]
        )

    # Same §4.4 duplication guard as minhash_features (pure function).
    return _hashes.asNondeterministic()(text)


def shingle_hashes64(text: Column, shingle_n: int = 3) -> Column:
    """Sorted distinct FULL-WIDTH (64-bit) shingle hashes per document.

    For exact-similarity operators (AllPairs/PPJoin) whose Jaccard
    values must equal the string-shingle definition in practice: the
    birthday bound over 64 bits makes a collision ~1e-14 at corpus
    shingle counts, vs ~1e-3 for the 32-bit universe. One Arrow pass,
    one crc32 per token plus vectorized combination — ~10x faster than
    evaluating the equivalent higher-order Column shingling, which
    Spark interprets per element. np.unique's ascending order doubles
    as the prefix-filter's global total order."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _hashes(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                (h.tolist() if h is not None else None)
                for h in (
                    _shingle_hash_set(t, shingle_n, mask32=False) for t in texts
                )
            ]
        )

    # Same §4.4 duplication guard as minhash_features (pure function):
    # the AllPairs operators filter on size(sh) > 0, and the pushed
    # filter otherwise re-evaluates this pass single-task under the
    # widen exchange inside the persisted subtree.
    return _hashes.asNondeterministic()(text)
