"""SimHash near-duplicate detection over text columns.

Complements MinHash (dedup.py): SimHash produces ONE 64-bit signature
per document whose Hamming distance tracks cosine similarity of the
token-frequency vectors — cheaper state than a 128-value MinHash
signature, best for "almost identical" thresholds (hamming <= k).

Scale shape mirrors the LSH pipeline: signatures in one Arrow-batched
pass; candidates from band buckets (pigeonhole: two signatures within
Hamming distance k must agree on at least one of k+1 bands), so the
candidate join is bounded by bucket size; verification is JVM-side
``bit_count(a XOR b)`` — one instruction per pair.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..sources.catalog import load_table
from .registry import register

_WS = None
# Worker-persistent token -> hash cache: real corpora follow Zipf, so
# the distinct-token count is orders of magnitude below the token
# count and almost every lookup hits. Bounded (cleared at 2^20
# entries) so a pathological vocabulary can't grow executor memory.
_HASH_CACHE: dict[str, int] = {}


def _md5_64(t: str) -> int:
    """The first 8 md5 digest bytes read big-endian — an avalanche
    hash (an earlier crc32 variant needed a splitmix64 finalizer
    because crc is GF(2)-linear and correlated similar tokens' bits;
    md5 does not), and, crucially, the exact integer DuckDB computes
    as ('0x' || substring(md5(t),1,16))::UBIGINT, which is what makes
    the dedup_simhash oracle exact."""
    h = _HASH_CACHE.get(t)
    if h is None:
        if len(_HASH_CACHE) >= 1 << 20:
            _HASH_CACHE.clear()
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        _HASH_CACHE[t] = h
    return h


def _token_hashes64(txt: str) -> np.ndarray | None:
    """Per-token 64-bit md5-prefix hashes (`_md5_64`), cache-backed."""
    global _WS
    if _WS is None:
        import re

        _WS = re.compile(r"\s+")
    if txt is None or not txt.strip():
        return None
    tok = _WS.split(txt.strip().lower())
    return np.fromiter(
        (_md5_64(t) for t in tok), dtype=np.uint64, count=len(tok)
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the whitespace-tokenized text (bigint column).

    Per document: each token's 64 hash bits vote +1/-1 per position;
    the signature's bit b is 1 iff the position-b vote sum is positive.
    Vectorized: one (tokens x 64) bit-unpack + column sum per document.
    """

    @pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for txt in texts:
            h = _token_hashes64(txt)
            if h is None:
                out.append(None)
                continue
            bits = (h[:, None] >> shifts) & np.uint64(1)  # (n_tok, 64)
            # vote sum per position: ones - (n - ones) = 2*ones - n
            ones = bits.sum(axis=0, dtype=np.int64)
            sig_bits = (2 * ones - len(h)) > 0
            sig = np.bitwise_or.reduce(
                np.where(sig_bits, np.uint64(1) << shifts, np.uint64(0))
            )
            out.append(int(sig.astype(np.int64)))  # reinterpret as signed
        return pd.Series(out, dtype="object")

    # asNondeterministic (guide §4.4): simhash_near_dups filters on
    # _sig IS NOT NULL, and Catalyst pushed that filter below the widen
    # repartition by duplicating the UDF — the r13 before-plan ran the
    # signature pass TWICE, once single-task under the exchange. The
    # function is pure; the flag only stops the duplication.
    return _simhash.asNondeterministic()(text)


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs of documents whose SimHashes differ in <= `max_hamming`
    bits. Banding: the 64-bit signature splits into `max_hamming + 1`
    bands; by pigeonhole, any pair within the Hamming budget shares at
    least one full band, so same-band-value buckets generate all true
    candidates. Verification: bit_count(xor) — JVM built-in.
    """
    # Widen narrow inputs so the signature UDF runs at full parallelism
    # (no-op on real inputs with >= cores partitions).
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sig")
    ).filter(F.col("_sig").isNotNull())
    return hamming_band_pairs(sigs, max_hamming)


def hamming_band_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs with Hamming(sig_a, sig_b) <= max_hamming over a
    (_id, _sig int64) table — the signature-agnostic half of the
    SimHash operator (also drives perceptual-hash media dedup):
    pigeonhole banding into max_hamming + 1 bands guarantees every
    qualifying pair shares a full band; in-bucket pairs generate
    in-row; bit_count(xor) verifies JVM-side."""
    bands = max_hamming + 1
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1

    band_vals = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("_sig"), i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    banded = sigs.select("_id", "_sig", F.explode(band_vals).alias("bv")).select(
        "_id", "_sig", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )

    ids = F.sort_array(F.collect_list(F.struct("_id", "_sig")))
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("members"),
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                    lambda y: F.struct(
                        x["_id"].alias("doc_a"),
                        y["_id"].alias("doc_b"),
                        x["_sig"].alias("sig_a"),
                        y["_sig"].alias("sig_b"),
                    ),
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    cand = (
        banded.groupBy("band", "val")
        .agg(ids.alias("members"))
        .filter(F.size("members") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sig_a", "p.sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# The full SimHash is exactly SQL-expressible once the token hash is
# the md5-prefix integer both engines can compute: per-token UBIGINT
# hashes, 64 per-bit vote sums in one GROUP BY, majority threshold
# (2*ones > n, exact ties -> 0 on both sides), HUGEINT bit assembly
# wrapped to signed BIGINT — the same recipe as media_phash_neardup.
# The pigeonhole banding is candidate generation only, so the oracle
# brute-forces all pairs at Hamming <= 3 (sf-bounded oracle-side cost).
_VOTE_COLS = ",\n             ".join(
    f"SUM(CAST((h >> {b}) & 1 AS BIGINT)) AS o{b}" for b in range(64)
)
_SIG_TERMS = "\n           + ".join(
    f"CASE WHEN 2 * o{b} > n THEN CAST(1 AS HUGEINT) << {b} "
    "ELSE CAST(0 AS HUGEINT) END"
    for b in range(64)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH base_toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), corpus_toks AS (
      SELECT doc_id, toks FROM base_toks WHERE len(toks) > 0
      UNION ALL
      SELECT doc_id + 1000000000 AS doc_id,
             toks[1:GREATEST(len(toks) - 1, 1)] AS toks
      FROM base_toks WHERE doc_id < 20 AND len(toks) > 0
    ), th AS (
      SELECT doc_id, ('0x' || substring(md5(t), 1, 16))::UBIGINT AS h
      FROM (SELECT doc_id, unnest(toks) AS t FROM corpus_toks)
    ), votes AS (
      SELECT doc_id, COUNT(*) AS n,
             {_VOTE_COLS}
      FROM th GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id,
             {_SIG_TERMS} AS v
      FROM votes
    ), sig64 AS (
      SELECT doc_id,
             CAST(CASE WHEN v >= CAST(1 AS HUGEINT) << 63
                  THEN v - (CAST(1 AS HUGEINT) << 64) ELSE v END
                  AS BIGINT) AS sig
      FROM sigs
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM sig64 a JOIN sig64 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
    doc="SimHash near-dup over documents plus a deterministic perturbed "
    "sample (20 docs, one token dropped): 64-bit signatures, "
    "pigeonhole banding, bit_count(xor) verification. Round 9: the "
    "former pytest-only contract gains a full DuckDB oracle — the "
    "token hash is the md5-prefix integer both engines compute "
    "exactly, so the oracle recomputes signatures relationally "
    "(64 integer vote sums, HUGEINT bit assembly) and brute-forces "
    "Hamming <= 3, value-hash-checking both the signature math and "
    "the banding's pigeonhole completeness.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from ..functions.texthash import tokens

    tok = tokens(F.col("text"))
    # doc_id is dense from 0, so this is the 20 lowest ids as a
    # pushed-down scan filter (no sort job).
    perturbed = (
        d.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.array_join(F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1))), " ")
            .alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(perturbed)
    return simhash_near_dups(corpus, "text", "doc_id", max_hamming=3)
