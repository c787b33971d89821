"""Deduplication operators over the `documents` table: exact (hash),
n-gram Jaccard, MinHash+LSH near-dup, and embedding-cosine near-dup.

Design for 100 TB:
  - exact dedup is one shuffle on a 128-bit fingerprint (uniform key,
    no skew) — the canonical first pass;
  - pairwise similarity is NEVER all-pairs: candidates come from a
    blocking key (lang/source), LSH band buckets, or hyperplane-sign
    buckets, so the join fan-out is bounded by bucket size;
  - MinHash signature+banding is one Arrow-batched numpy pass per
    document (minhash_features); band rows carry only ids and
    bucket hashes, and only verified candidates re-touch token arrays.

Reference tie-in: the reference's only dedup is first-writer-wins on
event timestamp (reference: src/main/java/org/example/Application.java:89-93);
`reorder.py` ports that. This module is the corpus-dedup extension
surface mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import (
    _minhash_coeffs,
    minhash_features,
    normalize_text,
    shingle_hashes,
    shingle_hashes64,
    tokens,
)
from ..functions.vectors import as_double
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
    SELECT MIN(doc_id) AS doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           COUNT(*) AS group_size
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY 2
    """,
    doc="Exact dedup: group by md5 of normalized text, keep min doc_id. "
    "A single partial+final hash aggregation (survivor id = MIN) — one "
    "shuffle of pre-aggregated digests, no window pass; uniform 128-bit "
    "key, no skew at any scale. exact_dedup() is the full-row variant.",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return (
        d.select(F.md5(normalize_text(F.col("text"))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("doc_id", "fingerprint", "group_size")
    )


@register(
    "dedup_cluster_size_histogram",
    oracle="""
    WITH cl AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             COUNT(*) AS cluster_size,
             SUM(COALESCE(n_chars, 0)) AS total_chars,
             arg_min(COALESCE(n_chars, 0), doc_id) AS survivor_chars
      FROM documents WHERE text IS NOT NULL
      GROUP BY 1
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS dup_docs_removed,
           CAST(SUM(total_chars - survivor_chars) AS BIGINT)
             AS chars_saved
    FROM cl GROUP BY 1
    """,
    doc="The dedup SAVINGS report — what exact dedup actually buys, "
    "the number a curation run publishes: the distribution of "
    "duplicate-cluster sizes (how many texts appear exactly k times) "
    "with, per size, how many documents survivorship removes and how "
    "many characters of storage/compute that saves. Savings is "
    "SUM(n_chars) minus the min-doc_id survivor's chars per cluster "
    "(min_by / arg_min) — NOT (size-1) * any single doc's length, "
    "because the fingerprint normalizes case/whitespace, so raw "
    "n_chars can differ WITHIN a cluster and the removed copies' "
    "actual bytes are what dedup_exact_docs' survivorship frees. Two "
    "cheap aggregations: the same digest-only fingerprint shuffle as "
    "dedup_exact_docs, then a size-keyed rollup over "
    "cluster-cardinality rows — at 100 TB the second agg's input is "
    "one row per DISTINCT text, already reduced. Complements "
    "dedup_rate_by_source (who duplicates) with the size/weight "
    "profile (HOW texts duplicate: a fat head of boilerplate vs a "
    "long tail of double-posts).",
)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cl = (
        d.select(
            F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
            "doc_id",
            # coalesce BEFORE the aggregates: Spark's min_by returns
            # the (possibly NULL) value at min doc_id while DuckDB's
            # arg_min SKIPS null arguments — pre-coalescing makes the
            # survivor pick identical on both engines for nullable
            # n_chars
            F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("n_chars", "doc_id").alias("survivor_chars"),
        )
    )
    return cl.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"),
        F.sum(F.col("cluster_size") - 1).alias("dup_docs_removed"),
        F.sum(F.col("total_chars") - F.col("survivor_chars")).alias(
            "chars_saved"
        ),
    )


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
    "fan-out is bounded by block size, never all-pairs. A size-band "
    "predicate in the join condition (J >= 0.8 forces |A|/|B| within "
    "[0.8, 1.25] since J <= min/max) prunes most pairs before the "
    "expensive array_intersect runs — result-identical, order-of-"
    "magnitude fewer intersections on real corpora.",
)
def dedup_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    sample_frac: float = 1.0,
    id_bound: int | None = None,
) -> DataFrame:
    """`sample_frac` / `id_bound` bound the doc universe with the same
    deterministic md5-bucket predicate as `lsh_recall_audit` — the
    100 TB audit knob (DEPLOY.md, monitoring): exact pairs over a
    sample of the corpus, pushed down to the scan, never the full
    quadratic block work. Defaults = full sf-bounded corpus (the
    registered oracle twin)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pred = _audit_sample_pred("doc_id", sample_frac, id_bound)
    if pred is not None:
        d = d.filter(pred)
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("t"),
    )
    return blocked_jaccard_pairs(toks, ["lang", "source"], threshold=0.8)


def blocked_jaccard_pairs(
    toks: DataFrame,
    block_cols: list[str],
    threshold: float = 0.8,
    id_col: str = "doc_id",
    set_col: str = "t",
    block_cap: int = 20_000,
    max_salt: int = 8,
) -> DataFrame:
    """Exact set-Jaccard pairs within blocks, skew-hardened.

    A blocked self-join's parallelism is naturally bounded by the number
    of DISTINCT blocks, and its cost is quadratic in block size — one
    hot block (en, common-crawl at corpus scale) becomes one straggler
    task. Blocks larger than `block_cap` rows are therefore split by a
    DETERMINISTIC salt u = xxhash64(id) mod S (S = ceil(n/cap), capped
    at `max_salt`) and self-joined on the TRIANGLE GRID of salt pairs
    (i, j), i <= j: an A-side copy of each row goes to grid cells
    (u, j>=u), a B-side copy to cells (i<=u, u), so every unordered
    in-block pair meets in exactly one cell — (min salts, max salts) —
    and the hot block's quadratic work spreads over S(S+1)/2
    independent join keys. Replication factor is ~S+1 per row but ONLY
    for oversized blocks (S=1 elsewhere reduces to the plain blocked
    join bit-for-bit). Pair uniqueness: cell (i, i) takes id_a < id_b;
    cells (i, j<i>...) i != j take each cross pair once and normalize
    to (least, greatest). Deterministic salts keep the result
    value-hash-stable across runs and engines.

    The J >= t size band (min/max >= t) stays a lossless prefilter
    evaluated before the array_intersect.
    """
    blocks = [F.col(c) for c in block_cols]
    # A doc with no tokens has nothing to compare: its Jaccard against
    # anything is 0/0. The oracles agree by construction (DuckDB float
    # division by zero yields NULL, which fails the >= threshold
    # filter); excluding the rows here keeps the engines aligned AND
    # avoids the ANSI DIVIDE_BY_ZERO two empty docs in one block would
    # otherwise raise (round-11 degenerate-input gate).
    sized = toks.withColumn("sz", F.size(set_col)).filter(F.col("sz") > 0)
    # Per-block row counts: one tiny agg (distinct blocks only),
    # broadcast back onto the rows to derive each block's salt count.
    counts = sized.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bn"))
    salted = sized.join(F.broadcast(counts), block_cols).withColumn(
        "_s",
        F.least(
            F.ceil(F.col("_bn") / F.lit(block_cap)).cast("int"),
            F.lit(max_salt),
        ),
    )
    salted = salted.withColumn(
        "_u", F.pmod(F.xxhash64(F.col(id_col)), F.col("_s")).cast("int")
    )
    # Triangle grid: A-side explodes to cells (u, j >= u), B-side to
    # cells (i <= u, u). The join below shuffles on
    # (block_cols, _i, _j) — a hot block occupies S(S+1)/2 join keys
    # instead of one, which is both the straggler fix locally and the
    # partition spread a 1000-executor shuffle needs.
    a = salted.withColumn(
        "_j", F.explode(F.sequence(F.col("_u"), F.col("_s") - 1))
    ).withColumnRenamed("_u", "_i")
    b = salted.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_u")))
    ).withColumnRenamed("_u", "_j")
    a = a.select(
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(set_col).alias("t_a"),
        F.col("sz").alias("sz_a"),
        F.col("_i").alias("i_a"),
        F.col("_j").alias("j_a"),
    )
    # Distribute the probe side across (block, grid-cell) keys: a
    # single-file scan would otherwise run every cell (and the
    # tokenize) in one task under a broadcast join. At cluster scale
    # this same hash partitioning is what the shuffle join needs anyway.
    a = a.repartition(
        *[F.col(f"a_{c}") for c in block_cols], F.col("i_a"), F.col("j_a")
    )
    b = b.select(
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(set_col).alias("t_b"),
        F.col("sz").alias("sz_b"),
        F.col("_i").alias("i_b"),
        F.col("_j").alias("j_b"),
    )
    on = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols] + [
        F.col("i_a") == F.col("i_b"),
        F.col("j_a") == F.col("j_b"),
    ]
    # Each unordered pair once: same-salt cell orders by id; cross-salt
    # cells pair A-fragment i with B-fragment j exactly once.
    once = F.when(
        F.col("i_a") == F.col("j_a"), F.col("id_a") < F.col("id_b")
    ).otherwise(F.col("id_a") != F.col("id_b"))
    size_band = (
        F.col("sz_a") * F.lit(1.0) >= F.col("sz_b") * F.lit(threshold)
    ) & (F.col("sz_b") * F.lit(1.0) >= F.col("sz_a") * F.lit(threshold))
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    inter = F.size(F.array_intersect(F.col("t_a"), F.col("t_b")))
    union = F.col("sz_a") + F.col("sz_b") - inter
    jac = inter / union
    return (
        a.join(b, cond & once & size_band)
        .filter(jac >= threshold)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
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
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding.

    Pipeline (each stage a single narrow/shuffle step):
      1. tokens → `shingle_n`-token shingles → `num_hashes` MinHash
         values (one Arrow-batched pass, see minhash_features);
      2. split the signature into `bands` bands, hash each band,
         explode → shuffle on (band, band_hash): docs agreeing on any
         band land in the same bucket;
      3. within-bucket self-join (a.id < b.id) → distinct candidate
         pairs — fan-out bounded by bucket size;
      4. verify candidates with the exact shingle-set Jaccard and keep
         pairs >= `threshold`.

    With r = num_hashes/bands rows per band, the match probability is
    the standard 1-(1-j^r)^bands S-curve. Defaults (128/16 → r=8) put
    the curve's knee at j≈(1/16)^(1/8)=0.71 — aligned with the 0.7
    verify threshold so candidate generation produces few
    false-positive pairs (with r=4 the knee sits at 0.42 and the
    verification stage drowns in sub-threshold candidates); j>=0.9
    pairs are still caught with P > 1-(1-0.9^8)^16 ≈ 0.9998.
    """
    docs = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).filter(F.col("_text").isNotNull())
    # The signature pass is the CPU hot spot; a narrow input (one small
    # file locally) would run it nearly serially. Widening to the
    # session's parallelism is a no-op on real inputs, which already
    # carry >= cores partitions.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    # Normalize → shingle → MinHash → band in ONE Arrow-batched pass.
    # The banding explode is this projection's ONLY consumer, so the
    # full-corpus UDF runs exactly once and plan-only consumers
    # (explain, registry enumeration) execute nothing — no persist, no
    # eager count, no cache to leak. (An earlier persist+count executed
    # the pipeline as a side effect of merely BUILDING the plan; a
    # shared-exchange variant still ran the UDF twice because nested-
    # column pruning gives the banding and verification branches
    # different exchange subtrees.) Verification below re-derives
    # shingle sets for the candidate set only, which is bounded by
    # bucket sizes — at corpus scale that is a rounding error next to
    # a second full-corpus signature pass.
    feats = docs.select(
        "_id",
        minhash_features(F.col("_text"), num_hashes, bands, shingle_n)[
            "buckets"
        ].alias("buckets"),
    ).filter(F.col("buckets").isNotNull())
    # Band rows carry ONLY (_id, band, bucket) — no shingle arrays ride
    # through the bands-times explode and its shuffle.
    banded = feats.select(
        "_id", F.posexplode(F.col("buckets")).alias("band", "bucket")
    )

    # Candidate pairs come from grouping each bucket and exploding the
    # in-bucket id combinations — ONE shuffle on (band, bucket), and
    # the expensive banding UDF is evaluated once (a bucket self-join
    # would compute it twice, once per join side). Bucket sizes bound
    # the explosion; `ids` is sorted so doc_a < doc_b by construction.
    ids = F.sort_array(F.collect_list("_id"))
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    cand = (
        banded.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verify with the exact Jaccard of the shingle HASH sets — the same
    # shingle universe the signatures were built from (shingle_hashes
    # shares _shingle_hash_set with minhash_features). Re-deriving the
    # sets for CANDIDATE docs only keeps the full-corpus UDF single-
    # consumer: one semi-join of the corpus against the (small) distinct
    # candidate-id set — AQE turns it into a broadcast join at runtime —
    # then one cheap shingle pass over the survivors. array_intersect
    # over bigint arrays is JVM-native.
    cand_ids = (
        cand.select(F.explode(F.array("doc_a", "doc_b")).alias("_id")).distinct()
    )
    shingled = (
        docs.join(cand_ids, "_id")
        .select("_id", shingle_hashes(F.col("_text"), shingle_n).alias("_sh"))
        # Both verification join sides consume this identically-projected
        # subtree; the shuffle on _id makes the two branches share one
        # exchange (ReuseExchange / AQE stage reuse) so the candidate
        # shingle pass also runs once.
        .repartition("_id")
    )
    sh_a = shingled.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("sh_a"))
    sh_b = shingled.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("sh_b"))
    paired = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        paired.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _planted_corpus(d: DataFrame) -> DataFrame:
    """documents plus deterministic planted near-duplicates: copies of
    the 20 lowest doc_ids with the final 2 tokens removed, new ids
    offset by 10^9. doc_id is dense from 0 in the driver tables, so
    `doc_id < 20` is the 20 lowest — a pushed-down scan filter instead
    of a full sort. Shared by the LSH query and its exact-Jaccard
    oracle twin so their recall/precision is comparable per round."""
    tok = tokens(F.col("text"))
    perturbed = (
        d.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.array_join(F.slice(tok, 1, F.greatest(F.size(tok) - 2, F.lit(1))), " ")
            .alias("text"),
        )
    )
    return d.select("doc_id", "text").unionByName(perturbed)


# Round 9: the whole MinHash+LSH pipeline became exactly
# SQL-expressible once the token hash moved to the md5-prefix integer
# both engines compute (texthash._md5_32). The oracle recomputes, in
# DuckDB: (a) the 32-bit shingle universe — md5-prefix token hashes
# rolled with the same mixing constants in HUGEINT mod 2^64 (numpy's
# int64 wraparound reinterpreted unsigned), masked to 32 bits;
# (b) all 128 universal-hash signature minima with the seed-derived
# coefficients interpolated below; (c) banding as DIRECT band-slice
# equality (16 bands x 8 rows) — bucket-hash equality on the Spark
# side is slice equality up to a crc collision, so this also audits
# bucket-collision false candidates; (d) exact Jaccard verification
# over the same hashed shingle sets. Brute-force pair join is
# oracle-side sf-bounded cost only.
_P64 = 1 << 64


def _lsh_sql_blocks(num_hashes: int, bands: int) -> tuple[str, str]:
    """(signature-min columns, band-fingerprint structs) SQL fragments
    for the LSH oracles, with the seed-derived universal-hash
    coefficients interpolated — _minhash_coeffs draws all `a`s then
    all `b`s, so each (num_hashes) configuration has its own b-vector
    and the fragments must be generated per configuration."""
    a, b = _minhash_coeffs(num_hashes)
    rows = num_hashes // bands
    sig_cols = ",\n             ".join(
        f"MIN((hp * {a[j]} + {b[j]}) % 2147483647) AS s{j}"
        for j in range(num_hashes)
    )
    band_structs = ",\n        ".join(
        "struct_pack(band := {bi}, fp := {fp})".format(
            bi=bi,
            fp=" || ',' || ".join(
                f"s{bi * rows + r}::VARCHAR" for r in range(rows)
            ),
        )
        for bi in range(bands)
    )
    return sig_cols, band_structs


# Shingle/signature/banding CTE chain over a `corpus(doc_id, t)` CTE —
# shared verbatim by the three LSH oracles (pair query 128/16,
# incremental and clusters 64/8). Expects {sig_cols}/{band_structs}
# for the configuration.
_LSH_MACHINERY_SQL = f"""ctoks AS (
      SELECT doc_id,
             list_transform(t, x ->
               ('0x' || substring(md5(x), 1, 8))::BIGINT::HUGEINT) AS c
      FROM corpus
    ), shing AS (
      SELECT doc_id, unnest(
        CASE WHEN len(c) >= 3 THEN
          list_transform(range(1, len(c) - 1), i ->
            ((((c[i] * 2654435761 + c[i+1]) % {_P64})
               * 2654435761 + c[i+2]) % {_P64}) % 4294967296)
        ELSE [ list_reduce(c, (h, x) ->
                 (h * 2654435761 + x) % {_P64}) % 4294967296 ]
        END) AS h32
      FROM ctoks
    ), dset AS (
      SELECT DISTINCT doc_id, CAST(h32 AS BIGINT) AS h
      FROM shing
    ), hp AS (
      SELECT doc_id, h, h % 2147483647 AS hp FROM dset
    ), sigs AS (
      SELECT doc_id,
             {{sig_cols}}
      FROM hp GROUP BY doc_id
    ), bandtab AS (
      SELECT doc_id, b.band AS band, b.fp AS fp
      FROM sigs, unnest([
        {{band_structs}}
      ]) AS u(b)
    ), sets AS (
      SELECT doc_id, list(DISTINCT h) AS sh FROM dset GROUP BY doc_id
    )"""

_LSH_SIG_COLS, _LSH_BAND_STRUCTS = _lsh_sql_blocks(128, 16)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 20 AND len(t) > 0
    ), {_LSH_MACHINERY_SQL.format(sig_cols=_LSH_SIG_COLS,
                                  band_structs=_LSH_BAND_STRUCTS)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandtab a JOIN bandtab b
        ON a.band = b.band AND a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.doc_a
    JOIN sets sb ON sb.doc_id = c.doc_b
    WHERE len(list_intersect(sa.sh, sb.sh))
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.7
    """,
    doc="MinHash+LSH near-dup over documents plus a deterministic "
    "perturbed sample (20 docs with the last 2 words dropped) so the "
    "operator provably detects the planted near-duplicates. Round 9: "
    "the former rows-only contract gains a FULL DuckDB oracle — the "
    "md5-prefix token hash bridges both engines, so the oracle "
    "replays shingling (HUGEINT mod-2^64 rolling combine), all 128 "
    "signature minima, banding (direct band-slice equality), and the "
    "exact-Jaccard verification, value-hash-checking the entire "
    "probabilistic pipeline, not just its planted-pair recall.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return minhash_lsh_pairs(_planted_corpus(d), "text", "doc_id", threshold=0.7)


# ---------------------------------------------------------------------------
# Exact shingle-Jaccard pairs (prefix-filtered AllPairs — the oracle twin
# that makes the LSH approximation error measurable)


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    shingle_n: int = 3,
    with_sizes: bool = False,
) -> DataFrame:
    """EXACT near-duplicate pairs at `threshold` over `shingle_n`-token
    shingle sets — same shingle universe as `minhash_lsh_pairs`, but
    lossless: candidates come from a prefix-filtered inverted index
    (AllPairs/PPJoin family), not probabilistic banding.

    Shingles are represented by their 64-bit hashes (`shingle_hashes64`
    — one Arrow pass; the higher-order string-shingling Columns are
    interpreted per element and were ~10x slower end-to-end), so the
    Jaccard equals the string-shingle definition up to a ~1e-14
    birthday bound, and everything downstream (sort, prefix explode,
    array_intersect) runs on bigints.

    Prefix filter: order each document's distinct shingles by the
    global hash order and index only its first
    ``|S| - ceil(t*|S|) + 1``. For J(A,B) >= t the overlap is
    >= ceil(t*max(|A|,|B|)), and two sets with overlap alpha must
    collide within their first ``|S| - alpha + 1`` elements of any
    shared total order — so every qualifying pair shares an INDEXED
    shingle and the index join loses nothing, while indexing ~(1-t)
    of each document bounds bucket fan-out the same way LSH banding
    does. A size-band predicate (t*max <= min, implied by J >= t)
    prunes candidates before the exact verification join.
    """
    docs = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).filter(F.col("_text").isNotNull())
    # Widen narrow inputs before the Arrow pass (same rationale as
    # minhash_lsh_pairs: one local file would run the UDF serially).
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    sh = shingle_hashes64(F.col("_text"), shingle_n)
    # LAZY persist (no eager count — nothing executes at plan-build
    # time): the prefix index and both verification sides read this
    # subtree, and without the cache boundary Catalyst both duplicates
    # the Arrow pass per consumer AND pushes the size filter beneath
    # each copy's exchange, evaluating the UDF 6x (measured 2x wall
    # time at sf0.1). The cached payload is only (id, hash array) —
    # ~8B per shingle; at 100 TB this is the operator's working set
    # and belongs in MEMORY_AND_DISK either way.
    from pyspark import StorageLevel

    shingled = (
        docs.select("_id", sh.alias("sh"))
        .filter(F.col("sh").isNotNull() & (F.size("sh") > 0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Lossless prefix: first |S| - ceil(t|S|) + 1 shingles in the
    # global (numeric) order — shingle_hashes64 output is sorted.
    # posexplode keeps each shingle's 0-based position for the
    # positional (PPJoin) bound below.
    plen = (F.size("sh") - F.ceil(F.size("sh") * F.lit(threshold)) + 1).cast("int")
    index = shingled.select(
        "_id",
        F.size("sh").alias("sz"),
        F.posexplode(F.slice(F.col("sh"), F.lit(1), plen)).alias("pos", "shingle"),
    )
    # One shuffle on the shingle key; in-bucket pairs via sorted
    # collect_list + combination explode (the minhash_lsh_pairs
    # pattern).
    ids = F.sort_array(F.collect_list(F.struct("_id", "sz", "pos")))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(
                    x["_id"].alias("a"),
                    y["_id"].alias("b"),
                    x["sz"].alias("sa"),
                    y["sz"].alias("sb"),
                    x["pos"].alias("pa"),
                    y["pos"].alias("pb"),
                ),
            ),
        )
    )
    # Positional PPJoin prune, both lossless given J >= t:
    #   size band:  t*max(|A|,|B|) <= min(|A|,|B|)
    #   overlap:    |A∩B| >= ceil(t/(1+t)*(|A|+|B|)) =: alpha, while the
    #     shared shingle at 0-based positions (pa, pb) bounds it above
    #     by 1 + min(|A|-pa-1, |B|-pb-1); the FIRST common shingle of a
    #     qualifying pair always satisfies this, so filtering per
    #     occurrence before the pair-distinct loses nothing. On corpora
    #     with shared vocabulary this kills the common-trigram pairs a
    #     bare prefix filter lets through (~600x fewer candidates on
    #     the sf0.1 documents table).
    band = (
        F.col("p.sa") * F.lit(1.0) >= F.col("p.sb") * F.lit(threshold)
    ) & (F.col("p.sb") * F.lit(1.0) >= F.col("p.sa") * F.lit(threshold))
    alpha = F.ceil(
        (F.col("p.sa") + F.col("p.sb")) * F.lit(threshold / (1.0 + threshold))
    )
    ubound = 1 + F.least(
        F.col("p.sa") - F.col("p.pa") - 1, F.col("p.sb") - F.col("p.pb") - 1
    )
    cand = (
        index.groupBy("shingle")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .filter(band & (F.col("p.a") < F.col("p.b")) & (ubound >= alpha))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Exact verification reads the PERSISTED shingle table directly
    # (the containment twin's shape, eb6ce0f). The previous
    # "restrict sets to candidate ids first" variant looked tighter
    # but was ~40% slower end-to-end: `cand_ids` derives from the
    # UNCACHED candidate subtree, and embedding it in both verify
    # branches re-executed the whole index -> bucket -> explode
    # pipeline once per branch (three executions of candidate gen per
    # run — measured 3.5-4.3s vs 2.3-2.6s cold-cache at sf0.1). The
    # id-keyed joins below are one pass over the cached (id, hashes)
    # table per side — at 100 TB that is a shuffle join bounded by
    # corpus + candidates, and AQE still broadcasts the small side.
    sh_a = shingled.select(F.col("_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    paired = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    size_cols = (
        [inter.alias("n_inter"), union.alias("n_union")] if with_sizes else []
    )
    return paired.filter(jac >= threshold).select(
        "doc_a", "doc_b", *size_cols, F.round(jac, 4).alias("jaccard")
    )


@register(
    "dedup_jaccard_shingles",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 20 AND len(t) > 0
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END AS s
      FROM corpus
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.s, b.s))
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
             AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    """,
    doc="EXACT 3-token-shingle Jaccard >= 0.7 over the SAME planted "
    "corpus as dedup_minhash_lsh — its oracle twin: the LSH query's "
    "recall/precision is computable from these two registry entries "
    "each round (pinned >= 0.95 in pytest). Candidates via a lossless "
    "prefix-filtered inverted index (AllPairs), never all-pairs; the "
    "DuckDB oracle brute-forces the same definition.",
)
def dedup_jaccard_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return shingle_jaccard_pairs(_planted_corpus(d), "text", "doc_id", threshold=0.7)


# The string-shingle exact-truth CTE chain shared with the audit below
# (identical text to the dedup_jaccard_shingles oracle).
_EXACT_TRUTH_CTES = """tbase AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), tcorpus AS (
      SELECT doc_id, t FROM tbase WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM tbase WHERE doc_id < 20 AND len(t) > 0
    ), tsh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END AS s
      FROM tcorpus
    ), truth AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tsh a JOIN tsh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
    )"""


@register(
    "dedup_lsh_recall_audit",
    # Both sides of this audit became exactly oracled this round, so
    # the approximation-error MONITORING itself is now a single
    # hash-checked row: the exact AllPairs truth (string shingles) vs
    # the MinHash+LSH pair set (md5-prefix machinery), full-outer
    # joined and reduced to integer basis-point recall/precision.
    # n_extra isolates 32-bit shingle-hash collision artifacts (the
    # LSH verify stage uses hashed sets; truth uses strings).
    oracle=f"""
    WITH {_EXACT_TRUTH_CTES},
    base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 20 AND len(t) > 0
    ), {_LSH_MACHINERY_SQL.format(sig_cols=_LSH_SIG_COLS,
                                  band_structs=_LSH_BAND_STRUCTS)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandtab a JOIN bandtab b
        ON a.band = b.band AND a.fp = b.fp AND a.doc_id < b.doc_id
    ), found AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
            >= 0.7
    ), joined AS (
      SELECT COALESCE(t.doc_a, f.doc_a) AS doc_a,
             (t.doc_a IS NOT NULL) AS in_t,
             (f.doc_a IS NOT NULL) AS in_f
      FROM truth t FULL OUTER JOIN found f
        ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
    )
    SELECT COUNT(*) FILTER (in_t) AS n_true,
           COUNT(*) FILTER (in_f) AS n_found,
           COUNT(*) FILTER (in_t AND in_f) AS n_hit,
           COUNT(*) FILTER (in_t AND NOT in_f) AS n_missed,
           COUNT(*) FILTER (in_f AND NOT in_t) AS n_extra,
           (COUNT(*) FILTER (in_t AND in_f)) * 10000
             // NULLIF(COUNT(*) FILTER (in_t), 0) AS recall_bp,
           (COUNT(*) FILTER (in_t AND in_f)) * 10000
             // NULLIF(COUNT(*) FILTER (in_f), 0) AS precision_bp
    FROM joined
    """,
    doc="LSH approximation-error audit as ONE monitored row: exact "
    "AllPairs 3-shingle Jaccard >= 0.7 truth vs the MinHash+LSH "
    "(128/16) pair set over the same planted corpus, full-outer "
    "joined; integer basis-point recall/precision (exact div, no "
    "floats). The production monitoring loop for any approximate "
    "dedup: run the exact twin on an sf-bounded sample, join, alert "
    "on recall_bp below floor. Both inputs are themselves hash-green "
    "registry queries, so the audit is exactly oracled end to end. "
    "At 100 TB the truth side is the sampled leg BY PARAMETER "
    "(round 10): lsh_recall_audit(sample_frac=..., id_bound=...) "
    "bounds the truth universe deterministically and filters the "
    "production LSH pair set to the same sub-universe — production "
    "recipe in DEPLOY.md, monitoring. This registered query audits "
    "the full sf-bounded corpus (defaults).",
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return lsh_recall_audit(_planted_corpus(d), "text", "doc_id", threshold=0.7)


# DuckDB replay of _audit_sample_pred's md5 bucket (cross-engine
# equality property-pinned in tests/test_properties.py).
def _audit_bucket_sql(col: str, sample_frac: float) -> str:
    bp = int(round(sample_frac * 10000))
    return (
        f"('0x' || substring(md5({col}::VARCHAR), 1, 8))::BIGINT"
        f" % 10000 < {bp}"
    )


@register(
    "dedup_lsh_recall_audit_sampled",
    # The PRODUCTION monitoring shape (sample_frac=0.5), itself
    # hash-checked: filtering both legs' pair sets to
    # both-endpoints-sampled is set-identical to running the truth
    # AllPairs on the sampled docs and restricting the LSH pair set
    # the way lsh_recall_audit does, so the oracle reuses the full-leg
    # CTEs and applies the md5 bucket at the pair level.
    oracle=f"""
    WITH {_EXACT_TRUTH_CTES},
    base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 20 AND len(t) > 0
    ), {_LSH_MACHINERY_SQL.format(sig_cols=_LSH_SIG_COLS,
                                  band_structs=_LSH_BAND_STRUCTS)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandtab a JOIN bandtab b
        ON a.band = b.band AND a.fp = b.fp AND a.doc_id < b.doc_id
    ), found AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
            >= 0.7
    ), truth_s AS (
      SELECT * FROM truth
      WHERE {_audit_bucket_sql('doc_a', 0.5)}
        AND {_audit_bucket_sql('doc_b', 0.5)}
    ), found_s AS (
      SELECT * FROM found
      WHERE {_audit_bucket_sql('doc_a', 0.5)}
        AND {_audit_bucket_sql('doc_b', 0.5)}
    ), joined AS (
      SELECT COALESCE(t.doc_a, f.doc_a) AS doc_a,
             (t.doc_a IS NOT NULL) AS in_t,
             (f.doc_a IS NOT NULL) AS in_f
      FROM truth_s t FULL OUTER JOIN found_s f
        ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
    )
    SELECT COUNT(*) FILTER (in_t) AS n_true,
           COUNT(*) FILTER (in_f) AS n_found,
           COUNT(*) FILTER (in_t AND in_f) AS n_hit,
           COUNT(*) FILTER (in_t AND NOT in_f) AS n_missed,
           COUNT(*) FILTER (in_f AND NOT in_t) AS n_extra,
           (COUNT(*) FILTER (in_t AND in_f)) * 10000
             // NULLIF(COUNT(*) FILTER (in_t), 0) AS recall_bp,
           (COUNT(*) FILTER (in_t AND in_f)) * 10000
             // NULLIF(COUNT(*) FILTER (in_f), 0) AS precision_bp
    FROM joined
    """,
    doc="The SAMPLED recall audit — the actual 100 TB production "
    "monitoring shape (DEPLOY.md): truth universe = deterministic "
    "md5-bucket half of the doc ids, exact AllPairs only on that "
    "sample, production LSH pair set filtered to the same "
    "sub-universe by a scan-speed endpoint predicate. Registered "
    "alongside the full-corpus audit so BOTH points of the "
    "audit-cost/estimate-variance tradeoff are hash-checked: the "
    "oracle replays the md5 bucket (property-pinned cross-engine), "
    "the full truth/found machinery, and the pair-level filter that "
    "is set-identical to sampling the docs first. At sf0.01 the "
    "planted pairs surviving ~f^2 sampling keep n_true > 0, so the "
    "integer basis-point division is well-defined at every driver "
    "SF (pinned by the sampled-leg pytest).",
)
def dedup_lsh_recall_audit_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return lsh_recall_audit(
        _planted_corpus(d), "text", "doc_id", threshold=0.7, sample_frac=0.5
    )


def _audit_sample_pred(id_col, sample_frac: float, id_bound):
    """Deterministic doc-membership predicate for the audit's truth
    universe, or None for the full corpus. `id_bound` keeps ids below a
    cutoff (the cheapest pushed-down scan filter when ids are dense);
    `sample_frac` keeps an md5-derived pseudo-uniform bucket of ids —
    the repo's md5 bridge, so a future oracle can replay the same
    sample in DuckDB as ('0x' || substring(md5(id::VARCHAR), 1, 8))
    ::BIGINT % 10000."""
    preds = []
    if id_bound is not None:
        preds.append(F.col(id_col) < F.lit(id_bound))
    if sample_frac < 1.0:
        bp = int(round(sample_frac * 10000))
        bucket = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long") % 10000
        preds.append(bucket < F.lit(bp))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def lsh_recall_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    sample_frac: float = 1.0,
    id_bound: int | None = None,
) -> DataFrame:
    """The LSH approximation-error audit as one row — exact AllPairs
    truth vs the MinHash+LSH pair set, full-outer joined into integer
    basis-point recall/precision.

    The 100 TB knob (round 10, VERDICT r9 task 4): `sample_frac` /
    `id_bound` bound the TRUTH universe — the exact AllPairs leg runs
    only on the deterministically-sampled docs, and the production LSH
    pair set is filtered to pairs with BOTH endpoints in the sample
    (a scan-speed predicate on the pair ids, no join), so recall and
    precision are measured over the same sub-universe and stay
    unbiased estimates of the corpus-wide rates. Pair retention under
    doc sampling is ~sample_frac^2 — size the fraction so the expected
    surviving true-pair count keeps the basis-point estimate stable
    (see DEPLOY.md, monitoring). Defaults audit the full corpus (the
    registered sf-bounded query)."""
    pred = _audit_sample_pred(id_col, sample_frac, id_bound)
    truth_docs = df.filter(pred) if pred is not None else df
    truth = shingle_jaccard_pairs(
        truth_docs, text_col, id_col, threshold=threshold
    ).select("doc_a", "doc_b", F.lit(1).alias("in_t"))
    found = minhash_lsh_pairs(df, text_col, id_col, threshold=threshold).select(
        "doc_a", "doc_b", F.lit(1).alias("in_f")
    )
    if pred is not None:
        found = found.filter(
            _audit_sample_pred("doc_a", sample_frac, id_bound)
            & _audit_sample_pred("doc_b", sample_frac, id_bound)
        )
    j = truth.join(found, ["doc_a", "doc_b"], "full_outer")
    hit = F.when(F.col("in_t").isNotNull() & F.col("in_f").isNotNull(), 1)
    return j.agg(
        F.count("in_t").alias("n_true"),
        F.count("in_f").alias("n_found"),
        F.count(hit).alias("n_hit"),
        F.count(F.when(F.col("in_f").isNull(), 1)).alias("n_missed"),
        F.count(F.when(F.col("in_t").isNull(), 1)).alias("n_extra"),
        # nullif: an empty truth/found leg yields NULL bp, not a
        # DIVIDE_BY_ZERO crash (ANSI div) — degenerate inputs must
        # fail loudly downstream (NULL alert), not arithmetically.
        F.expr("count(if(in_t is not null and in_f is not null, 1, null))"
               " * 10000 div nullif(count(in_t), 0)").alias("recall_bp"),
        F.expr("count(if(in_t is not null and in_f is not null, 1, null))"
               " * 10000 div nullif(count(in_f), 0)").alias("precision_bp"),
    )


@register(
    "dedup_threshold_sweep",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 1000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 20 AND len(t) > 0
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END AS s
      FROM corpus
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS n_inter,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS n_union
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
    ), e AS (
      SELECT CASE WHEN 10 * n_inter >= 9 * n_union THEN 90
                  WHEN 10 * n_inter >= 8 * n_union THEN 80
                  WHEN 10 * n_inter >= 7 * n_union THEN 70
                  ELSE 60 END AS threshold_pct,
             unnest([doc_a, doc_b]) AS d
      FROM pairs
    ), g AS (
      SELECT threshold_pct,
             CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
      FROM e GROUP BY 1
    )
    SELECT threshold_pct, n_pairs, n_docs,
           CAST(SUM(n_pairs) OVER (ORDER BY threshold_pct DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pairs
    FROM g
    """,
    doc="Dedup THRESHOLD-tuning report: exact shingle-Jaccard pair "
    "counts per 0.1-wide similarity band from 0.6 up, with the "
    "cumulative pair count an operator reads as 'dedup at >= t keeps "
    "this many pairs in scope'. THE decision table before committing "
    "a near-dup threshold (Lee et al. 2021 pick 0.7-0.8 by exactly "
    "this curve): a fat 0.6-0.7 band means the corpus has a gray "
    "zone where the threshold choice moves real volume. One AllPairs "
    "pass at the LOOSEST threshold (0.6), then banding by INTEGER "
    "cross-multiplication (10*inter >= k*union — no float boundary "
    "to disagree across engines); n_pairs and n_docs derive from one "
    "exploded subtree (each pair contributes exactly two doc rows, "
    "so n_pairs = rows/2) — the expensive candidate pipeline runs "
    "ONCE, and the cumulative window sees at most 4 rows. Same "
    "planted corpus as the minhash/shingle twins, so all three "
    "reports reconcile.",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = shingle_jaccard_pairs(
        _planted_corpus(d), "text", "doc_id", threshold=0.6, with_sizes=True
    )
    band = (
        F.when(10 * F.col("n_inter") >= 9 * F.col("n_union"), 90)
        .when(10 * F.col("n_inter") >= 8 * F.col("n_union"), 80)
        .when(10 * F.col("n_inter") >= 7 * F.col("n_union"), 70)
        .otherwise(60)
    )
    e = pairs.select(
        band.alias("threshold_pct"),
        F.explode(F.array("doc_a", "doc_b")).alias("d"),
    )
    g = e.groupBy("threshold_pct").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
        F.countDistinct("d").alias("n_docs"),
    )
    w = (
        Window.orderBy(F.col("threshold_pct").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "threshold_pct",
        "n_pairs",
        "n_docs",
        F.sum("n_pairs").over(w).alias("cum_pairs"),
    )


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
      -- _embeddings quarantines non-finite vectors at the scan
      -- (similarity.py round-13 contract); mirror it here
      AND len(list_filter(a.embedding, x -> NOT isfinite(x))) = 0
      AND len(list_filter(b.embedding, x -> NOT isfinite(x))) = 0
    """,
    doc="Embedding-cosine near-dup, blocked by label: per-block "
    "pairwise cosine as ONE numpy matmul via applyInPandas (the "
    "block-matmul shape — a pairwise join materializing N^2 rows "
    "through the executor pipeline is ~100x slower at any scale). "
    "The LSH-bucketed variant in similarity.py is the unblocked path.",
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType(), False),
            T.StructField("vec_b", T.LongType(), False),
            T.StructField("cos_sim", T.DoubleType(), False),
        ]
    )
    threshold = 0.35

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["emb"].to_numpy()).astype("float64")
        mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        cos = mn @ mn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cos_sim": np.round(cos[ia[keep], ib[keep]], 6),
            }
        )

    from .similarity import _embeddings

    e = _embeddings(spark, sf_dir).select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    return e.groupBy("label").applyInPandas(block, schema=out_schema)


# ---------------------------------------------------------------------------
# Incremental dedup (new batch vs existing corpus — the daily-ingest shape)


@register(
    "dedup_incremental_batch",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250
    ), batch AS (
      SELECT MIN(doc_id) AS doc_id, fingerprint
      FROM fp WHERE doc_id >= 250 GROUP BY fingerprint
    )
    SELECT b.doc_id, b.fingerprint
    FROM batch b
    WHERE NOT EXISTS (
      SELECT 1 FROM corpus c WHERE c.fingerprint = b.fingerprint
    )
    """,
    doc="Incremental dedup: docs 250+ play the freshly-crawled batch, "
    "docs 0-249 the already-ingested corpus. The batch dedups within "
    "itself (min doc_id per fingerprint) and anti-joins the corpus's "
    "fingerprint set — at 100 TB the corpus side is a digest-only "
    "table (16 bytes/doc), the anti join shuffles uniform 128-bit "
    "keys (no skew possible), and yesterday's corpus never rescans "
    "its text. This is the shape that keeps dedup cost proportional "
    "to the DAILY batch, not the total corpus.",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = d.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    )
    corpus = fp.filter(F.col("doc_id") < 250).select("fingerprint").distinct()
    batch = (
        fp.filter(F.col("doc_id") >= 250)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return batch.join(corpus, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


@register(
    "dedup_fuzzy_prefix",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, lower(text) AS t
      FROM documents WHERE text IS NOT NULL AND doc_id < 200
    ), corpus AS (
      SELECT doc_id, lang, source, substr(t, 1, 50) AS p FROM base
      UNION ALL
      SELECT doc_id + 1000000, lang, source, substr('xq ' || t, 1, 50)
      FROM base WHERE doc_id < 30
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
    FROM corpus a JOIN corpus b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 10
    """,
    doc="Edit-distance near-dup: document pairs whose 50-char prefixes "
    "are within Levenshtein 10, blocked on (lang, source) — the fuzzy "
    "string-matching family (typo/ocr variants) that set-based "
    "Jaccard misses. A deterministic planted set ('xq '-prefixed "
    "copies of the 30 lowest doc_ids, +1e6 id offset) guarantees "
    "detectable pairs, the dedup-family convention. Levenshtein is an "
    "exact integer DP identical on both engines. Same scale shape as "
    "dedup_jaccard_pairs: the (lang, source) block join bounds "
    "candidate pairs, the distance runs on fixed-length prefixes "
    "(O(50^2) per pair, never full-text), and at 100 TB the blocks "
    "shuffle independently. Restricted to doc_id<200 for compact "
    "checked output.",
)
def dedup_fuzzy_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") < 200))
        .select("doc_id", "lang", "source", F.lower(F.col("text")).alias("t"))
    )
    planted = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        "lang",
        "source",
        F.substring(F.concat(F.lit("xq "), F.col("t")), 1, 50).alias("p"),
    )
    d = base.select(
        "doc_id", "lang", "source", F.substring("t", 1, 50).alias("p")
    ).unionByName(planted)
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        "source",
        F.col("p").alias("pa"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        "source",
        F.col("p").alias("pb"),
    )
    dist = F.levenshtein("pa", "pb")
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(dist <= 10)
        .select(
            "doc_a", "doc_b", dist.cast("bigint").alias("edit_dist")
        )
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    WITH fp AS (
      SELECT lang, source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT lang, source, f, COUNT(*) AS n FROM fp GROUP BY 1, 2, 3
    )
    SELECT lang, source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_duplicates,
           ROUND((SUM(n) - COUNT(*)) * 1.0 / SUM(n), 6) AS dup_rate
    FROM g GROUP BY 1, 2
    """,
    doc="Curation reporting: exact-duplicate rate per (lang, source) — "
    "the per-provider quality score a corpus pipeline publishes after "
    "each dedup pass (which sources ship redundant data). Two "
    "aggregations over digests only: raw text collapses to md5 "
    "fingerprints in the map stage, so the shuffles carry (block, "
    "digest, count) — never documents — and the second agg input is "
    "one row per distinct digest. Uniform 128-bit keys, no skew at "
    "any corpus size.",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    g = (
        d.select(
            "lang",
            "source",
            F.md5(normalize_text(F.col("text"))).alias("f"),
        )
        .groupBy("lang", "source", "f")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return g.groupBy("lang", "source").agg(
        F.sum("n").alias("n_docs"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_duplicates"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))) * 1.0 / F.sum("n"), 6
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dup (batch vs corpus — the daily-ingest shape for
# similarity dedup, completing the exact-fingerprint incremental above)


def _incremental_split(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(corpus, batch): docs 0-249 play the already-ingested corpus,
    docs 250+ the fresh batch, PLUS deterministic planted near-dups —
    copies of 10 corpus docs with the final 2 whitespace tokens
    dropped, ids +4*10^9 — so the batch provably contains near-misses
    of the corpus (exact-fingerprint incremental dedup cannot see
    them; that is the point of this family)."""
    tw = tokens(F.col("text"))
    base = d.select("doc_id", "lang", "source", "text")
    corpus = base.filter(F.col("doc_id") < 250)
    planted = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(4_000_000_000)).alias("doc_id"),
        "lang",
        "source",
        F.array_join(
            F.slice(tw, 1, F.greatest(F.size(tw) - 2, F.lit(1))), " "
        ).alias("text"),
    )
    batch = base.filter(F.col("doc_id") >= 250).unionByName(planted)
    return corpus, batch


@register(
    "dedup_incremental_jaccard",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, text FROM documents
      WHERE text IS NOT NULL
    ), tw AS (
      SELECT doc_id, lang, source,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM base
    ), planted AS (
      SELECT tw.doc_id + 4000000000 AS doc_id, lang, source,
             array_to_string(
               list_slice(w, 1, greatest(len(w) - 2, 1)), ' ') AS text
      FROM tw WHERE doc_id < 10
    ), batch AS (
      SELECT doc_id, lang, source, text FROM base WHERE doc_id >= 250
      UNION ALL SELECT doc_id, lang, source, text FROM planted
    ), bt AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM batch
    ), ct AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM base WHERE doc_id < 250
    )
    SELECT b.doc_id AS batch_doc, c.doc_id AS corpus_doc,
           ROUND(len(list_intersect(b.t, c.t))
                 / (len(b.t) + len(c.t) - len(list_intersect(b.t, c.t))),
                 4) AS jaccard
    FROM bt b JOIN ct c
      ON b.lang = c.lang AND b.source = c.source
    WHERE len(list_intersect(b.t, c.t))
          / (len(b.t) + len(c.t) - len(list_intersect(b.t, c.t))) >= 0.8
    """,
    doc="Incremental NEAR-dup, exact twin: every fresh-batch document "
    "whose unigram-set Jaccard vs some corpus document is >= 0.8 — "
    "what dedup_incremental_batch's exact fingerprints cannot catch "
    "(the planted batch rows differ from their corpus sources by two "
    "dropped tokens, so their md5s differ but J ~ 0.98). Bipartite "
    "blocked join on (lang, source) with the lossless size band "
    "evaluated before any array_intersect; the batch side is the "
    "DAILY slice, so at 100 TB the join's probe side stays small and "
    "corpus text is scanned once — but within-block work is still "
    "O(batch_block x corpus_block), which is why the registered scale "
    "path is dedup_incremental_lsh (banding bounds candidates by "
    "bucket size). This exact variant is the sf-bounded oracle-checked "
    "form of the bipartite batch-vs-corpus shape; the LSH path's own "
    "recall is pinned by pytest against brute-force 3-shingle Jaccard "
    "ground truth (its actual similarity definition).",
)
def dedup_incremental_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    corpus, batch = _incremental_split(d)

    def uni(df: DataFrame, prefix: str) -> DataFrame:
        t = F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        )
        # Zero-token docs have no Jaccard (0/0): drop them, matching
        # the oracle, where NULL (DuckDB x/0) fails the WHERE filter.
        return df.select(
            F.col("doc_id").alias(f"{prefix}_doc"),
            F.col("lang").alias(f"{prefix}_lang"),
            F.col("source").alias(f"{prefix}_source"),
            t.alias(f"{prefix}_t"),
            F.size(t).alias(f"{prefix}_sz"),
        ).filter(F.col(f"{prefix}_sz") > 0)

    b, c = uni(batch, "batch"), uni(corpus, "corpus")
    thr = 0.8
    size_band = (
        F.col("batch_sz") * F.lit(1.0) >= F.col("corpus_sz") * F.lit(thr)
    ) & (F.col("corpus_sz") * F.lit(1.0) >= F.col("batch_sz") * F.lit(thr))
    inter = F.size(F.array_intersect(F.col("batch_t"), F.col("corpus_t")))
    union = F.col("batch_sz") + F.col("corpus_sz") - inter
    jac = inter / union
    return (
        b.join(
            c,
            (F.col("batch_lang") == F.col("corpus_lang"))
            & (F.col("batch_source") == F.col("corpus_source"))
            & size_band,
        )
        .filter(jac >= thr)
        .select(
            "batch_doc", "corpus_doc", F.round(jac, 4).alias("jaccard")
        )
    )


def minhash_band_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) LSH band rows for `df` — the STORABLE form
    of the MinHash index. This is the table a production incremental
    pipeline persists: write the corpus's band rows once (bucketed on
    (band, bucket) via sources.bucketed.write_bucketed), then each
    day sign only the fresh batch and join its band rows against the
    stored table — the corpus text is never rescanned and, with the
    table bucketed on the join key, the corpus side of the candidate
    join needs NO exchange (pinned by
    tests/test_bucketed.py::test_incremental_band_table_join). One
    Arrow-batched signature pass; the explode emits only
    (id, band, bucket) — no text or shingles ride the index."""
    docs = df.select(
        F.col(id_col).alias("_mb_id"), F.col(text_col).alias("_mb_text")
    ).filter(F.col("_mb_text").isNotNull())
    # Widen narrow batch inputs so the signature UDF parallelizes; a
    # streaming relation has no static partitioning to probe (.rdd is
    # illegal there) and its parallelism is the source's.
    if not docs.isStreaming:
        par = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
    feats = docs.select(
        "_mb_id",
        minhash_features(F.col("_mb_text"), num_hashes, bands, shingle_n)[
            "buckets"
        ].alias("buckets"),
    ).filter(F.col("buckets").isNotNull())
    return feats.select(
        F.col("_mb_id").alias(id_col),
        F.posexplode("buckets").alias("band", "bucket"),
    )


# 64-hash fragments for the incremental (16 bands) and clusters
# (8 bands) oracles — the b-coefficient vector differs from the
# 128-hash configuration, and the band layout differs per query.
_LSH64_SIG_COLS, _LSH64_BAND_STRUCTS = _lsh_sql_blocks(64, 8)
_LSH64_MACHINERY = _LSH_MACHINERY_SQL.format(
    sig_cols=_LSH64_SIG_COLS, band_structs=_LSH64_BAND_STRUCTS
)
_LSH64_16_SIG_COLS, _LSH64_16_BAND_STRUCTS = _lsh_sql_blocks(64, 16)
_LSH64_16_MACHINERY = _LSH_MACHINERY_SQL.format(
    sig_cols=_LSH64_16_SIG_COLS, band_structs=_LSH64_16_BAND_STRUCTS
)


@register(
    "dedup_incremental_lsh",
    # Round 9: full DuckDB oracle via the shared md5-prefix LSH
    # machinery (64 hashes / 16 bands). The corpus CTE is the union of
    # both sides — corpus ids (< 250), fresh-batch ids (>= 250), and
    # the planted near-dups (+4e9) never collide, so one signature
    # pass covers the bipartite join; candidates are batch-side x
    # corpus-side band matches, verified at exact Jaccard >= 0.7 over
    # the same 32-bit shingle sets the signatures sign.
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 4000000000,
             list_slice(t, 1, greatest(len(t) - 2, 1))
      FROM base WHERE doc_id < 10 AND len(t) > 0
    ), {_LSH64_16_MACHINERY},
    cand AS (
      SELECT DISTINCT bb.doc_id AS batch_doc, cc.doc_id AS corpus_doc
      FROM bandtab bb JOIN bandtab cc
        ON bb.band = cc.band AND bb.fp = cc.fp
      WHERE bb.doc_id >= 250 AND cc.doc_id < 250
    )
    SELECT c.batch_doc, c.corpus_doc,
           ROUND(len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.batch_doc
    JOIN sets sb ON sb.doc_id = c.corpus_doc
    WHERE len(list_intersect(sa.sh, sb.sh))
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.7
    """,
    doc="Incremental NEAR-dup at scale: MinHash+LSH banding joins the "
    "FRESH BATCH's band rows against the CORPUS's band rows — in "
    "production the corpus side is a stored signature/band table that "
    "yesterday's run already wrote, so each day signs only the daily "
    "batch and never rescans corpus text (the near-dup analog of "
    "dedup_incremental_batch's digest table). Candidates are bounded "
    "by bucket size at any corpus size; verification re-derives "
    "shingle sets for candidate docs only and keeps exact 3-shingle "
    "Jaccard >= 0.7 pairs. Same corpus/batch split + planted "
    "near-misses as the exact twin (dedup_incremental_jaccard).",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 64 hashes / 16 bands -> r=4: knee at (1/16)^(1/4) = 0.5, catch
    # probability ~0.99 even at j = 0.7 and ~1.0 at j >= 0.8. The
    # incremental shape affords the loose knee: candidates are
    # BIPARTITE (daily batch x corpus bucket), so extra sub-threshold
    # candidates cost verification on the small batch side only —
    # unlike the all-pairs query (128/16, r=8) where a loose knee
    # fattens every bucket quadratically. (r=8 here missed a planted
    # j=0.85 pair on hash-luck; recall floor is pinned in pytest.)
    num_hashes, bands, shingle_n, thr = 64, 16, 3, 0.7
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    corpus, batch = _incremental_split(d)

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        return minhash_band_rows(
            df, "text", "doc_id", num_hashes, bands, shingle_n
        ).withColumnRenamed("doc_id", f"{prefix}_doc")

    cand = (
        banded(batch, "batch")
        .join(banded(corpus, "corpus"), ["band", "bucket"])
        .select("batch_doc", "corpus_doc")
        .dropDuplicates(["batch_doc", "corpus_doc"])
    )
    # Verify candidates with the exact shingle-hash Jaccard, deriving
    # sets for candidate docs only (AQE broadcasts the tiny id lists).
    b_ids = cand.select(F.col("batch_doc").alias("doc_id")).distinct()
    c_ids = cand.select(F.col("corpus_doc").alias("doc_id")).distinct()
    sh_b = (
        batch.join(b_ids, "doc_id")
        .select(
            F.col("doc_id").alias("batch_doc"),
            shingle_hashes(F.col("text"), shingle_n).alias("sh_b"),
        )
    )
    sh_c = (
        corpus.join(c_ids, "doc_id")
        .select(
            F.col("doc_id").alias("corpus_doc"),
            shingle_hashes(F.col("text"), shingle_n).alias("sh_c"),
        )
    )
    paired = cand.join(sh_b, "batch_doc").join(sh_c, "corpus_doc")
    inter = F.size(F.array_intersect(F.col("sh_b"), F.col("sh_c")))
    union = F.size("sh_b") + F.size("sh_c") - inter
    jac = inter / union
    return (
        paired.filter(jac >= thr)
        .select("batch_doc", "corpus_doc", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "dedup_ngram_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), spans AS (
      SELECT doc_id, i - 1 AS off,
             array_to_string(list_slice(t, i, i + 7), ' ') AS gram
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) g
      WHERE len(t) >= 8
    ), dup_grams AS (
      SELECT gram FROM spans
      GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)
    ), dup_spans AS (
      SELECT s.doc_id, s.off FROM spans s JOIN dup_grams USING (gram)
    ), runs AS (
      SELECT doc_id,
             off - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY off)
               AS grp,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_dup_windows
      FROM dup_spans
    ), per_run AS (
      SELECT doc_id, grp, MAX(n_dup_windows) AS n_dup_windows,
             COUNT(*) + 7 AS run_tokens
      FROM runs GROUP BY doc_id, grp
    ), per_doc AS (
      SELECT doc_id, MAX(n_dup_windows) AS n_dup_windows,
             COUNT(*) AS n_dup_runs, MAX(run_tokens) AS max_run_tokens
      FROM per_run GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(len(tk.t) - 7 AS BIGINT) AS n_windows,
           CAST(p.n_dup_windows AS BIGINT) AS n_dup_windows,
           CAST(p.n_dup_runs AS BIGINT) AS n_dup_runs,
           CAST(p.max_run_tokens AS BIGINT) AS max_run_tokens
    FROM per_doc p JOIN toks tk USING (doc_id)
    """,
    doc="CROSS-document duplicate n-gram spans — the excisable-span "
    "form of exact substring dedup (Lee et al. 2021 'Deduplicating "
    "Training Data Makes Language Models Better' builds suffix arrays; "
    "at 8-token window granularity the same duplicated passages are "
    "found with two shuffles and no suffix structure). For each doc: "
    "how many of its 8-token windows also occur verbatim in ANOTHER "
    "doc, merged into maximal consecutive runs (gaps-and-islands) so "
    "the pipeline can excise the repeated passage rather than drop "
    "the doc — complements decontaminate_spans (probe-set spans) and "
    "dedup_chunk_level (paragraph granularity). Shape for 100 TB: "
    "windows are built IN-ROW (transform over sequence, no self-join) "
    "and immediately reduced to (doc_id, off, xxhash64(gram)) so the "
    "only shuffles carry 8-byte gram hashes — group on gh with the "
    "min!=max trick (cheaper than COUNT(DISTINCT doc)) to find grams "
    "seen in >=2 docs, semi-join spans back on gh (co-partitioned, "
    "AQE-coalesced), then per-doc window+agg over the tiny surviving "
    "span set. Total-token explode is unavoidable for exact spans but "
    "it is map-local; the oracle joins on gram STRINGS (collision-"
    "free), pinning that the 64-bit hash introduced no false merges.",
)
def dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return duplicate_ngram_spans(d, n=8)


def duplicate_ngram_spans(d: DataFrame, n: int = 8) -> DataFrame:
    """Per-doc stats of n-token windows duplicated across documents,
    merged into maximal consecutive runs. See dedup_ngram_spans."""
    from pyspark.sql import Window

    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.struct(
            i.cast("long").alias("off"),
            F.xxhash64(F.array_join(F.slice(F.col("t"), i + 1, n), " "))
            .alias("gh"),
        ),
    )
    spans = (
        toks.filter(F.size("t") >= n)
        .select("doc_id", F.explode(grams).alias("s"))
        .select("doc_id", F.col("s.off").alias("off"), F.col("s.gh").alias("gh"))
    )
    # One shuffle: the gh groupBy carries each gram's occurrence list
    # alongside the min/max-doc dup test, so the surviving spans come
    # straight out of the aggregate — the alternative (aggregate to a
    # dup-gh set, semi-join spans back) shuffles the span table twice
    # AND re-executes the tokenize+explode subtree for the second
    # consumer (measured ~17% slower at sf0.1). Occurrence lists are
    # bounded by per-gram duplication, which is exactly what this
    # operator measures — pathological mass duplication shows up as
    # few fat groups AFTER the in-agg reduction, not as a shuffle of
    # more rows.
    dup_spans = (
        spans.groupBy("gh")
        .agg(
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
            F.collect_list(F.struct("doc_id", "off")).alias("occ"),
        )
        .filter(F.col("mn") != F.col("mx"))
        .select(F.explode("occ").alias("o"))
        .select(F.col("o.doc_id").alias("doc_id"), F.col("o.off").alias("off"))
    )
    w = Window.partitionBy("doc_id").orderBy("off")
    runs = dup_spans.withColumn(
        "grp", F.col("off") - F.row_number().over(w)
    )
    per_run = runs.groupBy("doc_id", "grp").agg(
        (F.count("*") + F.lit(n - 1)).alias("run_tokens")
    )
    per_doc = per_run.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_runs"),
        F.max("run_tokens").alias("max_run_tokens"),
        (F.sum("run_tokens") - (n - 1) * F.count("*")).alias("n_dup_windows"),
    )
    n_win = toks.filter(F.size("t") >= n).select(
        "doc_id", (F.size("t") - (n - 1)).cast("long").alias("n_windows")
    )
    return per_doc.join(n_win, "doc_id").select(
        "doc_id",
        "n_windows",
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.col("n_dup_runs").cast("long").alias("n_dup_runs"),
        F.col("max_run_tokens").cast("long").alias("max_run_tokens"),
    )


@register(
    "dedup_containment",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, t FROM base WHERE len(t) > 0
      UNION ALL
      SELECT doc_id + 3000000000, list_slice(t, 1, 24)
      FROM base WHERE doc_id >= 20 AND doc_id < 30 AND len(t) >= 48
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ELSE [array_to_string(t, ' ')] END AS s
      FROM corpus
    )
    SELECT a.doc_id AS doc_contained, b.doc_id AS doc_container,
           ROUND(len(list_intersect(a.s, b.s)) / len(a.s), 4) AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.s, b.s)) / len(a.s) >= 0.9
    """,
    doc="ASYMMETRIC containment dedup — doc-in-doc duplication the "
    "Jaccard family cannot see: C(A->B) = |Sa n Sb| / |Sa| >= 0.9 over "
    "3-token shingle sets flags quotes, mirrored excerpts, and "
    "boilerplate-wrapped copies where the container is much larger "
    "than the contained doc (Jaccard ~ |A|/|B| -> 0 there). Planted "
    "probes: the first 24 tokens of hosts 20-29 (ids +3e9) are "
    "contained with C=1.0 at any host length, which no symmetric "
    "threshold would catch. Shape for 100 TB: probe side indexes only "
    "its lossless containment prefix (|S| - ceil(t|S|) + 1 smallest "
    "hashes — if all common shingles sat outside it the overlap would "
    "be < ceil(t|Sa|)); the CONTAINER side cannot be prefixed (any "
    "superset qualifies) so the index join's fan-out is bounded by "
    "per-shingle document frequency times the ~(1-t) probe prefix — "
    "the standard containment-join cost (a rarest-first df-ordered prefix would shrink it further but its extra explode+regroup shuffles cost more than they save below ~10k docs; measured) — and a positional upper "
    "bound (1 + min(remaining_a, remaining_b) >= ceil(t|Sa|), "
    "lossless at each pair's first shared shingle) prunes "
    "common-trigram collisions before pair-distinct. Verification "
    "re-derives hash sets for candidate docs only; the oracle "
    "brute-forces string shingles, pinning the 64-bit hash universe.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = tokens(F.col("text"))
    planted = (
        d.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
        .filter(F.size(tok) >= 48)
        .select(
            (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"),
            F.array_join(F.slice(tok, 1, 24), " ").alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    return shingle_containment_pairs(corpus, "text", "doc_id", threshold=0.9)


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT containment pairs: C(A->B) = |Sa n Sb| / |Sa| >= threshold
    over sorted distinct shingle-hash sets. See dedup_containment."""
    from pyspark import StorageLevel

    docs = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).filter(F.col("_text").isNotNull())
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    shingled = (
        docs.select(
            "_id", shingle_hashes64(F.col("_text"), shingle_n).alias("sh")
        )
        .filter(F.col("sh").isNotNull() & (F.size("sh") > 0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Probe (contained-candidate) side: lossless containment prefix.
    plen = (
        F.size("sh") - F.ceil(F.size("sh") * F.lit(threshold)) + 1
    ).cast("int")
    probe = shingled.select(
        F.col("_id").alias("a"),
        F.size("sh").alias("sa"),
        F.posexplode(F.slice(F.col("sh"), F.lit(1), plen)).alias(
            "pa", "shingle"
        ),
    )
    # Index (container) side: FULL shingle set — containment admits any
    # superset, so no prefix is sound here.
    index = shingled.select(
        F.col("_id").alias("b"),
        F.size("sh").alias("sb"),
        F.posexplode("sh").alias("pb", "shingle"),
    )
    alpha = F.ceil(F.col("sa") * F.lit(threshold))
    ubound = 1 + F.least(
        F.col("sa") - F.col("pa") - 1, F.col("sb") - F.col("pb") - 1
    )
    cand = (
        probe.join(index, "shingle")
        .filter(F.col("a") != F.col("b"))
        .filter(ubound >= alpha)
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    # Verification reads the PERSISTED shingle table directly — unlike
    # the Jaccard twin (whose UDF subtree is not cached at this point),
    # `shingled` is already materialized, so re-deriving hash sets for
    # candidates would pay a second full Arrow pass for nothing.
    sh_a = shingled.select(F.col("_id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("_id").alias("b"), F.col("sh").alias("sh_b"))
    paired = cand.join(sh_a, "a").join(sh_b, "b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    cont = inter / F.size("sh_a")
    return paired.filter(cont >= threshold).select(
        F.col("a").alias("doc_contained"),
        F.col("b").alias("doc_container"),
        F.round(cont, 4).alias("containment"),
    )


@register(
    "dedup_survivorship_quality",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, n_chars FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 7000000000, text || '  ', n_chars + 2
      FROM documents WHERE text IS NOT NULL AND doc_id < 10
    ), scored AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               AS n_alnum,
             n_chars
      FROM base
    ), ranked AS (
      SELECT doc_id, fingerprint, n_words,
             COUNT(*) OVER (PARTITION BY fingerprint) AS group_size,
             ROW_NUMBER() OVER (
               PARTITION BY fingerprint
               ORDER BY n_alnum * 1.0 / GREATEST(n_chars, 1) DESC,
                        n_words DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, fingerprint, CAST(group_size AS BIGINT) AS group_size,
           CAST(n_words AS BIGINT) AS n_words
    FROM ranked WHERE rn = 1 AND group_size > 1
    """,
    doc="Survivorship POLICY on duplicate groups: instead of "
    "dedup_exact_docs' min-doc_id survivor, keep the HIGHEST-QUALITY "
    "member of each exact-duplicate group (alpha ratio desc, then "
    "word count desc, doc_id as the deterministic tie-break) — the "
    "curation decision real pipelines make, since crawl copies "
    "differ in boilerplate wrapping even when the normalized text "
    "matches. One fingerprint-keyed window over quality features "
    "computed in the same scan; emits only multi-member groups so "
    "output is the contested set, not the corpus. Composes the "
    "dedup fingerprint with docs_gopher_rules-style scoring in one "
    "plan — no intermediate materialization. Planted whitespace-"
    "variant copies (ids +7e9) guarantee contested groups at every "
    "SF; the cleaner original must win each one.",
)
def dedup_survivorship_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Planted whitespace-variant copies of docs 0-9 (ids +7e9): same
    # normalized fingerprint, two extra chars of padding — a duplicate
    # group whose members genuinely differ in the quality features, so
    # the policy is exercised at every SF (the sf0.01 corpus has no
    # natural byte-exact duplicates).
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(7_000_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  ")).alias("text"),
        (F.col("n_chars") + F.lit(2)).alias("n_chars"),
    )
    d = d.select("doc_id", "text", "n_chars").unionByName(planted)
    n_words = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
    )
    n_alnum = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", ""))
    scored = d.select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        n_words.alias("n_words"),
        (n_alnum * F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1)))
        .alias("alpha_ratio"),
    )
    wp = Window.partitionBy("fingerprint")
    wo = wp.orderBy(
        F.desc("alpha_ratio"), F.desc("n_words"), F.asc("doc_id")
    )
    return (
        scored.withColumn("group_size", F.count(F.lit(1)).over(wp))
        .withColumn("rn", F.row_number().over(wo))
        .filter((F.col("rn") == 1) & (F.col("group_size") > 1))
        .select(
            "doc_id",
            "fingerprint",
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_words").cast("long").alias("n_words"),
        )
    )
