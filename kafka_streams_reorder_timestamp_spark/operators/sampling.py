"""Deterministic sampling + dataset-profiling operators — the
reproducibility layer of a training-data pipeline.

Every sampler here is HASH-based, never ``rand()``: the kept set is a
pure function of the row's stable id, so it is identical across
engines, runs, cluster sizes, and partitionings — rerunning the
pipeline after adding one source re-selects byte-identical rows
everywhere else, which is what makes ablations comparable. md5 is used
as the hash because Spark and DuckDB produce bit-identical lowercase
hex for the same input string, making the samplers oracle-checkable.

Design for 100 TB:
  - a hash-threshold sample is a narrow map (one scan predicate, no
    shuffle): Catalyst pushes the surviving-column pruning into the
    parquet scan and the filter costs one md5 per row, JVM-side;
  - the stratified fixed-k sampler shuffles once on the stratum key,
    and each group's sort is bounded by stratum size (AQE skew-split
    handles a mega-stratum);
  - the mixture rebalancer broadcasts the (tiny) weights table and
    stays one scan + one partial-agg shuffle.

Reference tie-in: the reference has no sampling surface (SURVEY §2.2 —
this is the mandated LLM-pipeline extension); determinism mirrors the
reference's reproducible-replay ethos (Application.java:89-93's
idempotent first-writer-wins insert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .classifier import N_BUCKETS
from .registry import register

# 4-hex-digit md5 prefix < '1a00' keeps 6656/65536 ~ 10.16% of rows.
BERNOULLI_THR = "1a00"


def _doc_hash(col: str = "doc_id") -> F.Column:
    return F.substring(F.md5(F.col(col).cast("string")), 1, 4)


@register(
    "sample_bernoulli_docs",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{BERNOULLI_THR}'
    """,
    doc="Deterministic ~10% Bernoulli sample: keep a document iff the "
    "first 16 bits of md5(doc_id) fall under a fixed threshold. A pure "
    "narrow map — no shuffle, no rand() (so no per-run drift and no "
    "partitioning dependence); at 100 TB this is one codegen'd scan "
    "predicate and the sample is reproducible byte-for-byte.",
)
def sample_bernoulli_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_doc_hash() < BERNOULLI_THR).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "sample_stratified_docs",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, n_chars FROM ranked WHERE rn <= 15
    """,
    doc="Stratified fixed-k sample: exactly 15 docs per language, "
    "chosen by md5(doc_id) order — an unbiased, reproducible draw per "
    "stratum regardless of how the strata are laid out on disk. One "
    "shuffle on the stratum key; per-group work is a bounded top-k "
    "(rank over the hash), so a 100x corpus only widens the groups "
    "AQE already splits.",
)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    win = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 15)
        .select("lang", "doc_id", "n_chars")
    )


# Per-language acceptance thresholds on the 4-hex md5 prefix: the
# mixture designer's knob. '3333' ~ 20%, '6666' ~ 40%, ... 'ffff'+1
# would be 100% — 'zzzz' sorts above every hex digit, keeping all.
MIXTURE_WEIGHTS = [
    ("en", "3333"),  # downsample the dominant language ~20%
    ("de", "9999"),  # ~60%
    ("es", "9999"),
    ("fr", "cccc"),  # ~80%
    ("zh", "zzzz"),  # keep all
]


@register(
    "sample_mixture_rebalance",
    oracle=f"""
    WITH weights(lang, thr) AS (
      VALUES {", ".join(f"('{l}', '{t}')" for l, t in MIXTURE_WEIGHTS)}
    )
    SELECT d.lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (
             WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < w.thr
           ) AS n_kept,
           CAST(SUM(d.n_chars) FILTER (
             WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < w.thr
           ) AS BIGINT) AS kept_chars
    FROM documents d JOIN weights w ON d.lang = w.lang
    GROUP BY d.lang
    """,
    doc="Data-mixture rebalancing: per-language acceptance rates from a "
    "tiny weights table (broadcast), applied as a hash threshold so "
    "the downsampled mixture is deterministic. Reports total vs kept "
    "per stratum — the accounting a mixture designer reads. One scan, "
    "one broadcast join, one partial-agg shuffle; at 100 TB the "
    "weights side never leaves the driver-broadcast path.",
)
def sample_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    weights = F.broadcast(
        spark.createDataFrame(MIXTURE_WEIGHTS, ["lang", "thr"])
    )
    kept = _doc_hash() < F.col("thr")
    return (
        d.join(weights, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars"))).alias("kept_chars"),
        )
    )


@register(
    "profile_documents_columns",
    oracle="""
    SELECT 'doc_id' AS column_name,
           COUNT(*) - COUNT(doc_id) AS n_nulls,
           COUNT(DISTINCT doc_id) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang)
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source)
    FROM documents
    UNION ALL
    SELECT 'text', COUNT(*) - COUNT(text), COUNT(DISTINCT text)
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars)
    FROM documents
    """,
    doc="Column profiling (null count + exact distinct count per "
    "column) in ONE pass: Spark plans the five COUNT(DISTINCT)s as a "
    "single Expand + two-stage aggregate — the table is scanned once, "
    "not five times like the naive per-column loop (the oracle's "
    "UNION ALL spells the same answer the slow way). The wide/long "
    "pivot to (column_name, stat) rows happens on the 1-row aggregate, "
    "driver-side free. This is the engine's data-quality entry point.",
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "text", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
    wide = d.agg(*aggs)
    stack = ", ".join(f"'{c}', _n - _nn_{c}, _nd_{c}" for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)"
        )
    )


@register(
    "histogram_order_totals",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS c
      FROM orders
    )
    SELECT c // 5000000 AS bin,
           (c // 5000000) * 50000 AS bin_lo_dollars,
           COUNT(*) AS n_orders,
           MIN(c) AS min_cents,
           MAX(c) AS max_cents,
           CAST(SUM(c) AS BIGINT) AS sum_cents
    FROM cents
    GROUP BY 1, 2
    """,
    doc="Fixed-width histogram of order totals ($50k bins) in exact "
    "integer cents: the double -> DECIMAL(18,2) -> cents path makes "
    "bin edges engine-independent (no float-boundary flicker), and "
    "the whole thing is one scan + one partial-agg shuffle over at "
    "most a few hundred bin keys — the distribution-sketch primitive "
    "behind sizing decisions (salting thresholds, AQE advisory sizes).",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        o.select(c.alias("c"))
        .select(F.expr("c div 5000000").alias("bin"), "c")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
            F.sum("c").alias("sum_cents"),
        )
        .select(
            "bin",
            (F.col("bin") * 50000).alias("bin_lo_dollars"),
            "n_orders",
            "min_cents",
            "max_cents",
            "sum_cents",
        )
    )


@register(
    "source_lang_divergence",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ), src AS (
      SELECT source, SUM(n) AS n_src FROM counts GROUP BY 1
    ), gl AS (
      SELECT lang, SUM(n) AS n_lang FROM counts GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS n_tot FROM counts
    )
    SELECT c.source,
           CAST(s.n_src AS BIGINT) AS n_docs,
           ROUND(SUM((c.n * 1.0 / s.n_src)
                     * round(ln((c.n * 1.0 / s.n_src)
                                / (g.n_lang * 1.0 / t.n_tot)), 9)), 6)
             AS kl_divergence
    FROM counts c
    JOIN src s USING (source)
    JOIN gl g USING (lang)
    CROSS JOIN tot t
    GROUP BY c.source, s.n_src
    """,
    doc="Corpus-mixture drift: per source, the KL divergence of its "
    "language distribution from the global language distribution — "
    "the data-quality monitor that flags a source whose mix shifted. "
    "All probabilities are exact integer-count ratios; only ln() is "
    "transcendental, so each term's log is quantized to 9 decimals on "
    "both engines before the weighted sum (same treatment as "
    "tfidf_top_terms). Three tiny partial-agg shuffles over "
    "(source, lang) cardinality — never the corpus; the global "
    "distribution broadcasts.",
)
def source_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    src = counts.groupBy("source").agg(F.sum("n").alias("n_src"))
    glob = counts.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    tot = counts.agg(F.sum("n").alias("n_tot"))
    p = F.col("n") * F.lit(1.0) / F.col("n_src")
    q = F.col("n_lang") * F.lit(1.0) / F.col("n_tot")
    term = p * F.round(F.log(p / q), 9)
    return (
        counts.join(src, "source")
        .join(F.broadcast(glob), "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_src")
        .agg(F.round(F.sum(term), 6).alias("kl_divergence"))
        .select(
            "source",
            F.col("n_src").cast("bigint").alias("n_docs"),
            "kl_divergence",
        )
    )


def _hex_digit_value_sql(h: str, i: int, strpos_fn: str) -> str:
    """Numeric value of the i-th (1-based) hex digit of column/expr
    `h`, as the SAME arithmetic on Spark (`instr`) and DuckDB
    (`strpos`) — both return 1-based positions in the digit alphabet."""
    return (
        f"CAST({strpos_fn}('0123456789abcdef', substr({h}, {i}, 1)) - 1"
        " AS BIGINT)"
    )


def _hash48_sql(h: str, strpos_fn: str) -> str:
    """First 12 hex digits of `h` as an exact BIGINT in [0, 2^48):
    a 12-term positional expansion — portable across engines that
    cannot cast hex strings to integers."""
    return " + ".join(
        f"{_hex_digit_value_sql(h, i + 1, strpos_fn)} * {16 ** (11 - i)}"
        for i in range(12)
    )


@register(
    "sample_weighted_docs",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang, source, n_chars,
             ({_hash48_sql('md5(CAST(doc_id AS VARCHAR))', 'strpos')})
               * 1.0 / n_chars AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, source, n_chars
    FROM pri ORDER BY priority, doc_id LIMIT 100
    """,
    doc="Deterministic weighted sample (100 docs, probability rising "
    "with n_chars): the A-Res reservoir idea with the uniform draw "
    "replaced by a 48-bit md5-derived integer — priority = "
    "hash48(doc_id)/weight, keep the k smallest. hash48 is built by "
    "positional expansion of the md5 hex digits (identical instr/"
    "strpos arithmetic on both engines — neither can cast hex "
    "to int portably), the division is one correctly-rounded double "
    "op, and ties are impossible (distinct hashes), so the sample is "
    "byte-identical everywhere. Global top-k plans "
    "TakeOrderedAndProject (per-partition top-100 + merge), never a "
    "full sort — one scan at any corpus size.",
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h48 = _hash48_sql("md5(CAST(doc_id AS STRING))", "instr")
    pri = F.expr(f"({h48}) * 1.0 / n_chars")
    return (
        d.select("doc_id", "lang", "source", "n_chars", pri.alias("_p"))
        .orderBy("_p", "doc_id")
        .limit(100)
        .drop("_p")
    )


@register(
    "customer_orders_histogram_log2",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(n) AS min_orders, MAX(n) AS max_orders
    FROM per_cust GROUP BY 1
    """,
    doc="Power-of-two histogram of orders per customer: "
    "floor(log2(n)) computed EXACTLY as length(bin(n)) - 1 — the "
    "binary-string trick that avoids floating log2 entirely (a float "
    "log at a power-of-two boundary can land on either side by one "
    "ulp, shifting histogram mass between engines). Two partial-agg "
    "shuffles over bounded cardinality.",
)
def customer_orders_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    bucket = (F.length(F.bin("n")) - 1).cast("bigint")
    return per_cust.groupBy(bucket.alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("n").alias("min_orders"),
        F.max("n").alias("max_orders"),
    )


@register(
    "sample_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t <> '')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), tot AS (SELECT COUNT(*) AS n FROM tok),
    cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    vocab AS (
      SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 20
    ), scored AS (
      SELECT t.doc_id,
             ln(COALESCE(CAST(v.c AS DOUBLE), 0.5)
                / (SELECT n FROM tot)) AS lp
      FROM tok t LEFT JOIN vocab v USING (tok)
    ), perdoc AS (
      SELECT doc_id, ROUND(AVG(lp), 6) AS avg_logprob
      FROM scored GROUP BY doc_id
    ), ranked AS (
      SELECT d.lang, p.doc_id, p.avg_logprob,
             NTILE(3) OVER (
               PARTITION BY d.lang
               ORDER BY p.avg_logprob DESC, p.doc_id) AS b
      FROM perdoc p JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE b = 1
             OR (b = 2 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                           < '8000')
             OR (b = 3 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                           < '1999')) AS n_kept,
           MIN(avg_logprob) AS min_lp,
           MAX(avg_logprob) AS max_lp
    FROM ranked GROUP BY lang, b
    """,
    doc="CCNet-style perplexity-bucketed sampling: score every doc "
    "with the corpus-trained unigram LM (unigram_doc_scores — the "
    "scalable stand-in for KenLM perplexity), rank WITHIN language, "
    "ntile(3) into head/middle/tail, then keep head entirely, middle "
    "at ~50%, tail at ~10% via the repo's deterministic md5(doc_id) "
    "draw — the curation move that biases a corpus toward fluent text "
    "without hard-dropping the tail. Per-doc scores are rounded to "
    "6 dp BEFORE the ntile ordering so bucket boundaries are "
    "engine-stable (ulp-level sum-order drift cannot flip a rank); "
    "bucket floors/ceilings are reported as MIN/MAX (order statistics, "
    "exactly comparable) rather than another float mean. Shape for "
    "100 TB: scoring is the docs_unigram_logprob pipeline (broadcast "
    "vocab, one token shuffle); ranking is one shuffle on lang with "
    "per-group work linear in stratum size; the keep decision is a "
    "pure per-row hash predicate — no rand(), no resort, "
    "reproducible byte-for-byte.",
)
def sample_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .text import unigram_doc_scores

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scores = unigram_doc_scores(d.select("doc_id", "text"))
    ranked = scores.join(d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    b = F.ntile(3).over(w)
    bucketed = ranked.withColumn("b", b)
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.col("b")
    )
    keep = (
        (F.col("b") == 1)
        | ((F.col("b") == 2) & (_doc_hash() < "8000"))
        | ((F.col("b") == 3) & (_doc_hash() < "1999"))
    )
    return (
        bucketed.withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.min("avg_logprob").alias("min_lp"),
            F.max("avg_logprob").alias("max_lp"),
        )
    )


@register(
    "training_order_index",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        ::UBIGINT,
                      doc_id) - 1 AS BIGINT) AS position
    FROM documents
    """,
    doc="Deterministic global training order: every doc gets a dense "
    "0-based position in md5(doc_id) order — the reproducible 'corpus "
    "shuffle' a trainer consumes, identical across runs, engines, and "
    "cluster layouts (rand() or zipWithIndex would be neither). Shape "
    "for 100 TB: the naive ROW_NUMBER() OVER (ORDER BY hash) funnels "
    "the corpus through ONE task; this routes through "
    "functions/rank.py's distributed rank — value-range bucketing on "
    "the numeric hash prefix (uniform by construction, so the buckets "
    "are balanced), per-bucket local row_number, tiny per-bucket "
    "count prefix-sum broadcast back. The 32-bit hash prefix is the "
    "bucket/sort key; doc_id breaks the ~n^2/2^33 collisions, so the "
    "order is total and engine-portable (conv(hex) on the Spark side, "
    "'0x'::UBIGINT on the oracle side).",
)
def training_order_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rank import global_row_number

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    ranked = global_row_number(
        d.withColumn("_h", h), "_h", ["_h", "doc_id"], out_col="_rn"
    )
    return ranked.select(
        "doc_id", (F.col("_rn") - 1).cast("long").alias("position")
    )


@register(
    "shard_training_corpus",
    oracle="""
    WITH sharded AS (
      SELECT doc_id, lang, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               AS h
      FROM documents
    ), ordered AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY shard_id ORDER BY h, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY shard_id) AS n
      FROM sharded
    )
    SELECT shard_id,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             AS first_doc,
           CAST(MAX(CASE WHEN rn = n THEN doc_id END) AS BIGINT)
             AS last_doc
    FROM ordered GROUP BY shard_id
    """,
    doc="Content-addressed shard manifest: 16 shards keyed by the "
    "first md5(doc_id) hex digit, each reporting doc count, byte "
    "mass, language spread, and its first/last doc in within-shard "
    "hash order — the manifest a sharded-writer job emits next to "
    "the data so a trainer can plan epochs without listing files. "
    "Hash sharding is the balance guarantee: shard sizes concentrate "
    "around n/16 regardless of how the corpus is laid out on disk "
    "(doc_id ranges, crawl order, source skew). One shuffle on the "
    "shard key; first/last come from the same per-shard window pass, "
    "no extra joins. In production this SELECT's input is "
    "partitionBy('shard_id') at write time (sources/io.py's "
    "partitioned-write path) — the manifest and the layout share the "
    "one hash definition.",
)
def shard_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    md5 = F.md5(F.col("doc_id").cast("string"))
    sharded = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.substring(md5, 1, 1).alias("shard_id"),
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h"),
    )
    w = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    wn = Window.partitionBy("shard_id")
    ordered = sharded.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ordered.groupBy("shard_id").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("long")
        .alias("first_doc"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("doc_id")))
        .cast("long")
        .alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling + token-budget mixture planning

# Target domain for the DSIR selector: a small set of "trusted"
# sources standing in for the high-quality reference corpus (in the
# paper: Wikipedia + books; here: three synthetic sources). The raw
# distribution is the whole corpus, target included — the standard
# DSIR setup (the target IS drawn from the raw pool).
DSIR_TARGET_SOURCES = ("src0", "src1", "src2")

# The DSIR scoring chain as reusable CTEs (train both hashed-unigram
# models in one pass, broadcast the log-ratio table, score per doc) —
# shared by dsir_importance_weights and dsir_resample_draw. Ends in
# `scored(doc_id, source, n_tokens BIGINT, logw_dec DECIMAL)`.
_DSIR_CTE = f"""base AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, source,
             unnest(list_transform(t,
               g -> CAST(('0x' || substring(md5(g), 1, 15))::UBIGINT
                         % {N_BUCKETS} AS BIGINT))) AS bucket
      FROM base
    ), cnt AS (
      SELECT bucket,
             COUNT(*) FILTER (WHERE source IN
               {DSIR_TARGET_SOURCES!r}) AS c_t,
             COUNT(*) AS c_r
      FROM tok GROUP BY 1
    ), tot AS (
      SELECT COUNT(*) FILTER (WHERE source IN
               {DSIR_TARGET_SOURCES!r}) AS n_t,
             COUNT(*) AS n_r
      FROM tok
    ), lr AS (
      SELECT bucket,
             CAST(ROUND(ln((c_t + 1) * 1.0 / (n_t + {N_BUCKETS}))
                        - ln((c_r + 1) * 1.0 / (n_r + {N_BUCKETS})), 6)
                  AS DECIMAL(18,6)) AS lr
      FROM cnt CROSS JOIN tot
    ), per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(lr) AS logw_dec
      FROM tok JOIN lr USING (bucket) GROUP BY 1
    ), scored AS (
      SELECT b.doc_id, b.source,
             CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
             COALESCE(p.logw_dec, 0) AS logw_dec
      FROM base b LEFT JOIN per_doc p USING (doc_id)
    )"""


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, source, n_tokens,
           CAST(logw_dec AS DOUBLE) AS logw,
           logw_dec > 0 AS dsir_keep
    FROM scored
    """,
    doc="Data Selection via Importance Resampling (Xie et al. 2023, "
    "DSIR): score every raw document by how much more likely its "
    "hashed-unigram bag is under the TARGET domain's distribution "
    "(docs from the trusted sources) than under the raw corpus's — "
    "logw = sum over token occurrences of ln p_target(bucket) - "
    "ln p_raw(bucket), Laplace-smoothed over the same md5-mod-2048 "
    "feature space the quality classifier uses. This is the "
    "complementary selection method to the classifier family: DSIR "
    "needs only an unlabeled target sample, no weak labels. Per-"
    "bucket log-ratios are rounded to 6 dp and per-doc sums run in "
    "DECIMAL(18,6), so logw is exact, order-independent, and hash-"
    "matches DuckDB; dsir_keep (logw > 0 = more target-like than "
    "raw) is the deterministic stand-in for the paper's Gumbel-noise "
    "resampling draw. Shape for 100 TB: BOTH n-gram models train in "
    "ONE token-keyed partial-agg shuffle (the target counts are a "
    "FILTER inside the same agg — no second corpus pass), the ratio "
    "table holds only observed buckets (at most 2048 rows whatever "
    "the corpus size) and broadcasts, "
    "and scoring is a broadcast hash join + per-doc partial agg — "
    "cost linear in corpus tokens, no wide shuffle anywhere.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_logw_frame(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("logw_dec").cast("double").alias("logw"),
        (F.col("logw_dec") > 0).alias("dsir_keep"),
    )


def _dsir_logw_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, logw_dec): the DSIR scoring subplan
    with the per-doc importance log-weight kept as exact DECIMAL —
    shared by dsir_importance_weights (thresholded stand-in) and
    dsir_resample_draw (the paper's Gumbel-top-k draw)."""
    from ..functions.texthash import tokens
    from .classifier import _bucket

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id",
        "source",
        F.explode(F.transform(tokens(F.col("text")), _bucket)).alias(
            "bucket"
        ),
    )
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    cnt = toks.groupBy("bucket").agg(
        F.count(F.when(is_target, 1)).alias("c_t"),
        F.count(F.lit(1)).alias("c_r"),
    )
    tot = toks.agg(
        F.count(F.when(is_target, 1)).alias("n_t"),
        F.count(F.lit(1)).alias("n_r"),
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("c_t") + 1) * F.lit(1.0) / (F.col("n_t") + N_BUCKETS)
            )
            - F.log(
                (F.col("c_r") + 1) * F.lit(1.0) / (F.col("n_r") + N_BUCKETS)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    per_doc = (
        toks.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr").alias("logw_dec"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("logw_dec"), zero).alias("logw_dec"),
        )
    )


# Gumbel-top-k resampling draw: sample size and the denominator of
# the md5-derived uniform. 13 hex digits = 52 bits, so the hash
# integer (and hash + 0.5) is EXACTLY representable as a double in
# both engines — the uniform u = (h + 0.5) / 2^52 enters ln() with
# identical bits on the Spark and DuckDB side, and u is strictly
# inside (0, 1) by construction (no ln(0)/ln(1) edge in -ln(-ln(u))).
DSIR_RESAMPLE_K = 128
_GUMBEL_DEN = 2**52


@register(
    "dsir_resample_draw",
    oracle=f"""
    WITH {_DSIR_CTE}, noise AS (
      SELECT doc_id, source, n_tokens, logw_dec,
             CAST(ROUND(-ln(-ln(
               (('0x' || substring(md5('dsir-draw:'
                   || CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT + 0.5)
               / {_GUMBEL_DEN}.0)), 6) AS DECIMAL(18,6)) AS gumbel_dec
      FROM scored
    )
    SELECT doc_id, source, n_tokens,
           CAST(logw_dec AS DOUBLE) AS logw,
           CAST(gumbel_dec AS DOUBLE) AS gumbel,
           CAST(logw_dec + gumbel_dec AS DOUBLE) AS draw_key
    FROM noise
    ORDER BY (logw_dec + gumbel_dec) DESC, doc_id
    LIMIT {DSIR_RESAMPLE_K}
    """,
    doc="The RESAMPLING step that completes the DSIR recipe (Xie et "
    "al. 2023 §2: sample k documents with probability proportional "
    "to their importance weight, without replacement): the Gumbel-"
    "top-k identity — draw g_i ~ Gumbel(0,1) per doc and keep the k "
    "largest logw_i + g_i, which is distributionally exactly the "
    "sequential weighted draw. The noise is DERANDOMIZED the repo's "
    "standard way (never rand()): u_i comes from 13 hex digits of "
    "md5('dsir-draw:' || doc_id) — 52 bits, exactly double-"
    "representable, strictly inside (0,1) — and g_i = -ln(-ln(u_i)) "
    "rounded to 6 dp into DECIMAL(18,6), so the kept set is a pure "
    "function of doc_id, identical across engines/runs/partitionings "
    "and hash-checkable against DuckDB computing the same draw. "
    "draw_key = logw + gumbel decides membership; doc_id breaks the "
    "(measure-zero) tie. Shape for 100 TB: the scoring chain is "
    "dsir_importance_weights' (one token-keyed agg, broadcast ratio "
    "table); the draw itself is a per-row projection plus a global "
    "top-k, which Catalyst executes as TakeOrderedAndProject — "
    "per-partition k-heaps merged on the driver, k rows moved, "
    "never a global sort of the corpus.",
)
def dsir_resample_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _dsir_logw_frame(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("dsir-draw:"), F.col("doc_id").cast("string")
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_GUMBEL_DEN))
    noise = scored.select(
        "doc_id",
        "source",
        "n_tokens",
        "logw_dec",
        F.round(-F.log(-F.log(u)), 6)
        .cast("decimal(18,6)")
        .alias("gumbel_dec"),
    )
    key = F.col("logw_dec") + F.col("gumbel_dec")
    return (
        noise.orderBy(key.desc(), "doc_id")
        .limit(DSIR_RESAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.col("logw_dec").cast("double").alias("logw"),
            F.col("gumbel_dec").cast("double").alias("gumbel"),
            key.cast("double").alias("draw_key"),
        )
    )


# Token-budget mixture plan: target mixture weights in basis points
# (must sum to 10000) and the total token budget the trainer will
# consume. Integer-exact throughout so the plan is engine-stable.
TOKEN_BUDGET = 1_000_000
MIXTURE_TOKEN_BP = [
    ("en", 3000),
    ("de", 2000),
    ("es", 2000),
    ("fr", 2000),
    ("zh", 1000),
]


@register(
    "token_budget_mixture",
    oracle=f"""
    WITH weights(lang, weight_bp) AS (
      VALUES {", ".join(f"('{l}', {w})" for l, w in MIXTURE_TOKEN_BP)}
    ), avail AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               t -> t <> ''))) AS BIGINT) AS avail_tokens
      FROM documents WHERE text IS NOT NULL GROUP BY 1
    )
    SELECT w.lang,
           CAST(COALESCE(a.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(a.avail_tokens, 0) AS BIGINT) AS avail_tokens,
           CAST(w.weight_bp AS BIGINT) AS weight_bp,
           CAST({TOKEN_BUDGET} AS BIGINT) * w.weight_bp // 10000
             AS target_tokens,
           (10000 * (CAST({TOKEN_BUDGET} AS BIGINT) * w.weight_bp // 10000)
            + GREATEST(COALESCE(a.avail_tokens, 0), 1) - 1)
             // GREATEST(COALESCE(a.avail_tokens, 0), 1) AS repeat_bp,
           COALESCE(a.avail_tokens, 0)
             - CAST({TOKEN_BUDGET} AS BIGINT) * w.weight_bp // 10000
             AS surplus_tokens
    FROM weights w LEFT JOIN avail a USING (lang)
    """,
    doc="Token-budget mixture planning — the accounting step of a "
    "Gopher/Llama-style data-mixture recipe: given target mixture "
    "weights (basis points) and the total token budget the trainer "
    "will consume, report per language how many tokens exist, how "
    "many the mixture demands, the repeat factor required "
    "(repeat_bp: 10000 = exactly one epoch; 25000 = the source must "
    "be seen 2.5 times — the multi-epoch smell a mixture designer "
    "watches for), and the surplus (negative = deficit). All math is "
    "integer (floor division, ceil via the add-denominator-minus-one "
    "identity), so the plan is bit-identical across engines — no "
    "float ratio to drift. The join runs FROM the weights side "
    "(left-outer) so a planned language missing from the corpus "
    "surfaces as the worst-case row (avail_tokens=0, surplus = "
    "-target) instead of silently dropping out of the report. "
    "Shape for 100 TB: token counting is "
    "in-row (size of the split array, no explode), one partial-agg "
    "shuffle over ~tens of language keys, and the weights side is a "
    "literal broadcast — the whole plan is one scan.",
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    avail = (
        d.select("lang", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("avail_tokens"),
        )
    )
    w = spark.createDataFrame(MIXTURE_TOKEN_BP, ["lang", "weight_bp"])
    target = F.expr(
        f"CAST({TOKEN_BUDGET} AS BIGINT) * weight_bp div 10000"
    )
    # Left join FROM the weights side: a planned language that is
    # absent from the corpus must surface as a full deficit
    # (avail_tokens=0, surplus=-target), never silently vanish from
    # the mixture report. The hint must sit on the BUILD side: a
    # left-outer join can only broadcast-build its right input, so
    # hinting the preserved weights side is unsatisfiable and Spark
    # drops it with a HintErrorLogger warning on every run. The
    # aggregated per-language table is tiny (~tens of rows) at any
    # scale, so broadcasting it keeps the join exchange-free.
    joined = (
        w.join(F.broadcast(avail), "lang", "left")
        .withColumn(
            "n_docs", F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
        )
        .withColumn(
            "avail_tokens",
            F.coalesce(F.col("avail_tokens"), F.lit(0)).cast("long"),
        )
        .withColumn("target_tokens", target)
    )
    return joined.select(
        "lang",
        "n_docs",
        "avail_tokens",
        F.col("weight_bp").cast("long").alias("weight_bp"),
        "target_tokens",
        F.expr(
            "(10000 * target_tokens + GREATEST(avail_tokens, 1) - 1)"
            " div GREATEST(avail_tokens, 1)"
        ).alias("repeat_bp"),
        (F.col("avail_tokens") - F.col("target_tokens")).alias(
            "surplus_tokens"
        ),
    )
