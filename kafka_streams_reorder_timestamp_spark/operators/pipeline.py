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
from .classifier import _ORACLE_MODEL
from .text import WORD

MIN_TOKENS = 10
MIN_ALNUM_PCT4 = 5000  # alnum/chars ratio >= 0.5, in 1e-4 units


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH {_ORACLE_MODEL}, deduped AS (
      SELECT doc_id, lang, source, text, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)),
                                               '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM documents
      WHERE text IS NOT NULL
    ), cscored AS (
      SELECT doc_id, lang, source, n_chars,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               AS n_alnum
      FROM deduped WHERE rn = 1
    ), kept AS (
      SELECT * FROM cscored
      WHERE n_tokens >= {MIN_TOKENS}
        AND (2 * 10000 * n_alnum + n_chars) // (2 * n_chars)
            >= {MIN_ALNUM_PCT4}
        AND EXISTS (SELECT 1 FROM scores s
                    WHERE s.doc_id = cscored.doc_id AND s.logit_dec > 0)
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_alnum) AS BIGINT) AS total_alnum
    FROM kept
    GROUP BY 1, 2
    """,
    doc="Flagship user-story pipeline: dedup → quality-filter → "
    "model-based quality scoring → corpus accounting as ONE fused "
    "Catalyst plan (no materialized intermediates). Every stage "
    "reuses the engine's own primitives; alnum-ratio threshold uses "
    "exact bigint arithmetic so the filter boundary is "
    "engine-independent. Round 7 added the classifier stage "
    "(classifier.py): the Bernoulli-NB model trains on the full "
    "corpus inside this same plan and survivors must also score "
    "logit > 0 — the fineweb-edu 'rules then model' curation order, "
    "joined in as a doc-id semi-join so the model side ships ids "
    "only. The DECIMAL logit arithmetic keeps even the threshold "
    "boundary engine-exact, so the fused five-stage plan still "
    "hash-matches DuckDB.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .classifier import _scores_frame

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
        "doc_id",
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
    # Round-7 model stage: the Bernoulli-NB quality classifier
    # (classifier.py — trained on the FULL corpus inside this same
    # plan) must also predict keep. A doc-id semi-join, so the model
    # side ships (doc_id) only.
    model_keep = (
        _scores_frame(d)
        .filter(F.col("logit_dec") > 0)
        .select("doc_id")
    )
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (
            F.expr("(2 * 10000 * n_alnum + n_chars) div (2 * n_chars)")
            >= MIN_ALNUM_PCT4
        )
    ).join(model_keep, "doc_id", "semi")
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_alnum").alias("total_alnum"),
    )


@register(
    "pipeline_stage_attrition",
    oracle=f"""
    WITH {_ORACLE_MODEL}, fp AS (
      SELECT doc_id, source, text, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)),
                                               '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM documents WHERE text IS NOT NULL
    ), flags AS (
      SELECT f.doc_id, f.source,
             (f.rn = 1) AS pass_dedup,
             (f.rn = 1
              AND len(regexp_extract_all(f.text, '{WORD}'))
                  >= {MIN_TOKENS}
              AND (2 * 10000 * length(regexp_replace(f.text,
                     '[^A-Za-z0-9]', '', 'g')) + f.n_chars)
                  // (2 * f.n_chars) >= {MIN_ALNUM_PCT4}) AS pass_quality
      FROM fp f
    )
    SELECT fl.source,
           CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(SUM(CASE WHEN fl.pass_dedup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_dedup,
           CAST(SUM(CASE WHEN fl.pass_quality THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_quality,
           CAST(SUM(CASE WHEN fl.pass_quality AND s.logit_dec > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flags fl JOIN scores s ON s.doc_id = fl.doc_id
    GROUP BY 1
    """,
    doc="Per-source ATTRITION funnel of the flagship pipeline — the "
    "report a curation run publishes alongside its output: of each "
    "source's raw documents, how many survive exact dedup, how many "
    "also pass the rule-based quality gate, and how many the model "
    "finally keeps. Uses EXACTLY corpus_curation_pipeline's stage "
    "definitions (same fingerprint window, same thresholds, same "
    "in-plan classifier), so the counts reconcile with its output by "
    "construction — but keeps every doc's flags instead of filtering, "
    "turning the pipeline into per-stage survival counts in the same "
    "single fused plan (flags are free; only the final rollup "
    "aggregates). The per-source asymmetry in WHERE docs die (dedup "
    "vs quality vs model) is the signal that tells a crawl operator "
    "WHICH upstream source regressed and at which gate.",
)
def pipeline_stage_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .classifier import _scores_frame

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    win = Window.partitionBy(
        F.md5(normalize_text(F.col("text")))
    ).orderBy("doc_id")
    pass_dedup = F.col("rn") == 1
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD), 0))
    alnum_ok = (
        F.expr(
            "(2 * 10000 * length(regexp_replace(text, '[^A-Za-z0-9]', ''))"
            " + n_chars) div (2 * n_chars)"
        )
        >= MIN_ALNUM_PCT4
    )
    pass_quality = pass_dedup & (n_tokens >= MIN_TOKENS) & alnum_ok
    flags = d.withColumn("rn", F.row_number().over(win)).select(
        "doc_id",
        "source",
        pass_dedup.alias("pass_dedup"),
        pass_quality.alias("pass_quality"),
    )
    scores = _scores_frame(d).select(
        "doc_id", (F.col("logit_dec") > 0).alias("model_keep")
    )
    return (
        flags.join(scores, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.when(F.col("pass_dedup"), 1).otherwise(0)).alias(
                "n_after_dedup"
            ),
            F.sum(F.when(F.col("pass_quality"), 1).otherwise(0)).alias(
                "n_after_quality"
            ),
            F.sum(
                F.when(F.col("pass_quality") & F.col("model_keep"), 1)
                .otherwise(0)
            ).alias("n_kept"),
        )
    )


def _split_expr(key):
    """THE train/val/test rule: first md5-hex byte of `key` (0x00-0xcc
    train ~80%, 0xcd-0xe5 val ~10%, rest test). One definition shared
    by split_train_val_test (id-keyed), split_leakage_audit (audits
    the id-keyed rule) and split_by_fingerprint (content-keyed fix) —
    rebalancing the ratios means editing this expression plus the
    three oracles' CASE chains, nothing else."""
    bucket = F.substring(F.md5(key.cast("string")), 1, 2)
    return (
        F.when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test")
    )


@register(
    "split_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents WHERE text IS NOT NULL
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test assignment — the reproducibility "
    "primitive every training pipeline needs: split = first md5 byte "
    "of the doc id (0x00-0xcc train ~80%, 0xcd-0xe5 val ~10%, rest "
    "test). Content- and partitioning-independent, identical across "
    "engines/runs/cluster sizes (md5 hex is bit-identical in Spark "
    "and DuckDB), and a pure narrow map — no shuffle until the "
    "accounting agg. Filtering a split at read time costs one scan "
    "predicate, never a materialized copy.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    split = _split_expr(F.col("doc_id"))
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "cap_docs_per_source",
    oracle="""
    WITH ranked AS (
      SELECT lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang, source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rn <= 10
    GROUP BY 1, 2
    """,
    doc="Per-source balanced capping (keep the 10 lowest doc_ids per "
    "(lang, source)): the anti-domination sampler that stops one crawl "
    "source from swamping the mixture. One shuffle on the group key; "
    "the per-group ROW_NUMBER sort is bounded by group size, and at "
    "100 TB a skewed mega-source is exactly what AQE skew-split plus "
    "this cap contains. Deterministic tie-free order (doc_id) keeps "
    "the kept set reproducible.",
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    win = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.select("lang", "source", "n_chars", "doc_id")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 10)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


@register(
    "decontaminate_docs",
    oracle="""
    WITH probes AS (
      SELECT probe_id, probe FROM (
        SELECT doc_id AS probe_id,
               array_to_string(list_slice(
                 list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             t -> t <> ''), 1, 8), ' ') AS probe
        FROM documents
        WHERE doc_id < 5 AND text IS NOT NULL
      ) WHERE probe <> ''
    )
    SELECT d.doc_id, p.probe_id
    FROM documents d JOIN probes p
      ON contains(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'),
                  p.probe)
    WHERE d.text IS NOT NULL
    """,
    doc="Benchmark decontamination: flag every document whose "
    "normalized text contains any probe 8-gram (probes derived "
    "deterministically from docs 0-4, standing in for an eval set). "
    "The probe side is tiny and broadcasts; the corpus streams once "
    "through a substring scan — the shape of the real thing, where "
    "the probe list is an eval suite's n-grams and the inner loop is "
    "an Aho-Corasick pass (here: per-probe contains(), which Spark "
    "codegens). No shuffle touches the corpus.",
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = tokens(F.col("text"))
    # A zero-token probe document yields probe == '' and
    # contains(x, '') is TRUE for every x — it would falsely flag the
    # whole corpus as contaminated (round-12 degenerate gate). An
    # empty probe carries no n-gram to leak, so exclude it.
    probes = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("probe_id"),
        F.array_join(F.slice(tok, 1, 8), " ").alias("probe"),
    ).filter(F.col("probe") != "")
    return d.select("doc_id", normalize_text(F.col("text")).alias("norm")).join(
        F.broadcast(probes), F.expr("contains(norm, probe)")
    ).select("doc_id", "probe_id")


@register(
    "decontaminate_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), probes AS (
      SELECT doc_id AS probe_id,
             array_to_string(list_slice(t, 1, 8), ' ') AS probe
      FROM toks WHERE doc_id < 5
    ), planted AS (
      SELECT tk.doc_id + 2000000000 AS doc_id,
             list_concat(list_slice(tk.t, 1, 12),
                         str_split(p.probe, ' ')) AS t
      FROM toks tk JOIN probes p ON p.probe_id = tk.doc_id - 10
      WHERE len(tk.t) >= 12
    ), all_toks AS (
      SELECT doc_id, t FROM toks
      UNION ALL SELECT doc_id, t FROM planted
    ), spans AS (
      SELECT doc_id, i - 1 AS span_offset,
             array_to_string(list_slice(t, i, i + 7), ' ') AS gram
      FROM all_toks,
           LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) g
      WHERE len(t) >= 8
    )
    SELECT s.doc_id, p.probe_id, CAST(s.span_offset AS BIGINT) AS span_offset
    FROM spans s JOIN probes p ON s.gram = p.probe
    """,
    doc="SPAN-level benchmark decontamination: for every document, "
    "report WHERE each probe 8-gram matches (0-based token offset of "
    "the window), not just that the document is contaminated — real "
    "eval-set decon excises the matching span or paragraph rather than "
    "dropping the whole document, so the pipeline needs offsets. "
    "A deterministic planted slice (probe g-grams of docs 0-4 spliced "
    "into docs 10-14 at token offset 12, ids +2e9) proves non-trivial "
    "mid-document offsets are found, mirroring _planted_corpus. "
    "Shape: tokenize once, slide an 8-token window per position "
    "(in-row transform, no self-join), explode to (gram, offset) rows "
    "that feed a MAP-SIDE broadcast hash join against the tiny probe "
    "set — matches are filtered at the scan stage, so no shuffle ever "
    "carries the corpus or its n_tokens-per-doc window rows; output "
    "size is the number of contaminated spans only. Complements "
    "decontaminate_docs (document-level containment flag).",
)
def decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    probes = toks.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("probe_id"),
        F.array_join(F.slice("t", 1, 8), " ").alias("probe"),
    )
    # Deterministic contamination: splice each probe's token run into
    # the middle of a disjoint host doc (10-14) so matches occur at a
    # non-zero offset the windowing must find.
    planted = (
        toks.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 15))
        .filter(F.size("t") >= 12)
        .join(
            F.broadcast(probes),
            F.col("probe_id") == F.col("doc_id") - 10,
        )
        .select(
            (F.col("doc_id") + F.lit(2_000_000_000)).alias("doc_id"),
            F.concat(F.slice("t", 1, 12), F.split("probe", " ")).alias("t"),
        )
    )
    all_toks = toks.unionByName(planted).filter(F.size("t") >= 8)
    # All 8-token windows of a doc as (offset, gram) structs, built
    # in-row; docs shorter than 8 tokens contribute none (a sequence
    # with a negative end would run DESCENDING, hence the guard above).
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 8),
        lambda i: F.struct(
            i.cast("long").alias("span_offset"),
            F.array_join(F.slice(F.col("t"), i + 1, 8), " ").alias("gram"),
        ),
    )
    spans = all_toks.select("doc_id", F.explode(grams).alias("s")).select(
        "doc_id", F.col("s.span_offset").alias("span_offset"),
        F.col("s.gram").alias("gram"),
    )
    return spans.join(
        F.broadcast(probes), F.col("gram") == F.col("probe")
    ).select("doc_id", "probe_id", "span_offset")


SEM_DECON_TAU = 0.9  # cosine threshold; background max is ~0.49 here


def _sem_decon_dots() -> dict[str, str]:
    from .similarity import _sql_dot

    return {
        "dot_cb": _sql_dot("c.emb", "b.probe_emb", 64),
        "dot_cc": _sql_dot("c.emb", "c.emb", 64),
        "dot_bb": _sql_dot("b.probe_emb", "b.probe_emb", 64),
    }


@register(
    "decontaminate_semantic",
    oracle=f"""
    WITH e AS (
      -- mirror _embeddings' round-13 scan contract: NULL vectors and
      -- vectors with any non-finite component are quarantined
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), bench AS (
      SELECT vec_id AS probe_id, emb AS probe_emb FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT vec_id, emb FROM e WHERE vec_id >= 16
      UNION ALL
      SELECT probe_id + 7000000000, probe_emb
      FROM bench WHERE probe_id < 8
      UNION ALL
      SELECT probe_id + 8000000000,
             list_concat([probe_emb[1] + 0.25], probe_emb[2:])
      FROM bench WHERE probe_id >= 8
    ), scored AS (
      SELECT c.vec_id, b.probe_id,
             ROUND(({{dot_cb}})
                   / (sqrt({{dot_cc}}) * sqrt({{dot_bb}})), 6) AS cos_sim
      FROM corpus c CROSS JOIN bench b
    ), top AS (
      SELECT vec_id, probe_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, probe_id) AS rn
      FROM scored
    )
    SELECT vec_id, probe_id, cos_sim
    FROM top WHERE rn = 1 AND cos_sim >= {SEM_DECON_TAU}
    """.format(**_sem_decon_dots()),
    doc="SEMANTIC benchmark decontamination — the embedding-space "
    "sibling of decontaminate_docs, catching paraphrased leakage that "
    "n-gram containment misses (the Phi/GPT-era decon practice): "
    "vectors 0-15 stand in for an eval suite; the corpus is planted "
    "with 8 EXACT copies (cos = 1.0) and 8 first-coordinate-perturbed "
    "copies (cos ~0.97-0.99 — invisible to exact/text matching), and "
    "any corpus doc whose max probe cosine >= 0.9 is flagged with its "
    "argmax probe (rounded-6dp ordering, probe-id tie-break; the "
    "background cross-cosine tops out ~0.49, so the boundary is "
    "wide). Shape: the benchmark broadcasts (eval suites are small), "
    "the corpus streams ONCE through an unrolled-dot codegen scan, "
    "norms precomputed per side — corpus x |bench| work with no "
    "corpus shuffle at any scale; for thousand-probe suites the "
    "existing LSH/IVF bucketing prefilters candidates first.",
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import as_double, dot, l2_norm
    from .similarity import DIM, _embeddings

    e = _embeddings(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    )
    bench = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("probe_emb")
    )
    exact = bench.filter(F.col("probe_id") < 8).select(
        (F.col("probe_id") + F.lit(7_000_000_000)).alias("vec_id"),
        F.col("probe_emb").alias("emb"),
    )
    perturbed = bench.filter(F.col("probe_id") >= 8).select(
        (F.col("probe_id") + F.lit(8_000_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at("probe_emb", 1) + F.lit(0.25)),
            F.slice("probe_emb", 2, DIM - 1),
        ).alias("emb"),
    )
    corpus = (
        e.filter(F.col("vec_id") >= 16)
        .unionByName(exact)
        .unionByName(perturbed)
    )
    c = corpus.withColumn("_n", l2_norm("emb", dim=DIM))
    p = bench.withColumn("_pn", l2_norm("probe_emb", dim=DIM))
    cos6 = F.round(
        dot("emb", "probe_emb", dim=DIM) / (F.col("_n") * F.col("_pn")), 6
    )
    scored = c.crossJoin(F.broadcast(p)).select(
        "vec_id", "probe_id", cos6.alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("probe_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("cos_sim") >= SEM_DECON_TAU))
        .select("vec_id", "probe_id", "cos_sim")
    )


# Shared PII regexes — Java-regex and RE2 compatible, identical
# semantics in Spark and DuckDB (ASCII classes, \b word boundaries).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
PII_IP = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"


@register(
    "docs_pii_redaction",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source,
             CASE WHEN doc_id < 10 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-867-530'
                    || CAST(doc_id % 10 AS VARCHAR)
                    || ' from 192.168.1.' || CAST(doc_id AS VARCHAR)
             ELSE text END AS text2
      FROM documents WHERE text IS NOT NULL
    ), hits AS (
      SELECT source,
             len(regexp_extract_all(text2, '{PII_EMAIL}')) AS n_emails,
             len(regexp_extract_all(text2, '{PII_PHONE}')) AS n_phones,
             len(regexp_extract_all(text2, '{PII_IP}')) AS n_ips,
             length(text2) - length(
               regexp_replace(regexp_replace(regexp_replace(
                 text2, '{PII_EMAIL}', '', 'g'),
                 '{PII_PHONE}', '', 'g'),
                 '{PII_IP}', '', 'g')) AS n_pii_chars
      FROM base
    )
    SELECT source,
           COUNT(*) FILTER (WHERE n_emails + n_phones + n_ips > 0)
             AS n_docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(n_ips) AS BIGINT) AS total_ips,
           CAST(SUM(n_pii_chars) AS BIGINT) AS total_pii_chars
    FROM hits GROUP BY source
    HAVING SUM(n_emails) + SUM(n_phones) + SUM(n_ips) > 0
    """,
    doc="PII detection/redaction accounting — the compliance pass every "
    "training corpus needs before release: count emails, NANP phone "
    "numbers and IPv4 addresses per source and the chars a redaction "
    "pass would remove (length delta of chained regexp_replace). "
    "Deterministic planted PII on docs 0-9 proves each pattern fires. "
    "Pure narrow scan-side regex work (Spark codegen regexp_count / "
    "regexp_replace — no UDF, no shuffle before the source-grain "
    "partial agg); at 100 TB this runs at scan speed alongside any "
    "other per-doc signal. The real production pattern list is a "
    "config concern; the engine shape — N regexes fused into one "
    "projection over one scan — is what this pins.",
)
def docs_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-867-530"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(" from 192.168.1."),
        F.col("doc_id").cast("string"),
    )
    text2 = F.when(F.col("doc_id") < 10, planted).otherwise(F.col("text"))
    base = d.select("doc_id", "source", text2.alias("text2"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text2"), PII_EMAIL, ""), PII_PHONE, ""
        ),
        PII_IP,
        "",
    )
    hits = base.select(
        "source",
        F.regexp_count(F.col("text2"), F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("text2"), F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("text2"), F.lit(PII_IP)).alias("n_ips"),
        (F.length("text2") - F.length(redacted)).alias("n_pii_chars"),
    )
    return (
        hits.groupBy("source")
        .agg(
            F.count_if(
                F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0
            ).alias("n_docs_with_pii"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_phones").alias("total_phones"),
            F.sum("n_ips").alias("total_ips"),
            F.sum("n_pii_chars").alias("total_pii_chars"),
        )
        .filter(
            F.col("total_emails") + F.col("total_phones") + F.col("total_ips")
            > 0
        )
    )


@register(
    "split_leakage_audit",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 3000000000, text FROM documents
      WHERE text IS NOT NULL AND doc_id < 10
    ), fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM corpus
    ), leaks AS (
      SELECT fingerprint FROM fp
      GROUP BY fingerprint HAVING COUNT(DISTINCT split) > 1
    )
    SELECT f.split,
           COUNT(DISTINCT f.fingerprint) AS n_leaked_fingerprints,
           COUNT(*) AS n_leaked_docs
    FROM fp f JOIN leaks l USING (fingerprint)
    GROUP BY f.split
    """,
    doc="Split-leakage audit: exact-duplicate texts whose copies land "
    "in DIFFERENT train/val/test splits (the id-hash split assigns by "
    "doc_id, so verbatim dups leak across the boundary — the classic "
    "silent eval-inflation bug). Verbatim copies of docs 0-9 (ids "
    "+3e9) are planted so the detector provably fires — their id-hash "
    "splits differ from their sources'. Composes the engine's own "
    "split rule (split_train_val_test) with the exact-dedup "
    "fingerprint: one "
    "fingerprint-keyed agg over uniform 128-bit keys finds fingerprints "
    "spanning >1 split, then a semi-join back attributes leaked docs "
    "per split. At 100 TB both sides are digest-only tables (16 "
    "bytes/doc) — the corpus text is scanned once and never shuffled. "
    "The fix a pipeline applies downstream is split-by-fingerprint "
    "instead of split-by-id; this query is the detector that says "
    "whether you must.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"), "text"
    )
    d = base.unionByName(planted)
    split = _split_expr(F.col("doc_id"))
    fp = d.select(
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        split.alias("split"),
    )
    leaks = (
        fp.groupBy("fingerprint")
        .agg(F.count_distinct("split").alias("_ns"))
        .filter(F.col("_ns") > 1)
        .select("fingerprint")
    )
    return (
        fp.join(leaks, "fingerprint")
        .groupBy("split")
        .agg(
            F.count_distinct("fingerprint").alias("n_leaked_fingerprints"),
            F.count(F.lit(1)).alias("n_leaked_docs"),
        )
    )


@register(
    "split_by_fingerprint",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, lang, n_chars, text FROM documents
      WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 3000000000, lang, n_chars, text FROM documents
      WHERE text IS NOT NULL AND doc_id < 10
    ), fp AS (
      SELECT lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint
      FROM corpus
    ), assigned AS (
      SELECT lang, n_chars,
             CASE WHEN substr(md5(fingerprint), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(fingerprint), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM fp
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1, 2
    """,
    doc="Content-keyed train/val/test assignment — the FIX for the "
    "leakage split_leakage_audit detects: hashing the exact-dedup "
    "FINGERPRINT instead of the doc id sends every verbatim copy of a "
    "text to the SAME split by construction (zero cross-split leaks; "
    "pinned by test over the same planted-copy corpus where the "
    "id-keyed split provably leaks). Still a pure narrow map — one "
    "md5 over the normalized text the dedup pass already computes — "
    "content-deterministic across engines, runs, and cluster sizes. "
    "Runs over the same corpus + planted verbatim copies (ids +3e9) "
    "as the audit so the two queries form a detector/fix pair.",
)
def split_by_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "lang", "n_chars", "text")
    planted = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(3_000_000_000)).alias("doc_id"),
        "lang",
        "n_chars",
        "text",
    )
    corpus = base.unionByName(planted)
    fingerprint = F.md5(normalize_text(F.col("text")))
    split = _split_expr(fingerprint)
    return (
        corpus.select("lang", "n_chars", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "incremental_curation_pipeline",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, source, text, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250
    ), batch AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM fp WHERE doc_id >= 250
      ) WHERE rn = 1
    ), fresh AS (
      SELECT b.* FROM batch b
      WHERE NOT EXISTS (
        SELECT 1 FROM corpus c WHERE c.fingerprint = b.fingerprint
      )
    ), scored AS (
      SELECT lang, source, n_chars,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               AS n_alnum,
             CASE WHEN contains(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               (SELECT array_to_string(list_slice(list_filter(
                  regexp_split_to_array(trim(lower(p.text)), '\\s+'),
                  t -> t <> ''), 1, 8), ' ')
                FROM documents p WHERE p.doc_id = 0)
             ) THEN 1 ELSE 0 END AS contaminated
      FROM fresh
    ), kept AS (
      SELECT * FROM scored
      WHERE n_tokens >= 10
        AND (2 * 10000 * n_alnum + n_chars) // (2 * n_chars) >= 5000
        AND contaminated = 0
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang, source
    """,
    doc="The DAILY-INGEST counterpart of corpus_curation_pipeline, "
    "fused into one Catalyst plan: the fresh batch (docs 250+, the "
    "same corpus/batch split as dedup_incremental_batch) dedups "
    "WITHIN itself (fingerprint window), anti-joins the existing "
    "corpus's digest set (16 bytes/doc — yesterday's text is never "
    "rescanned), passes the length/alnum quality gates, drops docs "
    "containing the doc-0 probe 8-gram (decontaminate_docs' rule), "
    "and lands as per-(lang, source) accounting. Cost is "
    "proportional to the DAILY batch at any corpus size: one "
    "fingerprint window shuffle + one uniform digest anti-join + a "
    "broadcast 1-row probe + one partial-agg shuffle. This is the "
    "pipeline a user actually schedules; each stage's standalone "
    "twin is separately oracle-checked, and the fused plan is too.",
)
def incremental_curation_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = d.withColumn("fingerprint", F.md5(normalize_text(F.col("text"))))
    corpus = (
        fp.filter(F.col("doc_id") < 250).select("fingerprint").distinct()
    )
    win = Window.partitionBy("fingerprint").orderBy("doc_id")
    batch = (
        fp.filter(F.col("doc_id") >= 250)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    fresh = batch.join(corpus, "fingerprint", "left_anti")
    # Aggregate to exactly ONE row (NULL probe when doc 0 is absent or has
    # NULL text) so the crossJoin can never collapse the batch to zero rows;
    # the NULL-safe contains below then degrades to contaminated=0, matching
    # the oracle's scalar subquery + CASE ... ELSE 0 semantics.
    probe = (
        d.filter(F.col("doc_id") == 0)
        .select(
            F.array_join(F.slice(tokens(F.col("text")), 1, 8), " ").alias(
                "probe"
            )
        )
        .agg(F.max("probe").alias("probe"))
    )
    scored = fresh.crossJoin(F.broadcast(probe)).select(
        "lang",
        "source",
        "n_chars",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD), 0)).alias(
            "n_tokens"
        ),
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", "")).alias(
            "n_alnum"
        ),
        F.coalesce(
            F.expr(
                "contains(regexp_replace(lower(trim(text)), '\\\\s+', ' '),"
                " probe)"
            ).cast("int"),
            F.lit(0),
        ).alias("contaminated"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (
            F.expr("(2 * 10000 * n_alnum + n_chars) div (2 * n_chars)")
            >= MIN_ALNUM_PCT4
        )
        & (F.col("contaminated") == 0)
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
