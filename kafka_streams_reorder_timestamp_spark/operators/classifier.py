"""Model-based quality scoring: a hashed-n-gram linear classifier
trained AND applied inside one Catalyst plan.

The fineweb-edu / fastText curation shape: an expensive quality signal
(there an LLM grader; here the Gopher rule panel from
``docs_gopher_rules``) is distilled into a cheap linear model over
hashed bag-of-n-gram features, and the cheap model is what scores the
corpus at scan speed. This module implements the distillation with a
Bernoulli-Naive-Bayes log-odds model — closed-form, one aggregation
pass, no iterative optimizer — so the whole train-plus-score pipeline
is expressible in portable relational algebra and carries a full
DuckDB oracle (most "ML in the warehouse" designs give that up).

Design for 100 TB:
  - features are distinct hashed unigram+bigram buckets computed
    IN-ROW (array ops inside codegen, no UDF anywhere); the explode
    ships only (doc_id, int bucket) pairs;
  - training is ONE partial-agg shuffle of those pairs into a
    2048-row (bucket, class-count) table — mergeable counts, so the
    same fold works on any partitioning;
  - the weight table broadcasts (2048 rows regardless of corpus
    size) and scoring is a broadcast join + per-doc partial agg:
    cost is linear in corpus tokens with no wide shuffle;
  - cross-engine determinism: buckets come from md5 (identical hex in
    Spark and DuckDB, unlike xxhash64), each log-odds weight is
    rounded to 6 dp per-row, and per-doc sums run in DECIMAL(18,6) —
    exact and order-independent — so the final logits hash-match the
    oracle bit-for-bit.

Reference tie-in: the reference has no classifier surface (SURVEY
§2.2 extension; LLM-pipeline mandate). Label panel follows Rae et al.
2021 (Gopher, Table A1); the distillation framing follows Penedo et
al. 2024 (FineWeb-Edu) and Joulin et al. 2017 (fastText).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from .text import NON_ALNUM, PUNCT, WORD, _count_matches, _count_stop, _stop_sql

N_BUCKETS = 2048
ALPHA = 1  # Laplace smoothing pseudo-count


def _gopher_keep(d: DataFrame) -> Column:
    """The conjunctive Gopher keep flag — EXACTLY docs_gopher_rules'
    rule panel, reused as the weak training label."""
    n_words = _count_matches(F.col("text"), WORD)
    n_alnum = F.length(F.regexp_replace(F.col("text"), NON_ALNUM, ""))
    n_symbols = _count_matches(F.col("text"), PUNCT)
    n_stop = _count_stop(F.col("text"), "en")
    # greatest(..., 1) guards the division: ANSI mode evaluates the
    # projection eagerly, so a punctuation-only/CJK doc with zero word
    # matches would raise DIVIDE_BY_ZERO despite the n_words >= 5
    # conjunct (conjunctions do not short-circuit expression
    # evaluation). Semantics unchanged — such docs fail n_words >= 5
    # regardless, and n_alnum is 0 when n_words is.
    mean_wl = n_alnum * F.lit(1.0) / F.greatest(n_words, F.lit(1))
    return (
        (n_words >= 5)
        & (n_words <= 100_000)
        & (mean_wl >= 3)
        & (mean_wl <= 12)
        & (n_symbols * F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1)) <= 0.1)
        & (n_alnum * F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1)) >= 0.6)
        & (n_stop >= 2)
    )


def _bucket(gram: Column) -> Column:
    """Engine-portable feature hash: first 60 bits of md5, mod 2048.
    md5 (not xxhash64) so DuckDB computes the identical bucket."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long") % N_BUCKETS


def _labeled_projection(d: DataFrame, extra: tuple = ()) -> DataFrame:
    """(doc_id, *extra, t, y) UNPERSISTED: the weak-label regex panel +
    tokenization, the single source of truth for the labeled scan —
    `_labeled_toks` (token-level cache, streaming/scoring twin) and
    `_labeled_buckets` (bucket-level cache, batch scoring) both build
    on this so the label/tokenization logic cannot drift between the
    batch and streaming paths (ADVICE r13)."""
    from ..functions.texthash import tokens

    return d.select(
        "doc_id",
        *extra,
        tokens(F.col("text")).alias("t"),
        _gopher_keep(d).cast("int").alias("y"),
    )


def _labeled_toks(d: DataFrame, extra: tuple = ()) -> DataFrame:
    """(doc_id, *extra, t, y): token arrays + weak label, LAZILY
    persisted — the regex label panel and tokenization are the
    expensive per-doc work, and features, class totals, and the final
    per-doc frame all derive from this one table, so without the cache
    boundary Catalyst re-runs the regex scan once per consumer
    (measured ~2x wall on the scores query at sf0.1). `extra` carries
    pass-through columns (e.g. source for the monitoring rollups) so
    downstream consumers never pay a doc_id-keyed join — at corpus
    scale that join is a full extra shuffle. Only queries that NEED a
    pass-through column ask for it: threading source everywhere would
    unify the persisted plan shape across the family (one cache), but
    it also defeats column pruning on the scan for the queries that
    never read it — and the registry cache contract clears between
    queries, so the two shapes never actually coexist in bench or
    driver runs."""
    from pyspark import StorageLevel

    # NO pre-widen here, unlike the LSH operators: their Arrow
    # signature passes are CPU-heavy enough that buying parallelism
    # with a repartition wins even at sf0.1, but this scan's per-doc
    # regex work is light — the measured effect of widening was
    # neutral on the scores query (~3s either way) and a +1.1s
    # regression on the incremental one (it pays the full-text shuffle
    # but trains on half the rows). The single-task scan is a
    # local-testdata artifact (one row group per file — SCALE.md
    # "Scan parallelism note"); production layouts scan wide without
    # help.
    return _labeled_projection(d, extra).persist(
        StorageLevel.MEMORY_AND_DISK
    )


def _gram_array() -> Column:
    """The model's feature-gram array (unigrams + bigrams of the token
    column `t`), in-row. Shared by _doc_features (which hashes it) and
    classifier_bucket_collisions (which audits the hash)."""
    # greatest(..., 0): F.slice throws on negative length, so an
    # empty token array (empty/whitespace-only text) must clamp to a
    # zero-length slice — yielding zero bigrams, matching the oracle's
    # range(1, 0) = empty.
    bigrams = F.transform(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("t"), i + 2)),
    )
    return F.concat(F.col("t"), bigrams)


def _doc_features(lab: DataFrame) -> DataFrame:
    """(doc_id, y, bucket): distinct hashed unigram+bigram buckets per
    document, with the weak label. All in-row until the explode."""
    buckets = F.array_distinct(F.transform(_gram_array(), _bucket))
    return lab.select("doc_id", "y", F.explode(buckets).alias("bucket"))


def _labeled_buckets(d: DataFrame, extra: tuple = ()) -> DataFrame:
    """(doc_id, *extra, y, bs): weak label + the document's DISTINCT
    hashed feature buckets, computed in ONE cached pass.

    r13 optimization (guide §1.2/§5): the previous shape cached
    (doc_id, t, y) and derived the md5 gram buckets downstream, so the
    hashing (~0.85 s single-task at sf0.1) re-ran once per consumer —
    twice per train-and-score query (training explode + scoring
    explode). Hashing in the cached projection runs it exactly once,
    and the cache payload shrinks from token strings to int arrays.
    The pre-widen repartition parallelizes the regex label panel + the
    md5 pass across the session's cores — the local one-row-group scan
    is single-task (SCALE.md "Scan parallelism note") and now carries
    the md5 work, which flips the round-7 "widening is neutral"
    measurement (that predates buckets-in-cache); on production
    layouts the input already has >= cores partitions and the guard is
    a no-op. `extra` rides through for the same no-doc_id-join reason
    as before."""
    from pyspark import StorageLevel

    par = d.sparkSession.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    lab = _labeled_projection(d, extra)
    # Persist stays LAZY here: single-fan-out consumers (the weights
    # query trains once off this frame) pay nothing extra. The
    # scoring paths, whose broadcast subqueries convoy on a lazy
    # cache, materialize it eagerly themselves (see _scores_frame).
    return lab.select(
        "doc_id",
        *extra,
        "y",
        F.array_distinct(F.transform(_gram_array(), _bucket)).alias("bs"),
    ).persist(StorageLevel.MEMORY_AND_DISK)


def _feat(fb: DataFrame) -> DataFrame:
    """(doc_id, y, bucket): the training explode off the bucketed
    cache — identical rows to `_doc_features(lab)`, md5 already paid."""
    return fb.select("doc_id", "y", F.explode("bs").alias("bucket"))


def _weights(feat: DataFrame, totals: DataFrame) -> DataFrame:
    """(bucket, n_keep_docs, n_drop_docs, weight, weight_absent):
    Laplace-smoothed Bernoulli-NB log-odds of feature PRESENCE and
    ABSENCE, each rounded to 6 dp per row (the cross-engine ln
    convention). Both terms are needed for the full Bernoulli decision
    rule — presence-only scoring degenerates to the base rate on this
    label (drop-class docs are short, so their few features never
    overcome the positive class prior; measured: presence-only
    accuracy == base rate 0.776, full rule 0.846 at sf0.01)."""
    pk = (F.col("n_keep_docs") + ALPHA) / (F.col("n_k") + 2 * ALPHA)
    pd_ = (F.col("n_drop_docs") + ALPHA) / (F.col("n_d") + 2 * ALPHA)
    return (
        feat.groupBy("bucket")
        .agg(
            F.sum("y").alias("n_keep_docs"),
            F.sum(F.lit(1) - F.col("y")).alias("n_drop_docs"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_keep_docs",
            "n_drop_docs",
            F.round(F.log(pk) - F.log(pd_), 6).alias("weight"),
            F.round(F.log(1 - pk) - F.log(1 - pd_), 6).alias(
                "weight_absent"
            ),
        )
    )


def _totals(lab: DataFrame) -> DataFrame:
    """One-row (n_k, n_d): class totals for smoothing + prior."""
    return lab.agg(
        F.sum("y").alias("n_k"), F.sum(F.lit(1) - F.col("y")).alias("n_d")
    )


_ORACLE_FEAT = f"""
    base AS (
      SELECT doc_id, n_chars, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), labeled AS (
      SELECT doc_id, t,
        CAST(
          len(regexp_extract_all(text, '{WORD}')) >= 5
          AND len(regexp_extract_all(text, '{WORD}')) <= 100000
          AND length(regexp_replace(text, '{NON_ALNUM}', '', 'g')) * 1.0
              / GREATEST(len(regexp_extract_all(text, '{WORD}')), 1) >= 3
          AND length(regexp_replace(text, '{NON_ALNUM}', '', 'g')) * 1.0
              / GREATEST(len(regexp_extract_all(text, '{WORD}')), 1) <= 12
          AND len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
              / GREATEST(n_chars, 1) <= 0.1
          AND length(regexp_replace(text, '{NON_ALNUM}', '', 'g')) * 1.0
              / GREATEST(n_chars, 1) >= 0.6
          AND {_stop_sql('text', 'en')} >= 2
        AS INTEGER) AS y
      FROM base
    ), feat AS (
      SELECT doc_id, y, unnest(list_distinct(list_transform(
               list_concat(t, list_transform(range(1, len(t)),
                                             i -> t[i] || ' ' || t[i+1])),
               g -> CAST(('0x' || substring(md5(g), 1, 15))::UBIGINT
                         % {N_BUCKETS} AS BIGINT)))) AS bucket
      FROM labeled
    ), totals AS (
      SELECT SUM(y) AS n_k, SUM(1 - y) AS n_d FROM labeled
    ), weights AS (
      SELECT bucket,
             CAST(SUM(y) AS BIGINT) AS n_keep_docs,
             CAST(SUM(1 - y) AS BIGINT) AS n_drop_docs,
             ROUND(ln((SUM(y) + {ALPHA}) * 1.0 / (t.n_k + {2 * ALPHA}))
                   - ln((SUM(1 - y) + {ALPHA}) * 1.0 / (t.n_d + {2 * ALPHA})), 6)
               AS weight,
             ROUND(ln(1.0 - (SUM(y) + {ALPHA}) * 1.0 / (t.n_k + {2 * ALPHA}))
                   - ln(1.0 - (SUM(1 - y) + {ALPHA}) * 1.0
                        / (t.n_d + {2 * ALPHA})), 6)
               AS weight_absent
      FROM feat CROSS JOIN totals t
      GROUP BY bucket, t.n_k, t.n_d
    )
"""

# The full model as reusable CTEs: _ORACLE_FEAT + prior + the absence
# constant + per-doc sums + final per-doc decimal logits. Shared by the
# scores oracle and corpus_curation_pipeline's score-threshold stage.
_ORACLE_MODEL = f"""{_ORACLE_FEAT}, prior AS (
      SELECT CAST(ROUND(ln((n_k + {ALPHA}) * 1.0 / (n_d + {ALPHA})), 6)
                  AS DECIMAL(18,6)) AS p
      FROM totals
    ), absent_sum AS (
      SELECT SUM(CAST(weight_absent AS DECIMAL(18,6))) AS c FROM weights
    ), doc_sums AS (
      SELECT f.doc_id,
             COUNT(*) AS n_features,
             SUM(CAST(w.weight AS DECIMAL(18,6))
                 - CAST(w.weight_absent AS DECIMAL(18,6))) AS s
      FROM feat f JOIN weights w ON f.bucket = w.bucket
      GROUP BY f.doc_id
    ), scores AS (
      SELECT l.doc_id, l.y,
             COALESCE(d.n_features, 0) AS n_features,
             COALESCE(d.s, 0) + (SELECT p FROM prior)
               + (SELECT c FROM absent_sum) AS logit_dec
      FROM labeled l LEFT JOIN doc_sums d ON l.doc_id = d.doc_id
    )
"""


@register(
    "quality_classifier_weights",
    oracle=f"""
    WITH {_ORACLE_FEAT}
    SELECT bucket, n_keep_docs, n_drop_docs, weight, weight_absent
    FROM weights
    """,
    doc="The TRAINED model of the quality-classifier pair: per hashed "
    "n-gram bucket, how many keep-class and drop-class documents "
    "contain it, and the Laplace-smoothed Bernoulli-NB log-odds "
    "weight. Training is one (doc, bucket) explode + one 2048-group "
    "partial-agg shuffle — closed-form, no optimizer — and the "
    "whole fit is oracle-checked against DuckDB running the "
    "identical relational definition (md5 buckets, 6-dp-rounded ln). "
    "This is the table quality_classifier_scores broadcasts; "
    "inspecting it IS model debugging (which n-grams drive keep vs "
    "drop).",
)
def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fb = _labeled_buckets(d)
    return _weights(_feat(fb), _totals(fb))


@register(
    "quality_classifier_scores",
    oracle=f"""
    WITH {_ORACLE_MODEL}
    SELECT doc_id,
           CAST(n_features AS BIGINT) AS n_features,
           CAST(logit_dec AS DOUBLE) AS logit,
           (logit_dec > 0) AS pred_keep,
           y AS weak_label
    FROM scores
    """,
    doc="Model-based quality scoring, the fineweb-edu distillation "
    "shape: the Gopher rule panel (the 'expensive grader') labels "
    "the corpus once, a hashed-bigram Bernoulli-NB model distills "
    "those labels, and every document gets a model logit + predicted "
    "keep flag from ONE fused plan — train and apply, no UDF, no "
    "optimizer. The FULL Bernoulli rule is used: logit = prior + "
    "sum over the vocabulary of the absence log-odds (a per-corpus "
    "CONSTANT, one 1-row agg over the weight table) + per present "
    "feature (weight - weight_absent). Presence-only scoring "
    "degenerates to the base rate here (drop docs are short; their "
    "few features never overcome the class prior) — full-rule "
    "accuracy 0.846 vs 0.776 base at sf0.01. Scoring is a broadcast "
    "join of the 2048-row weight table against the in-row-hashed "
    "features plus a per-doc partial agg; per-doc sums run in "
    "DECIMAL(18,6) over 6-dp-rounded weights, so logits are exact, "
    "order-independent, and hash-match DuckDB computing the "
    "identical definition. At 100 TB: one corpus scan to train "
    "(8-byte pair shuffle), one to score (broadcast join at scan "
    "speed) — the production split would persist the weight table "
    "and score daily batches incrementally, which this plan's "
    "stages compose into.",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return _scores_frame(d).select(
        "doc_id",
        "n_features",
        F.col("logit_dec").cast("double").alias("logit"),
        (F.col("logit_dec") > 0).alias("pred_keep"),
        "weak_label",
    )


def _scores_frame(d: DataFrame, extra: tuple = ()) -> DataFrame:
    """(doc_id, *extra, n_features, n_known, logit_dec, weak_label):
    the full train-and-score subplan over `d`, logits kept as exact
    DECIMAL so downstream thresholds (corpus_curation_pipeline's model
    stage) compare the same value the oracle computes. `extra` columns
    ride through the labeled scan so rollup consumers (confusion,
    drift) skip a corpus-granularity doc_id join.

    r13: built on the bucketed cache (`_labeled_buckets`) and the
    join-free scoring shape (`_apply_model_fb`) — one md5 feature pass
    instead of two, and no doc-granularity reassembly SortMergeJoin."""
    fb = _labeled_buckets(d, extra)
    totals, w = _train_model(fb)
    return _apply_model_fb(fb, w, totals, extra)


def _train_model(fb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fit (totals, w) off the bucketed cache and MATERIALIZE both
    (r14, guide §2.4/§2.6): the scoring plan hangs several broadcast
    subqueries off these two tiny tables (prior, oov, absent_sum, the
    weight join), and Spark launches those jobs concurrently. Left
    lazy, every consumer re-executed the corpus-scale subtree under
    them — the weights explode+agg ran TWICE per scoring query (two
    identical 377KB exchange writes in the r14 diag of
    quality_classifier_confusion) — and the racing jobs then convoyed
    on the shared fb cache's block locks while holding task threads
    (measured at 32 cores: sum executorRunTime 135s vs 17s CPU before;
    56s/28s after — the driver's r13 8c-faster-than-32c scaling
    inversions on this family are this convoy). The totals count also
    populates the fb cache itself, so the fan-out starts from fully
    warm cached tables; each duplicate subtree was a full corpus pass
    at 100 TB."""
    totals = _totals(fb).persist()
    totals.count()
    w = _weights(_feat(fb), totals).persist()
    w.count()
    return totals, w


def apply_quality_model(
    lab: DataFrame, w: DataFrame, totals: DataFrame, extra: tuple = ()
) -> DataFrame:
    """Score a labeled-tokens corpus against a trained weight table —
    the PRODUCTION serving path: `w` and `totals` may come from the
    in-plan fit (quality_classifier_scores) or from a PERSISTED
    warehouse table written at training time; parquet round-trips the
    6-dp-rounded doubles exactly, so both paths produce identical
    DECIMAL logits (pinned by
    tests/test_classifier.py::test_persisted_weight_table_scores_identically).

    Out-of-vocabulary features (possible whenever the scored corpus is
    not the training corpus) follow the quality_classifier_incremental
    contract: a LEFT join counts them in n_features and scores them
    with the Laplace-default presence log-odds rather than silently
    dropping them. On the training corpus itself every bucket is in
    vocabulary, so this is exactly the inner-join the oracle computes.
    """
    feat = _doc_features(lab)
    prior = totals.select(
        F.round(
            F.log((F.col("n_k") + ALPHA) * F.lit(1.0) / (F.col("n_d") + ALPHA)), 6
        )
        .cast("decimal(18,6)")
        .alias("p")
    )
    oov = totals.select(
        F.round(
            F.log(ALPHA * F.lit(1.0) / (F.col("n_k") + 2 * ALPHA))
            - F.log(ALPHA * F.lit(1.0) / (F.col("n_d") + 2 * ALPHA)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w_oov")
    )
    absent_sum = w.agg(
        F.sum(F.col("weight_absent").cast("decimal(18,6)")).alias("c")
    )
    known = F.col("weight").isNotNull()
    doc_sums = (
        feat.join(
            F.broadcast(w.select("bucket", "weight", "weight_absent")),
            "bucket",
            "left",
        )
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.when(known, 1).otherwise(0)).alias("n_known"),
            F.sum(
                F.when(
                    known,
                    F.col("weight").cast("decimal(18,6)")
                    - F.col("weight_absent").cast("decimal(18,6)"),
                ).otherwise(F.col("w_oov"))
            ).alias("s"),
        )
    )
    labeled = lab.select("doc_id", *extra, F.col("y").alias("weak_label"))
    return (
        labeled.join(doc_sums, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .crossJoin(F.broadcast(absent_sum))
        .select(
            "doc_id",
            *extra,
            F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
            F.coalesce(F.col("n_known"), F.lit(0)).alias("n_known"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.col("p") + F.col("c")).alias(
                "logit_dec"
            ),
            "weak_label",
        )
    )


def _apply_model_fb(
    fb: DataFrame, w: DataFrame, totals: DataFrame, extra: tuple = ()
) -> DataFrame:
    """`apply_quality_model` over the bucketed cache, WITHOUT the
    doc-granularity reassembly join (r13, guide §2.4).

    The previous shape aggregated feature rows per doc and then
    LEFT-JOINED the per-doc sums back onto the labeled frame so docs
    with zero features kept a row — a SortMergeJoin on doc_id costing
    two exchanges + two sorts at corpus granularity. Here explode_outer
    carries (doc_id, *extra, y) through the feature rows, so the
    per-doc sums and the final frame are ONE groupBy (a single
    doc_id-grain exchange). A zero-feature doc survives as its single
    null-bucket row: count("bucket") skips it (n_features 0), both
    conditional sums leave it NULL (coalesced to the same defaults the
    left join produced), and the weight join cannot match a NULL
    bucket — bit-identical to the join shape, one shuffle cheaper.
    Every model expression (prior, oov, absent_sum, the per-row
    DECIMAL arithmetic) is byte-identical to `apply_quality_model`."""
    prior = totals.select(
        F.round(
            F.log((F.col("n_k") + ALPHA) * F.lit(1.0) / (F.col("n_d") + ALPHA)), 6
        )
        .cast("decimal(18,6)")
        .alias("p")
    )
    oov = totals.select(
        F.round(
            F.log(ALPHA * F.lit(1.0) / (F.col("n_k") + 2 * ALPHA))
            - F.log(ALPHA * F.lit(1.0) / (F.col("n_d") + 2 * ALPHA)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w_oov")
    )
    absent_sum = w.agg(
        F.sum(F.col("weight_absent").cast("decimal(18,6)")).alias("c")
    )
    known = F.col("weight").isNotNull()
    feat_all = fb.select(
        "doc_id", *extra, "y", F.explode_outer("bs").alias("bucket")
    )
    doc_sums = (
        feat_all.join(
            F.broadcast(w.select("bucket", "weight", "weight_absent")),
            "bucket",
            "left",
        )
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id", *extra, "y")
        .agg(
            F.count("bucket").alias("n_features"),
            F.sum(
                F.when(known, 1).when(F.col("bucket").isNotNull(), 0)
            ).alias("n_known"),
            F.sum(
                F.when(
                    known,
                    F.col("weight").cast("decimal(18,6)")
                    - F.col("weight_absent").cast("decimal(18,6)"),
                ).when(F.col("bucket").isNotNull(), F.col("w_oov"))
            ).alias("s"),
        )
    )
    return (
        doc_sums.crossJoin(F.broadcast(prior))
        .crossJoin(F.broadcast(absent_sum))
        .select(
            "doc_id",
            *extra,
            F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
            F.coalesce(F.col("n_known"), F.lit(0)).alias("n_known"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.col("p") + F.col("c")).alias(
                "logit_dec"
            ),
            F.col("y").alias("weak_label"),
        )
    )


@register(
    "quality_classifier_confusion",
    oracle=f"""
    WITH {_ORACLE_MODEL}
    SELECT d.source,
           CAST(SUM(CASE WHEN s.logit_dec > 0 AND s.y = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST(SUM(CASE WHEN s.logit_dec > 0 AND s.y = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
           CAST(SUM(CASE WHEN s.logit_dec <= 0 AND s.y = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
           CAST(SUM(CASE WHEN s.logit_dec <= 0 AND s.y = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tn,
           CAST((10000 * SUM(CASE WHEN (s.logit_dec > 0) = (s.y = 1)
                             THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS accuracy_pct4
    FROM scores s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY 1
    """,
    doc="Model-eval confusion matrix per source: where the distilled "
    "classifier agrees with its weak teacher labels and where it "
    "does not — n_tp/n_fp/n_fn/n_tn plus an exact integer accuracy "
    "(basis points, floor division; no float ratio to drift across "
    "engines). A source with outlier n_fp is one whose junk the "
    "model mistakes for quality (training-label blind spot); "
    "outlier n_fn flags quality content the weak rules reject — the "
    "two failure directions a curation operator audits before "
    "trusting model-gated filtering. Reuses the full train+score "
    "subplan (_scores_frame / the shared _ORACLE_MODEL CTE chain); "
    "source rides THROUGH the labeled scan rather than joining back "
    "on doc_id — at corpus scale that join is a whole extra shuffle.",
)
def quality_classifier_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d, extra=("source",))
    pred = F.col("logit_dec") > 0
    label = F.col("weak_label") == 1
    return (
        s.groupBy("source")
        .agg(
            F.sum(F.when(pred & label, 1).otherwise(0)).alias("n_tp"),
            F.sum(F.when(pred & ~label, 1).otherwise(0)).alias("n_fp"),
            F.sum(F.when(~pred & label, 1).otherwise(0)).alias("n_fn"),
            F.sum(F.when(~pred & ~label, 1).otherwise(0)).alias("n_tn"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN (logit_dec > 0) = "
                "(weak_label = 1) THEN 1 ELSE 0 END)) div count(*) "
                "AS BIGINT)"
            ).alias("accuracy_pct4"),
        )
    )


@register(
    "quality_classifier_calibration",
    oracle=f"""
    WITH {_ORACLE_MODEL}
    SELECT CAST(FLOOR(logit_dec) AS BIGINT) AS logit_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_label_keep,
           CAST((10000 * SUM(y)) // COUNT(*) AS BIGINT)
             AS label_keep_pct4
    FROM scores
    GROUP BY 1
    """,
    doc="Model-eval reliability curve: documents bucketed by unit-wide "
    "logit bins (FLOOR of the exact DECIMAL logit — identical "
    "boundary in both engines, no float binning), with the observed "
    "weak-label keep rate per bin in exact basis points. A "
    "well-ordered model shows keep rate rising monotonically with "
    "the bin — the check that the logit MAGNITUDE is usable as a "
    "confidence for threshold tuning (e.g. curation at logit > 2 "
    "instead of > 0), not just its sign. Costs one bin-grain rollup "
    "over the shared train+score subplan.",
)
def quality_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d)
    return (
        s.select(
            F.floor(F.col("logit_dec")).cast("long").alias("logit_bin"),
            F.col("weak_label").alias("y"),
        )
        .groupBy("logit_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("n_label_keep"),
            F.expr(
                "CAST((10000 * sum(y)) div count(*) AS BIGINT)"
            ).alias("label_keep_pct4"),
        )
    )


@register(
    "quality_classifier_auc",
    oracle=f"""
    WITH {_ORACLE_MODEL}, g AS (
      SELECT d.source, s.logit_dec,
             SUM(s.y) AS n_pos_g, SUM(1 - s.y) AS n_neg_g
      FROM scores s JOIN documents d ON d.doc_id = s.doc_id
      GROUP BY 1, 2
    ), c AS (
      SELECT source, n_pos_g, n_neg_g,
             COALESCE(SUM(n_neg_g) OVER (
               PARTITION BY source ORDER BY logit_dec
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg_below
      FROM g
    )
    SELECT source,
           CAST(SUM(n_pos_g) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg_g) AS BIGINT) AS n_neg,
           CAST(CASE WHEN SUM(n_pos_g) = 0 OR SUM(n_neg_g) = 0 THEN NULL
                ELSE (10000 * SUM(n_pos_g * (2 * cum_neg_below + n_neg_g)))
                     // (2 * SUM(n_pos_g) * SUM(n_neg_g)) END
                AS BIGINT) AS auc_pct4
    FROM c GROUP BY 1
    """,
    doc="Model-eval ranking quality: EXACT per-source AUC of the "
    "classifier logit against the weak teacher label, in basis "
    "points. Completes the eval triptych (confusion = thresholded "
    "accuracy, calibration = probability reliability, AUC = "
    "threshold-FREE ranking power — the number that says whether "
    "tuning the curation threshold can help at all). Computed as the "
    "Mann-Whitney rank-sum, but NOT via a per-document global rank: "
    "documents first collapse to the per-source distinct-logit "
    "histogram (one partial-agg shuffle; DECIMAL logits make the "
    "group keys exact), then a cumulative window over that tiny "
    "histogram yields 2U = sum(pos_g * (2*cum_neg_below + neg_g)) — "
    "tie-corrected (ties contribute half, hence the doubled-U "
    "integer form) and all-integer through the final floor division, "
    "so Spark and DuckDB hash-match bit-for-bit. At 100 TB the "
    "window runs over distinct logit values per source, not "
    "documents — the same reduce-then-window shape as the rollup "
    "family. Degenerate single-class sources emit NULL rather than "
    "a fake score.",
)
def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d, extra=("source",))
    g = s.groupBy("source", "logit_dec").agg(
        F.sum("weak_label").alias("n_pos_g"),
        F.sum(F.lit(1) - F.col("weak_label")).alias("n_neg_g"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("logit_dec")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "cum_neg_below", F.coalesce(F.sum("n_neg_g").over(w), F.lit(0))
    )
    n_pos, n_neg = F.sum("n_pos_g"), F.sum("n_neg_g")
    return c.groupBy("source").agg(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        F.when(
            (n_pos == 0) | (n_neg == 0), F.lit(None).cast("long")
        )
        .otherwise(
            F.expr(
                "(10000 * sum(n_pos_g * (2 * cum_neg_below + n_neg_g)))"
                " div (2 * sum(n_pos_g) * sum(n_neg_g))"
            )
        )
        .alias("auc_pct4"),
    )


@register(
    "classifier_bucket_collisions",
    oracle=f"""
    WITH {_ORACLE_FEAT}, grams AS (
      SELECT DISTINCT unnest(list_distinct(list_concat(t,
               list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])))) AS gram
      FROM labeled
    ), by_bucket AS (
      SELECT CAST(('0x' || substring(md5(gram), 1, 15))::UBIGINT
                  % {N_BUCKETS} AS BIGINT) AS bucket,
             COUNT(*) AS n_grams
      FROM grams GROUP BY 1
    )
    SELECT n_grams AS grams_per_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM by_bucket GROUP BY 1
    """,
    doc="Feature-HASHING collision audit (Weinberger et al. 2009, the "
    "hashing trick): how many distinct corpus n-grams land in each "
    "of the model's 2048 md5 buckets, reported as the collision "
    "histogram (grams-per-bucket -> bucket count). THE sizing signal "
    "for N_BUCKETS: a long tail of overloaded buckets means distinct "
    "(possibly opposing) n-grams share one weight and the model's "
    "per-feature log-odds are blurred — the capacity/cost dial every "
    "hashed-feature model tunes before trusting its weights. Scale "
    "shape: corpus grams collapse to the DISTINCT vocabulary "
    "in-engine (Heaps-law bounded, one dedup shuffle of short "
    "strings — never collected), then a 2048-group count and a "
    "histogram-of-counts rollup; output is at most a few dozen rows "
    "at any corpus size.",
)
def classifier_bucket_collisions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    lab = _labeled_toks(d)
    grams = (
        lab.select(
            F.explode(F.array_distinct(_gram_array())).alias("gram")
        )
        .distinct()
    )
    by_bucket = grams.groupBy(_bucket(F.col("gram")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return by_bucket.groupBy(
        F.col("n_grams").alias("grams_per_bucket")
    ).agg(F.count(F.lit(1)).alias("n_buckets"))


CORPUS_MAX_ID = 250  # same corpus/batch split as the dedup_incremental family

# The incremental-serving CTE chain (train on docs < CORPUS_MAX_ID,
# score the fresh batch against that persisted model) — shared by the
# quality_classifier_incremental oracle and the quality_model_drift
# rollup oracle.
_ORACLE_INCR = f"""{_ORACLE_FEAT}, ttotals AS (
      SELECT SUM(y) AS n_k, SUM(1 - y) AS n_d
      FROM labeled WHERE doc_id < {CORPUS_MAX_ID}
    ), tweights AS (
      SELECT bucket,
             ROUND(ln((SUM(y) + {ALPHA}) * 1.0 / (t.n_k + {2 * ALPHA}))
                   - ln((SUM(1 - y) + {ALPHA}) * 1.0 / (t.n_d + {2 * ALPHA})), 6)
               AS weight,
             ROUND(ln(1.0 - (SUM(y) + {ALPHA}) * 1.0 / (t.n_k + {2 * ALPHA}))
                   - ln(1.0 - (SUM(1 - y) + {ALPHA}) * 1.0
                        / (t.n_d + {2 * ALPHA})), 6)
               AS weight_absent
      FROM feat CROSS JOIN ttotals t
      WHERE feat.doc_id < {CORPUS_MAX_ID}
      GROUP BY bucket, t.n_k, t.n_d
    ), oov AS (
      SELECT CAST(ROUND(ln({ALPHA} * 1.0 / (n_k + {2 * ALPHA}))
                        - ln({ALPHA} * 1.0 / (n_d + {2 * ALPHA})), 6)
                  AS DECIMAL(18,6)) AS w
      FROM ttotals
    ), prior AS (
      SELECT CAST(ROUND(ln((n_k + {ALPHA}) * 1.0 / (n_d + {ALPHA})), 6)
                  AS DECIMAL(18,6)) AS p
      FROM ttotals
    ), absent_sum AS (
      SELECT SUM(CAST(weight_absent AS DECIMAL(18,6))) AS c FROM tweights
    ), bsums AS (
      SELECT f.doc_id,
             COUNT(*) AS n_features,
             SUM(CASE WHEN w.bucket IS NOT NULL THEN 1 ELSE 0 END)
               AS n_known,
             SUM(CASE WHEN w.bucket IS NOT NULL
                  THEN CAST(w.weight AS DECIMAL(18,6))
                       - CAST(w.weight_absent AS DECIMAL(18,6))
                  ELSE (SELECT w FROM oov) END) AS s
      FROM feat f LEFT JOIN tweights w ON f.bucket = w.bucket
      WHERE f.doc_id >= {CORPUS_MAX_ID}
      GROUP BY f.doc_id
    ), batch_scores AS (
      SELECT l.doc_id,
             COALESCE(b.n_features, 0) AS n_features,
             COALESCE(b.n_known, 0) AS n_known,
             COALESCE(b.s, 0) + (SELECT p FROM prior)
               + (SELECT c FROM absent_sum) AS logit_dec,
             l.y
      FROM labeled l LEFT JOIN bsums b ON l.doc_id = b.doc_id
      WHERE l.doc_id >= {CORPUS_MAX_ID}
    )
"""


@register(
    "quality_classifier_incremental",
    oracle=f"""
    WITH {_ORACLE_INCR}
    SELECT doc_id,
           CAST(n_features AS BIGINT) AS n_features,
           CAST(n_known AS BIGINT) AS n_known,
           CAST(logit_dec AS DOUBLE) AS logit,
           (logit_dec > 0) AS pred_keep,
           y AS weak_label
    FROM batch_scores
    """,
    doc="The PRODUCTION split of the quality classifier: the model "
    "trains ONLY on the existing corpus (docs < 250 — the same "
    "corpus/batch convention as dedup_incremental_*), and the fresh "
    "daily batch (docs >= 250) is scored against that persisted "
    "model — so scoring cost is proportional to the BATCH at any "
    "corpus size, and the weight table is exactly what a scheduler "
    "would write once and broadcast every day. This is also the "
    "query that exercises OUT-OF-VOCABULARY handling for real: "
    "batch n-grams absent from the training vocabulary take the "
    "Laplace-default presence log-odds (the `oov` term) instead of "
    "silently dropping, and n_known/n_features reports the vocab "
    "hit rate per doc — the drift signal that tells a pipeline the "
    "model needs retraining. Same exact-DECIMAL arithmetic as "
    "quality_classifier_scores; full DuckDB oracle.",
)
def quality_classifier_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    logit_dec = F.col("logit_dec")
    return _incremental_batch_scores(d).select(
        "doc_id",
        "n_features",
        "n_known",
        logit_dec.cast("double").alias("logit"),
        (logit_dec > 0).alias("pred_keep"),
        "weak_label",
    )


def _incremental_batch_scores(d: DataFrame, extra: tuple = ()) -> DataFrame:
    """(doc_id, *extra, n_features, n_known, logit_dec, weak_label)
    for the fresh batch (docs >= CORPUS_MAX_ID) scored against the
    model trained ONLY on the corpus (docs < CORPUS_MAX_ID) — the
    shared subplan behind quality_classifier_incremental (per-doc
    serving) and quality_model_drift (the per-source monitoring
    rollup, which passes extra=('source',) so the rollup never joins
    back on doc_id).

    r13: bucketed cache + join-free scoring — the previous tail (oov /
    prior / absent_sum / bsums / batch reassembly left-join) was
    expression-for-expression `apply_quality_model(batch, w, ttotals)`,
    so it now delegates to `_apply_model_fb` and inherits the one-pass
    md5 and the removed doc_id SortMergeJoin."""
    fb = _labeled_buckets(d, extra)
    train = fb.filter(F.col("doc_id") < CORPUS_MAX_ID)
    batch = fb.filter(F.col("doc_id") >= CORPUS_MAX_ID)
    # Same eager-tiny-tables shape as _scores_frame (see _train_model):
    # ttotals/w feed several concurrent broadcast subqueries.
    ttotals, w = _train_model(train)
    return _apply_model_fb(batch, w, ttotals, extra)


@register(
    "quality_model_drift",
    oracle=f"""
    WITH {_ORACLE_INCR}
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_features) AS BIGINT) AS total_features,
           CAST(SUM(b.n_known) AS BIGINT) AS total_known,
           CASE WHEN SUM(b.n_features) > 0
                THEN ROUND(SUM(b.n_known) * 1.0 / SUM(b.n_features), 6)
                ELSE 1.0 END AS vocab_hit_rate,
           CAST(SUM(CASE WHEN b.logit_dec > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_keep,
           CAST(SUM(b.logit_dec) AS DOUBLE) AS sum_logit
    FROM batch_scores b JOIN documents d ON d.doc_id = b.doc_id
    GROUP BY 1
    """,
    doc="The MONITORING rollup of the incremental serving path — the "
    "query a scheduler alerts on, per DEPLOY.md's retrain rule: for "
    "each source in the fresh daily batch, how many of its n-gram "
    "features the persisted model recognizes (vocab_hit_rate = "
    "total_known / total_features), how many docs the model would "
    "keep, and the exact-DECIMAL logit mass. A source whose hit rate "
    "drifts down is drifting away from the training vocabulary — "
    "retrain before the keep decisions go stale; a source whose "
    "n_pred_keep collapses flags an upstream content change. Shares "
    "the incremental query's whole subplan (train on corpus docs, "
    "broadcast the 2048-row model, score only the batch); source "
    "rides THROUGH the labeled scan into a tiny per-source rollup — "
    "no doc_id join back to documents, which at corpus scale would "
    "be a whole extra shuffle. At 100 TB the cost is the daily batch "
    "scan, nothing else. Full DuckDB oracle over the shared "
    "incremental CTE chain.",
)
def quality_model_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scores = _incremental_batch_scores(d, extra=("source",))
    hit = F.sum("n_known") * F.lit(1.0) / F.sum("n_features")
    return (
        scores.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_features").alias("total_features"),
            F.sum("n_known").alias("total_known"),
            F.when(F.sum("n_features") > 0, F.round(hit, 6))
            .otherwise(F.lit(1.0))
            .alias("vocab_hit_rate"),
            F.sum(F.when(F.col("logit_dec") > 0, 1).otherwise(0)).alias(
                "n_pred_keep"
            ),
            F.sum("logit_dec").cast("double").alias("sum_logit"),
        )
    )


@register(
    "quality_selection_per_source",
    oracle=f"""
    WITH {_ORACLE_MODEL}, src_hist AS (
      SELECT d.source, s.logit_dec, COUNT(*) AS c
      FROM scores s JOIN documents d ON d.doc_id = s.doc_id
      GROUP BY 1, 2
    ), cum AS (
      SELECT source, logit_dec, c,
             SUM(c) OVER (PARTITION BY source ORDER BY logit_dec DESC
                          ROWS UNBOUNDED PRECEDING) AS cum_c,
             SUM(c) OVER (PARTITION BY source) AS n
      FROM src_hist
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST((MAX(n) + 3) // 4 AS BIGINT) AS quota,
           CAST(MAX(CASE WHEN cum_c - c < (n + 3) // 4
                    THEN cum_c END) AS BIGINT) AS n_kept,
           CAST(MIN(CASE WHEN cum_c - c < (n + 3) // 4
                    THEN logit_dec END) AS DOUBLE) AS logit_cutoff
    FROM cum GROUP BY source
    """,
    doc="Per-source budgeted quality selection — the FineWeb-style "
    "per-domain threshold the classifier family's global pred_keep "
    "cannot express: ONE global logit cutoff lets a high-scoring "
    "domain crowd out every other source, so curation recipes keep "
    "the top X% WITHIN each source instead. Keeps the top ~25% of "
    "each source by model logit, admitting the whole tie-group at "
    "the boundary (n_kept >= quota = ceil(n/4); ceil via the "
    "add-denominator-minus-one identity — all integer, no float "
    "percent_rank to drift across engines). logit_cutoff is the "
    "per-source admission threshold a production pipeline would "
    "persist beside the weight table and apply at scan speed. Scale "
    "shape: the reduce-then-window rule, exactly as "
    "quality_classifier_auc — documents collapse to the per-source "
    "DISTINCT-LOGIT histogram first (one partial-agg shuffle; "
    "DECIMAL group keys are exact), then the cumulative window and "
    "the cutoff search run over that histogram, never a "
    "per-document rank. When logits are near-unique the histogram "
    "degenerates toward per-source doc counts; the documented "
    "production fallback at that point is approx_percentile on the "
    "logit (one pass, mergeable sketch) feeding the same "
    "threshold-application scan — the exact histogram path here IS "
    "the oracle for that approximation.",
)
def quality_selection_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d, extra=("source",))
    hist = s.groupBy("source", "logit_dec").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.desc("logit_dec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_src = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "logit_dec",
        "c",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_src).alias("n"),
    )
    kept_group = F.col("cum_c") - F.col("c") < F.expr("(n + 3) div 4")
    return cum.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.expr("(max(n) + 3) div 4").alias("quota"),
        F.max(F.when(kept_group, F.col("cum_c")))
        .cast("bigint")
        .alias("n_kept"),
        F.min(F.when(kept_group, F.col("logit_dec")))
        .cast("double")
        .alias("logit_cutoff"),
    )


@register(
    "quality_eval_report",
    oracle=f"""
    WITH {_ORACLE_MODEL}, sc AS (
      SELECT s.doc_id, s.y, s.logit_dec, d.source
      FROM scores s JOIN documents d ON d.doc_id = s.doc_id
    ), conf AS (
      SELECT 'confusion' AS section, source AS grp,
             CAST(SUM(CASE WHEN logit_dec > 0 AND y = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN logit_dec > 0 AND y = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN logit_dec <= 0 AND y = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN logit_dec <= 0 AND y = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
             CAST((10000 * SUM(CASE WHEN (logit_dec > 0) = (y = 1)
                               THEN 1 ELSE 0 END)) // COUNT(*)
                  AS BIGINT) AS metric_pct4
      FROM sc GROUP BY 2
    ), calib AS (
      SELECT 'calibration' AS section,
             CAST(CAST(FLOOR(logit_dec) AS BIGINT) AS VARCHAR) AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM(y) AS BIGINT) AS n_b,
             CAST(NULL AS BIGINT) AS n_c,
             CAST(NULL AS BIGINT) AS n_d,
             CAST((10000 * SUM(y)) // COUNT(*) AS BIGINT) AS metric_pct4
      FROM sc GROUP BY 2
    ), g AS (
      SELECT source, logit_dec,
             SUM(y) AS n_pos_g, SUM(1 - y) AS n_neg_g
      FROM sc GROUP BY 1, 2
    ), c AS (
      SELECT source, n_pos_g, n_neg_g,
             COALESCE(SUM(n_neg_g) OVER (
               PARTITION BY source ORDER BY logit_dec
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg_below
      FROM g
    ), auc AS (
      SELECT 'auc' AS section, source AS grp,
             CAST(SUM(n_pos_g) AS BIGINT) AS n_a,
             CAST(SUM(n_neg_g) AS BIGINT) AS n_b,
             CAST(NULL AS BIGINT) AS n_c,
             CAST(NULL AS BIGINT) AS n_d,
             CAST(CASE WHEN SUM(n_pos_g) = 0 OR SUM(n_neg_g) = 0
                  THEN NULL
                  ELSE (10000 * SUM(n_pos_g * (2 * cum_neg_below
                                               + n_neg_g)))
                       // (2 * SUM(n_pos_g) * SUM(n_neg_g)) END
                  AS BIGINT) AS metric_pct4
      FROM c GROUP BY 1, 2
    )
    SELECT * FROM conf
    UNION ALL SELECT * FROM calib
    UNION ALL SELECT * FROM auc
    """,
    doc="The FUSED production eval report: ONE train+score subplan "
    "feeding the confusion, calibration, and AUC rollups in a single "
    "Catalyst plan — the shape a scheduler actually runs nightly "
    "(score the corpus once, roll it up N ways), where the three "
    "standalone parents (quality_classifier_confusion/_calibration/"
    "_auc, which stay registered as the per-rollup oracles) each "
    "re-pay the full subplan when run alone. The scored frame is "
    "persisted (the in-sandbox stand-in for the scored TABLE a "
    "production pipeline materializes), so train+score executes "
    "exactly once and each rollup reads the cache — pinned by "
    "tests/test_plan_shapes.py::test_eval_report_single_train_subplan. "
    "Long format: section in ('confusion','calibration','auc'), grp "
    "= source (confusion/auc) or the unit logit bin (calibration); "
    "n_a..n_d = (tp,fp,fn,tn) / (n_docs,n_label_keep,-,-) / "
    "(n_pos,n_neg,-,-); metric_pct4 = exact basis-point accuracy / "
    "keep rate / tie-corrected AUC. All arithmetic identical to the "
    "parents: DECIMAL logits, integer counts, floor division — "
    "hash-matches the DuckDB oracle computing the same three "
    "rollups off one scores CTE. At 100 TB: one corpus scan + one "
    "doc-granularity score agg, then three tiny rollups (source / "
    "logit-bin / per-source histogram grain) over the materialized "
    "scores — the marginal cost of each extra rollup is its rollup, "
    "not a re-train.",
)
def quality_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d, extra=("source",)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pred = F.col("logit_dec") > 0
    label = F.col("weak_label") == 1
    null_l = F.lit(None).cast("long")

    conf = (
        s.groupBy("source")
        .agg(
            F.sum(F.when(pred & label, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(pred & ~label, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(~pred & label, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(~pred & ~label, 1).otherwise(0)).alias("n_d"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN (logit_dec > 0) = "
                "(weak_label = 1) THEN 1 ELSE 0 END)) div count(*) "
                "AS BIGINT)"
            ).alias("metric_pct4"),
        )
        .select(
            F.lit("confusion").alias("section"),
            F.col("source").alias("grp"),
            "n_a",
            "n_b",
            "n_c",
            "n_d",
            "metric_pct4",
        )
    )

    calib = (
        s.select(
            F.floor(F.col("logit_dec")).cast("long").alias("bin"),
            F.col("weak_label").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum("y").alias("n_b"),
            F.expr(
                "CAST((10000 * sum(y)) div count(*) AS BIGINT)"
            ).alias("metric_pct4"),
        )
        .select(
            F.lit("calibration").alias("section"),
            F.col("bin").cast("string").alias("grp"),
            "n_a",
            "n_b",
            null_l.alias("n_c"),
            null_l.alias("n_d"),
            "metric_pct4",
        )
    )

    g = s.groupBy("source", "logit_dec").agg(
        F.sum("weak_label").alias("n_pos_g"),
        F.sum(F.lit(1) - F.col("weak_label")).alias("n_neg_g"),
    )
    w_below = (
        Window.partitionBy("source")
        .orderBy("logit_dec")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "cum_neg_below", F.coalesce(F.sum("n_neg_g").over(w_below), F.lit(0))
    )
    n_pos, n_neg = F.sum("n_pos_g"), F.sum("n_neg_g")
    auc = (
        c.groupBy("source")
        .agg(
            n_pos.alias("n_a"),
            n_neg.alias("n_b"),
            F.when((n_pos == 0) | (n_neg == 0), F.lit(None).cast("long"))
            .otherwise(
                F.expr(
                    "(10000 * sum(n_pos_g * (2 * cum_neg_below "
                    "+ n_neg_g))) div (2 * sum(n_pos_g) "
                    "* sum(n_neg_g))"
                )
            )
            .alias("metric_pct4"),
        )
        .select(
            F.lit("auc").alias("section"),
            F.col("source").alias("grp"),
            "n_a",
            "n_b",
            null_l.alias("n_c"),
            null_l.alias("n_d"),
            "metric_pct4",
        )
    )
    return conf.unionByName(calib).unionByName(auc)


@register(
    "quality_selection_approx",
    oracle=None,
    # Exact twin for parity.py's APPROX_GUARANTEES checker (never
    # exported to the driver): per source, the exact logit values at
    # ranks bracketing the 0.75 quantile by the GK guarantee
    # (accuracy=10000 -> rank error <= n/10000, widened by one rank
    # each side for the floor/ceil convention gap between engines),
    # plus the EXACT kept counts at both bracket cutoffs — since
    # count(logit >= c) is monotone in c, Spark's n_kept must land
    # inside [n_kept_min, n_kept_max] whenever its cutoff is inside
    # [lo_cut, hi_cut]. n_docs/quota are exact and must bit-match.
    approx_oracle=f"""
    WITH {_ORACLE_MODEL}, sc AS (
      SELECT d.source, CAST(s.logit_dec AS DOUBLE) AS logit
      FROM scores s JOIN documents d ON d.doc_id = s.doc_id
    ), ranked AS (
      SELECT source, logit,
             row_number() OVER (PARTITION BY source ORDER BY logit)
               AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM sc
    ), bounds AS (
      SELECT source, MAX(n) AS n,
             MAX(CASE WHEN rk = GREATEST(1, CAST(
                   FLOOR(0.75 * n) - CEIL(0.0001 * n) - 1 AS BIGINT))
                 THEN logit END) AS lo_cut,
             MAX(CASE WHEN rk = LEAST(n, CAST(
                   CEIL(0.75 * n) + CEIL(0.0001 * n) + 1 AS BIGINT))
                 THEN logit END) AS hi_cut
      FROM ranked GROUP BY source
    )
    SELECT b.source,
           CAST(b.n AS BIGINT) AS n_docs,
           CAST((b.n + 3) // 4 AS BIGINT) AS quota,
           b.lo_cut, b.hi_cut,
           CAST(COUNT(*) FILTER (sc.logit >= b.hi_cut) AS BIGINT)
             AS n_kept_min,
           CAST(COUNT(*) FILTER (sc.logit >= b.lo_cut) AS BIGINT)
             AS n_kept_max
    FROM bounds b JOIN sc ON sc.source = b.source
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="The PRODUCTION path of per-source budgeted selection for "
    "near-unique-logit corpora — the documented fallback of "
    "quality_selection_per_source, now registered instead of prose: "
    "when logits rarely collide, the per-source DISTINCT-LOGIT "
    "histogram degenerates toward one row per document and the "
    "exact cumulative-window path loses its reduce-then-window "
    "advantage; this query replaces it with approx_percentile "
    "(percentile_approx, accuracy 10000 — a bounded-size mergeable "
    "Greenwald-Khanna sketch) computing each source's 75th-"
    "percentile logit cutoff in ONE partial-agg pass, then applies "
    "the cutoff via a broadcast join + filter at scan speed — no "
    "window, no per-document rank, no doc-granularity sort "
    "anywhere (pinned by tests/test_plan_shapes.py::"
    "test_selection_approx_no_window). The sketch result is "
    "engine-specific (DuckDB's t-digest differs from Spark's GK), "
    "so there is deliberately NO SQL oracle; correctness is pinned "
    "by pytest against the exact histogram path "
    "(quality_selection_per_source IS the oracle twin): identical "
    "source set, identical n_docs/quota, n_kept within the "
    "tie-group tolerance of the exact kept count, and a cutoff "
    "bounded by the exact path's admission threshold "
    "(tests/test_classifier.py::test_selection_approx_matches_exact"
    "_within_tolerance). Output schema matches the exact path "
    "column-for-column so a pipeline can swap implementations "
    "per-corpus. At 100 TB: sketch states are constant-size per "
    "(source, partition) and merge associatively — the selection "
    "cost is one corpus scan regardless of logit cardinality.",
)
def quality_selection_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = _scores_frame(d, extra=("source",)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sc = s.select(
        "source", F.col("logit_dec").cast("double").alias("logit")
    )
    cut = sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile_approx("logit", 0.75, 10000).alias("logit_cutoff"),
    )
    kept = (
        sc.join(F.broadcast(cut.select("source", "logit_cutoff")), "source")
        .filter(F.col("logit") >= F.col("logit_cutoff"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        cut.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("(n_docs + 3) div 4").alias("quota"),
            F.coalesce(F.col("n_kept"), F.lit(0))
            .cast("long")
            .alias("n_kept"),
            "logit_cutoff",
        )
    )
