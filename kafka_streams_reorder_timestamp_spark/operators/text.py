"""Text analysis over the `documents` table: token counting, quality
scoring, language ID, corpus stats.

Everything is ``pyspark.sql.functions`` — regex + arithmetic inside
whole-stage codegen; no Python in the row path. Each query has a DuckDB
oracle that mirrors the expression tree exactly (same regexes, same
integer→double division order), so results value-hash-match.

Scale notes (100 TB posture):
  - per-doc queries are embarrassingly parallel scans: no shuffle at
    all, pushdown prunes to the `text`/`n_chars` columns actually used;
  - the aggregates shuffle only partial aggregates of tiny group
    cardinality (languages × sources);
  - regex evaluation is per-row CPU, the classic corpus-scan shape —
    linear scaling with executors, no skew (docs are size-bounded).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table
from .registry import register

# Patterns shared verbatim between Spark (Java regex) and DuckDB (RE2):
# both support \b, \s, character classes, and alternation identically
# for these simple shapes.
WORD = "[A-Za-z0-9]+"
NON_ALNUM = "[^A-Za-z0-9]"
PUNCT = r"[^A-Za-z0-9\s]"

# Tiny per-language stopword inventories for the n-gram/stopword
# language-ID heuristic. Deliberately minimal and deterministic — the
# oracle mirrors them token for token.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "los", "que", "por"],
    "fr": ["le", "la", "les", "des", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
}


def _count_stop(col: Column, lang: str) -> Column:
    """Portable stopword count: explicit ASCII-token split + list
    membership, NOT ``\\b(w1|w2|...)\\b``.  Java's ``\\b`` is
    Unicode-aware — a combining mark or Arabic letter glued to an
    ASCII token suppresses the boundary — while RE2's (DuckDB) is
    ASCII-only, so the regex form diverges on adversarial unicode
    (round-13 sweep).  The split form pins the token definition to
    the same alnum class as WORD identically on both engines
    (oracle mirror: ``_stop_sql``).  Split + higher-order filter
    stay JVM-side; no Python in the hot path."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def _stop_sql(expr: str, lang: str) -> str:
    """DuckDB mirror of ``_count_stop`` for oracle SQL strings."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(lower({expr}), "
        f"'[^a-z0-9]+'), t -> t IN ({words})))"
    )


def _count_matches(col: Column, pattern: str) -> Column:
    # regexp_count (r13): same non-overlapping successive-match count
    # as size(regexp_extract_all(col, pattern, 0)) — both drive one
    # java.util.regex matcher over the string and NULL in → NULL out —
    # but without materializing the array of every matched substring,
    # which for the WORD pattern allocated one string per token of
    # every document purely to be counted (guide §1.2 per-task work).
    return F.regexp_count(col, F.lit(pattern))


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{WORD}')) AS n_tokens,
           length(regexp_replace(text, '{NON_ALNUM}', '', 'g')) AS n_alnum_chars,
           ROUND(length(regexp_replace(text, '{NON_ALNUM}', '', 'g'))
                 / len(regexp_extract_all(text, '{WORD}')), 4) AS avg_token_len,
           n_chars
    FROM documents
    WHERE text IS NOT NULL AND len(regexp_extract_all(text, '{WORD}')) > 0
    """,
    doc="Per-document token counting: regex word tokens, alnum mass, "
    "average token length. Pure scan, no shuffle.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tokens = _count_matches(F.col("text"), WORD)
    n_alnum = F.length(F.regexp_replace(F.col("text"), NON_ALNUM, ""))
    return (
        d.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_alnum.alias("n_alnum_chars"),
            F.round(n_alnum / n_tokens, 4).alias("avg_token_len"),
            "n_chars",
        )
        .filter(F.col("n_tokens") > 0)
    )


@register(
    "text_quality_flags",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{WORD}')) AS n_tokens,
             len(regexp_extract_all(text, '{PUNCT}')) AS n_punct,
             {_stop_sql('text', 'en')}
               AS n_stop,
             n_chars
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(n_punct / GREATEST(n_chars, 1), 4) AS punct_ratio,
           ROUND(n_stop / GREATEST(n_tokens, 1), 4) AS stop_ratio,
           CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                     AND n_punct / GREATEST(n_chars, 1) < 0.2
                THEN 'keep' ELSE 'drop' END AS quality
    FROM scored
    """,
    doc="Quality scoring: length / punctuation-ratio / stopword-ratio "
    "gates — the standard pretraining corpus filter shape.",
)
def text_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tokens = _count_matches(F.col("text"), WORD)
    n_punct = _count_matches(F.col("text"), PUNCT)
    n_stop = _count_stop(F.col("text"), "en")
    punct_ratio = n_punct / F.greatest(F.col("n_chars"), F.lit(1))
    scored = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stop_ratio"),
        F.when(
            (n_tokens >= 10) & (n_tokens <= 100_000) & (punct_ratio < 0.2),
            "keep",
        )
        .otherwise("drop")
        .alias("quality"),
    )
    return scored


@register(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             {_stop_sql('text', 'en')} AS s_en,
             {_stop_sql('text', 'es')} AS s_es,
             {_stop_sql('text', 'fr')} AS s_fr,
             {_stop_sql('text', 'de')} AS s_de
      FROM documents WHERE text IS NOT NULL
    ), pred AS (
      SELECT lang,
             CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                  WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                  WHEN s_fr >= s_de THEN 'fr'
                  ELSE 'de' END AS lang_pred
      FROM scored
    )
    SELECT lang, lang_pred, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, lang_pred
    """,
    doc="Stopword-count language ID (deterministic heuristic) → "
    "confusion counts vs the labeled lang column.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = {k: _count_stop(F.col("text"), k) for k in STOPWORDS}
    pred = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["de"] == 0),
            "unknown",
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    return (
        d.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_corpus_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{WORD}'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY lang, source
    """,
    doc="Corpus-level rollup per (lang, source): doc counts, token mass, "
    "size distribution. Map-side partial agg, tiny shuffle.",
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tokens = _count_matches(F.col("text"), WORD)
    return (
        d.select("lang", "source", n_tokens.alias("n_tokens"), "n_chars")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents WHERE text IS NOT NULL
    """,
    doc="Document fingerprinting: md5 of whitespace-normalized lowercase "
    "text — the exact-dedup key. md5 is the one hash both engines share.",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import normalize_text

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("fingerprint"))


# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset
# that Java regex (Spark) and RE2 (DuckDB) evaluate identically:
# contraction suffixes, space-prefixed letter runs, space-prefixed
# digit runs, space-prefixed punctuation runs, residual whitespace.
BPE_PAT = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
# the contraction apostrophe must be doubled inside a SQL string literal
_BPE_SQL = BPE_PAT.replace("'", "''")


@register(
    "text_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_pieces,
           len(list_filter(regexp_extract_all(text, '{_BPE_SQL}'),
                           p -> NOT regexp_matches(p, '^\\s+$'))) AS n_nonspace,
           ROUND(length(text)
                 / len(regexp_extract_all(text, '{_BPE_SQL}')), 4)
             AS chars_per_piece
    FROM documents
    WHERE text IS NOT NULL AND len(regexp_extract_all(text, '{_BPE_SQL}')) > 0
    """,
    doc="BPE-ish token counting: a GPT-2-style pre-tokenizer regex "
    "(contractions / letter runs / digit runs / punct runs, lookahead-"
    "free so Java regex and RE2 agree) counts subword pieces per "
    "document — the compression-ratio signal (chars per piece) used to "
    "budget LLM training tokens. Pure scan, no shuffle.",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_PAT), 0)
    n_pieces = F.size(pieces)
    n_nonspace = F.size(
        F.filter(pieces, lambda p: ~p.rlike(r"^\s+$"))
    )
    return (
        d.select(
            "doc_id",
            n_pieces.alias("n_pieces"),
            n_nonspace.alias("n_nonspace"),
            F.round(F.length("text") / n_pieces, 4).alias("chars_per_piece"),
        )
        .filter(F.col("n_pieces") > 0)
    )


# Modulus for the polynomial rolling hash: a prime below 2^57 so
# 31*acc + 255 stays under 2^63 in both engines' BIGINT arithmetic
# (Java long would wrap silently; DuckDB would raise — staying under
# the limit keeps the two bit-identical).
ROLL_MOD = 144115188075855859
ROLL_BASE = 31


@register(
    "text_rolling_fingerprints",
    oracle=f"""
    SELECT doc_id,
           -- empty normalized text hashes to 0 by convention on both
           -- engines (Spark ascii('') is 0 but DuckDB unicode('') is
           -- -1, so the reduce would fork on zero-length input)
           CASE WHEN length(norm) = 0 THEN CAST(0 AS BIGINT) ELSE
             list_reduce(
               list_prepend(
                 CAST(0 AS BIGINT),
                 list_transform(
                   regexp_split_to_array(norm, ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})
           END AS rolling_hash
    FROM (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents WHERE text IS NOT NULL
    )
    """,
    doc="Polynomial (Karp-Rabin) rolling-hash fingerprint of the "
    "normalized text, fully JVM-side via F.aggregate over the char "
    "array — the incremental-hash family behind shingle fingerprinting "
    "(functions/texthash.py computes the windowed variant in numpy). "
    "Identical modular arithmetic on both engines: base 31, prime "
    "modulus < 2^57 so no BIGINT overflow anywhere.",
)
def text_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import normalize_text

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    chars = F.split(normalize_text(F.col("text")), "")
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )
    return d.select("doc_id", rolling.alias("rolling_hash"))


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE text IS NOT NULL
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), total AS (
      SELECT COUNT(*) AS n FROM documents WHERE text IS NOT NULL
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln(CAST(total.n AS DOUBLE) / df.df), 9)
                        DESC, tf.term) AS rank
      FROM tf JOIN df USING (term) CROSS JOIN total
      WHERE tf.doc_id < 40
    )
    SELECT doc_id, term, tf, df, rank FROM scored WHERE rank <= 3
    """,
    doc="TF-IDF top-3 terms per document (demonstrated on docs 0-39; "
    "document frequencies computed over the FULL corpus): the keyword-"
    "extraction / relevance primitive. Two shuffles that both scale "
    "with the vocabulary, not the corpus: (doc,term) partial-count "
    "agg, then a term-keyed join of the (term, df) table — never a "
    "per-document loop. The rank emits only integer tf/df plus the "
    "ordering, so the cross-engine hash never compares raw doubles. "
    "ln() is a libm call with no cross-platform bit guarantee, so the "
    "ordering key is quantized to 9 decimals on BOTH engines before "
    "ROW_NUMBER — a 1-ulp ln() difference (~1e-16 relative) can then "
    "only flip the rank if the true score sits within ~1e-15 of a "
    "rounding boundary AND another (tf,df) pair rounds to the same "
    "key; real ties (equal tf and df) break on the term string. "
    "Empirically stable at every tested scale, not formally bit-exact.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.filter(F.col("doc_id") < 40)
        .join(df, "term")
        .crossJoin(F.broadcast(total))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.round(
            F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 9
        ).desc(),
        "term",
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


@register(
    "token_cooccurrence_top",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           t -> t <> ''))) AS term
      FROM documents WHERE text IS NOT NULL
    ), top AS (
      SELECT term, COUNT(*) AS df FROM tok GROUP BY 1
      ORDER BY df DESC, term LIMIT 20
    ), filtered AS (
      SELECT t.doc_id, t.term FROM tok t JOIN top USING (term)
    )
    SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_docs
    FROM filtered a JOIN filtered b
      ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2
    """,
    doc="Token co-occurrence matrix over the top-20 document-frequency "
    "terms: which vocabulary terms appear together in documents — the "
    "association/embedding-context primitive. The self-join is "
    "restricted to the broadcast-sized top-k vocabulary BEFORE pairing "
    "(per-doc fan-out bounded by 20*19/2, never |doc tokens|^2), so at "
    "100 TB the plan is: one distinct (doc,term) shuffle, a tiny "
    "ordered top-k, a broadcast semi-join, and one pair-count "
    "partial agg.",
)
def token_cooccurrence_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    ).distinct()
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(20)
        .select("term")
    )
    # Pairs come from a per-doc sorted term array (collect + in-array
    # combination explode), NOT a doc_id self-join: fan-out is bounded
    # by C(k,2) per document and `tok` has only TWO consumers (the
    # top-k count and this branch) whose shared distinct subtree is
    # identical, so the exchange is computed once and reused — no
    # persist needed, no third corpus pass.
    terms = (
        tok.join(F.broadcast(top), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("term")).alias("ts"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ts"),
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size(F.col("ts"))),
                lambda y: F.struct(
                    x.alias("term_a"), y.alias("term_b")
                ),
            ),
        )
    )
    return (
        terms.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.term_a").alias("term_a"),
            F.col("p.term_b").alias("term_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Heavy hitters: two-pass Misra-Gries candidates + exact recount


def misra_gries_candidates(
    df: DataFrame, text_col: str, capacity: int
) -> DataFrame:
    """Candidate heavy-hitter tokens via per-batch Misra-Gries summaries.

    Each Arrow batch keeps at most `capacity` counters (decrement-all
    when full — the classic MG step), so executor memory is O(capacity)
    REGARDLESS of vocabulary size; a hash aggregation would hold the
    batch's full vocabulary. Guarantee: any token with global frequency
    > total/capacity has batch-local frequency > batch_total/capacity
    in at least one batch (else the sum over batches contradicts the
    global bound), and MG with `capacity` counters always surfaces
    those — so the candidate set provably CONTAINS every global heavy
    hitter; an exact distributed recount of the (small) candidate set
    then removes false positives. Output: distinct candidate tokens.

    Tokenization happens JVM-side with the SAME `tokens()` expression
    the exact recount uses — the candidate pass and the recount see
    byte-identical tokens by construction. (A Python-side
    `str.split()` here would split on Unicode whitespace like \\xa0
    while the recount's engine rule is ASCII \\s+; a token containing
    such a char would fragment only in the candidate pass, and a
    genuine heavy hitter could miss the candidate set — silently
    breaking the provable-recall guarantee.)
    """
    import pandas as pd

    from ..functions.texthash import tokens

    toks_df = df.select(tokens(F.col(text_col)).alias("toks"))

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["toks"]:
                if toks is None:
                    continue
                for tok in toks:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        # decrement-all; drop zeros (one dict sweep)
                        counters = {
                            t: c - 1 for t, c in counters.items() if c > 1
                        }
        yield pd.DataFrame({"token": list(counters.keys())})

    return toks_df.mapInPandas(summarize, schema="token string").distinct()


@register(
    "heavy_hitter_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t <> '')) AS token
      FROM documents WHERE text IS NOT NULL
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           ROUND(COUNT(*) * 1.0 / MAX(tot.n), 6) AS frequency
    FROM tok, tot
    GROUP BY token
    HAVING COUNT(*) * 400 > MAX(tot.n)
    """,
    doc="EXACT heavy hitters with BOUNDED memory: tokens occurring in "
    "> 1/400 of all token occurrences. Pass 1 runs a per-batch "
    "Misra-Gries summary (mapInPandas, O(capacity) state per task — "
    "never the vocabulary, which at 100 TB exceeds executor memory "
    "for a plain hash agg before spilling) whose candidate set "
    "provably contains every global heavy hitter; pass 2 recounts "
    "ONLY the candidates exactly (explode + broadcast semi-join + "
    "one partial agg) and filters with the exact integer threshold "
    "count*400 > total. The approximate pass guarantees recall, the "
    "exact pass guarantees precision — so this two-pass sketch "
    "operator is fully value-hash-checkable against a brute-force "
    "DuckDB oracle, unlike a one-pass sketch. Total occurrences come "
    "from sum(size(tokens)) — no explode for the denominator.",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = tokens(F.col("text"))
    cand = misra_gries_candidates(d, "text", capacity=400)
    # denominator: one codegen scan, no explode
    total = d.agg(F.sum(F.size(tok)).alias("n"))
    counts = (
        d.select(F.explode(tok).alias("token"))
        .join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("n_occurrences") * 400 > F.col("n"))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") * 1.0 / F.col("n"), 6).alias(
                "frequency"
            ),
        )
    )


@register(
    "docs_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id, lang,
             list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               AS grams
      FROM toks WHERE len(t) >= 3
    ), per_doc AS (
      SELECT doc_id, lang,
             len(grams) AS n_grams,
             len(list_distinct(grams)) AS n_distinct
      FROM sh
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_distinct) AS BIGINT) AS total_distinct,
           ROUND(1.0 - CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_grams), 6)
             AS corpus_rep_ratio,
           ROUND(MAX(1.0 - CAST(n_distinct AS DOUBLE) / n_grams), 6)
             AS worst_doc_rep_ratio
    FROM per_doc GROUP BY lang
    """,
    doc="Intra-document repetition ratio (the Gopher-rules quality "
    "signal that catches boilerplate and degenerate generations): per "
    "doc, the fraction of 3-gram occurrences that are repeats "
    "(1 - distinct/total), rolled up per lang. The rollup sums the "
    "INTEGER counts and divides once, so the corpus ratio is exact "
    "integer arithmetic + one double division — order-independent and "
    "bit-identical on any engine (a per-doc double AVG would be "
    "sum-order-sensitive); the per-doc worst case survives as a MAX, "
    "which needs no order either. Shape: one narrow scan building "
    "shingles in-row (no explode — array_distinct/size inside the "
    "projection), one lang-grain partial agg. At 100 TB this is "
    "scan-speed work like every other per-doc signal.",
)
def docs_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select("doc_id", "lang", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    per_doc = toks.select(
        "lang",
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("n_distinct").alias("total_distinct"),
        F.round(
            F.lit(1.0)
            - F.sum("n_distinct").cast("double") / F.sum("n_grams"),
            6,
        ).alias("corpus_rep_ratio"),
        F.round(
            F.max(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_grams")
            ),
            6,
        ).alias("worst_doc_rep_ratio"),
    )


UNI_VOCAB_K = 20  # bounded LM vocabulary (corpus has 31 distinct tokens)


@register(
    "docs_unigram_logprob",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 6000000000,
             array_to_string(list_transform(range(0, 16),
               j -> 'rare' || CAST(doc_id AS VARCHAR) || '_'
                    || CAST(j AS VARCHAR)), ' ')
      FROM documents WHERE text IS NOT NULL AND doc_id < 5
    ), tok AS (
      SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t <> '')) AS tok
      FROM base
    ), tot AS (SELECT COUNT(*) AS n FROM tok),
    cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    vocab AS (
      SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT {UNI_VOCAB_K}
    ), scored AS (
      SELECT t.doc_id,
             ln(COALESCE(CAST(v.c AS DOUBLE), 0.5)
                / (SELECT n FROM tot)) AS lp
      FROM tok t LEFT JOIN vocab v USING (tok)
    )
    SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(lp), 6) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Unigram language-model quality score (the CCNet/KenLM-style "
    "perplexity filter, reduced to its scalable unigram core): train "
    f"token counts on the corpus itself, keep the top-{UNI_VOCAB_K} "
    "vocabulary (count desc, token asc — deterministic at the cut), "
    "and score every document by mean ln P(token), out-of-vocabulary "
    "tokens at an add-half floor 0.5/total. Low scores = rare-token "
    "soup (boilerplate, encoding noise); planted all-rare docs (ids "
    "+6e9) pin the OOV path and must land at exactly the floor, below "
    "every real document (pytest). Shape for 100 TB: the count pass "
    "is one token-keyed partial-agg shuffle (map-side combine absorbs "
    "Zipf skew); the vocabulary is top-K BY CONSTRUCTION, so the "
    "scoring join is a broadcast hash lookup — corpus tokens never "
    "shuffle on the skewed token key — and the per-doc agg's partial "
    "rows are ~one per doc per partition because exploded tokens stay "
    "doc-contiguous. TakeOrderedAndProject computes the top-K without "
    "a global sort.",
)
def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    planted = d.filter(F.col("doc_id") < 5).select(
        # text FIRST: the transform lambda must see the ORIGINAL
        # doc_id (lateral-column-alias resolution is backward-only).
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda j: F.concat(
                    F.lit("rare"),
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    j.cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
        (F.col("doc_id") + F.lit(6_000_000_000)).alias("doc_id"),
    )
    base = d.select("doc_id", "text").unionByName(planted)
    return unigram_doc_scores(base)


def unigram_doc_scores(base: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_tokens, avg_logprob) under the corpus-trained
    top-K unigram LM with add-half OOV floor. See docs_unigram_logprob
    for the shape rationale; avg_logprob is rounded to 6 dp so the
    value (and any ordering derived from it) is engine-stable."""
    from ..functions.texthash import tokens

    toks = base.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = cnt.orderBy(F.desc("c"), F.asc("tok")).limit(UNI_VOCAB_K)
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    lp = F.log(
        F.coalesce(F.col("c").cast("double"), F.lit(0.5)) / F.col("n")
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (iterative merge learning)

# Vocabulary-size ceiling for the driver-side BPE fast path — the same
# design as spark.sql.autoBroadcastJoinThreshold: a PROVABLY BOUNDED
# payload (counted in-engine first) may take the cheap local path; an
# unbounded one never does. At 100 TB of web text the distinct-"word"
# set is 1e8-1e9 rows (typos, URLs, code) and the distributed loop
# (bpe_learn_merges) runs instead; tests pin the two paths equal.
BPE_DRIVER_VOCAB_MAX = 65_536


def _bpe_driver_vocab_max() -> int:
    return int(
        os.environ.get(
            "SPARK_GRAFT_BPE_DRIVER_VOCAB_MAX", str(BPE_DRIVER_VOCAB_MAX)
        )
    )


# Round 10: the BPE merge loop became DuckDB-expressible by UNROLLING
# it — n_merges is a fixed 8, so "iterative" is really 8 chained CTE
# rounds of (pair-count -> deterministic argmax -> rewrite), the same
# move that cracked the LSH signature family in round 9. The rewrite
# is the only non-obvious step: each word's symbol list is encoded as
# a DOUBLE-space-separated string with leading/trailing double spaces
# ('  a  b  c  '), so the left-to-right non-overlapping BPE merge of
# pair (a, b) is exactly one replace(' a  b ' -> ' ab '): every match
# must start and end at a symbol boundary (killing substring false
# positives like pair (a,b) inside [a, bc]), the pattern consumes only
# ONE space of each outer double boundary so back-to-back occurrences
# ([a,b,a,b]) still both match — DuckDB's replace scans left-to-right
# and resumes after each match, which IS the BPE greedy rule. Argmax
# tie-break (count desc, pair asc) agrees across engines because both
# order strings by UTF-8 binary = code-point order. Verified bit-exact
# against bpe_merges_local before registration.


def _bpe_oracle_rounds(n_merges: int) -> str:
    """The n unrolled merge-round CTEs (p{r} pair counts, m{r} argmax,
    v{r} rewrite), chained from a `v0(word, wcount, ss)` CTE."""
    parts = []
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS (
      SELECT u.pr.a AS a, u.pr.b AS b, SUM(t.wcount)::BIGINT AS c
      FROM (SELECT wcount,
              list_filter(string_split(ss, ' '), x -> x <> '') AS s
            FROM v{r - 1}) t,
           unnest(list_transform(range(1, len(t.s)),
                  i -> struct_pack(a := t.s[i], b := t.s[i + 1]))) AS u(pr)
      GROUP BY 1, 2
    ), m{r} AS MATERIALIZED (
      SELECT {r} AS merge_rank, a, b, c FROM p{r}
      ORDER BY c DESC, a ASC, b ASC LIMIT 1
    ), v{r} AS MATERIALIZED (
      SELECT word, wcount,
             replace(ss,
                     ' ' || (SELECT a FROM m{r}) || '  '
                         || (SELECT b FROM m{r}) || ' ',
                     ' ' || (SELECT a FROM m{r})
                         || (SELECT b FROM m{r}) || ' ') AS ss
      FROM v{r - 1}
    )""")
    return ", ".join(parts)


# Initial vocabulary state shared by both BPE oracles: one row per
# distinct word with its corpus count and the double-space-separated
# character decomposition (regexp '.' = one code point, matching
# Python's list(word)).
_BPE_V0_SS = (
    "'  ' || array_to_string(regexp_extract_all(word, '.'), '  ') || '  '"
)


def bpe_learn_merges(
    words: "DataFrame", n_merges: int = 8, return_final: bool = False
):
    """Learn `n_merges` BPE merges from a (word, wcount) vocabulary
    table — the Sennrich et al. 2016 algorithm, distributed.

    Each round: adjacent symbol pairs explode IN-ROW weighted by word
    count (never a self-join), one partial-agg shuffle sums pair
    counts, the argmax pair (count desc, then lexicographic — total
    order, engine-stable) is a 1-row collect, and the symbol arrays
    are rewritten by a pure-codegen `F.aggregate` fold (left-to-right
    non-overlapping merge — see _merge_pair_expr) stacked LAZILY on
    the persisted base: round k's pair-count job evaluates k-1 folds
    inline, so the whole loop is ONE job per round with no Python
    workers, no per-round persist, and no per-round count()
    materialization (the earlier Arrow-rewrite version paid all
    three and ran ~4x slower). The vocabulary table is orders of
    magnitude smaller than the corpus (distinct words), so at 100 TB
    the corpus is touched ONCE (word counting); every merge round
    runs on the vocab table alone — which is why tokenizer training
    is cheap even when the corpus is not. No end-of-word marker
    (documented divergence from the paper's '</w>'; the merge
    dynamics are identical within words).

    With ``return_final=True`` returns ``(merges, final)`` where
    `final` is the persisted (word, wcount, syms) frame AFTER the last
    merge — i.e. the fully BPE-tokenized vocabulary. Training already
    pays for every rewrite, so tokenizing the vocab is free: the
    application path (bpe_tokenize_corpus) reads token counts straight
    off this frame instead of re-running the merge loop per word. The
    caller owns unpersisting `final` (or clearCache).
    """
    from pyspark import StorageLevel

    cur = words.select(
        "word", "wcount", F.split(F.col("word"), "").alias("syms")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prev = None  # cur's parent: unpersist only after cur materializes
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = F.transform(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            lambda x, i: F.struct(
                x.alias("a"),
                F.element_at(F.col("syms"), i + 2).alias("b"),
            ),
        )
        # This job materializes cur's (lazy) persist — a single fold
        # over its persisted parent — so no separate count() job per
        # round is needed; only then is the parent safe to drop.
        best = (
            cur.filter(F.size("syms") >= 2)
            .select("wcount", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wcount").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((rank, a, b, c))
        nxt = cur.select(
            "word", "wcount", _merge_pair_expr(F.col("syms"), a, b).alias("syms")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        prev, cur = cur, nxt
    if return_final:
        if prev is not None:
            cur.count()  # materialize the last rewrite off its parent
            prev.unpersist()
        return merges, cur
    cur.unpersist()
    if prev is not None:
        prev.unpersist()
    return merges


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of the symbol pair (a, b) as
    a pure Column fold — the BPE rewrite rule (greedy: after merging
    positions i, i+1 the scan resumes at i+2) without any Python UDF.

    State is (out-array, merged-last flag); the flag is what encodes
    non-overlap: [a, a, a] under merge (a, a) yields [aa, a], never
    [aa, aa]-style double consumption. CASE WHEN branches evaluate
    lazily per row, so the slice on out-1 never sees a negative length
    (the branch requires size > 0)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("o"),
            F.lit(False).alias("m"),
        ),
        lambda acc, x: F.when(
            (~acc["m"])
            & (F.size(acc["o"]) > 0)
            & (F.element_at(acc["o"], -1) == la)
            & (x == lb),
            F.struct(
                F.concat(
                    F.slice(acc["o"], 1, F.size(acc["o"]) - 1), F.array(lab)
                ).alias("o"),
                F.lit(True).alias("m"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["o"], F.array(x)).alias("o"),
                F.lit(False).alias("m"),
            )
        ),
        lambda acc: acc["o"],
    )


@register(
    "bpe_train_merges",
    # Round 10: the former no_oracle ("iterative loop is not
    # SQL-expressible") fell to unrolling — 8 fixed merge rounds as 8
    # chained CTE triples; see _bpe_oracle_rounds. The pytest pin
    # against the pure-Python reference BPE stays as a second witness.
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'),
                    w -> w <> '')) AS word
      FROM documents WHERE text IS NOT NULL
    ), v0 AS MATERIALIZED (
      SELECT word, COUNT(*)::BIGINT AS wcount, {_BPE_V0_SS} AS ss
      FROM toks GROUP BY word
    ), {_bpe_oracle_rounds(8)}
    SELECT merge_rank::INTEGER AS merge_rank, a AS "left", b AS "right",
           c::BIGINT AS pair_count
    FROM ({' UNION ALL '.join(f'SELECT * FROM m{r}' for r in range(1, 9))})
    """,
    doc="BPE tokenizer training: the first 8 merges learned from the "
    "corpus word-frequency table (Sennrich et al. 2016), with "
    "deterministic argmax tie-breaking (count desc, pair asc). The "
    "corpus is scanned ONCE (distributed word counting — the only "
    "part proportional to corpus size); the merge loop then runs on "
    "the AGGREGATED vocabulary, which Heaps' law bounds far below "
    "corpus size, collected to the driver (the tokenizers-library "
    "shape). bpe_learn_merges is the fully-distributed loop for a "
    "vocabulary too large to collect — per round: in-row pair "
    "explode, one pair-count shuffle, 1-row argmax collect, Arrow "
    "rewrite; pytest pins both paths merge-for-merge equal. "
    "Complements text_bpe_token_counts (which APPLIES a fixed regex "
    "segmentation; this LEARNS the merge table).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.texthash import tokens

    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # count + collect/learn read it
    )
    # Same bounded-driver-path guard as bpe_tokenize_corpus: the
    # limit(cap+1) probe bounds the driver payload by construction;
    # only a provably-bounded vocabulary is used locally, an unbounded
    # one learns distributed.
    cap = _bpe_driver_vocab_max()
    head = words.limit(cap + 1).collect()
    if len(head) <= cap:
        wc = {r["word"]: int(r["wcount"]) for r in head}
        merges = bpe_merges_local(wc, n_merges=8)
    else:
        merges = bpe_learn_merges(words, n_merges=8)
    return d.sparkSession.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


def bpe_apply_merges_local(
    word: str, merges: list[tuple[int, str, str, int]]
) -> list[str]:
    """Tokenize one word with a learned merge table: apply each merge
    in rank order, left-to-right non-overlapping — the standard BPE
    application rule, matching the training rewrite exactly."""
    syms = list(word)
    for _rank, a, b, _c in merges:
        s, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                s.append(a + b)
                i += 2
            else:
                s.append(syms[i])
                i += 1
        syms = s
    return syms


@register(
    "bpe_tokenize_corpus",
    # Round 10: oracled by the same unrolled-merge machinery as
    # bpe_train_merges — after round 8's rewrite, each word's BPE
    # token count is simply the length of its v8 symbol list, and the
    # per-source totals are one join + rollup. The pytest pin against
    # the pure-Python per-document tokenizer stays as a second witness.
    oracle=f"""
    WITH src_toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'),
                    w -> w <> '')) AS word
      FROM documents WHERE text IS NOT NULL
    ), src_wc AS MATERIALIZED (
      SELECT source, word, COUNT(*)::BIGINT AS wcount
      FROM src_toks GROUP BY 1, 2
    ), v0 AS MATERIALIZED (
      SELECT word, SUM(wcount)::BIGINT AS wcount, {_BPE_V0_SS} AS ss
      FROM src_wc GROUP BY word
    ), {_bpe_oracle_rounds(8)},
    vocab AS (
      SELECT word,
             len(list_filter(string_split(ss, ' '), x -> x <> '')) AS n_bpe
      FROM v8
    ), per_doc AS (
      SELECT source, COUNT(*)::BIGINT AS n_docs
      FROM documents WHERE text IS NOT NULL GROUP BY source
    ), word_totals AS (
      SELECT sw.source,
             SUM(sw.wcount)::BIGINT AS total_words,
             SUM(sw.wcount * COALESCE(v.n_bpe, length(sw.word)))::BIGINT
               AS total_bpe_tokens
      FROM src_wc sw LEFT JOIN vocab v USING (word)
      GROUP BY sw.source
    )
    SELECT d.source, d.n_docs,
           COALESCE(t.total_words, 0)::BIGINT AS total_words,
           COALESCE(t.total_bpe_tokens, 0)::BIGINT AS total_bpe_tokens
    FROM per_doc d LEFT JOIN word_totals t USING (source)
    """,
    doc="The PRODUCTION step bpe_train_merges feeds: tokenize the "
    "whole corpus with the LEARNED merge table and account BPE "
    "tokens per source — the number a training-budget planner "
    "actually consumes (tokens per shard/source, compression vs raw "
    "words). Shape: the corpus is scanned once into (source, word) "
    "counts (one partial-agg shuffle, persisted); the global "
    "vocabulary folds out of that same aggregate and is COUNTED "
    "in-engine before anything moves to the driver: a vocab within "
    "the 64Ki ceiling (the broadcast-threshold design) is learned "
    "and tokenized locally as a provably bounded payload, while an "
    "unbounded vocab — 1e8-1e9 distinct 'words' at 100 TB of web "
    "text, a driver OOM as a collect — takes the FULLY DISTRIBUTED "
    "loop (bpe_learn_merges: per round one pair-count shuffle over "
    "the vocab + a 1-row argmax collect + a codegen fold rewrite), "
    "whose final rewrite pass IS the tokenized vocab; the two paths "
    "are pytest-pinned equal. Either way a (word -> token_count) "
    "table joins back into the per-source aggregation on `word` "
    "(AQE broadcasts it while it fits, shuffles it when it "
    "doesn't). This "
    "beats an Arrow-batched per-document merge loop at any corpus "
    "size: a per-doc loop re-applies every merge to every occurrence "
    "of 'the', while the vocab join pays each distinct word once — "
    "the same Heaps' bound that makes training cheap makes "
    "application cheap. Out-of-vocabulary words (possible when the "
    "merge table is trained elsewhere) degrade to character count "
    "via the left-join coalesce, never to dropped rows.",
)
def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    exploded = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    )
    # One shuffle: (source, word) counts. The global vocabulary for
    # training folds out of the same aggregate, so the corpus text is
    # scanned exactly once; persisted because both the merge-learning
    # loop (via the word rollup) and the final per-source totals read
    # it.
    src_wc = exploded.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("wcount")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    words = src_wc.groupBy("word").agg(F.sum("wcount").alias("wcount"))
    # Bounded-by-construction probe: limit(cap+1) caps the driver
    # payload no matter how large the vocabulary is; iff the probe
    # comes back within the ceiling it IS the whole vocabulary.
    cap = _bpe_driver_vocab_max()
    head = words.limit(cap + 1).collect()
    if len(head) <= cap:
        # Bounded fast path: vocab fits the ceiling, so driver-side
        # learning + per-distinct-word tokenization is a constant-size
        # payload — never the corpus, never an unbounded vocab.
        wc = {r["word"]: int(r["wcount"]) for r in head}
        merges = bpe_merges_local(wc, n_merges=8)
        # A bounded driver-local vocab always broadcasts (it already
        # fits the same ceiling a broadcast would need).
        vocab = F.broadcast(
            spark.createDataFrame(
                [
                    (w, len(bpe_apply_merges_local(w, merges)))
                    for w in sorted(wc)
                ],
                "word string, n_bpe int",
            )
        )
    else:
        # Unbounded vocab: fully-distributed merge learning; its final
        # rewrite frame IS the BPE-tokenized vocabulary — token counts
        # fall out as size(syms). Pinned equal to the fast path by
        # tests/test_llm_pipeline.py.
        _merges, tokenized = bpe_learn_merges(
            words, n_merges=8, return_final=True
        )
        vocab = tokenized.select(
            "word", F.size("syms").cast("int").alias("n_bpe")
        )
    per_doc = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    word_totals = (
        src_wc.join(vocab, "word", "left")
        .groupBy("source")
        .agg(
            F.sum("wcount").alias("total_words"),
            F.sum(
                F.col("wcount")
                * F.coalesce(F.col("n_bpe"), F.length("word"))
            ).alias("total_bpe_tokens"),
        )
    )
    # per_doc is the LEFT side: a source whose docs all tokenize to
    # zero words has no (source, word) rows, and an inner join would
    # silently drop its n_docs from the accounting instead of
    # reporting (n_docs, 0, 0).
    return per_doc.join(word_totals, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("total_words"), F.lit(0)).alias("total_words"),
        F.coalesce(F.col("total_bpe_tokens"), F.lit(0)).alias(
            "total_bpe_tokens"
        ),
    )


def bpe_merges_local(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side BPE merge learning over an aggregated vocabulary —
    identical semantics to bpe_learn_merges (argmax by count desc then
    pair asc; left-to-right non-overlapping rewrite)."""
    vocab = {w: list(w) for w in word_counts}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, int(c)))
        for w, syms in vocab.items():
            s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    s.append(a + b)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            vocab[w] = s
    return merges


@register(
    "docs_gopher_rules",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{WORD}')) AS n_words,
             length(regexp_replace(text, '{NON_ALNUM}', '', 'g'))
               AS n_alnum,
             len(regexp_extract_all(text, '{PUNCT}')) AS n_symbols,
             n_chars,
             {_stop_sql('text', 'en')} AS n_stop
      FROM documents WHERE text IS NOT NULL
    ), rules AS (
      SELECT doc_id, lang, n_words,
             (n_words >= 5 AND n_words <= 100000) AS ok_word_count,
             (n_words > 0 AND
              n_alnum * 1.0 / GREATEST(n_words, 1) >= 3 AND
              n_alnum * 1.0 / GREATEST(n_words, 1) <= 12) AS ok_mean_word_len,
             (n_symbols * 1.0 / GREATEST(n_chars, 1) <= 0.1)
               AS ok_symbol_ratio,
             (n_alnum * 1.0 / GREATEST(n_chars, 1) >= 0.6)
               AS ok_alpha_ratio,
             (n_stop >= 2) AS ok_stopwords
      FROM scored
    )
    SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words,
           ok_word_count, ok_mean_word_len, ok_symbol_ratio,
           ok_alpha_ratio, ok_stopwords,
           (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
            AND ok_alpha_ratio AND ok_stopwords) AS keep
    FROM rules
    """,
    doc="Gopher-style quality rule panel (Rae et al. 2021, Table A1, "
    "adapted to this corpus's scale): per document, the five classic "
    "gates — word count in range, mean word length in range, symbol-"
    "to-char ratio, alphanumeric-char ratio, minimum stopword "
    "evidence — each reported SEPARATELY plus the conjunctive keep "
    "flag, because a curation pipeline tunes rules by watching "
    "per-rule kill rates, not just the final verdict "
    "(dedup_rate_by_source is the same idea for dedup). All regex + "
    "integer arithmetic inside whole-stage codegen; a pure scan with "
    "no shuffle at any corpus size. Extends text_quality_flags "
    "(which keeps the compact 3-gate form for the pipeline "
    "composition).",
)
def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_words = _count_matches(F.col("text"), WORD)
    n_alnum = F.length(F.regexp_replace(F.col("text"), NON_ALNUM, ""))
    n_symbols = _count_matches(F.col("text"), PUNCT)
    n_stop = _count_stop(F.col("text"), "en")
    # greatest(..., 1) guards the division: ANSI mode evaluates the
    # projection eagerly, so a doc with zero word matches would raise
    # DIVIDE_BY_ZERO despite the ok_mwl (n_words > 0) conjunct.
    # Semantics unchanged: n_alnum is 0 whenever n_words is.
    mean_wl = n_alnum * F.lit(1.0) / F.greatest(n_words, F.lit(1))
    ok_wc = (n_words >= 5) & (n_words <= 100_000)
    ok_mwl = (n_words > 0) & (mean_wl >= 3) & (mean_wl <= 12)
    ok_sym = n_symbols * F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1)) <= 0.1
    ok_alpha = (
        n_alnum * F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1)) >= 0.6
    )
    ok_stop = n_stop >= 2
    return d.select(
        "doc_id",
        "lang",
        n_words.cast("long").alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_ratio"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


# BM25 parameters + a fixed 3-term query (terms exist in the corpus
# vocabulary; scoring is deterministic given the corpus).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "shuffle", "join")


@register(
    "docs_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS f
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      WHERE tok IN ('spark', 'shuffle', 'join')
      GROUP BY 1, 2
    ), df AS (
      SELECT tok, COUNT(*) AS d FROM tf GROUP BY 1
    ), dl AS (
      SELECT doc_id, len(t) AS dl FROM toks
    ), scored AS (
      SELECT tf.doc_id,
             SUM(
               ln(1 + (s.n_docs - df.d + 0.5) / (df.d + 0.5))
               * (tf.f * ({BM25_K1} + 1))
               / (tf.f + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl))
             ) AS score
      FROM tf
      JOIN df USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20
    """,
    doc="BM25 full-text ranking (Robertson/Sparck-Jones Okapi "
    "weighting, k1=1.2 b=0.75) of all documents against a fixed "
    "3-term query — the sparse-retrieval half of a RAG stack, "
    "complementing the dense side (knn_topk_cosine/ANN family). "
    "Shape for 100 TB: term frequencies explode ONLY the query "
    "terms (the IN filter runs before the grouping, so the shuffle "
    "carries |query| x matching docs, not the corpus token stream); "
    "document frequencies and corpus stats are 1-row/3-row "
    "broadcasts; TakeOrderedAndProject picks the top 20 on the "
    "ROUNDED score (6 dp) with doc_id tie-break so selection is "
    "engine-stable. In production the tf table is the posting list "
    "a search index materializes — this query IS the scorer that "
    "runs over it.",
)
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25 rounded 6dp) for every doc matching BM25_QUERY —
    the scorer behind docs_bm25_search and the sparse leg of
    hybrid_rrf_search."""
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("t")).alias("avgdl"),
    )
    dl = toks.select("doc_id", F.size("t").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("d"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("d") + 0.5) / (F.col("d") + 0.5)
    )
    denom = F.col("f") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * (F.col("f") * (BM25_K1 + 1)) / denom
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    return scored.select("doc_id", F.round("score", 6).alias("bm25"))


@register(
    "docs_zipf_fit",
    oracle="""
    WITH cnt AS (
      SELECT tok, COUNT(*) AS c
      FROM (
        SELECT unnest(list_filter(
          regexp_split_to_array(trim(lower(text)), '\\s+'),
          t -> t <> '')) AS tok
        FROM documents WHERE text IS NOT NULL
      ) GROUP BY tok
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM cnt
    ), logs AS (
      SELECT CAST(ROUND(ln(r), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(ln(c), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ), sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM logs
    )
    SELECT CAST(n AS BIGINT) AS vocab_size,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS zipf_slope
    FROM sums
    """,
    doc="Zipf-law fit of the corpus token distribution: OLS slope of "
    "ln(frequency) on ln(rank) — natural language sits near -1, and "
    "a corpus that drifts far from it (template spam, encoding "
    "noise, synthetic filler) flags itself in one number. Engine-"
    "stable float discipline, twice: each ln() rounds to 6 dp "
    "per-row BEFORE summation (libm implementations may differ in "
    "the last ulp between the JVM and DuckDB) and the rounded terms "
    "sum in exact DECIMAL, so only the final slope arithmetic runs "
    "in doubles over identical sums. Shape: one token-count shuffle "
    "(map-side combine absorbs Zipf skew — the thing being "
    "measured), frequency ranking over the VOCABULARY (Heaps-"
    "bounded, not the token stream), and the regression collapses "
    "to one sufficient-statistics row (brand_discount_elasticity's "
    "pattern).",
)
def docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rank import global_row_number
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cnt = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Vocabulary is Heaps-bounded but still ~1e8 rows on a web-scale
    # corpus — rank through the distributed value-bucket machinery,
    # never a bare global window.
    ranked = global_row_number(
        cnt.withColumn("cd", F.col("c").cast("double")),
        "cd",
        [F.desc("cd"), F.asc("tok")],
        out_col="r",
        descending=True,
    )
    logs = ranked.select(
        F.round(F.log("r"), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log("c"), 6).cast("decimal(18,6)").alias("y"),
    )
    sums = logs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    return sums.select(
        n.cast("long").alias("vocab_size"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )
