"""Iterative graph operators: connected components over near-duplicate
pairs, turning pairwise edges into duplicate CLUSTERS with a canonical
representative per cluster — the step between "found similar pairs" and
"kept one copy" in a corpus-dedup pipeline.

Design for 100 TB:
  - the iteration runs over the EDGE/LABEL tables only (ids, never
    text): the corpus is touched once to produce candidate pairs, and
    everything after is joins over long ids whose total size is the
    number of near-duplicate pairs, orders of magnitude below corpus
    size;
  - min-label propagation alone needs O(graph diameter) rounds — a
    pathological duplication chain (A~B~C~...) makes that linear. Each
    round here ALSO pointer-jumps (label <- label's label), the
    path-halving trick from union-find, giving O(log n) rounds on
    chains (see Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014, for the family of shuffle-based CC algorithms
    this belongs to);
  - every round materializes via localCheckpoint, truncating lineage so
    round k's plan does not replay rounds 1..k-1 (the classic iterative-
    Spark blowup), and the convergence check is a distributed count,
    never a collect of the labels.

Reference tie-in: the reference has no graph surface (SURVEY §2.2 —
extension mandated by the north star); the edge relation reuses
`dedup.dedup_jaccard_pairs` (reference-absent, corpus-dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_jaccard_pairs
from .registry import register


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Label every node of the undirected graph `edges` with the minimum
    node id reachable from it (= its connected component id).

    Returns a DataFrame (id, label). Each iteration is two shuffles
    (neighbor-min aggregation + pointer jump) over the label table;
    convergence is detected with a distributed changed-row probe. The
    pointer jump keeps rounds logarithmic in the longest path, so a
    50-round cap covers any graph smaller than 2^50 nodes.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # Materialize the (small) edge list once: the corpus-side plan that
    # produced the pairs must not re-execute every round.
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select("a")
        .distinct()
        .select(F.col("a").alias("id"), F.col("a").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Neighbor-min: the smallest label among self and all neighbors.
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), labels["label"]
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # Pointer jump: label <- label(label). Labels are always node
        # ids, so every label resolves in the label table itself. The
        # changed flag rides along in the same materialization, so the
        # convergence probe below is a scan of cached rows, not a job
        # replaying the round.
        l2 = new.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        jumped = (
            new.join(l2, new["label"] == l2["pid"])
            .select("id", F.col("plabel").alias("label"))
            .join(labels.select("id", F.col("label").alias("old")), "id")
            .select(
                "id", "label", (F.col("label") != F.col("old")).alias("chg")
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter("chg").limit(1).count()
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    return labels


@register(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE text IS NOT NULL
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.t, b.t))
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.8
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach(node, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
    ), labels AS (
      SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           CAST(doc_id = cluster_id AS INTEGER) AS is_canonical
    FROM labels
    """,
    doc="Near-duplicate CLUSTERS via connected components over the "
    "blocked-Jaccard pair graph: transitive closure turns pairs into "
    "groups (A~B, B~C clusters A,B,C even when A!~C), cluster id = min "
    "doc_id = the canonical survivor. Spark side iterates min-label "
    "propagation + pointer jumping over the id-only edge table "
    "(O(log n) rounds, lineage truncated per round); the oracle is the "
    "same fixpoint as a DuckDB recursive CTE, so an ITERATIVE algorithm "
    "is still value-hash-checked per round.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).cast("int").alias("is_canonical"),
    )
