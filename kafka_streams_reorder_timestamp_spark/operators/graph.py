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

from .dedup import _LSH64_MACHINERY, _audit_bucket_sql, dedup_jaccard_pairs
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

    Round-fusion note (measured, round 7): fusing k>1 neighbor-min
    steps per materialized round cuts the round count on
    higher-diameter graphs (exact-Jaccard edges at sf0.1: 4 rounds ->
    2 at k=3) but total edge-join work grows to ~diameter+k, which
    REGRESSES the low-diameter graphs that dominate real dedup
    workloads (LSH / SemDeDup components are near-cliques; their
    confirm round pays k edge joins instead of 1). k=1 won or tied on
    total wall time across all three registered CC queries, so it
    stays; the first-run codegen cost of the round plan is paid once
    per session and is warmed by bench.py's warm-up CC instead.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Materialize the pair plan BEFORE symmetrizing (r13): the two
    # union branches (forward + swapped) each embed the full pair-
    # generation subtree, and exchange reuse only dedupes up to its
    # last exchange — the candidate join / exact-verification work
    # above it executed TWICE in the old single checkpoint (measured:
    # the sym materialization cost ~2x the post-exchange pair work at
    # sf0.1). Checkpointing the directed pairs first makes the
    # symmetrized checkpoint a cheap scan of cached partitions.
    # Memory note (ADVICE r13): the directed blocks stay pinned
    # alongside sym's (~1.5x the edge list) until the builder's frames
    # are garbage-collected and the ContextCleaner reclaims them; edge
    # lists are id-only pairs, orders of magnitude below corpus size,
    # so the transient overlap is bounded by design, not by config.
    e = e.localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # Materialize the (small) edge list once: rounds must re-read one
    # flat table, not a union of two scans.
    sym = sym.localCheckpoint(eager=True)

    # Seed = identity init + the first neighbor-min FUSED into one agg:
    # label(v) = min(v, neighbors(v)). One shuffle and one checkpoint
    # replace the separate distinct-node init plus a full first round —
    # on the dominant real shape (small components, diameter 1-2) the
    # loop below then runs exactly one confirming round.
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.col("a")).alias("label"))
        .select(F.col("a").alias("id"), "label")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Neighbor-min: the smallest label among self and all neighbors.
        # The self branch is tagged (o=true) so the previous label rides
        # through the aggregation as min(when(o, label)) — each id has
        # exactly one self row — replacing the old-labels equi-join the
        # convergence flag used to pay per round (r13: one fewer
        # label-table shuffle+join every iteration).
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), labels["label"], F.lit(False).alias("o")
        )
        new = (
            labels.select("id", "label", F.lit(True).alias("o"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("o"), F.col("label"))).alias("old"),
            )
            # Materialize BEFORE the pointer-jump self-join (r14): the
            # join reads `new` on two different keys (label vs id), so
            # neither side can reuse the other's exchange and the whole
            # neighbor-min aggregation executed TWICE per round — the
            # r14 stage diag showed identical exchange-write stage
            # pairs (166KB each on dedup_clusters_sampled) in
            # concurrent broadcast futures. One eager checkpoint makes
            # both join sides scan cached label rows; at scale the agg
            # input is |edges|+|labels|, the dominant per-round cost.
            .localCheckpoint(eager=True)
        )
        # Pointer jump: label <- label(label). Labels are always node
        # ids, so every label resolves in the label table itself. The
        # changed flag rides along in the same materialization, so the
        # convergence probe below is a scan of cached rows, not a job
        # replaying the round.
        l2 = new.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        jumped = (
            new.join(l2, new["label"] == l2["pid"])
            .select(
                "id",
                F.col("plabel").alias("label"),
                (F.col("plabel") != F.col("old")).alias("chg"),
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
    "is still value-hash-checked per round. This exact-edge variant is "
    "the sf-bounded ORACLE TWIN — at corpus scale the default is "
    "dedup_clusters_lsh, whose candidate generation never goes "
    "quadratic in a hot block; the audit of THAT path at 100 TB is "
    "the sample_frac/id_bound knob on this builder "
    "(dedup_clusters_sampled registers the knob's production point).",
)
def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    sample_frac: float = 1.0,
    id_bound: int | None = None,
) -> DataFrame:
    """`sample_frac` / `id_bound` are the 100 TB audit knob (round 10,
    mirroring `lsh_recall_audit`): the exact pair generation and the
    components that follow run on a deterministic md5-bucket sample of
    the corpus — the induced subgraph — so the exact-clusters audit of
    `dedup_clusters_lsh` is a scan-bounded sample job, not the full
    quadratic block work. Defaults = full sf-bounded corpus."""
    pairs = dedup_jaccard_pairs(
        spark, sf_dir, sample_frac=sample_frac, id_bound=id_bound
    ).select("doc_a", "doc_b")
    return _clusters_from_pairs(pairs)


# DuckDB replay of the md5 doc-bucket — generated by the recall
# audit's _audit_bucket_sql so the bucket definition has one source
# of truth (cross-engine equality is property-pinned in
# tests/test_properties.py).
_DOC_BUCKET_HALF = _audit_bucket_sql("doc_id", 0.5)


@register(
    "dedup_clusters_sampled",
    # The SAMPLED exact-clusters audit — the production monitoring
    # shape for dedup_clusters_lsh (DEPLOY.md): truth universe =
    # deterministic md5-bucket half of the doc ids, exact blocked
    # Jaccard + connected components only on that induced subgraph.
    # Registered alongside the full twin so BOTH points of the
    # audit-cost/estimate-variance tradeoff are hash-checked, exactly
    # as round 10 did for the LSH recall audit.
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE text IS NOT NULL AND {_DOC_BUCKET_HALF}
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
    doc="The SAMPLED exact-clusters audit — the 100 TB monitoring "
    "shape for dedup_clusters_lsh (DEPLOY.md): exact blocked-Jaccard "
    "edges and min-id connected components over a deterministic "
    "md5-bucket HALF of the doc universe (the induced subgraph), so "
    "the exact twin's quadratic block work is bounded by the sample, "
    "and the scan filter is pushed down. The oracle replays the "
    "bucket (property-pinned cross-engine) plus the same recursive-"
    "CTE fixpoint as dedup_clusters. Sampling doc ids uniformly "
    "estimates the cluster-size distribution (a size-k cluster "
    "survives as its sampled sub-cluster); cross-checking sampled "
    "exact clusters against the sampled LSH pair set is the "
    "alert-on-divergence loop.",
)
def dedup_clusters_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_clusters(spark, sf_dir, sample_frac=0.5)


def _clusters_from_pairs(pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) edge pairs -> (doc_id, cluster_id, cluster_size,
    is_canonical) via connected components; cluster id = min doc_id =
    the canonical survivor."""
    labels = connected_components(pairs, "doc_a", "doc_b")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).cast("int").alias("is_canonical"),
    )


@register(
    "dedup_clusters_lsh",
    # Round 9: full DuckDB oracle — the md5-prefix LSH machinery
    # (shared fragment from dedup.py, 64 hashes / 8 bands over the
    # same planted corpus as dedup_minhash_lsh) produces the exact
    # candidate pairs the Spark plan generates; Jaccard >= 0.7
    # verification keeps the same edges; the recursive CTE computes
    # the identical min-id connected components as dedup_clusters'
    # oracle. An ITERATIVE probabilistic pipeline, value-hash-checked
    # end to end.
    oracle=f"""
    WITH RECURSIVE base AS (
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
    ), {_LSH64_MACHINERY},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandtab a JOIN bandtab b
        ON a.band = b.band AND a.fp = b.fp AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
            >= 0.7
    ), edges AS MATERIALIZED (
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
    doc="THE 100 TB duplicate-clustering path: connected components over "
    "MinHash+LSH candidate pairs instead of the blocked exact-Jaccard "
    "self-join. Candidate generation cost is banding (linear scans + "
    "bucket joins), never quadratic in a (lang, source) block — at "
    "corpus scale a hot block like (en, common-crawl) is a constant "
    "fraction of the corpus and the exact path's within-block self-join "
    "is O(block^2); LSH banding bounds fan-out by bucket size at any "
    "corpus size. Runs over the same planted corpus as dedup_minhash_lsh "
    "so the planted near-dups provably cluster; dedup_clusters (exact "
    "edges, recursive-CTE oracle) is the sf-bounded oracle twin.",
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _planted_corpus, minhash_lsh_pairs
    from ..sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # 64 hashes / 8 bands keeps r=8 — the SAME S-curve knee (1/8)^(1/8)
    # ≈ 0.77 family as the pair query's 128/16 — at half the signature
    # width and half the banding-explode rows. Catch probability for a
    # true j >= 0.9 pair is 1-(1-0.9^8)^8 ≈ 0.989 per pair (vs ≈0.9998
    # at 16 bands); the clustering recall floor (>= 0.95 same-cluster
    # pair recall vs exact edges) is pinned by
    # tests/test_graph.py::test_lsh_clusters_match_exact_clusters_on_planted_corpus.
    pairs = minhash_lsh_pairs(
        _planted_corpus(d), "text", "doc_id",
        num_hashes=64, bands=8, threshold=0.7,
    ).select("doc_a", "doc_b")
    return _clusters_from_pairs(pairs)


# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> DataFrame:
    """Power-iteration PageRank in EXACT integer arithmetic.

    `edges` must carry (src, dst, w, outw) — weighted edges plus the
    precomputed out-degree weight of each src; `nodes` one `node`
    column. Ranks live in `unit` micro-units; each round distributes
    ``(rank * w) div outw`` along every edge and renews
    ``(1-d)*unit + d * inflow`` with the damping applied as
    ``(damping_pct * inflow) div 100``. All operations are BIGINT
    sums/divisions — order-independent and bit-identical on any
    engine, which is what makes an ITERATIVE algorithm value-hash
    checkable (truncation error vs float PageRank is < 1e-6 per unit
    per round, irrelevant for ranking).

    Scale shape: the loop state is one (node, rank) table; each round
    is a join against the (static) edge table + one partial-agg
    shuffle on dst. The static side is persisted by the caller; on a
    billion-node graph each round's tables stay id-only (the
    connected_components pattern above, including localCheckpoint
    lineage truncation if rounds grow deep).
    """
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank"))
    base = F.lit((100 - damping_pct) * unit // 100).cast("long")
    for _ in range(iters):
        inflow = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("(rank * w) div outw").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            inflow, nodes["node"] == inflow["dst"], "left"
        ).select(
            "node",
            (
                base
                + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
            ).alias("rank"),
        )
    return ranks


def _pagerank_oracle(iters: int = 5) -> str:
    prev = "r0"
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT n.node,
             CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst, CAST(SUM((r.rank * e.w) // e.outw) AS BIGINT) AS s
        FROM edges2 e JOIN {prev} r ON r.node = e.src
        GROUP BY e.dst
      ) s ON s.dst = n.node
    )"""
        )
        prev = f"r{k}"
    return f"""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), edges AS (
      SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), deg AS (
      SELECT src AS dsrc, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY 1
    ), edges2 AS (
      SELECT src, dst, w, outw FROM edges JOIN deg ON dsrc = src
    ), nodes AS (
      SELECT DISTINCT event_type AS node FROM events
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
    ), {", ".join(rounds)}
    SELECT node, rank AS rank_micro FROM {prev}
    """


@register(
    "pagerank_event_transitions",
    oracle=_pagerank_oracle(),
    doc="PageRank (5 unrolled power iterations, damping 0.85) over the "
    "event-type transition graph: edges = consecutive-event pairs per "
    "user, weighted by transition count. Ranks are exact BIGINT "
    "micro-units — integer contribution division and damping make "
    "every round order-independent and bit-identical across engines, "
    "so the iterative result value-hash-matches a DuckDB unrolled-CTE "
    "oracle. The edge/degree table is built once and persisted "
    "(lazily); each round is one broadcast-sized join + one "
    "partial-agg shuffle over id-only rows.",
)
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(win).alias("prev_type")
    )
    edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    deg = edges.groupBy(F.col("src").alias("dsrc")).agg(F.sum("w").alias("outw"))
    edges2 = (
        edges.join(deg, edges["src"] == deg["dsrc"])
        .select("src", "dst", "w", "outw")
        # Static across all rounds: persist LAZILY so round 1's job
        # computes-and-caches the edge/degree tables inline (one events
        # pass, no extra jobs), and rounds 2-5 reuse the cached blocks.
        .persist()
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct().persist()
    ranks = pagerank_int(edges2, nodes, iters=5)
    out = ranks.select("node", F.col("rank").alias("rank_micro"))
    # Materialize the (tiny: one row per event type) result, then drop
    # the caches — a lazily-persisted subtree would leak CacheManager
    # blocks for the life of the session across bench/correctness
    # invocations. localCheckpoint blocks are ContextCleaner-reclaimed
    # once the returned DataFrame is garbage-collected.
    out = out.localCheckpoint(eager=True)
    edges2.unpersist()
    nodes.unpersist()
    return out


@register(
    "transition_graph_triangles",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), und AS (
      SELECT DISTINCT LEAST(prev_type, event_type) AS u,
             GREATEST(prev_type, event_type) AS v
      FROM seq
      WHERE prev_type IS NOT NULL AND prev_type <> event_type
    ), deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM und UNION ALL SELECT v FROM und
      ) GROUP BY n
    ), oriented AS (
      SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END
               AS lo,
             CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END
               AS hi
      FROM und e
      JOIN deg da ON da.n = e.u
      JOIN deg db ON db.n = e.v
    ), wedges AS (
      SELECT a.lo AS x, a.hi AS y, b.hi AS z
      FROM oriented a JOIN oriented b
        ON a.lo = b.lo AND a.hi < b.hi
    )
    SELECT w.x AS node_a, w.y AS node_b, w.z AS node_c
    FROM wedges w
    WHERE EXISTS (
      SELECT 1 FROM und e2
      WHERE e2.u = LEAST(w.y, w.z) AND e2.v = GREATEST(w.y, w.z)
    )
    """,
    doc="Triangle enumeration on the undirected event-transition "
    "graph — the degree-ordered orientation algorithm that makes "
    "triangle counting tractable at scale: orient every edge from "
    "its lower-(degree, id) endpoint to the higher one, build wedges "
    "only at each edge's LOW end (every node's oriented out-degree "
    "is O(sqrt(|E|)) on any graph — the classic arboricity bound, so "
    "the wedge join never explodes on a high-degree hub the way a "
    "naive open-wedge join does), then one semi-join against the "
    "edge set closes each wedge. Two joins + one semi-join over "
    "id-only edge rows; the transition edge list itself is one "
    "window pass + distinct. Triangle = a set of three event types "
    "that pairwise follow each other in some session — the "
    "navigational-loop signal. Output is each triangle once "
    "(lexicographic orientation tie-break keeps it deterministic).",
)
def transition_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(win).alias("prev_type")
    )
    und = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.least("prev_type", "event_type").alias("u"),
            F.greatest("prev_type", "event_type").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    a = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    b = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = a.join(b, "x").filter(F.col("y") < F.col("z"))
    closing = und.select(
        F.col("u").alias("cu"), F.col("v").alias("cv")
    )
    return (
        wedges.join(
            closing,
            (F.col("cu") == F.least("y", "z"))
            & (F.col("cv") == F.greatest("y", "z")),
            "left_semi",
        )
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("z").alias("node_c"),
        )
    )
