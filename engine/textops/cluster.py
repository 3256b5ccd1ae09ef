"""Near-duplicate cluster resolution: connected components + keeper policy.

The LSH/Jaccard stage (engine.textops.sqlgen.near_dup_pairs_sql) emits
verified PAIRS; a production dedup pipeline must answer "which docs do I
drop", i.e. resolve pairs into clusters and pick one keeper per cluster.

Spark side: iterative hash-min label propagation at DataFrame level —
every node starts labeled with its own id; each round every node takes the
min label over itself and its neighbors; fixpoint = connected components
with cluster_id = min doc_id in the component. Rounds needed = graph
diameter (near-dup clusters are shallow — a doc and its rewrites — so a
handful); each round is one equi-join + one map-side-partial min
aggregate, both hash-partitioned on doc_id, nothing driver-sized. The
per-round convergence probe aggregates a single monotone checksum
(sum of labels: strictly decreasing until fixpoint), so the driver action
moves O(1) bytes. At 10^12 docs the same loop runs with the pair table
disk-backed. For DEEP components (chained near-dups) where diameter-many
rounds would hurt, connected_components_star implements the classic
alternating large-star/small-star contraction (O(log^2 n) rounds, same
output contract).

Keeper policy: keep the smallest doc_id per cluster (is_keeper), the
deterministic stand-in for "keep the oldest / highest-quality copy".

Oracle: DuckDB WITH RECURSIVE transitive closure over the same pair set,
labeling each node with the min reachable id — exact, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sqlgen import docs_aug_cte, near_dup_pairs_sql


def _free_local_checkpoint(df: DataFrame) -> None:
    """Proactively drop a SUPERSEDED localCheckpoint's executor blocks.

    ``DataFrame.unpersist()`` only touches cache-manager entries, never the
    checkpoint RDD's MEMORY_AND_DISK blocks, so an iterative loop that
    checkpoints per round grows block-manager storage linearly until the
    ContextCleaner happens to GC the old plans. The checkpointed DataFrame's
    LogicalRDD plan node holds the backing RDD directly; unpersisting THAT
    frees exactly this DataFrame's blocks (verified against
    getRDDStorageInfo — sibling checkpoints stay intact). DESTRUCTIVE:
    recompute is impossible afterwards, so only call once nothing will read
    the DataFrame again. Best-effort: silently a no-op on backends without
    py4j plan access (e.g. Spark Connect)."""
    try:
        df._jdf.logicalPlan().rdd().unpersist(False)
    except Exception:
        pass


def _hash_min_labels(
    nodes: DataFrame, pairs: DataFrame, max_iters: int, keep_pairs: bool = False
) -> tuple[DataFrame, bool, DataFrame | None]:
    """Hash-min label propagation core: returns ``(labels, converged,
    pairs_ck)`` where labels = (doc_id, label) with label = min doc_id
    reachable IF converged; un-converged labels are partial and must not
    be used. With ``keep_pairs=True`` the materialized pair-table
    checkpoint is returned instead of freed, so a caller that must fall
    back to another algorithm (resolve_components' deep-graph path) can
    reuse it rather than recompute the entire upstream pair pipeline
    (LSH + Jaccard verify — the dominant cost); the caller then owns
    freeing it via _free_local_checkpoint."""
    # Checkpoint the PAIR TABLE first, then build edges from the checkpoint:
    # 1. the two union branches otherwise each recompute the full upstream
    #    pair pipeline (LSH + Jaccard verify) — Spark does not dedup common
    #    subplans, so materialization paid 2x the dominant cost;
    # 2. a persist() would keep the giant pair-pipeline LOGICAL plan alive —
    #    re-analyzed by Catalyst on every round's join (measured 3-5s/round
    #    on 10k-row data) — and caches materialize with AQE partition
    #    coalescing disabled (spark.sql.optimizer.canChangeCachedPlan
    #    OutputPartitioning=false), leaving 2 x shuffle.partitions tiny
    #    cache blocks to re-scan each round. localCheckpoint truncates the
    #    plan to a LogicalRDD AND materializes through AQE-coalesced
    #    partitions.
    pairs_ck = pairs.selectExpr("doc_a", "doc_b").localCheckpoint()
    edges = (
        pairs_ck.selectExpr("doc_a as src", "doc_b as dst")
        .unionByName(pairs_ck.selectExpr("doc_b as src", "doc_a as dst"))
        .localCheckpoint()
    )
    if not keep_pairs:
        _free_local_checkpoint(pairs_ck)
    # localCheckpoint per round truncates lineage: an iterative DataFrame
    # referenced more than once per round otherwise grows a plan DAG whose
    # un-memoized Catalyst traversals go exponential in the round count
    # (persist() caches execution but not analysis). On a real cluster use
    # a reliable checkpoint dir for fault tolerance; the loop shape is
    # identical.
    #
    # r7: round 1 is fused — with identity labels, msgs == the edge list
    # itself (label of dst IS dst), so the first round needs no join and
    # the identity table needs no checkpoint of its own: one union + one
    # min-aggregate replaces checkpoint + join + union + aggregate. Every
    # later round is unchanged.
    labels = None
    prev = None
    converged = False
    for _ in range(max_iters):
        if labels is None:
            base = nodes.selectExpr("doc_id", "doc_id as label").unionByName(
                edges.selectExpr("src as doc_id", "dst as label")
            )
        else:
            msgs = edges.join(
                labels.selectExpr("doc_id as dst", "label"), "dst"
            ).selectExpr("src as doc_id", "label")
            base = labels.unionByName(msgs)
        new_labels = (
            base.groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        sig = new_labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
        # new_labels is materialized (eager checkpoint + the probe), so the
        # superseded round's blocks can be dropped now instead of lingering
        # until ContextCleaner GC
        if labels is not None:
            _free_local_checkpoint(labels)
        labels = new_labels
        if sig == prev:  # sum(labels) strictly decreases until fixpoint
            converged = True
            break
        prev = sig
    # labels is checkpointed (no lineage into edges), so the edge blocks
    # can be dropped now
    _free_local_checkpoint(edges)
    return labels, converged, pairs_ck if keep_pairs else None


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iters: int = 25
) -> DataFrame:
    """(doc_id) nodes + (doc_a, doc_b) undirected pairs ->
    (doc_id, cluster_id, is_keeper); cluster_id = min doc_id reachable."""
    labels, converged, _ = _hash_min_labels(nodes, pairs, max_iters)
    if not converged:
        # labels short of fixpoint are WRONG cluster ids (a component with
        # diameter > max_iters keeps multiple labels) — fail loudly rather
        # than return silently-partial clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters"
        )
    return labels.selectExpr(
        "doc_id", "label as cluster_id", "doc_id = label as is_keeper"
    )


def connected_components_star(
    nodes: DataFrame, pairs: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", 2014): same output contract as connected_components
    ((doc_id, cluster_id, is_keeper), cluster_id = min reachable doc_id),
    but the edge set contracts toward per-component stars in O(log^2 n)
    rounds instead of O(component diameter) — the variant to use when
    components can be DEEP (chained near-dups: A~B~C~...~Z), where
    hash-min label propagation needs diameter rounds.

    Per round: each op is one distinct-neighbor expansion, one min
    aggregate, one equi-join — all hash-partitioned on the node id,
    nothing driver-sized. Convergence probe: (edge count, sum of edge
    hashes) — O(1) bytes to the driver per round.

      large-star(u): m = min(N(u) + {u}); emit (v, m) for v in N(u), v > u
      small-star(u): m = min(N(u) + {u}); emit (v, m) for v in N(u),
                     v <= u, plus (u, m)

    At fixpoint every non-root points directly at its component minimum.
    """

    def nbrs_of(edges):
        return (
            edges.selectExpr("src as u", "dst as v")
            .unionByName(edges.selectExpr("dst as u", "src as v"))
            .distinct()
        )

    def star(edges, large: bool):
        nbrs = nbrs_of(edges)
        mins = nbrs.groupBy("u").agg(F.min("v").alias("_mv"))
        mins = mins.withColumn("m", F.least("_mv", "u")).select("u", "m")
        j = nbrs.join(mins, "u")
        if large:
            out = j.filter(F.col("v") > F.col("u")).selectExpr(
                "v as src", "m as dst"
            )
        else:
            out = j.filter(F.col("v") <= F.col("u")).selectExpr(
                "v as src", "m as dst"
            ).unionByName(mins.selectExpr("u as src", "m as dst"))
        return out.filter(F.col("src") != F.col("dst")).distinct()

    edges = pairs.selectExpr("doc_a as src", "doc_b as dst").filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        # localCheckpoint: see connected_components — each round references
        # `edges` 4x through the two star ops, so lineage MUST be truncated
        # or Catalyst's plan walks go exponential in rounds
        new_edges = star(star(edges, large=True), large=False).localCheckpoint()
        # order-independent O(1)-byte signature; bit_xor cannot overflow
        # (sum of 64-bit hashes trips ANSI long-overflow)
        row = new_edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        # the probe materialized new_edges; drop the superseded round's
        # checkpoint blocks (see _free_local_checkpoint)
        _free_local_checkpoint(edges)
        edges = new_edges
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds"
        )
    # fixpoint edges are stars (src -> component min); roots and isolated
    # nodes label themselves
    stars = edges.groupBy("src").agg(F.min("dst").alias("_label"))
    labels = nodes.join(
        stars.selectExpr("src as doc_id", "_label"), "doc_id", "left"
    ).selectExpr("doc_id", "coalesce(_label, doc_id) as label")
    # the returned (lazy) labels plan reads the final star edges' checkpoint
    # blocks, so they must NOT be freed here; ContextCleaner reclaims them
    # once the consumer materializes and drops the plan
    return labels.selectExpr(
        "doc_id", "label as cluster_id", "doc_id = label as is_keeper"
    )


def resolve_components(
    nodes: DataFrame,
    pairs: DataFrame,
    hashmin_budget: int = 8,
    star_rounds: int = 50,
) -> DataFrame:
    """Depth-aware connected-components chooser — the PRODUCTION entry.

    Near-dup graphs are almost always shallow (a doc plus its rewrites:
    diameter 1-3), where hash-min label propagation converges in a handful
    of rounds and each round is cheaper than a star contraction round (one
    join + one min-agg vs distinct-expansion + min-agg + join x2). So: run
    hash-min under a fixed round budget; if the graph turns out DEEP
    (diameter > budget — chained near-dups A~B~C~...~Z), discard the partial
    labels and rerun with the large/small-star contraction, which finishes
    in O(log^2 n) rounds regardless of diameter. The fallback costs the
    budget's wasted rounds once, instead of the unbounded (or raising)
    diameter-many rounds the hash-min-only path had.

    Both variants share the exact output contract: (doc_id, cluster_id,
    is_keeper) with cluster_id = min reachable doc_id."""
    # keep_pairs: the deep-graph fallback must NOT rebuild the upstream
    # pair pipeline (LSH + Jaccard verify — the dominant cost) a second
    # time; it reruns the components algorithm over the already-
    # materialized pair checkpoint instead.
    labels, converged, pairs_ck = _hash_min_labels(
        nodes, pairs, hashmin_budget, keep_pairs=True
    )
    if converged:
        _free_local_checkpoint(pairs_ck)
        return labels.selectExpr(
            "doc_id", "label as cluster_id", "doc_id = label as is_keeper"
        )
    # partial labels are wrong cluster ids — free them and switch algorithms
    _free_local_checkpoint(labels)
    out = connected_components_star(nodes, pairs_ck, max_rounds=star_rounds)
    # the star path eagerly checkpointed its own initial edge table from
    # pairs_ck before returning, so the pair blocks can be dropped now
    _free_local_checkpoint(pairs_ck)
    return out


def near_dup_clusters_df(spark: SparkSession, threshold: float = 0.5) -> DataFrame:
    """Full near-dup dedup resolution over the docs_aug corpus: LSH ->
    Jaccard-verified pairs -> connected components (depth-aware chooser:
    hash-min for shallow graphs, star contraction for deep chains) ->
    keeper flag. Expects the ``documents`` temp view to be registered."""
    pairs = spark.sql(near_dup_pairs_sql("spark", threshold)).select(
        "doc_a", "doc_b"
    )
    nodes = spark.sql(
        f"WITH {docs_aug_cte('spark')} SELECT doc_id FROM docs_aug"
    )
    return resolve_components(nodes, pairs)


def clusters_ctes(dialect: str = "duckdb", threshold: float = 0.5) -> str:
    """Recursive-CTE chain ending in ``labels(doc_id, cluster_id)``: min
    reachable doc_id over the verified near-dup pair set (transitive
    closure). Shared by the near_dup_clusters oracle and the composed
    corpus-prep oracle. Must follow a WITH RECURSIVE keyword."""
    return f"""pairs AS (SELECT doc_a, doc_b FROM ({near_dup_pairs_sql(dialect, threshold)}) _p),
docs AS (SELECT doc_id FROM ({(
    f"WITH {docs_aug_cte(dialect)} SELECT doc_id FROM docs_aug"
)}) _d),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT doc_id AS src, doc_id AS dst FROM docs
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)"""


def near_dup_clusters_sql(dialect: str = "duckdb", threshold: float = 0.5) -> str:
    """Recursive-CTE oracle: min reachable doc_id over the same pair set."""
    return f"""
WITH RECURSIVE {clusters_ctes(dialect, threshold)}
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_keeper FROM labels"""


def corpus_prep_df(spark: SparkSession, threshold: float = 0.5) -> DataFrame:
    """The end-to-end corpus-prep pipeline an LLM data team actually runs,
    composed over the docs_aug corpus: rule-based filter (Gopher/C4-style
    signals) -> near-dup cluster KEEPERS (LSH -> Jaccard -> connected
    components) -> deterministic stratified sample. One row per surviving
    doc: (doc_id, lang, cluster_id, n_words, bucket).

    Scale shape: the signal projection is pure codegen over the corpus
    scan; the cluster labels join is hash-partitioned on doc_id; the sample
    is a hash filter — nothing driver-sized beyond the components loop's
    O(1)-byte convergence probes."""
    from .analysis import corpus_keep_sql

    sig = spark.sql(
        f"WITH {docs_aug_cte('spark')} {corpus_keep_sql('spark', 'docs_aug')}"
    )
    clusters = near_dup_clusters_df(spark, threshold)
    return (
        sig.join(clusters, "doc_id")
        .filter(
            F.col("keep_rules")
            & F.col("is_keeper")
            & (F.col("bucket") < F.col("rate_permille"))
        )
        .select("doc_id", "lang", "cluster_id", "n_words", "bucket")
    )


def corpus_prep_sql(dialect: str = "duckdb", threshold: float = 0.5) -> str:
    """Single-statement oracle for corpus_prep_df: recursive-closure labels
    joined to the same keep-signal projection, filtered identically."""
    from .analysis import corpus_keep_sql

    return f"""
WITH RECURSIVE {clusters_ctes(dialect, threshold)},
{docs_aug_cte(dialect)},
ks AS ({corpus_keep_sql(dialect, 'docs_aug')})
SELECT k.doc_id, k.lang, l.cluster_id, k.n_words, k.bucket
FROM ks k JOIN labels l ON k.doc_id = l.doc_id
WHERE k.keep_rules AND l.doc_id = l.cluster_id AND k.bucket < k.rate_permille"""
