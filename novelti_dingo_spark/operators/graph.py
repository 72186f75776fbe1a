"""PageRank over the near-duplicate document graph.

The iterative-join companion to dedup.connected_components: CC answers
"which docs form one duplicate cluster"; PageRank answers "which doc is
the most CENTRAL member" — a principled canonical-survivor choice (the
doc most redundantly witnessed by its neighbors) and the standard
centrality primitive for any doc/link graph a pipeline derives.

The 100 TB design point is the same as CC's: each iteration is one
equi-join of the edge list against the |nodes|-row rank vector plus one
partial-agg sum — no adjacency matrix, no driver-side graph, state is
two DataFrames partitioned by node id. `localCheckpoint` cuts the
iterative lineage every round (reliable checkpoint dir on a cluster).
Co-partitioning note: the join and the groupBy both key on node id, so
one `repartition(node)` up front is reused across all iterations by
Catalyst's exchange reuse. Iteration count is FIXED (power iteration
converges geometrically at rate = damping; 15 rounds ≈ 0.85^15 < 9e-2
residual on the rank gap, ample for ranking stability on shallow dedup
graphs) so the computation is deterministic — no data-dependent early
exit, every engine computes the identical float sequence.

Undirected dedup graphs are symmetrized before ranking, so every node
has out-degree >= 1 and the dangling-mass correction drops out; the
general directed form would add the dangling term to the teleport
constant each round (documented, not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

DAMPING = 0.85
ITERATIONS = 15


def pagerank(
    pairs: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """PageRank over an undirected pair list → (node, rank), ranks
    summing to 1. Symmetrizes the edges, starts uniform, then runs the
    fixed-length power iteration: rank' = (1-d)/N + d * Σ_in rank/deg."""
    # Round-15 (guide §3.3/§5 + §2.6, the ALS one-job pattern): the
    # symmetrized edge list derives from the caller's `pairs` subtree —
    # for pagerank_doc_centrality that is the full MinHash-LSH near-dup
    # join — and was previously instantiated THREE times (the cedges
    # checkpoint, nodes.count(), and the ranks init feeding iteration
    # 1's plan until the first rank checkpoint truncated it). Barrier
    # it once; every consumer reads the single materialization. The
    # count() is the one unavoidable driver action (teleport needs N),
    # and it doubles as the edges materialization job.
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionAll(
            pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # contribution edges carry 1/deg once, not per-iteration; lazy —
    # materializes inside the first job that reads it instead of being
    # its own eager job (§2.6: one job whose stages overlap)
    cedges = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for it in range(iterations):
        contrib = (
            cedges.join(ranks, cedges.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # every node has degree >= 1 after symmetrization, so `contrib`
        # covers all nodes — no outer-join null handling needed
        ranks = contrib.select(
            "node", (F.lit(teleport) + F.lit(damping) * F.col("inflow")).alias("rank")
        )
        # Round-14 (guide §5 — localCheckpoint cuts lineage, but each
        # call is an EAGER job): the loop has NO data-dependent guard
        # (fixed iteration count), so materializing every round is pure
        # overhead — checkpoint every 3rd round instead. Lineage depth
        # stays bounded (≤3 join+agg layers per checkpointed job),
        # computed values are unchanged (checkpoint placement never
        # alters the float sequence — same plan, same partitioning),
        # and the job count drops ~3×. Loops with isEmpty()/count()
        # guards (CC, BFS, k-core) must keep per-round checkpoints —
        # the guard forces materialization anyway.
        # Round-15: eager → LAZY (the ALS pattern): each checkpoint
        # still materializes exactly once (persist-on-first-compute,
        # lineage truncates), but the whole 15-iteration training now
        # runs as ONE Spark job instead of 5+ sequential ones, so
        # independent stages overlap across cores. Measured e2e (noop
        # sink, n=3 medians): 4.63 s → see OPTIMIZATION_r15.md;
        # rows captured identical before/after.
        if it % 3 == 2 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


@register(
    "pagerank_doc_centrality",
    None,  # iterative float fixpoint — rows-only; parity vs numpy power
    # iteration and sum-to-1 are pinned in tests/test_graph.py
    survey_rows="L7,J1,A1",
)
def pagerank_doc_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most central documents of the shared-shingle near-dup
    graph (damping 0.85, 15 fixed iterations). High rank = the document
    most corroborated by its near-duplicates — the natural canonical
    pick inside each dedup cluster."""
    from .dedup import _neardup_pairs

    ranks = pagerank(_neardup_pairs(spark, sf_dir))
    return (
        ranks.select(
            F.col("node").alias("doc_id"), F.round("rank", 9).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(20)
    )


MAX_BFS_DEPTH = 10


@register(
    "bfs_hops_neardup",
    # reuse the shared near-dup pairs CTE; min-hop via bounded recursive walk
    __import__(
        "novelti_dingo_spark.operators.dedup", fromlist=["_NEARDUP_PAIRS_CTE"]
    )._NEARDUP_PAIRS_CTE
    + f"""
    , edges AS (
      SELECT a_id AS src, b_id AS dst FROM p
      UNION ALL SELECT b_id, a_id FROM p
    ), s AS (
      SELECT min(a_id) AS root FROM p
    ), walk(node, d) AS (
      SELECT root, 0 FROM s
      UNION
      SELECT e.dst, w.d + 1
      FROM walk w JOIN edges e ON w.node = e.src
      WHERE w.d < {MAX_BFS_DEPTH}
    )
    SELECT node AS doc_id, CAST(min(d) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
    survey_rows="L7,J1,A1,iterative",
)
def bfs_hops_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distances from the lowest-id document with any
    near-dup edge — single-source shortest paths on the unweighted
    candidate graph, the reachability primitive behind "how far does
    this contamination/duplication spread" audits (and the distance
    half of graph diameters, eccentricities, k-hop neighborhoods).

    Distributed shape: classic frontier BFS — each round joins the
    CURRENT frontier (nodes first reached last round) against the edge
    list and anti-joins the visited set, so every round is one equi-join
    + one anti-join on node ids, O(diameter) rounds total (bounded
    {MAX_BFS_DEPTH}, far above the measured <= 3 dedup-cluster
    diameter). State = two DataFrames keyed by node; lineage cut per
    round with localCheckpoint, exactly like connected_components. The
    root is a plan-time scalar (min over the pair relation — one
    metadata-scale job, the knn query-vector pattern).

    Oracle: bounded recursive CTE enumerating (node, depth) walks with
    UNION dedup, min depth per node — same fixpoint, declaratively."""
    from .dedup import _neardup_pairs

    pairs = _neardup_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionAll(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    ).localCheckpoint()
    # root from the CHECKPOINTED edges (min src == min a_id after
    # symmetrization) — a second pairs computation would re-pay the
    # shingle join just to read one scalar
    root_row = edges.agg(F.min("src")).head()
    if root_row[0] is None:
        return spark.createDataFrame([], "doc_id long, hops long")
    root = int(root_row[0])
    frontier = spark.createDataFrame([(root, 0)], "node long, d long")
    visited = frontier.localCheckpoint()
    for _ in range(MAX_BFS_DEPTH):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
            .join(visited.select("node"), "node", "left_anti")
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited.select(
        F.col("node").alias("doc_id"), F.col("d").alias("hops")
    )


def kcore(
    pairs: DataFrame, k: int, src: str = "a_id", dst: str = "b_id"
) -> DataFrame:
    """Maximal k-core of an undirected pair list → (node, core_degree):
    iteratively peel nodes of degree < k until the fixpoint. The core is
    UNIQUE (peeling order cannot change it), so the data-dependent round
    count affects work, never the answer.

    100 TB shape: each round is one degree aggregate plus two left-semi
    joins keyed on node id (drop edges touching a peeled endpoint) —
    no adjacency matrix, no driver-side graph; the driver sees one
    COUNT per round (the loop guard). localCheckpoint cuts the
    iterative lineage exactly like pagerank/CC. Rounds are bounded by
    the longest peeling chain (degeneracy ordering depth), which is
    O(log n) on the shallow near-dup graphs this runs on and small for
    any graph whose cores are much denser than their fringes."""
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionAll(
            pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .localCheckpoint()
    )
    while True:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("core_degree"))
        doomed = deg.filter(F.col("core_degree") < k)
        if doomed.isEmpty():
            return deg.select(F.col("src").alias("node"), "core_degree")
        keep = deg.filter(F.col("core_degree") >= k).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )


@register(
    "kcore_neardup",
    None,  # iterative peeling has no recursive-CTE twin (deletion is
    # non-monotonic); pinned against a pure-python peeling reference in
    # tests/test_graph.py
    survey_rows="L7-family,iterative",
)
def kcore_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-duplicate graph: documents that remain after
    peeling degree-<2 nodes — the members of dup CHAINS' dense interiors
    vs their fringes. CC says which docs form one cluster; coreness
    separates a cluster's redundancy backbone (safe to drop all but one)
    from leaf attachments that match only a single neighbor (review
    before dropping). Output: (node, core_degree) within the 2-core."""
    from .dedup import _neardup_pairs

    return kcore(_neardup_pairs(spark, sf_dir), k=2).orderBy("node")
