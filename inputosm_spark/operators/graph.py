"""Connected components — duplicate-CLUSTER assembly.

Pair generators (LSH banding, embedding near-dup) emit EDGES; the
training-data decision ("keep one copy per duplicate group") needs the
transitive closure: connected components with the canonical label
min(doc_id in component).

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
paper). Each operation is one groupBy + one equi-join shuffle over the
parent-pointer edge list; the alternation contracts every component to
a star rooted at its minimum id in O(log n) rounds (O(diameter) for
plain min-label propagation — a 1000-node chain needs ~1000 label
rounds but ~10 star rounds). Rounds are localCheckpoint-severed
(iterative lineage otherwise grows a plan per round) and the loop
exits on the first fixpoint (edge set unchanged); exhausting max_iter
without a fixpoint RAISES — a silent exit would mislabel clusters.

Deterministic end to end (min over int64 labels, no RNG), so a SQL
engine replays it with a recursive-CTE transitive closure — the
`dedup_clusters` oracle does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for every node u, connect each STRICTLY LARGER
    neighbor to the minimum of u's closed neighborhood. Output edges
    (child, parent) with child > parent."""
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge high->low, then connect each node's
    smaller-or-equal neighbors (and the node itself) to the minimum of
    the neighborhood. Output edges (child, parent) with child > parent."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    reattached = d.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        reattached.unionAll(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component): component = min node id reachable.

    `edges` is undirected input (each pair once is fine). Isolated
    vertices don't appear (join the result back to the vertex table
    with a coalesce-to-self for singleton semantics, as dedup_clusters
    does). Raises RuntimeError if max_iter rounds don't reach the star
    fixpoint (log-scale rounds make that a hard bug, never load).
    """
    nodes = (
        edges.select(F.col(src).alias("u"))
        .unionAll(edges.select(F.col(dst).alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        same = (
            new_e.count() == e.count()
            and new_e.exceptAll(e).limit(1).count() == 0
        )
        e = new_e
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint edges are (child, root) stars; roots appear only as v
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        nodes.select(F.col("u").alias("node"))
        .join(e.select(F.col("u").alias("node")), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return labels.unionAll(roots)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list — the
    link-graph document-quality prior of web-corpus curation (the
    reference has no graph operators; this extends the dedup CC stack
    with the other classic iterative graph computation).

    ALL arithmetic is integer (ranks scaled by `scale`, floor
    division), so a DuckDB oracle replays every iteration bit-for-bit
    (the engine's exact-integer float rule, CLAUDE.md): contribution of
    node u = rank(u) // outdeg(u); rank'(v) = base + damping_num *
    (sum of in-contributions) // damping_den, with base =
    scale * (damping_den - damping_num) // damping_den. Dangling nodes
    (no out-edges) simply contribute nothing — no redistribution term,
    and the SQL twin states the same contract.

    Scale shape: the (edges JOIN outdeg) frame is loop-invariant —
    built once, repartitioned by src and localCheckpoint-severed, so
    each iteration is ONE src-shuffle of the narrow rank table + ONE
    dst-aggregation; the edge list itself never re-shuffles. The
    per-iteration frames are plain lazy plans (iters is small and
    bounded; for deep iteration counts sever lineage per round like
    connected_components does).
    """
    base = scale * (damping_den - damping_num) // damping_den
    # nodes feeds iters+1 plan branches (initial ranks + every
    # iteration's left join): checkpoint-sever it like `ed` below, or
    # each branch re-scans and re-distincts the edge list
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    # loop-invariant: edges carrying their source out-degree, severed so
    # every iteration reuses the materialized RDD instead of replanning
    ed = (
        edges.join(deg, "src")
        .repartition(F.col("src"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        agg = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.floor(F.col("rank") / F.col("__deg"))
                .cast("long")
                .alias("__c"),
            )
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(agg.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping_num)
                        * F.coalesce(F.col("__s"), F.lit(0))
                        / F.lit(damping_den)
                    )
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    CANONICAL ascending edges (u < v, distinct) — the clustering /
    cohesion primitive (co-purchase cliques, link-farm detection).

    Ordered-wedge algorithm: with every edge stored ascending, a
    wedge a<b<c is e(a,b) ⋈ e(b,c), and the closing join probes
    e(a,c) — each triangle is found exactly ONCE (as its sorted
    orientation), two equi-joins, no cartesian anywhere. At corpus
    scale the standard refinement is relabeling nodes by DEGREE rank
    before orienting (bounds wedge fan-out by the arboricity instead
    of the id order); that is a one-line relabel join in front of
    this function and does not change the result.
    """
    # the edge list feeds THREE join branches (wedge left, wedge
    # right, closing probe); sever it once (eager: the barrier runs
    # the edge job NOW, and the three branches then scan the
    # materialized RDD) or every branch re-derives it from source
    # (measured 18.4s -> 7.5s at sf0.1 co-purchase)
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    # closing probe: the WEDGE stream is the big side (sum of squared
    # out-degrees); when the edge list itself is broadcastable, probe
    # it hash-side instead of sort-merging the wedges. The checkpoint
    # above makes the count cheap; past the threshold fall back to the
    # shuffled equi-join (the 100 TB path — edges partition by a, AQE
    # handles skewed closing keys).
    if edges.count() <= 5_000_000:
        e3 = F.broadcast(e3)
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")),
        )
        .select("a", "b", "c")
    )
    # ONE pass over the triangle stream: exploding the corner array
    # fans each triangle to its 3 nodes map-side — a unionAll of three
    # selects would re-run BOTH joins per branch (measured 22.4s vs
    # 8.3s at sf0.1; Spark has no cross-branch subplan sharing)
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
