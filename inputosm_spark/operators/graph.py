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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cc_round(edges: DataFrame) -> DataFrame:
    """One LARGE-STAR + SMALL-STAR alternation (Kiveris et al.), fused.

    Set-identical to composing the textbook operators, with three
    shuffles instead of six (measured 4.7 s -> 3.6 s for the 6-round
    sf0.1 dbscan closure; guide §2.4):

    * per-node minima come from UNORDERED windows over the node key —
      one exchange each — instead of a groupBy + equi-join pair (the
      window and the old join used the same partitioning, so the join
      side's extra exchange and the aggregate were pure overhead);
    * large-star's terminal `.distinct()` is dropped: it emits exactly
      ONE row per input edge (the v > u orientation of the symmetrized
      stream), and duplicate (child, parent) PAIRS cannot change
      small-star's per-node min nor survive its terminal distinct;
    * small-star skips canonicalization: large-star output is already
      u > v and self-loop-free (parent = closed-neighborhood min < u
      < v), and both of its emissions ((v, m) per row, (u, m) per
      node) fan out of one explode.

    Input may be any orientation (the caller's distinct edge set);
    output is the canonical (child > parent, distinct) star-step set.
    """
    wu = Window.partitionBy("u")
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # large-star: every strictly-larger neighbor v of u points at the
    # minimum m of u's CLOSED neighborhood (m <= u < v)
    ls = (
        sym.withColumn("__m", F.least(F.min("v").over(wu), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
    )
    # small-star over the high->low edges: reattach every child AND the
    # node itself to the per-node neighbor minimum
    ss = ls.withColumn("__m", F.min("v").over(wu))
    return (
        ss.select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("cu"), F.col("__m").alias("cv")),
                    F.struct(F.col("u").alias("cu"), F.col("__m").alias("cv")),
                )
            ).alias("p")
        )
        .select(F.col("p.cu").alias("u"), F.col("p.cv").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_local_star(edges: DataFrame) -> DataFrame:
    """Star-fixpoint edges (child u -> component-min root v, u != v)
    of a SMALL edge set, computed in ONE vectorized kernel task — the
    byte-cap-gated "finish small subproblems locally" move: the
    distributed star rounds contract geometrically, so their tail is
    a fixed-latency parade of 3-exchange rounds over a few thousand
    edges (measured 5 of 6 dbscan rounds at sf0.1 processing < 6k
    edges for ~0.3 s each). One grouped-map kernel replaces that tail
    with a single job; the edges cross Arrow once (<= the same bytes
    the engine's other capped broadcasts ship).

    Kernel = vectorized min-hooking + full pointer-jump compression
    (Shiloach-Vishkin shape): per sweep one scatter-min over the edge
    array and log-depth parent flattening — numpy array ops only, no
    per-edge Python. The component minimum never acquires a parent
    (hooks always point larger roots at smaller), so every tree
    flattens onto the component's min id: exactly the fixpoint the
    distributed rounds converge to, independent of row order.
    """
    import numpy as np
    import pandas as pd

    def _kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(pdf):
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        uv = np.concatenate([pdf["u"].to_numpy(), pdf["v"].to_numpy()])
        nodes, inv = np.unique(uv, return_inverse=True)
        m = len(pdf)
        ui, vi = inv[:m], inv[m:]
        p = np.arange(len(nodes))
        for _ in range(64):
            pu, pv = p[ui], p[vi]
            live = pu != pv
            if not live.any():
                break
            np.minimum.at(p, np.maximum(pu, pv), np.minimum(pu, pv))
            while True:
                pp = p[p]
                if np.array_equal(pp, p):
                    break
                p = pp
        else:  # 64 sweeps >> log2(cap edges): a hard bug, never load
            raise RuntimeError("cc local finish did not converge")
        child = p != np.arange(len(nodes))
        return pd.DataFrame(
            {"u": nodes[child], "v": nodes[p[child]]}
        )

    return (
        edges.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(_kernel, "u long, v long")
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
    does). Distributed star rounds run only while the edge set exceeds
    the engine's byte cap; once it fits (immediately, for bench-scale
    graphs; after the geometric contraction, at 100 TB) the remaining
    rounds collapse into one vectorized kernel task (_cc_local_star)
    with the identical fixpoint. Raises RuntimeError if max_iter
    rounds neither converge nor contract under the cap (log-scale
    rounds make that a hard bug, never load).
    """
    # ONE upstream materialization (the old form ran the caller's edge
    # pipeline twice — once for the node set, once for the edge set):
    # checkpoint the raw narrow (u, v) rows, then derive the canonical
    # edge set eagerly and the node set lazily from the materialized
    # RDD. The node set is consumed exactly once (the roots anti-join
    # at the end), so it needs no checkpoint of its own.
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    nodes = raw.select("u").unionAll(raw.select(F.col("v").alias("u"))).distinct()
    conf_thr = _parse_size_bytes(
        edges.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    )
    fits = (
        lambda rows: conf_thr > 0
        and rows * _EDGE_ROW_BYTES <= _CLOSING_BROADCAST_MAX_BYTES
    )
    # the LOCAL path gates on the RAW count and skips the input
    # `.distinct()` entirely — connectivity is multiplicity-invariant
    # and the kernel's scatter-min is idempotent, so duplicates cost
    # nothing while the distinct's exchange + checkpoint + count cost
    # two jobs (A/B: dbscan 1.49 -> 1.36, dedup_clusters 1.28 -> 1.18).
    # raw >= distinct rows, so the gate errs only toward the
    # distributed path (a performance choice, never correctness).
    n_raw = raw.count()
    if fits(n_raw):
        # labels + roots both consume the star set: checkpoint so the
        # kernel runs once, exactly as the loop's fixpoint frame was
        e = _cc_local_star(
            raw.filter(F.col("u") != F.col("v"))
        ).localCheckpoint(eager=True)
    else:
        # distributed rounds need the distinct (set-based fixpoint
        # check + lean rounds)
        e = (
            raw.filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = False
        n_prev = e.count()
        for _ in range(max_iter):
            if fits(n_prev):
                break  # the local kernel finishes from here
            new_e = _cc_round(e).localCheckpoint(eager=True)
            n_new = new_e.count()
            # both sides are distinct sets, so equal counts + empty
            # exceptAll == set equality (the exact check only runs on
            # count-stable rounds)
            same = (
                n_new == n_prev
                and new_e.exceptAll(e).limit(1).count() == 0
            )
            e, n_prev = new_e, n_new
            if same:
                converged = True
                break
        if not converged:
            if not fits(n_prev):
                raise RuntimeError(
                    f"connected_components did not converge in "
                    f"{max_iter} rounds"
                )
            e = _cc_local_star(e).localCheckpoint(eager=True)
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
    built once and CACHED (an InMemoryRelation preserves its child's
    outputPartitioning; a checkpointed LogicalRDD reports
    UnknownPartitioning and re-paid the exchanges every iteration —
    the LPA lesson, r7). When the rank table fits the byte cap it is
    broadcast per iteration and the cache is partitioned on the
    AGGREGATION key dst, so each iteration runs with ZERO exchanges
    (map-side join -> in-place dst aggregation -> broadcast the
    aggregate onto the cached node table). Past the cap the cache
    partitions on the join key src and iterations shuffle only the
    narrow rank table — the 100 TB plan. The per-iteration frames are
    plain lazy plans (iters is small and bounded; for deep iteration
    counts sever lineage per round like connected_components does).

    Exactness bound (r5 ADVICE): both floor divisions run as doubles,
    exact (== the oracle's integer //) only while the dividend stays
    < 2^53 — rank for rank/outdeg, damping_num * sum(contributions)
    for the damping term. In-plan assert_true guards enforce both
    (the engine's loud-failure pattern, mirroring priority_sample):
    past the bound the job RAISES instead of silently diverging from
    the oracle. The contribution-mass guard compares sum(contrib)
    against a precomputed bound WITHOUT multiplying (the product
    itself could trip ANSI int64 overflow first and swallow the
    diagnostic), and each guard leads its addition so it evaluates
    before the division/product does. For graphs whose total rank
    mass approaches 2^53 / damping_num, lower `scale`.
    """
    base = scale * (damping_den - damping_num) // damping_den
    # nodes feeds iters+1 plan branches (initial ranks + every
    # iteration's left join): cache it, or each branch re-scans and
    # re-distincts the edge list
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    # the node count is loop-invariant (every node keeps exactly one
    # rank row): one exact count drives the per-iteration broadcast
    # gate and the cache partitioning key (the LPA sizing pattern)
    n_nodes = nodes.count()
    conf_thr = _parse_size_bytes(
        edges.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    )
    rank_fits = (
        conf_thr > 0
        and n_nodes * _EDGE_ROW_BYTES <= _CLOSING_BROADCAST_MAX_BYTES
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    # loop-invariant: edges carrying their source out-degree, cached
    # once so every iteration reuses the materialized columnar blocks
    # AND their partitioning — on the aggregation key dst when ranks
    # broadcast (zero-exchange iterations), on the join key src past
    # the cap (iterations shuffle only the narrow rank table)
    ed = (
        edges.join(deg, "src")
        .repartition(F.col("dst" if rank_fits else "src"))
        .cache()
    )
    _b = F.broadcast if rank_fits else (lambda df: df)
    rank_guard = F.assert_true(
        F.col("rank") < F.lit(1 << 53),
        F.lit(
            "pagerank: rank exceeds 2^53 — the double floor-division "
            "is no longer exact vs the integer oracle; lower `scale`"
        ),
    )
    s_bound = ((1 << 53) - 1) // damping_num
    s_guard = F.assert_true(
        F.coalesce(F.col("__s"), F.lit(0)) <= F.lit(s_bound),
        F.lit(
            "pagerank: damping_num * contribution mass exceeds 2^53 — "
            "the double floor-division is no longer exact vs the "
            "integer oracle; lower `scale`"
        ),
    )
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        agg = (
            ed.join(_b(ranks.withColumnRenamed("node", "src")), "src")
            .select(
                "dst",
                (
                    # guard first: NULL (+0) on the happy path, raises
                    # before the division is evaluated otherwise
                    F.coalesce(rank_guard.cast("long"), F.lit(0))
                    + F.floor(F.col("rank") / F.col("__deg")).cast("long")
                ).alias("__c"),
            )
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(_b(agg.withColumnRenamed("dst", "node")), "node", "left")
            .select(
                "node",
                (
                    F.coalesce(s_guard.cast("long"), F.lit(0))
                    + F.lit(base)
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


def _parse_size_bytes(s: str) -> int:
    """Spark size-conf string ('10485760', '10485760b', '10m', '1g',
    '-1') -> bytes. Mirrors Spark's JavaUtils.byteStringAsBytes for
    the suffixes that appear in autoBroadcastJoinThreshold configs."""
    t = s.strip().lower()
    for suf, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if t.endswith(suf) and t[: -len(suf)].strip("-").isdigit():
            return int(t[: -len(suf)]) * mult
    return int(t)


# serialized broadcast-hash-relation footprint per (long, long) edge
# row: 16 B of data + key/row overhead in the LongHashedRelation
_EDGE_ROW_BYTES = 32
# hard cap for the deliberate closing-probe broadcast: 64 MB (= 2M
# edges) fits comfortably in default executor/driver memory; the old
# 5M-ROW cap was ~160 MB serialized per executor — an OOM risk on
# default configs (r5 ADVICE: size the decision in bytes, not rows)
_CLOSING_BROADCAST_MAX_BYTES = 64 << 20


def triangle_counts(
    edges: DataFrame | None = None,
    degree_orient: bool = True,
    edge_multiset: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    CANONICAL ascending edges (u < v, distinct) — the clustering /
    cohesion primitive (co-purchase cliques, link-farm detection).

    Ordered-wedge algorithm: orient every edge along a TOTAL order π,
    then a wedge π(a)<π(b)<π(c) is e(a,b) ⋈ e(b,c) and the closing
    join probes e(a,c) — each triangle is found exactly ONCE (as its
    π-sorted orientation), two equi-joins, no cartesian anywhere.

    π is the DEGREE order (degree, id) by default (r5 verdict #5):
    orienting low-degree -> high-degree bounds every node's out-degree
    by O(sqrt(m)) (arboricity), so the wedge stream is O(m^1.5) even
    on hub-skewed graphs — plain id order leaves a low-id hub with
    out-degree ~n and a quadratic wedge blow-up at 100×. The
    orientation is one degree aggregation + two equi-joins against the
    narrow (node, degree) table BEFORE the wedge join; corner ids are
    untouched, so the triangle set (and every oracle hash) is
    identical under either order. `degree_orient=False` keeps the raw
    id order (valid for graphs known to be degree-uniform).

    `edge_multiset` (mutually exclusive with `edges`): canonical
    ascending (u, v) pairs WITH duplicates — the dedup then rides a
    u-partitioned cache IN PLACE instead of the caller paying a
    separate corpus-wide distinct exchange (the LPA sym_edges
    pattern; A/B best-of-4 3.29 -> 2.56 s at sf0.1 co-purchase,
    combined with the in-place adjacency aggregations below).
    """
    if (edges is None) == (edge_multiset is None):
        raise ValueError(
            "triangle_counts takes exactly one of edges / edge_multiset"
        )
    # the edge list feeds THREE join branches (wedge left, wedge
    # right, closing probe) — plus the degree aggregation and the two
    # orientation joins; materialize it once or every branch
    # re-derives it from source (measured 18.4s -> 7.5s at sf0.1
    # co-purchase). The multiset path uses a u-partitioned CACHE so
    # the dedup runs in place (and, when degree_orient=False, the
    # adjacency aggregations below do too).
    if edge_multiset is not None:
        edges = (
            edge_multiset.select("u", "v")
            .repartition(F.col("u"))
            .dropDuplicates(["u", "v"])
            .cache()
        )
    else:
        edges = edges.localCheckpoint(eager=True)
    # one count, reused for BOTH broadcast decisions below (the
    # checkpoint makes it a cheap cached-RDD count; orientation
    # preserves row count so it stays valid for the closing probe)
    n_edges = edges.count()
    conf_thr = _parse_size_bytes(
        edges.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    )
    fits = (
        lambda rows: conf_thr > 0
        and rows * _EDGE_ROW_BYTES <= _CLOSING_BROADCAST_MAX_BYTES
    )
    if degree_orient:
        # ONE explode pass for both endpoints (explode-vs-unionAll
        # rule); undirected degree since input edges are canonical.
        # Materialized once: both orientation probes (du, dv) read the
        # same RDD instead of re-aggregating, and its row count is the
        # EXACT node count for the broadcast decision — the old bound
        # (2 * n_edges) overestimated nodes by orders of magnitude on
        # dense graphs and pushed the sf0.1 co-purchase orientation
        # (20k nodes, 1.2M edges) past the byte cap into a sort-merge
        # shuffle of the edge list (and, post-AQE-coalescing, a
        # 1-partition oriented RDD that serialized everything
        # downstream: 5.3 s vs 1.5 s for the intersect stage).
        deg = (
            edges.select(F.explode(F.array("u", "v")).alias("n"))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
            .localCheckpoint(eager=True)
        )
        n_nodes = deg.count()
        du = deg.select(F.col("n").alias("u"), F.col("d").alias("__du"))
        dv = deg.select(F.col("n").alias("v"), F.col("d").alias("__dv"))
        # broadcast BOTH orientation joins when the (node, degree)
        # table fits the byte cap, so the oriented list is produced
        # map-side over the checkpointed edges. Past the cap the joins
        # shuffle: the correct 100 TB path.
        if fits(n_nodes):
            du, dv = F.broadcast(du), F.broadcast(dv)
        lower_first = (F.col("__du") < F.col("__dv")) | (
            (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
        )
        edges = (
            edges.join(du, "u")
            .join(dv, "v")
            .select(
                F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("u"),
                F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("v"),
            )
            # re-materialize: the oriented list feeds the wedge/probe
            # branches below. A u-partitioned CACHE (not a checkpoint,
            # which loses partitioning) lets BOTH adjacency
            # collect_list aggregations run in place — two exchanges
            # gone for the price of this one (r7 second pass)
            .repartition(F.col("u"))
            .cache()
        )
    # Two physical strategies, chosen by the SAME byte-capped broadcast
    # decision as before (disabled when autoBroadcastJoinThreshold=-1):
    #
    # * broadcastable edge list -> ADJACENCY-INTERSECT: build each
    #   node's out-neighborhood array once (total payload = n_edges
    #   longs, the same bytes the old closing-probe broadcast shipped),
    #   broadcast it onto both endpoints of every edge, and emit the
    #   closing corners as array_intersect(N+(u), N+(v)) — the triangle
    #   (a,b,c), a<b<c in π, is found exactly once at its (a,b) edge.
    #   This never materializes the wedge stream: the old plan shuffled
    #   e1 ⋈ e2 into sum-of-in*out-degree wedge rows before the probe
    #   (49.2M rows / 5.5 s at the sf0.1 co-purchase graph vs 1.5 s for
    #   the intersect form, identical output; guide §2.4 "remove
    #   shuffles outright"). Intersect cost is O(|N+(u)|+|N+(v)|) per
    #   edge — the same asymptotic work as the wedge join, minus the
    #   exchange.
    # * past the cap -> the shuffled wedge join (the 100 TB path —
    #   wedges partition by the closing key, AQE handles skew).
    if fits(n_edges):
        adj = edges.groupBy("u").agg(F.collect_list("v").alias("__nb"))
        # the aliased plans do NOT dedupe into a ReusedExchange (alias-
        # scoped expr ids defeat canonicalized reuse) — measured r7:
        # both adjacency aggregations run, in parallel within one
        # stage, and that is still FASTER than caching the array-heavy
        # adjacency rows once (interleaved A/B 2.98 vs 3.08 s: the
        # cache's extra materialization costs more than the duplicate
        # agg saves). Both builds stay byte-capped by fits(n_edges).
        au, av = adj.alias("au"), adj.alias("av")
        tri = (
            edges.alias("e")
            .join(F.broadcast(au), F.col("au.u") == F.col("e.u"))
            .join(F.broadcast(av), F.col("av.u") == F.col("e.v"))
            .select(
                F.col("e.u").alias("a"),
                F.col("e.v").alias("b"),
                F.explode(
                    F.array_intersect(F.col("au.__nb"), F.col("av.__nb"))
                ).alias("c"),
            )
        )
    else:
        e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
        e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
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


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
) -> DataFrame:
    """Multi-source bounded BFS over a DIRECTED edge list (src, dst):
    (node, hops) = minimum edge count from any source, hops <=
    max_hops — reachability cohorts, influence radii, contamination
    blast-radius audits. Callers wanting undirected semantics
    symmetrize the edge list first.

    Scale shape: the loop-invariant edge list is repartitioned on src
    and checkpoint-severed ONCE; each hop is then a single equi-join
    of the (narrow) frontier against it, an anti-join against the
    visited set, and a distinct — the frontier shuffles, the edge
    list never re-shuffles. Rounds are localCheckpoint-severed
    (iterative lineage) with an early exit on an empty frontier (one
    cheap cached-RDD count per hop, bounded by max_hops). Entirely
    deterministic integers, so a recursive-CTE oracle replays every
    (node, hops) row.
    """
    ed = (
        edges.select("src", "dst")
        .repartition(F.col("src"))
        .localCheckpoint(eager=False)
    )
    visited = (
        sources.select(F.col("node"), F.lit(0).cast("int").alias("hops"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.select(F.col("node").alias("src"))
            .join(ed, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(h).cast("int").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        # visited is a union of already-checkpointed per-hop frontiers:
        # its lineage is one Union over materialized RDDs, so
        # re-checkpointing it every hop (the old form) only re-copied
        # the whole visited set per round — O(hops^2) materialized
        # bytes for zero recompute saved
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame | None = None,
    n_iter: int = 3,
    sym_edges: DataFrame | None = None,
) -> DataFrame:
    """Community detection via SYNCHRONOUS label propagation over an
    undirected edge list (u, v), canonical or not: `n_iter` fixed
    rounds, label(v) starts as v, and each round every node adopts the
    most frequent label among its neighbors with ties broken toward
    the SMALLEST label — fully deterministic (no RNG, no asynchronous
    order-dependence), so a SQL engine replays every round with an
    unrolled CTE (count → row_number argmax), the pagerank contract.

    Scale shape per round: one equi-join of the (node, label) frame
    against the symmetrized edge list (narrow labels side — broadcast
    when small, shuffle-hash at scale), one (dst, label) map-side-
    combined count, one per-dst ranking window (bounded: at most
    #distinct-neighbor-labels rows per node). The symmetrized edge
    list is produced by ONE explode (both directions per input row —
    the unionAll rule) and cached once, partitioned on the aggregation
    key so broadcast rounds run exchange-free; iterations sever their
    label frame each round (iterative-lineage rule). Fixed
    iteration count, no driver-side convergence polling: at 100 TB the
    round count is the budget knob, and synchronous LPA's known
    oscillation modes are bounded by it.

    `sym_edges` (mutually exclusive with `edges`): a directed (s, d)
    edge MULTISET whose DISTINCT set is the symmetrized graph —
    callers that can fan out both directions cheaply (e.g. the
    co-purchase basket explode) pass it so the dedup rides the
    d-partitioned cache IN PLACE (hashpartitioning(d) satisfies the
    (s, d) dedup's clustering) instead of paying a separate
    corpus-wide distinct exchange before the symmetrize (A/B
    best-of-4 3.32 -> 2.61 s at sf0.1).
    """
    # CACHE, not localCheckpoint: an InMemoryRelation PRESERVES its
    # child's outputPartitioning (a checkpointed LogicalRDD reports
    # UnknownPartitioning — measured: the checkpointed form re-paid
    # both per-round exchanges). Partitioned by the AGGREGATION side
    # `d`, every broadcast-join round then runs with ZERO exchanges:
    # BHJ preserves the streamed side's hashpartitioning(d), which
    # satisfies both the (d, label) count's clustered distribution and
    # the per-node ranking window — one in-place sort per round is all
    # that remains (guide §2.4; interleaved A/B best-of-4 4.76 ->
    # 3.74 s at sf0.1).
    if (edges is None) == (sym_edges is None):
        raise ValueError(
            "label_propagation takes exactly one of edges / sym_edges"
        )
    if sym_edges is not None:
        # multiset input: dedup runs IN PLACE on the d-partitioned
        # cache (no extra exchange — see docstring)
        sym = (
            sym_edges.select("s", "d")
            .repartition(F.col("d"))
            .dropDuplicates(["s", "d"])
            .cache()
        )
    else:
        sym = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
                        F.struct(F.col("v").alias("s"), F.col("u").alias("d")),
                    )
                ).alias("e")
            )
            .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
            .repartition(F.col("d"))
            .cache()
        )
    # the node set from the PARTITIONING side d (symmetric graph:
    # distinct d == distinct s) — the distinct runs in place on the
    # cache instead of paying an exchange on s
    labels = (
        sym.select(F.col("d").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    # Cached/checkpointed label frames carry no size statistics, so
    # without a hint every round sort-merge-joins — re-SORTING the
    # whole symmetrized edge list per round. The (node, label) table
    # is two longs per NODE and its row count is loop-INVARIANT (every
    # node keeps exactly one label), so the byte-cap decision is made
    # ONCE on the exact count (cheap: the distinct above already
    # materialized the sym cache). When it fits, each round is a
    # map-side hash join (the triangle_counts sizing pattern). Past
    # the cap — huge graphs — sym is re-partitioned on the JOIN side
    # `s` (one extra cache-to-cache pass, amortized across the rounds
    # it saves from re-shuffling) and the sort-merge rounds are the
    # correct 100 TB plan, unchanged from round start.
    n_nodes = labels.count()
    conf_thr = _parse_size_bytes(
        sym.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    )
    label_fits = (
        conf_thr > 0
        and n_nodes * _EDGE_ROW_BYTES <= _CLOSING_BROADCAST_MAX_BYTES
    )
    if not label_fits:
        sym2 = sym.repartition(F.col("s")).cache()
        sym.unpersist(False)
        sym = sym2
    w = Window.partitionBy("node").orderBy(
        F.desc("c"), F.asc("label")
    )
    for _ in range(n_iter):
        lab = labels.select(F.col("node").alias("s"), "label")
        if label_fits:
            lab = F.broadcast(lab)
        labels = (
            sym.join(lab, "s")
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count("*").alias("c"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    # the returned frame is the checkpointed final round — independent
    # of the sym cache, which would otherwise accumulate across
    # invocations (bench reps) until LRU eviction
    sym.unpersist(False)
    return labels
