"""Connected components — duplicate-CLUSTER assembly.

Pair generators (LSH banding, embedding near-dup) emit EDGES; the
training-data decision ("keep one copy per duplicate group") needs the
transitive closure: connected components with the canonical label
min(doc_id in component).

Algorithm: iterative min-label propagation (the simplified
large-star/small-star shape): every vertex repeatedly takes the
minimum label among itself and its neighbors until a fixpoint. Each
iteration is one groupBy shuffle over the edge list; iterations are
localCheckpoint-severed (iterative lineage otherwise grows a plan per
round). Convergence needs at most `diameter` rounds — near-dup
clusters are shallow (pairs share LSH buckets), so the default cap is
generous; the loop exits early on the first stable round (checked with
one tiny aggregate per round).

Deterministic end to end (min over int64 labels, no RNG), so a SQL
engine replays it with a recursive-CTE transitive closure — the
`dedup_clusters` oracle does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component): component = min node id reachable.

    `edges` is undirected input (each pair once is fine — both
    directions are added here). Isolated vertices don't appear (join
    the result back to the vertex table with a coalesce-to-self for
    singleton semantics, as dedup_clusters does).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor minimum: every edge (a,b) offers b's label to a
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("comp").alias("component"))
