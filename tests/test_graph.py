"""Connected components: chains, merges, determinism."""

from __future__ import annotations

from inputosm_spark.operators import graph


def test_components_chain_and_islands(spark):
    # chain 1-2-3-4, island 10-11, singleton edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], "src long, dst long"
    )
    got = {r.node: r.component
           for r in graph.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_merge_through_hub(spark):
    # two stars merged by a bridge: min label must flow across
    edges = [(5, 6), (5, 7), (8, 9), (8, 100), (7, 8), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in graph.connected_components(df).collect()}
    assert set(got.values()) == {1}


def test_components_long_path_converges(spark):
    # a 15-hop path needs label to travel the full diameter
    edges = [(i, i + 1) for i in range(100, 115)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in graph.connected_components(df).collect()}
    assert set(got.values()) == {100} and len(got) == 16


def test_long_chain_converges_in_log_rounds(spark):
    """A 1000-node chain has diameter 999 — min-label propagation would
    need ~999 rounds; the large-star/small-star alternation must finish
    in O(log n): max_iter=12 would RAISE if it didn't. The byte-cap
    local finish is DISABLED (threshold=-1) so this exercises the
    distributed rounds — the 100 TB path."""
    edges = [(i, i + 1) for i in range(1000)]
    df = spark.createDataFrame(edges, "src long, dst long")
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = {r.node: r.component
               for r in graph.connected_components(df, max_iter=12).collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
    assert set(got.values()) == {0} and len(got) == 1001


def test_local_finish_matches_distributed_rounds(spark):
    """The byte-cap-gated one-task kernel finish must produce the
    IDENTICAL label set as the distributed star rounds (gate disabled
    via threshold=-1) on a graph mixing chains, merges and islands."""
    edges = (
        [(i, i + 1) for i in range(0, 40)]          # long chain
        + [(100 + i, 100 + (i * 7) % 23) for i in range(23)]  # tangle
        + [(500, 501), (502, 501), (503, 502)]       # small tree
        + [(900, 901)]                               # island
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    local = sorted(
        (r.node, r.component)
        for r in graph.connected_components(df).collect()
    )
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dist = sorted(
            (r.node, r.component)
            for r in graph.connected_components(df).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
    assert local == dist and len(local) > 0


def test_nonconvergence_raises(spark):
    """Exhausting max_iter without a fixpoint is an error, not a silent
    wrong answer."""
    import pytest

    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable the byte-cap local finish (it would legitimately
        # solve 64 edges in one kernel task without any rounds)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with pytest.raises(RuntimeError, match="did not converge"):
            graph.connected_components(df, max_iter=1)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_lpa_sym_edges_multiset_matches_edges_path(spark):
    """The sym_edges MULTISET path (in-place dedup on the partitioned
    cache) must produce the identical labels as the canonical
    undirected-edges path — duplicates in the multiset must not skew
    any round's vote counts."""
    from pyspark.sql import functions as F

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (2, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    base = {
        (r.node, r.label)
        for r in graph.label_propagation(df, n_iter=3).collect()
    }
    # directed multiset with heavy duplication of every edge
    sym = (
        df.selectExpr("u as s", "v as d")
        .unionAll(df.selectExpr("v as s", "u as d"))
    )
    sym = sym.unionAll(sym).unionAll(sym)  # x3 duplicates
    got = {
        (r.node, r.label)
        for r in graph.label_propagation(sym_edges=sym, n_iter=3).collect()
    }
    assert got == base and len(got) == 8


def test_lpa_requires_exactly_one_input(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "u long, v long")
    with pytest.raises(ValueError, match="exactly one"):
        graph.label_propagation(df, 3, df.selectExpr("u as s", "v as d"))
    with pytest.raises(ValueError, match="exactly one"):
        graph.label_propagation()


def test_triangle_multiset_matches_edges_path(spark):
    """The edge_multiset path (in-place dedup on the partitioned
    cache) must produce identical per-node triangle counts as the
    canonical distinct-edges path."""
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    base = sorted(
        (r.node, r.n_tri) for r in graph.triangle_counts(df).collect()
    )
    dup = df.unionAll(df).unionAll(df)  # x3 duplicates
    got = sorted(
        (r.node, r.n_tri)
        for r in graph.triangle_counts(edge_multiset=dup).collect()
    )
    assert got == base and len(got) == 4


def test_components_duplicate_edges_local_path(spark):
    """The local-finish path takes RAW (possibly duplicated) edges —
    connectivity must be unaffected by multiplicity or self-loops."""
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component
           for r in graph.connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
