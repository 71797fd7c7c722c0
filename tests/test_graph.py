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
    in O(log n): max_iter=12 would RAISE if it didn't."""
    edges = [(i, i + 1) for i in range(1000)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component
           for r in graph.connected_components(df, max_iter=12).collect()}
    assert set(got.values()) == {0} and len(got) == 1001


def test_nonconvergence_raises(spark):
    """Exhausting max_iter without a fixpoint is an error, not a silent
    wrong answer."""
    import pytest

    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iter=1)
