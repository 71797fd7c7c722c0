"""extract_ferries workload parity
(/root/reference/test/integration/extract_ferries.cpp:23-111): the
reference's canonical two-pass query — filter ways by tag, collect
their unique node ids, rescan nodes to attach coordinates — expressed
as ONE Spark DAG (filter -> explode -> distinct -> broadcast join)
and checked against a driver-side Python oracle on the synthetic
OSM tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.datagen import synth_nodes, synth_ways

N_NODES = 2_000
N_WAYS = 400


def _tables(spark):
    return synth_nodes(spark, N_NODES), synth_ways(spark, N_WAYS, N_NODES)


def test_ferry_filter_count(spark):
    """Pass 1 (extract_ferries.cpp:47-62): tag-equality filter."""
    _, ways = _tables(spark)
    ferries = ways.filter(F.col("tags")["route"] == "ferry")
    # datagen: every 4th way is a ferry
    assert ferries.count() == N_WAYS // 4


def test_ferry_nodes_join_matches_oracle(spark):
    """Two-pass ID join as one DAG; oracle = plain Python over
    collected fixtures (the reference's driver-side map,
    extract_ferries.cpp:75-107)."""
    nodes, ways = _tables(spark)
    ferries = ways.filter(F.col("tags")["route"] == "ferry")
    ferry_node_ids = ferries.select(
        F.explode("node_refs").alias("id")
    ).distinct()
    got = (
        nodes.join(F.broadcast(ferry_node_ids), "id")
        .select("id", "raw_lat", "raw_lon")
        .collect()
    )

    # oracle: brute-force in Python
    way_rows = ways.collect()
    want_ids = {
        ref
        for w in way_rows
        if w.tags.get("route") == "ferry"
        for ref in w.node_refs
    }
    node_map = {r.id: (r.raw_lat, r.raw_lon) for r in nodes.collect()}
    want = {(i, *node_map[i]) for i in want_ids if i in node_map}
    assert {(r.id, r.raw_lat, r.raw_lon) for r in got} == want
    # reference bug at extract_ferries.cpp:97 assigned latitude into
    # longitude; assert we did NOT replicate it (lat != lon for these)
    sample = got[0]
    assert sample.raw_lat != sample.raw_lon


def test_ferry_join_plans_broadcast(spark):
    """The reference's driver-side hash map == BroadcastHashJoin; the
    plan must actually broadcast the (small) ferry-node-id side."""
    nodes, ways = _tables(spark)
    ferry_node_ids = (
        ways.filter(F.col("tags")["route"] == "ferry")
        .select(F.explode("node_refs").alias("id"))
        .distinct()
    )
    joined = nodes.join(F.broadcast(ferry_node_ids), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
