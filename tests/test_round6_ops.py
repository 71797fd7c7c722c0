"""Round-6 gates: HLL error envelope, degree-oriented triangles,
hermetic PBF roundtrip, shared LSH band format."""

from __future__ import annotations

import glob
import os
import tempfile
from itertools import combinations

import pytest
from pyspark.sql import functions as F


def test_approx_distinct_cells_error_bound(spark, sf_dir):
    """r6 directive #2: `approx_distinct_cells` is the one catalog
    entry with no cross-engine oracle (HLL++ is engine-specific).
    Bound it instead: every group's estimate must sit within a 5x-rsd
    envelope of the oracle-gated exact twin (rsd=0.01; HLL++ under a
    fixed hash is DETERMINISTIC, so this is a stable gate, not a
    flaky statistical one), and the n_docs side must match exactly."""
    from inputosm_spark.queries_catalog import queries

    q = queries()
    approx = {
        r.cell3: (r.approx_cells9, r.n_docs)
        for r in q["approx_distinct_cells"](spark, sf_dir).collect()
    }
    exact = {
        r.cell3: (r.n_cells9, r.n_docs)
        for r in q["distinct_cells_exact"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for cell3, (est, nd) in approx.items():
        true, nd_exact = exact[cell3]
        assert nd == nd_exact
        assert abs(est - true) <= max(5, 0.05 * true), (
            f"cell3={cell3}: HLL estimate {est} outside 5x-rsd "
            f"envelope of exact {true}"
        )


def _brute_triangles(edges):
    es = set(edges)
    want: dict[int, int] = {}
    nodes = sorted({n for e in edges for n in e})
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    return want


def test_triangle_counts_hub_skew_orientations_agree(spark):
    """r5 verdict #5: a hub node of degree ~n. Under id-order
    orientation the hub (id 0) would own ~n^2 wedges; degree
    orientation points every star edge AT the hub (its out-degree
    drops to ~0) so wedge fan-out is bounded by the arboricity. The
    triangle SET must be identical under both orientations and match
    brute force."""
    from inputosm_spark.operators import graph

    n = 60
    edges = sorted(
        {(0, i) for i in range(1, n)}
        | {(1, 2), (3, 4), (5, 6), (10, 11), (11, 12), (20, 21)}
    )
    df = spark.createDataFrame(edges, "u long, v long")
    by_deg = {
        r.node: r.n_tri
        for r in graph.triangle_counts(df, degree_orient=True).collect()
    }
    by_id = {
        r.node: r.n_tri
        for r in graph.triangle_counts(df, degree_orient=False).collect()
    }
    want = _brute_triangles(edges)
    assert by_deg == want
    assert by_id == want
    assert want[0] >= 6  # the hub really is in many triangles


def test_pbf_roundtrip_hermetic(spark, sf_dir):
    """r6 directive #1: two interleaved invocations must not share any
    filesystem state — build A, build B (which under the old fixed
    sf-keyed dir would rmtree/rewrite A's shards), then read A. Both
    must agree, and no shard temp dirs may survive."""
    from inputosm_spark.queries_catalog import _pbf_roundtrip_frame

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "inputosm_pbf_rt_*")))
    a = _pbf_roundtrip_frame(spark, sf_dir, mod=4)
    b = _pbf_roundtrip_frame(spark, sf_dir, mod=4)
    rows_a = sorted(
        (r.id, r.raw_lat, r.raw_lon, r.changeset)
        for r in a.select("id", "raw_lat", "raw_lon", "changeset").collect()
    )
    rows_b = sorted(
        (r.id, r.raw_lat, r.raw_lon, r.changeset)
        for r in b.select("id", "raw_lat", "raw_lon", "changeset").collect()
    )
    assert rows_a == rows_b and len(rows_a) > 0
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "inputosm_pbf_rt_*")))
    assert after == before  # every invocation cleans its own mkdtemp


def test_minhash_bands_single_pass_and_format(spark):
    """The band_val format is load-bearing for persisted bucketed
    history tables (minhash_bands docstring): pin it — band b's value
    is 'sig_{2b}|sig_{2b+1}' — and assert the explode-based fan-out
    emits exactly n_bands rows per doc (one upstream pass, no
    unionAll re-execution)."""
    from inputosm_spark.operators import dedup

    sigs = spark.createDataFrame(
        [("d1", "aa", "bb", "cc", "dd")],
        "doc_id string, sig_0 string, sig_1 string, "
        "sig_2 string, sig_3 string",
    )
    rows = sorted(
        (r.band, r.band_val)
        for r in dedup.minhash_bands(sigs, 2, 2).collect()
    )
    assert rows == [(0, "aa|bb"), (1, "cc|dd")]
    plan = dedup.minhash_bands(sigs, 2, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan  # explode fan-out, not unionAll branches


def test_lsh_candidate_pairs_uses_shared_banding(spark):
    """Guard against format drift between the self-join path and the
    incremental/bucketed-history path: both must produce candidate
    pairs from the SAME band rows."""
    from inputosm_spark.operators import dedup

    docs = spark.createDataFrame(
        [("1", "a b c d e"), ("2", "a b c d f"), ("3", "x y z w q")],
        "doc_id string, text string",
    )
    sigs = dedup.minhash_signatures(dedup.word_shingles(docs, n=3), 4)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, 2, 2).collect()
    }
    bands = dedup.minhash_bands(sigs, 2, 2)
    manual = {
        (r.a, r.b)
        for r in bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
        .collect()
    }
    assert pairs == manual and ("1", "2") in pairs
