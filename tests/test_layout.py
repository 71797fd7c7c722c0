"""Corpus layout policy: bucket/cell-prefix columns, partitioned write,
and partition pruning on read-back (north_rule explicit range/hash
partitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.functions import cells
from inputosm_spark.plans import layout
from inputosm_spark.sources.registry import load_table


def _docs_with_points(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lat, lon = cells.point_exprs("doc_id")
    return docs.select("doc_id", "n_chars", lat, lon)


def test_layout_columns_are_stable(spark, sf_dir):
    df = layout.with_layout_columns(_docs_with_points(spark, sf_dir), n_buckets=32)
    a = df.select("doc_id", "bucket", "cell_prefix")
    b = layout.with_layout_columns(
        _docs_with_points(spark, sf_dir).repartition(13), n_buckets=32
    ).select("doc_id", "bucket", "cell_prefix")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert df.filter((F.col("bucket") < 0) | (F.col("bucket") >= 32)).isEmpty()


def test_write_read_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    df = layout.with_layout_columns(_docs_with_points(spark, sf_dir), n_buckets=16)
    out = str(tmp_path / "corpus")
    layout.write_corpus(df, out)

    back = spark.read.parquet(out)
    assert back.count() == df.count()

    # pick one existing prefix; the filtered physical plan must show a
    # pruned partition count (PartitionFilters reach the scan)
    one = back.select("cell_prefix").first().cell_prefix
    plan = layout.explain_pruning(spark, out, [int(one)])
    assert "PartitionFilters" in plan
    got = back.filter(F.col("cell_prefix") == int(one)).count()
    want = df.filter(F.col("cell_prefix") == int(one)).count()
    assert got == want > 0


def test_zorder_write_clusters_files_spatially(spark, tmp_path):
    """Each z-ordered file must cover a COMPACT Morton range: the sum
    of per-file (max_z - min_z) spans is far below the random layout's
    (which makes every file span ~the whole space). This is the
    file-skipping property the layout exists for."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from inputosm_spark.functions import cells as cellfn
    from inputosm_spark.plans import layout

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        *cellfn.point_exprs("id"),
    )
    zdir = tmp_path / "zordered"
    layout.write_corpus_zordered(df, str(zdir), n_files=8)
    rnd = tmp_path / "random"
    df.repartition(8).write.parquet(str(rnd))

    def file_spans(d):
        spans = []
        for p in sorted(d.glob("part-*.parquet")):
            t = pq.read_table(p, columns=["lat_e4", "lon_e4"])
            import numpy as np

            la = t["lat_e4"].to_numpy()
            lo = t["lon_e4"].to_numpy()
            spans.append(
                (la.max() - la.min()) / 1.8e6 * (lo.max() - lo.min()) / 3.6e6
            )
        return spans

    z_spans = file_spans(zdir)
    r_spans = file_spans(rnd)
    assert len(z_spans) >= 4
    # random files each cover ~the whole unit square; z-ordered files
    # must average far less area
    assert sum(z_spans) / len(z_spans) < 0.5 * sum(r_spans) / len(r_spans)


def test_morton_expr_matches_python_interleave(spark):
    """Catalyst Morton == a straightforward per-value Python
    interleave over the same grid coords."""
    from pyspark.sql import functions as F

    from inputosm_spark import geo
    from inputosm_spark.functions import cells as cellfn

    res = 8
    df = spark.range(500).select(
        F.col("id"), *cellfn.point_exprs("id")
    ).select(
        "id", "lat_e4", "lon_e4",
        cellfn.morton_expr("lat_e4", "lon_e4", res).alias("m"),
        cellfn.cell_x_expr("lon_e4", res).alias("x"),
        cellfn.cell_y_expr("lat_e4", res).alias("y"),
    )
    for r in df.collect():
        want = 0
        for i in range(res + 1):
            want += ((r.x >> i) & 1) << (2 * i)
            if i < res:
                want += ((r.y >> i) & 1) << (2 * i + 1)
        assert r.m == want, (r.id, r.x, r.y)


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with ZERO Exchange —
    Catalyst recognizes the shared hash layout from table metadata (the
    amortize-one-write, shuffle-free-joins-forever contract); the same
    join against an UNbucketed table must shuffle that side."""
    from inputosm_spark.plans import layout

    a = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 31 % 101).alias("y")
    )
    layout.write_bucketed_table(a, "bt_a", str(tmp_path / "bt_a"), n_buckets=8)
    layout.write_bucketed_table(b, "bt_b", str(tmp_path / "bt_b"), n_buckets=8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (at 100 TB neither side broadcasts
        # — that regime, not the tiny-fixture broadcast, is under test)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("bt_a"), spark.table("bt_b")
        joined = ta.join(tb, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000

        # control: joining the bucketed table to a raw DataFrame must
        # exchange the unbucketed side
        raw = spark.range(0, 10_000).select(F.col("id").alias("doc_id"))
        plan2 = ta.join(raw, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_compaction_planner_and_partition_rewrite(spark, sf_dir, tmp_path):
    """Fragment a corpus (many tiny files per partition), plan
    compaction, rewrite only the flagged partitions, and verify:
    (a) the planner's counts match the filesystem, (b) the rewrite
    hits the target file count, (c) row-level content is IDENTICAL
    after the swap, (d) healthy partitions are left untouched."""
    import glob
    import os

    df = layout.with_layout_columns(
        _docs_with_points(spark, sf_dir), n_buckets=8
    )
    out = str(tmp_path / "frag_corpus")
    # deliberately fragment: one file per (prefix, bucket) pair
    (
        df.repartition(24, F.col("cell_prefix"), F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(out)
    )
    # materialize BEFORE compaction deletes the original files
    before = spark.read.parquet(out).localCheckpoint(eager=True)
    rows_before = before.count()
    plan = layout.plan_compaction(spark, out, target_bytes=1 << 30).collect()
    assert len(plan) > 0
    mtimes_untouched = {}
    for p in plan:
        pdir = os.path.join(out, f"cell_prefix={p.cell_prefix}")
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        assert len(files) == p.n_files
        assert p.target_files == 1  # 1 GB target swallows test data
        if not p.needs_compaction:
            mtimes_untouched[p.cell_prefix] = sorted(files)
    victims = [p for p in plan if p.needs_compaction]
    assert victims, "fragmented fixture must need compaction"
    for p in victims:
        layout.compact_partition(spark, out, p.cell_prefix, p.target_files)
    after = spark.read.parquet(out)
    assert after.count() == rows_before
    assert after.exceptAll(before).isEmpty()
    assert before.exceptAll(after).isEmpty()
    for p in victims:
        pdir = os.path.join(out, f"cell_prefix={p.cell_prefix}")
        assert len(glob.glob(os.path.join(pdir, "*.parquet"))) == p.target_files
        assert not os.path.exists(pdir + ".compact_tmp")
    for cp, files in mtimes_untouched.items():
        pdir = os.path.join(out, f"cell_prefix={cp}")
        assert sorted(glob.glob(os.path.join(pdir, "*.parquet"))) == files
