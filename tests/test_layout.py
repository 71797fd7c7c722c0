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
