"""Lineage + idempotent resume (north_star): per-partition lineage rows
are stable across plans/parallelism, and a re-run of a materialization
stage writes nothing new.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.operators import lineage
from inputosm_spark.sources.registry import load_table


def test_lineage_is_plan_independent(spark, sf_dir):
    """Same lineage regardless of partitioning/ordering of the input —
    checksums are order-insensitive sums over logical buckets."""
    docs = load_table(spark, sf_dir, "documents")
    a = lineage.compute_lineage(docs, "stage_a", "doc_id", n_buckets=32)
    b = lineage.compute_lineage(
        docs.repartition(17).sortWithinPartitions(F.desc("doc_id")),
        "stage_a", "doc_id", n_buckets=32,
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_lineage_row_counts_cover_input(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lin = lineage.compute_lineage(docs, "s", "doc_id", n_buckets=8)
    total = lin.agg(F.sum("row_count")).first()[0]
    assert total == docs.count()
    assert lin.count() <= 8


def test_stage_resume_is_idempotent(spark, sf_dir, tmp_path):
    """First run writes everything; second run (same lineage store)
    writes zero rows; output row count is unchanged."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = lineage.LineageStore(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")

    n1 = lineage.run_stage_idempotent(
        spark, docs, "stage1", store, out, bucket_col="doc_id", n_buckets=16
    )
    assert n1 == docs.count()
    n2 = lineage.run_stage_idempotent(
        spark, docs, "stage1", store, out, bucket_col="doc_id", n_buckets=16
    )
    assert n2 == 0
    assert spark.read.parquet(out).count() == docs.count()


def test_partial_resume_processes_only_missing_buckets(spark, sf_dir, tmp_path):
    """Simulate a crash after half the buckets: resume processes the
    complement exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = lineage.LineageStore(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")

    half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(16)) < 8)
    lineage.run_stage_idempotent(
        spark, half, "stage1", store, out, bucket_col="doc_id", n_buckets=16
    )
    n_resumed = lineage.run_stage_idempotent(
        spark, docs, "stage1", store, out, bucket_col="doc_id", n_buckets=16
    )
    other_half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(16)) >= 8)
    assert n_resumed == other_half.count()
    assert spark.read.parquet(out).count() == docs.count()


def test_neutral_lineage_matches_direct_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lin = lineage.neutral_lineage(docs, "doc_id", n_buckets=64)
    direct = docs.groupBy(
        F.pmod(F.col("doc_id"), F.lit(64)).cast("int").alias("partition_id")
    ).agg(F.count("*").alias("row_count"))
    j = lin.join(direct, "partition_id")
    assert j.filter(lin.row_count != direct.row_count).isEmpty()
