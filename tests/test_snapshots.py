"""Snapshot layer contract: append/overwrite commits, time travel,
rollback, atomic publish — Iceberg semantics over plain parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inputosm_spark.plans.snapshots import SnapshotStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_accumulates(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    s0 = store.append(_df(spark, 0, 100))
    s1 = store.append(_df(spark, 100, 150))
    assert (s0, s1) == (0, 1)
    assert store.read().count() == 150
    assert store.read(snapshot_id=s0).count() == 100  # time travel


def test_overwrite_replaces(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 100))
    s1 = store.overwrite(_df(spark, 500, 520))
    assert store.read().count() == 20
    assert store.read().agg(F.min("id")).first()[0] == 500
    assert store.current_id() == s1


def test_rollback_restores_and_keeps_history(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    s0 = store.append(_df(spark, 0, 10))
    s1 = store.append(_df(spark, 10, 20))
    store.rollback(s0)
    assert store.read().count() == 10
    # orphaned snapshot stays time-travel-readable
    assert store.read(snapshot_id=s1).count() == 20
    # a new commit branches from the rolled-back state
    s2 = store.append(_df(spark, 100, 105))
    assert store.read().count() == 15
    assert store.snapshots()[-1]["id"] == s2


def test_empty_table_read_raises(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        store.read()


def test_lineage_plus_snapshots_resume(spark, sf_dir, tmp_path):
    """The full resume story: a stage writes through the snapshot
    store, lineage filters completed buckets — a crashed re-run
    appends only the missing work and the snapshot history shows both
    commits."""
    from inputosm_spark.operators import lineage
    from inputosm_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    store = SnapshotStore(spark, str(tmp_path / "corpus"))
    lstore = lineage.LineageStore(spark, str(tmp_path / "lineage"))

    # "crash" after half the buckets
    half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(8)) < 4)
    todo = lineage.resume_filter(half, lstore, "s", "doc_id", 8)
    store.append(todo)
    lstore.append(lineage.compute_lineage(todo, "s", "doc_id", 8))

    # resume over the FULL input: only the other half is written
    todo2 = lineage.resume_filter(docs, lstore, "s", "doc_id", 8)
    n2 = todo2.count()
    assert n2 == docs.count() - half.count()
    store.append(todo2)
    lstore.append(lineage.compute_lineage(todo2, "s", "doc_id", 8))

    assert store.read().count() == docs.count()
    assert len(store.snapshots()) == 2
    # third run: nothing left
    assert lineage.resume_filter(docs, lstore, "s", "doc_id", 8).isEmpty()
