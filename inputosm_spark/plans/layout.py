"""Corpus layout policy for the 10^12-document design point.

north_rule: "explicit range/hash partitioning of the corpus".
The layout is:

* **hash dimension**: `bucket = pmod(xxhash64(doc_id), n_buckets)` —
  co-locates every per-doc operation (dedup fingerprint joins, span
  reassembly) without a shuffle once tables are written bucketed.
* **range dimension**: `cell_prefix = cell at coarse res (default 3)`
  — partition pruning for spatial queries (a PIP/kNN query touching a
  region reads only its prefix partitions).

With Iceberg: `PARTITIONED BY (bucket(n, doc_id), cell_prefix)` and
the same policy lives in table metadata. Parquet fallback: directory
partitioning by cell_prefix + stable bucket column (Spark can't
bucket-write plain parquet files with .partitionBy alone, so the
bucket is materialized as a column and joins co-locate via
repartition on it).

Sizing guidance (100 TB corpus, ~100 KB/doc -> 10^9 rows/bucket at
n_buckets=1024 is too coarse; target <= 1 GB per file):
n_buckets = corpus_bytes / (cells_per_prefix * 512 MB). The default
256 suits the test scales; bench.py overrides via env.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inputosm_spark.functions import cells

DEFAULT_BUCKETS = 256
DEFAULT_PREFIX_RES = 3


def with_layout_columns(
    df: DataFrame,
    id_col: str = "doc_id",
    lat_col: str = "lat_e4",
    lon_col: str = "lon_e4",
    n_buckets: int = DEFAULT_BUCKETS,
    prefix_res: int = DEFAULT_PREFIX_RES,
) -> DataFrame:
    """Attach (bucket, cell_prefix) layout columns."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    ).withColumn("cell_prefix", cells.cell_id_expr(lat_col, lon_col, prefix_res))


def write_corpus(df: DataFrame, path: str, n_files_per_partition: int = 1) -> None:
    """Materialize with the layout: directory-partitioned by
    cell_prefix, files clustered by bucket (repartition on both so each
    task writes one coherent file per (prefix, bucket-group))."""
    (
        df.repartition(F.col("cell_prefix"), F.col("bucket"))
        .sortWithinPartitions("bucket", "doc_id")
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )


def write_corpus_zordered(
    df: DataFrame,
    path: str,
    lat_col: str = "lat_e4",
    lon_col: str = "lon_e4",
    res: int = 8,
    n_files: int = 8,
) -> None:
    """Z-ORDER clustered materialization: rows are range-partitioned
    and sorted by their Morton code (functions/cells.morton_expr), so
    each parquet file covers a COMPACT 2-D region and the footer
    min/max stats on (cell, lat, lon) prune spatial queries from a
    plain 1-D sort — the standard lakehouse layout trick (Delta/Iceberg
    OPTIMIZE ZORDER), expressed as pure Catalyst integer math. Use for
    read-heavy spatial corpora; `write_corpus` (bucket x prefix) when
    per-doc join co-location matters more."""
    z = df.withColumn("__z", cells.morton_expr(lat_col, lon_col, res))
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def explain_pruning(spark, path: str, prefix_values: list[int]) -> str:
    """Read back with a prefix filter and return the physical plan —
    used by tests to assert partition pruning actually happens."""
    df = spark.read.parquet(path).filter(F.col("cell_prefix").isin(prefix_values))
    return df._jdf.queryExecution().executedPlan().toString()


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    key: str = "doc_id",
    n_buckets: int = 8,
) -> None:
    """Materialize as a Spark BUCKETED + sorted table (metastore-backed,
    external data at `path`): `bucketBy(n, key).sortBy(key)` records the
    hash-layout in table metadata, so every subsequent equi-join or
    aggregation on `key` between same-bucketed tables runs WITHOUT an
    Exchange — Catalyst proves both sides share the partitioning and
    plans a zero-shuffle SortMergeJoin over the pre-sorted buckets.

    This is the managed twin of `with_layout_columns`' explicit bucket
    column (parquet fallback) and of SURVEY §1.2's Iceberg
    `PARTITIONED BY (bucket(n, doc_id), ...)` mapping: at 100 TB the
    repeated per-doc joins (dedup verify, span reassembly, lineage
    checks) amortize ONE layout write into shuffle-free reads forever.
    `tests/test_layout.py` asserts the no-Exchange join plan.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )


def plan_compaction(
    spark, path: str, target_bytes: int = 512 << 20
) -> DataFrame:
    """Small-file compaction PLANNER for a `write_corpus`-layout
    corpus: one row per cell_prefix directory with its current file
    count / byte size and the target file count after bin-packing to
    `target_bytes` — the maintenance pass every long-lived 100 TB
    table needs (streaming sinks and incremental appends accrete
    KB-scale files; every one costs a task + a footer read per query).

    Driver-light: file statistics come from the FileSystem listing
    Spark itself maintains for the read (`input_file_name` + a
    map-side length lookup would rescan data; listing status objects
    does not). Returns (cell_prefix, n_files, bytes, target_files,
    needs_compaction) so callers compact ONLY the partitions that are
    actually fragmented — at 10^12 docs, rewriting healthy partitions
    is the expensive mistake.
    """
    import os

    from pyspark.sql import Row

    rows = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("cell_prefix="):
            continue
        pdir = os.path.join(path, entry)
        sizes = [
            os.path.getsize(os.path.join(pdir, f))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        total = sum(sizes)
        target = max(1, -(-total // target_bytes))  # ceil-div
        rows.append(
            Row(
                cell_prefix=int(entry.split("=", 1)[1]),
                n_files=len(sizes),
                bytes=total,
                target_files=target,
                needs_compaction=len(sizes) > target,
            )
        )
    return spark.createDataFrame(rows)


def compact_partition(spark, path: str, cell_prefix: int,
                      target_files: int) -> None:
    """Rewrite ONE fragmented cell_prefix partition to its target file
    count, preserving the in-file clustering contract (bucket, doc_id
    sort). Write-then-swap: the compacted output lands in a sibling
    temp dir and replaces the partition directory only after the write
    commits — a crash mid-compaction leaves the original intact (the
    Iceberg path gets this via snapshot commit; this is the parquet
    fallback's equivalent)."""
    import os
    import shutil

    pdir = os.path.join(path, f"cell_prefix={cell_prefix}")
    tmp = pdir + ".compact_tmp"
    (
        spark.read.parquet(pdir)
        .repartition(target_files, F.col("bucket"))
        .sortWithinPartitions("bucket", "doc_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    shutil.rmtree(pdir)
    os.rename(tmp, pdir)
