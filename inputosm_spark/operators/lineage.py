"""Per-partition lineage + idempotent stage resume (north_star).

Every stage that materializes a table also appends one lineage row per
output partition: (stage, partition_id, cell_range, row_count,
checksum). A re-run of the stage anti-joins its input partitions
against the completed lineage and processes only the remainder —
resume-from-checkpoint without streaming state, exactly the "which
blocks are done" bookkeeping the reference gets for free from its
sequential blob queue (/root/reference/src/inputosmpbf.cpp:843-851),
re-expressed for a distributed, restartable world.

`partition_id` here is a *logical* partition: the hash bucket of the
unit key (doc_id / cell prefix), stable across cluster sizes — not
spark_partition_id(), which would change with parallelism. Checksums
are order-insensitive sums of xxhash64 over the canonical row
projection, so they are plan-independent.

With the Iceberg jar present the lineage table is an Iceberg table and
appends are atomic snapshots; the parquet fallback keeps the same
schema in a directory (append-only writes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inputosm_spark.session import has_iceberg

LINEAGE_COLS = [
    "stage",
    "partition_id",
    "cell_range_lo",
    "cell_range_hi",
    "row_count",
    "checksum",
]


def compute_lineage(
    df: DataFrame,
    stage: str,
    bucket_col: str,
    n_buckets: int = 256,
    cell_col: str | None = None,
) -> DataFrame:
    """Lineage rows for a stage output.

    bucket_col: key column whose hash defines the logical partition.
    cell_col: optional grid-cell column -> per-partition cell range.
    checksum: bigint sum of xxhash64 over all columns (order-insensitive,
    overflow wraps — stable because Spark bigint sum wraps identically
    everywhere ANSI is off; we sum pmod 2^62 to stay ANSI-safe).
    """
    pid = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).alias(
        "partition_id"
    )
    row_hash = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1 << 40))
    base = df.select(pid, row_hash.alias("__h"),
                     *( [F.col(cell_col).alias("__cell")] if cell_col else [] ))
    aggs = [
        F.count("*").alias("row_count"),
        F.sum("__h").alias("checksum"),
    ]
    if cell_col:
        aggs = [F.min("__cell").alias("cell_range_lo"),
                F.max("__cell").alias("cell_range_hi")] + aggs
    out = base.groupBy("partition_id").agg(*aggs)
    if not cell_col:
        out = out.withColumn("cell_range_lo", F.lit(None).cast("long")).withColumn(
            "cell_range_hi", F.lit(None).cast("long")
        )
    return out.select(
        F.lit(stage).alias("stage"),
        F.col("partition_id").cast("int"),
        "cell_range_lo",
        "cell_range_hi",
        "row_count",
        "checksum",
    )


def neutral_lineage(
    df: DataFrame,
    id_col: str,
    n_buckets: int = 64,
    cell_col: str | None = None,
) -> DataFrame:
    """Engine-neutral lineage rows (the oracle-checkable twin of
    compute_lineage): bucket = id % n_buckets, checksum = wrapped sum of
    a modular id hash — pure integer arithmetic replayable in any SQL
    engine, so the lineage itself is correctness-gated.
    """
    from inputosm_spark import geo

    pid = F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)).cast("int")
    row_hash = F.pmod(
        F.col(id_col).cast("long") * F.lit(geo.HASH_MUL_LAT), F.lit(1 << 40)
    )
    aggs = [
        F.count("*").alias("row_count"),
        F.sum(row_hash).alias("checksum"),
    ]
    if cell_col:
        aggs += [
            F.min(cell_col).alias("cell_range_lo"),
            F.max(cell_col).alias("cell_range_hi"),
        ]
    return df.groupBy(pid.alias("partition_id")).agg(*aggs)


class LineageStore:
    """Append-only lineage checkpoint table (Iceberg or parquet dir)."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self.iceberg = location.startswith("local.") and has_iceberg(spark)

    def append(self, lineage: DataFrame) -> None:
        if self.iceberg:
            lineage.writeTo(self.location).append()
        else:
            lineage.write.mode("append").parquet(self.location)

    def read(self) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self.location)
        if not _exists(self.location):
            return self.spark.createDataFrame([], schema=_lineage_ddl())
        return self.spark.read.parquet(self.location)

    def completed_partitions(self, stage: str) -> DataFrame:
        return self.read().filter(F.col("stage") == stage).select("partition_id")


def _exists(path: str) -> bool:
    return os.path.exists(path)


def _lineage_ddl() -> str:
    return (
        "stage string, partition_id int, cell_range_lo long, "
        "cell_range_hi long, row_count long, checksum long"
    )


def resume_filter(
    df: DataFrame,
    store: LineageStore,
    stage: str,
    bucket_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Rows of `df` whose logical partition has NOT completed `stage` —
    the idempotent-resume primitive: work = input ⟕̸ lineage (anti-join
    on partition_id, broadcast: lineage is tiny).
    """
    pid = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    done = store.completed_partitions(stage)
    return (
        df.withColumn("__pid", pid.cast("int"))
        .join(F.broadcast(done), F.col("__pid") == done.partition_id, "left_anti")
        .drop("__pid")
    )


def run_stage_idempotent(
    spark: SparkSession,
    df: DataFrame,
    stage: str,
    store: LineageStore,
    out_path: str,
    bucket_col: str,
    n_buckets: int = 256,
    cell_col: str | None = None,
) -> int:
    """Execute a materialization stage with resume semantics.

    Filters out already-completed logical partitions, writes the rest
    (parquet append / Iceberg append), then checkpoints their lineage.
    Returns the number of rows written this run (0 == fully resumed).
    """
    todo = resume_filter(df, store, stage, bucket_col, n_buckets)
    if todo.isEmpty():
        return 0
    lineage = compute_lineage(todo, stage, bucket_col, n_buckets, cell_col)
    if store.iceberg and out_path.startswith("local."):
        todo.writeTo(out_path).append()
    else:
        todo.write.mode("append").parquet(out_path)
    store.append(lineage)
    return todo.count()
