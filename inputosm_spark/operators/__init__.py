"""Operator library: DataFrame -> DataFrame functions."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition a narrow input before an expensive row-expanding
    stage (explode/shingle/UDF) when it has too few partitions.

    Small dimension files arrive as 1-2 splits; without this, an
    explode that fans 5k rows into 500k runs serially in one task and
    the cluster idles (the reference hits the same issue when a PBF
    has few blobs — its fix is the shared work queue,
    /root/reference/src/inputosmpbf.cpp:854-870). At real scale inputs
    already have >= cores splits and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
