"""Operator library: DataFrame -> DataFrame functions."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: (applicationId, semanticHash) -> partition count.
#: `df.rdd.getNumPartitions()` pays ~40-75 ms of driver-side physical
#: planning per call; the frames passed here are narrow projections of
#: the registry's immutable read plans, re-derived per invocation, so
#: the memo keys on the ~0.7 ms `semanticHash()` of the analyzed plan
#: (measured 41 ms -> 0.7 ms per probe). Semantically-equal plans
#: physical-plan to the same partition count under a fixed session
#: conf; a (rare) int32 hash collision can only mis-decide the
#: REPARTITION heuristic below — a performance knob, never results.
#: No data or results are cached (the read-plan-memo contract), and
#: the applicationId key fences restarted sessions.
_NPARTS_MEMO: dict[tuple[str, int], int] = {}


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
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    key = (sc.applicationId, df.semanticHash())
    n = _NPARTS_MEMO.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _NPARTS_MEMO[key] = n
    if n < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
