"""Skew-aware aggregation and repartitioning (north_star: dense metro
cells are the canonical hot keys).

The reference load-balances skewed PBF blocks with a dynamic work
queue (/root/reference/src/inputosmpbf.cpp:854-870); at the shuffle
layer that becomes (a) AQE skew-join splitting (enabled in session.py)
and (b) the explicit salted two-level aggregation here, which bounds
any single reducer's share of a hot key to 1/n_salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salt: int = 16) -> DataFrame:
    """Two-level skew-proof count: groupBy(key, salt) partial ->
    groupBy(key) final. Result identical to a plain groupBy(key).count()
    (asserted by the `salted_cell_count` oracle); the partial stage
    spreads each hot key over n_salt reducers.

    Salt is derived from the row's position (monotonically_increasing_id:
    partition ordinal + offset) — content-independent, so even EXACT
    DUPLICATE rows of a hot key scatter across all n_salt reducers
    (a content hash would send every duplicate to one reducer, which is
    precisely the skew being fought). No RNG: rerunning the same input
    partitioning yields the same salts.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)).alias("__salt")
    partial = (
        df.select(F.col(key), salt)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__pcnt"))
    )
    return partial.groupBy(key).agg(F.sum("__pcnt").alias("cnt"))


def salted_agg(
    df: DataFrame, key: str, aggs: dict[str, str], n_salt: int = 16
) -> DataFrame:
    """Two-level general aggregation for decomposable functions.

    aggs maps column -> one of sum|count|min|max. Each is computed
    per (key, salt) then re-merged per key — algebraic re-association,
    exact for these functions.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {
        c: (F.count(c) if how == "count" else getattr(F, how)(c)).alias(f"__p_{c}")
        for c, how in aggs.items()
    }
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)).alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*first.values())
    final = partial.groupBy(key).agg(
        *[
            merge[how](f"__p_{c}").alias(f"{how}_{c}")
            for c, how in aggs.items()
        ]
    )
    return final


def hot_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01) -> DataFrame:
    """Detect hot keys: keys holding more than threshold_ratio of all
    rows. ONE scan of df: the per-key count table is cached (it feeds
    both the total and the filter — Spark shares no cross-branch
    subplan) and the scalar total joins back as a broadcast, instead of
    a second full df.count() pass over the raw data. Feed into
    `repartition_salted` so only hot keys pay the salting cost.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("cnt")).cache()
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("__total") * threshold_ratio)
        .select(key, "cnt")
    )


def repartition_salted(
    df: DataFrame, key: str, hot: DataFrame, n_salt: int = 16
) -> DataFrame:
    """Repartition on (key, salt-for-hot-keys-only): cold keys keep
    salt 0 (co-located as usual); rows of hot keys scatter over n_salt
    partitions. Join with the (tiny, broadcast) hot-key set decides the
    policy per row.
    """
    hot_marked = F.broadcast(hot.select(F.col(key), F.lit(True).alias("__hot")))
    salted = (
        df.join(hot_marked, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    return salted.repartition(F.col(key), F.col("__salt"))
