"""Relational parity operators (SURVEY.md §2.2-2.6).

Each mirrors a reference workload (file:line cited per function) but is
declared as a lazy DataFrame plan — Catalyst plans partial/final hash
aggregation, broadcast vs shuffle joins, and column pruning, replacing
the reference's hand-rolled per-thread accumulators
(/root/reference/test/integration/counter.h:10-41) and driver-side
hash maps.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_all(tables: dict[str, DataFrame]) -> DataFrame:
    """COUNT per entity stream — count_all.cpp:42-73. Partial counts per
    partition + final merge == Spark's two-phase HashAggregate; the
    union of per-stream counts replaces the per-thread vectors merged
    at :70-73.
    """
    parts = [
        df.agg(F.count("*").alias("cnt")).select(F.lit(name).alias("entity"), "cnt")
        for name, df in tables.items()
    ]
    return reduce(DataFrame.unionAll, parts)


def statistics(lineitem: DataFrame) -> DataFrame:
    """MAX / conditional-count / SUM block — statistics.cpp:41-211.
    max id (:73-98), max timestamp, has-X conditional counts (:92-93),
    sum of sizes (:83-86) — one single-pass aggregate.
    """
    return lineitem.agg(
        F.max("l_orderkey").alias("max_orderkey"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_shipdate"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count_if(F.col("l_discount") > 0).alias("n_discounted"),
        F.count_if(F.col("l_tax") > 0).alias("n_taxed"),
    )


def lat_histogram(points: DataFrame) -> DataFrame:
    """1° latitude histogram + percent-of-total — lat_stat.cpp:38-84.
    The reference's per-thread 91-bin counter arrays merge into a
    groupBy(deg) with a window for the percent line (:72-84).
    Expects a single `lat_e4` column.
    """
    counts = (
        points.select(F.floor(F.abs(F.col("lat_e4")) / 10000).alias("deg"))
        .groupBy("deg")
        .agg(F.count("*").alias("cnt"))
    )
    total = Window.partitionBy()
    return counts.select(
        "deg",
        "cnt",
        F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(total), 4).alias("pct"),
    )


def semi_lookup_join(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Two-pass ID semi-join — extract_ferries.cpp:43-107. The
    reference collects matching IDs into a driver-side map and rescans;
    here the filtered dimension is broadcast and Spark's
    BroadcastHashJoin probes it executor-side in one pass (the :97
    lat/lon assignment bug is, naturally, not replicated).
    """
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        lineitem.join(
            F.broadcast(urgent), lineitem.l_orderkey == urgent.o_orderkey, "left_semi"
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_partkey").alias("partkey"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )


def ordered_assembly(lineitem: DataFrame) -> DataFrame:
    """Ordered child-sequence reassembly — export_csv.cpp:125-212
    (LINESTRING assembly from way node refs). collect_list of
    (seq, value) structs + array_sort preserves the reference's
    order-significant semantics without a sort shuffle of the rows.
    """
    # (seq, val) can repeat seq in the synthetic data — sort on the
    # full numeric (seq, val) pair so the order is total and identical
    # in every engine.
    return (
        lineitem.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("l_linenumber").alias("seq"),
                                F.col("l_partkey").alias("val"),
                            )
                        )
                    ),
                    lambda s: s.val.cast("string"),
                ),
                ",",
            ).alias("parts_path"),
            F.count("*").alias("n_items"),
        )
    )
