"""Partition-layout invariance gate (round 5).

Several operators derive SALTS or pre-prune keys from the physical
layout (`spark_partition_id` in domain_topk's two-phase top-k,
`monotonically_increasing_id`-seeded salts in skew.py / temporal.py).
Layout-derived values are fine for DISTRIBUTION — but the final result
must be a pure function of the data, or the driver's oracle hash (and
any rerun at different parallelism) breaks. This gate runs the
layout-sensitive oracle queries under two different shuffle-partition
settings and asserts identical results — the regression test for
"salt leaked into the answer"."""

from __future__ import annotations

from inputosm_spark.oracle_compare import frame_hash

# every query whose plan contains spark_partition_id or a
# monotonically_increasing_id-derived salt, plus the flagship
LAYOUT_SENSITIVE = [
    "domain_cap",          # spark_partition_id pre-prune window
    "salted_cell_count",   # position-derived salt, two-level agg
    "asof_user_state",     # salted carry in the bucketed as-of
    "flagship",
]


def test_results_invariant_under_shuffle_partitioning(spark, sf_dir):
    import __spark_entry__ as m

    qs = m.queries()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in LAYOUT_SENSITIVE:
                df = qs[name](spark, sf_dir).toPandas()
                results.setdefault(name, []).append(frame_hash(df))
        bad = [n for n, (a, b) in results.items() if a != b]
        assert not bad, f"layout-dependent results: {bad}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
