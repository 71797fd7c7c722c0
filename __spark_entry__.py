"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: `inputosm_spark` (see SURVEY.md §2 for the operator map).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from inputosm_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: interleave the flat
    documents table into the spans corpus (BASELINE.json input_hint
    shape), derive each doc's deterministic point, assign grid cells
    at res 7, and roll up per-cell document/span statistics — the
    engine's core scan→index→aggregate path.
    """
    # Same UTC pin queries() applies: the driver's session timezone is
    # host-dependent and the testdata parquet is TZ-naive.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return queries_catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents for each queries() entry."""
    return queries_catalog.oracle_sql()
