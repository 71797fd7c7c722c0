"""Registry of driver-facing queries and their DuckDB oracles.

Each entry is one operator from SURVEY.md §2 exercised over the
driver-provided tables at ``sf_dir``. Spark side and SQL side compute
the *same* logical result with the *same* column names; float-typed
aggregates are computed in decimal and rounded before output so the
order-insensitive value-hash matches across engines.

Conventions:
* every computed column is aliased identically in both dialects;
* timestamps leave as formatted strings (engine-neutral);
* doubles are round()ed at a fixed scale;
* deterministic point/cell math comes from functions.cells (Spark
  exprs) and its *_sql twins (DuckDB) — identical integer formulas.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inputosm_spark.datagen import interleave_documents
from inputosm_spark.functions import cells
from inputosm_spark.operators import relational, spans
from inputosm_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship (driver smoke; exercises interleave -> cell index -> rollup)
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-corpus spatial rollup: documents -> spans table ->
    per-doc deterministic point -> res-7 cell -> per-cell doc/span/char
    stats. The engine's scan→index→aggregate core in one plan.
    """
    docs = interleave_documents(_t(spark, sf_dir, "documents"))
    lat, lon = cells.point_exprs(F.col("doc_id").cast("long"))
    indexed = docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.aggregate(
            F.transform("spans", lambda s: F.coalesce(F.length(s.text), F.lit(0))),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("text_chars"),
        cells.cell_id_expr(lat, lon, 7).alias("cell7"),
    )
    return (
        indexed.groupBy("cell7")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("text_chars").alias("text_chars"),
        )
        .orderBy("cell7")
    )


# ---------------------------------------------------------------------------
# A1 — count per entity stream (count_all parity,
# /root/reference/test/integration/count_all.cpp:42-73)
# ---------------------------------------------------------------------------


@register(
    "count_all",
    oracle="""
    SELECT 'orders' AS entity, count(*) AS cnt FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events', count(*) FROM events
    """,
)
def q_count_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.count_all(
        {
            "orders": _t(spark, sf_dir, "orders"),
            "lineitem": _t(spark, sf_dir, "lineitem"),
            "events": _t(spark, sf_dir, "events"),
        }
    )


# ---------------------------------------------------------------------------
# A2/A3/A4 — statistics (max ids/timestamps, conditional counts, sums;
# /root/reference/test/integration/statistics.cpp:41-211)
# ---------------------------------------------------------------------------


@register(
    "statistics",
    oracle="""
    SELECT
      max(l_orderkey)                                   AS max_orderkey,
      strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')    AS max_shipdate,
      count(*)                                          AS n_rows,
      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)   AS sum_qty,
      count(*) FILTER (WHERE l_discount > 0)            AS n_discounted,
      count(*) FILTER (WHERE l_tax > 0)                 AS n_taxed
    FROM lineitem
    """,
)
def q_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.statistics(_t(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# A5 — 1-degree histogram group-by
# (/root/reference/test/integration/lat_stat.cpp:38-84; buckets of
# abs(latitude) in integer degrees + percent-of-total)
# ---------------------------------------------------------------------------

_LAT_SQL, _LON_SQL = cells.point_sql("doc_id")

_LAT_STAT_ORACLE = f"""
WITH pts AS (SELECT {_LAT_SQL} AS lat_e4 FROM documents)
SELECT abs(lat_e4) // 10000 AS deg,
       count(*) AS cnt,
       round(100.0 * count(*) / (SELECT count(*) FROM pts), 4) AS pct
FROM pts GROUP BY 1
"""


@register("lat_stat", oracle=_LAT_STAT_ORACLE)
def q_lat_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lat, _ = cells.point_exprs("doc_id")
    return relational.lat_histogram(docs.select(lat))


# ---------------------------------------------------------------------------
# P3 — tag-equality filter
# (/root/reference/test/integration/extract_ferries.cpp:47-62)
# ---------------------------------------------------------------------------


@register(
    "tag_filter",
    oracle="""
    SELECT event_id, user_id, round(value, 2) AS value
    FROM events WHERE event_type = 'signup'
    """,
)
def q_tag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )


# ---------------------------------------------------------------------------
# J1 — two-pass ID semi-join + lookup join
# (/root/reference/test/integration/extract_ferries.cpp:43-107):
# filter a dimension, semi-join the big stream, attach attributes.
# Spark turns the reference's hand-rolled driver-side hash map into a
# BroadcastHashJoin.
# ---------------------------------------------------------------------------


@register(
    "semi_lookup_join",
    oracle="""
    SELECT l.l_orderkey AS orderkey, l.l_partkey AS partkey,
           CAST(l.l_quantity AS BIGINT) AS qty
    FROM lineitem l
    WHERE l.l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_semi_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.semi_lookup_join(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# J2 — ordered geometry assembly join
# (/root/reference/test/integration/export_csv.cpp:125-212): reassemble
# an ordered child sequence per parent (LINESTRING analog).
# ---------------------------------------------------------------------------


@register(
    "ordered_assembly",
    oracle="""
    SELECT l_orderkey AS orderkey,
           string_agg(CAST(l_partkey AS VARCHAR), ','
                      ORDER BY l_linenumber, l_partkey) AS parts_path,
           count(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_ordered_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.ordered_assembly(_t(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# J3 — member/edge-list unnest
# (/root/reference/test/integration/export_csv.cpp:227-233) — posexplode
# of an ordered nested sequence into edge rows. Demonstrated on the
# interleaved spans corpus (spans == members).
# ---------------------------------------------------------------------------


@register(
    "span_explode",
    oracle=f"""
    WITH docs AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             len(string_split(text, ' ')) AS n_words,
             greatest(least(CAST(ceil(len(string_split(text,' ')) / 8.0) AS BIGINT), 6), 1)
               AS n_chunks
      FROM documents
    )
    SELECT doc_id, CAST(2 * i AS BIGINT) AS offset, 'text' AS kind
    FROM docs, unnest(range(0, n_chunks)) AS t(i)
    """,
)
def q_span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = interleave_documents(_t(spark, sf_dir, "documents"))
    return spans.explode_spans(docs).filter(F.col("kind") == "text").select(
        "doc_id", F.col("offset").cast("long").alias("offset"), "kind"
    )


# ---------------------------------------------------------------------------
# Cell assignment (north_star core): deterministic point + res-7 cell.
# Spark path uses the Catalyst integer expressions (codegen); the UDF
# path is asserted equal in tests/test_cells_spark.py.
# ---------------------------------------------------------------------------

_CELL7_SQL = cells.cell_id_sql(_LAT_SQL, _LON_SQL, 7)


@register(
    "cell_assign",
    oracle=f"""
    SELECT doc_id, {_LAT_SQL} AS lat_e4, {_LON_SQL} AS lon_e4,
           {_CELL7_SQL} AS cell7
    FROM documents
    """,
)
def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lat, lon = cells.point_exprs("doc_id")
    return docs.select(
        "doc_id",
        lat,
        lon,
        cells.cell_id_expr("lat_e4", "lon_e4", 7).alias("cell7"),
    )


# ---------------------------------------------------------------------------
# Cell rollup — per-cell aggregation of the corpus (flagship's oracle
# twin on the flat table).
# ---------------------------------------------------------------------------

_CELL5_SQL = cells.cell_id_sql(_LAT_SQL, _LON_SQL, 5)


@register(
    "cell_rollup",
    oracle=f"""
    SELECT {_CELL5_SQL} AS cell5, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1
    """,
)
def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lat, lon = cells.point_exprs("doc_id")
    return (
        docs.select("n_chars", cells.cell_id_expr(lat, lon, 5).alias("cell5"))
        .groupBy("cell5")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )
