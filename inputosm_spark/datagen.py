"""Deterministic fixtures + synthetic corpora (no RNG, no wall-clock).

Golden OSM rows are transcribed from the reference unit fixtures
`/root/reference/test/unit/data/sample.osm` / `sample.osc`, whose
expected parses are asserted in
`/root/reference/test/unit/read_osm_test.cpp:142-328` and
`read_osc_test.cpp:40-213` (values mirrored in /root/repo/FIXTURES.md).
Coordinates are the reference's fixed-point encoding
(`raw = round(deg*1e7)`, /root/reference/src/inputosmxml.cpp:69-77).

Synthetic corpora are generated with `spark.range` + column
expressions only — per FIXTURES.md §5 no per-row Python, so the same
tables regenerate bit-identically at any scale on any cluster.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inputosm_spark import schemas
from inputosm_spark.functions.cells import point_exprs


def _utc(y, mo, d, h, mi, s):
    return dt.datetime(y, mo, d, h, mi, s)  # session TZ pinned to UTC


# --- golden fixtures (sample.osm: read_osm_test.cpp:142-328) ---------------

def golden_nodes(spark: SparkSession) -> DataFrame:
    rows = [
        (1, 525200000, 134050000, {"name": "Node One", "amenity": "cafe"}, 3,
         _utc(2020, 1, 2, 3, 4, 5), 111),
        (2, 488566000, 23522000, {"name": "Node Two"}, 2,
         _utc(2020, 2, 3, 4, 5, 6), 222),
    ]
    return spark.createDataFrame(rows, schemas.NODES)


def golden_ways(spark: SparkSession) -> DataFrame:
    rows = [
        (10, [1, 2], {"highway": "residential", "name": "A Street"}, 4,
         _utc(2020, 3, 4, 5, 6, 7), 333),
    ]
    return spark.createDataFrame(rows, schemas.WAYS)


def golden_relations(spark: SparkSession) -> DataFrame:
    rows = [
        (20, [(0, 1, "stop"), (1, 10, "route")], {"type": "route", "route": "bus"},
         5, _utc(2020, 4, 5, 6, 7, 8), 444),
    ]
    return spark.createDataFrame(rows, schemas.RELATIONS)


def golden_changes(spark: SparkSession):
    """sample.osc CDC rows (read_osc_test.cpp:49-52, 97-100, 146-149)."""
    from pyspark.sql.types import StructType

    # StructType.add mutates in place — build fresh copies instead
    node_schema = StructType(schemas.NODES.fields + [schemas.OP])
    way_schema = StructType(schemas.WAYS.fields + [schemas.OP])
    rel_schema = StructType(schemas.RELATIONS.fields + [schemas.OP])
    nodes = spark.createDataFrame(
        [(100, 407128000, -740060000, {"name": "Create Node", "note": "created"},
          7, _utc(2021, 1, 2, 3, 4, 5), 1234, "create")],
        node_schema,
    )
    ways = spark.createDataFrame(
        [(200, [100, 101], {"highway": "secondary", "status": "modified"},
          8, _utc(2021, 2, 3, 4, 5, 6), 2345, "modify")],
        way_schema,
    )
    rels = spark.createDataFrame(
        [(300, [(0, 100, "stop"), (1, 200, "route")],
          {"type": "route", "route": "tram"}, 9,
          _utc(2021, 3, 4, 5, 6, 7), 3456, "delete")],
        rel_schema,
    )
    return nodes, ways, rels


# --- synthetic scalable corpora (column exprs only) -------------------------

def synth_nodes(spark: SparkSession, n: int) -> DataFrame:
    """n OSM-style nodes with hash-derived coords + cyclic tags."""
    lat, lon = point_exprs("id")
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (lat * 1000).alias("raw_lat"),   # e4 -> e7 fixed point
            (lon * 1000).alias("raw_lon"),
            F.when(
                F.pmod("id", F.lit(10)) < 3,
                F.map_from_arrays(
                    F.array(F.lit("amenity")),
                    F.array(F.element_at(
                        F.array(F.lit("cafe"), F.lit("school"), F.lit("bank")),
                        (F.pmod("id", F.lit(3)) + 1).cast("int"),
                    )),
                ),
            ).otherwise(F.map_from_arrays(F.array().cast("array<string>"),
                                          F.array().cast("array<string>"))).alias("tags"),
            (F.pmod("id", F.lit(5)) + 1).cast("int").alias("version"),
            F.timestamp_seconds(F.lit(1577836800) + F.col("id") * 60).alias("ts"),
            (F.col("id") % 1000).alias("changeset"),
        )
    )


def synth_ways(spark: SparkSession, n_ways: int, n_nodes: int) -> DataFrame:
    """Ways whose ordered refs are deterministic sequences into nodes."""
    length = F.pmod("id", F.lit(8)) + 2  # 2..9 refs
    return spark.range(n_ways).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.transform(
            F.sequence(F.lit(0), length - 1),
            lambda i: F.pmod(F.col("id") * 7 + i * 3, F.lit(n_nodes)),
        ).alias("node_refs"),
        F.when(
            F.pmod("id", F.lit(4)) == 0,
            F.create_map(F.lit("route"), F.lit("ferry")),
        ).otherwise(F.create_map(F.lit("highway"), F.lit("residential"))).alias("tags"),
        F.lit(1).cast("int").alias("version"),
        F.timestamp_seconds(F.lit(1577836800) + F.col("id") * 30).alias("ts"),
        (F.col("id") % 500).alias("changeset"),
    )


def interleave_documents(documents_flat: DataFrame) -> DataFrame:
    """Lift the driver's flat documents table (doc_id, text, lang, source,
    n_chars) into the interleaved spans shape (BASELINE.json input_hint):

    each doc becomes alternating text spans (sentence-ish chunks of the
    source text) and media spans (deterministic media_refs derived from
    doc_id), offsets strictly increasing. Pure column expressions.
    """
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest(F.least(F.ceil(F.size(words) / 8), F.lit(6)), F.lit(1)).cast("int")
    chunk = F.sequence(F.lit(0), n_chunks - 1)

    def _text_span(i):
        return F.struct(
            F.lit("text").alias("kind"),
            F.array_join(F.slice(words, i * 8 + 1, 8), " ").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i * 2).cast("int").alias("offset"),
        )

    def _media_span(i):
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"),
                     F.lit("/"), i.cast("string")).alias("media_ref"),
            (i * 2 + 1).cast("int").alias("offset"),
        )

    # engine-neutral deterministic thinning (integer modular predicate —
    # the same formula must be replayable in the DuckDB oracle)
    media_at = lambda i: F.pmod(  # noqa: E731
        F.col("doc_id").cast("long") * 31 + i.cast("long") * 17, F.lit(3)
    ) == 0
    # offsets are text=2i / media=2i+1, so emitting [text_i, media_i?]
    # per chunk index yields the offset-sorted sequence BY CONSTRUCTION
    # — the old form concatenated two arrays and re-sorted them with a
    # comparator lambda, which runs interpreted per element pair (r7;
    # same span array, measured 0.63 s -> 0.53 s per consumer at sf0.1)
    spans = F.flatten(
        F.transform(
            chunk,
            lambda i: F.when(
                media_at(i), F.array(_text_span(i), _media_span(i))
            ).otherwise(F.array(_text_span(i))),
        )
    )
    return documents_flat.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )


def synth_polygons(spark: SparkSession, n_boxes: int = 12) -> DataFrame:
    """Deterministic axis-aligned boxes + two concave polygons
    (FIXTURES.md §6), including one 'metro' box covering a large share
    of hash-derived points to exercise skew handling.
    """
    rows = []
    for i in range(n_boxes):
        lat0 = -800_000 + i * 130_000
        lon0 = -1_700_000 + i * 260_000
        dlat = 60_000 + (i % 3) * 40_000
        dlon = 90_000 + (i % 4) * 50_000
        rows.append(
            (f"box{i}",
             [lat0, lat0, lat0 + dlat, lat0 + dlat, lat0],
             [lon0, lon0 + dlon, lon0 + dlon, lon0, lon0])
        )
    # metro: a huge box -> hot cells (skew driver)
    rows.append(("metro",
                 [-450_000, -450_000, 450_000, 450_000, -450_000],
                 [-900_000, 900_000, 900_000, -900_000, -900_000]))
    # concave "L" polygon
    rows.append(("concaveL",
                 [0, 0, 200_000, 200_000, 100_000, 100_000, 0],
                 [0, 300_000, 300_000, 200_000, 200_000, 0, 0]))
    # concave notch polygon
    rows.append(("notch",
                 [-300_000, -300_000, -100_000, -200_000, -100_000, -300_000],
                 [500_000, 900_000, 900_000, 700_000, 500_000, 500_000]))
    return spark.createDataFrame(rows, schemas.POLYGONS)
