"""Declared StructTypes — the engine's type system is fully static,
like the reference's fixed POD structs
(/root/reference/include/inputosm/inputosm.h:25-74). No inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TAGS = MapType(StringType(), StringType())

#: node_t (/root/reference/include/inputosm/inputosm.h:31-41) —
#: raw_* keep the reference's fixed-point int64 coordinates exactly.
NODES = StructType(
    [
        StructField("id", LongType(), False),
        StructField("raw_lat", LongType(), False),
        StructField("raw_lon", LongType(), False),
        StructField("tags", TAGS, True),
        StructField("version", IntegerType(), True),
        StructField("ts", TimestampType(), True),
        StructField("changeset", LongType(), True),
    ]
)

#: way_t (/root/reference/include/inputosm/inputosm.h:43-52) — ordered refs.
WAYS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("node_refs", ArrayType(LongType()), False),
        StructField("tags", TAGS, True),
        StructField("version", IntegerType(), True),
        StructField("ts", TimestampType(), True),
        StructField("changeset", LongType(), True),
    ]
)

#: relation_member_t type codes 0=node,1=way,2=relation
#: (/root/reference/include/inputosm/inputosm.h:54-63).
MEMBER = StructType(
    [
        StructField("type", IntegerType(), False),
        StructField("ref", LongType(), False),
        StructField("role", StringType(), True),
    ]
)

RELATIONS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("members", ArrayType(MEMBER), False),
        StructField("tags", TAGS, True),
        StructField("version", IntegerType(), True),
        StructField("ts", TimestampType(), True),
        StructField("changeset", LongType(), True),
    ]
)

#: OSC change rows — mode_t {create,modify,delete}
#: (/root/reference/include/inputosm/inputosm.h:82-88; XML toggles at
#: /root/reference/src/inputosmxml.cpp:243-257).
OP = StructField("op", StringType(), False)

#: Interleaved text+media corpus (BASELINE.json input_hint —
#: authoritative input shape). spans is the analog of way_t.node_refs:
#: the per-row invariant is span-sequence equality by offset order.
SPAN = StructType(
    [
        StructField("kind", StringType(), False),  # 'text' | 'media'
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

#: Media payloads referenced by spans — opaque binary + typed metadata
#: (multimodal plumbing; decode is stubbed, see multimodal.py).
MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

#: PIP join right side: integer e4 vertex rings (FIXTURES.md §6).
POLYGONS = StructType(
    [
        StructField("poly_id", StringType(), False),
        StructField("ring_lat_e4", ArrayType(LongType()), False),
        StructField("ring_lon_e4", ArrayType(LongType()), False),
    ]
)

#: Per-partition lineage rows (north_star): idempotent stage resume.
LINEAGE = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("cell_range_lo", LongType(), True),
        StructField("cell_range_hi", LongType(), True),
        StructField("row_count", LongType(), False),
        StructField("checksum", LongType(), False),
    ]
)
