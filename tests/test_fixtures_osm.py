"""Golden-fixture parity with the reference's unit tests
(/root/reference/test/unit/read_osm_test.cpp:142-328,
 read_osc_test.cpp:40-213) — counts, field values, tag maps, ordered
ref/member sequences.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inputosm_spark import datagen


def test_counts(spark):
    # read_osm_test.cpp:142-156: nodes=2, ways=1, relations=1
    assert datagen.golden_nodes(spark).count() == 2
    assert datagen.golden_ways(spark).count() == 1
    assert datagen.golden_relations(spark).count() == 1


def test_node_fields(spark):
    # read_osm_test.cpp:164-200: exact coords, version, ts, changeset, tags
    n1 = datagen.golden_nodes(spark).filter("id = 1").first()
    assert n1.raw_lat == 525200000 and n1.raw_lon == 134050000
    assert n1.version == 3 and n1.changeset == 111
    assert n1.ts == dt.datetime(2020, 1, 2, 3, 4, 5)
    assert n1.tags == {"name": "Node One", "amenity": "cafe"}
    # fixed-point -> degrees view (F1, README.md:444 semantics at e7)
    deg = (
        datagen.golden_nodes(spark)
        .select((F.col("raw_lat") * 1e-7).alias("lat"))
        .orderBy("id")
        .collect()
    )
    assert abs(deg[0].lat - 52.52) < 1e-9


def test_way_ordered_refs(spark):
    # read_osm_test.cpp:246-250: node_refs order {1, 2} is significant
    w = datagen.golden_ways(spark).first()
    assert w.node_refs == [1, 2]
    assert w.tags == {"highway": "residential", "name": "A Street"}


def test_relation_ordered_members(spark):
    # read_osm_test.cpp:285-301: members [(node 1 'stop'), (way 10 'route')]
    r = datagen.golden_relations(spark).first()
    assert [(m.type, m.ref, m.role) for m in r.members] == [
        (0, 1, "stop"),
        (1, 10, "route"),
    ]


def test_osc_modes(spark):
    # read_osc_test.cpp:49-52, 97-100, 146-149: op per section
    nodes, ways, rels = datagen.golden_changes(spark)
    assert nodes.first().op == "create" and nodes.first().id == 100
    w = ways.first()
    assert w.op == "modify" and w.node_refs == [100, 101]
    r = rels.first()
    assert r.op == "delete" and [(m.type, m.ref) for m in r.members] == [
        (0, 100),
        (1, 200),
    ]


def test_tagged_entity_counts(spark):
    # statistics.cpp:92-93 semantics: count entities with non-empty tags
    n = datagen.golden_nodes(spark).filter(F.size(F.map_keys("tags")) > 0).count()
    assert n == 2
