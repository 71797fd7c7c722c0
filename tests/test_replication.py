"""Replication catch-up loop: PBF header coordinates -> snapshot table
properties -> OSC apply -> advanced sequence (S12 consumer story;
reference read_header_block, inputosmpbf.cpp:762-841, plus the OSC
semantics of read_osc_test.cpp).
"""

from __future__ import annotations

import pytest

from inputosm_spark.plans.snapshots import SnapshotStore
from inputosm_spark.sources import pbf, replication
from tests import pbf_writer as W
from tests.test_pbf import GOLDEN_NODES, GOLDEN_REL, GOLDEN_WAY

OSC_101 = """<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6">
  <create>
    <node id="100" lat="40.7128000" lon="-74.0060000" version="1"
          timestamp="2021-01-02T03:04:05Z" changeset="1234">
      <tag k="note" v="caught-up"/>
    </node>
  </create>
  <modify>
    <way id="10" version="5" timestamp="2021-02-03T04:05:06Z" changeset="2345">
      <nd ref="100"/>
      <nd ref="2"/>
      <tag k="highway" v="secondary"/>
    </way>
  </modify>
  <delete>
    <relation id="20" version="6" timestamp="2021-03-04T05:06:07Z"
              changeset="3456"/>
  </delete>
</osmChange>
"""


@pytest.fixture()
def seeded(spark, tmp_path):
    """PBF with replication header at sequence 100, ingested."""
    hdr = W.header_blob(rep_ts=1_650_000_000, rep_seq=100,
                        rep_url="https://example.org/replication/minute",
                        writing_program="test")
    block = W.primitive_block(lambda st: [
        W.dense_group(st, GOLDEN_NODES),
        W.way_group(st, GOLDEN_WAY),
        W.relation_group(st, GOLDEN_REL),
    ])
    path = W.write_pbf(str(tmp_path / "seed.osm.pbf"), [block], header=hdr)
    store = SnapshotStore(spark, str(tmp_path / "table"))
    replication.ingest_pbf(spark, path, store)
    return store, tmp_path


def test_ingest_surfaces_header_properties(seeded):
    store, _ = seeded
    props = store.properties()
    assert props["osm.replication.sequence"] == "100"
    assert props["osm.replication.timestamp"] == "1650000000"
    assert props["osm.replication.base_url"].endswith("/minute")
    assert replication.current_sequence(store) == 100
    assert store.read().count() == 4  # 2 nodes + way + relation


def test_catch_up_applies_pending_in_order_and_advances(spark, seeded):
    store, tmp_path = seeded
    osc = tmp_path / "101.osc"
    osc.write_text(OSC_101)
    # sequence 100 is already in the table -> must be skipped; 101 applies
    snap = replication.catch_up_osc(
        spark, store, {100: "/nonexistent/100.osc", 101: str(osc)}
    )
    assert snap is not None
    assert replication.current_sequence(store) == 101

    t = store.read()
    assert t.filter("kind = 'node' and id = 100").count() == 1  # created
    way = t.filter("kind = 'way' and id = 10").first()
    assert way.node_refs == [100, 2] and way.version == 5      # modified
    assert t.filter("kind = 'relation'").count() == 0          # deleted

    # idempotent: nothing pending now -> no new snapshot
    assert replication.catch_up_osc(spark, store, {101: str(osc)}) is None


def test_time_travel_preserves_pre_catchup_state(spark, seeded):
    store, tmp_path = seeded
    osc = tmp_path / "101.osc"
    osc.write_text(OSC_101)
    before = store.current_id()
    replication.catch_up_osc(spark, store, {101: str(osc)})
    old = store.read(snapshot_id=before)
    assert old.filter("kind = 'relation'").count() == 1  # VERSION AS OF
    assert store.properties(before)["osm.replication.sequence"] == "100"
