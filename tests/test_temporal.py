"""Temporal joins: as-of carry-forward semantics (ties, no-match,
tolerance) and interval-join boundary rules."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inputosm_spark.operators import temporal


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # before any state -> NULL
            (1, _ts("2024-01-01 12:00:00"), 101),  # exactly AT state -> sees it
            (1, _ts("2024-01-01 13:00:00"), 102),  # after -> latest state
            (2, _ts("2024-01-01 12:30:00"), 201),  # other key
        ],
        "k long, ts timestamp, event int",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 12:00:00"), 1.0),
            (1, _ts("2024-01-01 12:30:00"), 2.0),
            (2, _ts("2024-01-01 09:00:00"), 9.0),
        ],
        "k long, ts timestamp, v double",
    )
    got = {r.event: r.v for r in
           temporal.asof_join(left, right, key="k").collect()}
    assert got == {100: None, 101: 1.0, 102: 2.0, 201: 9.0}

    # tolerance: 201's state is 3.5h old -> dropped at 1h tolerance
    got_tol = {r.event: r.v for r in
               temporal.asof_join(left, right, key="k",
                                  tolerance_s=3600).collect()}
    assert got_tol == {100: None, 101: 1.0, 102: 2.0, 201: None}


def test_asof_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # fwd -> 12:00 state
            (1, _ts("2024-01-01 12:00:00"), 101),  # AT state -> sees it (both)
            (1, _ts("2024-01-01 13:00:00"), 102),  # fwd -> NULL; nearest -> 12:30
            (1, _ts("2024-01-01 12:14:00"), 103),  # nearest tie-ish: 14min back vs 16min fwd -> backward
            (1, _ts("2024-01-01 12:15:00"), 104),  # EXACT tie 15/15 -> backward wins
            (2, _ts("2024-01-01 08:00:00"), 201),  # fwd -> 09:00 state
        ],
        "k long, ts timestamp, event int",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 12:00:00"), 1.0),
            (1, _ts("2024-01-01 12:30:00"), 2.0),
            (2, _ts("2024-01-01 09:00:00"), 9.0),
        ],
        "k long, ts timestamp, v double",
    )
    fwd = {r.event: r.v for r in
           temporal.asof_join(left, right, key="k",
                              direction="forward").collect()}
    assert fwd == {100: 1.0, 101: 1.0, 102: None, 103: 2.0, 104: 2.0,
                   201: 9.0}

    near = {r.event: r.v for r in
            temporal.asof_join(left, right, key="k",
                               direction="nearest").collect()}
    assert near == {100: 1.0, 101: 1.0, 102: 2.0, 103: 1.0, 104: 1.0,
                    201: 9.0}

    # forward tolerance: 100's next state is 2h ahead -> dropped at 1h
    fwd_tol = {r.event: r.v for r in
               temporal.asof_join(left, right, key="k",
                                  direction="forward",
                                  tolerance_s=3600).collect()}
    assert fwd_tol[100] is None and fwd_tol[101] == 1.0

    import pytest

    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(left, right, key="k", direction="sideways")


def test_interval_join_half_open_boundaries(spark):
    pts = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 02:00:00")),  # == start -> IN
            (2, 1, _ts("2024-01-01 04:59:59")),  # just inside
            (3, 1, _ts("2024-01-01 05:00:00")),  # == end -> OUT (half-open)
            (4, 2, _ts("2024-01-01 03:00:00")),  # wrong key -> OUT
        ],
        "event_id long, grp long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [(1, _ts("2024-01-01 02:00:00"), _ts("2024-01-01 05:00:00"))],
        "grp long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(r.event_id for r in
                 temporal.interval_join(pts, ivals, key="grp").collect())
    assert got == [1, 2]
