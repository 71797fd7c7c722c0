"""Timezone-invariance gate (round-5 directive #1/#2).

Round 4's only driver red was `pbf_roundtrip` hash-mismatching under
the driver's host timezone: the testdata parquet stores TZ-naive
timestamps, Spark localizes them to the *session* zone, and DuckDB's
oracle semantics are TZ-naive — any query exposing an absolute epoch
drifts by the host's UTC offset, and epoch-bucketed queries
(cohort_retention) drift whenever a row sits within the offset of a
bucket boundary. Two defenses now exist and both are asserted here:

1. `__spark_entry__.queries()` pins the session timezone to UTC inside
   every returned callable, so the WHOLE catalog replays its oracle
   under any driver timezone (tested below under America/New_York,
   whose offset is nonzero in every season — stricter than the
   Europe/London zone that produced the r4 red).
2. `q_pbf_roundtrip` itself uses a pure-epoch wire convention: the
   parquet's TIMESTAMP_NTZ value feeds the sink directly (NTZ crosses
   Arrow un-localized, so the wire stores the naive seconds), and the
   decoded side compares `sum(unix_timestamp(ts))` — the reader's
   instant-typed ts yields the wire's raw epoch integer, matching the
   oracle's TZ-naive `epoch()` under ANY session zone. So the one
   query whose wire path crosses Arrow twice is TZ-invariant even
   WITHOUT the pin.
"""

from __future__ import annotations

import pytest

from inputosm_spark.oracle_compare import duck_con, frame_hash

# Every catalog query that reads a timestamp column or derives one:
# absolute-epoch exposure (pbf_roundtrip), epoch bucketing
# (cohort_retention, cumulative_daily_events), interval/as-of ordering
# (interval_join_windows, asof_user_state), array-state timestamps
# (funnel_stages), timestamp-range filters (tpch_q6_forecast), and
# windowed event gaps (event_windows).
TS_QUERIES = [
    "pbf_roundtrip",
    "cohort_retention",
    "cumulative_daily_events",
    "interval_join_windows",
    "asof_user_state",
    "funnel_stages",
    "tpch_q6_forecast",
    "event_windows",
    "click_attribution",  # r5: stream-stream twin (floor-epoch delay)
]


@pytest.fixture
def ny_session(spark):
    """The spark session with a hostile (non-UTC, DST-bearing) zone set,
    restored to UTC afterwards so sibling tests are unaffected."""
    orig = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_driver_contract_queries_tz_invariant(ny_session, sf_dir):
    """queries() entries must hash-match their DuckDB oracle even when
    the driver session starts in America/New_York (the r4 failure mode,
    with a harsher zone)."""
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    con = duck_con(sf_dir)
    failures = []
    for name in TS_QUERIES:
        # re-set before each query: the pin inside the wrapper must be
        # what fixes it, but a prior query's pin would mask a missing one
        ny_session.conf.set("spark.sql.session.timeZone", "America/New_York")
        sdf = qs[name](ny_session, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        if frame_hash(sdf) != frame_hash(odf):
            failures.append(name)
    assert not failures, f"TZ-sensitive under America/New_York: {failures}"


def test_pbf_roundtrip_tz_invariant_without_pin(ny_session, sf_dir):
    """The raw catalog function (no UTC pin) must ALSO match: the
    roundtrip aggregate uses wall-clock epoch math, so the wire path
    itself is proven instant-preserving under a non-UTC session."""
    from inputosm_spark import queries_catalog as qc

    con = duck_con(sf_dir)
    sdf = qc._QUERIES["pbf_roundtrip"](ny_session, sf_dir).toPandas()
    odf = con.execute(qc._ORACLES["pbf_roundtrip"]).df()
    assert frame_hash(sdf) == frame_hash(odf)
