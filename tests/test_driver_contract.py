"""Driver-contract meta-tests: every `queries()` entry must execute
and return rows with a stable schema; every oracle string must be
well-formed DuckDB SQL. Catches a broken registration before the
driver's correctness gate does."""

from __future__ import annotations

import duckdb
import os
import pytest


def _entry():
    import __spark_entry__ as m

    return m


def test_every_query_runs_and_returns_rows(spark, sf_dir):
    m = _entry()
    failures = []
    for name, fn in m.queries().items():
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            if n == 0 and name not in ("except_users",):  # tiny-scale empties
                failures.append((name, "0 rows"))
            _ = df.schema.simpleString()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"[:120]))
    assert not failures, failures


def test_every_oracle_parses_in_duckdb(sf_dir):
    """EXPLAIN every oracle against the real views — malformed SQL or a
    schema drift fails here in seconds, not in the driver round."""
    m = _entry()
    con = duckdb.connect()
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = []
    for name, sql in m.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def test_entry_returns_flagship(spark):
    m = _entry()
    df = m.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"cell7", "n_docs", "n_spans", "text_chars"}


def test_oracle_keys_subset_of_queries():
    m = _entry()
    assert set(m.oracle_sql()) <= set(m.queries())


def test_rows_only_queries_are_the_documented_exceptions():
    """Every queries() entry must carry an oracle except the explicit,
    documented rows-only set (approximate sketches can't hash-match a
    different engine's sketch). Growth of this set is a regression."""
    import __spark_entry__ as m

    rows_only = set(m.queries()) - set(m.oracle_sql())
    assert rows_only == {
        "approx_distinct_cells",   # HLL++ sketch; bounded by exact twin
        "approx_event_percentiles",  # percentile sketch; bounded by exact twin
    }, rows_only
