"""Shared Spark-vs-DuckDB result comparison used by the oracle gate.

`scripts/check_oracles.py` (the local emulation of the driver's
correctness gate) and the timezone-invariance pytest both need the
same canonicalization: the driver sorts columns by name, formats every
cell, sorts rows, and hashes — so both sides of any comparison must
run through one implementation or a formatting drift would masquerade
as an engine bug.
"""

from __future__ import annotations

import hashlib
import math
import os

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(df) -> tuple[int, list[str], str]:
    """pandas df -> (rows, sorted cols, order-insensitive value hash)."""
    cols = sorted(df.columns)
    rows = [
        "\x1f".join(canon_cell(v) for v in rec)
        for rec in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def duck_con(sf_dir: str):
    """DuckDB connection with every testdata table registered as a view."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con
