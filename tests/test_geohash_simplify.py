"""geohash_expr and simplify_polyline vs independent local references."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from inputosm_spark.functions import cells

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_ref(lat_e4: int, lon_e4: int, precision: int) -> str:
    """Classic alternating-bit geohash built bit-by-bit (independent
    of the engine's unrolled interleave); quantization shares the
    integer formula by construction."""
    half = 5 * precision // 2
    lonq = min((lon_e4 + 1_800_000) * (1 << half) // 3_600_000,
               (1 << half) - 1)
    latq = min((lat_e4 + 900_000) * (1 << half) // 1_800_000,
               (1 << half) - 1)
    bits = []
    for j in range(half):
        bits.append((lonq >> (half - 1 - j)) & 1)
        bits.append((latq >> (half - 1 - j)) & 1)
    out = []
    for c in range(precision):
        idx = 0
        for b in bits[5 * c : 5 * c + 5]:
            idx = idx * 2 + b
        out.append(_GH32[idx])
    return "".join(out)


def test_geohash_matches_reference(spark):
    rng = np.random.default_rng(3)
    pts = [
        (int(la), int(lo))
        for la, lo in zip(
            rng.integers(-900_000, 900_001, 200),
            rng.integers(-1_800_000, 1_800_001, 200),
        )
    ]
    # corner/boundary cases incl. the clamped top bins
    pts += [(-900_000, -1_800_000), (900_000, 1_800_000), (0, 0),
            (899_999, 1_799_999), (-1, -1)]
    df = spark.createDataFrame(pts, "lat_e4 long, lon_e4 long")
    got = [
        r.gh
        for r in df.select(
            cells.geohash_expr("lat_e4", "lon_e4", 6).alias("gh")
        ).collect()
    ]
    want = [_gh_ref(la, lo, 6) for la, lo in pts]
    assert got == want


def test_geohash_known_values(spark):
    """Cross-checked against the reference geohash of well-known
    points (python-geohash convention): lat 57.64911 lon 10.40744 ->
    'u4pruy' at 6 chars."""
    df = spark.createDataFrame(
        [(576_491, 104_074)], "lat_e4 long, lon_e4 long"
    )
    gh = df.select(
        cells.geohash_expr("lat_e4", "lon_e4", 6).alias("gh")
    ).collect()[0].gh
    assert gh == "u4pruy"


def test_simplify_polyline_matches_bruteforce(spark):
    from inputosm_spark.operators import spatial

    rng = np.random.default_rng(11)
    rows = []
    for way in range(20):
        n = int(rng.integers(2, 12))
        xs = rng.integers(-1_000_000, 1_000_000, n)
        ys = rng.integers(-500_000, 500_000, n)
        rows += [(way, p, int(x), int(y))
                 for p, (x, y) in enumerate(zip(xs, ys))]
    # plus an exactly-collinear way: interior points must all drop
    rows += [(99, p, p * 1000, p * 2000) for p in range(6)]
    df = spark.createDataFrame(rows, "way_id long, pos long, x long, y long")
    eps = 100_000
    got = {(r.way_id, r.pos) for r in
           spatial.simplify_polyline(df, eps=eps).collect()}

    import math
    by_way: dict[int, list] = {}
    for w, p, x, y in rows:
        by_way.setdefault(w, []).append((p, x, y))
    want = set()
    for w, pts in by_way.items():
        pts.sort()
        for i, (p, x, y) in enumerate(pts):
            if i == 0 or i == len(pts) - 1:
                want.add((w, p))
                continue
            _, px, py = pts[i - 1]
            _, qx, qy = pts[i + 1]
            cross = abs((qx - px) * (y - py) - (qy - py) * (x - px))
            chord = math.floor(math.sqrt((qx - px) ** 2 + (qy - py) ** 2))
            if cross > eps * chord:
                want.add((w, p))
    assert got == want
    # the collinear way keeps exactly its two endpoints
    assert {(p) for (w, p) in got if w == 99} == {0, 5}
    # and the random ways actually drop something
    assert len(got) < len(rows)
