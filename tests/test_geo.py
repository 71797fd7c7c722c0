"""Pure-numpy geo kernel tests (no Spark) — fast unit layer."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from inputosm_spark import geo

lat_s = st.integers(min_value=-geo.LAT_MAX_E4, max_value=geo.LAT_MAX_E4)
lon_s = st.integers(min_value=-geo.LON_MAX_E4, max_value=geo.LON_MAX_E4 - 1)
res_s = st.integers(min_value=0, max_value=geo.MAX_RES)


@given(lat_s, lon_s, res_s)
@settings(max_examples=200, deadline=None)
def test_cell_roundtrip(lat, lon, res):
    cid = geo.cell_id(lat, lon, res)
    r, y, x = geo.unpack_cell(cid)
    assert int(r) == res
    assert 0 <= int(x) < 2 ** (res + 1)
    assert 0 <= int(y) < 2**res
    lat_lo, lat_hi, lon_lo, lon_hi = geo.cell_bounds_e4(cid)
    # the point lies inside its cell's half-open bounds
    # (x==0 also receives the antimeridian wrap; pole row is clamped-closed)
    assert (lon_lo <= lon < lon_hi) or int(x) == 0
    assert lat_lo <= lat and (lat < lat_hi or lat == geo.LAT_MAX_E4)


@given(lat_s, lon_s, res_s, st.integers(min_value=1, max_value=geo.MAX_RES))
@settings(max_examples=200, deadline=None)
def test_parent_consistency(lat, lon, res, dr):
    parent_res = max(res - dr, 0)
    child = geo.cell_id(lat, lon, res)
    direct = geo.cell_id(lat, lon, parent_res)
    assert int(geo.cell_parent(child, parent_res)) == int(direct)


def test_kring_contains_origin_and_neighbors():
    cid = geo.cell_id(np.int64(100_000), np.int64(200_000), 8)
    ring = geo.kring(cid, 1)[0]
    ring = ring[ring >= 0]
    assert int(cid) in set(ring.tolist())
    assert len(ring) == 9  # interior cell: full 3x3 block


def test_kring_pole_clamp_and_wrap():
    top = geo.pack_cell(3, 2**3 - 1, 0)  # top row at res 3
    ring = geo.kring(top, 1)[0]
    assert (ring >= 0).sum() == 6  # 3x3 minus the 3 beyond the pole
    # wrap: x=0 must include x = nx-1 neighbors
    _, ys, xs = geo.unpack_cell(ring[ring >= 0])
    assert (2 ** 4 - 1) in set(xs.tolist())


def test_point_in_polygon_square_and_concave():
    sq_lat = [0, 0, 10_000, 10_000]
    sq_lon = [0, 10_000, 10_000, 0]
    lats = np.array([5_000, 15_000, 0, 10_000])
    lons = np.array([5_000, 5_000, 5_000, 5_000])
    got = geo.point_in_polygon(lats, lons, sq_lat, sq_lon)
    assert got[0] and not got[1]
    # concave L: (lat=150k, lon=250k) inside the arm;
    # (lat=150k, lon=50k) in the notch (arm only spans lon >= 200k)
    L_lat = [0, 0, 200_000, 200_000, 100_000, 100_000]
    L_lon = [0, 300_000, 300_000, 200_000, 200_000, 0]
    got = geo.point_in_polygon(
        np.array([150_000, 150_000]), np.array([250_000, 50_000]), L_lat, L_lon
    )
    assert got[0] and not got[1]


def test_polyfill_covers_inside_points():
    ring_lat = [0, 0, 50_000, 50_000]
    ring_lon = [0, 80_000, 80_000, 0]
    cells = set(geo.polyfill(ring_lat, ring_lon, 10).tolist())
    # every interior sample point's cell is in the cover
    lats = np.arange(1_000, 50_000, 7_000)
    lons = np.arange(1_000, 80_000, 9_000)
    gl, gn = np.meshgrid(lats, lons)
    pts = geo.cell_id(gl.ravel(), gn.ravel(), 10)
    assert set(pts.tolist()) <= cells


def test_point_from_id_deterministic_and_in_range():
    ids = np.arange(10_000)
    lat, lon = geo.point_from_id(ids)
    assert lat.min() >= -geo.LAT_MAX_E4 and lat.max() < geo.LAT_MAX_E4
    assert lon.min() >= -geo.LON_MAX_E4 and lon.max() < geo.LON_MAX_E4
    lat2, lon2 = geo.point_from_id(ids)
    assert np.array_equal(lat, lat2) and np.array_equal(lon, lon2)
    # spread: at res 5 the points should hit many distinct cells
    assert len(np.unique(geo.cell_id(lat, lon, 5))) > 500


def test_dist2_exact():
    assert int(geo.dist2_e4(0, 0, 3, 4)) == 25
    assert int(geo.dist2_e4(geo.LAT_MAX_E4, geo.LON_MAX_E4,
                            -geo.LAT_MAX_E4, -geo.LON_MAX_E4)) == (
        (2 * geo.LAT_MAX_E4) ** 2 + (2 * geo.LON_MAX_E4) ** 2
    )
