"""Property-based tests (hypothesis) for the grid-index kernels —
the randomized layer the reference lacks (SURVEY.md §5), guarding the
exact integer invariants every oracle comparison depends on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from inputosm_spark import geo

lat_e4 = st.integers(min_value=-geo.LAT_MAX_E4, max_value=geo.LAT_MAX_E4)
lon_e4 = st.integers(min_value=-geo.LON_MAX_E4, max_value=geo.LON_MAX_E4 - 1)
res = st.integers(min_value=0, max_value=geo.MAX_RES)


@settings(max_examples=200, deadline=None)
@given(lat_e4, lon_e4, res)
def test_pack_unpack_roundtrip(lat, lon, r):
    c = geo.cell_id(lat, lon, r)
    rr, y, x = geo.unpack_cell(c)
    assert int(rr) == r
    assert 0 <= int(y) < 2**r
    assert 0 <= int(x) < 2 ** (r + 1)
    assert int(geo.pack_cell(rr, y, x)) == int(c)


@settings(max_examples=200, deadline=None)
@given(lat_e4, lon_e4, res)
def test_point_within_its_cell_bounds(lat, lon, r):
    c = geo.cell_id(lat, lon, r)
    lat_lo, lat_hi, lon_lo, lon_hi = geo.cell_bounds_e4(c)
    assert int(lat_lo) <= lat < int(lat_hi) or (
        lat == geo.LAT_MAX_E4 and int(lat_hi) >= geo.LAT_MAX_E4
    )
    assert int(lon_lo) <= lon < int(lon_hi)


@settings(max_examples=200, deadline=None)
@given(lat_e4, lon_e4, st.integers(min_value=1, max_value=geo.MAX_RES))
def test_parent_consistency(lat, lon, r):
    """Coarsening a fine cell must equal assigning at the coarse res
    directly — the invariant behind multi-resolution rollups."""
    child = geo.cell_id(lat, lon, r)
    parent_direct = geo.cell_id(lat, lon, r - 1)
    assert int(geo.cell_parent(child, r - 1)) == int(parent_direct)


@settings(max_examples=100, deadline=None)
@given(lat_e4, lon_e4, st.integers(min_value=0, max_value=12),
       st.integers(min_value=1, max_value=3))
def test_kring_contains_origin_and_wraps(lat, lon, r, k):
    c = geo.cell_id(lat, lon, r)
    ring = geo.kring(np.array([c]), k)[0]
    ring = ring[ring >= 0]
    assert int(c) in set(int(v) for v in ring)
    rr, y, x = geo.unpack_cell(ring)
    assert np.all(rr == r)
    assert np.all((y >= 0) & (y < 2**r))
    assert np.all((x >= 0) & (x < 2 ** (r + 1)))
    # Chebyshev distance <= k with longitude wrap
    _, y0, x0 = geo.unpack_cell(np.array([c]))
    nx = 2 ** (r + 1)
    dx = np.minimum(np.abs(x - x0[0]), nx - np.abs(x - x0[0]))
    assert np.all(dx <= k) and np.all(np.abs(y - y0[0]) <= k)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.tuples(lat_e4, lon_e4), min_size=3, max_size=8),
    st.integers(min_value=3, max_value=8),
    st.lists(st.tuples(lat_e4, lon_e4), min_size=32, max_size=32),
)
def test_polyfill_classification_is_sound(ring, r, pts):
    """For random (possibly self-intersecting; even-odd rule) polygons:
    a point in a FULL cell is inside; a point in NO kept cell is
    outside — the invariants pip_join's correctness rests on."""
    ring_lat = np.array([p[0] for p in ring], dtype=np.int64)
    ring_lon = np.array([p[1] for p in ring], dtype=np.int64)
    cells_, full = geo.polyfill_classified(ring_lat, ring_lon, r)
    cellmap = {int(c): bool(f) for c, f in zip(cells_, full)}
    plat = np.array([p[0] for p in pts], dtype=np.int64)
    plon = np.array([p[1] for p in pts], dtype=np.int64)
    inside = geo.point_in_polygon(plat, plon, ring_lat, ring_lon)
    pc = geo.cell_id(plat, plon, r)
    for c, isin in zip(pc, inside):
        c = int(c)
        if c in cellmap and cellmap[c]:
            assert isin, "point in a FULL cell must be inside the polygon"
        if c not in cellmap:
            assert not isin, "point outside every kept cell must be outside"


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_point_from_id_in_range(i):
    lat, lon = geo.point_from_id(np.array([i]))
    assert -geo.LAT_MAX_E4 <= int(lat[0]) < geo.LAT_MAX_E4
    assert -geo.LON_MAX_E4 <= int(lon[0]) < geo.LON_MAX_E4
