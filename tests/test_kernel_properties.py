"""Hypothesis property tests for the numpy kernels (no Spark session)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pgsql2osm_spark.functions import cells as C
from pgsql2osm_spark.functions import geometry as G

lons = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lats = st.floats(min_value=-89.999999, max_value=89.999999, allow_nan=False)
res_s = st.integers(min_value=1, max_value=20)


@settings(max_examples=200, deadline=None)
@given(lons, lats, res_s)
def test_cell_bounds_contain_their_point(lon, lat, res):
    cell = C.cell_encode(np.asarray([lon]), np.asarray([lat]), res)
    lon0, lat0, lon1, lat1 = C.cell_bounds(cell)
    assert lon0[0] - 1e-9 <= lon <= lon1[0] + 1e-9
    assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9
    assert C.cell_res(cell)[0] == res


@settings(max_examples=200, deadline=None)
@given(lons, lats, res_s)
def test_cell_parent_contains_child(lon, lat, res):
    cell = C.cell_encode(np.asarray([lon]), np.asarray([lat]), res)
    parent = C.cell_parent(cell)
    pl0, pb0, pl1, pb1 = C.cell_bounds(parent)
    l0, b0, l1, b1 = C.cell_bounds(cell)
    assert pl0[0] <= l0[0] and pb0[0] <= b0[0]
    assert pl1[0] >= l1[0] and pb1[0] >= b1[0]
    # parent equals direct encode at res-1 (shift consistency)
    direct = C.cell_encode(np.asarray([lon]), np.asarray([lat]), res - 1)
    assert parent[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lons, lats), min_size=3, max_size=12))
def test_pack_unpack_rings_roundtrip(verts):
    ring = np.asarray(verts, dtype=np.float64)
    blob = G.pack_rings([ring, ring[::-1]])
    back = G.unpack_rings(blob)
    assert len(back) == 2
    assert np.array_equal(back[0], ring) and np.array_equal(back[1], ring[::-1])


@settings(max_examples=100, deadline=None)
@given(lons, lats, lons, lats)
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    a = np.asarray([lon1]), np.asarray([lat1])
    b = np.asarray([lon2]), np.asarray([lat2])
    d_ab = G.haversine_m(a[0], a[1], b[0], b[1])[0]
    d_ba = G.haversine_m(b[0], b[1], a[0], a[1])[0]
    assert d_ab >= 0.0
    assert abs(d_ab - d_ba) <= 1e-6 * max(d_ab, 1.0)  # symmetry
    assert d_ab <= np.pi * G.EARTH_R_M + 1.0  # bounded by half circumference
    d_self = G.haversine_m(a[0], a[1], a[0], a[1])[0]
    assert d_self == 0.0


@settings(max_examples=100, deadline=None)
@given(lons, lats, st.integers(min_value=0, max_value=18))
def test_tile_indices_in_range(lon, lat, z):
    xt, yt = G.lonlat_to_tile(np.asarray([lon]), np.asarray([lat]), z)
    n = 1 << z
    assert 0 <= xt[0] < n and 0 <= yt[0] < n
    # roundtrip: the tile's lonlat box contains the point (lon only; lat is
    # mercator-clamped near the poles)
    lon_w, _ = G.tile_to_lonlat(xt, yt, z)
    lon_e, _ = G.tile_to_lonlat(xt + 1, yt, z)
    assert lon_w[0] - 1e-9 <= lon <= lon_e[0] + 1e-9
