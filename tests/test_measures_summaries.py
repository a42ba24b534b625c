"""Measures + summaries kernels vs oracle and reference doc-test goldens."""

import numpy as np
import pytest

from georay import datagen, geom, oracle
from georay.kernels import measures, summaries


def test_haversine_sofia_plovdiv_golden():
    # haversine.rs:20-31 doc-test constant
    d = oracle.haversine_distance(23.319941, 42.698334, 24.742168, 42.136097)
    assert d == pytest.approx(132433.09929460194, abs=1e-6)
    dv = measures.haversine_distance(
        np.array([23.319941]), np.array([42.698334]), np.array([24.742168]), np.array([42.136097])
    )
    assert dv[0] == pytest.approx(132433.09929460194, abs=1e-6)


def test_haversine_nyc_london_golden():
    # haversine.rs:248-262: round() == 5,570,230
    d = oracle.haversine_distance(-74.006, 40.7128, -0.1278, 51.5074)
    assert round(d) == 5_570_230


def test_haversine_antipodal_clamp():
    d = measures.haversine_distance(
        np.array([0.0]), np.array([0.0]), np.array([180.0]), np.array([0.0])
    )
    assert np.isfinite(d[0])
    assert d[0] == pytest.approx(np.pi * measures.MEAN_EARTH_RADIUS, rel=1e-12)


def test_bearing_golden():
    # haversine.rs doc-test: (9,10) -> (9.5,10.1) ~ 78.47 deg
    b = measures.haversine_bearing(np.array([9.0]), np.array([10.0]), np.array([9.5]), np.array([10.1]))
    assert b[0] == pytest.approx(78.47, abs=1e-2)
    assert b[0] == pytest.approx(oracle.haversine_bearing(9.0, 10.0, 9.5, 10.1), rel=1e-12)


def test_destination_golden():
    # haversine.rs destination doc-test
    lon, lat = measures.haversine_destination(
        np.array([9.177789688110352]), np.array([48.776781529534965]), np.array([45.0]), np.array([10000.0])
    )
    assert lon[0] == pytest.approx(9.274409949623532, abs=1e-9)
    assert lat[0] == pytest.approx(48.84033274015048, abs=1e-9)


def test_destination_roundtrip_bearing():
    rs = np.random.RandomState(2)
    lon = rs.uniform(-170, 170, 50)
    lat = rs.uniform(-80, 80, 50)
    brg = rs.uniform(0, 360, 50)
    dist = rs.uniform(1000, 500_000, 50)
    lon2, lat2 = measures.haversine_destination(lon, lat, brg, dist)
    back = measures.haversine_distance(lon, lat, lon2, lat2)
    assert np.allclose(back, dist, rtol=1e-9)


def test_euclidean_matches_oracle():
    rs = np.random.RandomState(4)
    a = rs.uniform(-100, 100, (100, 4))
    d = measures.euclidean_distance(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
    for i in range(100):
        assert d[i] == oracle.euclidean_distance(a[i, 0], a[i, 1], a[i, 2], a[i, 3])


def test_rhumb_equator_equals_haversine_eastward():
    # along the equator the loxodrome IS the great circle
    d_r = measures.rhumb_distance(np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]))
    d_h = measures.haversine_distance(np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]))
    assert d_r[0] == pytest.approx(d_h[0], rel=1e-9)
    b = measures.rhumb_bearing(np.array([0.0]), np.array([10.0]), np.array([10.0]), np.array([10.0]))
    assert b[0] == pytest.approx(90.0, abs=1e-9)


def test_area_rect_signed_by_winding():
    """area.rs:57-80: 5x6 rect -> +-30 depending on winding."""
    ccw = np.array([(0.0, 0.0), (5.0, 0.0), (5.0, 6.0), (0.0, 6.0), (0.0, 0.0)])
    assert oracle.signed_area([ccw]) == 30.0
    assert oracle.signed_area([ccw[::-1].copy()]) == -30.0
    layer = _mk_layer([[ccw]])
    assert summaries.signed_area(layer)[0] == 30.0
    assert summaries.unsigned_area(layer)[0] == 30.0


def test_area_with_hole():
    outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    hole = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)])
    layer = _mk_layer([[outer, hole[::-1].copy()]])
    assert summaries.unsigned_area(layer)[0] == pytest.approx(96.0)


def test_centroid_rhombus_golden():
    """centroid.rs:20-34 doc-test: rhombus centroid (1,1)."""
    ring = np.array([(-1.0, 1.0), (1.0, 3.0), (3.0, 1.0), (1.0, -1.0), (-1.0, 1.0)])
    cx, cy = oracle.polygon_centroid([ring])
    assert (cx, cy) == (1.0, 1.0)
    layer = _mk_layer([[ring]])
    kx, ky = summaries.polygon_centroids(layer)
    assert (kx[0], ky[0]) == (1.0, 1.0)


def test_centroid_with_hole_matches_oracle():
    outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    hole = np.array([(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)])
    ox, oy = oracle.polygon_centroid([outer, hole])
    layer = _mk_layer([[outer, hole]])
    kx, ky = summaries.polygon_centroids(layer)
    assert kx[0] == pytest.approx(ox, rel=1e-12)
    assert ky[0] == pytest.approx(oy, rel=1e-12)
    # hole pushes centroid away from the hole quadrant
    assert kx[0] > 5.0 and ky[0] > 5.0


def test_generated_layer_summaries_match_oracle():
    table = datagen.generate_polygons(32)
    layer = geom.PolygonLayer.from_arrow(table)
    areas = summaries.signed_area(layer)
    cx, cy = summaries.polygon_centroids(layer)
    for p in range(layer.num_polys):
        rings = layer.poly_rings(p)
        assert areas[p] == pytest.approx(oracle.signed_area(rings), rel=1e-9, abs=1e-12)
        ox, oy = oracle.polygon_centroid(rings)
        assert cx[p] == pytest.approx(ox, rel=1e-9)
        assert cy[p] == pytest.approx(oy, rel=1e-9)
    bb = summaries.bounding_rects(layer)
    assert np.allclose(bb, layer.bbox)


def test_winding_order():
    ccw = np.array([(0.0, 0.0), (5.0, 0.0), (5.0, 6.0), (0.0, 6.0), (0.0, 0.0)])
    layer = _mk_layer([[ccw], [ccw[::-1].copy()]])
    w = summaries.winding_order(layer)
    assert list(w) == [1, -1]


def _mk_layer(polys):
    import pyarrow as pa

    rings = geom.rings_to_arrow(polys)
    bbox = np.asarray(
        [
            (
                np.vstack(rs)[:, 0].min(),
                np.vstack(rs)[:, 1].min(),
                np.vstack(rs)[:, 0].max(),
                np.vstack(rs)[:, 1].max(),
            )
            for rs in polys
        ]
    )
    t = pa.table(
        {
            "polygon_id": pa.array([f"p{i}" for i in range(len(polys))]),
            "rings": rings,
            "minx": pa.array(bbox[:, 0]),
            "miny": pa.array(bbox[:, 1]),
            "maxx": pa.array(bbox[:, 2]),
            "maxy": pa.array(bbox[:, 3]),
        }
    )
    return geom.PolygonLayer.from_arrow(t)


def test_vincenty_nyc_london_golden():
    """vincenty_distance.rs doc-test: 5,585,234 m rounded."""
    d = measures.vincenty_distance(-74.006, 40.7128, -0.1278, 51.5074)
    assert round(d) == 5_585_234
    assert measures.vincenty_distance(10.0, 20.0, 10.0, 20.0) == 0.0


def test_vincenty_antipodal_raises():
    with pytest.raises(measures.VincentyError):
        measures.vincenty_distance(0.0, 0.5, 179.7, -0.3)


def test_cross_track_golden():
    """cross_track_distance.rs doc-test: ~307.55 m; on-line -> 0."""
    d = measures.cross_track_distance(
        np.array([-0.7972]), np.array([53.2611]),
        np.array([-1.7297]), np.array([53.3206]),
        np.array([0.1334]), np.array([53.1887]),
    )
    assert d[0] == pytest.approx(307.549995, abs=1e-4)
    z = measures.cross_track_distance(
        np.array([0.0]), np.array([0.0]),
        np.array([1.0]), np.array([0.0]),
        np.array([2.0]), np.array([0.0]),
    )
    assert z[0] == pytest.approx(0.0, abs=1e-6)


def test_segmentize_equal_pieces():
    """linestring_segment.rs: n pieces of equal length."""
    line = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)])
    out = measures.segmentize(line, 4)
    assert len(out) == 5
    assert tuple(out[0]) == (0.0, 0.0) and tuple(out[-1]) == (10.0, 10.0)
    # breakpoints at 5, 10, 15 units along a 20-unit path
    assert np.allclose(out[1], (5.0, 0.0))
    assert np.allclose(out[2], (10.0, 0.0))
    assert np.allclose(out[3], (10.0, 5.0))


def test_segmentize_haversine_equal_pieces():
    """linestring_segment.rs:223 invariants: n pieces, equal haversine
    length, endpoints preserved, pieces chain, total length conserved."""
    import numpy as np

    from georay.kernels import measures as M

    rs = np.random.RandomState(0)
    for _ in range(25):
        nv = rs.randint(2, 12)
        coords = np.column_stack([rs.uniform(-170, 170, nv), rs.uniform(-80, 80, nv)])
        n = rs.randint(1, 9)
        pieces = M.segmentize_haversine(coords, n)
        assert len(pieces) == n

        def plen(p):
            return float(M.haversine_distance(p[:-1, 0], p[:-1, 1], p[1:, 0], p[1:, 1]).sum())

        total = plen(coords)
        lens = [plen(p) for p in pieces]
        assert abs(sum(lens) - total) < 1e-6 * max(total, 1)
        for length in lens:
            assert abs(length - total / n) < 1e-6 * max(total, 1)
        assert np.allclose(pieces[0][0], coords[0])
        assert np.allclose(pieces[-1][-1], coords[-1])
        for a, b in zip(pieces[:-1], pieces[1:]):
            assert np.allclose(a[-1], b[0])


def test_densify_geodesic_counts_and_spacing():
    """Metric-generic densify over the Karney metric: counts match the
    constructed fill and every densified edge respects max_distance."""
    import numpy as np

    from georay.kernels import measures as M
    from georay.kernels.geodesic import geodesic_distance

    offs = np.array([0, 4, 6])
    x = np.array([0.0, 1.0, 2.0, 3.0, 10.0, 10.5])
    y = np.array([0.0, 0.5, 0.0, 1.0, 40.0, 40.2])
    cnt = M.densify_geodesic_counts(x, y, offs, 30000.0)
    for li in range(2):
        c = np.column_stack([x[offs[li]:offs[li + 1]], y[offs[li]:offs[li + 1]]])
        d = M.densify_geodesic(c, 30000.0)
        assert len(d) == cnt[li]
        dd = geodesic_distance(d[:-1, 0], d[:-1, 1], d[1:, 0], d[1:, 1])
        assert (dd <= 30000.0 + 1e-6).all()
        assert np.allclose(d[0], c[0]) and np.allclose(d[-1], c[-1])
