"""Breadth operators: extremes, convexity, linear referencing, curve
similarity, MRR, CD-area, interior point, clipping, earcut, WKT/GeoJSON."""

import numpy as np
import pytest

from georay import datagen, geom, io, oracle
from georay.kernels import clip, more

SQUARE = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
L_SHAPE = np.array(
    [(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
)


def test_extremes():
    e = more.extremes(np.array([(3.0, 1.0), (0.0, 5.0), (7.0, -2.0), (2.0, 2.0)]))
    assert (e["x_min_idx"], e["x_max_idx"]) == (1, 2)
    assert (e["y_min_idx"], e["y_max_idx"]) == (2, 1)
    assert e["x_max"] == 7.0 and e["y_min"] == -2.0


def test_is_convex():
    assert more.is_convex(SQUARE)
    assert not more.is_convex(L_SHAPE)
    collinear = np.array([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)])
    assert more.is_convex(collinear)
    assert not more.is_convex(collinear, strict=True)


def test_closest_point_and_distance():
    x1, y1 = SQUARE[:-1, 0], SQUARE[:-1, 1]
    x2, y2 = SQUARE[1:, 0], SQUARE[1:, 1]
    cx, cy, d = more.closest_point_on_segments(5.0, 2.0, x1, y1, x2, y2)
    assert (cx, cy, d) == (4.0, 2.0, 1.0)
    cx, cy, d = more.closest_point_on_segments(6.0, 6.0, x1, y1, x2, y2)
    assert (cx, cy) == (4.0, 4.0)  # corner clamp


def test_line_locate_interpolate_roundtrip():
    line = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)])
    assert more.line_locate_point(line, 5.0, -1.0) == 0.25
    assert more.line_interpolate_point(line, 0.25) == (5.0, 0.0)
    assert more.line_interpolate_point(line, 0.75) == (10.0, 5.0)
    assert more.line_interpolate_point(line, 0.0) == (0.0, 0.0)
    assert more.line_interpolate_point(line, 1.0) == (10.0, 10.0)
    # locate(interpolate(f)) == f
    for f in (0.1, 0.33, 0.9):
        px, py = more.line_interpolate_point(line, f)
        assert more.line_locate_point(line, px, py) == pytest.approx(f, abs=1e-12)


def test_substring():
    line = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)])
    sub = more.substring(line, 0.25, 0.75)
    assert np.allclose(sub, [(5.0, 0.0), (10.0, 0.0), (10.0, 5.0)])


def test_frechet_distance():
    a = np.array([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)])
    b = a + (0.0, 1.0)
    assert more.frechet_distance(a, b) == 1.0
    # classic asymmetry vs hausdorff: frechet respects ordering
    c = np.array([(0.0, 0.0), (2.0, 0.0), (0.0, 0.0), (2.0, 0.0)])
    assert more.frechet_distance(a, a) == 0.0
    assert more.frechet_distance(a, c) >= more.hausdorff_distance(a, c)


def test_hausdorff_pointwise_semantics():
    # hausdorff_distance.rs works on COORD sets: for these segments the
    # coordwise answer is 1.0 even though segment-wise it'd be smaller
    a = np.array([(0.0, 0.0), (1.0, 0.0)])
    b = np.array([(0.0, 1.0), (1.0, 1.0)])
    assert more.hausdorff_distance(a, b) == 1.0
    assert more.hausdorff_distance(a, a) == 0.0


def test_minimum_rotated_rect():
    # tilted rectangle recovered exactly
    ring, area = more.minimum_rotated_rect(
        np.array([(0.0, 0.0), (2.0, 2.0), (1.0, 3.0), (-1.0, 1.0), (0.0, 0.0)])
    )
    assert area == pytest.approx(np.hypot(2, 2) * np.hypot(1, 1), rel=1e-12)
    # axis-aligned square: mrr area == bbox area
    _, a2 = more.minimum_rotated_rect(SQUARE)
    assert a2 == pytest.approx(16.0, rel=1e-12)


def test_chamberlain_duquette_area_sanity():
    # ~1-degree square at the equator: ~ (111 km)^2, within a few percent
    sq = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])
    a = more.chamberlain_duquette_ring_area(sq)
    assert abs(a) == pytest.approx(111.19e3**2, rel=0.05)
    # sign flips with winding (CCW positive, like area.rs)
    assert more.chamberlain_duquette_ring_area(sq[::-1].copy()) == pytest.approx(-a)


def test_interior_point_is_inside():
    table = datagen.generate_polygons(40)
    layer = geom.PolygonLayer.from_arrow(table)
    for p in range(layer.num_polys):
        rings = layer.poly_rings(p)
        x, y = more.interior_point(rings)
        assert oracle.polygon_position(x, y, rings) == oracle.INSIDE, p
    # with a hole covering the bbox midline the point still lands inside
    outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    hole = np.array([(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)])
    x, y = more.interior_point([outer, hole])
    assert oracle.polygon_position(x, y, [outer, hole]) == oracle.INSIDE


def test_clip_ring_to_rect():
    clipped = clip.clip_ring_to_rect(SQUARE, 2.0, 2.0, 6.0, 6.0)
    assert oracle.signed_area([clipped]) == pytest.approx(4.0)  # 2x2 overlap
    # disjoint -> empty
    assert len(clip.clip_ring_to_rect(SQUARE, 10.0, 10.0, 12.0, 12.0)) == 0
    # fully inside -> unchanged area
    inside = clip.clip_ring_to_rect(SQUARE, -1.0, -1.0, 5.0, 5.0)
    assert abs(oracle.signed_area([inside])) == pytest.approx(16.0)


def test_clip_area_conservation_over_tiles():
    """Sum of per-tile clipped areas == polygon area (tiling invariant)."""
    table = datagen.generate_polygons(24)
    layer = geom.PolygonLayer.from_arrow(table)
    for p in range(0, layer.num_polys, 3):
        ext = layer.poly_rings(p)[0]
        minx, miny, maxx, maxy = layer.bbox[p]
        # 4x4 tile grid over the bbox
        xs = np.linspace(minx - 0.01, maxx + 0.01, 5)
        ys = np.linspace(miny - 0.01, maxy + 0.01, 5)
        total = 0.0
        for i in range(4):
            for j in range(4):
                c = clip.clip_ring_to_rect(ext, xs[i], ys[j], xs[i + 1], ys[j + 1])
                if len(c):
                    total += abs(oracle.signed_area([c]))
        assert total == pytest.approx(abs(oracle.signed_area([ext])), rel=1e-9), p


def test_earcut_partitions_polygon():
    for ring in (SQUARE, L_SHAPE):
        tris = clip.triangulate_earcut(ring)
        assert len(tris) == (len(ring) - 1) - 2
        pts = ring[:-1]
        area = sum(
            abs(
                (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
                - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
            )
            / 2.0
            for a, b, c in tris
        )
        assert area == pytest.approx(abs(oracle.signed_area([ring])), rel=1e-12)


def test_earcut_on_generated_rings():
    table = datagen.generate_polygons(24)
    layer = geom.PolygonLayer.from_arrow(table)
    for p in range(layer.num_polys):
        ring = layer.poly_rings(p)[0]
        tris = clip.triangulate_earcut(ring)
        pts = ring[:-1]
        area = sum(
            abs(
                (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
                - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
            )
            / 2.0
            for a, b, c in tris
        )
        assert area == pytest.approx(abs(oracle.signed_area([ring])), rel=1e-6), p


def test_wkt_roundtrip():
    wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    kind, rings = io.parse_wkt(wkt)
    assert kind == "polygon" and len(rings) == 2
    assert np.array_equal(rings[0][0], rings[0][-1])
    back = io.to_wkt("polygon", rings)
    kind2, rings2 = io.parse_wkt(back)
    assert all(np.array_equal(a, b) for a, b in zip(rings, rings2))
    # unclosed ring gets force-closed (ring-closing invariant)
    kind3, rings3 = io.parse_wkt("POLYGON ((0 0, 1 0, 1 1))")
    assert np.array_equal(rings3[0][0], rings3[0][-1])
    # multipolygon + point + linestring
    k4, mp = io.parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    assert k4 == "multipolygon" and len(mp) == 2
    assert io.parse_wkt("POINT (3.5 -2)") == ("point", (3.5, -2.0))


def test_wkt_file_and_geojson_roundtrip(tmp_path):
    table = datagen.generate_polygons(12)
    gj = io.polygons_to_geojson(table)
    back = io.geojson_to_polygons(gj)
    l1 = geom.PolygonLayer.from_arrow(table)
    l2 = geom.PolygonLayer.from_arrow(back)
    assert l1.num_polys == l2.num_polys
    assert np.allclose(l1.coords, l2.coords)
    # WKT file -> table
    p = tmp_path / "polys.wkt"
    lines = []
    for i in range(l1.num_polys):
        lines.append(io.to_wkt("polygon", l1.poly_rings(i)))
    p.write_text("\n".join(lines))
    t3 = io.read_wkt_polygons(str(p))
    l3 = geom.PolygonLayer.from_arrow(t3)
    assert np.allclose(l1.coords, l3.coords)


# ---------------------------------------------------------------------------
# Delaunay / Voronoi
# ---------------------------------------------------------------------------

def test_delaunay_empty_circumcircle_property():
    from georay.kernels import triangulate

    rs = np.random.RandomState(13)
    pts = rs.uniform(0, 100, (60, 2))
    tris = triangulate.delaunay(pts)
    # covers the convex hull: triangle area sum == hull area
    tri_area = sum(
        abs(
            (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
            - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
        )
        / 2.0
        for a, b, c in tris
    )
    from georay.kernels import hull as khull

    hull_ring = khull.convex_hull_points(pts)
    assert tri_area == pytest.approx(abs(oracle.signed_area([hull_ring])), rel=1e-9)
    # Delaunay property: no point strictly inside any circumcircle
    for a, b, c in tris:
        if triangulate._ccw(*pts[a], *pts[b], *pts[c]) < 0:
            a, b = b, a
        for d in range(len(pts)):
            if d in (a, b, c):
                continue
            assert triangulate._incircle(*pts[a], *pts[b], *pts[c], *pts[d]) <= 0, (a, b, c, d)


def test_voronoi_tiles_envelope():
    from georay.kernels import triangulate

    rs = np.random.RandomState(17)
    pts = rs.uniform(10, 90, (25, 2))
    env = (0.0, 0.0, 100.0, 100.0)
    cells_ = triangulate.voronoi_cells(pts, env)
    assert len(cells_) == len(pts)
    total = 0.0
    for i, ring in enumerate(cells_):
        assert len(ring) >= 4
        # site inside its own cell
        assert oracle.polygon_position(pts[i, 0], pts[i, 1], [ring]) == oracle.INSIDE
        total += abs(oracle.signed_area([ring]))
    assert total == pytest.approx(100.0 * 100.0, rel=1e-9)  # exact tiling
    # cell membership: the cell of the nearest site contains the probe
    for _ in range(50):
        x, y = rs.uniform(1, 99, 2)
        near = int(np.argmin((pts[:, 0] - x) ** 2 + (pts[:, 1] - y) ** 2))
        assert oracle.polygon_position(x, y, [cells_[near]]) != oracle.OUTSIDE


def test_constrained_delaunay_polygons_with_holes():
    """r5 CDT (TriangulateSpade parity, triangulate_delaunay.rs:3,63-75):
    exact area partition, Euler triangle count V + 2H - 2 (no Steiner
    points), every constraint edge present, all on random simple star
    polygons with 0-2 holes."""
    from georay.kernels import triangulate
    from georay.kernels.triangulate import _edge_map, constrained_delaunay

    def shoe(r):
        s = 0.0
        for i in range(len(r)):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % len(r)]
            s += x1 * y2 - x2 * y1
        return abs(s) / 2.0

    rng = np.random.default_rng(3)
    for trial in range(40):
        k = int(rng.integers(6, 18))
        # bounded angular gaps -> guaranteed simple star polygon
        ang = (np.arange(k) + rng.uniform(0.1, 0.9, k)) * 2 * np.pi / k
        rad = rng.uniform(5, 10, k)
        ext = np.c_[rad * np.cos(ang), rad * np.sin(ang)]
        nh = int(rng.integers(0, 3))
        holes = []
        for cx, cy in [(-0.7, -0.7), (0.7, 0.7)][:nh]:
            kh = int(rng.integers(4, 9))
            angh = ((np.arange(kh) + rng.uniform(0.1, 0.9, kh)) * 2 * np.pi / kh)[::-1]
            radh = rng.uniform(0.2, 0.6, kh)
            holes.append(np.c_[cx + radh * np.cos(angh), cy + radh * np.sin(angh)])
        rings = [ext] + holes
        pts, tris, cons = constrained_delaunay(rings)
        assert len(tris) == len(pts) + 2 * len(holes) - 2, trial
        area = sum(
            abs(
                (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
                - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
            )
            / 2.0
            for a, b, c in tris
        )
        want = shoe(ext) - sum(shoe(h) for h in holes)
        assert area == pytest.approx(want, rel=1e-9), trial
        em = _edge_map(tris)
        assert all(e in em for e in cons), trial
        # all interior triangles CCW
        for a, b, c in tris:
            assert triangulate._ccw(*pts[a], *pts[b], *pts[c]) > 0


def test_constrained_delaunay_pinch_and_degenerate():
    from georay.kernels.triangulate import constrained_delaunay

    # vertex of the ring exactly ON another (vertical) edge: the
    # constraint splits; area partition stays exact
    ext = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 5]], dtype=float
    )  # (0,5) lies on edge (0,10)-(0,0)
    pts, tris, cons = constrained_delaunay([ext])
    area = sum(
        abs(
            (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
            - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
        )
        / 2.0
        for a, b, c in tris
    )
    assert area == pytest.approx(100.0, rel=1e-12)
    # degenerate inputs
    assert constrained_delaunay([np.zeros((0, 2))])[1] == []
    assert constrained_delaunay([np.array([[0.0, 0.0], [1.0, 1.0]])])[1] == []
