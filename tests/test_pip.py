"""PiP kernel vs scalar oracle + reference test vectors.

Vectors ported from geo/src/algorithm/coordinate_position.rs:457-788 and
contains/polygon.rs:185-349 (FIXTURES.md §4).
"""

import numpy as np
import pytest

from georay import datagen, geom, oracle
from georay.index import GridIndex
from georay.kernels import pip

SQUARE = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)])
# polygon with a hole: outer 0..10, hole 4..6
OUTER = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
HOLE = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)])


def _layer(polys):
    import pyarrow as pa

    ids = [f"p{i}" for i in range(len(polys))]
    rings = geom.rings_to_arrow(polys)
    bbox = []
    for rs in polys:
        allc = np.vstack(rs)
        bbox.append((allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max()))
    bbox = np.asarray(bbox)
    t = pa.table(
        {
            "polygon_id": pa.array(ids),
            "rings": rings,
            "minx": pa.array(bbox[:, 0]),
            "miny": pa.array(bbox[:, 1]),
            "maxx": pa.array(bbox[:, 2]),
            "maxy": pa.array(bbox[:, 3]),
        }
    )
    return geom.PolygonLayer.from_arrow(t)


@pytest.mark.parametrize(
    "pt,expected",
    [
        ((1.0, 1.0), oracle.INSIDE),
        ((0.0, 0.0), oracle.BOUNDARY),   # vertex
        ((1.0, 0.0), oracle.BOUNDARY),   # edge midpoint
        ((3.0, 1.0), oracle.OUTSIDE),
        ((2.0, 2.0), oracle.BOUNDARY),   # corner vertex
        ((-0.0001, 1.0), oracle.OUTSIDE),
    ],
)
def test_square_positions(pt, expected):
    assert oracle.coord_pos_relative_to_ring(pt[0], pt[1], SQUARE) == expected
    layer = _layer([[SQUARE]])
    pos = pip.classify(np.array([pt]), layer, np.array([0]), np.array([0]))
    assert pos[0] == expected


@pytest.mark.parametrize(
    "pt,expected",
    [
        ((5.0, 5.0), oracle.OUTSIDE),    # inside the hole -> Outside
        ((4.0, 5.0), oracle.BOUNDARY),   # on hole boundary
        ((2.0, 2.0), oracle.INSIDE),
        ((0.0, 5.0), oracle.BOUNDARY),   # exterior boundary
        ((11.0, 5.0), oracle.OUTSIDE),
    ],
)
def test_hole_positions(pt, expected):
    rings = [OUTER, HOLE]
    assert oracle.polygon_position(pt[0], pt[1], rings) == expected
    layer = _layer([[OUTER, HOLE]])
    pos = pip.classify(np.array([pt]), layer, np.array([0]), np.array([0]))
    assert pos[0] == expected


def test_winding_invariance():
    """contains/polygon.rs:330-349: CW vs CCW rings classify identically."""
    for rings in ([OUTER, HOLE], [OUTER[::-1].copy(), HOLE], [OUTER, HOLE[::-1].copy()],
                  [OUTER[::-1].copy(), HOLE[::-1].copy()]):
        layer = _layer([rings])
        pts = np.array([(5.0, 5.0), (2.0, 2.0), (4.0, 5.0), (11.0, 5.0)])
        pos = pip.classify(pts, layer, np.arange(4), np.zeros(4, dtype=np.int64))
        assert list(pos) == [pip.OUTSIDE, pip.INSIDE, pip.BOUNDARY, pip.OUTSIDE]


def test_comb_teeth_horizontal_ray():
    """geo-benches/src/contains.rs:79-103 pathological case: query point
    horizontal to many vertices/edges."""
    teeth = []
    for i in range(0, 10, 2):
        teeth += [(float(i), 0.0), (float(i), 5.0), (float(i + 1), 5.0), (float(i + 1), 0.0)]
    teeth += [(9.0, -1.0), (0.0, -1.0), (0.0, 0.0)]
    ring = geom.close_ring(np.asarray(teeth, dtype=np.float64))
    layer = _layer([[ring]])
    pts = np.array([(0.5, 2.5), (1.5, 2.5), (2.5, 2.5), (0.5, 5.0), (-1.0, 5.0), (0.5, -0.5)])
    expected = [
        oracle.polygon_position(p[0], p[1], [ring]) for p in pts
    ]
    pos = pip.classify(pts, layer, np.arange(len(pts)), np.zeros(len(pts), dtype=np.int64))
    assert list(pos) == expected
    # tooth interior in, gap out
    assert expected[0] == oracle.INSIDE and expected[1] == oracle.OUTSIDE


def test_orient2d_exact_on_collinear():
    # collinear triple with coordinates that break naive float det
    x = 0.1 + 0.2  # 0.30000000000000004
    s = pip.orient2d_sign(
        np.array([0.0]), np.array([0.0]), np.array([x * 2]), np.array([x * 2]),
        np.array([x]), np.array([x]),
    )
    assert s[0] == 0
    assert oracle.orient2d(0.0, 0.0, x * 2, x * 2, x, x) == 0


def test_kernel_matches_oracle_on_generated_layer(rand_points):
    """Brute-force oracle sweep over the synthetic polygon layer."""
    table = datagen.generate_polygons(48)
    layer = geom.PolygonLayer.from_arrow(table)
    pts = rand_points[:600]
    # all pairs brute force via kernel
    n_pt, n_pl = len(pts), layer.num_polys
    pair_pt = np.repeat(np.arange(n_pt), n_pl)
    pair_poly = np.tile(np.arange(n_pl), n_pt)
    pos = pip.classify(pts, layer, pair_pt, pair_poly)
    # oracle on a subsample of pairs (scalar loop is slow)
    rs = np.random.RandomState(3)
    some = rs.choice(len(pair_pt), 800, replace=False)
    for k in some:
        i, j = int(pair_pt[k]), int(pair_poly[k])
        exp = oracle.polygon_position(pts[i, 0], pts[i, 1], layer.poly_rings(j))
        assert pos[k] == exp, (i, j)


def test_grid_index_sound_and_complete(rand_points):
    """Prepared-grid invariants: candidate pairs cover every true match
    (completeness) and every 'sure' (interior-cell) pair really is
    inside (soundness) — the two properties the fast path rests on."""
    table = datagen.generate_polygons(48)
    layer = geom.PolygonLayer.from_arrow(table)
    idx = GridIndex(layer)
    pts = rand_points[:800]
    pair_pt, pair_poly, sure = idx.candidates(pts[:, 0], pts[:, 1])
    got = set(zip(pair_pt.tolist(), pair_poly.tolist()))
    sure_pairs = list(zip(pair_pt[sure].tolist(), pair_poly[sure].tolist()))
    for i, j in sure_pairs:
        assert oracle.polygon_position(pts[i, 0], pts[i, 1], layer.poly_rings(j)) == oracle.INSIDE
    for i in range(len(pts)):
        for j in range(layer.num_polys):
            bb = layer.bbox[j]
            if bb[0] <= pts[i, 0] <= bb[2] and bb[1] <= pts[i, 1] <= bb[3]:
                if oracle.polygon_position(pts[i, 0], pts[i, 1], layer.poly_rings(j)) != oracle.OUTSIDE:
                    assert (i, j) in got
