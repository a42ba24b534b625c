"""Boolean ops (intersection/union/difference) conformance."""

import numpy as np
import pytest

from georay import datagen, geom, oracle
from georay.kernels import boolops, clip

SQUARE = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])


def _rand_ring(rs, cx, cy, r0, nv):
    ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    radii = r0 * (0.6 + 0.8 * rs.rand(nv))
    ring = np.column_stack([cx + radii * np.cos(ang), cy + radii * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def test_boolean_rect_matches_sutherland_hodgman():
    """Intersection with a rectangle must equal the (independently
    tested) rect clipper's area."""
    rs = np.random.RandomState(2)
    rect = np.array([(1.0, 1.0), (6.0, 1.0), (6.0, 5.0), (1.0, 5.0), (1.0, 1.0)])
    for _ in range(25):
        ring = _rand_ring(rs, rs.uniform(0, 6), rs.uniform(0, 6), rs.uniform(1, 4), rs.randint(6, 20))
        got = boolops.intersection_area(ring, rect)
        sh = clip.clip_ring_to_rect(ring, 1.0, 1.0, 6.0, 5.0)
        want = abs(oracle.signed_area([sh])) if len(sh) else 0.0
        assert got == pytest.approx(want, rel=1e-9, abs=1e-12)


def test_boolean_area_identities_random():
    """|A∩B| + |A∪B| == |A| + |B| and |A\\B| == |A| - |A∩B|."""
    rs = np.random.RandomState(4)
    for _ in range(30):
        a = _rand_ring(rs, 0.0, 0.0, rs.uniform(1, 3), rs.randint(6, 24))
        b = _rand_ring(rs, rs.uniform(-2, 2), rs.uniform(-2, 2), rs.uniform(1, 3), rs.randint(6, 24))
        ia = boolops.intersection_area(a, b)
        ua = boolops.union_area(a, b)
        da = boolops.difference_area(a, b)
        aa = abs(oracle.signed_area([a]))
        ab = abs(oracle.signed_area([b]))
        assert ia + ua == pytest.approx(aa + ab, rel=1e-9), (ia, ua, aa, ab)
        assert da == pytest.approx(aa - ia, rel=1e-9, abs=1e-12)


def test_boolean_no_crossing_cases():
    inner = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    far = inner + 10.0
    # containment
    assert boolops.intersection_area(SQUARE, inner) == pytest.approx(1.0)
    assert boolops.union_area(SQUARE, inner) == pytest.approx(16.0)
    # difference with an island -> polygon with a hole
    out = boolops.boolean_op(SQUARE, inner, "difference")
    assert len(out) == 1 and len(out[0]) == 2  # exterior + hole
    assert boolops.difference_area(SQUARE, inner) == pytest.approx(15.0)
    # disjoint
    assert boolops.intersection_area(SQUARE, far) == 0.0
    assert boolops.union_area(SQUARE, far) == pytest.approx(17.0)
    assert boolops.difference_area(SQUARE, far) == pytest.approx(16.0)


def test_boolean_on_generated_layer_pairs():
    """Identities over real generated polygon pairs (bbox-overlapping)."""
    layer = geom.PolygonLayer.from_arrow(datagen.generate_polygons(48))
    checked = 0
    for ia in range(layer.num_polys):
        for ib in range(ia + 1, layer.num_polys):
            ba, bb = layer.bbox[ia], layer.bbox[ib]
            if ba[0] > bb[2] or ba[2] < bb[0] or ba[1] > bb[3] or ba[3] < bb[1]:
                continue
            a = layer.poly_rings(ia)[0]
            b = layer.poly_rings(ib)[0]
            ia_area = boolops.intersection_area(a, b)
            ua_area = boolops.union_area(a, b)
            aa = abs(oracle.signed_area([a]))
            ab = abs(oracle.signed_area([b]))
            assert ia_area + ua_area == pytest.approx(aa + ab, rel=1e-9), (ia, ib)
            checked += 1
    assert checked >= 3
