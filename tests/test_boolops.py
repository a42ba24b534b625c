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


import os
import re

import pytest as _pytest

CORPUS = "/root/reference/jts-test-runner/resources/testxml"


@_pytest.mark.skipif(not os.path.isdir(CORPUS), reason="JTS corpus not available")
def test_jts_overlay_corpus_simple_subset():
    """general/TestOverlayAA.xml: intersection/union areas match JTS
    expected output for the single-ring polygon cases in generic
    position (multipolygon/empty/degenerate inputs skipped — COVERAGE)."""
    from georay import io as gio

    def parse_cases(path):
        text = open(path).read()
        for case in re.findall(r"<case>(.*?)</case>", text, re.S):
            a = re.search(r"<a>\s*(.*?)\s*</a>", case, re.S)
            b = re.search(r"<b>\s*(.*?)\s*</b>", case, re.S)
            tests = re.findall(r'<op\s+name="(\w+)"[^>]*>\s*(.*?)\s*</op>', case, re.S)
            yield (a.group(1) if a else None, b.group(1) if b else None, tests)

    def tp(w):
        if w is None or "EMPTY" in w.upper():
            return None
        try:
            return gio.parse_wkt(w)
        except (ValueError, IndexError):
            return None

    def area_of(exp):
        if exp[0] == "polygon":
            return abs(oracle.signed_area([exp[1][0]])) - sum(
                abs(oracle.signed_area([h])) for h in exp[1][1:]
            )
        return sum(
            abs(oracle.signed_area([p[0]])) - sum(abs(oracle.signed_area([h])) for h in p[1:])
            for p in exp[1]
        )

    ok = 0
    for a_wkt, b_wkt, tests in parse_cases(os.path.join(CORPUS, "general/TestOverlayAA.xml")):
        ga, gb = tp(a_wkt), tp(b_wkt)
        if not ga or not gb or ga[0] != "polygon" or gb[0] != "polygon":
            continue
        if len(ga[1]) > 1 or len(gb[1]) > 1:
            continue
        for name, expected in tests:
            if name not in ("intersection", "union"):
                continue
            exp = tp(expected)
            if not exp or exp[0] not in ("polygon", "multipolygon"):
                continue
            want = area_of(exp)
            got = (
                boolops.intersection_area(ga[1][0], gb[1][0])
                if name == "intersection"
                else boolops.union_area(ga[1][0], gb[1][0])
            )
            assert got == pytest.approx(want, rel=1e-6, abs=1e-6), (a_wkt[:40], name)
            ok += 1
    assert ok >= 5
