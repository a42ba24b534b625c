"""JTS/GEOS conformance-corpus replay (SURVEY.md §3.2 template).

Parses the reference's own JTS XML test files (WKT inputs + expected
outputs, jts-test-runner/resources/testxml/**) and replays the ops our
engine implements: contains / covers / intersects / within (polygon x
point), getCentroid, convexhull, distance.  Comparison rules follow the
reference runner: exact bool for predicates, relative_eq for centroids
(runner.rs:137-157), vertex-set equality for hulls.

Skips gracefully when the corpus isn't present (the engine itself never
reads the reference).
"""

import os
import re

import numpy as np
import pytest

from georay import io as gio
from georay import oracle
from georay.kernels import hull, more

CORPUS = "/root/reference/jts-test-runner/resources/testxml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="JTS conformance corpus not available"
)


def _parse_cases(path: str):
    text = open(path).read()
    for case in re.findall(r"<case>(.*?)</case>", text, re.S):
        a = re.search(r"<a>\s*(.*?)\s*</a>", case, re.S)
        b = re.search(r"<b>\s*(.*?)\s*</b>", case, re.S)
        tests = re.findall(
            r'<op\s+name="(\w+)"[^>]*?(?:arg3="([^"]*)")?\s*>\s*(.*?)\s*</op>', case, re.S
        )
        yield (a.group(1) if a else None, b.group(1) if b else None, tests)


def _try_parse(wkt):
    if wkt is None or "EMPTY" in wkt.upper() or "GEOMETRYCOLLECTION" in wkt.upper():
        return None
    try:
        return gio.parse_wkt(wkt)
    except (ValueError, IndexError):
        return None


def _iter_predicate_cases(fname):
    for a_wkt, b_wkt, tests in _parse_cases(os.path.join(CORPUS, fname)):
        ga, gb = _try_parse(a_wkt), _try_parse(b_wkt)
        if ga is None or gb is None:
            continue
        for name, _arg3, expected in tests:
            if name not in ("contains", "covers", "intersects", "within"):
                continue
            yield ga, gb, name, expected.strip().lower() == "true"


def test_prepared_polygon_predicates():
    """general/TestPreparedPolygonPredicate.xml: polygon x point cases."""
    checked = 0
    for ga, gb, name, expected in _iter_predicate_cases("general/TestPreparedPolygonPredicate.xml"):
        if ga[0] not in ("polygon", "multipolygon"):
            continue
        polys = ga[1] if ga[0] == "multipolygon" else [ga[1]]
        if gb[0] == "point":
            pts = [gb[1]]
        elif gb[0] == "multipoint":
            pts = [tuple(p) for p in gb[1]]
        else:
            continue
        positions = [
            max(oracle.polygon_position(px, py, rings) for rings in polys) for px, py in pts
        ]
        if name == "contains":
            # MultiPoint contained: no point outside, >=1 strictly inside
            got = all(p != oracle.OUTSIDE for p in positions) and any(
                p == oracle.INSIDE for p in positions
            )
        elif name == "covers":
            got = all(p != oracle.OUTSIDE for p in positions)
        elif name == "intersects":
            got = any(p != oracle.OUTSIDE for p in positions)
        else:  # within: point within polygon is the inverse arg order
            continue
        assert got == expected, (name, pts[:2], expected)
        checked += 1
    assert checked >= 10


def test_point_predicates():
    """general/TestPreparedPointPredicate.xml + TestRectanglePredicate.xml
    point/rect cases expressible with the point kernels."""
    checked = 0
    for fname in ("general/TestPreparedPointPredicate.xml", "general/TestRectanglePredicate.xml"):
        for ga, gb, name, expected in _iter_predicate_cases(fname):
            if name != "intersects":
                continue
            if ga[0] not in ("polygon",) or gb[0] != "point":
                continue
            px, py = gb[1]
            got = oracle.polygon_intersects_point(px, py, ga[1])
            assert got == expected, (fname, name, (px, py), expected)
            checked += 1
    assert checked >= 3


def test_centroid_corpus():
    """general/TestCentroid.xml — point/multipoint/linestring/polygon
    ladder vs our centroid implementations (relative_eq like runner.rs)."""
    checked = 0
    for a_wkt, _b, tests in _parse_cases(os.path.join(CORPUS, "general/TestCentroid.xml")):
        ga = _try_parse(a_wkt)
        if ga is None:
            continue
        for name, _arg3, expected in tests:
            if name != "getCentroid" or "EMPTY" in expected.upper():
                continue
            exp = _try_parse(expected)
            if exp is None:
                continue
            ex, ey = exp[1]
            kind, val = ga
            if kind == "point":
                got = val
            elif kind == "multipoint":
                got = oracle.multipoint_centroid(val)
            elif kind == "linestring":
                got = oracle.linestring_centroid([val])
            elif kind == "multilinestring":
                got = oracle.linestring_centroid(val)
            elif kind == "polygon":
                got = oracle.polygon_centroid_promoted(val)
            else:
                continue
            assert got[0] == pytest.approx(ex, rel=1e-9, abs=1e-9), (a_wkt[:60], expected)
            assert got[1] == pytest.approx(ey, rel=1e-9, abs=1e-9), (a_wkt[:60], expected)
            checked += 1
    assert checked >= 15


def test_convexhull_corpus():
    """general/TestConvexHull.xml — hull vertex sets match JTS expected."""
    checked = 0
    for a_wkt, _b, tests in _parse_cases(os.path.join(CORPUS, "general/TestConvexHull.xml")):
        ga = _try_parse(a_wkt)
        if ga is None:
            continue
        for name, _arg3, expected in tests:
            if name != "convexhull":
                continue
            exp = _try_parse(expected)
            if exp is None:
                continue
            kind, val = ga
            if kind == "point":
                pts = np.asarray([val])
            elif kind in ("multipoint", "linestring"):
                pts = np.asarray(val)
            elif kind == "polygon":
                pts = np.vstack([r[:-1] for r in val])
            else:
                continue
            got = hull.convex_hull_points(pts)
            if exp[0] == "polygon":
                exp_pts = {tuple(p) for p in exp[1][0][:-1]}
                got_pts = {tuple(p) for p in got[:-1]}
            elif exp[0] == "linestring":
                exp_pts = {tuple(p) for p in np.asarray(exp[1])}
                got_pts = {tuple(p) for p in got}
            elif exp[0] == "point":
                exp_pts = {exp[1]}
                got_pts = {tuple(p) for p in got}
            else:
                continue
            assert got_pts == exp_pts, (a_wkt[:60],)
            checked += 1
    assert checked >= 8


def test_distance_corpus():
    """general/TestDistance.xml — geometry-to-geometry euclidean distance."""
    checked = 0
    for a_wkt, b_wkt, tests in _parse_cases(os.path.join(CORPUS, "general/TestDistance.xml")):
        ga, gb = _try_parse(a_wkt), _try_parse(b_wkt)
        if ga is None or gb is None:
            continue
        if ga[0] in ("multipoint", "multilinestring") or gb[0] in ("multipoint", "multilinestring"):
            continue
        if ga[0] == "point" and ga[1] is None:
            continue
        for name, _arg3, expected in tests:
            if name != "distance":
                continue
            exp = float(expected)
            got = more.geometry_distance(ga, gb)
            assert got == pytest.approx(exp, rel=1e-9, abs=1e-9), (a_wkt[:50], b_wkt[:50])
            checked += 1
    assert checked >= 4


def test_relate_point_corpora():
    """validate/TestRelatePP.xml + TestRelatePA.xml: DE-9IM matrices and
    every named predicate for point/multipoint x point/polygon pairs."""
    from georay import relate

    checked_rel = checked_pred = 0
    for fname in ("validate/TestRelatePP.xml", "validate/TestRelatePA.xml"):
        for a_wkt, b_wkt, tests in _parse_cases(os.path.join(CORPUS, fname)):
            ga, gb = _try_parse(a_wkt), _try_parse(b_wkt)
            if ga is None or gb is None:
                continue
            m = None
            dim_a = dim_b = 0
            if ga[0] == "point" and gb[0] == "point":
                m = relate.relate_point_point(ga[1], gb[1])
            elif ga[0] in ("point", "multipoint") and gb[0] == "polygon":
                pts = np.atleast_2d(np.asarray(ga[1] if ga[0] == "multipoint" else [ga[1]]))
                m = relate.relate_points_polygon(pts, gb[1])
                dim_b = 2
            elif ga[0] == "polygon" and gb[0] in ("point", "multipoint"):
                pts = np.atleast_2d(np.asarray(gb[1] if gb[0] == "multipoint" else [gb[1]]))
                m = relate.relate_polygon_points(ga[1], pts)
                dim_a = 2
            elif ga[0] == "multipoint" and gb[0] == "multipoint":
                sa = {tuple(p) for p in np.atleast_2d(ga[1])}
                sb = {tuple(p) for p in np.atleast_2d(gb[1])}
                ii = "0" if sa & sb else "F"
                ie = "0" if sa - sb else "F"
                ei = "0" if sb - sa else "F"
                m = f"{ii}F{ie}FFF{ei}F2"
            if m is None:
                continue
            preds = {
                "contains": relate.is_contains(m),
                "within": relate.is_within(m),
                "covers": relate.is_covers(m),
                "coveredBy": relate.is_coveredby(m),
                "disjoint": relate.is_disjoint(m),
                "intersects": relate.is_intersects(m),
                "equalsTopo": relate.is_equal_topo(m),
                "touches": relate.is_touches(m),
                "crosses": relate.is_crosses(m, dim_a, dim_b),
                "overlaps": relate.is_overlaps(m, dim_a, dim_b),
            }
            for name, arg3, expected in tests:
                want = expected.strip().lower() == "true"
                if name == "relate" and arg3:
                    assert relate.matches(m, arg3) == want, (fname, a_wkt[:40], m, arg3)
                    checked_rel += 1
                elif name in preds:
                    assert preds[name] == want, (fname, a_wkt[:40], m, name)
                    checked_pred += 1
    assert checked_rel >= 20 and checked_pred >= 100
