"""Boolean operations on simple polygons: intersection, union, difference.

The reference's BooleanOps (geo/src/algorithm/bool_ops/mod.rs:44-110)
delegates to `i_overlay`; we carry an arc-tracing clipper for simple
(non-self-intersecting) rings in generic position:

  1. find every boundary-boundary crossing (proper intersections);
  2. split both boundaries into arcs at the crossing points (crossing
     coordinates computed once and SHARED, so arc endpoints stitch
     exactly);
  3. keep arcs by midpoint classification (intersection: A-arcs inside
     B + B-arcs inside A; union: outside/outside; difference A-B:
     A-arcs outside B + B-arcs inside A reversed);
  4. stitch arcs end-to-end into closed rings.

No-crossing cases degrade to containment/disjoint analysis (difference
with an island produces a polygon WITH A HOLE, returned as a ring
list).  Degenerate inputs (shared edges, vertex-on-edge touches) are
out of scope like the generic-position assumption documents; the
synthetic layers are in generic position.

Conformance anchors (tests): area identities |A∩B| + |A∪B| = |A| + |B|
and |A\\B| = |A| - |A∩B|; equality with the independently-tested
Sutherland-Hodgman rect clip when B is a rectangle.
"""

from __future__ import annotations

import numpy as np

from ..oracle import INSIDE, OUTSIDE, polygon_position, signed_area


def _ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if signed_area([ring]) >= 0 else ring[::-1].copy()


def _crossings(a: np.ndarray, b: np.ndarray):
    """Proper crossings between closed rings a and b.

    Returns (points, a_locs, b_locs): for crossing k, a_locs[k] =
    (edge_index, t) along a, likewise b_locs[k]."""
    pts, al, bl = [], [], []
    ax1, ay1 = a[:-1, 0], a[:-1, 1]
    ax2, ay2 = a[1:, 0], a[1:, 1]
    bx1, by1 = b[:-1, 0], b[:-1, 1]
    bx2, by2 = b[1:, 0], b[1:, 1]
    for i in range(len(ax1)):
        dxa, dya = ax2[i] - ax1[i], ay2[i] - ay1[i]
        d1 = dxa * (by1 - ay1[i]) - dya * (bx1 - ax1[i])
        d2 = dxa * (by2 - ay1[i]) - dya * (bx2 - ax1[i])
        cand = np.nonzero(d1 * d2 < 0)[0]
        for j in cand:
            dxb, dyb = bx2[j] - bx1[j], by2[j] - by1[j]
            d3 = dxb * (ay1[i] - by1[j]) - dyb * (ax1[i] - bx1[j])
            d4 = dxb * (ay2[i] - by1[j]) - dyb * (ax2[i] - bx1[j])
            if d3 * d4 < 0:
                t = d3 / (d3 - d4)  # param along a's edge i
                px = ax1[i] + t * dxa
                py = ay1[i] + t * dya
                u = d1[j] / (d1[j] - d2[j])  # param along b's edge j
                pts.append((px, py))
                al.append((i, t))
                bl.append((j, u))
    return pts, al, bl


def _split_arcs(ring: np.ndarray, locs, pts):
    """Split a closed ring at crossing locations -> list of arcs, each a
    coord array starting and ending at a crossing point.

    Crossing k sits at cyclic position s = edge + t in [0, n_edges);
    proper crossings have t strictly in (0, 1) so s is never integral.
    The arc from crossing k1 to the next crossing k2 carries every ring
    vertex whose cyclic position lies strictly between them."""
    n_edges = len(ring) - 1
    s = [e + t for (e, t) in locs]
    order = sorted(range(len(s)), key=lambda k: s[k])
    arcs = []
    for pos in range(len(order)):
        k1 = order[pos]
        k2 = order[(pos + 1) % len(order)]
        s1, s2 = s[k1], s[k2]
        span = (s2 - s1) % n_edges
        if len(order) == 1:
            span = float(n_edges)
        coords = [pts[k1]]
        v = (int(np.floor(s1)) + 1) % n_edges
        for _ in range(n_edges):  # hard cap: a ring has n_edges vertices
            d = (v - s1) % n_edges
            if d == 0.0:
                d = float(n_edges)
            if d >= span:
                break
            coords.append(tuple(ring[v]))
            v = (v + 1) % n_edges
        coords.append(pts[k2])
        arcs.append(np.asarray(coords))
    return arcs


def _arc_midpoint(arc: np.ndarray) -> tuple[float, float]:
    """A point on the arc's interior: midpoint of its longest segment."""
    seg = np.hypot(np.diff(arc[:, 0]), np.diff(arc[:, 1]))
    i = int(np.argmax(seg))
    return (
        float((arc[i, 0] + arc[i + 1, 0]) / 2.0),
        float((arc[i, 1] + arc[i + 1, 1]) / 2.0),
    )


def _stitch(arcs: list[np.ndarray]) -> list[np.ndarray]:
    """Chain arcs whose endpoints coincide exactly into closed rings."""
    unused = list(range(len(arcs)))
    rings = []
    while unused:
        cur = arcs[unused.pop(0)]
        coords = [cur]
        start = tuple(cur[0])
        end = tuple(cur[-1])
        guard = 0
        while end != start and guard < len(arcs) + 1:
            guard += 1
            found = None
            for k in unused:
                if tuple(arcs[k][0]) == end:
                    found = k
                    break
            if found is None:
                break
            nxt = arcs[found]
            unused.remove(found)
            coords.append(nxt[1:])
            end = tuple(nxt[-1])
        ring = np.vstack(coords)
        if tuple(ring[0]) == tuple(ring[-1]) and len(ring) >= 4:
            rings.append(ring)
    return rings


def _no_crossing_case(a, b, op: str) -> list[list[np.ndarray]]:
    a_in_b = polygon_position(float(a[0, 0]), float(a[0, 1]), [b]) != OUTSIDE
    b_in_a = polygon_position(float(b[0, 0]), float(b[0, 1]), [a]) != OUTSIDE
    if op == "intersection":
        if a_in_b:
            return [[a]]
        if b_in_a:
            return [[b]]
        return []
    if op == "union":
        if a_in_b:
            return [[b]]
        if b_in_a:
            return [[a]]
        return [[a], [b]]
    # difference a - b
    if a_in_b:
        return []
    if b_in_a:
        return [[a, b[::-1].copy()]]  # island becomes a hole
    return [[a]]


def boolean_op(ring_a: np.ndarray, ring_b: np.ndarray, op: str) -> list[list[np.ndarray]]:
    """op in {intersection, union, difference}; returns a multipolygon as
    a list of ring-lists (ring 0 exterior CCW, rest holes)."""
    a = _ensure_ccw(np.asarray(ring_a, dtype=np.float64))
    b = _ensure_ccw(np.asarray(ring_b, dtype=np.float64))
    pts, al, bl = _crossings(a, b)
    if len(pts) < 2:
        # zero crossings, or a numerically-tangent touch detected as a
        # single crossing: treat as non-crossing (the tangent case's
        # boolean result differs only by a measure-zero sliver)
        return _no_crossing_case(a, b, op)
    arcs_a = _split_arcs(a, al, pts)
    arcs_b = _split_arcs(b, bl, pts)

    keep: list[np.ndarray] = []
    for arc in arcs_a:
        mx, my = _arc_midpoint(arc)
        inside_b = polygon_position(mx, my, [b]) == INSIDE
        if (op == "intersection" and inside_b) or (op in ("union", "difference") and not inside_b):
            keep.append(arc)
    for arc in arcs_b:
        mx, my = _arc_midpoint(arc)
        inside_a = polygon_position(mx, my, [a]) == INSIDE
        if op == "intersection" and inside_a:
            keep.append(arc)
        elif op == "union" and not inside_a:
            keep.append(arc)
        elif op == "difference" and inside_a:
            keep.append(arc[::-1].copy())  # reversed: forms the cut boundary
    rings = _stitch(keep)
    out: list[list[np.ndarray]] = []
    # group rings into polygons: positive-area rings are exteriors,
    # negative-area rings are holes of the exterior containing them
    exts = [r for r in rings if signed_area([r]) > 0]
    holes = [r for r in rings if signed_area([r]) < 0]
    for e in exts:
        my_holes = [
            h
            for h in holes
            if polygon_position(float(h[0, 0]), float(h[0, 1]), [e]) != OUTSIDE
        ]
        out.append([e] + my_holes)
    return out


def intersection_area(ring_a: np.ndarray, ring_b: np.ndarray) -> float:
    return sum(
        abs(signed_area([rings[0]])) - sum(abs(signed_area([h])) for h in rings[1:])
        for rings in boolean_op(ring_a, ring_b, "intersection")
    )


def union_area(ring_a: np.ndarray, ring_b: np.ndarray) -> float:
    return sum(
        abs(signed_area([rings[0]])) - sum(abs(signed_area([h])) for h in rings[1:])
        for rings in boolean_op(ring_a, ring_b, "union")
    )


def difference_area(ring_a: np.ndarray, ring_b: np.ndarray) -> float:
    return sum(
        abs(signed_area([rings[0]])) - sum(abs(signed_area([h])) for h in rings[1:])
        for rings in boolean_op(ring_a, ring_b, "difference")
    )
