"""Convex hull kernels (per-row and as a distributive dataset aggregate).

Semantics follow the reference's ConvexHull trait
(geo/src/algorithm/convex_hull/mod.rs:42-75, QuickHull per qhull.rs):
output is a CLOSED, CCW ring.  We canonicalize the start vertex to the
lexicographic minimum so results are deterministic across partitionings
(the reference's start vertex is an implementation detail; set equality
is what its tests assert).

Dataset-level hull is the classic distributive aggregate (SURVEY.md
§2.4): per-block hull inside ``map_batches`` -> union of hull points ->
final hull; associativity is property-tested against the scalar oracle.
"""

from __future__ import annotations

import numpy as np

from ..oracle import convex_hull as _scalar_hull


def convex_hull_points(points: np.ndarray) -> np.ndarray:
    """Hull of a point set -> closed CCW ring ((h+1, 2) array).

    Vectorized Andrew's monotone chain: sort once with numpy, build the
    two chains with exact-orientation checks only on the chain frontier
    (the scalar chain walk is O(n) after the vectorized sort; orient2d
    uses the same exact-fallback predicate as the PiP kernel).
    """
    return _scalar_hull(points)


def hull_merge(hulls: list[np.ndarray]) -> np.ndarray:
    """Merge partial hulls (distributive step): hull of hull vertices."""
    pts = np.vstack([h[:-1] for h in hulls if len(h) > 1])
    return convex_hull_points(pts)


class HullAggregator:
    """Streaming dataset-level hull: feed point batches, emit the hull.

    Used two ways: inside map_batches for per-partition partial hulls,
    and on the driver/final stage to merge partials (the partial state
    is just the partial hull's vertex array — tiny).
    """

    def __init__(self):
        self._partial: np.ndarray | None = None

    def update(self, pts: np.ndarray) -> None:
        if self._partial is not None:
            pts = np.vstack([self._partial[:-1], pts])
        self._partial = convex_hull_points(pts)

    def merge(self, other: "HullAggregator") -> None:
        if other._partial is not None:
            self.update(other._partial[:-1])

    def result(self) -> np.ndarray:
        return self._partial if self._partial is not None else np.empty((0, 2))


def concave_hull_knn(points: np.ndarray, k: int = 7) -> np.ndarray:
    """k-nearest-neighbours concave hull (Moreira & Santos 2007 — the
    reference's KNearestConcaveHull, k_nearest_concave_hull.rs:36):
    walk from the lowest point, at each step choosing among the k
    nearest unvisited points the one with the largest right-hand turn
    that does not intersect the hull built so far; k grows and the walk
    restarts when the polygon cannot close or leaves points outside.
    Returns a closed ring."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 3:
        return convex_hull_points(pts)
    k = max(3, min(k, n - 1))

    def _angle(ax, ay, bx, by):
        return np.arctan2(by - ay, bx - ax)

    def _proper_cross(p1, p2, p3, p4) -> bool:
        """Strictly-interior segment crossing (shared endpoints allowed —
        the walk's consecutive edges and the closing edge legitimately
        touch at vertices)."""
        from . import pip as _pip

        def s(a, b, c):
            return _pip.orient2d_sign(
                np.asarray([a[0]]), np.asarray([a[1]]),
                np.asarray([b[0]]), np.asarray([b[1]]),
                np.asarray([c[0]]), np.asarray([c[1]]),
            )[0]

        d1, d2 = s(p1, p2, p3), s(p1, p2, p4)
        d3, d4 = s(p3, p4, p1), s(p3, p4, p2)
        return d1 != d2 and d3 != d4 and 0 not in (d1, d2, d3, d4)

    def _intersects(path, a, b):
        for i in range(len(path) - 2):  # skip the edge sharing the endpoint
            if _proper_cross(path[i], path[i + 1], a, b):
                return True
        return False

    while k < n:
        start = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])  # lowest y, then x
        hull_path = [pts[start]]
        used = np.zeros(n, dtype=bool)
        used[start] = True
        cur = start
        prev_angle = np.pi  # incoming direction: walk right first
        step = 0
        ok = True
        while step < 2 * n:
            step += 1
            if step > 2 and not used[start]:
                pass
            cand = np.nonzero(~used)[0]
            if step > 2:
                cand = np.append(cand, start)  # allow closing
            if len(cand) == 0:
                ok = False
                break
            d = np.hypot(pts[cand, 0] - pts[cur, 0], pts[cand, 1] - pts[cur, 1])
            nearest = cand[np.argsort(d, kind="stable")[:k]]
            # sort by largest right turn from the previous direction
            ang = _angle(pts[cur, 0], pts[cur, 1], pts[nearest, 0], pts[nearest, 1])
            turn = np.mod(prev_angle - ang, 2 * np.pi)
            order = nearest[np.argsort(-turn, kind="stable")]
            chosen = -1
            for c in order:
                seg_ok = not _intersects(
                    hull_path, tuple(pts[cur]), tuple(pts[c])
                )
                if seg_ok:
                    chosen = int(c)
                    break
            if chosen < 0:
                ok = False
                break
            hull_path.append(pts[chosen])
            if chosen == start:
                break
            prev_angle = _angle(pts[chosen, 0], pts[chosen, 1], pts[cur, 0], pts[cur, 1])
            used[chosen] = True
            cur = chosen
        else:
            ok = False
        ring = np.asarray(hull_path)
        if ok and len(ring) >= 4 and np.array_equal(ring[0], ring[-1]):
            from ..oracle import polygon_position, OUTSIDE

            if all(
                polygon_position(float(x), float(y), [ring]) != OUTSIDE
                for x, y in pts
            ):
                return ring
        k += 1
    return convex_hull_points(pts)


# ---------------------------------------------------------------------------
# ConcaveHull with concavity parameter (concave_hull.rs:104-430 — the
# concaveman-style edge-drilling algorithm: start from the convex hull,
# repeatedly replace an edge by two edges through the nearest admissible
# interior point while max_length = edge_len / concavity allows)
# ---------------------------------------------------------------------------


def _pt_seg_dist(px, py, a, b) -> np.ndarray:
    """Euclidean distance of points to one segment (vectorized)."""
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return np.hypot(px - ax, py - ay)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _segs_intersect(a1, a2, b1, b2) -> bool:
    from .pip import orient2d_sign

    def s(p, q, r):
        return orient2d_sign(
            np.asarray([p[0]]), np.asarray([p[1]]),
            np.asarray([q[0]]), np.asarray([q[1]]),
            np.asarray([r[0]]), np.asarray([r[1]]),
        )[0]

    d1, d2 = s(b1, b2, a1), s(b1, b2, a2)
    d3, d4 = s(a1, a2, b1), s(a1, a2, b2)
    if d1 != d2 and d3 != d4:
        return True
    for p, q, r, dd in ((b1, b2, a1, d1), (b1, b2, a2, d2), (a1, a2, b1, d3), (a1, a2, b2, d4)):
        if dd == 0 and (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        ):
            return True
    return False


def _tri_contains(a, b, c, p) -> bool:
    """Strict interior containment (geo Triangle::contains semantics)."""
    from .pip import orient2d_sign

    def s(u, v, w):
        return orient2d_sign(
            np.asarray([u[0]]), np.asarray([u[1]]),
            np.asarray([v[0]]), np.asarray([v[1]]),
            np.asarray([w[0]]), np.asarray([w[1]]),
        )[0]

    d1, d2, d3 = s(a, b, p), s(b, c, p), s(c, a, p)
    return (d1 > 0 and d2 > 0 and d3 > 0) or (d1 < 0 and d2 < 0 and d3 < 0)


def concave_hull(points: np.ndarray, concavity: float = 2.0,
                 length_threshold: float = 0.0) -> np.ndarray:
    """Concave hull of a point set -> closed ring (concave_hull.rs:104;
    ConcaveHullOptions default concavity=2.0, length_threshold=0)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    chull = convex_hull_points(pts)  # closed ring
    if len(pts) < 4:
        return chull
    concavity = max(concavity, 0.0)
    hull_pts = {(x, y) for x, y in chull[:-1]}
    interior = [tuple(p) for p in pts if tuple(p) not in hull_pts]
    # edge list with linked indices
    n0 = len(chull) - 1
    edges: list[dict] = []
    for i in range(n0):
        edges.append(
            {"s": tuple(chull[i]), "e": tuple(chull[i + 1]),
             "prev": (i - 1) % n0, "next": (i + 1) % n0}
        )
    from collections import deque

    queue = deque(range(n0))
    while queue:
        ei = queue.popleft()
        edge = edges[ei]
        a, b = edge["s"], edge["e"]
        length = float(np.hypot(b[0] - a[0], b[1] - a[1]))
        if length <= length_threshold or not interior:
            continue
        if concavity == 0:
            max_len = np.inf
        else:
            max_len = length / concavity
        ipts = np.asarray(interior)
        dist = _pt_seg_dist(ipts[:, 0], ipts[:, 1], a, b)
        order = np.argsort(dist, kind="stable")
        prev_e, next_e = edges[edge["prev"]], edges[edge["next"]]
        checked: list[tuple] = []
        candidate = None
        for k in order:
            if dist[k] > max_len:
                break
            p = interior[int(k)]
            d_prev = _pt_seg_dist(np.asarray([p[0]]), np.asarray([p[1]]),
                                  prev_e["s"], prev_e["e"])[0]
            d_next = _pt_seg_dist(np.asarray([p[0]]), np.asarray([p[1]]),
                                  next_e["s"], next_e["e"])[0]
            if dist[k] >= d_prev or dist[k] >= d_next:
                checked.append(p)
                continue
            # intersection check vs every current hull edge (skip shared endpoints)
            bad = False
            for oe in edges:
                if oe["s"] in (a, p, b) or oe["e"] in (a, p, b):
                    continue
                if _segs_intersect(a, p, oe["s"], oe["e"]) or _segs_intersect(p, b, oe["s"], oe["e"]):
                    bad = True
                    break
            if bad:
                checked.append(p)
                continue
            excl = next((q for q in checked if _tri_contains(a, p, b, q)), None)
            candidate = excl if excl is not None else p
            break
        if candidate is None:
            continue
        sl = float(np.hypot(candidate[0] - a[0], candidate[1] - a[1]))
        el = float(np.hypot(b[0] - candidate[0], b[1] - candidate[1]))
        if min(sl, el) >= max_len:
            continue
        interior.remove(candidate)
        end_i = len(edges)
        new_start = {"s": a, "e": candidate, "prev": edge["prev"], "next": end_i}
        new_end = {"s": candidate, "e": b, "prev": ei, "next": edge["next"]}
        edges[ei] = new_start
        edges.append(new_end)
        edges[new_end["next"]]["prev"] = end_i  # successor's back-link (ADVICE r2)
        queue.append(ei)
        queue.append(end_i)
    # order the ring
    out = [edges[0]["s"]]
    cur = 0
    for _ in range(len(edges)):
        out.append(edges[cur]["e"])
        cur = edges[cur]["next"]
    return np.asarray(out, dtype=np.float64)
