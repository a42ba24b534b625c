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
