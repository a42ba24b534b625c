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
