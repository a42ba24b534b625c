"""Geometry validation flags (geo/src/algorithm/validation/mod.rs:62-102).

Emits per-polygon validity booleans + a typed error code column rather
than raising — validity is data, not control flow, at pipeline scale.
Checks mirror the reference's polygon rules:

  TooFewPoints        ring has < 4 coords incl. closing (>= 3 distinct)
  NotClosed           first != last (the generator always closes; the
                      check still runs for foreign inputs)
  ZeroArea            degenerate ring (all points collinear)
  HoleOutsideShell    a hole's first vertex is outside the exterior
  SelfIntersection    any pair of non-adjacent ring edges cross
                      (O(n^2) per ring, bbox-pruned — rings are small)

Code 0 = valid; the first failing check wins (reference reports the
first problem found per geometry).
"""

from __future__ import annotations

import numpy as np

from ..geom import PolygonLayer
from . import pip
from .summaries import twice_signed_ring_areas

VALID = 0
TOO_FEW_POINTS = 1
NOT_CLOSED = 2
ZERO_AREA = 3
HOLE_OUTSIDE_SHELL = 4
SELF_INTERSECTION = 5


def _segments_cross(a1, a2, b1, b2) -> bool:
    """Proper or improper crossing of two segments (exact orientation)."""
    def os(p, q, r):
        return pip.orient2d_sign(
            np.asarray([p[0]]), np.asarray([p[1]]),
            np.asarray([q[0]]), np.asarray([q[1]]),
            np.asarray([r[0]]), np.asarray([r[1]]),
        )[0]

    d1, d2 = os(a1, a2, b1), os(a1, a2, b2)
    d3, d4 = os(b1, b2, a1), os(b1, b2, a2)
    if d1 != d2 and d3 != d4:
        return True
    def on(p, q, r):  # r collinear with pq and within its bbox
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )
    return (
        (d1 == 0 and on(a1, a2, b1))
        or (d2 == 0 and on(a1, a2, b2))
        or (d3 == 0 and on(b1, b2, a1))
        or (d4 == 0 and on(b1, b2, a2))
    )


def _ring_self_intersects(ring: np.ndarray) -> bool:
    n = len(ring) - 1  # closed
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j == i + 1) or (i == 0 and j == n - 1):
                continue  # adjacent edges share a vertex by construction
            if _segments_cross(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return True
    return False


def validate(layer: PolygonLayer, check_self_intersection: bool = True) -> np.ndarray:
    """int8[num_polys] error codes (0 = valid)."""
    codes = np.zeros(layer.num_polys, dtype=np.int8)
    ring_a2 = twice_signed_ring_areas(layer)
    for p in range(layer.num_polys):
        rings = layer.poly_rings(p)
        code = VALID
        for local, ring in enumerate(rings):
            r_global = layer.poly_ring_offsets[p] + local
            if len(ring) < 4:
                code = TOO_FEW_POINTS
                break
            if not np.array_equal(ring[0], ring[-1]):
                code = NOT_CLOSED
                break
            if ring_a2[r_global] == 0.0:
                code = ZERO_AREA
                break
        if code == VALID:
            for hole in rings[1:]:
                hx, hy = hole[0]
                ns = len(rings[0]) - 1
                if pip.ring_positions(
                    np.full(ns, hx), np.full(ns, hy),
                    rings[0][:-1, 0], rings[0][:-1, 1],
                    rings[0][1:, 0], rings[0][1:, 1],
                    np.zeros(ns, dtype=np.int64), 1,
                )[0] == pip.OUTSIDE:
                    code = HOLE_OUTSIDE_SHELL
                    break
        if code == VALID and check_self_intersection:
            for ring in rings:
                if _ring_self_intersects(ring):
                    code = SELF_INTERSECTION
                    break
        codes[p] = code
    return codes
