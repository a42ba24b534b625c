"""Point-in-polygon: vectorized winding number with geo's exact edge rules.

Reimplements `coord_pos_relative_to_ring`
(geo/src/algorithm/coordinate_position.rs:399-455):

  1. an upward edge includes its starting endpoint, excludes its final one;
  2. a downward edge excludes its starting endpoint, includes its final one;
  3. horizontal edges are excluded;
  4. the edge-ray intersection must be strictly right of the coord;
  collinear-and-between short-circuits to OnBoundary.

and the polygon-with-holes classification of
`CoordinatePosition for Polygon` (coordinate_position.rs:281-319):
outside exterior -> Outside; on exterior -> OnBoundary; inside exterior
but inside a hole -> Outside; on a hole boundary -> OnBoundary.

Orientation uses the RobustKernel contract
(geo/src/algorithm/kernels/robust.rs:18-43): the float determinant is
trusted only outside Shewchuk's error bound; ambiguous rows are
re-evaluated in exact rational arithmetic, so collinear detection is
exact like the `robust` crate's adaptive predicates.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from ..geom import PolygonLayer, _ranges

# Shewchuk's ccwerrboundA = (3 + 16 * eps) * eps, eps = 2^-53
_CCW_ERRBOUND = (3.0 + 16.0 * 2.0**-53) * 2.0**-53

OUTSIDE, BOUNDARY, INSIDE = np.int8(0), np.int8(1), np.int8(2)


def orient2d_sign(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray,
    px: np.ndarray, py: np.ndarray,
) -> np.ndarray:
    """Exact sign of orient2d(start, end, point): +1 CCW, -1 CW, 0 collinear."""
    detleft = (x2 - x1) * (py - y1)
    detright = (y2 - y1) * (px - x1)
    det = detleft - detright
    sign = np.sign(det).astype(np.int8)
    # adaptive exactness: only rows inside the error band need exact math
    errbound = _CCW_ERRBOUND * (np.abs(detleft) + np.abs(detright))
    ambiguous = np.abs(det) <= errbound
    if np.any(ambiguous):
        idx = np.nonzero(ambiguous)[0]
        for i in idx:
            d = (Fraction(float(x2[i])) - Fraction(float(x1[i]))) * (
                Fraction(float(py[i])) - Fraction(float(y1[i]))
            ) - (Fraction(float(y2[i])) - Fraction(float(y1[i]))) * (
                Fraction(float(px[i])) - Fraction(float(x1[i]))
            )
            sign[i] = np.int8(0 if d == 0 else (1 if d > 0 else -1))
    return sign


def _value_in_between(value: np.ndarray, b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """geo/src/algorithm/intersects/mod.rs:90-99."""
    return (np.minimum(b1, b2) <= value) & (value <= np.maximum(b1, b2))


def ring_positions(
    px: np.ndarray, py: np.ndarray,
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray,
    task: np.ndarray, n_tasks: int,
) -> np.ndarray:
    """Positions of expanded (point x ring-segment) rows, reduced per task.

    Rows belonging to task t are the segments of one ring paired with one
    query point; returns int8[n_tasks] of OUTSIDE/BOUNDARY/INSIDE.
    """
    up = (y1 <= py) & (y2 >= py)
    down = (y1 > py) & (y2 <= py)
    need = up | down
    sign = np.zeros(len(px), dtype=np.int8)
    if np.any(need):
        nz = np.nonzero(need)[0]
        sign[nz] = orient2d_sign(x1[nz], y1[nz], x2[nz], y2[nz], px[nz], py[nz])

    up_cross = up & (sign > 0) & (y2 != py)
    down_cross = down & (sign < 0)
    on_boundary = need & (sign == 0) & _value_in_between(px, x1, x2)

    # grouped sums via bincount (np.add.at is ~10x slower)
    wn = np.bincount(task[up_cross], minlength=n_tasks) - np.bincount(
        task[down_cross], minlength=n_tasks
    )
    bnd = np.bincount(task[on_boundary], minlength=n_tasks) > 0

    pos = np.where(wn != 0, INSIDE, OUTSIDE).astype(np.int8)
    pos[bnd] = BOUNDARY
    return pos


def classify(
    points: np.ndarray,
    layer: PolygonLayer,
    pair_pt: np.ndarray,
    pair_poly: np.ndarray,
) -> np.ndarray:
    """Position of each candidate (point, polygon) pair (see classify_xy)."""
    return classify_xy(points[:, 0], points[:, 1], layer, pair_pt, pair_poly)


def classify_xy(
    lon: np.ndarray,
    lat: np.ndarray,
    layer: PolygonLayer,
    pair_pt: np.ndarray,
    pair_poly: np.ndarray,
) -> np.ndarray:
    """Position of each candidate (point, polygon) pair: int8[len(pairs)].

    Vectorization: candidate pairs expand to (pair, ring) tasks, ring
    tasks expand to (task, segment) rows; winding numbers reduce back up
    with grouped adds.  Work is proportional to candidate segments, not
    |points| x |polygons| — the bbox/cell coarse phase supplies pairs.
    Takes separate lon/lat arrays so the hot join path never pays a
    column_stack copy (measured ~15%% of the fused stage).
    """
    n_pairs = len(pair_pt)
    if n_pairs == 0:
        return np.empty(0, dtype=np.int8)

    # ---- expand pairs -> ring tasks
    ring_lo = layer.poly_ring_offsets[pair_poly]
    ring_hi = layer.poly_ring_offsets[pair_poly + 1]
    rings_per_pair = ring_hi - ring_lo
    task_pair = np.repeat(np.arange(n_pairs, dtype=np.int64), rings_per_pair)
    task_ring = np.repeat(ring_lo, rings_per_pair) + _ranges(rings_per_pair)
    task_is_hole = layer.ring_is_hole[task_ring]
    n_tasks = len(task_ring)

    # ---- expand ring tasks -> segment rows
    seg_lo = layer.ring_offsets[task_ring]
    seg_cnt = layer.ring_offsets[task_ring + 1] - seg_lo - 1  # closed ring: n-1 edges
    row_task = np.repeat(np.arange(n_tasks, dtype=np.int64), seg_cnt)
    row_coord = np.repeat(seg_lo, seg_cnt) + _ranges(seg_cnt)

    row_pt = pair_pt[task_pair[row_task]]
    px = lon[row_pt]
    py = lat[row_pt]
    x1 = layer.coords[row_coord, 0]
    y1 = layer.coords[row_coord, 1]
    x2 = layer.coords[row_coord + 1, 0]
    y2 = layer.coords[row_coord + 1, 1]

    ring_pos = ring_positions(px, py, x1, y1, x2, y2, row_task, n_tasks)

    # ---- combine rings per pair (coordinate_position.rs:281-319)
    ext_pos = np.full(n_pairs, OUTSIDE, dtype=np.int8)
    ext_mask = ~task_is_hole
    ext_pos[task_pair[ext_mask]] = ring_pos[ext_mask]

    hole_inside = np.zeros(n_pairs, dtype=bool)
    hole_boundary = np.zeros(n_pairs, dtype=bool)
    hole_mask = task_is_hole
    if np.any(hole_mask):
        np.logical_or.at(hole_inside, task_pair[hole_mask], ring_pos[hole_mask] == INSIDE)
        np.logical_or.at(hole_boundary, task_pair[hole_mask], ring_pos[hole_mask] == BOUNDARY)

    pos = np.full(n_pairs, OUTSIDE, dtype=np.int8)
    inside_ext = ext_pos == INSIDE
    pos[inside_ext & ~hole_inside & ~hole_boundary] = INSIDE
    pos[inside_ext & hole_boundary] = BOUNDARY
    pos[ext_pos == BOUNDARY] = BOUNDARY
    return pos


def contains(points, layer, pair_pt, pair_poly) -> np.ndarray:
    """Polygon.contains(Point): Inside only, boundary excluded
    (geo/src/algorithm/contains/polygon.rs:13-22)."""
    return classify(points, layer, pair_pt, pair_poly) == INSIDE


def intersects(points, layer, pair_pt, pair_poly) -> np.ndarray:
    """Polygon.intersects(Coord): position != Outside
    (geo/src/algorithm/intersects/polygon.rs:9-16)."""
    return classify(points, layer, pair_pt, pair_poly) != OUTSIDE


def covers(points, layer, pair_pt, pair_poly) -> np.ndarray:
    """Covers = contains or on boundary (geo/src/algorithm/covers/)."""
    return classify(points, layer, pair_pt, pair_poly) != OUTSIDE
