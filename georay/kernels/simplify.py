"""Simplification kernels: Ramer-Douglas-Peucker and Visvalingam-Whyatt.

* RDP mirrors geo/src/algorithm/simplify.rs: epsilon <= 0 returns the
  input unchanged (simplify.rs:28-31); split at the vertex of maximum
  perpendicular distance, recurse while dmax > epsilon
  (simplify.rs:73-135).  Implemented iteratively (explicit stack) over
  the flat coord buffer — row-parallel across a batch of linestrings.
* VW mirrors simplify_vw.rs: repeatedly drop the vertex forming the
  minimum-area triangle while that area < epsilon (heap-based).
"""

from __future__ import annotations

import heapq

import numpy as np


def rdp_mask(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Boolean keep-mask for one linestring (simplify.rs semantics)."""
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    if epsilon <= 0.0 or n < 3:
        keep[:] = True
        return keep
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    x, y = coords[:, 0], coords[:, 1]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = x[a], y[a], x[b], y[b]
        seg = np.hypot(bx - ax, by - ay)
        ix = slice(a + 1, b)
        if seg == 0.0:
            d = np.hypot(x[ix] - ax, y[ix] - ay)
        else:
            d = np.abs((bx - ax) * (ay - y[ix]) - (ax - x[ix]) * (by - ay)) / seg
        i = int(np.argmax(d))
        if d[i] > epsilon:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def rdp(coords: np.ndarray, epsilon: float) -> np.ndarray:
    return coords[rdp_mask(coords, epsilon)]


def vw_mask(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Visvalingam-Whyatt keep-mask (simplify_vw.rs min-triangle-area heap).

    epsilon is the area threshold: vertices whose effective triangle
    area is < epsilon are removed, smallest first, areas re-evaluated as
    neighbours disappear (matching the reference's heap algorithm).
    """
    n = len(coords)
    keep = np.ones(n, dtype=bool)
    if epsilon <= 0.0 or n < 3:
        return keep
    x, y = coords[:, 0], coords[:, 1]
    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1

    def tri_area(a: int, b: int, c: int) -> float:
        return abs((x[b] - x[a]) * (y[c] - y[a]) - (y[b] - y[a]) * (x[c] - x[a])) / 2.0

    heap: list[tuple[float, int, int, int]] = []
    for i in range(1, n - 1):
        heapq.heappush(heap, (tri_area(i - 1, i, i + 1), i, i - 1, i + 1))
    alive = n
    while heap:
        area, i, pi, ni = heapq.heappop(heap)
        if not keep[i] or prev[i] != pi or nxt[i] != ni:
            continue  # stale entry
        if area >= epsilon:
            break
        if alive <= 3:
            break
        keep[i] = False
        alive -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        if p > 0:
            heapq.heappush(heap, (tri_area(prev[p], p, q), p, prev[p], q))
        if q < n - 1:
            heapq.heappush(heap, (tri_area(p, q, nxt[q]), q, p, nxt[q]))
    return keep


def vw(coords: np.ndarray, epsilon: float) -> np.ndarray:
    return coords[vw_mask(coords, epsilon)]


def chaikin(coords: np.ndarray, iterations: int = 1, closed: bool = False) -> np.ndarray:
    """Chaikin corner-cutting smoothing (chaikin_smoothing.rs): each
    segment contributes its 1/4 and 3/4 points; endpoints of open lines
    are preserved (reference behavior)."""
    out = np.asarray(coords, dtype=np.float64)
    for _ in range(iterations):
        if len(out) < 3:
            return out
        if closed:
            body = out[:-1] if np.array_equal(out[0], out[-1]) else out
            a = body
            b = np.roll(body, -1, axis=0)
            q = 0.75 * a + 0.25 * b
            r = 0.25 * a + 0.75 * b
            out = np.empty((2 * len(body) + 1, 2))
            out[0:-1:2] = q
            out[1::2] = r
            out[-1] = out[0]
        else:
            a, b = out[:-1], out[1:]
            q = 0.75 * a + 0.25 * b
            r = 0.25 * a + 0.75 * b
            mid = np.empty((2 * len(a), 2))
            mid[0::2] = q
            mid[1::2] = r
            out = np.vstack([out[:1], mid, out[-1:]])
    return out


def remove_repeated_points(coords: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate coords (remove_repeated_points.rs)."""
    if len(coords) < 2:
        return coords
    same = np.all(coords[1:] == coords[:-1], axis=1)
    return coords[np.concatenate([[True], ~same])]


def densify_counts(x1, y1, x2, y2, max_len: float) -> np.ndarray:
    """Per-segment vertex-insertion counts for Densify
    (line_measures/densify.rs: split each segment so no piece exceeds
    max_len -> ceil(len/max_len) - 1 inserted points)."""
    seg = np.hypot(np.subtract(x2, x1), np.subtract(y2, y1))
    return np.maximum(np.ceil(seg / max_len) - 1, 0).astype(np.int64)


def densify(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Densified linestring (euclidean metric)."""
    pieces = [coords[:1]]
    x1, y1 = coords[:-1, 0], coords[:-1, 1]
    x2, y2 = coords[1:, 0], coords[1:, 1]
    counts = densify_counts(x1, y1, x2, y2, max_len)
    for i in range(len(counts)):
        k = int(counts[i])
        if k > 0:
            t = np.arange(1, k + 1) / (k + 1)
            pieces.append(np.column_stack([x1[i] + t * (x2[i] - x1[i]), y1[i] + t * (y2[i] - y1[i])]))
        pieces.append(coords[i + 1 : i + 2])
    return np.vstack(pieces)


# ---------------------------------------------------------------------------
# SimplifyVwPreserve (simplify_vw.rs:225-450 vwp_wrapper /
# visvalingam_preserve: VW with self-intersection prevention; a shared
# segment pool stands in for the reference's R* tree so shell/hole
# interactions are detected)
# ---------------------------------------------------------------------------


def _seg_intersects_any(pool: dict, a, b) -> bool:
    """Does segment a-b intersect any pool segment not sharing one of
    its endpoints?  (tree_intersect, simplify_vw.rs:414-451)."""
    from .pip import orient2d_sign

    ax, ay, bx, by = a[0], a[1], b[0], b[1]
    lo_x, hi_x = min(ax, bx), max(ax, bx)
    lo_y, hi_y = min(ay, by), max(ay, by)

    def s(p, q, r):
        return orient2d_sign(
            np.asarray([p[0]]), np.asarray([p[1]]),
            np.asarray([q[0]]), np.asarray([q[1]]),
            np.asarray([r[0]]), np.asarray([r[1]]),
        )[0]

    for (c, d) in pool.values():
        if (min(c[0], d[0]) > hi_x or max(c[0], d[0]) < lo_x
                or min(c[1], d[1]) > hi_y or max(c[1], d[1]) < lo_y):
            continue
        if tuple(c) in (tuple(a), tuple(b)) or tuple(d) in (tuple(a), tuple(b)):
            continue
        d1, d2 = s(c, d, a), s(c, d, b)
        d3, d4 = s(a, b, c), s(a, b, d)
        if d1 != d2 and d3 != d4:
            return True
        # collinear / endpoint-on-segment touches
        for p, q, r, dd in ((c, d, a, d1), (c, d, b, d2), (a, b, c, d3), (a, b, d, d4)):
            if dd == 0 and (
                min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
            ):
                return True
    return False


def _tri_area2(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2.0


def _vwp_ring(coords: np.ndarray, epsilon: float, pool: dict,
              initial_min: int, min_points: int) -> list[int]:
    """visvalingam_preserve over one linestring/ring; the pool is shared
    across rings (simplify_vw.rs:263-410)."""
    import heapq

    n = len(coords)
    if n < 3 or epsilon <= 0:
        return list(range(n))
    adjacent = [(i - 1, i + 1) for i in range(n)]
    adjacent[0] = (-1, 1)
    pq: list = []
    seq = 0
    for i in range(1, n - 1):
        heapq.heappush(pq, (_tri_area2(coords[i - 1], coords[i], coords[i + 1]),
                            seq, i, i - 1, i + 1, False))
        seq += 1
    counter = n
    while pq:
        area, _, cur, left, right, _ = heapq.heappop(pq)
        if area > epsilon:
            break
        if counter <= initial_min:
            break
        al, ar = adjacent[cur]
        if al != left or ar != right:
            continue  # stale entry
        intersector = _seg_intersects_any(pool, coords[left], coords[right])
        if intersector and counter <= min_points:
            break
        ll = adjacent[left][0]
        rr = adjacent[right][1]
        adjacent[left] = (ll, right)
        adjacent[right] = (left, rr)
        adjacent[cur] = (0, 0)
        counter -= 1
        # pool maintenance: drop the two stale segments, add the new one
        pool.pop((tuple(coords[left]), tuple(coords[cur])), None)
        pool.pop((tuple(coords[cur]), tuple(coords[right])), None)
        pool[(tuple(coords[left]), tuple(coords[right]))] = (coords[left], coords[right])
        # recompute adjacent triangles (simplify_vw.rs:178-215): when the
        # removal was an intersector, the PRECEDING point is demoted to
        # -epsilon so it is removed next
        for ai, cp, bi in ((ll, left, right), (left, right, rr)):
            if ai < 0 or bi >= n:
                continue
            a2 = _tri_area2(coords[ai], coords[cp], coords[bi])
            if intersector and cp < cur:
                a2 = -epsilon
            heapq.heappush(pq, (a2, seq, cp, ai, bi, False))
            seq += 1
    return [i for i in range(n) if adjacent[i] != (0, 0)]


def simplify_vw_preserve_indices(lines: list[np.ndarray], epsilon: float,
                                 initial_min: int = 2, min_points: int = 4) -> list[list[int]]:
    """vwp_wrapper_indices: every input line contributes to one shared
    segment pool; LineStrings use (2, 4), Polygon rings (4, 5)
    (simplify_vw.rs:664,706)."""
    pool: dict = {}
    for ln in lines:
        for i in range(len(ln) - 1):
            pool[(tuple(ln[i]), tuple(ln[i + 1]))] = (ln[i], ln[i + 1])
    return [_vwp_ring(ln, epsilon, pool, initial_min, min_points) for ln in lines]


def simplify_vw_preserve_polygon(rings: list[np.ndarray], epsilon: float) -> list[np.ndarray]:
    idx = simplify_vw_preserve_indices(rings, epsilon, initial_min=4, min_points=5)
    return [r[ix] for r, ix in zip(rings, idx)]
