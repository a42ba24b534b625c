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
