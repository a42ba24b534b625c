"""Rect clipping + ear-clipping triangulation (constructive ops).

* Sutherland-Hodgman polygon-vs-rect clip — the tile-clipping kernel of
  the raster<->vector stage (RectOps algebra, rect_ops.rs:5-45, and the
  ClipRule line-clip role of bool_ops/mod.rs:44-110 for the axis-
  aligned case the tiling pipeline needs).  Exact for convex clip
  windows; emits rings CLOSED.
* Ear-clipping triangulation (TriangulateEarcut semantics,
  triangulate_earcut.rs:7 — output triangles partition the polygon, so
  sum(|tri|) == unsigned polygon area, which is how tests pin it).
"""

from __future__ import annotations

import numpy as np

from . import pip


def clip_ring_to_rect(ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Sutherland-Hodgman: clip a closed ring to an axis-aligned rect.
    Returns a closed ring (possibly empty)."""
    pts = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(poly: np.ndarray, inside, intersect) -> np.ndarray:
        if len(poly) == 0:
            return poly
        out = []
        for i in range(len(poly)):
            cur, prv = poly[i], poly[i - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        return np.asarray(out) if out else np.empty((0, 2))

    def x_cut(bound):
        def f(a, b):
            t = (bound - a[0]) / (b[0] - a[0])
            return (bound, a[1] + t * (b[1] - a[1]))
        return f

    def y_cut(bound):
        def f(a, b):
            t = (bound - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), bound)
        return f

    pts = clip_edge(pts, lambda p: p[0] >= minx, x_cut(minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, x_cut(maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny, y_cut(miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, y_cut(maxy))
    if len(pts) < 3:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def rect_intersection(a: tuple, b: tuple) -> tuple | None:
    """Rect x Rect -> Rect or None when disjoint (rect_ops.rs:5-45)."""
    minx, miny = max(a[0], b[0]), max(a[1], b[1])
    maxx, maxy = min(a[2], b[2]), min(a[3], b[3])
    if minx > maxx or miny > maxy:
        return None
    return (minx, miny, maxx, maxy)


def rect_union(a: tuple, b: tuple) -> tuple:
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def triangulate_earcut(ring: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear-clipping triangulation of a simple (hole-free) closed ring.

    O(n^2) scan per the classic algorithm; output indices into the OPEN
    ring (without the closing duplicate).  Matches TriangulateEarcut's
    contract: n-2 triangles that exactly partition the polygon."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n < 3:
        return []
    # work on a CCW copy
    area2 = 0.0
    for i in range(n):
        j = (i + 1) % n
        area2 += pts[i, 0] * pts[j, 1] - pts[j, 0] * pts[i, 1]
    idx = list(range(n)) if area2 >= 0 else list(range(n))[::-1]

    def sign(a, b, c):
        return pip.orient2d_sign(
            np.asarray([pts[a, 0]]), np.asarray([pts[a, 1]]),
            np.asarray([pts[b, 0]]), np.asarray([pts[b, 1]]),
            np.asarray([pts[c, 0]]), np.asarray([pts[c, 1]]),
        )[0]

    def point_in_tri(p, a, b, c):
        s1 = sign(a, b, p)
        s2 = sign(b, c, p)
        s3 = sign(c, a, p)
        return s1 >= 0 and s2 >= 0 and s3 >= 0

    def same_pt(m, corner):
        return pts[m, 0] == pts[corner, 0] and pts[m, 1] == pts[corner, 1]

    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        ear_found = False
        for k in range(len(idx)):
            a, b, c = idx[k - 1], idx[k], idx[(k + 1) % len(idx)]
            if sign(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            if any(
                point_in_tri(m, a, b, c)
                for m in idx
                if m not in (a, b, c)
                and not (same_pt(m, a) or same_pt(m, b) or same_pt(m, c))
            ):
                continue
            tris.append((a, b, c))
            idx.pop(k)
            ear_found = True
            break
        if not ear_found:
            # drop a degenerate (collinear) corner if one exists — it
            # contributes no area and can block every ear
            for k in range(len(idx)):
                a, b, c = idx[k - 1], idx[k], idx[(k + 1) % len(idx)]
                if sign(a, b, c) == 0:
                    idx.pop(k)
                    ear_found = True
                    break
            if not ear_found:
                break  # non-simple input; return the partial fan
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris
