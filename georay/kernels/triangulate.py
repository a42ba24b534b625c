"""Delaunay triangulation + Voronoi diagram (triangulate_delaunay.rs,
voronoi.rs roles — the reference delegates to `spade`; we carry our own
implementations).

* Delaunay: Bowyer-Watson incremental insertion with a super-triangle,
  deterministic lexicographic insertion order, float in-circle test
  with an exact rational fallback inside an error band (same adaptive
  strategy as the orient2d kernel).  O(n^2) worst case — per-partition
  scale, which is how the engine uses it (one partition's points per
  map_groups call).
* Voronoi: per-site half-plane clipping of the clip envelope
  (voronoi.rs:187-216 exposes a clip envelope the same way): cell(p) =
  envelope ∩ {x : |x - p| <= |x - q|} over all other sites q.  O(n) per
  site; exact tiling of the envelope is the property test.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

_INCIRCLE_ERRBOUND = (10.0 + 96.0 * 2.0**-53) * 2.0**-53


def _incircle(ax, ay, bx, by, cx, cy, dx, dy) -> float:
    """> 0 iff d lies inside the circumcircle of CCW triangle (a, b, c)."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (
        ad * (bdx * cdy - bdy * cdx)
        - bd * (adx * cdy - ady * cdx)
        + cd * (adx * bdy - ady * bdx)
    )
    permanent = (
        abs(ad) * (abs(bdx * cdy) + abs(bdy * cdx))
        + abs(bd) * (abs(adx * cdy) + abs(ady * cdx))
        + abs(cd) * (abs(adx * bdy) + abs(ady * bdx))
    )
    if abs(det) > _INCIRCLE_ERRBOUND * permanent:
        return det
    # exact rational fallback
    fa = [Fraction(v) for v in (ax, ay, bx, by, cx, cy, dx, dy)]
    adx, ady = fa[0] - fa[6], fa[1] - fa[7]
    bdx, bdy = fa[2] - fa[6], fa[3] - fa[7]
    cdx, cdy = fa[4] - fa[6], fa[5] - fa[7]
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    d = (
        ad * (bdx * cdy - bdy * cdx)
        - bd * (adx * cdy - ady * cdx)
        + cd * (adx * bdy - ady * bdx)
    )
    return 0.0 if d == 0 else (1.0 if d > 0 else -1.0)


def _ccw(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay triangulation; returns index triples into
    `points` (super-triangle triangles dropped)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    # super-triangle far outside the data
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100.0
    sup = np.asarray([(cx - 20 * m, cy - m), (cx + 20 * m, cy - m), (cx, cy + 20 * m)])
    allp = np.vstack([pts, sup])
    S0, S1, S2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(S0, S1, S2)]
    for pi in order:
        px, py = allp[pi]
        bad, good = [], []
        for t in tris:
            a, b, c = t
            # ensure CCW for the in-circle orientation convention
            if _ccw(*allp[a], *allp[b], *allp[c]) < 0:
                a, b = b, a
            if _incircle(*allp[a], *allp[b], *allp[c], px, py) > 0:
                bad.append(t)
            else:
                good.append(t)
        # cavity boundary = edges appearing exactly once among bad tris
        edge_count: dict[tuple[int, int], int] = {}
        for a, b, c in bad:
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        tris = good
        for a, b in boundary:
            # orient new triangle CCW
            if _ccw(*allp[a], *allp[b], px, py) < 0:
                a, b = b, a
            tris.append((a, b, int(pi)))
    return [t for t in tris if max(t) < n]


def circumcenter(a, b, c) -> tuple[float, float]:
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (ax + bx + cx) / 3.0, (ay + by + cy) / 3.0
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    return ux, uy


def _clip_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Keep the region a*x + b*y <= c of a closed ring (convex clip)."""
    pts = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) == 0:
        return np.empty((0, 2))
    out = []
    vals = a * pts[:, 0] + b * pts[:, 1] - c
    for i in range(len(pts)):
        cur, prv = pts[i], pts[i - 1]
        vc, vp = vals[i], vals[i - 1]
        if vc <= 0:
            if vp > 0:
                t = vp / (vp - vc)
                out.append(prv + t * (cur - prv))
            out.append(cur)
        elif vp <= 0:
            t = vp / (vp - vc)
            out.append(prv + t * (cur - prv))
    if len(out) < 3:
        return np.empty((0, 2))
    out = np.asarray(out)
    return np.vstack([out, out[:1]])


def voronoi_cells(
    points: np.ndarray, envelope: tuple[float, float, float, float]
) -> list[np.ndarray]:
    """Voronoi cell (closed ring, clipped to the envelope rect) per site.

    cell(p) = envelope ∩_q {x : 2(q-p)·x <= |q|^2 - |p|^2} — successive
    half-plane clips of the envelope ring (bisector of p, q)."""
    pts = np.asarray(points, dtype=np.float64)
    minx, miny, maxx, maxy = envelope
    env = np.asarray(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    )
    cells_out = []
    for i in range(len(pts)):
        ring = env
        px, py = pts[i]
        for j in range(len(pts)):
            if j == i or len(ring) == 0:
                continue
            qx, qy = pts[j]
            a, b = 2.0 * (qx - px), 2.0 * (qy - py)
            c = qx * qx + qy * qy - px * px - py * py
            ring = _clip_halfplane(ring, a, b, c)
        cells_out.append(ring)
    return cells_out
