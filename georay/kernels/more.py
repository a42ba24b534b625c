"""Breadth operators: extremes, convexity, closest point, linear
referencing, curve similarity, oriented bbox, spherical area, interior
point.  Each mirrors the cited reference algorithm.
"""

from __future__ import annotations

import numpy as np

from ..geom import PolygonLayer
from ..oracle import polygon_position, INSIDE
from . import pip
from .hull import convex_hull_points
from .measures import MEAN_EARTH_RADIUS


def extremes(coords: np.ndarray) -> dict:
    """Min/max x/y coords WITH indices (extremes.rs:27); first occurrence
    wins on ties (argmin/argmax semantics)."""
    x, y = coords[:, 0], coords[:, 1]
    return {
        "x_min_idx": int(np.argmin(x)), "x_min": float(x.min()),
        "x_max_idx": int(np.argmax(x)), "x_max": float(x.max()),
        "y_min_idx": int(np.argmin(y)), "y_min": float(y.min()),
        "y_max_idx": int(np.argmax(y)), "y_max": float(y.max()),
    }


def is_convex(ring: np.ndarray, strict: bool = False) -> bool:
    """Convexity of a CLOSED ring (is_convex.rs): all turns share one
    orientation; `strict` forbids collinear triples."""
    n = len(ring) - 1
    if n < 3:
        return not strict
    signs = []
    for i in range(n):
        a, b, c = ring[i], ring[(i + 1) % n], ring[(i + 2) % n]
        s = pip.orient2d_sign(
            np.asarray([a[0]]), np.asarray([a[1]]),
            np.asarray([b[0]]), np.asarray([b[1]]),
            np.asarray([c[0]]), np.asarray([c[1]]),
        )[0]
        if s == 0:
            if strict:
                return False
            continue
        signs.append(s)
    return len(set(signs)) <= 1


def closest_point_on_segments(
    px: float, py: float, x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> tuple[float, float, float]:
    """Nearest point on a set of segments to (px, py) (closest_point.rs):
    per segment, project onto the supporting line and clamp to [0, 1].
    Returns (x, y, distance)."""
    dx, dy = x2 - x1, y2 - y1
    den = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(den > 0.0, ((px - x1) * dx + (py - y1) * dy) / den, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    i = int(np.argmin(d2))
    return float(cx[i]), float(cy[i]), float(np.sqrt(d2[i]))


def line_locate_point(coords: np.ndarray, px: float, py: float) -> float:
    """Fraction along the linestring of the closest point
    (line_locate_point.rs:38, ST_LineLocatePoint); 0 for zero-length."""
    x1, y1 = coords[:-1, 0], coords[:-1, 1]
    x2, y2 = coords[1:, 0], coords[1:, 1]
    seg_len = np.hypot(x2 - x1, y2 - y1)
    total = seg_len.sum()
    if total == 0.0:
        return 0.0
    dx, dy = x2 - x1, y2 - y1
    den = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(den > 0.0, ((px - x1) * dx + (py - y1) * dy) / den, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    i = int(np.argmin(d2))
    prior = seg_len[:i].sum()
    return float((prior + t[i] * seg_len[i]) / total)


def line_interpolate_point(coords: np.ndarray, fraction: float) -> tuple[float, float]:
    """Point at `fraction` of total length (line_interpolate_point.rs);
    clamped to [0, 1] endpoints like the reference."""
    x1, y1 = coords[:-1, 0], coords[:-1, 1]
    seg_len = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    total = seg_len.sum()
    if total == 0.0 or fraction <= 0.0:
        return float(coords[0, 0]), float(coords[0, 1])
    if fraction >= 1.0:
        return float(coords[-1, 0]), float(coords[-1, 1])
    target = fraction * total
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    i = int(np.searchsorted(cum, target, side="right")) - 1
    i = min(i, len(seg_len) - 1)
    rem = target - cum[i]
    t = rem / seg_len[i] if seg_len[i] > 0 else 0.0
    return (
        float(coords[i, 0] + t * (coords[i + 1, 0] - coords[i, 0])),
        float(coords[i, 1] + t * (coords[i + 1, 1] - coords[i, 1])),
    )


def substring(coords: np.ndarray, start: float, end: float) -> np.ndarray:
    """Sub-linestring between two length fractions (line_measures/
    substring.rs, ST_LineSubstring); start/end clamped, start <= end."""
    start = min(max(start, 0.0), 1.0)
    end = min(max(end, 0.0), 1.0)
    if end < start:
        start = end
    sx, sy = line_interpolate_point(coords, start)
    ex, ey = line_interpolate_point(coords, end)
    seg_len = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    total = seg_len.sum()
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    out = [(sx, sy)]
    for i in range(1, len(coords) - 1):
        f = cum[i] / total if total > 0 else 0.0
        if start < f < end:
            out.append((coords[i, 0], coords[i, 1]))
    out.append((ex, ey))
    return np.asarray(out)


def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Frechet distance, DP over the coupling table
    (line_measures/frechet_distance.rs:54-120, two-row O(min) buffer)."""
    n1, n2 = len(a), len(b)
    if n1 == 0 or n2 == 0:
        return 0.0
    s, l = (a, b) if n1 <= n2 else (b, a)
    dist = np.hypot(s[:, None, 0] - l[None, :, 0], s[:, None, 1] - l[None, :, 1])
    prev = np.empty(len(s))
    prev[0] = dist[0, 0]
    for i in range(1, len(s)):
        prev[i] = max(prev[i - 1], dist[i, 0])
    for j in range(1, len(l)):
        cur = np.empty(len(s))
        cur[0] = max(prev[0], dist[0, j])
        for i in range(1, len(s)):
            cur[i] = max(min(prev[i], prev[i - 1], cur[i - 1]), dist[i, j])
        prev = cur
    return float(prev[-1])


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric max-min over the COORD SETS (hausdorff_distance.rs:28-55
    — pointwise, not segmentwise, matching the reference exactly)."""
    d = np.hypot(a[:, None, 0] - b[None, :, 0], a[:, None, 1] - b[None, :, 1])
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def minimum_rotated_rect(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Min-area oriented bbox via edge-aligned rotation over the hull
    (minimum_rotated_rect.rs:41-100).  Returns (closed 5-pt ring, area)."""
    hull = convex_hull_points(points)[:-1]
    if len(hull) == 1:
        p = hull[0]
        return np.asarray([p, p, p, p, p]), 0.0
    ref = hull[0].copy()
    h = hull - ref  # translate for precision, like the reference
    best = None
    for i in range(len(h)):
        dx, dy = h[(i + 1) % len(h)] - h[i]
        norm = float(np.hypot(dx, dy))
        if norm == 0.0:
            continue
        ux, uy = dx / norm, dy / norm
        xs = h[:, 0] * ux + h[:, 1] * uy
        ys = -h[:, 0] * uy + h[:, 1] * ux
        area = (xs.max() - xs.min()) * (ys.max() - ys.min())
        if best is None or area < best[0]:
            best = (float(area), ux, uy, xs.min(), xs.max(), ys.min(), ys.max())
    area, ux, uy, x0, x1, y0, y1 = best
    corners = np.asarray([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])
    world = np.column_stack(
        [corners[:, 0] * ux - corners[:, 1] * uy, corners[:, 0] * uy + corners[:, 1] * ux]
    ) + ref
    return world, area


def chamberlain_duquette_ring_area(ring: np.ndarray) -> float:
    """Signed spherical-excess approximation of ring area in m^2
    (chamberlain_duquette_area.rs, Chamberlain & Duquette 2007):
    sum (lam2-lam1) * (2 + sin(phi1) + sin(phi2)) * R^2 / 2."""
    if len(ring) < 4:
        return 0.0
    lam = np.radians(ring[:, 0])
    phi = np.radians(ring[:, 1])
    total = np.sum((lam[1:] - lam[:-1]) * (2.0 + np.sin(phi[:-1]) + np.sin(phi[1:])))
    return float(total * MEAN_EARTH_RADIUS * MEAN_EARTH_RADIUS / 2.0)


def interior_point(rings: list[np.ndarray]) -> tuple[float, float]:
    """Guaranteed-inside representative point (interior_point.rs:149-250):
    horizontal scanline at the bbox y-midpoint (perturbed off vertices),
    intersections sorted by x, midpoint of the widest inside chord."""
    ext = rings[0]
    ys = ext[:, 1]
    y_mid = (float(np.vstack(rings)[:, 1].min()) + float(np.vstack(rings)[:, 1].max())) / 2.0
    all_y = np.vstack(rings)[:, 1]
    if np.any(all_y == y_mid):
        others = all_y[all_y != y_mid]
        if len(others):
            closest = others[np.argmin(np.abs(others - y_mid))]
            y_mid = (y_mid + float(closest)) / 2.0
    xs: list[float] = []
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        cross = ((y1 <= y_mid) & (y2 > y_mid)) | ((y2 <= y_mid) & (y1 > y_mid))
        idx = np.nonzero(cross)[0]
        for i in idx:
            t = (y_mid - y1[i]) / (y2[i] - y1[i])
            xs.append(float(x1[i] + t * (x2[i] - x1[i])))
    if not xs:
        return float(ext[0, 0]), float(ext[0, 1])
    xs.sort()
    best = None
    for i in range(len(xs) - 1):
        mx = (xs[i] + xs[i + 1]) / 2.0
        if polygon_position(mx, y_mid, rings) == INSIDE:
            width = xs[i + 1] - xs[i]
            if best is None or width > best[0]:
                best = (width, mx)
    if best is None:
        return float(ext[0, 0]), float(ext[0, 1])
    return best[1], y_mid


# ---------------------------------------------------------------------------
# geometry-to-geometry euclidean distance (euclidean/distance.rs:100-445)
# ---------------------------------------------------------------------------

def _segments_of(kind: str, value) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x1, y1, x2, y2, vertices) of any parsed WKT geometry."""
    if kind == "point":
        v = np.asarray([value], dtype=np.float64)
        return np.empty(0), np.empty(0), np.empty(0), np.empty(0), v
    if kind == "linestring":
        c = np.asarray(value, dtype=np.float64)
        return c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1], c
    if kind == "polygon":
        rings = value
    elif kind == "multipolygon":
        rings = [r for poly in value for r in poly]
    else:
        raise ValueError(kind)
    xs1, ys1, xs2, ys2, vs = [], [], [], [], []
    for ring in rings:
        c = np.asarray(ring, dtype=np.float64)
        xs1.append(c[:-1, 0]); ys1.append(c[:-1, 1])
        xs2.append(c[1:, 0]); ys2.append(c[1:, 1])
        vs.append(c[:-1])
    return (
        np.concatenate(xs1), np.concatenate(ys1),
        np.concatenate(xs2), np.concatenate(ys2), np.vstack(vs),
    )


def _polys_of(kind: str, value) -> list[list[np.ndarray]]:
    if kind == "polygon":
        return [value]
    if kind == "multipolygon":
        return list(value)
    return []


def geometry_distance(a: tuple, b: tuple) -> float:
    """Euclidean distance between two parsed WKT geometries: 0 when they
    intersect (containment or edge crossing), else the min over
    vertex-to-segment distances both ways (euclidean/distance.rs:100-125
    polygon rule; :444 dual-iteration rule for disjoint linework)."""
    from . import pip as _pip
    from .validation import _segments_cross

    ka, va = a
    kb, vb = b
    ax1, ay1, ax2, ay2, averts = _segments_of(ka, va)
    bx1, by1, bx2, by2, bverts = _segments_of(kb, vb)

    # containment: any vertex of one inside the other's polygons
    for rings in _polys_of(ka, va):
        for x, y in bverts:
            from ..oracle import polygon_position, OUTSIDE
            if polygon_position(float(x), float(y), rings) != OUTSIDE:
                return 0.0
    for rings in _polys_of(kb, vb):
        for x, y in averts:
            from ..oracle import polygon_position, OUTSIDE
            if polygon_position(float(x), float(y), rings) != OUTSIDE:
                return 0.0
    # edge crossings
    for i in range(len(ax1)):
        for j in range(len(bx1)):
            if _segments_cross(
                (ax1[i], ay1[i]), (ax2[i], ay2[i]), (bx1[j], by1[j]), (bx2[j], by2[j])
            ):
                return 0.0
    best = np.inf
    if len(bx1):
        for x, y in averts:
            best = min(best, closest_point_on_segments(float(x), float(y), bx1, by1, bx2, by2)[2])
    if len(ax1):
        for x, y in bverts:
            best = min(best, closest_point_on_segments(float(x), float(y), ax1, ay1, ax2, ay2)[2])
    if not len(ax1) and not len(bx1):  # point vs point
        best = float(np.hypot(averts[0, 0] - bverts[0, 0], averts[0, 1] - bverts[0, 1]))
    return float(best)
