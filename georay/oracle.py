"""Scalar, loop-based reference implementations (the conformance authority).

Direct reimplementation of the reference's exact semantics, one simple
loop per algorithm, used by pytest to validate every vectorized kernel
and every distributed pipeline at small scale (SURVEY.md §7 step 2).
Exact rational arithmetic stands in for the `robust` crate's adaptive
predicates (geo/src/algorithm/kernels/robust.rs:18-43).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

OUTSIDE, BOUNDARY, INSIDE = 0, 1, 2

MEAN_EARTH_RADIUS = 6_371_008.8  # GRS80 mean, haversine.rs:126-128


def orient2d(x1, y1, x2, y2, px, py) -> int:
    """Exact orient2d sign: +1 CCW, -1 CW, 0 collinear."""
    d = (Fraction(x2) - Fraction(x1)) * (Fraction(py) - Fraction(y1)) - (
        Fraction(y2) - Fraction(y1)
    ) * (Fraction(px) - Fraction(x1))
    return 0 if d == 0 else (1 if d > 0 else -1)


def coord_pos_relative_to_ring(px: float, py: float, ring: np.ndarray) -> int:
    """coordinate_position.rs:399-455, verbatim rules."""
    n = len(ring)
    if n == 0:
        return OUTSIDE
    if n == 1:
        return BOUNDARY if (ring[0][0] == px and ring[0][1] == py) else OUTSIDE
    wn = 0
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if y1 <= py:
            if y2 >= py:
                o = orient2d(x1, y1, x2, y2, px, py)
                if o > 0 and y2 != py:
                    wn += 1
                elif o == 0 and min(x1, x2) <= px <= max(x1, x2):
                    return BOUNDARY
        elif y2 <= py:
            o = orient2d(x1, y1, x2, y2, px, py)
            if o < 0:
                wn -= 1
            elif o == 0 and min(x1, x2) <= px <= max(x1, x2):
                return BOUNDARY
    return INSIDE if wn != 0 else OUTSIDE


def polygon_position(px: float, py: float, rings: list[np.ndarray]) -> int:
    """coordinate_position.rs:281-319 (exterior + holes)."""
    if not rings:
        return OUTSIDE
    ext = coord_pos_relative_to_ring(px, py, rings[0])
    if ext == OUTSIDE:
        return OUTSIDE
    if ext == BOUNDARY:
        return BOUNDARY
    for hole in rings[1:]:
        pos = coord_pos_relative_to_ring(px, py, hole)
        if pos == BOUNDARY:
            return BOUNDARY
        if pos == INSIDE:
            return OUTSIDE
    return INSIDE


def polygon_contains_point(px, py, rings) -> bool:
    """contains/polygon.rs:13-22 — Inside only, boundary excluded."""
    return polygon_position(px, py, rings) == INSIDE


def polygon_intersects_point(px, py, rings) -> bool:
    """intersects/polygon.rs:9-16 — position != Outside."""
    return polygon_position(px, py, rings) != OUTSIDE


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------

def haversine_distance(lon1, lat1, lon2, lat2) -> float:
    """haversine.rs:266-278: R=6371008.8, sqrt-arg clamped via min(1)."""
    theta1 = math.radians(lat1)
    theta2 = math.radians(lat2)
    delta_theta = math.radians(lat2 - lat1)
    delta_lambda = math.radians(lon2 - lon1)
    a = (
        math.sin(delta_theta / 2.0) ** 2
        + math.cos(theta1) * math.cos(theta2) * math.sin(delta_lambda / 2.0) ** 2
    )
    a_clamped = min(a, 1.0)
    c = 2.0 * math.asin(math.sqrt(a_clamped))
    return MEAN_EARTH_RADIUS * c


def haversine_bearing(lon1, lat1, lon2, lat2) -> float:
    """haversine.rs:157-186: degrees, North=0, East=90, in [0, 360)."""
    theta1, theta2 = math.radians(lat1), math.radians(lat2)
    dlam = math.radians(lon2 - lon1)
    y = math.sin(dlam) * math.cos(theta2)
    x = math.cos(theta1) * math.sin(theta2) - math.sin(theta1) * math.cos(theta2) * math.cos(dlam)
    return math.degrees(math.atan2(y, x)) % 360.0


def haversine_destination(lon, lat, bearing_deg, meters) -> tuple[float, float]:
    """haversine.rs:196-236 with longitude normalization (utils.rs:112)."""
    delta = meters / MEAN_EARTH_RADIUS
    theta = math.radians(bearing_deg)
    phi1 = math.radians(lat)
    lam1 = math.radians(lon)
    phi2 = math.asin(
        math.sin(phi1) * math.cos(delta) + math.cos(phi1) * math.sin(delta) * math.cos(theta)
    )
    lam2 = lam1 + math.atan2(
        math.sin(theta) * math.sin(delta) * math.cos(phi1),
        math.cos(delta) - math.sin(phi1) * math.sin(phi2),
    )
    lon2 = math.degrees(lam2)
    lon2 = (lon2 + 180.0) % 360.0 - 180.0
    return lon2, math.degrees(phi2)


def euclidean_distance(x1, y1, x2, y2) -> float:
    """euclidean/distance.rs:31-35 (hypot of deltas)."""
    return math.hypot(x2 - x1, y2 - y1)


# ---------------------------------------------------------------------------
# summaries
# ---------------------------------------------------------------------------

def twice_signed_ring_area(ring: np.ndarray) -> float:
    """area.rs:33-52: shoelace with first-coord shift for stability."""
    n = len(ring)
    if n < 2:
        return 0.0
    sx, sy = float(ring[0][0]), float(ring[0][1])
    tmp = 0.0
    for i in range(n - 1):
        ax, ay = float(ring[i][0]) - sx, float(ring[i][1]) - sy
        bx, by = float(ring[i + 1][0]) - sx, float(ring[i + 1][1]) - sy
        tmp += ax * by - ay * bx
    return tmp


def signed_area(rings: list[np.ndarray]) -> float:
    """area.rs trait 80-88: exterior + holes (holes signed opposite)."""
    if not rings:
        return 0.0
    total = twice_signed_ring_area(rings[0])
    for hole in rings[1:]:
        total += twice_signed_ring_area(hole)
    return total / 2.0


def unsigned_area(rings: list[np.ndarray]) -> float:
    ext = abs(twice_signed_ring_area(rings[0])) if rings else 0.0
    holes = sum(abs(twice_signed_ring_area(h)) for h in rings[1:])
    return (ext - holes) / 2.0


def ring_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    """(cx, cy, twice_area) of one closed ring — centroid.rs:604-633
    ring formula with the first-coord shift; caller divides by 3*area."""
    sx, sy = float(ring[0][0]), float(ring[0][1])
    a2 = twice_signed_ring_area(ring)
    if a2 == 0.0:
        return 0.0, 0.0, 0.0
    cx = cy = 0.0
    for i in range(len(ring) - 1):
        ax, ay = float(ring[i][0]) - sx, float(ring[i][1]) - sy
        bx, by = float(ring[i + 1][0]) - sx, float(ring[i + 1][1]) - sy
        cross = ax * by - ay * bx
        cx += (ax + bx) * cross
        cy += (ay + by) * cross
    return sx + cx / (3.0 * a2), sy + cy / (3.0 * a2), a2


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """centroid.rs:442-695 area-weighted combination, holes subtracted.
    (Degenerate zero-area polygons are out of the synthetic data's path;
    the dimension-promotion fallback lives in the reference only.)"""
    cx_e, cy_e, a2_e = ring_centroid(rings[0])
    num_x, num_y, den = cx_e * a2_e, cy_e * a2_e, a2_e
    for hole in rings[1:]:
        cx_h, cy_h, a2_h = ring_centroid(hole)
        # hole weight carries the opposite sign of its ring orientation
        # relative to the exterior: subtract |hole| area contribution
        w = -abs(a2_h) * (1.0 if a2_e >= 0 else -1.0)
        num_x += cx_h * w
        num_y += cy_h * w
        den += w
    return num_x / den, num_y / den


# ---------------------------------------------------------------------------
# convex hull (QuickHull per convex_hull/qhull.rs, canonicalized)
# ---------------------------------------------------------------------------

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull as a CLOSED CCW ring starting at the lexicographically
    smallest vertex (canonical form shared with the vectorized kernel;
    the reference outputs CCW closed too, convex_hull/mod.rs:42-54)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) == 1:
        return np.vstack([pts, pts])
    if len(pts) == 2:
        # closed ring [p0, p1, p0] (not [p0, p1, p1])
        return np.vstack([pts, pts[:1]])
    # Andrew's monotone chain with exact orientation
    def half(iterable):
        chain: list[np.ndarray] = []
        for p in iterable:
            while len(chain) >= 2 and orient2d(
                chain[-2][0], chain[-2][1], chain[-1][0], chain[-1][1], p[0], p[1]
            ) <= 0:
                chain.pop()
            chain.append(p)
        return chain
    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    # canonical start: lexicographic min is pts[0] == lower[0]; already CCW
    return np.vstack([hull, hull[:1]])


# ---------------------------------------------------------------------------
# simplification (Ramer-Douglas-Peucker, simplify.rs:21-135)
# ---------------------------------------------------------------------------

def _perp_dist(px, py, ax, ay, bx, by) -> float:
    if ax == bx and ay == by:
        return math.hypot(px - ax, py - ay)
    num = abs((bx - ax) * (ay - py) - (ax - px) * (by - ay))
    return num / math.hypot(bx - ax, by - ay)


def rdp(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """simplify.rs:28-31: epsilon <= 0 is identity; recursive split at the
    max-perpendicular-distance vertex (simplify.rs:73-135)."""
    coords = np.asarray(coords, dtype=np.float64)
    if epsilon <= 0.0 or len(coords) < 3:
        return coords.copy()
    ax, ay = coords[0]
    bx, by = coords[-1]
    dmax, imax = -1.0, 0
    for i in range(1, len(coords) - 1):
        d = _perp_dist(coords[i][0], coords[i][1], ax, ay, bx, by)
        if d > dmax:
            dmax, imax = d, i
    if dmax > epsilon:
        left = rdp(coords[: imax + 1], epsilon)
        right = rdp(coords[imax:], epsilon)
        return np.vstack([left[:-1], right])
    return np.vstack([coords[0], coords[-1]])


# ---------------------------------------------------------------------------
# centroid dimension ladder (centroid.rs:442-695) for non-polygon inputs
# ---------------------------------------------------------------------------

def multipoint_centroid(coords: np.ndarray) -> tuple[float, float]:
    """Mean of coords INCLUDING duplicates (centroid.rs point weighting)."""
    c = np.asarray(coords, dtype=np.float64)
    return float(c[:, 0].mean()), float(c[:, 1].mean())


def linestring_centroid(lines: list[np.ndarray]) -> tuple[float, float]:
    """Length-weighted centroid of one or more linestrings; zero-length
    geometry promotes to point weighting (centroid.rs:497-527)."""
    wx = wy = wtot = 0.0
    for line in lines:
        line = np.asarray(line, dtype=np.float64)
        seg = np.hypot(np.diff(line[:, 0]), np.diff(line[:, 1]))
        mid_x = (line[:-1, 0] + line[1:, 0]) / 2.0
        mid_y = (line[:-1, 1] + line[1:, 1]) / 2.0
        wx += float((mid_x * seg).sum())
        wy += float((mid_y * seg).sum())
        wtot += float(seg.sum())
    if wtot > 0.0:
        return wx / wtot, wy / wtot
    # dimension promotion: all lines degenerate -> mean of line endpoints
    pts = np.vstack([np.asarray(l)[:1] for l in lines])
    return multipoint_centroid(pts)


def polygon_centroid_promoted(rings: list[np.ndarray]) -> tuple[float, float]:
    """Centroid with the reference's dimension-promotion ladder
    (centroid.rs:497-527): zero-area polygon -> length-weighted ring
    centroid; zero-length too -> mean of coords."""
    total_a2 = sum(abs(twice_signed_ring_area(r)) for r in rings)
    if total_a2 != 0.0:
        return polygon_centroid(rings)
    total_len = 0.0
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        total_len += float(np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1])).sum())
    if total_len > 0.0:
        return linestring_centroid(rings)
    return multipoint_centroid(np.vstack([np.asarray(r)[:-1] for r in rings]))
