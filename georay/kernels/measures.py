"""Vectorized distance / bearing / destination kernels (4 metric spaces).

Formulas mirror the reference operation-for-operation so results agree
with the scalar oracle to the last ulp-or-two:

* Haversine: geo/src/algorithm/line_measures/metric_spaces/haversine.rs
  (R = 6,371,008.8 — GRS80 mean radius, haversine.rs:126-128; the
  ``a.min(1)`` antipodal clamp, :266-278; bearing :157-186; destination
  with longitude normalization :196-236, utils.rs:112).
* Euclidean: euclidean/distance.rs:31-35 (hypot).
* Rhumb: rhumb/{bearing,destination,distance}.rs (loxodrome on the
  sphere, same mean radius).
"""

from __future__ import annotations

import numpy as np

MEAN_EARTH_RADIUS = 6_371_008.8


def haversine_distance(lon1, lat1, lon2, lat2) -> np.ndarray:
    theta1 = np.radians(lat1)
    theta2 = np.radians(lat2)
    delta_theta = np.radians(np.subtract(lat2, lat1))
    delta_lambda = np.radians(np.subtract(lon2, lon1))
    a = np.sin(delta_theta / 2.0) ** 2 + np.cos(theta1) * np.cos(theta2) * np.sin(
        delta_lambda / 2.0
    ) ** 2
    c = 2.0 * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
    return MEAN_EARTH_RADIUS * c


def haversine_bearing(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Degrees in [0, 360), North=0 East=90 (haversine.rs:157-186)."""
    la, ta = np.radians(lon1), np.radians(lat1)
    lb, tb = np.radians(lon2), np.radians(lat2)
    dl = lb - la
    s = np.cos(tb) * np.sin(dl)
    c = np.cos(ta) * np.sin(tb) - np.sin(ta) * np.cos(tb) * np.cos(dl)
    return (np.degrees(np.arctan2(s, c)) + 360.0) % 360.0


def haversine_destination(lon, lat, bearing_deg, meters) -> tuple[np.ndarray, np.ndarray]:
    """(haversine.rs:196-236); longitude normalized to [-180, 180]."""
    lam1 = np.radians(lon)
    phi1 = np.radians(lat)
    theta = np.radians(bearing_deg)
    rad = np.asarray(meters, dtype=np.float64) / MEAN_EARTH_RADIUS
    phi2 = np.arcsin(np.sin(phi1) * np.cos(rad) + np.cos(phi1) * np.sin(rad) * np.cos(theta))
    lam2 = (
        np.arctan2(
            np.sin(theta) * np.sin(rad) * np.cos(phi1),
            np.cos(rad) - np.sin(phi1) * np.sin(phi2),
        )
        + lam1
    )
    lon2 = np.degrees(lam2)
    lon2 = (lon2 + 180.0) % 360.0 - 180.0
    return lon2, np.degrees(phi2)


def euclidean_distance(x1, y1, x2, y2) -> np.ndarray:
    return np.hypot(np.subtract(x2, x1), np.subtract(y2, y1))


def rhumb_bearing(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Loxodrome bearing in [0, 360) (rhumb/bearing.rs)."""
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    dlam = np.radians(np.subtract(lon2, lon1))
    # wrap to shortest direction
    dlam = np.where(np.abs(dlam) > np.pi, dlam - np.sign(dlam) * 2 * np.pi, dlam)
    dpsi = np.log(np.tan(np.pi / 4 + phi2 / 2) / np.tan(np.pi / 4 + phi1 / 2))
    return (np.degrees(np.arctan2(dlam, dpsi)) + 360.0) % 360.0


def rhumb_distance(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Loxodrome length on the mean-radius sphere (rhumb/distance.rs)."""
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    dphi = phi2 - phi1
    dlam = np.abs(np.radians(np.subtract(lon2, lon1)))
    dlam = np.where(dlam > np.pi, 2 * np.pi - dlam, dlam)
    dpsi = np.log(np.tan(np.pi / 4 + phi2 / 2) / np.tan(np.pi / 4 + phi1 / 2))
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(np.abs(dpsi) > 1e-12, dphi / dpsi, np.cos(phi1))
    return np.sqrt(dphi * dphi + q * q * dlam * dlam) * MEAN_EARTH_RADIUS


def length_ragged(x: np.ndarray, y: np.ndarray, offsets: np.ndarray, metric: str = "euclidean") -> np.ndarray:
    """Per-linestring length over ragged coords (line_measures/length.rs).

    offsets: int64[L+1]; linestring l = coords[offsets[l]:offsets[l+1]].
    """
    if len(x) == 0:
        return np.zeros(len(offsets) - 1)
    if metric == "euclidean":
        seg = np.hypot(np.diff(x), np.diff(y))
    elif metric == "haversine":
        seg = haversine_distance(x[:-1], y[:-1], x[1:], y[1:])
    else:
        raise ValueError(metric)
    # zero out the phantom segment that spans linestring boundaries
    boundary = offsets[1:-1] - 1
    seg_sum = np.concatenate([[0.0], np.cumsum(seg)])
    totals = seg_sum[offsets[1:] - 1] - seg_sum[offsets[:-1]]
    del boundary
    return totals


# ---------------------------------------------------------------------------
# cross-track + Vincenty + segmentize
# ---------------------------------------------------------------------------

EQUATORIAL_EARTH_RADIUS = 6_378_137.0       # geo/src/lib.rs:336
POLAR_EARTH_RADIUS = 6_356_752.314_245      # geo/src/lib.rs:339
EARTH_FLATTENING = (EQUATORIAL_EARTH_RADIUS - POLAR_EARTH_RADIUS) / EQUATORIAL_EARTH_RADIUS


def cross_track_distance(plon, plat, alon, alat, blon, blat) -> np.ndarray:
    """Point-to-great-circle-arc distance (cross_track_distance.rs:44-51):
    |asin(sin(d13/R) * sin(theta13 - theta12))| * R."""
    d13 = haversine_distance(alon, alat, plon, plat) / MEAN_EARTH_RADIUS
    t13 = np.radians(haversine_bearing(alon, alat, plon, plat))
    t12 = np.radians(haversine_bearing(alon, alat, blon, blat))
    return MEAN_EARTH_RADIUS * np.abs(np.arcsin(np.sin(d13) * np.sin(t12 - t13)))


class VincentyError(ValueError):
    """Antipodal non-convergence (vincenty_distance.rs Err variant)."""


def vincenty_distance(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Vincenty inverse on the WGS84-like ellipsoid of geo/src/lib.rs
    (vincenty_distance.rs: 100-iteration limit, raises on divergence)."""
    import math

    a, b, f = EQUATORIAL_EARTH_RADIUS, POLAR_EARTH_RADIUS, EARTH_FLATTENING
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    U2 = math.atan((1 - f) * math.tan(math.radians(lat2)))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(100):
        sinL, cosL = math.sin(lam), math.cos(lam)
        sinSigma = math.sqrt(
            (cosU2 * sinL) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosL) ** 2
        )
        if sinSigma == 0.0:
            return 0.0  # coincident points
        cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
        sigma = math.atan2(sinSigma, cosSigma)
        sinAlpha = cosU1 * cosU2 * sinL / sinSigma
        cosSqAlpha = 1.0 - sinAlpha * sinAlpha
        cos2SigmaM = (
            cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha if cosSqAlpha != 0.0 else 0.0
        )
        C = f / 16.0 * cosSqAlpha * (4.0 + f * (4.0 - 3.0 * cosSqAlpha))
        lamP = lam
        lam = L + (1.0 - C) * f * sinAlpha * (
            sigma
            + C * sinSigma * (cos2SigmaM + C * cosSigma * (-1.0 + 2.0 * cos2SigmaM**2))
        )
        if abs(lam - lamP) <= 1e-12:
            break
    else:
        raise VincentyError("vincenty failed to converge (near-antipodal points)")
    uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    A = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    B = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    deltaSigma = (
        B
        * sinSigma
        * (
            cos2SigmaM
            + B
            / 4.0
            * (
                cosSigma * (-1.0 + 2.0 * cos2SigmaM**2)
                - B
                / 6.0
                * cos2SigmaM
                * (-3.0 + 4.0 * sinSigma**2)
                * (-3.0 + 4.0 * cos2SigmaM**2)
            )
        )
    )
    return b * A * (sigma - deltaSigma)


def segmentize(coords: np.ndarray, n: int) -> np.ndarray:
    """Split a linestring into n equal-length pieces
    (linestring_segment.rs:223): returns the n+1 breakpoint coords
    (original vertices between breakpoints are dropped; each piece's
    endpoints lie exactly at i/n length fractions)."""
    from .more import line_interpolate_point

    out = [line_interpolate_point(coords, i / n) for i in range(n + 1)]
    return np.asarray(out)
