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
