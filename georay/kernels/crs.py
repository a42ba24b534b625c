"""Closed-form coordinate reference system transforms.

Stand-in for the reference's PROJ-backed ``Transform`` trait
(geo/src/algorithm/proj.rs — env-gated here: no pyproj wheel in the
sandbox).  The two projection families that cover most real pipelines
are public closed-form math and implemented directly:

* **EPSG:4326 <-> EPSG:3857** (spherical Web Mercator): the standard
  ``x = R*lon``, ``y = R*ln(tan(pi/4 + lat/2))`` pair.
* **EPSG:4326 <-> UTM** (ellipsoidal transverse Mercator): Snyder's
  series from the USGS *Map Projections — A Working Manual* (public),
  forward eqs. 8-9..8-15 / inverse 8-17..8-25 on WGS84 — good to ~1 mm
  inside a zone, and every term is plain trig/arithmetic, so the DuckDB
  oracle can evaluate the identical expression.

All functions are vectorized over numpy arrays (degrees in, metres
out) — drop-in for ``map_batches`` stages.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
MERC_R = 6378137.0  # EPSG:3857 sphere radius == WGS84 semi-major

_E2 = WGS84_F * (2.0 - WGS84_F)
_EP2 = _E2 / (1.0 - _E2)
UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING_S = 10000000.0


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857)
# ---------------------------------------------------------------------------


def lonlat_to_webmercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857.  Latitude must be within the Mercator
    cut (|lat| < 90); the standard Web-Mercator validity bound is
    +-85.051129 deg but the formula itself is defined right up to the
    poles."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = MERC_R * np.radians(lon)
    y = MERC_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / MERC_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / MERC_R)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# UTM (ellipsoidal transverse Mercator, Snyder series)
# ---------------------------------------------------------------------------


def utm_zone(lon, lat=None) -> np.ndarray:
    """Standard longitudinal zone number 1..60 (the Norway/Svalbard
    exceptions are deliberately NOT applied — same as most software
    defaults when told just a longitude)."""
    lon = np.asarray(lon, dtype=np.float64)
    z = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    return z


def utm_central_meridian(zone) -> np.ndarray:
    return np.asarray(zone, dtype=np.float64) * 6.0 - 183.0


def lonlat_to_utm(
    lon, lat, zone=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EPSG:4326 -> (easting, northing, zone).  Snyder 8-9..8-15.
    Southern-hemisphere rows get the 10,000 km false northing."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if zone is None:
        zone = utm_zone(lon)
    else:
        zone = np.broadcast_to(np.asarray(zone, dtype=np.int64), lon.shape)
    lam0 = np.radians(utm_central_meridian(zone))
    phi = np.radians(lat)
    lam = np.radians(lon)

    e2, ep2, a = _E2, _EP2, WGS84_A
    sphi, cphi = np.sin(phi), np.cos(phi)
    n_rad = a / np.sqrt(1.0 - e2 * sphi * sphi)
    t = (sphi / cphi) ** 2
    c = ep2 * cphi * cphi
    aa = (lam - lam0) * cphi
    m = a * (
        (1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0) * np.sin(2.0 * phi)
        + (15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0) * np.sin(4.0 * phi)
        - (35.0 * e2**3 / 3072.0) * np.sin(6.0 * phi)
    )
    easting = (
        UTM_K0
        * n_rad
        * (
            aa
            + (1.0 - t + c) * aa**3 / 6.0
            + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * aa**5 / 120.0
        )
        + UTM_FALSE_EASTING
    )
    northing = UTM_K0 * (
        m
        + n_rad
        * (sphi / cphi)
        * (
            aa * aa / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c * c) * aa**4 / 24.0
            + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2) * aa**6 / 720.0
        )
    )
    northing = np.where(lat < 0.0, northing + UTM_FALSE_NORTHING_S, northing)
    return easting, northing, zone


def utm_to_lonlat(easting, northing, zone, south=False) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing, zone) -> EPSG:4326.  Snyder 8-17..8-25."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    south = np.broadcast_to(np.asarray(south, dtype=bool), easting.shape)
    y = np.where(south, northing - UTM_FALSE_NORTHING_S, northing)
    x = easting - UTM_FALSE_EASTING
    lam0 = np.radians(utm_central_meridian(zone))

    e2, ep2, a = _E2, _EP2, WGS84_A
    m = y / UTM_K0
    mu = m / (a * (1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0))
    e1 = (1.0 - np.sqrt(1.0 - e2)) / (1.0 + np.sqrt(1.0 - e2))
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1**3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1**4 / 512.0) * np.sin(8.0 * mu)
    )
    sphi1, cphi1 = np.sin(phi1), np.cos(phi1)
    c1 = ep2 * cphi1 * cphi1
    t1 = (sphi1 / cphi1) ** 2
    n1 = a / np.sqrt(1.0 - e2 * sphi1 * sphi1)
    r1 = a * (1.0 - e2) / (1.0 - e2 * sphi1 * sphi1) ** 1.5
    d = x / (n1 * UTM_K0)
    phi = phi1 - (n1 * sphi1 / cphi1 / r1) * (
        d * d / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * ep2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * ep2 - 3.0 * c1 * c1)
        * d**6
        / 720.0
    )
    lam = lam0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * ep2 + 24.0 * t1 * t1)
        * d**5
        / 120.0
    ) / cphi1
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Transform surface (proj.rs Transform-trait analogue)
# ---------------------------------------------------------------------------

_FORWARD = {
    ("EPSG:4326", "EPSG:3857"): lambda lon, lat: lonlat_to_webmercator(lon, lat),
    ("EPSG:3857", "EPSG:4326"): lambda x, y: webmercator_to_lonlat(x, y),
}


def transform_xy(x, y, src: str, dst: str) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point transform between the supported CRS pair
    (proj.rs ``Transform::transform`` analogue).  UTM needs the zone
    and is exposed via :func:`lonlat_to_utm` / :func:`utm_to_lonlat`
    instead.  Raises ``KeyError`` for unsupported pairs — the honest
    gate where PROJ would be needed."""
    key = (src.upper(), dst.upper())
    if key not in _FORWARD:
        raise KeyError(
            f"unsupported CRS pair {src}->{dst}: closed-form kernels cover "
            "EPSG:4326<->EPSG:3857 and UTM; anything else needs PROJ "
            "(env-gated, see proj.rs)"
        )
    return _FORWARD[key](x, y)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (2SP) and Albers Equal-Area — Snyder closed forms
# (r4b; Working Manual eqs. 15-1..15-11 and 14-1..14-12, WGS84).  The
# parameter set below is the standard North-America conic setup
# (EPSG:5070-style parallels); both forwards are plain trig/log/pow, so
# the DuckDB oracles evaluate identical expression trees.
# ---------------------------------------------------------------------------

_E = np.sqrt(_E2)

CONIC_LAT1 = 33.0   # first standard parallel (deg)
CONIC_LAT2 = 45.0   # second standard parallel
CONIC_LAT0 = 23.0   # latitude of origin
CONIC_LON0 = -96.0  # central meridian


def _snyder_m(phi: np.ndarray) -> np.ndarray:
    """m = cos(phi) / sqrt(1 - e^2 sin^2 phi)   (Snyder 14-15)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _snyder_t(phi: np.ndarray) -> np.ndarray:
    """t = tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2)
    (Snyder 15-9)."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - _E * s) / (1.0 + _E * s)
    ) ** (_E / 2.0)


def _snyder_q(phi: np.ndarray) -> np.ndarray:
    """q = (1-e^2)(sin/(1-e^2 sin^2) - ln((1-e sin)/(1+e sin))/(2e))
    (Snyder 3-12)."""
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - np.log((1.0 - _E * s) / (1.0 + _E * s)) / (2.0 * _E)
    )


def _lcc_params() -> tuple[float, float, float]:
    p1, p2, p0 = map(np.radians, (CONIC_LAT1, CONIC_LAT2, CONIC_LAT0))
    m1, m2 = _snyder_m(p1), _snyder_m(p2)
    t1, t2, t0 = _snyder_t(p1), _snyder_t(p2), _snyder_t(p0)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = m1 / (n * t1**n)
    rho0 = WGS84_A * F * t0**n
    return float(n), float(F), float(rho0)


def lonlat_to_lcc(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> Lambert Conformal Conic 2SP (Snyder 15-1/15-2)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n, F, rho0 = _lcc_params()
    t = _snyder_t(np.radians(lat))
    rho = WGS84_A * F * t**n
    th = n * np.radians(lon - CONIC_LON0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def lcc_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    """Inverse LCC (Snyder 15-10/7-9): fixed-point iteration on phi."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, F, rho0 = _lcc_params()
    rho = np.sign(n) * np.hypot(x, rho0 - y)
    th = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    t = (rho / (WGS84_A * F)) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_E / 2.0)
        )
    return np.degrees(th / n) + CONIC_LON0, np.degrees(phi)


def _albers_params() -> tuple[float, float, float]:
    p1, p2, p0 = map(np.radians, (CONIC_LAT1, CONIC_LAT2, CONIC_LAT0))
    m1, m2 = _snyder_m(p1), _snyder_m(p2)
    q1, q2, q0 = _snyder_q(p1), _snyder_q(p2), _snyder_q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = WGS84_A * np.sqrt(C - n * q0) / n
    return float(n), float(C), float(rho0)


def lonlat_to_albers(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> Albers Equal-Area 2SP (Snyder 14-1..14-4)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n, C, rho0 = _albers_params()
    q = _snyder_q(np.radians(lat))
    rho = WGS84_A * np.sqrt(C - n * q) / n
    th = n * np.radians(lon - CONIC_LON0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def albers_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    """Inverse Albers (Snyder 14-8/3-16): Newton iteration on phi."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, C, rho0 = _albers_params()
    rho = np.hypot(x, rho0 - y)
    th = np.arctan2(x, rho0 - y)
    q = (C - (rho * n / WGS84_A) ** 2) / n
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        es = _E * s
        phi = phi + (1.0 - _E2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - _E2)
            - s / (1.0 - _E2 * s * s)
            + np.log((1.0 - es) / (1.0 + es)) / (2.0 * _E)
        )
    return np.degrees(th / n) + CONIC_LON0, np.degrees(phi)


_FORWARD[("EPSG:4326", "LCC")] = lambda lon, lat: lonlat_to_lcc(lon, lat)
_FORWARD[("LCC", "EPSG:4326")] = lambda x, y: lcc_to_lonlat(x, y)
_FORWARD[("EPSG:4326", "ALBERS")] = lambda lon, lat: lonlat_to_albers(lon, lat)
_FORWARD[("ALBERS", "EPSG:4326")] = lambda x, y: albers_to_lonlat(x, y)
