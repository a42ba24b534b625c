"""Geodesic (ellipsoidal) distance — Karney's framework with exact
integrals.

Reference: geo/src/algorithm/line_measures/metric_spaces/geodesic.rs
(delegates to geographiclib-rs, Karney 2013).  No geographiclib wheel
exists in this sandbox, so this is a from-scratch implementation of the
same mathematical framework from the PUBLIC paper (Karney, "Algorithms
for geodesics", J. Geod 2013, arXiv:1109.4448):

* reduce to the auxiliary sphere (beta = atan((1-f) tan phi));
* for a trial azimuth alpha1, the spherical triangle gives alpha0,
  sigma1/2 and omega1/2; the ellipsoidal corrections are the integrals
    I1(sigma) = ∫ sqrt(1 + k^2 sin^2 s) ds            (distance)
    I3(sigma) = ∫ (2-f) / (1 + (1-f) sqrt(1+k^2 sin^2 s)) ds  (longitude)
  with k^2 = e'^2 cos^2(alpha0)  (paper eqs. 7-8 rearranged);
* the inverse problem solves lambda12(alpha1) = target with a
  safeguarded Newton iteration (lambda12 is monotonic in alpha1 in the
  canonical quadrant, so a bisection bracket guarantees convergence,
  including nearly-antipodal pairs where plain Vincenty diverges);
* the DIRECT problem solves  s12 = b * I1(sigma1, sigma2)  for sigma2
  with an (unconditionally convergent, monotone-integrand) Newton,
  then reads lat2/lon2/alpha2 off the auxiliary-sphere triangle.

Where Karney evaluates the integrals with 6th-order series in the
expansion parameter, this implementation evaluates them with fixed
32-node Gauss-Legendre quadrature — smooth integrands, so the
quadrature error is far below 1e-13 relative and the result matches
geographiclib's published doc values (geodesic.rs:32 Sofia-Plovdiv
132675.5018588206 m on WGS84; NAD83 and Mars variants) to ~1e-12
relative, which the tests pin.

Everything is vectorized over rows: the Newton solves run on the
active-row subset and the integrals evaluate as (n, 32) Gauss-Legendre
matrices, so map_batches stages call straight into NumPy.

Azimuth conventions follow the public geographiclib canonicalization
(Geodesic::GenInverse): solve with point 1 southernmost (|lat1| >=
|lat2|, lat1 <= 0) and 0 <= lambda12 <= pi, tracking swapp / latsign /
lonsign; afterwards un-transform with
    if swapp < 0: swap((salp1,calp1), (salp2,calp2))
    salp *= swapp * lonsign ;  calp *= swapp * latsign
so azi1/azi2 honour the documented [0, 360) compass contract in every
quadrant (forward azimuth at each endpoint, direction of travel).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(32)


def _gl_int(fn, lo: float, hi: float) -> float:
    """∫_lo^hi fn  via 32-node Gauss-Legendre (fn vectorized)."""
    mid, half = (lo + hi) / 2.0, (hi - lo) / 2.0
    return float(half * np.dot(_WEIGHTS, fn(mid + half * _NODES)))


def _f1d(x):
    return np.atleast_1d(np.asarray(x, dtype=np.float64))


class _Ellipsoid:
    def __init__(self, a: float, f: float):
        self.a = a
        self.f = f
        self.b = a * (1 - f)
        self.e2 = f * (2 - f)
        self.ep2 = self.e2 / (1 - self.e2)

    # -- row-vectorized integrals: k2, s_lo, s_hi are (n,) arrays ---------

    def _i1_rows(self, k2, s_lo, s_hi):
        mid = 0.5 * (s_lo + s_hi)
        half = 0.5 * (s_hi - s_lo)
        s = mid[:, None] + half[:, None] * _NODES[None, :]
        return half * (np.sqrt(1.0 + k2[:, None] * np.sin(s) ** 2) @ _WEIGHTS)

    def _i3_rows(self, k2, s_lo, s_hi):
        f = self.f
        mid = 0.5 * (s_lo + s_hi)
        half = 0.5 * (s_hi - s_lo)
        s = mid[:, None] + half[:, None] * _NODES[None, :]
        g = (2.0 - f) / (1.0 + (1.0 - f) * np.sqrt(1.0 + k2[:, None] * np.sin(s) ** 2))
        return half * (g @ _WEIGHTS)

    # -- auxiliary-sphere triangle for a trial azimuth (paper §3-4) -------

    def _triangle_rows(self, sb1, cb1, sb2, cb2, salp1, calp1, lam_only: bool):
        """Given reduced-latitude sines/cosines and a trial azimuth at
        point 1, return lambda12 (+ s12 / alpha2 / alpha0 / sigmas when
        lam_only is False) along that geodesic — all (n,) arrays."""
        sa0 = salp1 * cb1  # Clairaut
        ca0 = np.hypot(calp1, salp1 * sb1)
        k2 = self.ep2 * ca0 * ca0
        sigma1 = np.arctan2(sb1, calp1 * cb1)
        omega1 = np.arctan2(sa0 * sb1, calp1 * cb1)
        # alpha2 from Clairaut at beta2; ca2 >= 0 is the first crossing
        # of latitude beta2 (valid in the canonical frame |b1| >= |b2|)
        salp2 = np.clip(
            np.where(cb2 > 0, sa0 / np.where(cb2 > 0, cb2, 1.0), 1.0), -1.0, 1.0
        )
        calp2 = np.sqrt(np.maximum(0.0, 1.0 - salp2 * salp2))
        sigma2 = np.arctan2(sb2, calp2 * cb2)
        omega2 = np.arctan2(sa0 * sb2, calp2 * cb2)
        lam12 = (omega2 - omega1) - self.f * sa0 * self._i3_rows(k2, sigma1, sigma2)
        if lam_only:
            return lam12
        s12 = self.b * self._i1_rows(k2, sigma1, sigma2)
        return lam12, s12, salp2, calp2, sa0, ca0, k2, sigma1, sigma2

    # -- canonical inverse solve (general branch), vectorized --------------

    def _solve_rows(self, beta1, beta2, lam_t):
        """Safeguarded Newton on h(alpha1) = lambda12(alpha1) - lam_t,
        monotonically increasing on (0, pi) in the canonical frame.
        Returns the solved alpha1 array."""
        n = beta1.size
        sb1, cb1 = np.sin(beta1), np.cos(beta1)
        sb2, cb2 = np.sin(beta2), np.cos(beta2)
        lo = np.full(n, 1e-12)
        hi = np.full(n, np.pi - 1e-12)
        # spherical initial guess
        a1 = np.clip(
            np.arctan2(cb2 * np.sin(lam_t), cb1 * sb2 - sb1 * cb2 * np.cos(lam_t)),
            lo,
            hi,
        )
        act = np.arange(n)
        for _ in range(60):
            if act.size == 0:
                break
            sb1a, cb1a, sb2a, cb2a = sb1[act], cb1[act], sb2[act], cb2[act]
            aa = a1[act]
            lam = self._triangle_rows(sb1a, cb1a, sb2a, cb2a, np.sin(aa), np.cos(aa), True)
            h = lam - lam_t[act]
            lo[act] = np.where(h < 0, aa, lo[act])
            hi[act] = np.where(h >= 0, aa, hi[act])
            done = np.abs(h) < 1e-14
            # Newton step from a central finite difference
            da = 1e-7
            ap = np.minimum(aa + da, np.pi - 1e-13)
            am = np.maximum(aa - da, 1e-13)
            lam_p = self._triangle_rows(sb1a, cb1a, sb2a, cb2a, np.sin(ap), np.cos(ap), True)
            lam_m = self._triangle_rows(sb1a, cb1a, sb2a, cb2a, np.sin(am), np.cos(am), True)
            dl = (lam_p - lam_m) / (ap - am)
            step = np.where(dl != 0, h / np.where(dl != 0, dl, 1.0), 0.0)
            nxt = aa - step
            outside = ~((lo[act] < nxt) & (nxt < hi[act]))
            nxt = np.where(outside, 0.5 * (lo[act] + hi[act]), nxt)
            # a stalled Newton step (flat dlambda/dalpha — e.g. near
            # equal-latitude edges) must NOT exit with a loose root:
            # force a bisection midpoint instead and only stop once the
            # bracket itself collapses (r3 — a stall-exit left |h| up
            # to ~3e-13 and shifted area integrals by ~1e-6 relative)
            stall = np.abs(nxt - aa) < 1e-15
            nxt = np.where(stall, 0.5 * (lo[act] + hi[act]), nxt)
            narrow = (hi[act] - lo[act]) < 1e-15
            upd = ~done
            a1[act[upd]] = nxt[upd]
            act = act[~(done | narrow)]
        return a1

    # -- full inverse: distance + forward azimuths at both endpoints -------

    def inverse_rows(self, lon1, lat1, lon2, lat2):
        """Vectorized inverse problem.  Returns (s12 meters, azi1, azi2)
        as (n,) arrays; azimuths in [0, 360), forward at each endpoint."""
        lon1, lat1, lon2, lat2 = np.broadcast_arrays(
            _f1d(lon1), _f1d(lat1), _f1d(lon2), _f1d(lat2)
        )
        n = lon1.size
        # canonical transforms (geographiclib GenInverse conventions)
        lon12 = ((lon2 - lon1 + 180.0) % 360.0) - 180.0
        lonsign = np.where(lon12 < 0, -1.0, 1.0)
        lon12 = np.abs(lon12)
        swapp = np.where(np.abs(lat1) < np.abs(lat2), -1.0, 1.0)
        lonsign = lonsign * swapp  # swapping endpoints reverses direction
        lt1 = np.where(swapp < 0, lat2, lat1)
        lt2 = np.where(swapp < 0, lat1, lat2)
        latsign = np.where(lt1 > 0, -1.0, 1.0)
        lt1 = lt1 * latsign
        lt2 = lt2 * latsign
        phi1 = np.radians(lt1)
        phi2 = np.radians(lt2)
        beta1 = np.arctan2((1 - self.f) * np.sin(phi1), np.cos(phi1))
        beta2 = np.arctan2((1 - self.f) * np.sin(phi2), np.cos(phi2))
        lam_t = np.radians(lon12)

        s12 = np.zeros(n)
        salp1 = np.zeros(n)
        calp1 = np.ones(n)
        salp2 = np.zeros(n)
        calp2 = np.ones(n)

        coincident = (lam_t < 1e-15) & (np.abs(phi1 - phi2) < 1e-15)
        equatorial = (
            ~coincident
            & (np.abs(beta1) < 1e-15)
            & (np.abs(beta2) < 1e-15)
            & (lam_t <= (1 - self.f) * np.pi)
        )
        meridional = ~coincident & ~equatorial & (lam_t < 1e-15)
        general = ~(coincident | equatorial | meridional)
        # equatorial-but-long pairs leave the equator: break the sigma
        # degeneracy by nudging point 1 infinitesimally south
        eq_long = general & (np.abs(beta1) < 1e-15) & (np.abs(beta2) < 1e-15)
        beta1 = np.where(eq_long, -1e-12, beta1)

        if equatorial.any():
            s12[equatorial] = self.a * lam_t[equatorial]
            salp1[equatorial] = 1.0
            calp1[equatorial] = 0.0
            salp2[equatorial] = 1.0
            calp2[equatorial] = 0.0
        if meridional.any():
            # alpha0 = 0: sigma == beta and k2 == e'^2; heading due north
            k2m = np.full(int(meridional.sum()), self.ep2)
            s12[meridional] = self.b * self._i1_rows(
                k2m, beta1[meridional], beta2[meridional]
            )
            # salp = 0, calp = 1 already set
        if general.any():
            g = np.flatnonzero(general)
            alpha = self._solve_rows(beta1[g], beta2[g], lam_t[g])
            sb1, cb1 = np.sin(beta1[g]), np.cos(beta1[g])
            sb2, cb2 = np.sin(beta2[g]), np.cos(beta2[g])
            _, s12g, sa2, ca2, *_ = self._triangle_rows(
                sb1, cb1, sb2, cb2, np.sin(alpha), np.cos(alpha), False
            )
            s12[g] = s12g
            salp1[g] = np.sin(alpha)
            calp1[g] = np.cos(alpha)
            salp2[g] = sa2
            calp2[g] = ca2

        # un-transform the azimuths (geographiclib convention)
        sw = swapp < 0
        salp1f = np.where(sw, salp2, salp1) * swapp * lonsign
        calp1f = np.where(sw, calp2, calp1) * swapp * latsign
        salp2f = np.where(sw, salp1, salp2) * swapp * lonsign
        calp2f = np.where(sw, calp1, calp2) * swapp * latsign
        azi1 = np.degrees(np.arctan2(salp1f, calp1f)) % 360.0
        azi2 = np.degrees(np.arctan2(salp2f, calp2f)) % 360.0
        azi1 = np.where(coincident, 0.0, azi1)
        azi2 = np.where(coincident, 0.0, azi2)
        return s12, azi1, azi2

    # -- direct problem: destination from (point, azimuth, distance) ------

    def direct_rows(self, lon1, lat1, azi1, s12):
        """Vectorized direct problem.  Returns (lon2, lat2, azi2) as
        (n,) arrays; lon2 normalized to [-180, 180), azi2 in [0, 360)."""
        lon1, lat1, azi1, s12 = np.broadcast_arrays(
            _f1d(lon1), _f1d(lat1), _f1d(azi1), _f1d(s12)
        )
        phi1 = np.radians(lat1)
        beta1 = np.arctan2((1 - self.f) * np.sin(phi1), np.cos(phi1))
        sb1, cb1 = np.sin(beta1), np.cos(beta1)
        alp1 = np.radians(azi1)
        salp1, calp1 = np.sin(alp1), np.cos(alp1)
        sa0 = salp1 * cb1
        ca0 = np.hypot(calp1, salp1 * sb1)
        k2 = self.ep2 * ca0 * ca0
        sigma1 = np.arctan2(sb1, calp1 * cb1)
        omega1 = np.arctan2(sa0 * sb1, calp1 * cb1)
        # Newton on g(sigma2) = I1(sigma1, sigma2) - s12/b;
        # g' = sqrt(1 + k2 sin^2 sigma2) >= 1 > 0, so plain Newton from
        # the spherical guess converges monotonically and fast
        tgt = s12 / self.b
        sigma2 = sigma1 + tgt
        for _ in range(20):
            g = self._i1_rows(k2, sigma1, sigma2) - tgt
            if np.all(np.abs(g) < 1e-15):
                break
            sigma2 = sigma2 - g / np.sqrt(1.0 + k2 * np.sin(sigma2) ** 2)
        ss2, cs2 = np.sin(sigma2), np.cos(sigma2)
        sb2 = ca0 * ss2
        cb2 = np.hypot(cs2, sa0 * ss2)
        lat2 = np.degrees(np.arctan2(sb2, (1 - self.f) * cb2))
        omega2 = np.arctan2(sa0 * ss2, cs2)
        lam12 = (omega2 - omega1) - self.f * sa0 * self._i3_rows(k2, sigma1, sigma2)
        lon2 = ((lon1 + np.degrees(lam12) + 180.0) % 360.0) - 180.0
        azi2 = np.degrees(np.arctan2(sa0, ca0 * cs2)) % 360.0
        return lon2, lat2, azi2

    # -- scalar conveniences -----------------------------------------------

    def inverse(self, lon1, lat1, lon2, lat2):
        """(s12 meters, azi1 degrees in [0, 360))."""
        s12, azi1, _ = self.inverse_rows(lon1, lat1, lon2, lat2)
        return float(s12[0]), float(azi1[0])

    def direct(self, lon1, lat1, azi1, s12):
        """(lon2, lat2, azi2 degrees)."""
        lon2, lat2, azi2 = self.direct_rows(lon1, lat1, azi1, s12)
        return float(lon2[0]), float(lat2[0]), float(azi2[0])


_WGS84 = _Ellipsoid(WGS84_A, WGS84_F)


def _ell(a: float, f: float) -> _Ellipsoid:
    return _WGS84 if (a == WGS84_A and f == WGS84_F) else _Ellipsoid(a, f)


def geodesic_distance(lon1, lat1, lon2, lat2, a: float = WGS84_A, f: float = WGS84_F):
    """Vectorized Karney-framework geodesic distance in meters (WGS84
    by default).  geodesic.rs `Distance` surface."""
    return _ell(a, f).inverse_rows(lon1, lat1, lon2, lat2)[0]


def geodesic_bearing(lon1, lat1, lon2, lat2):
    """Forward azimuth (degrees, [0, 360)) of the WGS84 geodesic.
    geodesic.rs `Bearing` surface."""
    return _WGS84.inverse_rows(lon1, lat1, lon2, lat2)[1]


def geodesic_inverse(lon1, lat1, lon2, lat2, a: float = WGS84_A, f: float = WGS84_F):
    """(s12, azi1, azi2) arrays — the full inverse problem."""
    return _ell(a, f).inverse_rows(lon1, lat1, lon2, lat2)


def geodesic_destination(lon, lat, bearing, distance_m,
                         a: float = WGS84_A, f: float = WGS84_F):
    """Destination point(s) of the direct problem.  Returns
    (lon2, lat2) arrays.  geodesic.rs `Destination` surface
    (geodesic.rs:193 delegates to geographiclib `direct`)."""
    lon2, lat2, _ = _ell(a, f).direct_rows(lon, lat, bearing, distance_m)
    return lon2, lat2


def geodesic_point_at_distance_between(lon1, lat1, lon2, lat2, meters_from_start):
    """geodesic.rs:275 `point_at_distance_between`: bearing at start,
    then the direct problem for the given distance."""
    _, azi1, _ = _WGS84.inverse_rows(lon1, lat1, lon2, lat2)
    return geodesic_destination(lon1, lat1, azi1, meters_from_start)


def geodesic_point_at_ratio_between(lon1, lat1, lon2, lat2, ratio):
    """geodesic.rs:316 `point_at_ratio_between`: the direct problem at
    ratio * total distance along the start bearing."""
    s12, azi1, _ = _WGS84.inverse_rows(lon1, lat1, lon2, lat2)
    return geodesic_destination(lon1, lat1, azi1, np.asarray(ratio) * s12)


# ---------------------------------------------------------------------------
# GeodesicArea (geodesic_area.rs — Karney's polygon area): Green's
# theorem on the ellipsoid.  dA = a^2(1-e^2) cos(phi)/(1-e^2 sin^2 phi)^2
# dphi dlambda has the CLOSED-FORM antiderivative in phi
#   F(phi) = a^2(1-e^2)/2 [ sin(phi)/(1-e^2 sin^2 phi) + atanh(e sin phi)/e ]
# so the signed area is the boundary integral  A = ∮ F(phi) dlambda,
# evaluated edge-by-edge ALONG THE ACTUAL GEODESIC: each edge's inverse
# solve supplies (alpha0, k2, sigma1, sigma2); on the edge,
#   phi(sigma)     from sin(beta) = cos(alpha0) sin(sigma),
#   dlambda/dsigma = sin(alpha0)/(cos^2 s + sin^2 a0 sin^2 s) - f sin(alpha0) i3(s)
# and the quadrature is exact to ~1e-13 like the distance integrals.
# All edges of a ring are solved in ONE vectorized canonical solve.
# Limitation (same as the reference documents): polygons enclosing a
# pole / larger than half the ellipsoid need the unsigned adjustment.
# ---------------------------------------------------------------------------


class _AreaEllipsoid(_Ellipsoid):
    def F(self, phi):
        e = np.sqrt(self.e2)
        s = np.sin(phi)
        return (self.a * self.a * (1 - self.e2) / 2.0) * (
            s / (1 - self.e2 * s * s) + np.arctanh(e * s) / e
        )

    def ring_area(self, lon, lat) -> float:
        """∮ F(phi) dlambda over one closed ring, geodesic edges."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lo1, la1 = lon[:-1], lat[:-1]
        lo2, la2 = lon[1:], lat[1:]
        # canonical transforms per edge (mirror inverse_rows)
        lon12 = ((lo2 - lo1 + 180.0) % 360.0) - 180.0
        lonsign = np.where(lon12 < 0, -1.0, 1.0)
        lon12 = np.abs(lon12)
        swapp = np.where(np.abs(la1) < np.abs(la2), -1.0, 1.0)
        lt1 = np.where(swapp < 0, la2, la1)
        lt2 = np.where(swapp < 0, la1, la2)
        latsign = np.where(lt1 > 0, -1.0, 1.0)
        lt1 = lt1 * latsign
        lt2 = lt2 * latsign
        phi1 = np.radians(lt1)
        phi2 = np.radians(lt2)
        beta1 = np.arctan2((1 - self.f) * np.sin(phi1), np.cos(phi1))
        beta2 = np.arctan2((1 - self.f) * np.sin(phi2), np.cos(phi2))
        lam_t = np.radians(lon12)
        # meridional / degenerate edges contribute dlambda == 0;
        # equatorial edges contribute F(0) == 0
        keep = (lam_t >= 1e-15) & ~(
            (np.abs(beta1) < 1e-15) & (np.abs(beta2) < 1e-15)
        )
        if not keep.any():
            return 0.0
        g = np.flatnonzero(keep)
        alpha = self._solve_rows(beta1[g], beta2[g], lam_t[g])
        sb1, cb1 = np.sin(beta1[g]), np.cos(beta1[g])
        sb2, cb2 = np.sin(beta2[g]), np.cos(beta2[g])
        _, _, _, _, sa0, ca0, k2, sigma1, sigma2 = self._triangle_rows(
            sb1, cb1, sb2, cb2, np.sin(alpha), np.cos(alpha), False
        )
        f = self.f
        mid = 0.5 * (sigma1 + sigma2)
        half = 0.5 * (sigma2 - sigma1)
        s = mid[:, None] + half[:, None] * _NODES[None, :]
        ss, cs = np.sin(s), np.cos(s)
        sbeta = ca0[:, None] * ss
        cbeta = np.hypot(cs, sa0[:, None] * ss)
        phi = np.arctan2(sbeta, (1 - f) * cbeta)
        omega_p = sa0[:, None] / (cs * cs + (sa0 * sa0)[:, None] * ss * ss)
        i3 = (2 - f) / (1 + (1 - f) * np.sqrt(1 + k2[:, None] * ss * ss))
        # reference level F(phi_0) (first vertex), mirrored into each
        # edge's canonical frame (F is odd, the frame flips phi by
        # latsign): the subtraction telescopes to C * (signed sum of
        # lam_t) == 0 over a closed non-pole-enclosing ring, but it
        # collapses per-edge magnitudes ~1000x — without it each edge
        # carries ~F(phi)*dlambda with 50:1 cancellation across the
        # ring, and the alpha-sensitivity of ill-conditioned
        # (equal-latitude) edges leaks ~1e-6 relative noise into the
        # total (r3)
        c_ref = self.F(np.radians(lat[0]))
        c_edge = (latsign[g] * c_ref)[:, None]
        integ = (self.F(phi) - c_edge) * (omega_p - f * sa0[:, None] * i3)
        Ic = half * (integ @ _WEIGHTS)
        # edge direction sign: lonsign flips west-going edges and latsign
        # re-mirrors the hemisphere (F is odd in phi).  The two swap
        # factors cancel: swapping endpoints negates lambda12 AND
        # reverses the integral direction.
        sign = lonsign * latsign
        return float(np.sum(sign[g] * Ic))


_WGS84_AREA = _AreaEllipsoid(WGS84_A, WGS84_F)


def geodesic_area_signed(lon, lat, a: float = WGS84_A, f: float = WGS84_F) -> float:
    """Signed ellipsoidal area of one CLOSED ring (CCW positive),
    geodesic edges (geodesic_area.rs semantics; pole-enclosing rings
    out of scope like the reference's signed variant)."""
    ell = _WGS84_AREA if (a == WGS84_A and f == WGS84_F) else _AreaEllipsoid(a, f)
    return ell.ring_area(lon, lat)


def geodesic_area_unsigned(lon, lat) -> float:
    return abs(geodesic_area_signed(lon, lat))
