"""Full DE-9IM Relate for every operand-dimension combination.

Reference: geo/src/algorithm/relate/mod.rs:61-77 + relate/geomgraph/*
(the noded GeometryGraph) and intersection_matrix.rs:436-799 (named
predicates as matrix patterns).  The reference builds a labelled
topology graph; georay computes the same matrix from EVENT-BASED
noding:

1. every A-segment is intersected with every B-segment using the exact
   orientation predicate (pip.orient2d_sign) — each pair yields either
   a collinear-overlap INTERVAL, a touch/crossing EVENT whose
   interior/boundary role on each operand is decided from the exact
   signs and vertex identities (never by re-testing computed floats),
   or nothing;
2. both boundaries are fragmented at the recorded params, so every
   fragment lies entirely in ONE position class of the other geometry;
   fragments inside a collinear interval are ON the other boundary by
   construction; all other fragment midpoints classify with the exact
   winding kernel;
3. the nine Interior/Boundary/Exterior intersections assemble from the
   classified fragments, the touch events, and (for areal operands)
   interior/exterior side probes of BOTH boundaries.

Boundary semantics follow the reference/JTS Mod-2 rule: a LineString's
boundary is its odd-occurrence endpoints (closed rings have none); a
(Multi)Point has no boundary; a polygon's boundary is its rings.

Matrices are 9-char strings over {F,0,1,2}, row-major (I,B,E of A) x
(I,B,E of B) — the encoding georay.relate's pattern matchers consume,
so every named predicate now answers for ALL operand dimensions.
"""

from __future__ import annotations

import numpy as np

from .kernels.overlay import BOUNDARY, INSIDE, OUTSIDE, _Piece, _candidate_pairs
from .kernels.pip import orient2d_sign


def _sgn(p1, p2, q) -> int:
    """Exact orientation of q relative to segment p1->p2."""
    return int(
        orient2d_sign(
            np.asarray([p1[0]]), np.asarray([p1[1]]),
            np.asarray([p2[0]]), np.asarray([p2[1]]),
            np.asarray([q[0]]), np.asarray([q[1]]),
        )[0]
    )


# ---------------------------------------------------------------------------
# geometry normalization
# ---------------------------------------------------------------------------


class _Geom:
    def __init__(self, parsed):
        kind, data = parsed
        self.dim = -1
        self.pts = np.zeros((0, 2))
        self.lines: list[np.ndarray] = []
        self.pieces: list[list[np.ndarray]] = []
        if kind == "point":
            if data is not None:
                self.pts = np.asarray([data], dtype=np.float64)
                self.dim = 0
        elif kind == "multipoint":
            arr = np.asarray(data, dtype=np.float64).reshape(-1, 2)
            if len(arr):
                self.pts = np.unique(arr, axis=0)
                self.dim = 0
        elif kind in ("linestring", "multilinestring"):
            for ln in [data] if kind == "linestring" else list(data):
                ln = np.asarray(ln, dtype=np.float64)
                keep = np.ones(len(ln), bool)
                keep[1:] = (ln[1:, 0] != ln[:-1, 0]) | (ln[1:, 1] != ln[:-1, 1])
                ln = ln[keep]
                if len(ln) >= 2:
                    self.lines.append(ln)
            if self.lines:
                self.dim = 1
        elif kind in ("polygon", "multipolygon"):
            for rings in [data] if kind == "polygon" else list(data):
                rr = [np.asarray(r, dtype=np.float64) for r in rings]
                rr = [r for r in rr if len(r) >= 4]
                if rr:
                    self.pieces.append(rr)
            if self.pieces:
                self.dim = 2
        else:
            raise ValueError(f"unsupported geometry kind {kind}")

        if self.dim == 1:
            from collections import Counter

            cnt: Counter = Counter()
            for ln in self.lines:
                cnt[(ln[0, 0], ln[0, 1])] += 1
                cnt[(ln[-1, 0], ln[-1, 1])] += 1
            self.bset = {p for p, c in cnt.items() if c % 2 == 1}
        else:
            self.bset = set()

        # 1D skeleton segments
        p1s, p2s = [], []
        if self.dim == 1:
            for ln in self.lines:
                for i in range(len(ln) - 1):
                    p1s.append(ln[i])
                    p2s.append(ln[i + 1])
        elif self.dim == 2:
            for rings in self.pieces:
                for r in rings:
                    for i in range(len(r) - 1):
                        if (r[i] == r[i + 1]).all():
                            continue
                        p1s.append(r[i])
                        p2s.append(r[i + 1])
        self.s1 = np.asarray(p1s, dtype=np.float64).reshape(-1, 2)
        self.s2 = np.asarray(p2s, dtype=np.float64).reshape(-1, 2)

    def positions(self, px, py):
        """INSIDE/BOUNDARY/OUTSIDE vs this AREAL geom (max over pieces).
        EVEN-ODD per piece: WKT rings carry arbitrary orientations, and
        for a valid polygon crossing parity equals membership without
        needing shell-CCW/hole-CW normalization."""
        out = np.full(len(px), OUTSIDE, np.int8)
        for rings in self.pieces:
            pc = _Piece(rings)
            out = np.maximum(
                out,
                pc.positions(np.asarray(px, float), np.asarray(py, float), evenodd=True),
            )
        return out


# ---------------------------------------------------------------------------
# event-based cross-noding
# ---------------------------------------------------------------------------


class _Noding:
    """Cross-noding of A's skeleton against B's.

    ts_a[i] / ts_b[j]: split params per segment.
    events: list of (roleA, roleB) for isolated touch/crossing points.
    collin_a[i] / collin_b[j]: merged collinear-overlap intervals.
    """

    def __init__(self, A: _Geom, B: _Geom):
        self.A, self.B = A, B
        na, nb = len(A.s1), len(B.s1)
        self.ts_a: list[list[float]] = [[] for _ in range(na)]
        self.ts_b: list[list[float]] = [[] for _ in range(nb)]
        self.events: list[tuple[str, str]] = []
        self.collin_a: list[list[tuple[float, float]]] = [[] for _ in range(na)]
        self.collin_b: list[list[tuple[float, float]]] = [[] for _ in range(nb)]
        if na == 0 or nb == 0:
            return
        allc = np.concatenate([A.s1, A.s2, B.s1, B.s2])
        extent = max(
            1e-30,
            float(allc[:, 0].max() - allc[:, 0].min()),
            float(allc[:, 1].max() - allc[:, 1].min()),
        )
        self.snap = max(1e-9 * extent, 1e-12 * float(np.abs(allc).max()))
        self._bk_a = {self._key(x, y) for x, y in A.bset}
        self._bk_b = {self._key(x, y) for x, y in B.bset}
        # bbox candidates between the two sets
        p1 = np.concatenate([A.s1, B.s1])
        p2 = np.concatenate([A.s2, B.s2])
        ii, jj = _candidate_pairs(p1, p2, self.snap)
        for i, j in zip(ii, jj):
            if i < na and j >= na:
                self._pair(int(i), int(j - na))
            elif j < na and i >= na:
                self._pair(int(j), int(i - na))

    def _key(self, x: float, y: float):
        return (round(x / self.snap), round(y / self.snap))

    def _role(self, G: _Geom, p) -> str:
        """Topological role of a point ON G's skeleton: areal points are
        always boundary; a line point is boundary iff it coincides with
        one of the geometry's Mod-2 boundary endpoints — GLOBAL point
        identity, so a self-intersection that lands on an endpoint is
        boundary even where it crosses another part's interior
        (JTS TestRelateLL case 13/14 semantics)."""
        if G.dim == 2:
            return "B"
        k = self._key(p[0], p[1])
        return "B" if k in (self._bk_a if G is self.A else self._bk_b) else "I"

    def _pair(self, i: int, j: int):
        A, B = self.A, self.B
        a1, a2 = A.s1[i], A.s2[i]
        b1, b2 = B.s1[j], B.s2[j]
        d1 = _sgn(b1, b2, a1)
        d2 = _sgn(b1, b2, a2)
        d3 = _sgn(a1, a2, b1)
        d4 = _sgn(a1, a2, b2)
        ra = a2 - a1
        rb = b2 - b1
        la2 = float(ra @ ra)
        lb2 = float(rb @ rb)
        if d3 == 0 and d4 == 0:
            # collinear: parameter overlap
            t1 = float((b1 - a1) @ ra / la2)
            t2 = float((b2 - a1) @ ra / la2)
            lo, hi = min(t1, t2), max(t1, t2)
            lo_c, hi_c = max(lo, 0.0), min(hi, 1.0)
            if hi_c > lo_c:
                self.collin_a[i].append((lo_c, hi_c))
                self.ts_a[i] += [lo_c, hi_c]
                u1 = float((a1 - b1) @ rb / lb2)
                u2 = float((a2 - b1) @ rb / lb2)
                ulo, uhi = min(u1, u2), max(u1, u2)
                self.collin_b[j].append((max(ulo, 0.0), min(uhi, 1.0)))
                self.ts_b[j] += [max(ulo, 0.0), min(uhi, 1.0)]
            elif hi_c == lo_c:  # endpoint touch of collinear segments
                p = a1 + lo_c * ra
                self.events.append((self._role(A, p), self._role(B, p)))
            return
        if d3 == 0 or d4 == 0:
            # one B endpoint on A's line: touch if inside A's span
            bq = b1 if d3 == 0 else b2
            t = float((bq - a1) @ ra / la2)
            if -1e-12 <= t <= 1 + 1e-12:
                t = min(max(t, 0.0), 1.0)
                self.events.append((self._role(A, bq), self._role(B, bq)))
                if 0.0 < t < 1.0:
                    self.ts_a[i].append(t)
            return
        if d1 == 0 or d2 == 0:
            aq = a1 if d1 == 0 else a2
            u = float((aq - b1) @ rb / lb2)
            if -1e-12 <= u <= 1 + 1e-12:
                u = min(max(u, 0.0), 1.0)
                self.events.append((self._role(A, aq), self._role(B, aq)))
                if 0.0 < u < 1.0:
                    self.ts_b[j].append(u)
            return
        if d1 != d2 and d3 != d4:
            # proper crossing, strictly interior on both segments
            denom = float(ra[0] * rb[1] - ra[1] * rb[0])
            qp = b1 - a1
            t = float((qp[0] * rb[1] - qp[1] * rb[0]) / denom)
            u = float((qp[0] * ra[1] - qp[1] * ra[0]) / denom)
            t = min(max(t, 0.0), 1.0)
            u = min(max(u, 0.0), 1.0)
            p = a1 + t * ra
            self.events.append((self._role(A, p), self._role(B, p)))
            if 0 < t < 1:
                self.ts_a[i].append(t)
            if 0 < u < 1:
                self.ts_b[j].append(u)

    # ---- fragments -------------------------------------------------------

    def _fragments(self, side: str):
        """(mids (m,2), on_other bool[m]) — noded fragments of one side;
        on_other True when the fragment lies in a collinear interval."""
        G = self.A if side == "a" else self.B
        ts = self.ts_a if side == "a" else self.ts_b
        col = self.collin_a if side == "a" else self.collin_b
        mids, on = [], []
        for i in range(len(G.s1)):
            p1, p2 = G.s1[i], G.s2[i]
            seg_len = float(np.hypot(*(p2 - p1)))
            if seg_len <= 0:
                continue
            tol = self.snap / seg_len
            cuts = [0.0, 1.0] + [t for t in ts[i] if tol < t < 1 - tol]
            cuts = sorted(set(cuts))
            iv = sorted(col[i])
            for k in range(len(cuts) - 1):
                t0, t1 = cuts[k], cuts[k + 1]
                if t1 - t0 <= tol:
                    continue
                tm = (t0 + t1) / 2
                mids.append(p1 + tm * (p2 - p1))
                on.append(any(lo - tol <= t0 and t1 <= hi + tol for lo, hi in iv))
        return (
            np.asarray(mids, dtype=np.float64).reshape(-1, 2),
            np.asarray(on, dtype=bool),
        )


# ---------------------------------------------------------------------------
# matrix assembly
# ---------------------------------------------------------------------------

_ORDER = {"F": -1, "0": 0, "1": 1, "2": 2}


def _set(m: dict, key: str, dim: int):
    if _ORDER[str(dim)] > _ORDER[m.get(key, "F")]:
        m[key] = str(dim)


def _emit(m: dict) -> str:
    return "".join(m.get(k, "F") for k in ("II", "IB", "IE", "BI", "BB", "BE", "EI", "EB", "EE"))


def _transpose(matrix: str) -> str:
    return "".join(matrix[3 * (i % 3) + i // 3] for i in range(9))


def relate_full(parsed_a, parsed_b) -> str:
    """DE-9IM matrix of two parsed geometries (georay.io.parse_wkt
    tuples); every P/L/A operand combination."""
    A, B = _Geom(parsed_a), _Geom(parsed_b)
    if A.dim < 0 or B.dim < 0:
        raise ValueError("empty operand")
    if A.dim == 0 and B.dim == 0:
        return _relate_pp(A, B)
    if A.dim == 0:
        return _relate_p_other(A, B)
    if B.dim == 0:
        return _transpose(_relate_p_other(B, A))
    nod = _Noding(A, B)
    am, a_on = nod._fragments("a")
    bm, b_on = nod._fragments("b")
    if A.dim == 1 and B.dim == 1:
        return _relate_ll(A, B, nod, am, a_on, bm, b_on)
    if A.dim == 1 and B.dim == 2:
        return _relate_la(A, B, nod, am, a_on, bm, b_on)
    if A.dim == 2 and B.dim == 1:
        nod2 = _Noding(B, A)
        return _transpose(
            _relate_la(B, A, nod2, *nod2._fragments("a"), *nod2._fragments("b"))
        )
    return _relate_aa(A, B, nod, am, a_on, bm, b_on)


def _relate_pp(A: _Geom, B: _Geom) -> str:
    ak = {(x, y) for x, y in A.pts}
    bk = {(x, y) for x, y in B.pts}
    m: dict = {}
    if ak & bk:
        _set(m, "II", 0)
    if ak - bk:
        _set(m, "IE", 0)
    if bk - ak:
        _set(m, "EI", 0)
    _set(m, "EE", 2)
    return _emit(m)


def _relate_p_other(P: _Geom, G: _Geom) -> str:
    m: dict = {}
    pk = {(x, y) for x, y in P.pts}
    if G.dim == 2:
        pos = G.positions(P.pts[:, 0], P.pts[:, 1])
        if (pos == INSIDE).any():
            _set(m, "II", 0)
        if (pos == BOUNDARY).any():
            _set(m, "IB", 0)
        if (pos == OUTSIDE).any():
            _set(m, "IE", 0)
        _set(m, "EI", 2)
        _set(m, "EB", 1)
        _set(m, "EE", 2)
        return _emit(m)
    for x, y in P.pts:
        if (x, y) in G.bset:
            _set(m, "IB", 0)
        elif _on_skeleton(G, x, y):
            _set(m, "II", 0)
        else:
            _set(m, "IE", 0)
    _set(m, "EI", 1)  # finite points never cover a curve
    if G.bset - pk:
        _set(m, "EB", 0)
    _set(m, "EE", 2)
    return _emit(m)


def _on_skeleton(G: _Geom, x: float, y: float) -> bool:
    if len(G.s1) == 0:
        return False
    x1, y1 = G.s1[:, 0], G.s1[:, 1]
    x2, y2 = G.s2[:, 0], G.s2[:, 1]
    cand = (
        (np.minimum(x1, x2) <= x) & (x <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= y) & (y <= np.maximum(y1, y2))
    )
    if not cand.any():
        return False
    idx = np.nonzero(cand)[0]
    s = orient2d_sign(x1[idx], y1[idx], x2[idx], y2[idx],
                      np.full(len(idx), x), np.full(len(idx), y))
    return bool((s == 0).any())


def _relate_ll(A, B, nod, am, a_on, bm, b_on) -> str:
    m: dict = {}
    if a_on.any():
        _set(m, "II", 1)
    for ra, rb in nod.events:
        _set(m, {"I": {"I": "II", "B": "IB"}, "B": {"I": "BI", "B": "BB"}}[ra][rb], 0)
    if (~a_on).any():
        _set(m, "IE", 1)
    if (~b_on).any():
        _set(m, "EI", 1)
    # boundary endpoints against the other line (global point identity)
    for x, y in A.bset:
        if (x, y) in B.bset:
            _set(m, "BB", 0)
        elif _on_skeleton(B, x, y):
            _set(m, "BI", 0)
        else:
            _set(m, "BE", 0)
    for x, y in B.bset:
        if (x, y) in A.bset:
            continue
        if _on_skeleton(A, x, y):
            _set(m, "IB", 0)
        else:
            _set(m, "EB", 0)
    _set(m, "EE", 2)
    return _emit(m)


def _relate_la(L, P, nod, lm, l_on, pm, p_on) -> str:
    """Line A vs areal B (fragments: lm of the line, pm of the rings)."""
    m: dict = {}
    if len(lm):
        keep = ~l_on
        pos = P.positions(lm[keep][:, 0], lm[keep][:, 1])
        if l_on.any():
            _set(m, "IB", 1)
        if (pos == INSIDE).any():
            _set(m, "II", 1)
        if (pos == OUTSIDE).any():
            _set(m, "IE", 1)
    for ra, rb in nod.events:
        if ra == "I":
            _set(m, "IB", 0)
        else:
            _set(m, "BB", 0)
    for x, y in L.bset:
        p = P.positions(np.asarray([x]), np.asarray([y]))[0]
        if p == INSIDE:
            _set(m, "BI", 0)
        elif p == BOUNDARY:
            _set(m, "BB", 0)
        else:
            _set(m, "BE", 0)
    _set(m, "EI", 2)
    if (~p_on).any() or len(pm) == 0:
        _set(m, "EB", 1)
    _set(m, "EE", 2)
    return _emit(m)


def _relate_aa(A, B, nod, am, a_on, bm, b_on) -> str:
    m: dict = {}
    apos = np.full(len(am), BOUNDARY, np.int8)
    if (~a_on).any():
        apos[~a_on] = B.positions(am[~a_on][:, 0], am[~a_on][:, 1])
    bpos = np.full(len(bm), BOUNDARY, np.int8)
    if (~b_on).any():
        bpos[~b_on] = A.positions(bm[~b_on][:, 0], bm[~b_on][:, 1])
    apos[a_on] = BOUNDARY
    bpos[b_on] = BOUNDARY

    allc = np.concatenate([am, bm]) if len(am) + len(bm) else np.zeros((1, 2))
    extent = max(
        1e-30,
        float(allc[:, 0].max() - allc[:, 0].min()),
        float(allc[:, 1].max() - allc[:, 1].min()),
    )
    delta = max(1e-7 * extent, 1e-10 * float(np.abs(allc).max()))

    def probes(G: _Geom, side: str):
        """interior/exterior offset points for each boundary fragment of
        G (normal direction from the fragment's own segment)."""
        nodG = nod
        ts = nodG.ts_a if side == "a" else nodG.ts_b
        col = nodG.collin_a if side == "a" else nodG.collin_b
        S1 = G.s1
        S2 = G.s2
        ip, ep = [], []
        for i in range(len(S1)):
            p1, p2 = S1[i], S2[i]
            seg_len = float(np.hypot(*(p2 - p1)))
            if seg_len <= 0:
                continue
            tol = nodG.snap / seg_len
            cuts = sorted(set([0.0, 1.0] + [t for t in ts[i] if tol < t < 1 - tol]))
            nx, ny = -(p2[1] - p1[1]) / seg_len, (p2[0] - p1[0]) / seg_len
            for k in range(len(cuts) - 1):
                t0, t1 = cuts[k], cuts[k + 1]
                if t1 - t0 <= tol:
                    continue
                tm = (t0 + t1) / 2
                mx, my = p1 + tm * (p2 - p1)
                ip.append((mx + delta * nx, my + delta * ny))
                ep.append((mx - delta * nx, my - delta * ny))
        ipa = np.asarray(ip, dtype=np.float64).reshape(-1, 2)
        epa = np.asarray(ep, dtype=np.float64).reshape(-1, 2)
        if len(ipa) == 0:
            return ipa, epa
        # orient: interior side = the one inside G
        ins = G.positions(ipa[:, 0], ipa[:, 1]) == INSIDE
        ii = np.where(ins[:, None], ipa, epa)
        ee = np.where(ins[:, None], epa, ipa)
        return ii, ee

    a_int, a_ext = probes(A, "a")
    b_int, b_ext = probes(B, "b")
    if len(a_int):
        pin = B.positions(a_int[:, 0], a_int[:, 1])
        pex = B.positions(a_ext[:, 0], a_ext[:, 1])
        if (pin == INSIDE).any():
            _set(m, "II", 2)
        if (pin == OUTSIDE).any():
            _set(m, "IE", 2)
        if (pex == INSIDE).any():
            _set(m, "EI", 2)
    if len(b_int):
        pin = A.positions(b_int[:, 0], b_int[:, 1])
        pex = A.positions(b_ext[:, 0], b_ext[:, 1])
        if (pin == INSIDE).any():
            _set(m, "II", 2)
        if (pin == OUTSIDE).any():
            _set(m, "EI", 2)
        if (pex == INSIDE).any():
            _set(m, "IE", 2)
    if (bpos == INSIDE).any():
        _set(m, "IB", 1)
    if (apos == INSIDE).any():
        _set(m, "BI", 1)
    if a_on.any() or b_on.any():
        _set(m, "BB", 1)
    elif nod.events:
        _set(m, "BB", 0)
    if (apos == OUTSIDE).any():
        _set(m, "BE", 1)
    if (bpos == OUTSIDE).any():
        _set(m, "EB", 1)
    _set(m, "EE", 2)
    return _emit(m)
