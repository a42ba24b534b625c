"""Planar overlay engine: noding + side classification + ring stitching.

The reference delegates general boolean ops, unary_union and buffer
assembly to the i_overlay crate (geo/src/algorithm/bool_ops/mod.rs:44-110,
buffer.rs:1-30); this module is the georay counterpart, built as a
classic three-phase overlay (the approach JTS's OverlayNG documents
publicly): node every input segment against every other, classify each
resulting fragment by which region lies on each side, keep exactly the
fragments where the result region flips, and stitch them into rings with
a leftmost-turn walk.  Unlike the round-1 arc-tracing clipper
(kernels/boolops.py — simple rings in generic position only), this
engine handles shared edges, vertex-on-edge contacts, overlapping
collinear boundaries, multipolygons and polygons with holes, because
classification is by POINT MEMBERSHIP (exact winding with robust
orientation, pip.ring_positions) rather than by crossing parity.

Data model
----------
ring    closed (k+1, 2) float64 array, any orientation
piece   list[ring] — one polygon (shell + holes), membership by the
        NONZERO winding rule
region  list[piece] — membership = inside ANY piece (self-union
        semantics, which is what makes unary_union and buffer free)

Tolerances (r3 — hot-pixel snap rounding): after noding, every
fragment endpoint is quantized to a snap grid of 1e-9 x the input
extent and fragments are rerouted through any hot pixel (occupied
grid point) they pass within half a pixel of (Hobby 1999 / JTS
SnapRoundingNoder — see ``_snap_round``).  Classification probes sit
a THIRD of a pixel off each fragment midpoint and are evaluated
against the snapped per-piece fragment soup itself, so the geometry
probed is bit-identical to the geometry stitched: legitimate thin
features survive down to ~snap width, and adversarial sub-snap
slivers collapse exactly instead of misclassifying.  Output
coordinates are grid-quantized, so derived areas carry O(snap x
perimeter) ~ 1e-8-relative quantization — far inside the reference's
buffer conformance tolerance (xor-area ratio 1.4e-3,
jts-test-runner/src/lib.rs:63); tests compare analytic areas at 1e-6.
"""

from __future__ import annotations

import numpy as np

from .pip import BOUNDARY, INSIDE, OUTSIDE, ring_positions


def _ranges_local(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized per-group arange)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(total, dtype=np.int64) - starts


# ---------------------------------------------------------------------------
# membership
# ---------------------------------------------------------------------------


class _Piece:
    __slots__ = ("x1", "y1", "x2", "y2", "bbox")

    def __init__(self, rings):
        xs1, ys1, xs2, ys2 = [], [], [], []
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            xs1.append(r[:-1, 0])
            ys1.append(r[:-1, 1])
            xs2.append(r[1:, 0])
            ys2.append(r[1:, 1])
        self.x1 = np.concatenate(xs1) if xs1 else np.zeros(0)
        self.y1 = np.concatenate(ys1) if ys1 else np.zeros(0)
        self.x2 = np.concatenate(xs2) if xs2 else np.zeros(0)
        self.y2 = np.concatenate(ys2) if ys2 else np.zeros(0)
        self._finish()

    @classmethod
    def from_segments(cls, p1: np.ndarray, p2: np.ndarray) -> "_Piece":
        """Membership piece straight from a segment soup (the winding /
        parity tests never need assembled rings — only the full
        boundary multiset)."""
        pc = cls.__new__(cls)
        pc.x1, pc.y1 = p1[:, 0], p1[:, 1]
        pc.x2, pc.y2 = p2[:, 0], p2[:, 1]
        pc._finish()
        return pc

    def _finish(self):
        if len(self.x1):
            self.bbox = (
                min(self.x1.min(), self.x2.min()),
                min(self.y1.min(), self.y2.min()),
                max(self.x1.max(), self.x2.max()),
                max(self.y1.max(), self.y2.max()),
            )
        else:
            self.bbox = (0.0, 0.0, -1.0, -1.0)

    def positions(self, px, py, evenodd: bool = False):
        """Winding positions of probe points, exact.  Default NONZERO
        rule; ``evenodd`` switches to crossing parity (the Ledoux
        prepair fill rule used by MakeValid, repair_polygon/mod.rs).
        Large pieces use a y-bucket index so each probe only meets the
        segments straddling its latitude band (O(n + k) not O(n*m))."""
        n_pt, n_sg = len(px), len(self.x1)
        if n_sg == 0:
            return np.full(n_pt, OUTSIDE, np.int8)
        fn = _parity_positions if evenodd else ring_positions
        if n_pt * n_sg <= 262_144:
            task = np.repeat(np.arange(n_pt), n_sg)
            return fn(
                np.repeat(px, n_sg),
                np.repeat(py, n_sg),
                np.tile(self.x1, n_pt),
                np.tile(self.y1, n_pt),
                np.tile(self.x2, n_pt),
                np.tile(self.y2, n_pt),
                task,
                n_pt,
            )
        y0, y1b = self.bbox[1], self.bbox[3]
        nb = min(256, max(8, int(np.sqrt(n_sg))))
        h = max((y1b - y0) / nb, 1e-300)
        slo = np.clip(((np.minimum(self.y1, self.y2) - y0) / h).astype(np.int64), 0, nb - 1)
        shi = np.clip(((np.maximum(self.y1, self.y2) - y0) / h).astype(np.int64), 0, nb - 1)
        pb = np.clip(((py - y0) / h).astype(np.int64), 0, nb - 1)
        out = np.full(n_pt, OUTSIDE, np.int8)
        for b in range(nb):
            pm = np.nonzero(pb == b)[0]
            if not len(pm):
                continue
            sm = np.nonzero((slo <= b) & (shi >= b))[0]
            if not len(sm):
                continue
            k = len(sm)
            task = np.repeat(np.arange(len(pm)), k)
            out[pm] = fn(
                np.repeat(px[pm], k),
                np.repeat(py[pm], k),
                np.tile(self.x1[sm], len(pm)),
                np.tile(self.y1[sm], len(pm)),
                np.tile(self.x2[sm], len(pm)),
                np.tile(self.y2[sm], len(pm)),
                task,
                len(pm),
            )
        return out


def _parity_positions(px, py, x1, y1, x2, y2, task, n_tasks):
    """Even-odd (crossing parity) analogue of pip.ring_positions, same
    half-open edge rule and exact orientation predicate."""
    from .pip import orient2d_sign, _value_in_between

    up = (y1 <= py) & (y2 >= py)
    down = (y1 > py) & (y2 <= py)
    need = up | down
    sign = np.zeros(len(px), dtype=np.int8)
    if np.any(need):
        nz = np.nonzero(need)[0]
        sign[nz] = orient2d_sign(x1[nz], y1[nz], x2[nz], y2[nz], px[nz], py[nz])
    up_cross = up & (sign > 0) & (y2 != py)
    down_cross = down & (sign < 0)
    on_boundary = need & (sign == 0) & _value_in_between(px, x1, x2)
    cnt = np.bincount(task[up_cross], minlength=n_tasks) + np.bincount(
        task[down_cross], minlength=n_tasks
    )
    bnd = np.bincount(task[on_boundary], minlength=n_tasks) > 0
    pos = np.where(cnt % 2 == 1, INSIDE, OUTSIDE).astype(np.int8)
    pos[bnd] = BOUNDARY
    return pos


def _region_membership(px, py, pieces: list[_Piece], pad: float, evenodd: bool = False) -> np.ndarray:
    """True where the probe is inside (or on) ANY piece of the region."""
    out = np.zeros(len(px), bool)
    for pc in pieces:
        x0, y0, x1, y1 = pc.bbox
        m = (
            ~out
            & (px >= x0 - pad)
            & (px <= x1 + pad)
            & (py >= y0 - pad)
            & (py <= y1 + pad)
        )
        if not m.any():
            continue
        idx = np.nonzero(m)[0]
        pos = pc.positions(px[idx], py[idx], evenodd=evenodd)
        out[idx[pos != OUTSIDE]] = True
    return out


# ---------------------------------------------------------------------------
# noding
# ---------------------------------------------------------------------------


def _collect_segments(regions):
    """-> (P1 (S,2), P2 (S,2), piece_of (S,), piece_region (list))
    concatenated over every ring of every piece of every region,
    zero-length segments dropped.  piece_of maps each segment to a
    global piece index; piece_region maps piece index -> region
    index (membership stays PER PIECE — pieces of one region may
    overlap with opposite winding, so their soups must not merge)."""
    p1s, p2s, pids = [], [], []
    piece_region: list[int] = []
    for ri, region in enumerate(regions):
        for rings in region:
            pi = len(piece_region)
            piece_region.append(ri)
            for r in rings:
                r = np.asarray(r, dtype=np.float64)
                a, b = r[:-1], r[1:]
                keep = (a[:, 0] != b[:, 0]) | (a[:, 1] != b[:, 1])
                p1s.append(a[keep])
                p2s.append(b[keep])
                pids.append(np.full(int(keep.sum()), pi, np.int64))
    if not p1s:
        return np.zeros((0, 2)), np.zeros((0, 2)), np.zeros(0, np.int64), piece_region
    return (
        np.concatenate(p1s),
        np.concatenate(p2s),
        np.concatenate(pids),
        piece_region,
    )


def _candidate_pairs(p1, p2, pad):
    """Index pairs (i < j) whose segment bboxes overlap (chunked S x S)."""
    S = len(p1)
    minx = np.minimum(p1[:, 0], p2[:, 0]) - pad
    maxx = np.maximum(p1[:, 0], p2[:, 0]) + pad
    miny = np.minimum(p1[:, 1], p2[:, 1]) - pad
    maxy = np.maximum(p1[:, 1], p2[:, 1]) + pad
    out_i, out_j = [], []
    chunk = max(1, 20_000_000 // max(S, 1))
    for s in range(0, S, chunk):
        e = min(S, s + chunk)
        hit = (
            (minx[s:e, None] <= maxx[None, :])
            & (maxx[s:e, None] >= minx[None, :])
            & (miny[s:e, None] <= maxy[None, :])
            & (maxy[s:e, None] >= miny[None, :])
        )
        ii, jj = np.nonzero(hit)
        ii = ii + s
        keep = ii < jj
        out_i.append(ii[keep])
        out_j.append(jj[keep])
    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(out_i), np.concatenate(out_j)


def _node(p1, p2, snap):
    """Split params per segment from pairwise intersections.

    Returns list-of-arrays ts[i] (param values in (0,1)) per segment."""
    S = len(p1)
    ts: list[list[float]] = [[] for _ in range(S)]
    if S == 0:
        return ts
    ii, jj = _candidate_pairs(p1, p2, snap)
    if len(ii):
        r = p2[ii] - p1[ii]
        s = p2[jj] - p1[jj]
        qp = p1[jj] - p1[ii]
        denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
        rlen = np.hypot(r[:, 0], r[:, 1])
        slen = np.hypot(s[:, 0], s[:, 1])
        para = np.abs(denom) <= 1e-13 * rlen * slen
        # proper / endpoint intersections
        np_err = np.seterr(divide="ignore", invalid="ignore")
        try:
            t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / denom
            u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / denom
        finally:
            np.seterr(**np_err)
        tol_t = snap / np.maximum(rlen, snap)
        tol_u = snap / np.maximum(slen, snap)
        ok = (
            ~para
            & (t >= -tol_t)
            & (t <= 1 + tol_t)
            & (u >= -tol_u)
            & (u <= 1 + tol_u)
        )
        for k in np.nonzero(ok)[0]:
            tv = min(max(float(t[k]), 0.0), 1.0)
            uv = min(max(float(u[k]), 0.0), 1.0)
            if tol_t[k] < tv < 1 - tol_t[k]:
                ts[ii[k]].append(tv)
            if tol_u[k] < uv < 1 - tol_u[k]:
                ts[jj[k]].append(uv)
        # collinear overlaps: project each endpoint onto the other segment
        col = para & (
            np.abs(qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) <= snap * np.maximum(rlen, 1.0)
        )
        for k in np.nonzero(col)[0]:
            i, j = int(ii[k]), int(jj[k])
            ri, li = p2[i] - p1[i], rlen[k]
            sj, lj = p2[j] - p1[j], slen[k]
            if li <= snap or lj <= snap:
                continue
            for q in (p1[j], p2[j]):
                tv = float(np.dot(q - p1[i], ri) / (li * li))
                if 0 < tv < 1:
                    ts[i].append(tv)
            for q in (p1[i], p2[i]):
                uv = float(np.dot(q - p1[j], sj) / (lj * lj))
                if 0 < uv < 1:
                    ts[j].append(uv)
    return ts


def _fragments(p1, p2, ts, snap):
    """Split each segment at its params -> fragment endpoint arrays +
    source segment index per fragment.  Sub-snap segments are KEPT
    here: the snap-rounding pass collapses them exactly (both endpoints
    land on one hot pixel), which preserves ring continuity — dropping
    them pre-snap would leave sub-snap gaps in the boundary."""
    f1, f2, src = [], [], []
    for i in range(len(p1)):
        seg_len = float(np.hypot(*(p2[i] - p1[i])))
        if ts[i] and seg_len > snap:
            tv = np.unique(np.clip(np.asarray(ts[i], dtype=np.float64), 0.0, 1.0))
            # drop params closer than snap (in distance) to each other/ends
            tol = snap / seg_len
            keep = [0.0]
            for v in tv:
                if v - keep[-1] > tol and v < 1 - tol:
                    keep.append(float(v))
            keep.append(1.0)
            pts = p1[i] + np.asarray(keep)[:, None] * (p2[i] - p1[i])
        else:
            pts = np.vstack([p1[i], p2[i]])
        f1.append(pts[:-1])
        f2.append(pts[1:])
        src.append(np.full(len(pts) - 1, i, np.int64))
    if not f1:
        return np.zeros((0, 2)), np.zeros((0, 2)), np.zeros(0, np.int64)
    return np.concatenate(f1), np.concatenate(f2), np.concatenate(src)


def _snap_round(f1, f2, src, snap):
    """Hot-pixel snap rounding (Hobby 1999 / JTS SnapRoundingNoder —
    public algorithm): quantize every fragment endpoint to the snap
    grid, then reroute any fragment passing within half a pixel of a
    hot pixel (an occupied grid point) THROUGH that pixel, iterating to
    a fixpoint.  Afterwards every endpoint is a grid point, sub-snap
    slivers have collapsed exactly, and no fragment passes closer than
    ~snap/2 to a node it is not incident to — which is what makes
    sub-pixel classification probes consistent."""
    g1 = np.round(f1 / snap) * snap
    g2 = np.round(f2 / snap) * snap
    for _ in range(2):  # JTS-style single hot-pixel pass + one mop-up
        live = (g1[:, 0] != g2[:, 0]) | (g1[:, 1] != g2[:, 1])
        g1, g2, src = g1[live], g2[live], src[live]
        if len(g1) == 0:
            return g1, g2, src
        # hot pixels via integer grid keys (endpoints are exact snap
        # multiples); np.unique(axis=0) on float rows is ~10x slower
        cc = np.concatenate([g1, g2])
        ikx = np.round(cc[:, 0] / snap).astype(np.int64)
        iky = np.round(cc[:, 1] / snap).astype(np.int64)
        kx0, ky0 = ikx.min(), iky.min()
        span = int(iky.max() - ky0) + 1
        ukey = np.unique((ikx - kx0) * span + (iky - ky0))
        hot = np.column_stack(
            [(ukey // span + kx0) * snap, (ukey % span + ky0) * snap]
        )
        # candidate (fragment, pixel): pixel inside fragment bbox+pad
        pad = 0.5 * snap
        fminx = np.minimum(g1[:, 0], g2[:, 0]) - pad
        fmaxx = np.maximum(g1[:, 0], g2[:, 0]) + pad
        fminy = np.minimum(g1[:, 1], g2[:, 1]) - pad
        fmaxy = np.maximum(g1[:, 1], g2[:, 1]) + pad
        F, H = len(g1), len(hot)
        # candidate (fragment, pixel) pairs via a coarse-grid supercover
        # join: walk each fragment through cells of size ~extent/sqrt(H)
        # (expanded by half a pixel), sort-merge against the pixels'
        # cell keys.  Near-linear even for long fragments — an x-range
        # or bbox prefilter degenerates to F x H on jagged inputs.
        ex0 = min(float(g1[:, 0].min()), float(g2[:, 0].min()))
        ey0 = min(float(g1[:, 1].min()), float(g2[:, 1].min()))
        ex1 = max(float(g1[:, 0].max()), float(g2[:, 0].max()))
        ey1 = max(float(g1[:, 1].max()), float(g2[:, 1].max()))
        # fine cells: supercover visits stay ~total_length/cell while
        # per-cell pixel counts stay O(1) even when pixels cluster
        # along dense offset curves (a sqrt(H) grid puts thousands of
        # clustered pixels in every touched cell on jagged inputs)
        cell = max((ex1 - ex0 + ey1 - ey0) / 8192.0, 4.0 * snap)
        hcx = np.floor((hot[:, 0] - ex0) / cell).astype(np.int64)
        hcy = np.floor((hot[:, 1] - ey0) / cell).astype(np.int64)
        ncy = int(hcy.max()) + 2
        hkey = hcx * ncy + hcy
        horder = np.argsort(hkey, kind="stable")
        hkey_s = hkey[horder]
        # explode fragments over their x-cell spans
        fcx0 = np.floor((fminx - ex0) / cell).astype(np.int64)
        fcx1 = np.floor((fmaxx - ex0) / cell).astype(np.int64)
        nxc = fcx1 - fcx0 + 1
        fid1 = np.repeat(np.arange(F, dtype=np.int64), nxc)
        cx = np.repeat(fcx0, nxc) + _ranges_local(nxc)
        # y-range of each fragment within that x slab (clip the segment
        # to the slab, then pad by half a pixel)
        ax, ay = g1[fid1, 0], g1[fid1, 1]
        bx, by = g2[fid1, 0], g2[fid1, 1]
        sx0 = ex0 + cx * cell
        sx1 = sx0 + cell
        with np.errstate(divide="ignore", invalid="ignore"):
            t0c = np.clip((sx0 - ax) / (bx - ax), 0.0, 1.0)
            t1c = np.clip((sx1 - ax) / (bx - ax), 0.0, 1.0)
        vert = bx == ax
        t0c = np.where(vert, 0.0, t0c)
        t1c = np.where(vert, 1.0, t1c)
        ya = ay + t0c * (by - ay)
        yb = ay + t1c * (by - ay)
        ylo = np.minimum(ya, yb) - pad
        yhi = np.maximum(ya, yb) + pad
        fcy0 = np.floor((ylo - ey0) / cell).astype(np.int64)
        fcy1 = np.floor((yhi - ey0) / cell).astype(np.int64)
        nyc = np.maximum(fcy1 - fcy0 + 1, 0)
        fid2 = np.repeat(fid1, nyc)
        cx2 = np.repeat(cx, nyc)
        cy2 = np.repeat(fcy0, nyc) + _ranges_local(nyc)
        ckey = cx2 * ncy + cy2
        plo = np.searchsorted(hkey_s, ckey, side="left")
        phi = np.searchsorted(hkey_s, ckey, side="right")
        pcnt = phi - plo
        fi = np.repeat(fid2, pcnt)
        hi = horder[np.repeat(plo, pcnt) + _ranges_local(pcnt)]
        if not len(fi):
            break
        a, b, q = g1[fi], g2[fi], hot[hi]
        d = b - a
        ll = d[:, 0] ** 2 + d[:, 1] ** 2
        t = ((q[:, 0] - a[:, 0]) * d[:, 0] + (q[:, 1] - a[:, 1]) * d[:, 1]) / ll
        interior = (t > 0.0) & (t < 1.0)
        px = a[:, 0] + t * d[:, 0]
        py = a[:, 1] + t * d[:, 1]
        dist2 = (px - q[:, 0]) ** 2 + (py - q[:, 1]) ** 2
        not_end = ((q[:, 0] != a[:, 0]) | (q[:, 1] != a[:, 1])) & (
            (q[:, 0] != b[:, 0]) | (q[:, 1] != b[:, 1])
        )
        ok = interior & not_end & (dist2 < pad * pad)
        if not ok.any():
            break
        # vectorized chain rebuild: per-fragment cuts sorted by t, then
        # points [g1_i, q_i1..q_ik, g2_i] laid out contiguously; the
        # next round's zero-length mask drops duplicate-cut segments
        cf, ct, cq = fi[ok], t[ok], q[ok]
        order = np.lexsort((ct, cf))
        cf, cq = cf[order], cq[order]
        ccnt = np.bincount(cf, minlength=F)
        has = ccnt > 0
        cut_frags = np.nonzero(has)[0]
        npts = ccnt[has] + 2
        offs = np.r_[0, np.cumsum(npts)]
        pts = np.empty((offs[-1], 2))
        pts[offs[:-1]] = g1[cut_frags]
        pts[offs[1:] - 1] = g2[cut_frags]
        group_of_cut = np.searchsorted(cut_frags, cf)
        rank = _ranges_local(ccnt[has])
        pts[offs[group_of_cut] + 1 + rank] = cq
        seg_mask = np.ones(offs[-1], bool)
        seg_mask[offs[1:] - 1] = False  # last point of each chain starts no segment
        c1 = pts[seg_mask]
        c2 = pts[np.r_[False, seg_mask[:-1]]]
        csrc = np.repeat(src[cut_frags], npts - 1)
        g1 = np.concatenate([g1[~has], c1])
        g2 = np.concatenate([g2[~has], c2])
        src = np.concatenate([src[~has], csrc])
    live = (g1[:, 0] != g2[:, 0]) | (g1[:, 1] != g2[:, 1])
    return g1[live], g2[live], src[live]


# ---------------------------------------------------------------------------
# classification + stitching
# ---------------------------------------------------------------------------

_OPS = {
    "union": lambda a, b: a | b,
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
    "xor": lambda a, b: a ^ b,
}


def overlay(region_a, region_b, op: str, evenodd_a: bool = False):
    """Boolean overlay of two regions.

    region_a / region_b: list of pieces; each piece a list of closed
    rings (shell + holes, nonzero winding — or crossing parity for
    region A when ``evenodd_a``).  op: union | intersection |
    difference | xor.  Returns list of (shell_ccw, [holes_cw...]).
    """
    combine = _OPS[op]
    p1, p2, seg_piece, piece_region = _collect_segments([region_a, region_b])
    if len(p1) == 0:
        return []
    allc = np.concatenate([p1, p2])
    # tolerances scale with the EXTENT (feature sizes), floored by the
    # float64 resolution at the coordinate MAGNITUDE (large offsets like
    # UTM-style coords must not inflate snap past feature size)
    extent = max(
        1e-30,
        float(allc[:, 0].max() - allc[:, 0].min()),
        float(allc[:, 1].max() - allc[:, 1].min()),
    )
    maxabs = float(np.abs(allc).max())
    snap = max(1e-9 * extent, 1e-12 * maxabs)

    ts = _node(p1, p2, snap)
    f1, f2, fsrc = _fragments(p1, p2, ts, snap)
    f1, f2, fsrc = _snap_round(f1, f2, fsrc, snap)
    if len(f1) == 0:
        return []

    # membership pieces from the SNAPPED per-piece fragment soup: the
    # boundary probed is bit-identical to the fragments being kept, so
    # classification and stitching can never disagree below snap scale
    fpiece = seg_piece[fsrc]
    pieces_a, pieces_b = [], []
    for pi, ri in enumerate(piece_region):
        m = fpiece == pi
        if not m.any():
            continue
        (pieces_a if ri == 0 else pieces_b).append(_Piece.from_segments(f1[m], f2[m]))

    # probes sit a third of a pixel off each fragment midpoint: after
    # hot-pixel rounding no OTHER boundary passes nearer than ~snap/2
    # to a fragment interior, and the winding tests are exact, so a
    # sub-pixel delta classifies correctly where the old extent-scaled
    # 1e-7 delta could swallow legitimate thin features
    delta = snap / 3.0
    mx = (f1[:, 0] + f2[:, 0]) / 2
    my = (f1[:, 1] + f2[:, 1]) / 2
    dx = f2[:, 0] - f1[:, 0]
    dy = f2[:, 1] - f1[:, 1]
    ln = np.hypot(dx, dy)
    nx = -dy / ln
    ny = dx / ln
    lx, ly = mx + delta * nx, my + delta * ny  # left probes
    rx, ry = mx - delta * nx, my - delta * ny  # right probes

    la = _region_membership(lx, ly, pieces_a, delta, evenodd=evenodd_a)
    lb = _region_membership(lx, ly, pieces_b, delta)
    ra = _region_membership(rx, ry, pieces_a, delta, evenodd=evenodd_a)
    rb = _region_membership(rx, ry, pieces_b, delta)
    lin = combine(la, lb)
    rin = combine(ra, rb)
    keep = lin != rin
    if not keep.any():
        return []
    k1, k2 = f1[keep], f2[keep]
    flip = rin[keep]  # region on the right -> flip so it sits on the left
    k1f = np.where(flip[:, None], k2, k1)
    k2f = np.where(flip[:, None], k1, k2)
    rings = _stitch(k1f, k2f, snap)
    return _assemble(rings)


def _stitch(f1, f2, snap):
    """Stitch region-left-oriented fragments into closed rings with the
    leftmost-turn (first-clockwise-from-reverse) rule at junctions.
    Coordinates arrive snap-rounded (exact grid multiples), so node
    identity is the exact grid index — no neighbor-cell merging, which
    would wrongly fuse ADJACENT grid points one pixel apart."""
    pts = np.concatenate([f1, f2])
    kx = np.round(pts[:, 0] / snap).astype(np.int64)
    ky = np.round(pts[:, 1] / snap).astype(np.int64)
    ka = list(zip(kx.tolist(), ky.tolist()))
    # dedup identical fragments (stacked shared boundaries)
    seen = set()
    frags = []
    for i in range(len(f1)):
        a, b = ka[i], ka[len(f1) + i]
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        frags.append((a, b, f1[i], f2[i]))

    out_edges: dict = {}
    for idx, (a, b, pa, pb) in enumerate(frags):
        out_edges.setdefault(a, []).append(idx)

    used = [False] * len(frags)
    rings = []
    for start in range(len(frags)):
        if used[start]:
            continue
        path = [start]
        used[start] = True
        a0 = frags[start][0]
        cur = frags[start]
        guard = 0
        closed = False
        while guard < len(frags) + 1:
            guard += 1
            node = cur[1]
            if node == a0:
                closed = True
                break
            cands = [i for i in out_edges.get(node, []) if not used[i]]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # first clockwise from the reverse of the incoming direction
                inx, iny = cur[3][0] - cur[2][0], cur[3][1] - cur[2][1]
                rev = np.arctan2(-iny, -inx)
                best, best_ang = None, None
                for i in cands:
                    ox, oy = frags[i][3][0] - frags[i][2][0], frags[i][3][1] - frags[i][2][1]
                    ang = (rev - np.arctan2(oy, ox)) % (2 * np.pi)
                    if ang < 1e-12:
                        ang = 2 * np.pi  # exact U-turn only as a last resort
                    if best_ang is None or ang < best_ang:
                        best, best_ang = i, ang
                nxt = best
            used[nxt] = True
            path.append(nxt)
            cur = frags[nxt]
        if closed and len(path) >= 3:
            pts = np.vstack([frags[i][2] for i in path] + [frags[path[0]][2]])
            rings.append(pts)
        # non-closed walks are discarded (dangling slivers)
    return rings


def _signed_area(ring) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y2 - x2 * y) / 2.0)


def _assemble(rings):
    """Shells (area>0) + hole assignment (containing shell w/ min area)."""
    shells, holes = [], []
    for r in rings:
        a = _signed_area(r)
        if a > 0:
            shells.append((r, a))
        elif a < 0:
            holes.append((r, a))
    if not shells:
        return []
    shell_pieces = [_Piece([s]) for s, _ in shells]
    out = [(s, []) for s, _ in shells]
    for h, _ in holes:
        hx, hy = np.asarray([h[0, 0]]), np.asarray([h[0, 1]])
        best, best_area = None, None
        for si, pc in enumerate(shell_pieces):
            x0, y0, x1, y1 = pc.bbox
            if not (x0 <= hx[0] <= x1 and y0 <= hy[0] <= y1):
                continue
            if pc.positions(hx, hy)[0] != OUTSIDE:
                if best_area is None or shells[si][1] < best_area:
                    best, best_area = si, shells[si][1]
        if best is not None:
            out[best][1].append(h)
    return out


# ---------------------------------------------------------------------------
# public conveniences
# ---------------------------------------------------------------------------


def unary_union(pieces):
    """Dissolve any number of (possibly overlapping / touching) pieces
    into a clean MultiPolygon: overlay(A, EMPTY, union) — region A's
    membership is already 'inside any piece'."""
    return overlay(pieces, [], "union")


def make_valid(rings) -> list:
    """MakeValid (repair_polygon/mod.rs — the Ledoux et al. 2014
    prepair algorithm's SEMANTICS): node every input ring against every
    other and keep exactly the area of odd crossing parity.  The
    reference realizes this with a constrained Delaunay triangulation +
    odd-even flood fill; the overlay engine realizes the same fill rule
    directly by classifying noded boundary fragments, so bowties split,
    dangling edges cancel, duplicated rings annihilate and nested
    shells become annuli — the module's documented repair cases.

    rings: ALL rings of the (multi)polygon, any orientation.
    Returns a valid MultiPolygon [(shell_ccw, [holes_cw...])]."""
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return []
    return overlay([rings], [], "union", evenodd_a=True)


def mp_area(polys) -> float:
    """Unsigned area of an overlay result (shells minus holes)."""
    total = 0.0
    for shell, hs in polys:
        total += _signed_area(shell)
        for h in hs:
            total += _signed_area(h)  # holes are CW -> negative
    return total


def polys_to_region(polys):
    """Overlay result -> region (list of pieces) for chaining ops."""
    return [[shell, *hs] for shell, hs in polys]


def xor_area_ratio(polys_a, polys_b) -> float:
    """The reference's buffer conformance metric: area(A xor B) /
    area(B) (jts-test-runner/src/lib.rs:52-96)."""
    xor = overlay(polys_to_region(polys_a), polys_to_region(polys_b), "xor")
    denom = mp_area(polys_b)
    if denom == 0:
        return 0.0 if mp_area(polys_a) == 0 else float("inf")
    return abs(mp_area(xor)) / denom


def stitch_triangles(tris) -> list:
    """StitchTriangles (geo/src/algorithm/stitch.rs, 'stitch together a
    triangle soup that shares edges'): dissolve the triangles into the
    covered MultiPolygon.  Union semantics via the overlay engine —
    shared-edge adjacency is exactly the degenerate case the fragment
    classifier handles (stacked boundaries cancel)."""
    pieces = []
    for t in tris:
        t = np.asarray(t, dtype=np.float64)
        if not np.array_equal(t[0], t[-1]):
            t = np.vstack([t, t[:1]])
        pieces.append([t])
    return unary_union(pieces)
