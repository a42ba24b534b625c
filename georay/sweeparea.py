"""Exact union area WITHOUT constructing the union.

``unary_union`` (dissolve.py) materializes the dissolved geometry —
its area inherits the overlay engine's snap-grid quantization.  This
module measures |union| EXACTLY as a distributed vertical-strip sweep:

  1. every polygon's segments replicate to each grid cell the
     polygon's bbox overlaps (the same fan-out shape as dissolve);
  2. per cell, breakpoints = cell edges + vertex x's + pairwise
     segment-crossing x's inside the cell; between consecutive
     breakpoints the arrangement is constant, so the covered-y measure
     at the strip midpoint x (crossing PARITY per polygon — equal to
     nonzero winding for simple shell+hole rings, the same assumption
     the PiP oracle documents) times the strip width integrates the
     area exactly;
  3. per-cell partial areas sum (cells tile the plane, so the
     decomposition is exact).

Scale: strips stay CELL-LOCAL — no global breakpoint list — so the
sweep parallelizes like dissolve; per-cell cost is
O((V_c + X_c) * S_c) vectorized numpy.  The SQL oracle runs the same
sweep globally (one strip list, window functions); extra breakpoints
never change the integral, so cell-decomposed and global sweeps agree
to fp noise.

Cross-check: |union_area_sweep - area(dissolve(...))| is bounded by
the overlay's snap quantization (~1e-9 x extent x boundary length) —
pytest-gated, a strong independent check on the overlay engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import geom, texthash


def _cell_sweep_area(
    x1, y1, x2, y2, poly, cx0: float, cy0: float, cx1: float, cy1: float
) -> float:
    """Exact |union ∩ cell| from a segment soup (arrays) with
    per-segment polygon indices.  Parity membership per polygon."""
    n = len(x1)
    if n == 0:
        return 0.0
    xlo = np.minimum(x1, x2)
    xhi = np.maximum(x1, x2)
    # pairwise proper crossings (bbox-prefiltered) -> crossing x's
    bx = [cx0, cx1]
    order = np.argsort(xlo, kind="stable")
    xs_parts = [np.asarray(bx), x1, x2]
    # chunked all-pairs bbox filter (cells are small; same shape as sweep.py)
    ylo = np.minimum(y1, y2)
    yhi = np.maximum(y1, y2)
    hit_i, hit_j = [], []
    chunk = max(1, 4_000_000 // max(n, 1))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        m = (
            (xlo[s:e, None] <= xhi[None, :])
            & (xhi[s:e, None] >= xlo[None, :])
            & (ylo[s:e, None] <= yhi[None, :])
            & (yhi[s:e, None] >= ylo[None, :])
        )
        ii, jj = np.nonzero(m)
        ii = ii + s
        keep = ii < jj
        hit_i.append(ii[keep])
        hit_j.append(jj[keep])
    ii = np.concatenate(hit_i) if hit_i else np.zeros(0, np.int64)
    jj = np.concatenate(hit_j) if hit_j else np.zeros(0, np.int64)
    if len(ii):
        adx = x2[ii] - x1[ii]
        ady = y2[ii] - y1[ii]
        d1 = adx * (y1[jj] - y1[ii]) - ady * (x1[jj] - x1[ii])
        d2 = adx * (y2[jj] - y1[ii]) - ady * (x2[jj] - x1[ii])
        bdx = x2[jj] - x1[jj]
        bdy = y2[jj] - y1[jj]
        d3 = bdx * (y1[ii] - y1[jj]) - bdy * (x1[ii] - x1[jj])
        d4 = bdx * (y2[ii] - y1[jj]) - bdy * (x2[ii] - x1[jj])
        proper = (d1 * d2 < 0) & (d3 * d4 < 0)
        if proper.any():
            t = d3[proper] / (d3[proper] - d4[proper])
            xs_parts.append(x1[ii[proper]] + t * (x2[ii[proper]] - x1[ii[proper]]))
    # gaps below are clamped to the cell's y-range, which kinks the
    # per-strip coverage function wherever a segment crosses y=cy0 or
    # y=cy1 — those x's MUST be breakpoints or the midpoint rule is no
    # longer exact (ADVICE r3 high: clamp-kink inside a strip)
    dy = y2 - y1
    for yb in (cy0, cy1):
        crosses = (y1 - yb) * (y2 - yb) < 0.0
        if crosses.any():
            xs_parts.append(
                x1[crosses]
                + (yb - y1[crosses]) * (x2[crosses] - x1[crosses]) / dy[crosses]
            )
    xs = np.concatenate(xs_parts)
    xs = np.unique(xs[(xs >= cx0) & (xs <= cx1)])
    if len(xs) < 2:
        return 0.0
    widths = np.diff(xs)
    mids = 0.5 * (xs[:-1] + xs[1:])
    # explode (segment, strip) for strips whose mid the segment spans
    # (half-open [xlo, xhi) so a vertex-at-mid toggles exactly once)
    s_lo = np.searchsorted(mids, xlo, side="left")
    s_hi = np.searchsorted(mids, xhi, side="left")
    cnt = np.maximum(s_hi - s_lo, 0)
    total = int(cnt.sum())
    if total == 0:
        return 0.0
    seg_of = np.repeat(np.arange(n), cnt)
    starts = np.repeat(np.cumsum(cnt) - cnt, cnt)
    strip = np.repeat(s_lo, cnt) + (np.arange(total) - starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        yev = y1[seg_of] + (mids[strip] - x1[seg_of]) * (y2[seg_of] - y1[seg_of]) / (
            x2[seg_of] - x1[seg_of]
        )
    pev = poly[seg_of]
    # occurrence parity per (strip, poly) ordered by y -> toggle deltas
    o1 = np.lexsort((yev, pev, strip))
    st_s, pv_s, y_s = strip[o1], pev[o1], yev[o1]
    new_grp = np.r_[True, (st_s[1:] != st_s[:-1]) | (pv_s[1:] != pv_s[:-1])]
    starts1 = np.nonzero(new_grp)[0]
    occ = np.arange(total) - np.repeat(starts1, np.diff(np.r_[starts1, total]))
    delta = np.where(occ % 2 == 0, 1, -1)
    # coverage: re-sort by (strip, y), segmented running sum per strip,
    # gaps clamped to the cell's y-range
    o2 = np.lexsort((y_s, st_s))
    st2, y2v, d2v = st_s[o2], y_s[o2], delta[o2]
    cum = np.cumsum(d2v)
    strip_new = np.r_[True, st2[1:] != st2[:-1]]
    sidx = np.nonzero(strip_new)[0]
    offs = np.zeros(len(sidx))
    offs[1:] = cum[sidx[1:] - 1]
    cum = cum - np.repeat(offs, np.diff(np.r_[sidx, total]))
    last = np.r_[st2[1:] != st2[:-1], True]
    gap = np.where(
        last, 0.0,
        np.minimum(np.r_[y2v[1:], 0.0], cy1) - np.maximum(y2v, cy0),
    )
    gap = np.maximum(gap, 0.0)
    covered = np.where(cum > 0, gap, 0.0)
    return float(np.sum(widths[st2] * covered))


def union_area_sweep(polys_ds, cell_deg: float = 45.0):
    """polys_ds: Dataset (polygon_id, rings, bbox cols) -> 1-row
    Dataset with the EXACT union area (no overlay, no snap grid)."""
    import ray.data as rd

    nx = max(1, int(round(360.0 / cell_deg)))
    ny = max(1, int(round(180.0 / cell_deg)))

    def rep(t: pa.Table) -> pa.Table:
        layer = geom.PolygonLayer.from_arrow(t)
        sx1, sy1, sx2, sy2, seg_poly = layer.segments()
        # GLOBALLY unique polygon keys: 64-bit string hash of the id
        # (ADVICE r3: suffix parsing limited ids to '-<int>' schemes)
        pkeys = texthash.hash_strings(
            pa.array([str(i) for i in layer.poly_ids])
        ).astype(np.int64)
        rows = {"x1": [], "y1": [], "x2": [], "y2": [], "poly": [], "cell": []}
        # polygon -> ring -> segment ownership: segments() returns per-
        # segment arrays + the owning ring; map ring -> polygon
        for p in range(layer.num_polys):
            ix0 = int(np.clip((layer.bbox[p, 0] + 180.0) // cell_deg, 0, nx - 1))
            ix1 = int(np.clip((layer.bbox[p, 2] + 180.0) // cell_deg, 0, nx - 1))
            iy0 = int(np.clip((layer.bbox[p, 1] + 90.0) // cell_deg, 0, ny - 1))
            iy1 = int(np.clip((layer.bbox[p, 3] + 90.0) // cell_deg, 0, ny - 1))
            rlo, rhi = layer.poly_ring_offsets[p], layer.poly_ring_offsets[p + 1]
            m = (seg_poly >= rlo) & (seg_poly < rhi)
            pkey = int(pkeys[p])
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    rows["x1"].append(sx1[m])
                    rows["y1"].append(sy1[m])
                    rows["x2"].append(sx2[m])
                    rows["y2"].append(sy2[m])
                    rows["poly"].append(np.full(int(m.sum()), pkey, np.int64))
                    rows["cell"].append(np.full(int(m.sum()), ix * ny + iy, np.int64))
        if not rows["x1"]:
            return pa.table({k: pa.array([], pa.float64() if k in "x1 y1 x2 y2".split() else pa.int64()) for k in rows})
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    def cell_area(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        iy = cell % ny
        ix = cell // ny
        cx0 = ix * cell_deg - 180.0
        cy0 = iy * cell_deg - 90.0
        a = _cell_sweep_area(
            g.column("x1").to_numpy(zero_copy_only=False),
            g.column("y1").to_numpy(zero_copy_only=False),
            g.column("x2").to_numpy(zero_copy_only=False),
            g.column("y2").to_numpy(zero_copy_only=False),
            g.column("poly").to_numpy(zero_copy_only=False),
            cx0, cy0, cx0 + cell_deg, cy0 + cell_deg,
        )
        return pa.table({"part": pa.array([a], pa.float64())})

    parts = (
        polys_ds.map_batches(rep, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_area, batch_format="pyarrow")
    )
    total = parts.sum("part")
    return rd.from_arrow(
        pa.table({"union_area": pa.array([round(float(total), 6)], pa.float64())})
    )
