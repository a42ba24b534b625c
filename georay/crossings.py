"""Batched strict-crossing tests over candidate entity pairs.

r3 shipped the edge-crossing refinement of the line/polygon joins as a
per-pair Python loop with a vectorized block inside (VERDICT r3
"What's wrong #3"): fine while bbox + vertex-containment filters keep
survivors rare, but a parcels-style layer (many touching bboxes, few
vertex containments) degrades to one Python call per pair.  This module
runs the 4-sign orient test over the CONCATENATED (segment x segment)
products of every candidate pair at once, keyed by pair id:

  1. each side becomes a "segment soup" — flat (x1, y1, x2, y2) arrays
     plus per-entity segment offsets (entities = lines or polygons;
     polygon soups concatenate all ring edges in polygon order);
  2. per pair t the product count is na[t] * nb[t]; products explode
     via repeat/ranges arithmetic (no Python per pair);
  3. strict crossings reduce to any-per-pair with logical_or.reduceat;
  4. pairs chunk so the exploded product stays bounded (~4M rows)
     regardless of batch size.
"""

from __future__ import annotations

import numpy as np

from .geom import PolygonLayer, _ranges

_CHUNK = 4_000_000


def poly_soup(pl: PolygonLayer) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x1, y1, x2, y2, offsets) — every ring edge grouped by polygon
    (rings are stored in polygon order, so segments() already is)."""
    x1, y1, x2, y2, seg_ring = pl.segments()
    n_seg_ring = pl.ring_offsets[1:] - pl.ring_offsets[:-1] - 1
    # edges per polygon = sum of its rings' edge counts
    csum = np.zeros(pl.num_rings + 1, np.int64)
    np.cumsum(n_seg_ring, out=csum[1:])
    offsets = csum[pl.poly_ring_offsets]
    return x1, y1, x2, y2, offsets


def line_soup(ll) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x1, y1, x2, y2, offsets) — every polyline segment grouped by
    line."""
    nv = ll.offsets[1:] - ll.offsets[:-1]
    nseg = np.maximum(nv - 1, 0)
    idx = np.repeat(ll.offsets[:-1], nseg) + _ranges(nseg)
    offsets = np.zeros(len(nseg) + 1, np.int64)
    np.cumsum(nseg, out=offsets[1:])
    return (
        ll.coords[idx, 0], ll.coords[idx, 1],
        ll.coords[idx + 1, 0], ll.coords[idx + 1, 1],
        offsets,
    )


def pairs_any_cross(
    a_soup: tuple, b_soup: tuple, ia: np.ndarray, ib: np.ndarray,
    chunk: int = _CHUNK,
) -> np.ndarray:
    """any-strict-crossing per candidate pair (ia[t], ib[t]), fully
    vectorized with bounded memory."""
    ax1, ay1, ax2, ay2, aoffs = a_soup
    bx1, by1, bx2, by2, boffs = b_soup
    m = len(ia)
    out = np.zeros(m, bool)
    if m == 0:
        return out
    na = aoffs[ia + 1] - aoffs[ia]
    nb = boffs[ib + 1] - boffs[ib]
    cnt = na * nb
    ccum = np.zeros(m + 1, np.int64)
    np.cumsum(cnt, out=ccum[1:])
    # chunk boundaries on the product axis
    lo = 0
    while lo < m:
        hi = int(np.searchsorted(ccum, ccum[lo] + chunk, side="left"))
        hi = max(hi, lo + 1)
        sl = slice(lo, hi)
        c = cnt[sl]
        total = int(c.sum())
        if total:
            w = _ranges(c)
            nbr = np.repeat(nb[sl], c)
            si = np.repeat(aoffs[ia[sl]], c) + w // nbr
            ei = np.repeat(boffs[ib[sl]], c) + w % nbr
            adx = ax2[si] - ax1[si]
            ady = ay2[si] - ay1[si]
            d1 = adx * (by1[ei] - ay1[si]) - ady * (bx1[ei] - ax1[si])
            d2 = adx * (by2[ei] - ay1[si]) - ady * (bx2[ei] - ax1[si])
            bdx = bx2[ei] - bx1[ei]
            bdy = by2[ei] - by1[ei]
            d3 = bdx * (ay1[si] - by1[ei]) - bdy * (ax1[si] - bx1[ei])
            d4 = bdx * (ay2[si] - by1[ei]) - bdy * (ax2[si] - bx1[ei])
            cross = (d1 * d2 < 0) & (d3 * d4 < 0)
            nz = np.nonzero(c)[0]
            starts = (ccum[sl][nz] - ccum[lo]).astype(np.int64)
            out[lo + nz] = np.logical_or.reduceat(cross, starts)
        lo = hi
    return out
