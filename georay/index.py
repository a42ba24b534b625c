"""Per-worker prepared polygon index (the actor-pool constructor state).

Ray-Data analogue of the reference's "build once, query many"
structures (`indexed/interval_tree_multipolygon.rs:91-141`,
`indexed/prepared_geometry.rs:30-38`): a uniform grid over cell ids
mapping cell -> candidate polygon list (CSR layout), built once per
actor in ``__init__`` from the broadcast polygon layer, then queried
per batch with pure-numpy lookups.

A uniform grid (rather than an R-tree) keeps candidate lookup fully
vectorized: point -> cell key is arithmetic, key -> candidate range is
one searchsorted, and the expansion to (point, polygon) pairs is
repeat/take.  Candidate sets are then refined by exact bbox check and
the winding-number kernel.
"""

from __future__ import annotations

import numpy as np

from . import cells
from .geom import PolygonLayer, _ranges
from .kernels import pip


def _bbox_cells_xy(minx: float, miny: float, maxx: float, maxy: float, res: int):
    """(ix, iy) arrays of every grid cell intersecting the bbox."""
    n = 1 << res
    ix0 = max(0, min(n - 1, int(np.floor((minx + 180.0) / 360.0 * n))))
    ix1 = max(0, min(n - 1, int(np.floor((maxx + 180.0) / 360.0 * n))))
    iy0 = max(0, min(n - 1, int(np.floor((miny + 90.0) / 180.0 * n))))
    iy1 = max(0, min(n - 1, int(np.floor((maxy + 90.0) / 180.0 * n))))
    gx, gy = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64), np.arange(iy0, iy1 + 1, dtype=np.int64)
    )
    return gx.ravel(), gy.ravel()


class GridIndex:
    """Prepared grid over the polygon layer with per-cell classification.

    Build (once per worker): every (cell, polygon) entry in a polygon's
    bbox is classified as

      INTERIOR  — the cell rect lies fully inside the polygon: a point
                  in this cell matches WITHOUT any winding test
      BOUNDARY  — some ring segment's bbox touches the cell: exact
                  winding-number refinement required
      (outside) — cells provably outside are not stored at all

    This is the vectorized analogue of the reference's prepared
    structures (interval_tree_multipolygon.rs, prepared_geometry.rs):
    the expensive exact kernel runs only on the boundary sliver, which
    shrinks quadratically as resolution grows while index size grows
    ~linearly with perimeter.  ``extra_res`` levels beyond the auto
    resolution trade build time/memory for a thinner sliver.
    """

    def __init__(self, layer: PolygonLayer, res: int | None = None, extra_res: int | None = None):
        import os as _os

        if extra_res is None:
            extra_res = int(_os.environ.get("GEORAY_INDEX_EXTRA_RES", "3"))
        self.layer = layer
        if res is None:
            # cell edge ~ median bbox size so candidate lists stay short,
            # then extra_res levels finer to thin the boundary sliver
            w = np.maximum(layer.bbox[:, 2] - layer.bbox[:, 0], 1e-9)
            h = np.maximum(layer.bbox[:, 3] - layer.bbox[:, 1], 1e-9)
            med = float(np.median(np.maximum(w, h)))
            res = int(np.clip(np.round(np.log2(360.0 / max(med, 1e-9))) + extra_res, 3, 18))
        self.res = res
        n = 1 << res
        cw, ch = 360.0 / n, 180.0 / n

        keys_list: list[np.ndarray] = []
        polys_list: list[np.ndarray] = []
        sure_list: list[np.ndarray] = []
        centers_x: list[np.ndarray] = []
        centers_y: list[np.ndarray] = []
        x1, y1, x2, y2, seg_ring = layer.segments()
        seg_poly = layer.ring_poly[seg_ring]
        sxmin = np.minimum(x1, x2)
        sxmax = np.maximum(x1, x2)
        symin = np.minimum(y1, y2)
        symax = np.maximum(y1, y2)
        for p in range(layer.num_polys):
            minx, miny, maxx, maxy = layer.bbox[p]
            ix, iy = _bbox_cells_xy(minx, miny, maxx, maxy, res)
            cc = (ix.astype(np.uint64) << np.uint64(32)) | iy.astype(np.uint64)
            cx0 = ix * cw - 180.0
            cy0 = iy * ch - 90.0
            # boundary cells: any segment bbox overlaps the cell rect
            sm = seg_poly == p
            sx0, sx1_, sy0, sy1_ = sxmin[sm], sxmax[sm], symin[sm], symax[sm]
            # vectorized (cells x segments) overlap on the poly's own segments
            ov = (
                (cx0[:, None] <= sx1_[None, :])
                & (cx0[:, None] + cw >= sx0[None, :])
                & (cy0[:, None] <= sy1_[None, :])
                & (cy0[:, None] + ch >= sy0[None, :])
            ).any(axis=1)
            keys_list.append(cc)
            polys_list.append(np.full(len(cc), p, dtype=np.int64))
            sure_list.append(~ov)  # candidate "sure" — refined below by center test
            centers_x.append(cx0 + cw / 2.0)
            centers_y.append(cy0 + ch / 2.0)

        keys = np.concatenate(keys_list) if keys_list else np.empty(0, np.uint64)
        polys = np.concatenate(polys_list) if polys_list else np.empty(0, np.int64)
        sure = np.concatenate(sure_list) if sure_list else np.empty(0, bool)
        cx = np.concatenate(centers_x) if centers_x else np.empty(0)
        cy = np.concatenate(centers_y) if centers_y else np.empty(0)

        # cells untouched by any segment are uniformly in or out: decide
        # by their center, drop the outside ones entirely
        if sure.any():
            idx = np.nonzero(sure)[0]
            pos = pip.classify(
                np.column_stack([cx[idx], cy[idx]]),
                layer,
                np.arange(len(idx), dtype=np.int64),
                polys[idx],
            )
            inside = pos == pip.INSIDE
            drop = idx[~inside]
            keep_mask = np.ones(len(keys), dtype=bool)
            keep_mask[drop] = False
            keys, polys, sure = keys[keep_mask], polys[keep_mask], sure[keep_mask]

        order = np.argsort(keys, kind="stable")
        keys, polys, sure = keys[order], polys[order], sure[order]
        self.uniq_keys, starts = np.unique(keys, return_index=True)
        self.offsets = np.append(starts, len(keys)).astype(np.int64)
        self.entries = polys
        self.entry_sure = sure
        # dense O(1) (ix, iy) -> entry-range lookup when the grid is small
        # enough (saves a 2M-row searchsorted per batch); falls back to
        # binary search at high resolution
        self._lut = None
        if n * n <= (1 << 24):
            lut_start = np.zeros(n * n, dtype=np.int32)
            lut_cnt = np.zeros(n * n, dtype=np.int32)
            flat = (self.uniq_keys >> np.uint64(32)).astype(np.int64) * n + (
                self.uniq_keys & np.uint64(0xFFFFFFFF)
            ).astype(np.int64)
            lut_start[flat] = self.offsets[:-1].astype(np.int32)
            lut_cnt[flat] = (self.offsets[1:] - self.offsets[:-1]).astype(np.int32)
            self._lut = (lut_start, lut_cnt)

    def candidates(
        self, lon: np.ndarray, lat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(point_idx, poly_idx, sure) candidate pairs.

        ``sure`` rows are definite matches (interior cells — no exact
        test needed); the rest are boundary-cell pairs for the winding
        kernel.  Outside-cell points never appear at all.
        """
        if len(self.uniq_keys) == 0:
            e = np.empty(0, np.int64)
            return e, e, np.empty(0, bool)
        ix, iy = cells.cell_xy(lon, lat, self.res)
        if self._lut is not None:
            lut_start, lut_cnt = self._lut
            flat = ix * (1 << self.res) + iy
            counts = lut_cnt[flat].astype(np.int64)
            hit = counts > 0
            pt_idx_all = np.nonzero(hit)[0]
            counts = counts[hit]
            starts = lut_start[flat[hit]].astype(np.int64)
        else:
            key = (ix.astype(np.uint64) << np.uint64(32)) | iy.astype(np.uint64)
            pos = np.searchsorted(self.uniq_keys, key)
            pos = np.minimum(pos, len(self.uniq_keys) - 1)
            found = self.uniq_keys[pos] == key
            pt_idx_all = np.nonzero(found)[0]
            cell_pos = pos[found]
            counts = self.offsets[cell_pos + 1] - self.offsets[cell_pos]
            starts = self.offsets[cell_pos]
        pair_pt = np.repeat(pt_idx_all, counts)
        entry_idx = np.repeat(starts, counts) + _ranges(counts)
        pair_poly = self.entries[entry_idx]
        sure = self.entry_sure[entry_idx]
        return pair_pt, pair_poly, sure
