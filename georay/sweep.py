"""All-pairs segment intersections at scale (the reference's sweep
surface, geo/src/algorithm/sweep/mod.rs:1-60 Bentley-Ottmann role).

Ray-native plan (SURVEY.md §2.1's planned cell-partitioned sweep): a
single-node sweep line cannot shard, so segments are REPLICATED to
every grid cell their bbox overlaps; each cell brute-forces its own
candidate pairs with a vectorized bbox filter + the exact orientation
predicate; a pair that crosses inside the overlap of both bboxes is
found in at least one shared cell, and the final ``groupby(a, b)``
dedups multi-cell duplicates.  Work per cell is output-sensitive
(candidates, not all pairs), and the only wide ops are the cell
shuffle of slim segment rows and the pair dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels.pip import orient2d_sign


def _cells_for_bbox(minx, miny, maxx, maxy, res: int):
    """(cell ids, row idx) replication for bbox ranges on a 2^res grid
    over [-180,180]x[-90,90]."""
    n = 1 << res
    ix0 = np.clip(((minx + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    ix1 = np.clip(((maxx + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy0 = np.clip(((miny + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    iy1 = np.clip(((maxy + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    cells, rows = [], []
    span = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    for r in np.nonzero(span > 0)[0]:
        xs = np.arange(ix0[r], ix1[r] + 1)
        ys = np.arange(iy0[r], iy1[r] + 1)
        cc = (xs[:, None] * n + ys[None, :]).ravel()
        cells.append(cc)
        rows.append(np.full(len(cc), r, np.int64))
    if not cells:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(cells), np.concatenate(rows)


def segment_intersections(segs_ds, res: int = 6):
    """segs_ds: Dataset (seg_id: string, x1, y1, x2, y2 float64).
    Returns Dataset (a, b, ix, iy): every PROPER crossing (strictly
    interior on both segments, exact-orientation tested) with a < b."""

    def replicate(t: pa.Table) -> pa.Table:
        x1 = t.column("x1").to_numpy(zero_copy_only=False)
        y1 = t.column("y1").to_numpy(zero_copy_only=False)
        x2 = t.column("x2").to_numpy(zero_copy_only=False)
        y2 = t.column("y2").to_numpy(zero_copy_only=False)
        cells, rows = _cells_for_bbox(
            np.minimum(x1, x2), np.minimum(y1, y2),
            np.maximum(x1, x2), np.maximum(y1, y2), res,
        )
        take = pa.array(rows, pa.int64())
        return pa.table(
            {
                "cell": pa.array(cells),
                "seg_id": t.column("seg_id").take(take),
                "x1": t.column("x1").take(take),
                "y1": t.column("y1").take(take),
                "x2": t.column("x2").take(take),
                "y2": t.column("y2").take(take),
            }
        )

    def cell_scan(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("seg_id").to_pylist(), dtype=object)
        x1 = g.column("x1").to_numpy(zero_copy_only=False)
        y1 = g.column("y1").to_numpy(zero_copy_only=False)
        x2 = g.column("x2").to_numpy(zero_copy_only=False)
        y2 = g.column("y2").to_numpy(zero_copy_only=False)
        m = len(ids)
        empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                          "ix": pa.array([], pa.float64()), "iy": pa.array([], pa.float64())})
        if m < 2:
            return empty
        lox, hix = np.minimum(x1, x2), np.maximum(x1, x2)
        loy, hiy = np.minimum(y1, y2), np.maximum(y1, y2)
        hit = (
            (lox[:, None] <= hix[None, :]) & (hix[:, None] >= lox[None, :])
            & (loy[:, None] <= hiy[None, :]) & (hiy[:, None] >= loy[None, :])
        )
        ii, jj = np.nonzero(np.triu(hit, 1))
        if not len(ii):
            return empty
        d1 = orient2d_sign(x1[jj], y1[jj], x2[jj], y2[jj], x1[ii], y1[ii])
        d2 = orient2d_sign(x1[jj], y1[jj], x2[jj], y2[jj], x2[ii], y2[ii])
        d3 = orient2d_sign(x1[ii], y1[ii], x2[ii], y2[ii], x1[jj], y1[jj])
        d4 = orient2d_sign(x1[ii], y1[ii], x2[ii], y2[ii], x2[jj], y2[jj])
        proper = (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0) & (d1 != d2) & (d3 != d4)
        ii, jj = ii[proper], jj[proper]
        if not len(ii):
            return empty
        rx, ry = x2[ii] - x1[ii], y2[ii] - y1[ii]
        sx, sy = x2[jj] - x1[jj], y2[jj] - y1[jj]
        qpx, qpy = x1[jj] - x1[ii], y1[jj] - y1[ii]
        denom = rx * sy - ry * sx
        tt = (qpx * sy - qpy * sx) / denom
        px = x1[ii] + tt * rx
        py = y1[ii] + tt * ry
        a_ids, b_ids = ids[ii], ids[jj]
        swap = a_ids > b_ids
        a_out = np.where(swap, b_ids, a_ids)
        b_out = np.where(swap, a_ids, b_ids)
        return pa.table(
            {
                "a": pa.array(a_out.tolist(), pa.string()),
                "b": pa.array(b_out.tolist(), pa.string()),
                "ix": pa.array(px),
                "iy": pa.array(py),
            }
        )

    pairs = (
        segs_ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_scan, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
