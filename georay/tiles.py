"""Raster<->vector tile assignment (rect algebra per `rect_ops.rs`).

A tile grid at resolution ``res`` splits the lon/lat extent into
``2^res x 2^res`` rectangles.  Points (images) map to exactly one tile
by floor arithmetic; polygons map to every tile their bbox intersects
(`RectOps` union/intersection semantics, rect_ops.rs:5-45).  Tile ids
are ``ty * 2^res + tx`` (int64) so the DuckDB oracle reproduces them
with two ``floor()`` calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import cells


def tile_xy(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    return cells.cell_xy(lon, lat, res)


def tile_id(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    tx, ty = tile_xy(lon, lat, res)
    return ty * (np.int64(1) << np.int64(res)) + tx


def add_tile(batch: pa.Table, res: int) -> pa.Table:
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    return batch.append_column("tile_id", pa.array(tile_id(lon, lat, res), pa.int64()))


def tiles_for_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """int64 tile ids intersecting a bbox (vector side of the tiling)."""
    cc = cells.cells_for_bbox(minx, miny, maxx, maxy, res)
    ix, iy, _ = cells.decode_xy(cc)
    return iy * (np.int64(1) << np.int64(res)) + ix
