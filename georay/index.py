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


class GridIndex:
    def __init__(self, layer: PolygonLayer, res: int | None = None):
        self.layer = layer
        if res is None:
            # cell edge ~ median bbox size so candidate lists stay short
            w = np.maximum(layer.bbox[:, 2] - layer.bbox[:, 0], 1e-9)
            h = np.maximum(layer.bbox[:, 3] - layer.bbox[:, 1], 1e-9)
            med = float(np.median(np.maximum(w, h)))
            res = int(np.clip(np.round(np.log2(360.0 / max(med, 1e-9))), 3, 16))
        self.res = res
        keys_list = []
        polys_list = []
        for p in range(layer.num_polys):
            minx, miny, maxx, maxy = layer.bbox[p]
            cc = cells.cells_for_bbox(minx, miny, maxx, maxy, res)
            keys_list.append(cc)
            polys_list.append(np.full(len(cc), p, dtype=np.int64))
        keys = np.concatenate(keys_list) if keys_list else np.empty(0, np.uint64)
        polys = np.concatenate(polys_list) if polys_list else np.empty(0, np.int64)
        order = np.argsort(keys, kind="stable")
        keys, polys = keys[order], polys[order]
        self.uniq_keys, starts = np.unique(keys, return_index=True)
        self.offsets = np.append(starts, len(keys)).astype(np.int64)
        self.entries = polys

    def candidates(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, poly_idx) candidate pairs after cell + bbox filter."""
        key = cells.encode(lon, lat, self.res)
        pos = np.searchsorted(self.uniq_keys, key)
        pos = np.minimum(pos, len(self.uniq_keys) - 1) if len(self.uniq_keys) else pos
        hit = len(self.uniq_keys) > 0
        if not hit:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        found = self.uniq_keys[pos] == key
        pt_idx_all = np.nonzero(found)[0]
        cell_pos = pos[found]
        counts = self.offsets[cell_pos + 1] - self.offsets[cell_pos]
        pair_pt = np.repeat(pt_idx_all, counts)
        pair_poly = self.entries[np.repeat(self.offsets[cell_pos], counts) + _ranges(counts)]
        # exact bbox refine (intersects/mod.rs:113-127 bbox early-exit)
        bb = self.layer.bbox[pair_poly]
        px, py = lon[pair_pt], lat[pair_pt]
        keep = (px >= bb[:, 0]) & (px <= bb[:, 2]) & (py >= bb[:, 1]) & (py <= bb[:, 3])
        return pair_pt[keep], pair_poly[keep]
