"""Columnar geometry encoding and flat ragged-buffer views.

Arrow encoding (SURVEY.md §1.3, mirroring geo-types' model,
`geo-types/src/geometry/polygon.rs:64-69`):

* Point        -> two flat float64 columns (lon, lat) on the hot path
* Polygon      -> ``rings: list<list<struct<x: float64, y: float64>>>``,
                  ring 0 = exterior, rest = holes, rings stored CLOSED
                  (first == last coord, the ring-closing invariant of
                  `geo-types/src/geometry/polygon.rs:123-131`)
* bbox         -> flat minx/miny/maxx/maxy float64 columns

Kernels never materialize Python geometry objects: they operate on the
flattened coord buffers + offsets exposed by :class:`PolygonLayer`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

RING_TYPE = pa.list_(pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])))

POLYGON_SCHEMA = pa.schema(
    [
        ("polygon_id", pa.string()),
        ("rings", RING_TYPE),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
    ]
)


def close_ring(coords: np.ndarray) -> np.ndarray:
    """Append the first coord if the ring is not closed (polygon.rs:123-131)."""
    if len(coords) == 0 or np.array_equal(coords[0], coords[-1]):
        return coords
    return np.vstack([coords, coords[:1]])


def rings_to_arrow(polys: list[list[np.ndarray]]) -> pa.Array:
    """list-of-polygons (each a list of (n,2) closed ring arrays) -> Arrow."""
    xs, ys = [], []
    ring_offsets = [0]
    poly_offsets = [0]
    for rings in polys:
        for ring in rings:
            xs.append(ring[:, 0])
            ys.append(ring[:, 1])
            ring_offsets.append(ring_offsets[-1] + len(ring))
        poly_offsets.append(poly_offsets[-1] + len(rings))
    x = np.concatenate(xs) if xs else np.empty(0)
    y = np.concatenate(ys) if ys else np.empty(0)
    coords = pa.StructArray.from_arrays(
        [pa.array(x, pa.float64()), pa.array(y, pa.float64())], names=["x", "y"]
    )
    inner = pa.ListArray.from_arrays(pa.array(ring_offsets, pa.int32()), coords)
    return pa.ListArray.from_arrays(pa.array(poly_offsets, pa.int32()), inner)


@dataclass
class PolygonLayer:
    """Flat ragged view of a polygon table for vectorized kernels.

    coords        (N, 2) float64 — every ring's coords, rings closed
    ring_offsets  (R+1,) int64   — ring r occupies coords[ring_offsets[r]:ring_offsets[r+1]]
    ring_poly     (R,)   int64   — owning polygon index of each ring
    ring_is_hole  (R,)   bool    — ring index > 0 within its polygon
    poly_ring_offsets (P+1,) int64 — polygon p owns rings [o[p]:o[p+1])
    poly_ids      (P,)   object  — polygon_id strings
    bbox          (P, 4) float64 — minx, miny, maxx, maxy
    """

    coords: np.ndarray
    ring_offsets: np.ndarray
    ring_poly: np.ndarray
    ring_is_hole: np.ndarray
    poly_ring_offsets: np.ndarray
    poly_ids: np.ndarray
    bbox: np.ndarray

    @property
    def num_polys(self) -> int:
        return len(self.poly_ids)

    @property
    def num_rings(self) -> int:
        return len(self.ring_poly)

    def ring_coords(self, r: int) -> np.ndarray:
        return self.coords[self.ring_offsets[r] : self.ring_offsets[r + 1]]

    def poly_rings(self, p: int) -> list[np.ndarray]:
        return [
            self.ring_coords(r)
            for r in range(self.poly_ring_offsets[p], self.poly_ring_offsets[p + 1])
        ]

    def segments(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(x1, y1, x2, y2, seg_ring) — every ring edge, vectorized."""
        starts = self.ring_offsets[:-1]
        ends = self.ring_offsets[1:]
        n_seg = ends - starts - 1  # closed rings: n coords -> n-1 edges
        idx = np.repeat(starts, n_seg) + _ranges(n_seg)
        seg_ring = np.repeat(np.arange(self.num_rings, dtype=np.int64), n_seg)
        p1 = self.coords[idx]
        p2 = self.coords[idx + 1]
        return p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1], seg_ring

    @staticmethod
    def from_arrow(table: pa.Table) -> "PolygonLayer":
        rings_col = table.column("rings").combine_chunks()
        if isinstance(rings_col, pa.ChunkedArray):
            rings_col = rings_col.chunk(0)
        outer = rings_col  # list<list<struct>>
        poly_offsets = outer.offsets.to_numpy().astype(np.int64)
        inner = outer.values  # list<struct>
        ring_offsets_all = inner.offsets.to_numpy().astype(np.int64)
        coords_struct = inner.values
        x = coords_struct.field("x").to_numpy(zero_copy_only=False)
        y = coords_struct.field("y").to_numpy(zero_copy_only=False)
        coords = np.column_stack([x, y])

        num_polys = len(outer)
        ring_counts = poly_offsets[1:] - poly_offsets[:-1]
        num_rings = int(ring_counts.sum())
        ring_poly = np.repeat(np.arange(num_polys, dtype=np.int64), ring_counts)
        ring_local = _ranges(ring_counts)
        ring_is_hole = ring_local > 0
        # inner offsets are indexed by absolute ring number (outer is dense)
        ring_offsets = ring_offsets_all[: num_rings + 1]

        ids = np.asarray(table.column("polygon_id").to_pylist(), dtype=object)
        bbox = np.column_stack(
            [table.column(c).to_numpy(zero_copy_only=False) for c in ("minx", "miny", "maxx", "maxy")]
        )
        return PolygonLayer(
            coords=coords,
            ring_offsets=ring_offsets,
            ring_poly=ring_poly,
            ring_is_hole=ring_is_hole,
            poly_ring_offsets=poly_offsets,
            poly_ids=ids,
            bbox=bbox,
        )


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3, 2] -> [0, 1, 2, 0, 1] (vectorized per-group arange)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    group_starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(group_starts, counts)
