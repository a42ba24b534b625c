"""Dataset-level dissolve (unary_union) over a polygon layer.

The reference's unary_union (bool_ops/mod.rs:15, delegating to
i_overlay) is a single-process n-way union; the Ray-native plan is the
classic distributive-aggregate shape (same as the dataset convex hull,
SURVEY.md §2.4):

  1. tag each polygon with the grid cell of its bbox center
     (``cell_deg`` sized so most unions are intra-cell);
  2. ``groupby(cell).map_groups`` -> per-cell partial union via the
     overlay engine (kernels/overlay.py) — this collapses local overlap
     so only the DISSOLVED per-cell geometry shuffles onward;
  3. a final merge group unions the partial results (union is
     associative + commutative, so any merge tree is correct; for
     massively-overlapping layers insert more levels by coarsening the
     cell key — each level is the same map_groups).

Rows carry rings in the layer's Arrow encoding (geom.RING_TYPE), so the
shuffled payload is the geometry itself — never Python objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import geom
from .kernels import overlay as ov


def _rows_to_polys(t: pa.Table) -> list[list[np.ndarray]]:
    layer = geom.PolygonLayer.from_arrow(t)
    out = []
    for p in range(len(layer.poly_ids)):
        rings = [
            layer.coords[layer.ring_offsets[r] : layer.ring_offsets[r + 1]]
            for r in range(layer.poly_ring_offsets[p], layer.poly_ring_offsets[p + 1])
        ]
        out.append(rings)
    return out


def _polys_to_rows(polys: list, cell: int) -> pa.Table:
    """Overlay results [(shell, holes)] -> one Arrow row per polygon."""
    ring_lists = [[shell, *holes] for shell, holes in polys]
    if not ring_lists:
        return pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "polygon_id": pa.array([], pa.string()),
                "rings": pa.array([], geom.RING_TYPE),
                "minx": pa.array([], pa.float64()),
                "miny": pa.array([], pa.float64()),
                "maxx": pa.array([], pa.float64()),
                "maxy": pa.array([], pa.float64()),
            }
        )
    closed = [[geom.close_ring(np.asarray(r)) for r in rings] for rings in ring_lists]
    arr = geom.rings_to_arrow(closed)
    n = len(ring_lists)
    shells = [rings[0] for rings in closed]
    return pa.table(
        {
            "cell": pa.array([cell] * n, pa.int64()),
            "polygon_id": pa.array([f"dissolved-{cell}-{i}" for i in range(n)]),
            "rings": arr,
            "minx": pa.array([float(s[:, 0].min()) for s in shells]),
            "miny": pa.array([float(s[:, 1].min()) for s in shells]),
            "maxx": pa.array([float(s[:, 0].max()) for s in shells]),
            "maxy": pa.array([float(s[:, 1].max()) for s in shells]),
        }
    )


def dissolve(polys_ds, cell_deg: float = 45.0):
    """polys_ds: Dataset with (polygon_id, rings) in the layer encoding.
    Returns a Dataset of dissolved polygons (polygon_id, rings)."""
    nx = max(1, int(round(360.0 / cell_deg)))

    def tag(t: pa.Table) -> pa.Table:
        layer = geom.PolygonLayer.from_arrow(t)
        cx = (layer.bbox[:, 0] + layer.bbox[:, 2]) / 2
        cy = (layer.bbox[:, 1] + layer.bbox[:, 3]) / 2
        ix = np.clip(((cx + 180.0) / cell_deg).astype(np.int64), 0, nx - 1)
        iy = np.clip(((cy + 90.0) / cell_deg).astype(np.int64), 0, nx - 1)
        return t.select(["polygon_id", "rings", "minx", "miny", "maxx", "maxy"]).append_column(
            "cell", pa.array(ix * nx + iy)
        )

    def partial_union(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        pieces = _rows_to_polys(g)
        merged = ov.unary_union(pieces)
        return _polys_to_rows(merged, cell)

    partials = (
        polys_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(partial_union, batch_format="pyarrow")
    )

    def final_union(g: pa.Table) -> pa.Table:
        merged = ov.unary_union(_rows_to_polys(g))
        return _polys_to_rows(merged, -1).drop_columns(["cell"])

    return (
        partials.map_batches(
            lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow",
        )
        .groupby("one")
        .map_groups(final_union, batch_format="pyarrow")
    )
