"""Polygon-x-polygon intersects join (geometry-vs-geometry).

Extends the engine beyond point-x-polygon: two polygon layers join on
`Intersects` semantics (intersects/polygon.rs:36-84 — first-vertex
containment OR any ring-segment crossing; the interior-interior check
is provably redundant for valid polygons).  Decision procedure per
candidate pair (bbox-overlapping):

  1. any vertex of A strictly inside B (winding over ALL of B's rings
     — a vertex inside a hole of B counts as outside, matching parity);
  2. any vertex of B strictly inside A;
  3. any edge of A strictly crossing any edge of B (sign products < 0,
     vectorized |A_edges| x |B_edges| block).

Boundary-only touches (shared edges/vertices) are measure-zero for the
synthetic layers and are intentionally excluded so the DuckDB oracle
(same three conditions in SQL) matches bit-for-bit; the exact-predicate
point kernel remains the API for boundary-sensitive point queries.

Distribution: broadcast the (smaller) B layer + map_batches over A —
the same plan-A shape as the PiP join; at two-large-layers scale both
sides co-shuffle by cell exactly like join.shuffle_pip_join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .geom import PolygonLayer
from .kernels import pip


def _pairs_vertex_in(
    layer_a: PolygonLayer, ia: np.ndarray, layer_b: PolygonLayer, ib: np.ndarray
) -> np.ndarray:
    """Per candidate pair t: any vertex of A-poly ia[t] strictly inside
    B-poly ib[t].  ONE batched pip.classify_xy call over every (vertex,
    polygon) task of every pair — no per-pair Python (VERDICT r2 #5)."""
    from .geom import _ranges

    m = len(ia)
    if m == 0:
        return np.zeros(0, dtype=bool)
    rl = layer_a.poly_ring_offsets[ia]
    nr = layer_a.poly_ring_offsets[ia + 1] - rl
    pr_pair = np.repeat(np.arange(m, dtype=np.int64), nr)
    rings = np.repeat(rl, nr) + _ranges(nr)
    vs = layer_a.ring_offsets[rings]
    nv = layer_a.ring_offsets[rings + 1] - 1 - vs  # skip the closing vertex
    vert_pair = np.repeat(pr_pair, nv)
    vidx = np.repeat(vs, nv) + _ranges(nv)
    pos = pip.classify_xy(
        layer_a.coords[vidx, 0], layer_a.coords[vidx, 1], layer_b,
        np.arange(len(vidx), dtype=np.int64), ib[vert_pair],
    )
    res = np.zeros(m, dtype=bool)
    res[np.unique(vert_pair[pos == pip.INSIDE])] = True
    return res


def _edges_cross(layer_a: PolygonLayer, ia: int, layer_b: PolygonLayer, ib: int) -> bool:
    """Any strict edge crossing between the two polygons (vectorized)."""
    def seg_of(layer, p):
        lo, hi = layer.poly_ring_offsets[p], layer.poly_ring_offsets[p + 1]
        xs1, ys1, xs2, ys2 = [], [], [], []
        for r in range(lo, hi):
            c = layer.ring_coords(r)
            xs1.append(c[:-1, 0]); ys1.append(c[:-1, 1])
            xs2.append(c[1:, 0]); ys2.append(c[1:, 1])
        return (np.concatenate(xs1), np.concatenate(ys1),
                np.concatenate(xs2), np.concatenate(ys2))

    ax1, ay1, ax2, ay2 = seg_of(layer_a, ia)
    bx1, by1, bx2, by2 = seg_of(layer_b, ib)
    # d1/d2: b endpoints vs each a segment; d3/d4: a endpoints vs b segment
    adx = (ax2 - ax1)[:, None]
    ady = (ay2 - ay1)[:, None]
    d1 = adx * (by1[None, :] - ay1[:, None]) - ady * (bx1[None, :] - ax1[:, None])
    d2 = adx * (by2[None, :] - ay1[:, None]) - ady * (bx2[None, :] - ax1[:, None])
    bdx = (bx2 - bx1)[None, :]
    bdy = (by2 - by1)[None, :]
    d3 = bdx * (ay1[:, None] - by1[None, :]) - bdy * (ax1[:, None] - bx1[None, :])
    d4 = bdx * (ay2[:, None] - by1[None, :]) - bdy * (ax2[:, None] - bx1[None, :])
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def polygons_intersect(layer_a: PolygonLayer, ia: int, layer_b: PolygonLayer, ib: int) -> bool:
    iav = np.asarray([ia], dtype=np.int64)
    ibv = np.asarray([ib], dtype=np.int64)
    return bool(
        _pairs_vertex_in(layer_a, iav, layer_b, ibv)[0]
        or _pairs_vertex_in(layer_b, ibv, layer_a, iav)[0]
        or _edges_cross(layer_a, ia, layer_b, ib)
    )


def pairs_intersect(
    layer_a: PolygonLayer, layer_b: PolygonLayer, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Vectorized Intersects over candidate (ia[t], ib[t]) pairs: both
    vertex-containment conditions batch through ONE classify call each;
    only the (typically few) pairs failing both fall to the per-pair
    edge-crossing block."""
    res = _pairs_vertex_in(layer_a, ia, layer_b, ib)
    rem = np.nonzero(~res)[0]
    if len(rem):
        res[rem[_pairs_vertex_in(layer_b, ib[rem], layer_a, ia[rem])]] = True
    # r4 (VERDICT r3 #3): edge-crossing refinement batches across all
    # remaining pairs (exploded segment products keyed by pair id)
    from . import crossings

    rem = np.nonzero(~res)[0]
    if len(rem):
        sa = crossings.poly_soup(layer_a)
        sb = crossings.poly_soup(layer_b)
        res[rem] = crossings.pairs_any_cross(sa, sb, ia[rem], ib[rem])
    return res


def _candidate_pairs(
    layer_a: PolygonLayer, layer_b: PolygonLayer, self_join: bool
) -> tuple[np.ndarray, np.ndarray]:
    """bbox-overlapping (ia, ib) candidates, vectorized (a_id < b_id
    when self_join); the bool matrix is chunked over the A side so
    memory stays bounded for large broadcast layers (r4)."""
    ab, bb = layer_a.bbox, layer_b.bbox
    chunk = max(1, 50_000_000 // max(len(bb), 1))
    outs_a, outs_b = [], []
    for s in range(0, len(ab), chunk):
        e = min(len(ab), s + chunk)
        ok = (
            (ab[s:e, 0][:, None] <= bb[None, :, 2])
            & (ab[s:e, 2][:, None] >= bb[None, :, 0])
            & (ab[s:e, 1][:, None] <= bb[None, :, 3])
            & (ab[s:e, 3][:, None] >= bb[None, :, 1])
        )
        ia, ib = np.nonzero(ok)
        outs_a.append(ia + s)
        outs_b.append(ib)
    ia = np.concatenate(outs_a) if outs_a else np.zeros(0, np.int64)
    ib = np.concatenate(outs_b) if outs_b else np.zeros(0, np.int64)
    if self_join:
        keep = layer_a.poly_ids[ia] < layer_b.poly_ids[ib]
        ia, ib = ia[keep], ib[keep]
    return ia.astype(np.int64), ib.astype(np.int64)


def poly_poly_intersects(a_table: pa.Table, b_table: pa.Table, self_join: bool = False):
    """All intersecting (a_id, b_id) pairs; a_id < b_id when self_join.

    B broadcasts; A streams as a Dataset of polygon rows.  Returns a
    pyarrow Table (layers are small relative to the point side).
    """
    import ray.data as rd

    b_ref = ray.put(b_table)

    def batch_pairs(batch: pa.Table) -> pa.Table:
        layer_a = PolygonLayer.from_arrow(batch)
        layer_b = PolygonLayer.from_arrow(ray.get(b_ref))
        ia, ib = _candidate_pairs(layer_a, layer_b, self_join)
        hit = pairs_intersect(layer_a, layer_b, ia, ib)
        return pa.table(
            {"a": pa.array(list(layer_a.poly_ids[ia[hit]]), pa.string()),
             "b": pa.array(list(layer_b.poly_ids[ib[hit]]), pa.string())}
        )

    ds = rd.from_arrow(a_table).map_batches(batch_pairs, batch_format="pyarrow")
    batches = [t for t in ds.iter_batches(batch_format="pyarrow") if len(t)]
    schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    return pa.concat_tables(batches) if batches else schema.empty_table()


def poly_poly_intersects_shuffle(a_ds, b_ds, res: int = 4, self_join: bool = False):
    """Two-LARGE-layer plan (the round-1 agenda's cell-co-shuffle
    variant): neither side broadcasts — each polygon row replicates to
    every grid cell its bbox overlaps, the two sides meet in
    ``groupby(cell)``, candidate pairs run the same exact intersects
    decision procedure, and a ``groupby(a, b)`` dedups pairs found in
    several shared cells.  Output matches poly_poly_intersects."""
    from .sweep import _cells_for_bbox

    def rep(side: str):
        def f(t: pa.Table) -> pa.Table:
            minx = t.column("minx").to_numpy(zero_copy_only=False)
            miny = t.column("miny").to_numpy(zero_copy_only=False)
            maxx = t.column("maxx").to_numpy(zero_copy_only=False)
            maxy = t.column("maxy").to_numpy(zero_copy_only=False)
            cells, rows = _cells_for_bbox(minx, miny, maxx, maxy, res)
            take = pa.array(rows, pa.int64())
            out = t.take(take)
            return out.append_column("cell", pa.array(cells)).append_column(
                "side", pa.array([side] * len(cells), pa.string())
            )

        return f

    def group_pairs(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("side").to_pylist(), dtype=object)
        am = side == "a"
        at = g.filter(pa.array(am)).drop_columns(["cell", "side"])
        bt = g.filter(pa.array(~am)).drop_columns(["cell", "side"])
        if len(at) == 0 or len(bt) == 0:
            return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
        layer_a = PolygonLayer.from_arrow(at)
        layer_b = PolygonLayer.from_arrow(bt)
        ia, ib = _candidate_pairs(layer_a, layer_b, self_join)
        hit = pairs_intersect(layer_a, layer_b, ia, ib)
        return pa.table(
            {"a": pa.array(list(layer_a.poly_ids[ia[hit]]), pa.string()),
             "b": pa.array(list(layer_b.poly_ids[ib[hit]]), pa.string())}
        )

    unioned = a_ds.map_batches(rep("a"), batch_format="pyarrow").union(
        b_ds.map_batches(rep("b"), batch_format="pyarrow")
    )
    from .shuffleops import bucket_distinct

    pairs = unioned.groupby("cell").map_groups(group_pairs, batch_format="pyarrow")
    return bucket_distinct(pairs, ["a", "b"])
