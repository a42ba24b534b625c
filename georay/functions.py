"""User-extension surface (SURVEY.md §2.10).

The reference exposes two extension hooks: trait-per-algorithm (any
CoordsIter type gets the algorithms) and ``MapCoords`` closures
(map_coords.rs:31 — arbitrary per-coordinate UDFs).  The Ray-native
equivalents:

* ``register_kernel`` / ``apply_kernel`` — a batch-in/batch-out Kernel
  protocol: a kernel is any callable ``(pa.Table, **kw) -> pa.Table``;
  registering it by name makes it a dataset stage via ``apply_kernel``
  (plain task pool) without the caller touching ``map_batches``
  plumbing.
* ``map_coords`` — the dataset-level MapCoords: applies a vectorized
  ``(xs, ys) -> (xs, ys)`` UDF to EVERY coordinate of a ragged
  geometry column (``rings`` or ``path``), rebuilding the column
  around the untouched offset buffers — the UDF only ever sees flat
  float64 arrays, never Python-object geometry.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

KERNELS: dict[str, Callable] = {}


def register_kernel(name: str):
    """Decorator: register a batch kernel ``(pa.Table, **kw) -> pa.Table``."""

    def deco(fn: Callable) -> Callable:
        if name in KERNELS:
            raise ValueError(f"kernel {name!r} already registered")
        KERNELS[name] = fn
        return fn

    return deco


def apply_kernel(ds, name: str, batch_size: int | None = None, **kw):
    """Apply a registered kernel as a Dataset stage."""
    fn = KERNELS[name]

    def run(t: pa.Table) -> pa.Table:
        return fn(t, **kw)

    kwargs = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(run, **kwargs)


def _map_geometry_column(t: pa.Table, col: str, fn) -> pa.Table:
    """Rebuild a ragged geometry column with fn applied to the flat
    coords; offsets are reused untouched."""
    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # descend to the flat struct<x,y> child regardless of nesting depth
    nests = []
    cur = arr
    while pa.types.is_list(cur.type) or pa.types.is_large_list(cur.type):
        nests.append(cur)
        cur = cur.flatten()
    xs = cur.field("x").to_numpy(zero_copy_only=False)
    ys = cur.field("y").to_numpy(zero_copy_only=False)
    nx, ny = fn(xs, ys)
    new = pa.StructArray.from_arrays(
        [pa.array(np.asarray(nx, np.float64)), pa.array(np.asarray(ny, np.float64))],
        names=["x", "y"],
    )
    # re-wrap with the original offsets, innermost first
    for lvl in reversed(nests):
        off = lvl.offsets
        cls = (
            pa.LargeListArray if pa.types.is_large_list(lvl.type) else pa.ListArray
        )
        new = cls.from_arrays(off, new)
    return t.set_column(t.column_names.index(col), col, new)


def map_coords(ds, fn, col: str = "rings", refresh_bbox: bool = True):
    """MapCoords over a Dataset: ``fn(xs, ys) -> (xs, ys)`` applied to
    every coordinate of the geometry column; bbox columns refresh from
    the new coords when present."""

    def run(t: pa.Table) -> pa.Table:
        t = _map_geometry_column(t, col, fn)
        if refresh_bbox and "minx" in t.column_names:
            # per-ROW flat coord ranges by composing the list offsets
            arr = t.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            starts = None
            cur = arr
            while pa.types.is_list(cur.type) or pa.types.is_large_list(cur.type):
                off = cur.offsets.to_numpy().astype(np.int64)
                starts = off if starts is None else off[starts]
                cur = cur.flatten()
            xs = cur.field("x").to_numpy(zero_copy_only=False)
            ys = cur.field("y").to_numpy(zero_copy_only=False)
            lo = starts[:-1]
            bb = np.column_stack(
                [
                    np.minimum.reduceat(xs, lo),
                    np.minimum.reduceat(ys, lo),
                    np.maximum.reduceat(xs, lo),
                    np.maximum.reduceat(ys, lo),
                ]
            )
            for k, idx in (("minx", 0), ("miny", 1), ("maxx", 2), ("maxy", 3)):
                t = t.set_column(t.column_names.index(k), k, pa.array(bb[:, idx]))
        return t

    return ds.map_batches(run, batch_format="pyarrow")
