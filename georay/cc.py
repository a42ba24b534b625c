"""Distributed connected components over a slim edge list.

The dedup family (MinHash-LSH, SimHash) and DBSCAN all end with "group
verified pairs into components, label each component by its minimum
member id".  Round 1 did this with a driver-side union-find over the
full edge list — a driver OOM at 100 TB.  This module replaces it with
iterative min-label propagation + pointer jumping (Shiloach-Vishkin
style hook + shortcut, the hash-to-min family of Rastogi et al. 2013):

    round:  hook      new_lbl(v) = min(lbl(v), min over edges (u,v) of lbl(u))
            shortcut  new_lbl(v) = lbl(lbl(v))

Each phase is ONE ``groupby(key).map_groups`` over slim (key, payload)
rows — a reduce-side co-partitioned join, no driver state, no
Dataset.join dependency.  Hook+shortcut converges in O(log n) rounds;
per-round cost is a shuffle of O(E + N) rows of two scalar columns.
Convergence is detected with an order-independent checksum of the label
table (count, xor-sum, add-sum of a splitmix64 mix) — at the fixpoint
labels cannot change, so equal checksums two rounds running terminate.

Works for int64 or string node ids (labels are min-of-ids in the id
type's natural order, so output is deterministic and independent of
partitioning / parallelism).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 (vectorized)."""
    old = np.seterr(over="ignore")
    try:
        z = x.astype(np.uint64, copy=True)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z
    finally:
        np.seterr(**old)


def _label_checksum(labels) -> tuple:
    """Order-independent (count, xor, sum) checksum of (node, label)."""

    def partial(t: pa.Table) -> pa.Table:
        node = t.column("node")
        lbl = t.column("label")
        if pa.types.is_string(node.type):
            h_n = _mix64(np.asarray([_str_h(s) for s in node.to_pylist()], dtype=np.uint64))
            h_l = _mix64(np.asarray([_str_h(s) for s in lbl.to_pylist()], dtype=np.uint64))
        else:
            h_n = _mix64(node.to_numpy(zero_copy_only=False).astype(np.uint64))
            h_l = _mix64(lbl.to_numpy(zero_copy_only=False).astype(np.uint64))
        old = np.seterr(over="ignore")
        try:
            h = _mix64(h_n * np.uint64(0x9E3779B97F4A7C15) + h_l)
        finally:
            np.seterr(**old)
        return pa.table(
            {
                "cnt": pa.array([len(t)], pa.int64()),
                "x": pa.array([int(np.bitwise_xor.reduce(h)) if len(h) else 0], pa.uint64()),
                "s": pa.array([int(np.add.reduce(h, dtype=np.uint64)) if len(h) else 0], pa.uint64()),
            }
        )

    parts = labels.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return (0, 0, 0)
    old = np.seterr(over="ignore")
    try:
        return (
            int(parts["cnt"].sum()),
            int(np.bitwise_xor.reduce(parts["x"].to_numpy().astype(np.uint64))),
            int(np.add.reduce(parts["s"].to_numpy().astype(np.uint64))),
        )
    finally:
        np.seterr(**old)


def _str_h(s: str) -> int:
    """Deterministic 64-bit hash of a string (FNV-1a; checksum only)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _min_scalar(arr: pa.ChunkedArray | pa.Array):
    return pc.min(arr)


def connected_components(edges, max_rounds: int | None = None, typ=None):
    """edges: Dataset with columns ``a``, ``b`` (int64 or string; each
    row an undirected edge, self-loops / duplicates tolerated).

    Returns a Dataset ``(node, label)`` covering every endpoint, where
    ``label`` is the minimum node id in the component.  ``typ``: node
    type fallback for when ``edges`` may be all-empty (schema-less).
    """
    import ray.data as _rd

    schema = edges.schema()
    if schema is not None:
        typ = dict(zip(schema.names, schema.types))["a"]
    elif typ is None:
        raise ValueError("edges has no schema; pass typ")
    else:
        return _rd.from_arrow(
            pa.table({"node": pa.array([], typ), "label": pa.array([], typ)})
        )

    # ---- init: label(v) = v, one row per distinct endpoint ------------
    def init_labels(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t.column("a").combine_chunks().cast(typ), t.column("b").combine_chunks().cast(typ)]
        )
        u = pc.unique(both)
        return pa.table({"node": u, "label": u})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )
    n = labels.count()
    if n == 0:
        return labels
    if max_rounds is None:
        max_rounds = int(np.ceil(np.log2(max(n, 2)))) + 3

    # static hook stream: each edge in both directions, (key, other)
    def edge_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(typ)
        b = t.column("b").combine_chunks().cast(typ)
        return pa.table(
            {
                "key": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a]),
                "lbl": pa.nulls(2 * len(t), typ),
            }
        )

    hook_static = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def label_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("node"),
                "other": pa.nulls(len(t), typ),
                "lbl": t.column("label"),
            }
        )

    def hook_group(g: pa.Table) -> pa.Table:
        lbl = _min_scalar(g.column("lbl"))  # the key's current label
        others = g.column("other").drop_null()
        key = g.column("key")[0]
        out_nodes = pa.concat_arrays([others.combine_chunks(), pa.array([key.as_py()], typ)])
        return pa.table({"node": out_nodes, "cand": pa.array([lbl.as_py()] * len(out_nodes), typ)})

    def shortcut_rows(t: pa.Table) -> pa.Table:
        # request rows keyed by the label (ask lbl for ITS label) + own rows
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [t.column("label").combine_chunks(), t.column("node").combine_chunks()]
                ),
                "other": pa.concat_arrays([t.column("node").combine_chunks(), pa.nulls(len(t), typ)]),
                "lbl": pa.concat_arrays([pa.nulls(len(t), typ), t.column("label").combine_chunks()]),
            }
        )

    def min_combine(g: pa.Table) -> pa.Table:
        return pa.table(
            {"node": g.column("node").slice(0, 1).combine_chunks()[:1], "label": pa.array([
                _min_scalar(g.column("cand")).as_py()], typ)}
        )

    prev_sum = _label_checksum(labels)
    for _ in range(max_rounds):
        # ---- hook: propagate min label across edges -------------------
        lr = labels.map_batches(label_rows, batch_format="pyarrow")
        cand = (
            hook_static.union(lr)
            .groupby("key")
            .map_groups(hook_group, batch_format="pyarrow")
        )
        labels = (
            cand.groupby("node").map_groups(min_combine, batch_format="pyarrow").materialize()
        )
        # ---- shortcut: label(v) = label(label(v)) ---------------------
        sc = labels.map_batches(shortcut_rows, batch_format="pyarrow")
        cand2 = sc.groupby("key").map_groups(hook_group, batch_format="pyarrow")
        labels = (
            cand2.groupby("node").map_groups(min_combine, batch_format="pyarrow").materialize()
        )
        cur = _label_checksum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels


def attach_labels(nodes, labels, node_col: str, typ=None, types_map: dict | None = None):
    """Left-join ``labels`` (node, label) onto a node Dataset, default
    label = the node itself (singleton component).  Reduce-side join via
    groupby(node) — no driver materialization.

    nodes: Dataset with column ``node_col`` (plus any slim payload
    columns, which are carried through).  Returns nodes + ``label``.
    types_map: explicit {column: pa type} for when ``nodes`` may be
    empty (an all-empty Dataset has no schema at all).
    """
    schema = nodes.schema()
    if schema is not None:
        types = dict(zip(schema.names, schema.types))
    elif types_map is not None:
        types = dict(types_map)
    else:
        raise ValueError("nodes has no schema; pass types_map")
    if typ is None:
        typ = types[node_col]
    payload = [f for f in types if f != node_col]

    def node_rows(t: pa.Table) -> pa.Table:
        cols = {"key": t.column(node_col), "lbl": pa.nulls(len(t), typ), "is_node": pa.array([True] * len(t))}
        for f in payload:
            cols[f] = t.column(f)
        return pa.table(cols)

    def lbl_rows(t: pa.Table) -> pa.Table:
        cols = {"key": t.column("node"), "lbl": t.column("label"), "is_node": pa.array([False] * len(t))}
        for f in payload:
            cols[f] = pa.nulls(len(t), types[f])
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        is_node = g.column("is_node").to_numpy(zero_copy_only=False)
        node_mask = pa.array(is_node)
        lbls = g.column("lbl").drop_null()
        key = g.column("key")[0].as_py()
        label = lbls[0].as_py() if len(lbls) else key
        sub = g.filter(node_mask)
        cols = {node_col: sub.column("key"), "label": pa.array([label] * len(sub), typ)}
        for f in payload:
            cols[f] = sub.column(f)
        return pa.table(cols)

    return (
        nodes.map_batches(node_rows, batch_format="pyarrow")
        .union(labels.map_batches(lbl_rows, batch_format="pyarrow"))
        .groupby("key")
        .map_groups(join_group, batch_format="pyarrow")
    )
