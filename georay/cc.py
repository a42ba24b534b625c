"""Distributed connected components over a slim edge list.

The dedup family (MinHash-LSH, SimHash) and DBSCAN all end with "group
verified pairs into components, label each component by its minimum
member id".  Round 1 did this with a driver-side union-find over the
full edge list — a driver OOM at 100 TB.  Rounds 2-3 replace it with
iterative min-label propagation + pointer jumping (Shiloach-Vishkin
style hook + shortcut, the hash-to-min family of Rastogi et al. 2013):

    round:  hook      new_lbl(v) = min(lbl(v), min over edges (u,v) of lbl(u))
            shortcut  new_lbl(v) = lbl(lbl(v))

Round 3 rewrite (VERDICT r2 "What's wrong #1"): every phase is now a
BUCKETED shuffle (``shuffleops.bucket_join`` / ``bucket_reduce``) —
Ray groups by ``hash(key) % P``, and inside each bucket the join/min
runs as one vectorized Arrow C++ kernel.  No per-node Python calls
anywhere: at 10^9 nodes a round costs P Python invocations (~256),
not 10^9.  Hook+shortcut still converges in O(log n) rounds; per-round
cost is 3 slim shuffles of (key, payload) scalar columns.

Convergence is detected with an order-independent checksum of the label
table (count, xor-sum, add-sum of a splitmix64 mix) — at the fixpoint
labels cannot change, so equal checksums two rounds running terminate.

Works for int64 or string node ids (labels are min-of-ids in the id
type's natural order, so output is deterministic and independent of
partitioning / parallelism).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shuffleops import DEFAULT_P, bucket_join, bucket_reduce, bucket_unique


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


def _id_hashes(col) -> np.ndarray:
    """Vectorized 64-bit hash of an id column (int or string)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from .texthash import hash_strings

        return hash_strings(col).astype(np.uint64)
    return col.to_numpy(zero_copy_only=False).astype(np.uint64)


def _label_checksum(labels) -> tuple:
    """Order-independent (count, xor, sum) checksum of (node, label)."""

    def partial(t: pa.Table) -> pa.Table:
        h_n = _mix64(_id_hashes(t.column("node")))
        h_l = _mix64(_id_hashes(t.column("label")))
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


def connected_components(edges, max_rounds: int | None = None, typ=None,
                         p: int = DEFAULT_P):
    """edges: Dataset with columns ``a``, ``b`` (int64 or string; each
    row an undirected edge, self-loops / duplicates tolerated).

    Returns a Dataset ``(node, label)`` covering every endpoint, where
    ``label`` is the minimum node id in the component.  ``typ``: node
    type fallback for when ``edges`` may be all-empty (schema-less).
    ``p``: shuffle bucket count (see shuffleops partitioning note).
    """
    import ray.data as _rd

    # materialize the caller's (possibly expensive) lazy edge pipeline
    # BEFORE the schema read: Dataset.schema() executes a lazy plan up
    # to its first block, which for an all-to-all upstream is a full
    # run — the minhash verify chain was executing twice (r4b; the
    # schema probe alone cost a whole signatures+verify pass)
    edges = edges.materialize()
    schema = edges.schema()
    if schema is not None:
        typ = dict(zip(schema.names, schema.types))["a"]
    elif typ is None:
        raise ValueError("edges has no schema; pass typ")
    else:
        return _rd.from_arrow(
            pa.table({"node": pa.array([], typ), "label": pa.array([], typ)})
        )

    # static directed edge stream (both directions): everything else
    # (endpoint init + every round) derives from it, so it executes ONCE
    # (r3: the minhash verify chain used to re-run per consumer)
    def edge_rows0(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(typ)
        b = t.column("b").combine_chunks().cast(typ)
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges_dir = edges.map_batches(edge_rows0, batch_format="pyarrow").materialize()

    # ---- size-adaptive plan: the distributed loop costs ~10 Ray
    # stages x O(log n) rounds of pure orchestration, which only pays
    # off when the label table can't sit on one node.  Below the
    # threshold (slim (src, dst) pairs, ~16-50 bytes/row -> well under
    # a GiB) a driver-side vectorized min-label/pointer-jumping pass
    # finishes in milliseconds with IDENTICAL output (min node id per
    # component).  At 100 TB the edge list of a near-dup graph exceeds
    # this and the bucketed loop below engages.
    # gate on BYTES, not rows (ADVICE r3 #6): string-id edge lists run
    # ~3x heavier than int64 ones, so a row count under-gates them.
    # size_bytes() is exact here — edges_dir is materialized.
    max_rows = os.environ.get("GEORAY_CC_LOCAL_MAX")
    max_bytes = int(os.environ.get("GEORAY_CC_LOCAL_MAX_BYTES", str(640 << 20)))
    m_dir = edges_dir.count()
    local_ok = (
        m_dir <= int(max_rows) if max_rows is not None
        else edges_dir.size_bytes() <= max_bytes
    )
    if m_dir == 0:
        # zero-edge graph: every node is a singleton, and the caller's
        # label join falls back to self-labels — return an EMPTY label
        # table WITH schema (to_pandas on an empty Dataset loses the
        # columns; r4c, exposed by an all-unique corpus)
        return _rd.from_arrow(
            pa.table({"node": pa.array([], typ), "label": pa.array([], typ)})
        )
    if local_ok:
        tab = edges_dir.to_pandas()
        src_v = tab["src"].to_numpy()
        dst_v = tab["dst"].to_numpy()
        uniq, inv = np.unique(np.concatenate([src_v, dst_v]), return_inverse=True)
        si, di = inv[: len(src_v)], inv[len(src_v):]
        lbl = np.arange(len(uniq), dtype=np.int64)
        while True:
            old = lbl.copy()
            np.minimum.at(lbl, di, lbl[si])
            lbl = lbl[lbl]  # pointer jumping
            if np.array_equal(lbl, old):
                break
        # np.unique sorts, so min index == min node id (ints numeric,
        # fixed-width id strings lexicographic == numeric)
        return _rd.from_arrow(
            pa.table({"node": pa.array(uniq).cast(typ),
                      "label": pa.array(uniq[lbl]).cast(typ)})
        )

    # ---- init: label(v) = v, one row per distinct endpoint ------------
    nodes = bucket_unique(
        edges_dir.map_batches(
            lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
        ),
        "node", p=p,
    )
    labels = nodes.map_batches(
        lambda t: t.append_column("label", t.column("node")), batch_format="pyarrow"
    ).materialize()
    n = labels.count()
    if n == 0:
        return labels
    if max_rounds is None:
        max_rounds = int(np.ceil(np.log2(max(n, 2)))) + 3
    # adapt the shuffle fan-out to the component graph's size: each
    # round is ~6 bucketed stages, and at P=256 a small graph pays
    # thousands of empty-task launches per round (r3: the sf0.1
    # documents cc tail spent 29s orchestrating 477 label rows).
    # ~50k rows per bucket keeps buckets vectorization-sized.
    p = min(p, max(4, int(np.ceil(n / 50_000))))

    types_el = {"src": typ, "dst": typ}
    types_lbl = {"node": typ, "label": typ}
    # Bound the label table's block count: each round's union + groupby
    # otherwise MULTIPLIES blocks (~4x/round — the sort shuffle emits
    # one block per input block), which makes round r cost O(4^r) task
    # overhead.  Non-shuffle repartition is a cheap coalesce; ~2M rows
    # per block keeps blocks object-store-sized at any scale.
    nb = int(max(4, min(p, np.ceil(n / 2_000_000))))

    prev_sum = _label_checksum(labels)
    for _ in range(max_rounds):
        # ---- hook: cand(dst) = lbl(src) over edges, + own label -------
        hooked = bucket_join(
            edges_dir, labels, "src", "node", p=p,
            left_types=types_el, right_types=types_lbl,
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "cand": t.column("label")}),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"), "cand": t.column("label")}),
            batch_format="pyarrow",
        )
        labels = (
            bucket_reduce(hooked.union(own), "node", [("cand", "min")], p=p)
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
            )
            .repartition(nb)
            .materialize()
        )
        # ---- shortcut: label(v) = label(label(v)) ---------------------
        lbl2 = labels.map_batches(
            lambda t: pa.table({"node2": t.column("node"), "label2": t.column("label")}),
            batch_format="pyarrow",
        )
        labels = (
            bucket_join(
                labels, lbl2, "label", "node2", p=p,
                left_types=types_lbl,
                right_types={"node2": typ, "label2": typ},
            )
            .map_batches(
                lambda t: pa.table({"node": t.column("node"), "label": t.column("label2")}),
                batch_format="pyarrow",
            )
            .repartition(nb)
            .materialize()
        )
        cur = _label_checksum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels


def attach_labels(nodes, labels, node_col: str, typ=None, types_map: dict | None = None,
                  p: int = DEFAULT_P):
    """Left-join ``labels`` (node, label) onto a node Dataset, default
    label = the node itself (singleton component).  Bucketed vectorized
    join — no driver materialization, no per-key Python.

    nodes: Dataset with column ``node_col`` (plus any slim payload
    columns, which are carried through).  Returns nodes + ``label``.
    types_map: explicit {column: pa type} for when ``nodes`` may be
    empty (an all-empty Dataset has no schema at all).
    """
    types = _types_of(nodes, types_map)
    if types is None:
        raise ValueError("nodes has no schema; pass types_map")
    if typ is None:
        typ = types[node_col]

    joined = bucket_join(
        nodes, labels, node_col, "node", how="left outer", p=p,
        left_types=types, right_types={"node": typ, "label": typ},
    )

    def coalesce(t: pa.Table) -> pa.Table:
        lbl = pc.coalesce(t.column("label"), t.column(node_col).cast(typ))
        return t.set_column(t.column_names.index("label"), "label", lbl)

    return joined.map_batches(coalesce, batch_format="pyarrow")


def _types_of(ds, fallback: dict | None) -> dict | None:
    # caller-declared types first: Dataset.schema() executes a lazy
    # plan up to its first block (see shuffleops._schema_types, r4b).
    # Declared types are trusted verbatim, not validated — see the
    # caller contract on shuffleops._schema_types (ADVICE r4).
    if fallback is not None:
        return dict(fallback)
    schema = ds.schema()
    if schema is not None:
        return dict(zip(schema.names, schema.types))
    return None
