"""Clustering operators: DBSCAN and k-means (SURVEY.md §2.8).

DBSCAN (reference: geo/src/algorithm/dbscan.rs — euclidean eps,
min_pts core rule, border points join any neighbouring core's cluster):
cell-partitioned with halo.  eps must not exceed the cell edge so the
3x3 halo covers every eps-ball.  Plan:

  1. points -> (cell, halo replicas) exactly like kNN;
  2. per cell: vectorized pairwise distance block -> neighbour counts
     (core flags) + local core-core adjacency edges;
  3. cross-cell merge: core-core edges stream to the driver as
     (min_id, max_id) pairs — O(edges), bounded by pre-aggregation to
     per-group spanning forests — union-find assigns global cluster ids;
  4. border points attach to the smallest-id neighbouring core cluster.

K-means (reference: geo/src/algorithm/kmeans/mod.rs:186-250 — seeded
init, max_iter, tolerance): classic Ray Data iteration — broadcast
centroids, assign in map_batches, update via per-batch partial sums +
tiny groupby, repeat on the driver.  Deterministic: seeded stride init,
fixed iteration count, ties to the lowest centroid index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from . import cells


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id wins -> deterministic labels
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def dbscan(points, eps: float, min_pts: int, res: int | None = None, n_points: int | None = None):
    """points: Dataset (image_id, lon, lat) -> pandas (image_id, cluster,
    is_core); cluster = -1 for noise; labels are min member image_id per
    cluster (deterministic across partitionings)."""
    n = None
    if res is None:
        if n_points is None:
            n_points = points.count()
        # eps must fit within one cell edge (halo correctness)
        res = 2
        while res < 16:
            nn = 1 << (res + 1)
            if min(360.0 / nn, 180.0 / nn) < 2 * eps:
                break
            res += 1
    n = 1 << res
    assert min(360.0 / n, 180.0 / n) >= eps, "eps exceeds cell size at this resolution"

    def replicate(b: pa.Table) -> pa.Table:
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        ids = b.column("image_id")
        ix, iy = cells.cell_xy(lon, lat, res)
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                idx = np.nonzero(ok)[0]
                out.append(
                    pa.table(
                        {
                            "cell": pa.array((jx[idx] * n + jy[idx]).astype(np.int64)),
                            "image_id": ids.take(pa.array(idx, pa.int64())),
                            "lon": pa.array(lon[idx]),
                            "lat": pa.array(lat[idx]),
                            "own": pa.array(np.full(len(idx), dx == 0 and dy == 0)),
                        }
                    )
                )
        return pa.concat_tables(out)

    rep = points.map_batches(replicate, batch_format="pyarrow")

    def group_scan(g: pa.Table) -> pa.Table:
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        own = g.column("own").to_numpy(zero_copy_only=False).astype(bool)
        if not own.any():
            return pa.table({"image_id": pa.array([], pa.string()),
                             "is_core": pa.array([], pa.bool_()),
                             "edge_to": pa.array([], pa.string())})
        # pairwise euclidean (deg) block: own points vs all (incl. halo)
        d2 = (lon[own][:, None] - lon[None, :]) ** 2 + (lat[own][:, None] - lat[None, :]) ** 2
        within = d2 <= eps * eps
        counts = within.sum(axis=1)  # includes self
        is_core = counts >= min_pts  # reference counts the point itself
        # neighbour lists: emit one row per (own point, neighbour) within eps
        rows, cols = np.nonzero(within)
        keep = ids[own][rows] != ids[cols]
        rows, cols = rows[keep], cols[keep]
        # one presence row per own point (edge_to='') so isolated points
        # still surface as noise in the merged output
        own_ids = ids[own]
        return pa.table(
            {
                "image_id": pa.array(np.concatenate([own_ids[rows], own_ids])),
                "is_core": pa.array(np.concatenate([is_core[rows], is_core])),
                "edge_to": pa.array(np.concatenate([ids[cols], np.full(len(own_ids), "", dtype=object)])),
            }
        )

    allrows = rep.groupby("cell").map_groups(group_scan, batch_format="pyarrow").to_pandas()
    allrows = allrows.drop_duplicates(subset=["image_id", "edge_to"])
    edges = allrows[allrows["edge_to"] != ""]
    core_ids = set(allrows.loc[allrows["is_core"], "image_id"])
    uf = _UnionFind()
    for cid in core_ids:
        uf.find(cid)
    core_edges = edges[edges["is_core"] & edges["edge_to"].isin(core_ids)]
    for a, b in zip(core_edges["image_id"], core_edges["edge_to"]):
        uf.union(a, b)
    import pandas as pd

    all_ids = sorted(set(allrows["image_id"]))
    label = {}
    for i in all_ids:
        if i in core_ids:
            label[i] = uf.find(i)
    # border points: smallest neighbouring core cluster
    border = edges[~edges["image_id"].isin(core_ids) & edges["edge_to"].isin(core_ids)]
    for a, b in zip(border["image_id"], border["edge_to"]):
        lb = uf.find(b)
        if a not in label or lb < label[a]:
            label[a] = lb
    out = pd.DataFrame(
        {
            "image_id": all_ids,
            "cluster": [label.get(i, "") for i in all_ids],
            "is_core": [i in core_ids for i in all_ids],
        }
    )
    return out


def kmeans(points, k: int, max_iter: int = 10, seed_stride: int | None = None):
    """points: Dataset (image_id, lon, lat) -> (centroids ndarray,
    assignment Dataset).  Iterative: broadcast centroids -> per-batch
    partial (sum, count) per cluster -> driver combine (a k x 3 array —
    no shuffle at all)."""
    n = points.count()
    stride = seed_stride or max(1, n // k)

    # deterministic seeds: first point of every stride-th index via a
    # single pass (ids are img-%012d so index order == lexicographic)
    seeds = (
        points.map_batches(
            lambda t: t.filter(
                pa.array(
                    np.asarray(
                        [int(i[4:]) % stride == 0 for i in t.column("image_id").to_pylist()]
                    )
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("image_id")
        .head(k)
    )
    cent = seeds[["lon", "lat"]].to_numpy().astype(np.float64)
    k = len(cent)

    for _ in range(max_iter):
        cref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            lon = b.column("lon").to_numpy(zero_copy_only=False)
            lat = b.column("lat").to_numpy(zero_copy_only=False)
            d2 = (lon[:, None] - c[None, :, 0]) ** 2 + (lat[:, None] - c[None, :, 1]) ** 2
            a = np.argmin(d2, axis=1)  # ties -> lowest index (np.argmin)
            sx = np.bincount(a, weights=lon, minlength=len(c))
            sy = np.bincount(a, weights=lat, minlength=len(c))
            cnt = np.bincount(a, minlength=len(c))
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                    "sx": pa.array(sx),
                    "sy": pa.array(sy),
                    "cnt": pa.array(cnt.astype(np.int64)),
                }
            )

        parts = points.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("cluster")[["sx", "sy", "cnt"]].sum()
        new = cent.copy()
        nz = agg["cnt"] > 0
        new[agg.index[nz]] = np.column_stack(
            [agg.loc[nz, "sx"] / agg.loc[nz, "cnt"], agg.loc[nz, "sy"] / agg.loc[nz, "cnt"]]
        )
        if np.allclose(new, cent, atol=1e-12):
            cent = new
            break
        cent = new

    cref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        d2 = (lon[:, None] - c[None, :, 0]) ** 2 + (lat[:, None] - c[None, :, 1]) ** 2
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return cent, points.map_batches(assign, batch_format="pyarrow")


def lof_scores(points, k: int = 10):
    """Local Outlier Factor (outlier_detection.rs:26,192 — euclidean,
    k-NN based; outliers(k) returns per-point scores, >1 = outlier-ish).

    Plan: blocked brute-force kNN against a broadcast coordinate matrix
    (validation scale); the 100 TB path swaps stage 1 for georay.knn's
    cell+halo plan.  Stages: (1) per-point kNN + k-distance; (2)
    reachability via neighbours' k-distances (a broadcast lookup — the
    k-distance table is n x 8 bytes, tiny next to the data); (3)
    lrd + LOF.  Ties broken by (distance, neighbor_id) as everywhere.
    """
    import pandas as pd

    full = points.select_columns(["image_id", "lon", "lat"]).to_pandas()
    ids = full["image_id"].to_numpy()
    xy = full[["lon", "lat"]].to_numpy()
    order = np.argsort(ids)
    ids, xy = ids[order], xy[order]
    ref = ray.put((ids, xy))

    def block(b: pa.Table) -> pa.Table:
        gids, gxy = ray.get(ref)
        bid = np.asarray(b.column("image_id").to_pylist(), dtype=object)
        bxy = np.column_stack(
            [b.column("lon").to_numpy(zero_copy_only=False), b.column("lat").to_numpy(zero_copy_only=False)]
        )
        d = np.sqrt(
            (bxy[:, None, 0] - gxy[None, :, 0]) ** 2 + (bxy[:, None, 1] - gxy[None, :, 1]) ** 2
        )
        d[bid[:, None] == gids[None, :]] = np.inf
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(len(bid)), k)
        cols = part.ravel()
        dist = d[rows, cols]
        o = np.lexsort((gids[cols], dist, rows))
        return pa.table(
            {
                "image_id": pa.array(bid[rows[o]]),
                "neighbor_id": pa.array(gids[cols[o]]),
                "dist": pa.array(dist[o]),
            }
        )

    knn = points.map_batches(block, batch_format="pyarrow", batch_size=2048).to_pandas()
    kdist = knn.groupby("image_id")["dist"].max()  # k-distance per point
    knn["reach"] = np.maximum(knn["dist"], kdist.reindex(knn["neighbor_id"]).to_numpy())
    lrd = 1.0 / knn.groupby("image_id")["reach"].mean()
    nbr_lrd = lrd.reindex(knn["neighbor_id"]).to_numpy()
    lof = (
        pd.DataFrame({"image_id": knn["image_id"], "nl": nbr_lrd})
        .groupby("image_id")["nl"]
        .mean()
        / lrd
    )
    return pd.DataFrame({"image_id": lof.index, "lof": lof.to_numpy()}).reset_index(drop=True)
