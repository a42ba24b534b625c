"""Clustering operators: DBSCAN and k-means (SURVEY.md §2.8).

DBSCAN (reference: geo/src/algorithm/dbscan.rs — euclidean eps,
min_pts core rule, border points join any neighbouring core's cluster):
cell-partitioned with halo.  eps must not exceed the cell edge so the
3x3 halo covers every eps-ball.  Fully distributed plan (round-2
rewrite per VERDICT.md #1/#3 — no driver union-find, no full
adjacency):

  1. pass 1: points -> (cell, halo replicas); per cell, vectorized
     neighbour counts -> per-point core flags;
  2. pass 2: re-replicate WITH core flags; per cell, a LOCAL union-find
     over core-core edges incident to own cores emits only its SPANNING
     FOREST (<= n_core-1 edges per group — every global core-core edge
     appears in some group, so the union of per-group forests preserves
     exactly the global core connectivity); border points emit one
     candidate core per local component;
  3. distributed connected components over the forest edges
     (georay.cc: min-label propagation + pointer jumping, O(log n)
     rounds of slim shuffles);
  4. border points attach to the smallest-labelled neighbouring core
     cluster via a co-partitioned label join; final assembly is a
     groupby(image_id) of slim tagged streams.

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
    """points: Dataset (image_id, lon, lat) -> Dataset (image_id,
    cluster, is_core).  Noise is labelled "" (empty string); cluster
    labels are the minimum core image_id of the cluster (deterministic
    across partitionings and parallelism).

    Fully distributed — see the module docstring for the plan; no stage
    materializes more than slim (id, id) rows, and per-group work is
    bounded by the cell's point count."""
    from .cc import attach_labels, connected_components

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

    def _replicate(extra: tuple = ()):
        def rep(b: pa.Table) -> pa.Table:
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
                    take = pa.array(idx, pa.int64())
                    cols = {
                        "cell": pa.array((jx[idx] * n + jy[idx]).astype(np.int64)),
                        "image_id": ids.take(take),
                        "lon": pa.array(lon[idx]),
                        "lat": pa.array(lat[idx]),
                        "own": pa.array(np.full(len(idx), dx == 0 and dy == 0)),
                    }
                    for f in extra:
                        cols[f] = b.column(f).take(take)
                    out.append(pa.table(cols))
            return pa.concat_tables(out)

        return rep

    # ---- pass 1: core flags --------------------------------------------
    def count_scan(g: pa.Table) -> pa.Table:
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        own = g.column("own").to_numpy(zero_copy_only=False).astype(bool)
        if not own.any():
            return pa.table({"image_id": pa.array([], pa.string()),
                             "lon": pa.array([], pa.float64()),
                             "lat": pa.array([], pa.float64()),
                             "is_core": pa.array([], pa.bool_())})
        d2 = (lon[own][:, None] - lon[None, :]) ** 2 + (lat[own][:, None] - lat[None, :]) ** 2
        counts = (d2 <= eps * eps).sum(axis=1)  # includes self
        return pa.table(
            {
                "image_id": g.column("image_id").filter(pa.array(own)),
                "lon": pa.array(lon[own]),
                "lat": pa.array(lat[own]),
                "is_core": pa.array(counts >= min_pts),  # reference counts self
            }
        )

    flagged = (
        points.map_batches(_replicate(), batch_format="pyarrow")
        .groupby("cell")
        .map_groups(count_scan, batch_format="pyarrow")
        .materialize()  # consumed by pass 2 AND final assembly
    )

    # ---- pass 2: spanning forest + border candidates -------------------
    def forest_scan(g: pa.Table) -> pa.Table:
        """Emit (kind=0) forest edges over core-core connectivity and
        (kind=1) border->candidate-core rows; <= n_own + n_core rows."""
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        own = g.column("own").to_numpy(zero_copy_only=False).astype(bool)
        core = g.column("is_core").to_numpy(zero_copy_only=False).astype(bool)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if not own.any():
            return empty
        oc = own & core  # own cores
        out_k, out_a, out_b = [], [], []
        uf = _UnionFind()
        if oc.any() and core.any():
            d2 = (lon[oc][:, None] - lon[None, core]) ** 2 + (lat[oc][:, None] - lat[None, core]) ** 2
            within = d2 <= eps * eps
            rows, cols = np.nonzero(within)
            a_ids, b_ids = ids[oc][rows], ids[core][cols]
            keep = a_ids != b_ids
            for x, y in zip(a_ids[keep], b_ids[keep]):
                if uf.find(x) != uf.find(y):  # merging edge -> forest edge
                    uf.union(x, y)
                    out_k.append(0)
                    out_a.append(x)
                    out_b.append(y)
        ob = own & ~core  # own border/noise candidates
        if ob.any() and core.any():
            d2 = (lon[ob][:, None] - lon[None, core]) ** 2 + (lat[ob][:, None] - lat[None, core]) ** 2
            within = d2 <= eps * eps
            b_ids_all = ids[core]
            for i in np.nonzero(within.any(axis=1))[0]:
                nbrs = b_ids_all[within[i]]
                nbrs = nbrs[nbrs != ids[ob][i]]
                if not len(nbrs):
                    continue
                # one candidate per LOCAL component: min core id per root
                best: dict = {}
                for c in nbrs:
                    r = uf.find(c)
                    if r not in best or c < best[r]:
                        best[r] = c
                for c in best.values():
                    out_k.append(1)
                    out_a.append(ids[ob][i])
                    out_b.append(c)
        if not out_k:
            return empty
        return pa.table({"kind": pa.array(out_k, pa.int64()),
                         "a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())})

    scan = (
        flagged.map_batches(_replicate(("is_core",)), batch_format="pyarrow")
        .groupby("cell")
        .map_groups(forest_scan, batch_format="pyarrow")
        .materialize()  # consumed twice (edges + border candidates)
    )
    import pyarrow.compute as pc

    edges = scan.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(["a", "b"]),
        batch_format="pyarrow",
    )
    cands = scan.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1)).select(["a", "b"]),
        batch_format="pyarrow",
    )

    # ---- pass 3: distributed components over the forest ----------------
    labels = connected_components(edges, typ=pa.string()).materialize()

    # ---- pass 4: border labels -----------------------------------------
    # candidates (border a, core b) pick up core b's final label, then
    # reduce to the minimum per border point
    def cand_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"core": t.column("b"), "border": t.column("a")})

    cand_lbl = attach_labels(
        cands.map_batches(cand_nodes, batch_format="pyarrow"), labels, "core",
        types_map={"core": pa.string(), "border": pa.string()},
    )

    def min_border(gr: pa.Table) -> pa.Table:
        lbl = pc.min(gr.column("label"))
        return pa.table({"image_id": gr.column("border").slice(0, 1),
                         "lbl": pa.array([lbl.as_py()], pa.string()),
                         "is_core_t": pa.nulls(1, pa.bool_())})

    border_rows = cand_lbl.groupby("border").map_groups(min_border, batch_format="pyarrow")

    # ---- pass 5: assembly ----------------------------------------------
    core_nodes = flagged.map_batches(
        lambda t: t.filter(t.column("is_core")).select(["image_id"]),
        batch_format="pyarrow",
    )
    core_rows = attach_labels(
        core_nodes, labels, "image_id", types_map={"image_id": pa.string()}
    ).map_batches(
        lambda t: pa.table({"image_id": t.column("image_id"),
                            "lbl": t.column("label"),
                            "is_core_t": pa.nulls(len(t), pa.bool_())}),
        batch_format="pyarrow",
    )
    base_rows = flagged.map_batches(
        lambda t: pa.table({"image_id": t.column("image_id"),
                            "lbl": pa.nulls(len(t), pa.string()),
                            "is_core_t": t.column("is_core")}),
        batch_format="pyarrow",
    )

    def assemble(gr: pa.Table) -> pa.Table:
        lbls = gr.column("lbl").drop_null()
        cl = lbls[0].as_py() if len(lbls) else ""
        is_core = gr.column("is_core_t").drop_null()[0].as_py()
        return pa.table({"image_id": gr.column("image_id").slice(0, 1),
                         "cluster": pa.array([cl], pa.string()),
                         "is_core": pa.array([is_core], pa.bool_())})

    return (
        base_rows.union(core_rows)
        .union(border_rows)
        .groupby("image_id")
        .map_groups(assemble, batch_format="pyarrow")
    )


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


def lof_scores(points, k: int = 10, num_partitions: int = 16):
    """Local Outlier Factor (outlier_detection.rs:26,192 — euclidean,
    k-NN based; outliers(k) returns per-point scores, >1 = outlier-ish).

    Fully distributed (round-2 rewrite per VERDICT.md #4): stage 1 is
    the cell+halo exact kNN (georay.knn, euclidean metric) instead of a
    broadcast O(n^2) brute force; the k-distance, lrd and LOF stages are
    co-partitioned equi-joins of slim (id, float) tables + groupbys —
    nothing materializes on the driver.  Per-group float sums run in
    neighbor_id-sorted order, so output is bit-deterministic across
    partitionings.  Ties broken by (distance, neighbor_id) as
    everywhere.  Returns Dataset (image_id, lof)."""
    import pyarrow.compute as pc

    from .knn import knn_full

    knn = knn_full(points, k=k, metric="euclidean").materialize()

    def kd(g: pa.Table) -> pa.Table:
        return pa.table(
            {"nid": g.column("image_id").slice(0, 1),
             "kdist": pa.array([pc.max(g.column("dist_m")).as_py()], pa.float64())}
        )

    kdist = knn.groupby("image_id").map_groups(kd, batch_format="pyarrow")
    # aggregator actors must not reserve CPUs: on a small/busy cluster a
    # CPU-reserving aggregator deadlocks against the map stages feeding it
    _agg = {"num_cpus": 0}
    j1 = knn.join(kdist, join_type="inner", num_partitions=num_partitions,
                  on=("neighbor_id",), right_on=("nid",),
                  aggregator_ray_remote_args=_agg)

    def lrd_g(g: pa.Table) -> pa.Table:
        reach = np.maximum(
            g.column("dist_m").to_numpy(zero_copy_only=False),
            g.column("kdist").to_numpy(zero_copy_only=False),
        )
        nid = np.asarray(g.column("neighbor_id").to_pylist(), dtype=object)
        order = np.argsort(nid)  # deterministic summation order
        return pa.table(
            {"lid": g.column("image_id").slice(0, 1),
             "lrd": pa.array([1.0 / (reach[order].sum() / len(reach))], pa.float64())}
        )

    lrd = (
        j1.groupby("image_id").map_groups(lrd_g, batch_format="pyarrow").materialize()
    )
    j2 = knn.join(lrd, join_type="inner", num_partitions=num_partitions,
                  on=("neighbor_id",), right_on=("lid",),
                  aggregator_ray_remote_args=_agg)

    def nbr_g(g: pa.Table) -> pa.Table:
        v = g.column("lrd").to_numpy(zero_copy_only=False)
        nid = np.asarray(g.column("neighbor_id").to_pylist(), dtype=object)
        order = np.argsort(nid)
        return pa.table(
            {"mid": g.column("image_id").slice(0, 1),
             "nbr_lrd_mean": pa.array([v[order].sum() / len(v)], pa.float64())}
        )

    nbr = j2.groupby("image_id").map_groups(nbr_g, batch_format="pyarrow")
    j3 = nbr.join(lrd, join_type="inner", num_partitions=num_partitions,
                  on=("mid",), right_on=("lid",),
                  aggregator_ray_remote_args=_agg)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"image_id": t.column("mid"),
             "lof": pa.array(
                 t.column("nbr_lrd_mean").to_numpy(zero_copy_only=False)
                 / t.column("lrd").to_numpy(zero_copy_only=False)
             )}
        )

    return j3.map_batches(fin, batch_format="pyarrow")
