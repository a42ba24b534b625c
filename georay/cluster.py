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
        """Emit (kind=0) star edges over core-core connectivity and
        (kind=1) border->candidate-core rows; <= n_own + n_core rows.

        Round-3 vectorization (VERDICT r2 #2): local components come
        from numpy min-label propagation + pointer jumping over the
        within-eps core pairs — no per-edge Python union-find.  Each
        local component emits a STAR (root -> member) instead of an
        arbitrary spanning tree: same connectivity, so the union over
        cells still preserves exactly the global core connectivity."""
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        own = g.column("own").to_numpy(zero_copy_only=False).astype(bool)
        core = g.column("is_core").to_numpy(zero_copy_only=False).astype(bool)
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if not own.any() or not core.any():
            return empty
        # local indices over the cores present in this group, ordered by
        # id so index comparisons == lexicographic id comparisons
        import pyarrow.compute as pc

        core_ids = g.column("image_id").filter(pa.array(core)).combine_chunks()
        order = pc.sort_indices(core_ids).to_numpy(zero_copy_only=False).astype(np.int64)
        c_lon, c_lat = lon[core][order], lat[core][order]
        c_own = own[core][order]
        nc = len(order)
        ids_sorted = core_ids.take(pa.array(order, pa.int64()))

        # within-eps core pairs incident to an own core (others cannot
        # be merged by this cell's evidence)
        d2 = (c_lon[c_own][:, None] - c_lon[None, :]) ** 2 + (
            c_lat[c_own][:, None] - c_lat[None, :]
        ) ** 2
        rows, cols = np.nonzero(d2 <= eps * eps)
        src = np.nonzero(c_own)[0][rows]
        keep = src != cols
        ea = np.concatenate([src[keep], cols[keep]])
        eb = np.concatenate([cols[keep], src[keep]])

        # min-label propagation + pointer jumping (all numpy)
        lbl = np.arange(nc, dtype=np.int64)
        while True:
            new = lbl.copy()
            np.minimum.at(new, ea, lbl[eb])
            new = np.minimum(new, new[new])  # pointer jump
            if np.array_equal(new, lbl):
                break
            lbl = new

        tabs = []
        star = lbl != np.arange(nc)
        if star.any():
            mi = np.nonzero(star)[0]
            tabs.append(pa.table({
                "kind": pa.array(np.zeros(len(mi), np.int64)),
                "a": ids_sorted.take(pa.array(lbl[mi], pa.int64())),
                "b": ids_sorted.take(pa.array(mi, pa.int64())),
            }))

        ob = own & ~core  # own border/noise candidates
        if ob.any():
            b_lon, b_lat = lon[ob], lat[ob]
            d2b = (b_lon[:, None] - c_lon[None, :]) ** 2 + (
                b_lat[:, None] - c_lat[None, :]
            ) ** 2
            bi, cj = np.nonzero(d2b <= eps * eps)
            if len(bi):
                # one candidate per (border, local component): the min
                # core id, i.e. min local index (ids_sorted is ordered)
                key = bi * np.int64(nc) + lbl[cj]
                uk, inv = np.unique(key, return_inverse=True)
                best = np.full(len(uk), nc, np.int64)
                np.minimum.at(best, inv, cj)
                ub = (uk // np.int64(nc)).astype(np.int64)
                border_ids = g.column("image_id").filter(pa.array(ob)).combine_chunks()
                tabs.append(pa.table({
                    "kind": pa.array(np.ones(len(uk), np.int64)),
                    "a": border_ids.take(pa.array(ub, pa.int64())),
                    "b": ids_sorted.take(pa.array(best, pa.int64())),
                }))
        if not tabs:
            return empty
        return pa.concat_tables(tabs)

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

    # min label per border point — bucketed vectorized reduce (r3)
    from .shuffleops import bucket_join, bucket_reduce

    border_rows = bucket_reduce(
        cand_lbl.map_batches(
            lambda t: pa.table({"image_id": t.column("border"),
                                "lbl": t.column("label")}),
            batch_format="pyarrow",
        ),
        "image_id", [("lbl", "min")],
    )

    # ---- pass 5: assembly ----------------------------------------------
    # every own point has exactly ONE flagged row; cores and labelled
    # borders each have at most one label row (disjoint sets), so the
    # assembly is a plain left join + coalesce — no per-point groups
    core_rows = attach_labels(
        flagged.map_batches(
            lambda t: t.filter(t.column("is_core")).select(["image_id"]),
            batch_format="pyarrow",
        ),
        labels, "image_id", types_map={"image_id": pa.string()},
    ).map_batches(
        lambda t: pa.table({"image_id": t.column("image_id"),
                            "lbl": t.column("label")}),
        batch_format="pyarrow",
    )
    lbl_rows = core_rows.union(border_rows)

    joined = bucket_join(
        flagged.map_batches(
            lambda t: t.select(["image_id", "is_core"]), batch_format="pyarrow"
        ),
        lbl_rows, "image_id", "image_id", how="left outer",
        left_types={"image_id": pa.string(), "is_core": pa.bool_()},
        right_types={"image_id": pa.string(), "lbl": pa.string()},
    )

    def finish(t: pa.Table) -> pa.Table:
        cl = pc.coalesce(t.column("lbl"), pa.scalar("", pa.string()))
        return pa.table({"image_id": t.column("image_id"),
                         "cluster": cl,
                         "is_core": t.column("is_core")})

    return joined.map_batches(finish, batch_format="pyarrow")


def kmeans(
    points,
    k: int,
    max_iter: int = 10,
    seed_stride: int | None = None,
    tolerance: float = 1e-4,
    max_radius: float | None = None,
    max_split_depth: int = 10,
):
    """points: Dataset (image_id, lon, lat) -> (centroids ndarray,
    assignment Dataset).  Iterative: broadcast centroids -> per-batch
    partial (sum, count) per cluster -> driver combine (a k x 3 array —
    no shuffle at all).

    ``tolerance`` / ``max_radius`` / ``max_split_depth`` mirror the
    reference KMeansParams (kmeans/mod.rs:166-250): iteration stops
    when the max centroid shift drops below ``tolerance``; when
    ``max_radius`` is set, clusters whose farthest member exceeds it
    are split by a 2-means pass (children seeded at the parent
    centroid and its farthest point), repeated up to
    ``max_split_depth`` rounds — so MORE than k clusters may return.
    Split labels are replayed per batch from the recorded centroid
    history (no per-point label materialization between rounds).

    The slim (id, lon, lat) input is materialized ONCE up front: an
    iterative algorithm re-executes its input per pass (count + seeds
    + max_iter + up to max_split_depth*(1+max_iter) passes), and
    re-running the upstream read every time costs far more than
    holding ~24 bytes/row in the object store (which spills)."""
    points = points.materialize()
    n = points.count()
    stride = seed_stride or max(1, n // k)

    # deterministic seeds: first point of every stride-th index via a
    # single pass (ids are img-%012d so index order == lexicographic)
    def _seed_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.cast(
            pc.utf8_slice_codeunits(t.column("image_id"), 4, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(idx % stride == 0))

    seeds = (
        points.map_batches(_seed_filter, batch_format="pyarrow")
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
        shift = np.sqrt(((new - cent) ** 2).sum(axis=1)).max() if len(cent) else 0.0
        cent = new
        if shift < tolerance:
            break

    # --- max_radius subdivision rounds (kmeans/mod.rs apply_max_radius_constraint)
    centers = cent.copy()  # (m, 2), ids == row index; parents first; cent
    # itself stays the FROZEN parent matrix every label replay starts from
    history: list[list[tuple[int, np.ndarray, np.ndarray, int]]] = []

    def _labels(lon: np.ndarray, lat: np.ndarray, cents, hist) -> np.ndarray:
        """Replay: argmin over the frozen parent centroids, then each
        recorded split round's binary child choice."""
        d2 = (lon[:, None] - cents[None, : , 0]) ** 2 + (lat[:, None] - cents[None, :, 1]) ** 2
        lbl = np.argmin(d2, axis=1).astype(np.int64)
        for round_splits in hist:
            for c, ch0, ch1, new_id in round_splits:
                m = lbl == c
                if not m.any():
                    continue
                d0 = (lon[m] - ch0[0]) ** 2 + (lat[m] - ch0[1]) ** 2
                d1 = (lon[m] - ch1[0]) ** 2 + (lat[m] - ch1[1]) ** 2
                sub = lbl[m]
                sub[d1 < d0] = new_id
                lbl[m] = sub
        return lbl

    if max_radius is not None:
        base = ray.put(cent)
        for _depth in range(max_split_depth):
            n_ids = len(centers)
            href = ray.put((centers, history))

            def radius_partial(b: pa.Table) -> pa.Table:
                cents, hist = ray.get(href)
                lon = b.column("lon").to_numpy(zero_copy_only=False)
                lat = b.column("lat").to_numpy(zero_copy_only=False)
                lbl = _labels(lon, lat, ray.get(base), hist)
                d = np.sqrt((lon - cents[lbl, 0]) ** 2 + (lat - cents[lbl, 1]) ** 2)
                # per-cluster farthest point, ties by (d, lon, lat)
                order = np.lexsort((lat, lon, d, lbl))
                lbl_s, d_s, lon_s, lat_s = lbl[order], d[order], lon[order], lat[order]
                last = np.r_[lbl_s[1:] != lbl_s[:-1], True]
                idx = np.nonzero(last)[0]
                return pa.table(
                    {"cluster": pa.array(lbl_s[idx]), "maxd": pa.array(d_s[idx]),
                     "flon": pa.array(lon_s[idx]), "flat": pa.array(lat_s[idx])}
                )

            rp = points.map_batches(radius_partial, batch_format="pyarrow").to_pandas()
            rp = rp.sort_values(["cluster", "maxd", "flon", "flat"]).groupby("cluster").last()
            bad = rp[rp["maxd"] > max_radius]
            if len(bad) == 0:
                break
            # one simultaneous 2-means per oversized cluster
            bad_ids = np.asarray(sorted(bad.index), dtype=np.int64)
            ch0 = centers[bad_ids].copy()
            ch1 = np.column_stack(
                [bad.loc[bad_ids, "flon"].to_numpy(), bad.loc[bad_ids, "flat"].to_numpy()]
            )
            for _ in range(max_iter):
                sref = ray.put((bad_ids, ch0, ch1, history))

                def split_partial(b: pa.Table) -> pa.Table:
                    bids, c0, c1, hist = ray.get(sref)
                    lon = b.column("lon").to_numpy(zero_copy_only=False)
                    lat = b.column("lat").to_numpy(zero_copy_only=False)
                    lbl = _labels(lon, lat, ray.get(base), hist)
                    pos = np.searchsorted(bids, lbl)
                    pos_ok = (pos < len(bids)) & (bids[np.minimum(pos, len(bids) - 1)] == lbl)
                    rows = np.nonzero(pos_ok)[0]
                    j = pos[rows]
                    d0 = (lon[rows] - c0[j, 0]) ** 2 + (lat[rows] - c0[j, 1]) ** 2
                    d1 = (lon[rows] - c1[j, 0]) ** 2 + (lat[rows] - c1[j, 1]) ** 2
                    side = (d1 < d0).astype(np.int64)
                    key = j * 2 + side
                    sx = np.bincount(key, weights=lon[rows], minlength=2 * len(bids))
                    sy = np.bincount(key, weights=lat[rows], minlength=2 * len(bids))
                    cnt = np.bincount(key, minlength=2 * len(bids))
                    return pa.table(
                        {"key": pa.array(np.arange(2 * len(bids), dtype=np.int64)),
                         "sx": pa.array(sx.astype(np.float64)),
                         "sy": pa.array(sy.astype(np.float64)),
                         "cnt": pa.array(cnt.astype(np.int64))}
                    )

                sp = points.map_batches(split_partial, batch_format="pyarrow").to_pandas()
                agg = sp.groupby("key")[["sx", "sy", "cnt"]].sum()
                shift = 0.0
                for j in range(len(bad_ids)):
                    for side, arr in ((0, ch0), (1, ch1)):
                        row = agg.loc[2 * j + side]
                        if row["cnt"] > 0:
                            nc = np.array([row["sx"] / row["cnt"], row["sy"] / row["cnt"]])
                            shift = max(shift, float(np.hypot(*(nc - arr[j]))))
                            arr[j] = nc
                if shift < tolerance:
                    break
            round_splits = []
            new_centers = [centers]
            for j, c in enumerate(bad_ids):
                new_id = n_ids + j
                round_splits.append((int(c), ch0[j].copy(), ch1[j].copy(), new_id))
                centers[c] = ch0[j]
                new_centers.append(ch1[j][None, :])
            centers = np.vstack(new_centers)
            history.append(round_splits)

    base_ref = ray.put(cent)
    hist_ref = ray.put(history)

    def assign(b: pa.Table) -> pa.Table:
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lbl = _labels(lon, lat, ray.get(base_ref), ray.get(hist_ref))
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "cluster": pa.array(lbl),
            }
        )

    return centers, points.map_batches(assign, batch_format="pyarrow")


def lof_scores(points, k: int = 10, num_partitions: int = 16):
    """Local Outlier Factor (outlier_detection.rs:26,192 — euclidean,
    k-NN based; outliers(k) returns per-point scores, >1 = outlier-ish).

    Fully distributed (round-2 rewrite per VERDICT.md #4; round-3
    bucketed-vectorized tails per VERDICT r2 #1): stage 1 is the
    cell+halo exact kNN (georay.knn, euclidean metric) instead of a
    broadcast O(n^2) brute force; the k-distance, lrd and LOF stages
    are bucketed vectorized reductions (shuffleops.bucket_reduce — one
    Arrow C++ hash aggregation per bucket, never one Python call per
    point) + slim equi-joins.  Buckets sort by (image_id, neighbor_id)
    before the float sums, so output is bit-deterministic across
    partitionings.  Ties broken by (distance, neighbor_id) as
    everywhere.  Returns Dataset (image_id, lof)."""
    from .knn import knn_full
    from .shuffleops import bucket_join, bucket_reduce

    knn = knn_full(points, k=k, metric="euclidean").materialize()
    # slim equi-joins via the bucketed Acero join (r4b: Ray's native
    # Dataset.join spins one aggregator actor pool per join — three
    # joins of fixed actor-startup cost dominated small inputs; the
    # bucketed plan reuses the ordinary task pool)
    _knn_t = {"image_id": pa.string(), "neighbor_id": pa.string(),
              "dist_m": pa.float64()}

    kdist = bucket_reduce(knn, "image_id", [("dist_m", "max")]).map_batches(
        lambda t: t.rename_columns(["nid", "kdist"]), batch_format="pyarrow"
    )
    j1 = bucket_join(
        knn.map_batches(lambda t: t.select(["image_id", "neighbor_id", "dist_m"]),
                        batch_format="pyarrow"),
        kdist, "neighbor_id", "nid", p=num_partitions,
        left_types=_knn_t,
        right_types={"nid": pa.string(), "kdist": pa.float64()},
    )

    def reach_rows(t: pa.Table) -> pa.Table:
        reach = np.maximum(
            t.column("dist_m").to_numpy(zero_copy_only=False),
            t.column("kdist").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"image_id": t.column("image_id"),
             "neighbor_id": t.column("neighbor_id"),
             "reach": pa.array(reach, pa.float64()),
             "one": pa.array(np.ones(len(t), np.int64))}
        )

    lrd = (
        bucket_reduce(
            j1.map_batches(reach_rows, batch_format="pyarrow"),
            "image_id", [("reach", "sum"), ("one", "sum")],
            sort_by=["image_id", "neighbor_id"],
        )
        .map_batches(
            lambda t: pa.table(
                {"lid": t.column("image_id"),
                 "lrd": pa.array(
                     t.column("one").to_numpy(zero_copy_only=False)
                     / t.column("reach").to_numpy(zero_copy_only=False),
                     pa.float64(),
                 )}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    j2 = bucket_join(
        knn.map_batches(lambda t: t.select(["image_id", "neighbor_id", "dist_m"]),
                        batch_format="pyarrow"),
        lrd, "neighbor_id", "lid", p=num_partitions,
        left_types=_knn_t,
        right_types={"lid": pa.string(), "lrd": pa.float64()},
    )

    def lrd_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"image_id": t.column("image_id"),
             "neighbor_id": t.column("neighbor_id"),
             "lrd_n": t.column("lrd"),
             "one": pa.array(np.ones(len(t), np.int64))}
        )

    nbr = bucket_reduce(
        j2.map_batches(lrd_rows, batch_format="pyarrow"),
        "image_id", [("lrd_n", "sum"), ("one", "sum")],
        sort_by=["image_id", "neighbor_id"],
    ).map_batches(
        lambda t: pa.table(
            {"mid": t.column("image_id"),
             "nbr_lrd_mean": pa.array(
                 t.column("lrd_n").to_numpy(zero_copy_only=False)
                 / t.column("one").to_numpy(zero_copy_only=False),
                 pa.float64(),
             )}
        ),
        batch_format="pyarrow",
    )
    j3 = bucket_join(
        nbr, lrd, "mid", "lid", p=num_partitions,
        left_types={"mid": pa.string(), "nbr_lrd_mean": pa.float64()},
        right_types={"lid": pa.string(), "lrd": pa.float64()},
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"image_id": t.column("mid"),
             "lof": pa.array(
                 t.column("nbr_lrd_mean").to_numpy(zero_copy_only=False)
                 / t.column("lrd").to_numpy(zero_copy_only=False)
             )}
        )

    return j3.map_batches(fin, batch_format="pyarrow")
