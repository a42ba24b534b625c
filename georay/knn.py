"""Distributed self-kNN: cell + halo co-partition with exact fallback.

The reference's kNN engine is a BallTree (ball_tree.rs:380-658, queries
sorted by distance).  The Ray-native plan (SURVEY.md §7 step 6):

1. every point gets its quad-cell at a density-derived resolution;
2. each point is replicated as a CANDIDATE to its 3x3 cell neighborhood
   (slim columns only) and as a QUERY to its own cell;
3. ``groupby(cell).map_groups`` brute-forces queries x candidates per
   group (vectorized haversine block, ties broken by (distance,
   neighbor_id) like ball_tree's deterministic ordering);
4. a per-query GUARANTEE bound (provable lower bound on the distance to
   anything outside the halo: dist >= R*dphi and dist >=
   (2/pi)*R*cos(phi_max)*dlambda) certifies most results exact; the few
   uncertified queries (sparse cells, grid edges, antimeridian) rerun
   against the full dataset via the broadcast partial-top-k pattern.

Everything streams; the only wide op is the groupby(cell) shuffle of
slim (id, lon, lat) projections.  Replication factor is 9 on the slim
side — never on payload columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from . import cells
from .kernels.measures import MEAN_EARTH_RADIUS, haversine_distance


def pick_resolution(n_points: int, target_per_cell: int = 64) -> int:
    """Cell resolution so the mean occupied cell holds ~target points."""
    n_cells = max(1.0, n_points / target_per_cell)
    return int(np.clip(np.floor(np.log2(np.sqrt(n_cells))), 2, 16))


def _lon_edge_bound(phi1: np.ndarray, dlam: np.ndarray) -> np.ndarray:
    """Sound lower bound (radians of arc) on the distance to any point
    whose longitude differs by >= dlam.  Split on latitude: a point
    either moved >= D in latitude (dist >= D) or stayed within D of
    phi1, where cos(phi2) >= cos(|phi1| + D) bounds the haversine's
    longitude term (using asin x >= x and sin t >= (2/pi) t)."""
    base = (2.0 / np.pi) * np.cos(phi1) * dlam
    d = 0.5 * np.maximum(base, 0.0)
    phi_cap = np.minimum(np.abs(phi1) + d, np.pi / 2)
    alt = (2.0 / np.pi) * np.cos(phi_cap) * dlam
    return np.minimum(d, np.maximum(alt, 0.0))


def _halo_guarantee(lon, lat, ix, iy, res, ring: int = 1):
    """Lower bound on the haversine distance from each point to the
    nearest location OUTSIDE its (2*ring+1)^2 halo (inf when the halo
    covers the whole sphere in that direction).  Longitude WRAPS: the
    replication step sends candidates across the antimeridian (jx mod
    n), so the halo's west/east edges are genuine cell edges even at
    +-180 and the bound must NOT clamp there (round-2 fix — clamping
    flagged the entire antimeridian band for the exact fallback)."""
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n
    lon_w = (ix - ring) * cw - 180.0
    lon_e = (ix + ring + 1) * cw - 180.0
    lat_s = (iy - ring) * ch - 90.0
    lat_n = (iy + ring + 1) * ch - 90.0
    phi1 = np.radians(lat)
    d_s = np.where(lat_s <= -90.0, np.inf, np.radians(lat - lat_s))
    d_n = np.where(lat_n >= 90.0, np.inf, np.radians(lat_n - lat))
    halo_covers_circle = (2 * ring + 1) >= n
    d_w = _lon_edge_bound(phi1, np.radians(lon - lon_w))
    d_e = _lon_edge_bound(phi1, np.radians(lon_e - lon))
    if halo_covers_circle:
        d_w = np.full_like(d_w, np.inf)
        d_e = np.full_like(d_e, np.inf)
    g = np.minimum(np.minimum(d_s, d_n), np.minimum(d_w, d_e))
    return MEAN_EARTH_RADIUS * np.maximum(g, 0.0)


def _halo_guarantee_euclid(lon, lat, ix, iy, res, ring: int = 1):
    """Euclidean-degrees analogue of _halo_guarantee: the planar domain
    is the bounded rectangle [-180,180]x[-90,90] (no wrap), so a halo
    clipped at a domain edge has NOTHING beyond it -> inf bound."""
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n
    d_w = np.where(ix - ring < 0, np.inf, lon - ((ix - ring) * cw - 180.0))
    d_e = np.where(ix + ring + 1 > n, np.inf, ((ix + ring + 1) * cw - 180.0) - lon)
    d_s = np.where(iy - ring < 0, np.inf, lat - ((iy - ring) * ch - 90.0))
    d_n = np.where(iy + ring + 1 > n, np.inf, ((iy + ring + 1) * ch - 90.0) - lat)
    g = np.minimum(np.minimum(d_s, d_n), np.minimum(d_w, d_e))
    return np.maximum(g, 0.0)


def _pair_dist(qlon, qlat, clon, clat, metric):
    if metric == "euclidean":
        return np.sqrt((qlon - clon) ** 2 + (qlat - clat) ** 2)
    return haversine_distance(qlon, qlat, clon, clat)


def _topk_block(qlon, qlat, qid, clon, clat, cid, k, metric="haversine"):
    """Vectorized (queries x candidates) top-k, self-excluded,
    tie-broken by (distance, neighbor_id). Returns ragged arrays.

    Boundary ties are EXACT (r5): candidates tied at the kth distance
    select by smallest id — a plain argpartition on distance picks
    arbitrary tied members (latent until the duplicate-point
    adversarial test), so selection partitions a composite key of
    (strictly-closer | tied-by-id-rank | farther) instead."""
    d = _pair_dist(qlon[:, None], qlat[:, None], clon[None, :], clat[None, :], metric)
    d[qid[:, None] == cid[None, :]] = np.inf
    kk = min(k, d.shape[1])
    uid, crank = np.unique(cid, return_inverse=True)
    crank = crank.astype(np.float64)
    if d.shape[1] > kk:
        kthd = np.partition(d, kk - 1, axis=1)[:, kk - 1 : kk]
        key = np.where(
            d < kthd, crank[None, :] - 2.0**33,
            np.where(d == kthd, crank[None, :], np.inf),
        )
        part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
    else:
        part = np.tile(np.arange(d.shape[1]), (len(qid), 1))
    rows = np.repeat(np.arange(len(qid)), part.shape[1])
    cols = part.ravel()
    dist = d[rows, cols]
    # per-query deterministic ordering (integer id ranks: object-dtype
    # lexsort keys dominated this sort's cost)
    order = np.lexsort((crank[cols], dist, rows))
    return rows[order], cols[order], dist[order]


def _topk_pruned(qlon, qlat, qid, clon, clat, cid, k, metric="haversine"):
    """Exact top-k with an in-group sub-grid refinement (r5, VERDICT
    r4 #6 — replaces the full queries x candidates block in dense
    cells): result is IDENTICAL to _topk_block.

    The group's candidates bucket into an s x s sub-grid sized so a
    3x3 neighborhood holds ~18k candidates; each query scans only its
    3x3 block (CSR gather, all-numeric lexsort — ids tie-break through
    a precomputed integer rank).  A query is CERTIFIED in-group when
    its kth distance is strictly below the provable bound to anything
    outside its 3x3 block (R*dphi / _lon_edge_bound, the same sound
    bounds as the cell-level halo guarantee); the few uncertified
    queries (block edges, sparse corners) rerun against the group's
    full candidate set.  Dense groups drop from O(q*c) to O(q*18k);
    degenerate shapes (tiny groups, one hot bucket) fall back."""
    from .geom import _ranges

    q, c = len(qlon), len(clon)
    if c <= max(64, 4 * k) or q * c <= (1 << 20):
        return _topk_block(qlon, qlat, qid, clon, clat, cid, k, metric)
    # ---- bucket candidates into an s x s sub-grid over the group bbox
    s = int(np.clip(np.sqrt(c / (2.0 * k)), 2, 256))
    x0, x1 = float(clon.min()), float(clon.max())
    y0, y1 = float(clat.min()), float(clat.max())
    wx = (x1 - x0) / s or 1.0
    wy = (y1 - y0) / s or 1.0
    cbx = np.clip(((clon - x0) / wx).astype(np.int64), 0, s - 1)
    cby = np.clip(((clat - y0) / wy).astype(np.int64), 0, s - 1)
    bid = cby * s + cbx
    order = np.argsort(bid, kind="stable")
    bstart = np.searchsorted(bid[order], np.arange(s * s + 1))
    qbx = np.clip(((qlon - x0) / wx).astype(np.int64), 0, s - 1)
    qby = np.clip(((qlat - y0) / wy).astype(np.int64), 0, s - 1)
    # ---- CSR gather of each query's 3x3 block (9 ragged segments)
    pq_parts, pc_parts, tot = [], [], 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            jx, jy = qbx + dx, qby + dy
            ok = (jx >= 0) & (jx < s) & (jy >= 0) & (jy < s)
            nb = np.where(ok, jy * s + jx, 0)
            lo, hi = bstart[nb], bstart[nb + 1]
            ln = np.where(ok, hi - lo, 0)
            pq_parts.append(np.repeat(np.arange(q, dtype=np.int64), ln))
            pc_parts.append(lo[pq_parts[-1]] + _ranges(ln))
            tot += int(ln.sum())
    if tot * 2 >= q * c:  # skewed buckets: the grid buys nothing
        return _topk_block(qlon, qlat, qid, clon, clat, cid, k, metric)
    pq = np.concatenate(pq_parts)
    pc = order[np.concatenate(pc_parts)]
    # ids tie-break as INTEGER ranks (object-dtype lexsort keys are the
    # slow path the first cut of this function died on)
    uid, crank = np.unique(cid, return_inverse=True)
    qrank = np.searchsorted(uid, qid)
    qrank[uid[np.minimum(qrank, len(uid) - 1)] != qid] = -1  # query not in candidates
    d = _pair_dist(qlon[pq], qlat[pq], clon[pc], clat[pc], metric)
    d[qrank[pq] == crank[pc]] = np.inf
    ord2 = np.lexsort((crank[pc], d, pq))
    pq, pc, d = pq[ord2], pc[ord2], d[ord2]
    cnt = np.bincount(pq, minlength=q)
    starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnt)[:-1]])
    pos = np.arange(len(pq), dtype=np.int64) - starts[pq]
    keep = (pos < k) & np.isfinite(d)
    # ---- certify: kth in-block distance strictly under the provable
    # bound to anything OUTSIDE the 3x3 block
    kth = np.full(q, np.inf)
    got = np.bincount(pq[keep], minlength=q)
    ends = starts + np.minimum(cnt, k) - 1
    has = got > 0
    kth[has] = d[ends[has]]
    ex_lo = x0 + (qbx - 1) * wx
    ex_hi = x0 + (qbx + 2) * wx
    ey_lo = y0 + (qby - 1) * wy
    ey_hi = y0 + (qby + 2) * wy
    if metric == "euclidean":
        bound = np.minimum(
            np.minimum(qlon - ex_lo, ex_hi - qlon),
            np.minimum(qlat - ey_lo, ey_hi - qlat),
        )
    else:
        phi1 = np.radians(qlat)
        b_we = np.minimum(
            _lon_edge_bound(phi1, np.radians(qlon - ex_lo)),
            _lon_edge_bound(phi1, np.radians(ex_hi - qlon)),
        )
        b_sn = np.radians(np.minimum(qlat - ey_lo, ey_hi - qlat))
        bound = MEAN_EARTH_RADIUS * np.maximum(np.minimum(b_we, b_sn), 0.0)
    certified = (got >= k) & (kth < bound)
    if certified.all():
        return pq[keep], pc[keep], d[keep]
    # ---- escalate the residue against the group's full candidate set
    unc = np.nonzero(~certified)[0]
    r2, c2, d2 = _topk_block(
        qlon[unc], qlat[unc], qid[unc], clon, clat, cid, k, metric
    )
    keep &= certified[pq]
    mq = np.concatenate([pq[keep], unc[r2]])
    mc = np.concatenate([pc[keep], c2])
    md = np.concatenate([d[keep], d2])
    ord3 = np.lexsort((crank[mc], md, mq))
    return mq[ord3], mc[ord3], md[ord3]


def knn_join(points, k: int = 5, n_points: int | None = None, res: int | None = None,
             metric: str = "haversine"):
    """points: Dataset with (image_id, lon, lat). Returns
    (image_id, neighbor_id, rank, dist_m) for every point, exact.
    metric: "haversine" (meters) or "euclidean" (planar degrees)."""
    if res is None:
        if n_points is None:
            n_points = points.count()
        res = pick_resolution(n_points)

    def replicate(b: pa.Table) -> pa.Table:
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        ids = b.column("image_id")
        ix, iy = cells.cell_xy(lon, lat, res)
        n = 1 << res
        out_cell, out_idx, out_q = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                if metric == "haversine":
                    jx = jx % n  # longitude wraps across the antimeridian
                    ok = (jy >= 0) & (jy < n)
                else:
                    ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                out_cell.append((jx[ok] * n + jy[ok]).astype(np.int64))
                out_idx.append(np.nonzero(ok)[0])
                out_q.append(np.full(int(ok.sum()), dx == 0 and dy == 0))
        cell = np.concatenate(out_cell)
        idx = np.concatenate(out_idx)
        is_q = np.concatenate(out_q)
        take = pa.array(idx, pa.int64())
        return pa.table(
            {
                "cell": pa.array(cell),
                "image_id": ids.take(take),
                "lon": pa.array(lon[idx]),
                "lat": pa.array(lat[idx]),
                "is_query": pa.array(is_q),
            }
        )

    replicated = points.map_batches(replicate, batch_format="pyarrow")

    def group_knn(g: pa.Table) -> pa.Table:
        is_q = g.column("is_query").to_numpy(zero_copy_only=False)
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        qm = is_q.astype(bool)
        if not qm.any():
            return pa.table(
                {"image_id": pa.array([], pa.string()), "neighbor_id": pa.array([], pa.string()),
                 "rank": pa.array([], pa.int64()), "dist_m": pa.array([], pa.float64()),
                 "certified": pa.array([], pa.bool_())}
            )
        qlon, qlat, qid = lon[qm], lat[qm], ids[qm]
        rows, cols, dist = _topk_pruned(qlon, qlat, qid, lon, lat, ids, k, metric)
        ix, iy = cells.cell_xy(qlon, qlat, res)
        if metric == "euclidean":
            guarantee = _halo_guarantee_euclid(qlon, qlat, ix, iy, res)
        else:
            guarantee = _halo_guarantee(qlon, qlat, ix, iy, res)
        n_cand = len(lon) - 1  # excluding self
        kth = np.full(len(qid), np.inf)
        cnt = np.bincount(rows, minlength=len(qid))
        # kth distance per query (rows are sorted by (query, dist))
        ends = np.cumsum(cnt) - 1
        kth[cnt > 0] = dist[ends[cnt > 0]]
        # strict <: a point exactly AT the halo bound could be outside the
        # halo and tie-break ahead of the local kth, so == is not certifiable
        certified = (cnt >= min(k, n_cand)) & (kth < guarantee) & (n_cand >= k)
        rank = (np.arange(len(rows)) - np.concatenate([[0], np.cumsum(cnt)[:-1]])[rows] + 1).astype(np.int64)
        return pa.table(
            {
                "image_id": pa.array(qid[rows]),
                "neighbor_id": pa.array(ids[cols]),
                "rank": pa.array(rank),
                "dist_m": pa.array(dist),
                "certified": pa.array(certified[rows]),
            }
        )

    local = replicated.groupby("cell").map_groups(group_knn, batch_format="pyarrow")
    return local


def _ring_pass(points, flagged_ids, k, res, metric, ring=2):
    """Targeted wider-halo pass: only the FLAGGED queries and the
    candidate points landing in their (2*ring+1)^2 neighborhoods
    shuffle — O(|flagged| * cell_pop), never O(n) per query."""
    import pyarrow.compute as pc

    flag_arr = pa.array(sorted(flagged_ids), pa.string())
    fref = ray.put(flag_arr)

    # cells of the flagged queries
    def qcells(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("image_id"), value_set=ray.get(fref))
        sub = b.filter(m)
        lon = sub.column("lon").to_numpy(zero_copy_only=False)
        lat = sub.column("lat").to_numpy(zero_copy_only=False)
        ix, iy = cells.cell_xy(lon, lat, res)
        n = 1 << res
        return pa.table({"cell": pa.array((ix * n + iy).astype(np.int64))})

    qc = points.map_batches(qcells, batch_format="pyarrow").to_pandas()
    target_cells = np.unique(qc["cell"].to_numpy()) if len(qc) else np.zeros(0, np.int64)
    cref = ray.put(target_cells)

    def replicate(b: pa.Table) -> pa.Table:
        tc = ray.get(cref)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        ids = b.column("image_id")
        is_flag = pc.is_in(ids, value_set=ray.get(fref)).to_numpy(zero_copy_only=False)
        ix, iy = cells.cell_xy(lon, lat, res)
        n = 1 << res
        out = []
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                jx, jy = ix + dx, iy + dy
                if metric == "haversine":
                    jx = jx % n
                    ok = (jy >= 0) & (jy < n)
                else:
                    ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                cell = jx * n + jy
                ok &= np.isin(cell, tc)
                idx = np.nonzero(ok)[0]
                if not len(idx):
                    continue
                take = pa.array(idx, pa.int64())
                out.append(
                    pa.table(
                        {
                            "cell": pa.array(cell[idx].astype(np.int64)),
                            "image_id": ids.take(take),
                            "lon": pa.array(lon[idx]),
                            "lat": pa.array(lat[idx]),
                            "is_query": pa.array(
                                is_flag[idx] & (dx == 0) & (dy == 0)
                            ),
                        }
                    )
                )
        if not out:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "image_id": pa.array([], pa.string()),
                 "lon": pa.array([], pa.float64()), "lat": pa.array([], pa.float64()),
                 "is_query": pa.array([], pa.bool_())}
            )
        return pa.concat_tables(out)

    def group_knn(g: pa.Table) -> pa.Table:
        is_q = g.column("is_query").to_numpy(zero_copy_only=False).astype(bool)
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("image_id").to_pylist(), dtype=object)
        if not is_q.any():
            return pa.table(
                {"image_id": pa.array([], pa.string()), "neighbor_id": pa.array([], pa.string()),
                 "rank": pa.array([], pa.int64()), "dist_m": pa.array([], pa.float64()),
                 "certified": pa.array([], pa.bool_())}
            )
        qlon, qlat, qid = lon[is_q], lat[is_q], ids[is_q]
        rows, cols, dist = _topk_pruned(qlon, qlat, qid, lon, lat, ids, k, metric)
        ix, iy = cells.cell_xy(qlon, qlat, res)
        if metric == "euclidean":
            guarantee = _halo_guarantee_euclid(qlon, qlat, ix, iy, res, ring=ring)
        else:
            guarantee = _halo_guarantee(qlon, qlat, ix, iy, res, ring=ring)
        n_cand = len(lon) - 1
        kth = np.full(len(qid), np.inf)
        cnt = np.bincount(rows, minlength=len(qid))
        ends = np.cumsum(cnt) - 1
        kth[cnt > 0] = dist[ends[cnt > 0]]
        certified = (cnt >= min(k, n_cand)) & (kth < guarantee) & (n_cand >= k)
        rank = (np.arange(len(rows)) - np.concatenate([[0], np.cumsum(cnt)[:-1]])[rows] + 1).astype(np.int64)
        return pa.table(
            {
                "image_id": pa.array(qid[rows]),
                "neighbor_id": pa.array(ids[cols]),
                "rank": pa.array(rank),
                "dist_m": pa.array(dist),
                "certified": pa.array(certified[rows]),
            }
        )

    rep = points.map_batches(replicate, batch_format="pyarrow")
    return rep.groupby("cell").map_groups(group_knn, batch_format="pyarrow")


def _flagged_of(local) -> list:
    import pyarrow.compute as pc

    t = local.map_batches(
        lambda t: t.filter(pc.invert(t.column("certified"))).select(["image_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    # an all-certified run yields an EMPTY dataset, which loses its
    # schema on to_pandas — treat missing column as no flagged ids
    return sorted(set(t["image_id"])) if "image_id" in t.columns else []


def finalize_knn(points, local, k: int = 5, metric: str = "haversine",
                 res: int | None = None, n_points: int | None = None):
    """Resolve the uncertified sliver exactly, in two escalations:

    1. a TARGETED ring-2 (5x5 halo) pass over just the flagged queries
       and the candidate points in their neighborhoods — the wider halo
       certifies almost all of the ring-1 leftovers (sparse cells);
    2. the broadcast partial-top-k brute force for whatever survives
       (grid corners, antimeridian) — by then a tiny set, so the
       all-points scan is cheap.

    The round-1 version brute-forced every flagged query against the
    full dataset: at a few percent flagged that was O(0.01 n^2) — the
    stage VERDICT r1 #9's bench-scale run exposed."""
    import pyarrow.compute as pc

    # split is a double consume — pin the (n*k)-row result once
    local = local.materialize()
    certified = local.map_batches(
        lambda t: t.filter(t.column("certified")).drop_columns(["certified"]),
        batch_format="pyarrow",
    )
    flagged_ids = _flagged_of(local)
    if not flagged_ids:
        return certified
    if res is None:
        if n_points is None:
            n_points = points.count()
        res = pick_resolution(n_points)

    ring2 = _ring_pass(points, flagged_ids, k, res, metric, ring=2).materialize()
    certified2 = ring2.map_batches(
        lambda t: t.filter(t.column("certified")).drop_columns(["certified"]),
        batch_format="pyarrow",
    )
    flagged_ids = _flagged_of(ring2)
    out = certified.union(certified2)
    if not flagged_ids:
        return out
    idset_ref = ray.put(pa.array(flagged_ids, pa.string()))

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("image_id"), value_set=ray.get(idset_ref)))

    queries = points.map_batches(pick, batch_format="pyarrow").to_pandas()
    qids = queries["image_id"].to_numpy()
    qlon = queries["lon"].to_numpy()
    qlat = queries["lat"].to_numpy()
    qref = ray.put((qids, qlon, qlat))

    def partial(b: pa.Table) -> pa.Table:
        qi, ql, qt = ray.get(qref)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(b.column("image_id").to_pylist(), dtype=object)
        rows, cols, dist = _topk_block(ql, qt, qi, lon, lat, ids, k, metric)
        return pa.table(
            {"qid": pa.array(qi[rows]), "neighbor_id": pa.array(ids[cols]), "dist": pa.array(dist)}
        )

    partials = points.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        dist = g.column("dist").to_numpy(zero_copy_only=False)
        nid = np.asarray(g.column("neighbor_id").to_pylist(), dtype=object)
        order = np.lexsort((nid, dist))[:k]
        return pa.table(
            {
                "image_id": g.column("qid").take(pa.array(order, pa.int64())),
                "neighbor_id": pa.array(nid[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "dist_m": pa.array(dist[order]),
            }
        )

    fallback = partials.groupby("qid").map_groups(merge, batch_format="pyarrow")
    return out.union(fallback)


def knn_full(points, k: int = 5, n_points: int | None = None, res: int | None = None,
             metric: str = "haversine"):
    """Exact self-kNN for every point (certified local + targeted
    ring-2 pass + tiny brute-force residue)."""
    if res is None:
        if n_points is None:
            n_points = points.count()
        res = pick_resolution(n_points)
    local = knn_join(points, k=k, n_points=n_points, res=res, metric=metric)
    return finalize_knn(points, local, k=k, metric=metric, res=res, n_points=n_points)
