"""Approximate nearest neighbour over embedding columns — the IVF
scale path beside the brute-force baseline (queries.embed_knn) and the
random-hyperplane near-dup LSH (dedup.embed_neardup_lsh).

IVF here is DETERMINISTIC BY CONSTRUCTION so the whole operator is
DuckDB-oracle checkable (unlike Lloyd-trained codebooks): the codebook
is a fixed id-sampled subset of the corpus (``vec_id % cent_mod == 0``),
every vector is assigned to its max-cosine centroid (ties to the
smaller centroid index), and a query searches only the vectors
assigned to its ``nprobe`` nearest centroids.  Recall < 1 vs the exact
top-k is inherent IVF semantics — measured against embed_knn by a
pytest bound — but the OUTPUT itself is exact, so the driver hash
check applies in full (sqlgen.q_embed_ann_ivf recomputes codebook,
assignment, probe sets and the candidate top-k in SQL).

Scale shape: the codebook + query matrix broadcast once via
``ray.put`` (both are corpus-fraction sized); corpus vectors stream
through a batched assign + masked partial-top-k (one matmul per batch,
probe masking as a boolean gather); per-query merge is the same tiny
groupby as embed_knn.  At 100 TB the broadcast side is the codebook
(kept small by cent_mod), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _assign(mat: np.ndarray, cmat_n: np.ndarray) -> np.ndarray:
    """max-cosine centroid per row, ties to the SMALLER centroid index
    (argmax returns the first maximum)."""
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ cmat_n.T) / np.where(norms == 0, 1.0, norms)[:, None]
    return sims.argmax(axis=1)


def ivf_topk(
    embeds,
    cent_mod: int = 32,
    nprobe: int = 2,
    k: int = 5,
    query_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(qid, neighbor_id, rank) — cosine top-k among the vectors of the
    query's ``nprobe`` nearest IVF cells (self excluded; rank ties by
    (sim desc, neighbor_id asc), the embed_knn convention)."""

    def _pick(mod):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % mod == 0))

        return f

    def _collect(mod):
        tab = embeds.map_batches(_pick(mod), batch_format="pyarrow").to_pandas()
        tab = tab.sort_values(id_col).reset_index(drop=True)
        ids = tab[id_col].to_numpy().astype(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in tab[vec_col]])
        return ids, mat

    cids, cmat = _collect(cent_mod)
    cmat_n = cmat / np.linalg.norm(cmat, axis=1)[:, None]
    qids, qmat = _collect(query_mod)
    qnorm = np.linalg.norm(qmat, axis=1)
    # probe sets: nprobe max-cosine centroids per query, ties to the
    # smaller centroid index
    qsims = (qmat @ cmat_n.T) / np.where(qnorm == 0, 1.0, qnorm)[:, None]
    order = np.lexsort((np.broadcast_to(np.arange(len(cids)), qsims.shape), -qsims), axis=1)
    probes = order[:, :nprobe]
    probe_mask = np.zeros((len(qids), len(cids)), bool)
    probe_mask[np.repeat(np.arange(len(qids)), nprobe), probes.ravel()] = True
    bref = ray.put((qids, qmat, qnorm, cmat_n, probe_mask))

    class Partial:
        def __init__(self):
            (self.qids, self.qmat, self.qnorm, self.cmat_n, self.probe_mask) = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = np.asarray(b.column(vec_col).combine_chunks().flatten(), dtype=np.float64)
            mat = flat.reshape(len(ids), -1)
            cell = _assign(mat, self.cmat_n)
            sims = (self.qmat @ mat.T) / (
                self.qnorm[:, None] * np.linalg.norm(mat, axis=1)[None, :]
            )
            # IVF masking: a vector is a candidate for q iff its cell is
            # probed by q; self never matches
            allowed = self.probe_mask[:, cell]  # (Q, B)
            sims = np.where(allowed, sims, -np.inf)
            sims[self.qids[:, None] == ids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rq = np.repeat(np.arange(len(self.qids)), kk)
            rn = part.ravel()
            good = np.isfinite(sims[rq, rn])
            return pa.table(
                {
                    "qid": pa.array(self.qids[rq[good]]),
                    "neighbor_id": pa.array(ids[rn[good]]),
                    "sim": pa.array(sims[rq[good], rn[good]]),
                }
            )

    partials = embeds.map_batches(
        Partial, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4)
    )

    def merge(group: pa.Table) -> pa.Table:
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "qid": group.column("qid").take(pa.array(order, pa.int64())),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partials.groupby("qid").map_groups(merge, batch_format="pyarrow")
