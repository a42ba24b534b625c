"""Deduplication suite for large-scale training-data pipelines.

Four granularities, each a Ray Data pipeline (BASELINE.md lists these
as first-class components alongside the geo operator surface):

* exact            — content-hash partition + per-group min-id survivor
                     (georay.queries.dedup_exact)
* MinHash + LSH    — shingle -> 128-perm minhash -> banded LSH buckets
                     (groupby band) -> candidate pairs -> exact-Jaccard
                     verify -> connected components -> survivors
* SimHash          — 64-bit weighted-token signature, banded by 16-bit
                     chunks, Hamming-verified pairs
* embedding cosine — near-duplicate pairs above a cosine threshold via
                     blocked matmul against a broadcast matrix

Determinism: every hash is keyed blake2b (no process-randomized seeds);
components are labelled by their minimum doc id, so output is
independent of partitioning and parallelism.

Scale notes: signatures/bands shuffle as slim rows (doc_id + 8-byte
hashes); shingle SETS never shuffle — the verify stage re-derives them
from the documents via a broadcast fetch at small scale and would be a
co-partitioned join by doc_id at 100 TB (documented on verify_pairs).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray

MERSENNE = (1 << 61) - 1


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct character-k-gram 64-bit hashes of a document."""
    if len(text) < k:
        grams = {text}
    else:
        grams = {text[i : i + k] for i in range(len(text) - k + 1)}
    return np.fromiter((_hash64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams))


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(1234)  # fixed seed: signatures are stable
    a = rs.randint(1, MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, n_perm: int = 128) -> np.ndarray:
    """(a*h + b) mod p minwise signature, vectorized over shingles."""
    a, b = _PERMS[n_perm] if n_perm in _PERMS else _perm_params(n_perm)
    h = hashes.astype(np.uint64) % np.uint64(MERSENNE)
    old = np.seterr(over="ignore")
    try:
        vals = (h[None, :] * a[:, None] + b[:, None]) % np.uint64(MERSENNE)
    finally:
        np.seterr(**old)
    return vals.min(axis=1)


_PERMS = {128: _perm_params(128)}


def band_rows(doc_id: int, sig: np.ndarray, n_bands: int = 32) -> list[tuple[int, int, int]]:
    r = len(sig) // n_bands
    out = []
    for band in range(n_bands):
        chunk = sig[band * r : (band + 1) * r]
        out.append((band, _hash64(chunk.tobytes()) & 0x7FFFFFFFFFFFFFFF, doc_id))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """Weighted-token 64-bit SimHash (tokens = whitespace words)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = _hash64(tok.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.p[hi] = lo


def minhash_lsh_dedup(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 32,
    shingle_k: int = 5,
):
    """docs: Dataset -> pandas (doc_id, group, keep).

    Stages: per-batch signatures -> band-row explosion -> groupby(band,
    hash) emits candidate pairs -> pairs verified by exact Jaccard ->
    union-find components labelled by min doc id.
    """

    def sigs(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        rows_band, rows_hash, rows_doc = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingle_hashes(t, shingle_k), n_perm)
            for band, h, d in band_rows(int(i), sig, n_bands):
                rows_band.append(band)
                rows_hash.append(h)
                rows_doc.append(d)
        return pa.table(
            {
                "band": pa.array(rows_band, pa.int64()),
                "bhash": pa.array(rows_hash, pa.int64()),
                "doc_id": pa.array(rows_doc, pa.int64()),
            }
        )

    bands = docs.map_batches(sigs, batch_format="pyarrow")

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g.column("doc_id").to_pylist())
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    pairs = (
        bands.groupby(["band", "bhash"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )

    # verify candidates with exact Jaccard.  Small scale: fetch both
    # shingle sets from a broadcast dict; at 100 TB this becomes a
    # co-partitioned join of (pair, doc shingles) by doc_id.
    texts = docs.select_columns([id_col, text_col]).to_pandas()
    sh = {int(i): shingle_hashes(t, shingle_k) for i, t in zip(texts[id_col], texts[text_col])}
    for s in sh.values():
        s.sort()
    uf = _UF()
    for a, b in zip(pairs["a"], pairs["b"]):
        if jaccard(sh[int(a)], sh[int(b)]) >= threshold:
            uf.union(int(a), int(b))
    import pandas as pd

    all_ids = sorted(sh)
    group = [uf.find(i) for i in all_ids]
    return pd.DataFrame(
        {"doc_id": all_ids, "group": group, "keep": [g == i for i, g in zip(all_ids, group)]}
    )


def simhash_dedup(docs, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """SimHash near-dup pass: banded 16-bit buckets -> Hamming verify.
    Returns pandas (doc_id, simhash, group, keep)."""

    def sig(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        hs = [simhash64(t) for t in b.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], pa.int64()),
                "simhash": pa.array(np.asarray(hs, dtype=np.uint64).view(np.int64)),
            }
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow").to_pandas()
    h = sigs["simhash"].to_numpy().view(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    buckets = defaultdict(list)
    for band in range(4):  # 4 x 16-bit bands: any pair within Hamming 3
        part = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        for i, p in enumerate(part):  # one band differing at most
            buckets[(band, int(p))].append(i)
    uf = _UF()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if hamming64(int(h[a]), int(h[b])) <= max_hamming:
                    uf.union(int(ids[a]), int(ids[b]))
    import pandas as pd

    group = [uf.find(int(i)) for i in ids]
    return pd.DataFrame(
        {
            "doc_id": ids,
            "simhash": sigs["simhash"],
            "group": group,
            "keep": [g == i for i, g in zip(ids, group)],
        }
    )


def embed_neardup_pairs(embeds, threshold: float = 0.8, id_col: str = "vec_id", vec_col: str = "embedding"):
    """All (a < b) pairs with cosine similarity >= threshold.

    Blocked: each batch multiplies against the broadcast full matrix —
    O(n^2) work but O(batch x n) memory, streaming.  The 100 TB path
    swaps the broadcast side for LSH/IVF buckets (see georay.queries
    embed_knn for the bucketing machinery)."""
    full = embeds.select_columns([id_col, vec_col]).to_pandas()
    ids = full[id_col].to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in full[vec_col]])
    norm = np.linalg.norm(mat, axis=1)
    ref = ray.put((ids, mat, norm))

    def block(b: pa.Table) -> pa.Table:
        gids, gmat, gnorm = ray.get(ref)
        bid = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(b.column(vec_col).combine_chunks().flatten(), dtype=np.float64)
        bm = flat.reshape(len(bid), -1)
        sims = (bm @ gmat.T) / (np.linalg.norm(bm, axis=1)[:, None] * gnorm[None, :])
        rows, cols = np.nonzero((sims >= threshold) & (bid[:, None] < gids[None, :]))
        return pa.table(
            {
                "a": pa.array(bid[rows], pa.int64()),
                "b": pa.array(gids[cols], pa.int64()),
            }
        )

    return embeds.map_batches(block, batch_format="pyarrow")
