"""Distributed cardinality sketches (r4c): HyperLogLog per group.

Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm"), the standard web-scale distinct
counter: hash every item, split the hash into a register index (b
bits) and a 2^-rho geometric observable (leading-zero count of the
rest), keep the per-register MAX, estimate by normalized harmonic
mean.  Register maxima are associative, so the operator is the
combiner shape: per-batch partial registers -> one bucketed shuffle of
(group, idx, rho) rows (at most m rows per group per batch) -> merge +
finalize.  Nothing about the corpus ever concentrates on the driver.

DETERMINISM / oracle: the item hash is the low 64 bits of md5 (exact
lane to DuckDB's ``md5_number_lower``), rho uses an integer binary
bit-length (never float log2, which mis-floors at exact powers of
two), and the harmonic sum is kept as the EXACT integer
Z' = sum 2^(64-rho) (fits 128 bits for m <= 2^63), so the finalize is
one float division of bit-identical quantities on both sides
(sqlgen.q_hll_distinct).  The small-range linear-counting correction
(E <= 5m/2 with empty registers) is implemented identically on both
sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HLL_B = 8
HLL_M = 1 << HLL_B
# bias constant alpha_m for m = 256 (Flajolet et al. Fig. 3); the SQL
# oracle embeds ESTIMATE_NUM via repr so both sides share the exact
# double
ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
ESTIMATE_NUM = ALPHA * HLL_M * HLL_M * 18446744073709551616.0


def _md5_low64(texts: list[str]) -> np.ndarray:
    """Low 64 bits of md5 (little-endian of digest bytes 8..16 ==
    DuckDB md5_number_lower)."""
    out = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
    return out


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (0 for 0) — binary CLZ
    ladder, no float log2."""
    v = w.astype(np.uint64, copy=True)
    bl = np.zeros(len(v), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    return bl


def _rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) of each 64-bit hash: idx = h mod m, rho =
    1 + leading-zeros of the remaining 64-b bits."""
    idx = (h % np.uint64(HLL_M)).astype(np.int64)
    w = h >> np.uint64(HLL_B)
    rho = (64 - HLL_B + 1) - _bit_length_u64(w)
    return idx, rho


def _finalize(rhos: np.ndarray, idxs: np.ndarray) -> float:
    """HLL estimate from a group's merged (idx, rho) register rows."""
    m = HLL_M
    reg = np.zeros(m, np.int64)
    np.maximum.at(reg, idxs, rhos)
    # EXACT integer harmonic sum: Z' = sum 2^(64-rho), empty regs = 2^64
    zi = sum(1 << (64 - int(r)) for r in reg)  # python ints: exact
    e = ESTIMATE_NUM / float(zi)
    v = int((reg == 0).sum())
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return float(np.floor(e * 1e6) / 1e6)


def hll_distinct(ds, key: str, text_col: str, p: int = 64):
    """Dataset -> (key, n_exact, hll_est): per-group HLL cardinality of
    distinct ``text_col`` values (64-bit md5 identity) next to the
    exact distinct count (itself computed distributed, for the
    accuracy story).  Groups co-locate by hash(key) so merge+finalize
    happen in one bucketed pass."""
    from .shuffleops import bucket_distinct, bucket_ids, bucket_reduce

    def partial(b: pa.Table) -> pa.Table:
        h = _md5_low64(b.column(text_col).to_pylist())
        idx, rho = _rho(h)
        t = pa.table({
            key: b.column(key),
            "idx": pa.array(idx),
            "rho": pa.array(rho),
            "h": pa.array(h),
        })
        return t

    parts = ds.select_columns([key, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    parts = parts.materialize()  # feeds both the sketch and the exact path

    def pre(b: pa.Table) -> pa.Table:
        t = (
            b.select([key, "idx", "rho"])
            .group_by([key, "idx"])
            .aggregate([("rho", "max")])
            .rename_columns([key, "idx", "rho"])
        )
        return t.append_column("__bucket", pa.array(bucket_ids(t.column(key), p)))

    def merge(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        ks = g.column(key).to_numpy(zero_copy_only=False)
        idxs = g.column("idx").to_numpy(zero_copy_only=False)
        rhos = g.column("rho").to_numpy(zero_copy_only=False)
        out_k, out_e = [], []
        for kv in np.unique(ks):  # per GROUP (few), not per row
            sel = ks == kv
            out_k.append(kv)
            out_e.append(_finalize(rhos[sel], idxs[sel]))
        return pa.table({key: pa.array(out_k), "hll_est": pa.array(out_e, pa.float64())})

    sketch = (
        parts.map_batches(pre, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge, batch_format="pyarrow")
    )

    ones = bucket_distinct(parts.select_columns([key, "h"]), [key, "h"]).map_batches(
        lambda t: pa.table({key: t.column(key),
                            "one": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow",
    )
    exact = bucket_reduce(ones, key, [("one", "sum")]).map_batches(
        lambda t: t.rename_columns([key, "n_exact"]), batch_format="pyarrow"
    )

    from .shuffleops import bucket_join

    # parts is already materialized above, so schema() is free here —
    # derive the key's real Arrow type instead of assuming string
    # (ADVICE r4: a non-string key got wrong declared join types).
    # schema() is None for an empty dataset; any type is then vacuous.
    pschema = parts.schema()
    ktype = (dict(zip(pschema.names, pschema.types))[key]
             if pschema is not None else pa.string())
    return bucket_join(
        exact, sketch, key, key,
        left_types={key: ktype, "n_exact": pa.int64()},
        right_types={key: ktype, "hll_est": pa.float64()},
    )


def exact_quantiles(ds, key: str, val_col: str, qs: tuple = ((1, 2), (9, 10), (99, 100)),
                    p: int = 64):
    """Exact per-group quantiles WITHOUT sorting the corpus: collapse
    to (key, value, count) cells (the only wide exchange — volume is
    O(distinct values per group), not O(rows)), co-locate each group's
    cells by hash(key), then one lexsort + cumsum + searchsorted per
    bucket.  Quantile definition: smallest v with |{x <= v}| >=
    ceil(q*n), with q given as an integer fraction (num, den) so the
    threshold ceil(q*n) = (num*n + den - 1) // den is EXACT integer
    arithmetic on both sides (sqlgen.q_len_quantiles)."""
    from .shuffleops import bucket_ids

    def cells(b: pa.Table) -> pa.Table:
        t = (
            b.select([key, val_col])
            .group_by([key, val_col])
            .aggregate([([], "count_all")])
            .rename_columns([key, val_col, "cnt"])
        )
        return t.append_column("__bucket", pa.array(bucket_ids(t.column(key), p)))

    def finalize(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        from .texthash import hash_strings

        karr = g.column(key).combine_chunks()
        kv = karr.to_numpy(zero_copy_only=False)
        kh = hash_strings(karr) if kv.dtype.kind in "OU" else kv
        v = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, kh))
        kh, v, c, kv = kh[order], v[order], c[order], kv[order]
        # merge duplicate (key, value) cells across shuffle batches
        new_seg = np.r_[True, kh[1:] != kh[:-1]]
        new_cell = new_seg | np.r_[True, v[1:] != v[:-1]]
        cell_id = np.cumsum(new_cell) - 1
        cc = np.bincount(cell_id, weights=c).astype(np.int64)
        cv = v[new_cell]
        ck = kv[new_cell]
        cseg = new_seg[new_cell]
        seg_id = np.cumsum(cseg) - 1
        # per-group cumulative counts
        seg_starts = np.nonzero(cseg)[0]
        cum = np.cumsum(cc)
        base = np.where(seg_starts > 0, cum[seg_starts - 1], 0)
        cum = cum - base[seg_id]
        n = np.bincount(seg_id, weights=cc).astype(np.int64)
        cols = {key: pa.array(ck[seg_starts]), "n": pa.array(n)}
        for num, den in qs:
            thr = (num * n + den - 1) // den
            # first cell of each group whose cumulative count reaches thr
            pos = np.empty(len(n), np.int64)
            ends = np.r_[seg_starts[1:], len(cv)]
            for s in range(len(n)):  # per GROUP (few), not per row
                pos[s] = seg_starts[s] + np.searchsorted(
                    cum[seg_starts[s]: ends[s]], thr[s]
                )
            cols[f"p{100 * num // den}"] = pa.array(cv[pos])
        return pa.table(cols)

    return (
        ds.select_columns([key, val_col])
        .map_batches(cells, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(finalize, batch_format="pyarrow")
    )
