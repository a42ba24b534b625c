"""Vectorized text hashing: shingles, minhash signatures, simhash.

Round 1 hashed each shingle / token with a per-item ``hashlib.blake2b``
call — per-row Python at the core of the signature stage (flagged in
VERDICT.md "What's wrong" #7).  This module replaces it with a numpy
rolling-polynomial hash computed over the ZERO-COPY flat utf-8 buffer
of the Arrow string column:

    pw[i]  = B^i            (mod 2^64, B odd)
    ipw[i] = B^-i           (mod 2^64; B odd => invertible mod 2^64)
    S[i]   = sum_{j<=i} a[j] * ipw[j]
    h(s,e) = pw[e-1] * (S[e-1] - S[s-1])   = sum_{j=s}^{e-1} a[j] B^{e-1-j}

so EVERY span hash (k-gram window or whitespace token) is two gathers
and a multiply — no per-item Python.  A splitmix64 finalizer (mixed
with the span length) fixes the polynomial's low-bit structure.

Semantics: shingles are byte-level k-grams of the utf-8 encoding
(identical to character k-grams for ASCII corpora); tokens are
whitespace-separated via pyarrow's utf8_split_whitespace.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(0x100000001B3)  # FNV prime (odd => invertible mod 2^64)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_LEN_SALT = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _flat_utf8(arr) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64 (n+1), flat byte buffer uint8) of a string array,
    zero-copy from the Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], odt)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.zeros(0, np.uint8)
    )
    return offs, data


_POW_CAP = 1 << 22  # base power-table length (32 MB per table)
_POW_CACHES: dict = {}


def _power_table(base: np.uint64, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod 2^64.  The tables depend only on n —
    r4: the old per-call ``cumprod`` was a SEQUENTIAL pass over the
    whole flat buffer length on every batch (the dominant cost of
    token/shingle hashing).  Now a capped base table plus a stride
    table are cached per process, and long outputs are two gathers and
    one vectorized multiply."""
    if n > 4096 * _POW_CAP:
        raise ValueError("flat buffer too large for one hashing batch")
    key = int(base)
    old = np.seterr(over="ignore")
    try:
        cached = _POW_CACHES.get(key)
        if cached is None or len(cached[0]) < min(n, _POW_CAP):
            lo = np.empty(min(max(n, 1024), _POW_CAP), np.uint64)
            lo[0] = np.uint64(1)
            if len(lo) > 1:
                lo[1:] = np.cumprod(np.full(len(lo) - 1, base, np.uint64))
            stride = lo[-1] * base  # base^len(lo)
            hi = np.empty(4096, np.uint64)
            hi[0] = np.uint64(1)
            hi[1:] = np.cumprod(np.full(4095, stride, np.uint64))
            cached = (lo, hi)
            _POW_CACHES[key] = cached
        lo, hi = cached
        if n <= len(lo):
            return lo[:n]
        idx = np.arange(n, dtype=np.int64)
        return hi[idx >> 22] * lo[idx & (_POW_CAP - 1)]
    finally:
        np.seterr(**old)


def _pow_at(base: np.uint64, idx: np.ndarray) -> np.ndarray:
    """base^idx evaluated only AT the given indices (two gathers + one
    multiply) — span hashing needs powers at span ENDPOINTS, never the
    full table (r4: the old full-length table was 2 extra passes over
    the whole flat buffer)."""
    cached = _POW_CACHES.get(int(base))
    if cached is None or len(cached[0]) < _POW_CAP:
        _power_table(base, _POW_CAP)
        cached = _POW_CACHES[int(base)]
    lo, hi = cached
    old = np.seterr(over="ignore")
    try:
        return hi[idx >> 22] * lo[idx & (_POW_CAP - 1)]
    finally:
        np.seterr(**old)


def _prefix_sums(data: np.ndarray, upto: int) -> np.ndarray:
    """S[i] = sum_{j<i} data[j] * B^-j (uint64 wraparound) — the one
    unavoidably full-length table (data-dependent cumsum)."""
    old = np.seterr(over="ignore")
    try:
        n = int(upto)
        ipw = _power_table(_BINV, n)
        S = np.zeros(n + 1, np.uint64)
        if n:
            S[1:] = np.cumsum(data[:n].astype(np.uint64) * ipw, dtype=np.uint64)
        return S
    finally:
        np.seterr(**old)


def _prefix_tables(data: np.ndarray, upto: int):
    """pw, S prefix arrays over data[:upto] (uint64 wraparound).
    Back-compat shim — new code uses _prefix_sums + _span_hash_pts."""
    return _power_table(_B, int(upto) + 1), _prefix_sums(data, upto)


def _span_hash(ws: np.ndarray, we: np.ndarray, pw: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Hash of byte spans [ws, we): pw[we-1] * (S[we] - S[ws]), salted
    with the span length.  Empty spans hash deterministically too."""
    old = np.seterr(over="ignore")
    try:
        wl = (we - ws).astype(np.uint64)
        core = pw[np.maximum(we - 1, 0)] * (S[we] - S[ws])
        return _mix64(core ^ (wl * _LEN_SALT))
    finally:
        np.seterr(**old)


def _span_hash_pts(ws: np.ndarray, we: np.ndarray, S: np.ndarray) -> np.ndarray:
    """_span_hash with B-powers evaluated only at the span endpoints
    (no full pw table)."""
    old = np.seterr(over="ignore")
    try:
        wl = (we - ws).astype(np.uint64)
        core = _pow_at(_B, np.maximum(we - 1, 0).astype(np.int64)) * (S[we] - S[ws])
        return _mix64(core ^ (wl * _LEN_SALT))
    finally:
        np.seterr(**old)


def _horner_fixed(ws: np.ndarray, k: int, data: np.ndarray) -> np.ndarray:
    """Span-hash CORE for n spans of identical length k, Horner form
    (sum byte[j] * B^(k-1-j) == the _span_hash polynomial): k byte
    gathers + in-place uint64 ops, NO prefix tables (r4 — the tables
    were several full-buffer passes per batch)."""
    n = len(ws)
    h = np.zeros(n, np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(k):
            h *= _B
            h += data[ws + j]
        return h
    finally:
        np.seterr(**old)


def _horner_var(ws: np.ndarray, lens: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Span-hash core for variable-length spans: sort by length
    descending once, then spans still active at char j form a PREFIX —
    every Horner step is contiguous slice arithmetic (no masks).
    The sort key is a uint8 (lengths clipped at 255 -> numpy radix
    sort, ~4x cheaper than int64 argsort); rare longer spans are
    hashed separately so the prefix property stays exact."""
    n = len(ws)
    if n == 0:
        return np.zeros(0, np.uint64)
    lens = np.asarray(lens, np.int64)
    maxl = int(lens.max())
    if maxl and int(lens.min()) == maxl:
        return _horner_fixed(ws, maxl, data)
    if maxl > 255:
        out = np.empty(n, np.uint64)
        long = lens > 255
        out[long] = _horner_long(ws[long], lens[long], data)
        out[~long] = _horner_var(ws[~long], lens[~long], data)
        return out
    order = np.argsort((255 - lens).astype(np.uint8), kind="stable")
    wss = ws[order]
    csum = np.cumsum(np.bincount(lens, minlength=maxl + 1))
    h = np.zeros(n, np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(maxl):
            m = n - int(csum[j])  # spans with length > j
            if m == 0:
                break
            hj = h[:m]
            hj *= _B
            hj += data[wss[:m] + j]
        out = np.empty(n, np.uint64)
        out[order] = h
        return out
    finally:
        np.seterr(**old)


def _horner_long(ws: np.ndarray, lens: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Horner for the rare > 255-byte spans (full int64 sort)."""
    n = len(ws)
    if n == 0:
        return np.zeros(0, np.uint64)
    order = np.argsort(-lens, kind="stable")
    wss = ws[order]
    maxl = int(lens.max())
    csum = np.cumsum(np.bincount(lens, minlength=maxl + 1))
    h = np.zeros(n, np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(maxl):
            m = n - int(csum[j])
            if m == 0:
                break
            hj = h[:m]
            hj *= _B
            hj += data[wss[:m] + j]
        out = np.empty(n, np.uint64)
        out[order] = h
        return out
    finally:
        np.seterr(**old)


def span_hashes(ws: np.ndarray, lens: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Finalized span hashes (== _span_hash values) via Horner —
    table-free."""
    old = np.seterr(over="ignore")
    try:
        return _mix64(_horner_var(ws, lens, data) ^ (lens.astype(np.uint64) * _LEN_SALT))
    finally:
        np.seterr(**old)


def shingle_hash_multisets(arr, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Per-document byte-k-gram hashes WITH duplicates (one per window).
    Minwise signatures are duplicate-invariant, so this is the fast path
    for the signature stage (skips the per-doc sort/unique)."""
    offs, data = _flat_utf8(arr)
    n_docs = len(offs) - 1
    if n_docs == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.uint64)
    lens = offs[1:] - offs[:-1]
    wc = np.where(lens >= k, lens - k + 1, 1)  # short doc -> 1 whole-doc gram
    total = int(wc.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(wc) - wc, wc)
    ws = np.repeat(offs[:-1], wc) + within
    wl = np.where(np.repeat(lens, wc) >= k, k, np.repeat(lens, wc))
    # split fixed-k grams (the overwhelming majority) from short-doc
    # whole-text grams so the variable-length path's length sort never
    # touches the k-gram bulk (r4)
    fk = wl == k
    h = np.empty(total, np.uint64)
    if fk.any():
        old = np.seterr(over="ignore")
        try:
            h[fk] = _mix64(_horner_fixed(ws[fk], k, data) ^ (np.uint64(k) * _LEN_SALT))
        finally:
            np.seterr(**old)
    if (~fk).any():
        h[~fk] = span_hashes(ws[~fk], wl[~fk], data)
    out_offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(wc, out=out_offs[1:])
    return out_offs, h


def shingle_hash_sets(arr, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Per-document DISTINCT byte-k-gram hashes, fully vectorized.

    arr: pa string array/chunked array (n docs).
    Returns (offsets int64 (n+1), flat uint64) — each doc's hashes
    sorted ascending (ready for merge-style Jaccard)."""
    moffs, h = shingle_hash_multisets(arr, k)
    n_docs = len(moffs) - 1
    if n_docs == 0:
        return moffs, h
    total = len(h)
    doc_idx = np.repeat(np.arange(n_docs), moffs[1:] - moffs[:-1])
    # per-doc distinct: sort by (doc, hash), mask repeats
    order = np.lexsort((h, doc_idx))
    hs, di = h[order], doc_idx[order]
    keep = np.ones(total, bool)
    if total > 1:
        keep[1:] = (hs[1:] != hs[:-1]) | (di[1:] != di[:-1])
    flat = hs[keep]
    counts = np.bincount(di[keep], minlength=n_docs)
    out_offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=out_offs[1:])
    return out_offs, flat


MERSENNE = (1 << 61) - 1
_M61 = np.uint64(MERSENNE)
_LO32 = np.uint64(0xFFFFFFFF)


def _mulmod_m61(h: np.ndarray, a) -> np.ndarray:
    """Exact ``(h * a) mod (2**61 - 1)`` for ``h, a < 2**61`` via 32-bit
    limbs — the naive uint64 product wraps mod 2**64 first, which breaks
    the universal-hash (min-wise permutation) guarantee (ADVICE r2).
    Mersenne reduction: 2**61 ≡ 1 (mod p), so high limbs rotate in."""
    a = np.uint64(a)
    h_hi = h >> np.uint64(32)
    h_lo = h & _LO32
    a_hi = a >> np.uint64(32)
    a_lo = a & _LO32
    t1 = (h_hi * a_hi) << np.uint64(3)  # * 2**64 ≡ * 8 (mod p)
    mid = h_hi * a_lo + h_lo * a_hi  # < 2**62
    t2 = (mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
    t3 = h_lo * a_lo  # < 2**64: one fold
    t3 = (t3 >> np.uint64(61)) + (t3 & _M61)
    s = t1 + t2 + t3  # < 3 * 2**61
    s = (s >> np.uint64(61)) + (s & _M61)
    return s


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(1234)  # fixed seed: signatures are stable
    a = rs.randint(1, MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_PERMS: dict = {}


def minhash_signatures(offsets: np.ndarray, flat: np.ndarray, n_perm: int = 128) -> np.ndarray:
    """(n_docs, n_perm) minwise signatures over ragged shingle sets.
    Vectorized: each permutation is one (a*h+b) mod p pass + a
    minimum.reduceat over the doc offsets."""
    if n_perm not in _PERMS:
        _PERMS[n_perm] = _perm_params(n_perm)
    a, b = _PERMS[n_perm]
    n_docs = len(offsets) - 1
    sig = np.empty((n_docs, n_perm), np.uint64)
    if n_docs == 0:
        return sig
    old = np.seterr(over="ignore")
    try:
        h = flat % np.uint64(MERSENNE)
        starts = offsets[:-1]
        for p in range(n_perm):
            vals = _mulmod_m61(h, a[p]) + b[p]  # < 2**61+2 + 2**61
            vals = (vals >> np.uint64(61)) + (vals & _M61)
            vals = np.where(vals >= _M61, vals - _M61, vals)
            sig[:, p] = np.minimum.reduceat(vals, starts)
    finally:
        np.seterr(**old)
    return sig


def band_hashes(sig: np.ndarray, n_bands: int = 32) -> np.ndarray:
    """(n_docs, n_bands) int64 LSH bucket keys: fold each band's rows
    through the splitmix64 mixer, salted by the band index."""
    n_docs, n_perm = sig.shape
    r = n_perm // n_bands
    chunks = sig.reshape(n_docs, n_bands, r)
    old = np.seterr(over="ignore")
    try:
        acc = _mix64(np.arange(n_bands, dtype=np.uint64) * _LEN_SALT)[None, :]
        acc = np.broadcast_to(acc, (n_docs, n_bands)).copy()
        for j in range(r):
            acc = _mix64(acc ^ chunks[:, :, j])
    finally:
        np.seterr(**old)
    return (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def hash_strings(arr) -> np.ndarray:
    """One 64-bit hash per string element, vectorized over the flat
    utf-8 buffer (for deterministic salting / bucketing of id columns —
    replaces per-row crc32/blake2b loops)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs, data = _flat_utf8(arr)
    if len(offs) - 1 == 0:
        return np.zeros(0, np.uint64)
    return span_hashes(offs[:-1], offs[1:] - offs[:-1], data)


_WS_BYTES = np.zeros(256, bool)
for _b in (9, 10, 11, 12, 13, 32):
    _WS_BYTES[_b] = True


def token_hashes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Per-document whitespace-token hashes (one hash per OCCURRENCE,
    not distinct).  Returns (token_offsets int64 (n+1), flat uint64).

    ASCII fast path (r4): token spans are found directly in the flat
    document byte buffer (whitespace-byte transitions), so no per-token
    string array is ever materialized; hashes are span hashes over the
    doc buffer — identical values, the polynomial hash only sees the
    span's own bytes.  Non-ASCII batches fall back to Arrow's unicode
    splitter."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs, data = _flat_utf8(arr)
    n_docs = len(offs) - 1
    if n_docs == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.uint64)
    if len(data) == 0 or int(data.max()) < 128:
        nonws = ~_WS_BYTES[data]
        # doc boundaries also terminate tokens: treat each doc start as
        # "preceded by whitespace"
        prev_nonws = np.zeros(len(data), bool)
        prev_nonws[1:] = nonws[:-1]
        prev_nonws[offs[:-1][offs[:-1] < len(data)]] = False
        starts = np.nonzero(nonws & ~prev_nonws)[0]
        next_nonws = np.zeros(len(data), bool)
        next_nonws[:-1] = nonws[1:]
        next_nonws[(offs[1:] - 1)[(offs[1:] - 1) >= 0]] = False
        ends = np.nonzero(nonws & ~next_nonws)[0] + 1
        doc_of_tok = np.searchsorted(offs, starts, side="right") - 1
        tok_counts = np.bincount(doc_of_tok, minlength=n_docs)
        doc_offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(tok_counts, out=doc_offs[1:])
        if len(starts) == 0:
            return doc_offs, np.zeros(0, np.uint64)
        return doc_offs, span_hashes(starts, ends - starts, data)
    toks = pc.utf8_split_whitespace(arr)
    flat_tokens = toks.flatten()
    # Arrow's splitter emits EMPTY tokens at leading/trailing
    # whitespace; Python split() (and the SQL oracles' list_filter) do
    # not — drop them so both paths agree (r4)
    raw_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    toffs, tdata = _flat_utf8(flat_tokens)
    tok_lens = toffs[1:] - toffs[:-1]
    keep = tok_lens > 0
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), raw_counts)[keep]
    doc_offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(np.bincount(doc_of_tok, minlength=n_docs), out=doc_offs[1:])
    if not keep.any():
        return doc_offs, np.zeros(0, np.uint64)
    h = span_hashes(toffs[:-1][keep], tok_lens[keep], tdata)
    return doc_offs, h


def simhash_batch(arr) -> np.ndarray:
    """64-bit weighted-token SimHash per document, vectorized: token
    hashes -> ±1 bit matrix -> segment-sum per doc (add.reduceat) ->
    sign -> packed uint64.  Docs with no tokens hash to 0."""
    doc_offs, th = token_hashes(arr)
    n_docs = len(doc_offs) - 1
    out = np.zeros(n_docs, np.uint64)
    if len(th) == 0 or n_docs == 0:
        return out
    # bit j of h == (h >> j) & 1 == unpackbits(little-endian bytes,
    # bitorder='little') column j — one uint8 matrix, no ±1 temps
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    starts = doc_offs[:-1]
    counts = doc_offs[1:] - starts
    nonempty = counts > 0
    ne_starts = starts[nonempty]
    if len(ne_starts):
        acc = np.add.reduceat(bits, ne_starts, axis=0, dtype=np.int64)
        # bit set iff majority of tokens set it: 2*ones > n_tokens
        bset = (2 * acc) > counts[nonempty][:, None]
        shifts = np.arange(64, dtype=np.uint64)
        old = np.seterr(over="ignore")
        try:
            packed = (bset.astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        finally:
            np.seterr(**old)
        out[nonempty] = packed
    return out


def hamming_matrix(h: np.ndarray) -> np.ndarray:
    """(n, n) pairwise Hamming distances of uint64 signatures via
    unpackbits popcount (vectorized, for LSH bucket verification)."""
    x = h[:, None] ^ h[None, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).reshape(len(h), len(h), 64).sum(axis=2)
