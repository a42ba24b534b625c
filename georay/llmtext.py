"""Corpus-hygiene operators for LLM training-data pipelines (round 4b).

* duplicate-n-gram coverage — cross-document duplicate char-k-gram
  detection per Lee et al. 2021 ("Deduplicating Training Data Makes
  Language Models Better", substring-dedup family): every position
  whose k-gram also occurs in ANOTHER document is flagged, and the
  per-document character coverage of the union of flagged spans is
  reported.  Gram keys are the raw k bytes packed losslessly into
  ceil(k/8) uint64 words, so equality is exact string equality (no
  hash-collision caveat) while comparisons stay vectorized uint64
  lexsorts.  The heavy step is a single hash-bucket shuffle of
  (key, doc, pos) rows — never an all-pairs product.
* token-repetition stats — Gopher-style (Rae et al. 2021) intra-doc
  repetition signals: distinct-token count, most-frequent-token
  fraction, duplicated-token fraction; one lexsort per batch over the
  vectorized token hashes (texthash.token_hashes).
* PII scrub — RE2 email/phone/IPv4 counting + redaction via Arrow's
  count_substring_regex / replace_substring_regex C++ kernels.  DuckDB
  also uses RE2, so the SQL oracle shares exact regex semantics.
* stratified sampling — deterministic per-stratum rate sampling with a
  splitmix64(id) threshold (georay.rng; the SQL oracle recomputes the
  identical uint64 stream), so the sample is reproducible across
  partitionings, resumable, and exactly verifiable.

All per-batch kernels are numpy/Arrow vectorized; nothing iterates
Python rows.  Reference scope note: these extend the engine beyond
georust/geo per the training-data-pipeline mandate (BASELINE.md).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import _flat_utf8, _mix64, token_hashes

DUP_K = 32          # chars per gram (spans ~5 vocabulary words)
DUP_P = 64          # shuffle buckets for the key exchange


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (within-segment indices)."""
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def gram_keys(arr, k: int = DUP_K) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact packed char-k-gram keys of a string array.

    Returns (grams_per_doc int64 (n,), pos int64 (m,) 0-based within
    doc, keys uint64 (m, ceil(k/8)) little-endian byte packing,
    doc_idx int64 (m,) row index into arr).  Packing is injective, so
    key equality == substring equality (the 100-TB path would swap in a
    64-bit hash and accept ~2^-64 collisions; at verification scale we
    keep exactness for free).
    """
    offs, data = _flat_utf8(arr)
    lens = offs[1:] - offs[:-1]
    cnt = np.maximum(lens - k + 1, 0).astype(np.int64)
    w = (k + 7) // 8
    total = int(cnt.sum())
    if total == 0:
        return cnt, np.zeros(0, np.int64), np.zeros((0, w), np.uint64), np.zeros(0, np.int64)
    pos = _seg_arange(cnt)
    doc_idx = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    starts = np.repeat(offs[:-1], cnt) + pos
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    g = win[starts]                      # (m, k) uint8 gather
    if w * 8 != k:
        g = np.concatenate([g, np.zeros((g.shape[0], w * 8 - k), np.uint8)], axis=1)
    keys = np.ascontiguousarray(g).view(np.uint64)
    return cnt, pos, keys, doc_idx


def _key_bucket(keys: np.ndarray, p: int) -> np.ndarray:
    """Shuffle bucket of each packed key row: mix-combine the words."""
    h = np.zeros(len(keys), np.uint64)
    for j in range(keys.shape[1]):
        h = _mix64(h ^ keys[:, j])
    return (h % np.uint64(p)).astype(np.int64)


def _mark_cross_doc_dups(g: pa.Table, w: int) -> pa.Table:
    """One shuffle bucket: keep (doc_id, pos) rows whose key occurs in
    >= 2 distinct documents.  One lexsort, boundary flags, no Python
    per key."""
    doc = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    kw = [g.column(f"w{j}").to_numpy(zero_copy_only=False).astype(np.uint64)
          for j in range(w)]
    order = np.lexsort((pos, doc, *reversed(kw)))
    doc_s = doc[order]
    m = len(doc_s)
    if m == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    new_key = np.zeros(m, bool)
    new_key[0] = True
    for c in kw:
        cs = c[order]
        new_key[1:] |= cs[1:] != cs[:-1]
    run_id = np.cumsum(new_key) - 1
    # distinct docs per key run: rows within a run are doc-sorted, so a
    # doc change inside the run == a new distinct doc
    new_doc = np.zeros(m, bool)
    new_doc[0] = True
    new_doc[1:] = new_key[1:] | (doc_s[1:] != doc_s[:-1])
    n_runs = int(run_id[-1]) + 1
    distinct = np.bincount(run_id[new_doc], minlength=n_runs)
    keep = distinct[run_id] >= 2
    return pa.table({"doc_id": pa.array(doc_s[keep]),
                     "pos": pa.array(pos[order][keep])})


def _coverage_bucket(g: pa.Table, k: int) -> pa.Table:
    """One doc-bucket: per-document count of duplicated positions and
    character coverage of the union of [pos, pos+k) spans.  Positions
    are sorted ascending per doc, so a new island starts where
    pos > prev_pos + k (spans of consecutive flagged positions overlap
    whenever the gap <= k)."""
    doc = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    m = len(doc)
    if m == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_dup": pa.array([], pa.int64()),
                         "dup_cov": pa.array([], pa.int64())})
    new_doc = np.zeros(m, bool)
    new_doc[0] = True
    new_doc[1:] = doc[1:] != doc[:-1]
    new_isl = new_doc.copy()
    new_isl[1:] |= pos[1:] > pos[:-1] + k
    isl_starts = np.nonzero(new_isl)[0]
    isl_ends = np.append(isl_starts[1:], m)
    isl_len = pos[isl_ends - 1] - pos[isl_starts] + k
    isl_doc_rank = (np.cumsum(new_doc) - 1)[isl_starts]
    n_docs = int(isl_doc_rank[-1]) + 1
    cov = np.bincount(isl_doc_rank, weights=isl_len, minlength=n_docs).astype(np.int64)
    doc_rank = np.cumsum(new_doc) - 1
    n_dup = np.bincount(doc_rank, minlength=n_docs).astype(np.int64)
    return pa.table({"doc_id": pa.array(doc[new_doc]),
                     "n_dup": pa.array(n_dup),
                     "dup_cov": pa.array(cov)})


def _gram_hash64(keys: np.ndarray) -> np.ndarray:
    """Full 64-bit mix of the packed gram-key words (the _key_bucket
    hash WITHOUT the % p)."""
    h = np.zeros(len(keys), np.uint64)
    for j in range(keys.shape[1]):
        h = _mix64(h ^ keys[:, j])
    return h


def dup_hash_candidates(docs, text_col: str, k: int, p: int,
                        max_entries: int | None = None) -> np.ndarray | None:
    """Pass 1 of the dup-gram prefilter (r4c): the sorted set of
    64-bit gram hashes occurring >= 2 times in the corpus — a strict
    SUPERSET of the cross-document duplicates (within-doc repeats and
    hash collisions pass too; the exact stage re-checks), so filtering
    with it cannot change results.  The exchange ships only 8-byte
    hashes pre-collapsed per batch; measured on the 200k-doc bench
    corpus only ~0.7% of gram occurrences survive, so the exact-key
    exchange downstream shrinks ~150x.  Returns None (= skip
    filtering) when the candidate set would exceed ``max_entries``
    (env GEORAY_DUPGRAM_PREFILTER_MAX, default 50M ~= 400 MB — at
    larger scale swap the broadcast set for a Bloom filter)."""
    import os

    from .shuffleops import bucket_ids

    if max_entries is None:
        max_entries = int(os.environ.get("GEORAY_DUPGRAM_PREFILTER_MAX", str(50_000_000)))

    def hashes(b: pa.Table) -> pa.Table:
        _, _, keys, _ = gram_keys(b.column(text_col), k)
        h, c = np.unique(_gram_hash64(keys), return_counts=True)
        t = pa.table({"h": pa.array(h, pa.uint64()),
                      "cnt": pa.array(c.astype(np.int64))})
        return t.append_column("__bucket", pa.array(bucket_ids(t.column("h"), p)))

    def dups(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        t = (g.group_by("h").aggregate([("cnt", "sum")])
             .rename_columns(["h", "cnt"]))
        keep = pc.greater_equal(t.column("cnt"), pa.scalar(2, pa.int64()))
        return t.filter(keep).select(["h"])

    cand = (
        docs.map_batches(hashes, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dups, batch_format="pyarrow")
    )
    parts = []
    total = 0
    for b in cand.iter_batches(batch_format="pyarrow"):
        if len(b):
            arr = b.column("h").to_numpy(zero_copy_only=False)
            parts.append(arr)
            total += len(arr)
            if total > max_entries:
                return None
    if not parts:
        return np.zeros(0, np.uint64)
    out = np.concatenate(parts)
    out.sort()
    return out


def dup_ngram_plan(docs, k: int = DUP_K, p: int = DUP_P,
                   prefilter: bool | None = None):
    """Dataset plan: documents(doc_id, text) -> (doc_id, n_grams,
    n_dup, dup_cov) with cross-document duplicate-k-gram detection.

    Stage 1 explodes each doc into (packed key, doc_id, pos) rows and
    shuffles them by key bucket (the only wide exchange; volume is
    O(total chars * ceil(k/8)/8), never all-pairs).  Stage 2 flags rows
    whose key spans >= 2 docs.  Stage 3 re-shuffles the (small) flagged
    set by doc bucket and computes interval-union coverage.  Stage 4
    left-joins per-doc gram counts so zero-dup docs keep a row.
    """
    import ray

    from .shuffleops import bucket_join

    w = (k + 7) // 8
    if prefilter is None:
        # measured r4c on this single box (200k docs): 58.7 s without
        # vs 60.7 s with — extraction + sort dominate locally, so the
        # pass-1 cost isn't repaid.  On a multi-node cluster the wide
        # exchange crosses the NETWORK and the ~5x byte reduction
        # (8-byte hashes vs 44-byte key rows, then a ~150x-smaller
        # exact exchange) is the winning trade — enable it there.
        prefilter = os.environ.get("GEORAY_DUPGRAM_PREFILTER", "0") == "1"
    cand = dup_hash_candidates(docs, "text", k, p) if prefilter else None
    cref = ray.put(cand) if cand is not None else None

    def extract(b: pa.Table) -> pa.Table:
        cnt, pos, keys, didx = gram_keys(b.column("text"), k)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if cref is not None:
            # pass-1 prefilter: only candidate-hash grams enter the
            # exact-key exchange (strict superset of true dups, so the
            # output is unchanged)
            cset = ray.get(cref)
            hh = _gram_hash64(keys)
            if len(cset) == 0:
                mask = np.zeros(len(hh), bool)
            else:
                ix = np.searchsorted(cset, hh)
                valid = ix < len(cset)
                ix[~valid] = 0
                mask = valid & (cset[ix] == hh)
            pos, keys, didx = pos[mask], keys[mask], didx[mask]
        # pos rides as int32 (a 2 GiB single document would overflow it
        # long after the explode itself became impossible); the bucket
        # id as int32 — together ~20% off the only wide exchange
        cols = {"doc_id": pa.array(ids[didx]),
                "pos": pa.array(pos.astype(np.int32))}
        for j in range(w):
            cols[f"w{j}"] = pa.array(keys[:, j])
        t = pa.table(cols)
        return t.append_column(
            "__bucket", pa.array(_key_bucket(keys, p).astype(np.int32))
        )

    dup_rows = (
        docs.map_batches(extract, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g, w=w: _mark_cross_doc_dups(g.drop_columns(["__bucket"]), w),
            batch_format="pyarrow",
        )
    )

    def to_doc_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array((_mix64(d.astype(np.uint64)) % np.uint64(p)).astype(np.int64))
        )

    cov = (
        dup_rows.map_batches(to_doc_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g, k=k: _coverage_bucket(g.drop_columns(["__bucket"]), k),
            batch_format="pyarrow",
        )
    )

    def counts(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(b.column("text")), pa.int64())
        ng = pc.max_element_wise(pc.subtract(n, pa.scalar(k - 1, pa.int64())),
                                 pa.scalar(0, pa.int64()))
        return pa.table({"doc_id": b.column("doc_id"), "n_grams": ng})

    base = docs.map_batches(counts, batch_format="pyarrow")
    joined = bucket_join(
        base, cov, "doc_id", "doc_id", p=p, how="left outer",
        left_types={"doc_id": pa.int64(), "n_grams": pa.int64()},
        right_types={"doc_id": pa.int64(), "n_dup": pa.int64(), "dup_cov": pa.int64()},
    )

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_grams": b.column("n_grams"),
            "n_dup": pc.fill_null(b.column("n_dup"), 0),
            "dup_cov": pc.fill_null(b.column("dup_cov"), 0),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token repetition stats (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def token_rep_stats_batch(arr) -> pa.Table | dict:
    """Per-doc (n_tokens, n_distinct, top_tok_frac, dup_tok_frac) from
    one lexsort over the batch's token hashes.  Token identity is the
    64-bit polynomial span hash (texthash) — injective on any real
    vocabulary at verification scale and the exact hash the SQL side
    reproduces for SimHash; the oracle compares token STRINGS, which
    agrees unless two distinct tokens collide in 64 bits."""
    from .text import _round_half_away_vec

    doc_offs, h = token_hashes(arr)
    n_docs = len(doc_offs) - 1
    counts = (doc_offs[1:] - doc_offs[:-1]).astype(np.int64)
    n_distinct = np.zeros(n_docs, np.int64)
    top = np.zeros(n_docs, np.int64)
    dup = np.zeros(n_docs, np.int64)
    if len(h):
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        order = np.lexsort((h, doc_of))
        hs, ds = h[order], doc_of[order]
        m = len(hs)
        new_doc = np.zeros(m, bool)
        new_doc[0] = True
        new_doc[1:] = ds[1:] != ds[:-1]
        new_run = new_doc.copy()
        new_run[1:] |= hs[1:] != hs[:-1]
        run_starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(run_starts, m))
        run_doc = ds[run_starts]
        n_distinct = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
        doc_first_run = np.nonzero(new_doc[run_starts])[0]
        nonempty = np.nonzero(counts > 0)[0]
        top[nonempty] = np.maximum.reduceat(run_len, doc_first_run)
        dup_w = np.where(run_len >= 2, run_len, 0)
        dup[nonempty] = np.add.reduceat(dup_w, doc_first_run)
    safe = np.maximum(counts, 1).astype(np.float64)
    return {
        "n_tokens": counts,
        "n_distinct": n_distinct,
        "top_tok_frac": _round_half_away_vec(top / safe, 6),
        "dup_tok_frac": _round_half_away_vec(dup / safe, 6),
    }


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,3}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub_batch(arr) -> dict:
    """Count + redact emails/phones/IPv4s — four RE2 C++ passes, no
    Python per doc.  Order matters (email before IPv4: a redacted
    email's host no longer looks like a dotted quad)."""
    n_email = pc.count_substring_regex(arr, PII_EMAIL)
    n_phone = pc.count_substring_regex(arr, PII_PHONE)
    scrubbed = pc.replace_substring_regex(arr, PII_EMAIL, "<EMAIL>")
    n_ip = pc.count_substring_regex(scrubbed, PII_IPV4)
    scrubbed = pc.replace_substring_regex(scrubbed, PII_PHONE, "<PHONE>")
    scrubbed = pc.replace_substring_regex(scrubbed, PII_IPV4, "<IP>")
    return {
        "n_email": pc.cast(n_email, pa.int64()),
        "n_phone": pc.cast(n_phone, pa.int64()),
        "n_ip": pc.cast(n_ip, pa.int64()),
        "scrubbed_len": pc.cast(pc.utf8_length(scrubbed), pa.int64()),
        "scrubbed": scrubbed,
    }


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

SAMPLE_MOD = 1 << 20
# dyadic per-language rates (exact integer thresholds in 2^20ths);
# sqlgen imports these so Ray and SQL can never drift
STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125, "zh": 0.125}
DEFAULT_RATE = 0.0625


def stratified_sample(ds, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0):
    """Keep each row iff splitmix64(id) % 2^20 < rate(stratum) * 2^20.

    Deterministic in the row's own (id, stratum) — independent of
    partitioning, resumable, and exactly reproducible in SQL.  Rates
    should be dyadic (k/2^20) so thresholds are exact integers."""
    from .rng import splitmix64

    thresholds = {s: int(round(r * SAMPLE_MOD)) for s, r in rates.items()}
    dflt = int(round(default_rate * SAMPLE_MOD))

    def f(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        strata = b.column(stratum_col).to_pandas().to_numpy()
        u = splitmix64(ids.view(np.uint64)) % np.uint64(SAMPLE_MOD)
        thr = np.full(len(ids), dflt, np.uint64)
        for s, t in thresholds.items():
            thr[strata == s] = t
        return b.filter(pa.array(u < thr))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination (r4c) — flag training documents that share
# char-k-gram spans with an evaluation/benchmark set (the standard
# train-test-overlap hygiene pass: GPT-3 appendix C, Lee et al. 2021
# §6; n-gram-overlap flavor).  Same exact packed-key machinery as
# dup_ngram_plan: the only wide exchange is one key-bucket shuffle of
# (key, side, doc, pos) rows — never train x eval pairs.
# ---------------------------------------------------------------------------


def _mark_eval_hits(g: pa.Table, w: int) -> pa.Table:
    """One key bucket: keep TRAIN (doc_id, pos) rows whose key also
    occurs on the EVAL side.  One lexsort + per-run any-eval flag."""
    doc = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    ev = g.column("is_eval").to_numpy(zero_copy_only=False).astype(bool)
    kw = [g.column(f"w{j}").to_numpy(zero_copy_only=False).astype(np.uint64)
          for j in range(w)]
    m = len(doc)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64())})
    if m == 0:
        return empty
    order = np.lexsort((pos, doc, *reversed(kw)))
    new_key = np.zeros(m, bool)
    new_key[0] = True
    for c in kw:
        cs = c[order]
        new_key[1:] |= cs[1:] != cs[:-1]
    run_id = np.cumsum(new_key) - 1
    n_runs = int(run_id[-1]) + 1
    has_eval = np.bincount(run_id, weights=ev[order], minlength=n_runs) > 0
    keep = has_eval[run_id] & ~ev[order]
    return pa.table({"doc_id": pa.array(doc[order][keep]),
                     "pos": pa.array(pos[order][keep])})


def decontam_plan(train, eval_ds, k: int = DUP_K, p: int = DUP_P):
    """(train, eval) Datasets of (doc_id, text) -> per-TRAIN-doc
    (doc_id, n_grams, n_hit, hit_cov, contaminated): positions whose
    k-gram occurs anywhere in the eval set, the character coverage of
    the union of those spans, and the boolean flag.  Mirrors
    dup_ngram_plan's three stages with an eval-side tag."""
    from .shuffleops import bucket_join

    w = (k + 7) // 8

    def extract(is_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            cnt, pos, keys, didx = gram_keys(b.column("text"), k)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"doc_id": pa.array(ids[didx]),
                    "pos": pa.array(pos.astype(np.int32)),
                    "is_eval": pa.array(np.full(len(pos), is_eval))}
            for j in range(w):
                cols[f"w{j}"] = pa.array(keys[:, j])
            t = pa.table(cols)
            return t.append_column(
                "__bucket", pa.array(_key_bucket(keys, p).astype(np.int32))
            )
        return f

    hits = (
        train.map_batches(extract(False), batch_format="pyarrow")
        .union(eval_ds.map_batches(extract(True), batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(
            lambda g, w=w: _mark_eval_hits(g.drop_columns(["__bucket"]), w),
            batch_format="pyarrow",
        )
    )

    def to_doc_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array((_mix64(d.astype(np.uint64)) % np.uint64(p)).astype(np.int64))
        )

    cov = (
        hits.map_batches(to_doc_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g, k=k: _coverage_bucket(g.drop_columns(["__bucket"]), k),
            batch_format="pyarrow",
        )
    )

    def counts(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(b.column("text")), pa.int64())
        ng = pc.max_element_wise(pc.subtract(n, pa.scalar(k - 1, pa.int64())),
                                 pa.scalar(0, pa.int64()))
        return pa.table({"doc_id": b.column("doc_id"), "n_grams": ng})

    base = train.map_batches(counts, batch_format="pyarrow")
    joined = bucket_join(
        base, cov, "doc_id", "doc_id", p=p, how="left outer",
        left_types={"doc_id": pa.int64(), "n_grams": pa.int64()},
        right_types={"doc_id": pa.int64(), "n_dup": pa.int64(), "dup_cov": pa.int64()},
    )

    def fill(b: pa.Table) -> pa.Table:
        n_hit = pc.fill_null(b.column("n_dup"), 0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_grams": b.column("n_grams"),
            "n_hit": n_hit,
            "hit_cov": pc.fill_null(b.column("dup_cov"), 0),
            "contaminated": pc.greater(n_hit, pa.scalar(0, pa.int64())),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BPE pair statistics (r4c) — the inner primitive of byte-pair-encoding
# tokenizer training (Sennrich et al. 2016): corpus-wide counts of
# adjacent within-token byte pairs; the argmax pair is the next BPE
# merge.  One bincount(65536) per batch (pure numpy over the zero-copy
# flat utf-8 buffer), a bucketed sum of the <= 65536-row count table,
# and a constant-bounded final top-k — corpus size never reaches the
# driver.
# ---------------------------------------------------------------------------

BPE_TOP_K = 32


def bpe_pair_counts_batch(arr) -> pa.Table:
    """(b1, b2, cnt) partial counts of adjacent within-token byte
    pairs for one batch of documents."""
    offs, data = _flat_utf8(arr)
    n = len(data)
    if n < 2:
        return pa.table({"b1": pa.array([], pa.int64()),
                         "b2": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    ws = np.zeros(256, bool)
    for b in (9, 10, 11, 12, 13, 32):
        ws[b] = True
    nonws = ~ws[data]
    ok = nonws[:-1] & nonws[1:]
    # a pair must not span a document boundary (adjacent docs are
    # adjacent in the flat buffer)
    bnd = offs[1:-1]
    ok[bnd[(bnd > 0) & (bnd < n)] - 1] = False
    keys = data[:-1][ok].astype(np.int64) * 256 + data[1:][ok].astype(np.int64)
    cnt = np.bincount(keys, minlength=65536)
    nz = np.nonzero(cnt)[0]
    return pa.table({
        "b1": pa.array(nz // 256),
        "b2": pa.array(nz % 256),
        "cnt": pa.array(cnt[nz]),
    })


def bpe_top_pairs(docs, text_col: str = "text", k: int = BPE_TOP_K, p: int = 64):
    """Dataset -> top-k (b1, b2, cnt, rank) byte pairs, ties by
    (b1, b2) ascending — the next k BPE merge candidates."""
    from .shuffleops import bucket_ids

    def partial(b: pa.Table) -> pa.Table:
        t = bpe_pair_counts_batch(b.column(text_col))
        key = t.column("b1").to_numpy(zero_copy_only=False) * 256 + \
            t.column("b2").to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(
            bucket_ids(pa.array(key), p)))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        return (
            g.group_by(["b1", "b2"]).aggregate([("cnt", "sum")])
            .rename_columns(["b1", "b2", "cnt"])
        )

    counts = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )
    # final top-k over a CONSTANT-bounded (<= 65536 rows) table
    full = counts.to_pandas()
    if full.empty:
        # empty corpus: to_pandas loses the schema (the cc.py r4c bug
        # class) — rebuild it so downstream column access works
        import pandas as _pd

        full = _pd.DataFrame({"b1": [], "b2": [], "cnt": []})
    full = full.sort_values(["cnt", "b1", "b2"],
                            ascending=[False, True, True]).head(k)
    full = full.reset_index(drop=True)
    full["rank"] = np.arange(1, len(full) + 1, dtype=np.int64)
    return pa.table({
        "rank": pa.array(full["rank"], pa.int64()),
        "b1": pa.array(full["b1"], pa.int64()),
        "b2": pa.array(full["b2"], pa.int64()),
        "cnt": pa.array(full["cnt"], pa.int64()),
    })


# ---------------------------------------------------------------------------
# substring-dedup REWRITE (r4c) — the actual text-cleaning form of
# Lee et al. 2021: duplicated char-k-gram spans are REMOVED from every
# document except the span's canonical owner (the minimal doc_id that
# contains the gram), and the cleaned text is emitted.  Same single
# key-bucket exchange as dup_ngram_plan; the rewrite pass co-shuffles
# the flagged positions with the document text by doc bucket and
# rebuilds every cleaned string in one vectorized byte-mask pass over
# the bucket's flat utf-8 buffer (no per-document Python strings).
# ---------------------------------------------------------------------------


def _mark_nonowner_dups(g: pa.Table, w: int) -> pa.Table:
    """One key bucket: keep (doc_id, pos) rows whose key occurs in
    >= 2 distinct documents AND whose doc is NOT the minimal owner."""
    doc = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    kw = [g.column(f"w{j}").to_numpy(zero_copy_only=False).astype(np.uint64)
          for j in range(w)]
    m = len(doc)
    if m == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    order = np.lexsort((pos, doc, *reversed(kw)))
    doc_s = doc[order]
    new_key = np.zeros(m, bool)
    new_key[0] = True
    for c in kw:
        cs = c[order]
        new_key[1:] |= cs[1:] != cs[:-1]
    run_id = np.cumsum(new_key) - 1
    n_runs = int(run_id[-1]) + 1
    new_doc = np.zeros(m, bool)
    new_doc[0] = True
    new_doc[1:] = new_key[1:] | (doc_s[1:] != doc_s[:-1])
    distinct = np.bincount(run_id[new_doc], minlength=n_runs)
    run_starts = np.nonzero(new_key)[0]
    min_doc = doc_s[run_starts]  # rows are doc-sorted within a run
    keep = (distinct[run_id] >= 2) & (doc_s != min_doc[run_id])
    return pa.table({"doc_id": pa.array(doc_s[keep]),
                     "pos": pa.array(pos[order][keep])})


def dedup_spans_plan(docs, k: int = DUP_K, p: int = DUP_P):
    """documents(doc_id, text) -> (doc_id, clean_text, removed_chars):
    the union of non-owner duplicate k-gram spans is cut out of each
    document; owners (and unique text) pass through unchanged."""
    w = (k + 7) // 8

    def extract(b: pa.Table) -> pa.Table:
        cnt, pos, keys, didx = gram_keys(b.column("text"), k)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"doc_id": pa.array(ids[didx]),
                "pos": pa.array(pos.astype(np.int32))}
        for j in range(w):
            cols[f"w{j}"] = pa.array(keys[:, j])
        t = pa.table(cols)
        return t.append_column(
            "__bucket", pa.array(_key_bucket(keys, p).astype(np.int32))
        )

    flagged = (
        docs.map_batches(extract, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g, w=w: _mark_nonowner_dups(g.drop_columns(["__bucket"]), w),
            batch_format="pyarrow",
        )
    )

    def doc_bucket_of(d: np.ndarray) -> np.ndarray:
        return (_mix64(d.astype(np.uint64)) % np.uint64(p)).astype(np.int32)

    def tag_flag(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(d),
            "pos": b.column("pos").combine_chunks().cast(pa.int64()),
            "text": pa.nulls(len(d), pa.string()),
            "__bucket": pa.array(doc_bucket_of(d)),
        })

    def tag_doc(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(d),
            "pos": pa.nulls(len(d), pa.int64()),
            "text": b.column("text"),
            "__bucket": pa.array(doc_bucket_of(d)),
        })

    def rewrite(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        is_doc = pc.is_valid(g.column("text"))
        dt = g.filter(is_doc)
        fl = g.filter(pc.invert(is_doc))
        ids = dt.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        dt = dt.take(pa.array(order))
        ids = ids[order]
        offs, data = _flat_utf8(dt.column("text"))
        lens = offs[1:] - offs[:-1]
        fd = fl.column("doc_id").to_numpy(zero_copy_only=False)
        fp = fl.column("pos").to_numpy(zero_copy_only=False)
        # map flagged doc ids -> row index in this bucket's doc table
        ridx = np.searchsorted(ids, fd)
        # interval-diff removal mask over the flat buffer
        delta = np.zeros(len(data) + 1, np.int64)
        starts = offs[:-1][ridx] + fp
        ends = np.minimum(starts + k, offs[1:][ridx])
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        removed = np.cumsum(delta[:-1]) > 0
        kept = data[~removed]
        rem_per_doc = np.zeros(len(ids), np.int64)
        doc_of_byte = np.searchsorted(offs, np.nonzero(removed)[0], side="right") - 1
        if len(doc_of_byte):
            rem_per_doc += np.bincount(doc_of_byte, minlength=len(ids))
        new_lens = lens - rem_per_doc
        new_offs = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        clean = pa.StringArray.from_buffers(
            len(ids),
            pa.py_buffer(new_offs.tobytes()),
            pa.py_buffer(kept.tobytes()),
        )
        return pa.table({
            "doc_id": dt.column("doc_id"),
            "clean_text": clean,
            "removed_chars": pa.array(rem_per_doc),
        })

    return (
        flagged.map_batches(tag_flag, batch_format="pyarrow")
        .union(docs.select_columns(["doc_id", "text"]).map_batches(tag_doc, batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(rewrite, batch_format="pyarrow")
    )
