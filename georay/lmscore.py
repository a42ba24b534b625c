"""Corpus-trained n-gram LM quality scoring (CCNet-style, r4c).

Wenzek et al. 2020 ("CCNet: Extracting high quality monolingual
datasets from web crawl data") ranks documents by the perplexity of a
language model; the filtering signal is the per-document average
negative log-likelihood.  Here the LM is a token-BIGRAM model with
add-1 smoothing trained ON THE CORPUS ITSELF (a self-perplexity
signal — boilerplate and word-soup score differently from typical
text), which keeps the whole operator deterministic and
DuckDB-oracle-checkable:

    P(r | l) = (C(l, r) + 1) / (ctx(l) + V)

with C(l, r) the corpus bigram count, ctx(l) = sum_r C(l, r) (tokens
with a successor) and V the corpus vocabulary size.  Per-bigram log
probabilities are QUANTIZED to integer micro-nats

    q(l, r) = floor(1e6 * ln((C + 1) / (ctx + V)))         (int64)

so every aggregation downstream is EXACT integer arithmetic — the
float sum-order nondeterminism that would otherwise break the driver's
hash check across partitionings never arises (numpy and DuckDB compute
the same double `ln` of the same double ratio; only a ~4e-9-wide
boundary band around integer multiples of 1e-6 nats could flip a
floor, the same knife-edge class every round(,6) oracle carries).

Token identity is the 64-bit span hash of texthash.token_hashes (SQL
compares token STRINGS — agreement modulo 64-bit collisions, the
documented token_rep_stats caveat); bigram identity additionally
combines the two hashes into one 64-bit key (collision odds ~n^2/2^65,
same caveat class).

Scale shape (100 TB): everything is bucketed shuffles of slim count
tables — per-batch partial bigram counts pre-collapse BEFORE the
shuffle, the count/context/vocab tables are O(distinct bigrams) not
O(tokens), scoring is a bucketed hash join of bigram OCCURRENCES
against the q-table (never a broadcast of either side), and the only
driver-side value is the scalar V.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffleops import bucket_join, bucket_reduce, bucket_unique
from .texthash import _mix64, token_hashes

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _auto_p(n_docs: int) -> int:
    """Shuffle bucket count sized to the corpus: each bucket carries a
    few thousand docs' worth of count rows (measured r4c: 100k docs at
    P=64 is 1.45x faster than P=256 — per-bucket fixed overhead
    dominates small exchanges; the 256 cap holds to ~10^8 docs, pass
    more via the operators' p= for beyond)."""
    return int(min(256, max(16, n_docs // 2000)))


def _bigram_rows(b: pa.Table, id_col: str, text_col: str):
    """(doc_id int64, l uint64, r uint64) per bigram occurrence."""
    ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_offs, th = token_hashes(b.column(text_col))
    total = len(th)
    if total < 2:
        return ids[:0], th[:0], th[:0]
    # a position starts a bigram iff the NEXT position is in the same doc
    mask = np.ones(total, bool)
    ends = doc_offs[1:] - 1
    mask[ends[ends >= 0]] = False
    idx = np.nonzero(mask)[0]
    doc_of = np.searchsorted(doc_offs, idx, side="right") - 1
    return ids[doc_of], th[idx], th[idx + 1]


def _pair_key(bl: np.ndarray, br: np.ndarray) -> np.ndarray:
    old = np.seterr(over="ignore")
    try:
        return _mix64((bl * _GOLDEN) ^ br)
    finally:
        np.seterr(**old)


def ngram_lm_score(docs, id_col: str = "doc_id", text_col: str = "text",
                   p: int | None = None):
    """Dataset (doc_id, text, ...) -> Dataset (doc_id, n_bigrams,
    sum_q, avg_nll): avg_nll = -(sum_q / 1e6) / n_bigrams rounded to
    6 places (0.0 for docs with < 2 tokens)."""
    if p is None:
        p = _auto_p(docs.count())
    slim = docs.select_columns([id_col, text_col])

    def bigrams(b: pa.Table) -> pa.Table:
        d, bl, br = _bigram_rows(b, id_col, text_col)
        return pa.table(
            {
                id_col: pa.array(d, pa.int64()),
                "pk": pa.array(_pair_key(bl, br), pa.uint64()),
                "bl": pa.array(bl, pa.uint64()),
                "one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    big = slim.map_batches(bigrams, batch_format="pyarrow")
    # big is consumed three times (counts, occurrences join, per-doc
    # group) — materialize the exploded rows once
    big = big.materialize()

    # corpus bigram counts (pre-collapsed per batch before the shuffle)
    counts = bucket_reduce(
        big.map_batches(
            lambda t: t.select(["pk", "bl", "one"]), batch_format="pyarrow"
        ),
        "pk",
        [("one", "sum"), ("bl", "first")],
        p=p,
    ).map_batches(
        lambda t: t.rename_columns(["pk", "c2", "bl"]), batch_format="pyarrow"
    )
    counts = counts.materialize()

    # context totals ctx(l) = sum_r C(l, r)
    ctx = bucket_reduce(counts.select_columns(["bl", "c2"]), "bl", [("c2", "sum")], p=p)
    ctx = ctx.map_batches(
        lambda t: t.rename_columns(["bl", "ctxn"]), batch_format="pyarrow"
    )

    # vocabulary size V (distinct tokens, INCLUDING successor-less ones)
    def tok_rows(b: pa.Table) -> pa.Table:
        _, th = token_hashes(b.column(text_col))
        return pa.table({"tok": pa.array(np.unique(th), pa.uint64())})

    vocab = bucket_unique(slim.map_batches(tok_rows, batch_format="pyarrow"), "tok", p=p).count()

    # q-table: one int64 micro-nat logprob per DISTINCT bigram
    qtab = bucket_join(
        counts,
        ctx,
        left_on="bl",
        right_on="bl",
        left_types={"bl": pa.uint64(), "pk": pa.uint64(), "c2": pa.int64()},
        right_types={"bl": pa.uint64(), "ctxn": pa.int64()},
        p=p,
    )

    def quantize(t: pa.Table) -> pa.Table:
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        cn = t.column("ctxn").to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(1e6 * np.log((c2 + 1.0) / (cn + float(vocab)))).astype(np.int64)
        return pa.table({"pk": t.column("pk"), "q": pa.array(q)})

    qtab = qtab.map_batches(quantize, batch_format="pyarrow")

    # score every bigram OCCURRENCE (bucketed join, no broadcast)
    scored = bucket_join(
        big.map_batches(lambda t: t.select([id_col, "pk"]), batch_format="pyarrow"),
        qtab,
        left_on="pk",
        right_on="pk",
        left_types={"pk": pa.uint64(), id_col: pa.int64()},
        right_types={"pk": pa.uint64(), "q": pa.int64()},
        p=p,
    )
    scored = scored.map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow",
    )
    per_doc = bucket_reduce(scored, id_col, [("q", "sum"), ("one", "sum")], p=p)

    # all docs, 0 for the < 2-token ones
    out = bucket_join(
        docs.select_columns([id_col]),
        per_doc,
        left_on=id_col,
        right_on=id_col,
        how="left outer",
        left_types={id_col: pa.int64()},
        right_types={id_col: pa.int64(), "q": pa.int64(), "one": pa.int64()},
        p=p,
    )

    def finish(t: pa.Table) -> pa.Table:
        sq = t.column("q").to_numpy(zero_copy_only=False)
        n = t.column("one").to_numpy(zero_copy_only=False)
        sq = np.where(np.isnan(sq.astype(np.float64)), 0, sq).astype(np.int64) \
            if sq.dtype != np.int64 else sq
        n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64) \
            if n.dtype != np.int64 else n
        # average in INTEGER micro-nats (floor division of positives) —
        # sum_q/n is a small-denominator rational, so round-to-6 would
        # hit exact .5 boundaries where numpy (half-even) and DuckDB
        # (half-away) disagree; floor division is exact on both sides
        avg_q = (-sq) // np.where(n > 0, n, 1)
        avg = np.where(n > 0, avg_q / 1e6, 0.0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_bigrams": pa.array(n, pa.int64()),
                "sum_q": pa.array(sq, pa.int64()),
                "avg_nll": pa.array(avg, pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def tfidf_score(docs, id_col: str = "doc_id", text_col: str = "text",
                p: int | None = None):
    """Per-document TF-IDF mass (Sparck Jones 1972 idf), integer-exact:
    idf is quantized to micro-nats (floor(1e6 * ln(N / df)), int64)
    so every downstream aggregation is exact integer arithmetic — the
    same determinism device as ngram_lm_score.

    Scale shape: tf(doc, token) finalizes INSIDE each batch with one
    Arrow hash aggregation (documents never split across batches, so
    no shuffle is needed for tf); df is one bucketed reduce of the
    slim (token, 1) stream; scoring joins tf against the idf table by
    token hash (bucketed, no broadcast) and sums per doc.  Output:
    (doc_id, n_tokens, tfidf_sum, tfidf_avg) with tfidf_avg =
    tfidf_sum // n_tokens (floor of micro-nat mean per token)."""
    from .shuffleops import bucket_join, bucket_reduce
    from .texthash import token_hashes

    n_docs = docs.count()
    if p is None:
        p = _auto_p(n_docs)
    slim = docs.select_columns([id_col, text_col])

    def tf_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_offs, th = token_hashes(b.column(text_col))
        doc = np.repeat(ids, doc_offs[1:] - doc_offs[:-1])
        t = pa.table({
            id_col: pa.array(doc),
            "th": pa.array(th, pa.uint64()),
            "tf": pa.array(np.ones(len(th), np.int64)),
        })
        return (
            t.group_by([id_col, "th"]).aggregate([("tf", "sum")])
            .rename_columns([id_col, "th", "tf"])
        )

    tf = slim.map_batches(tf_rows, batch_format="pyarrow").materialize()

    ones = tf.map_batches(
        lambda t: pa.table({"th": t.column("th"),
                            "one": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow",
    )
    df = bucket_reduce(ones, "th", [("one", "sum")], p=p)

    def idf_rows(t: pa.Table) -> pa.Table:
        d = t.column("one").to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.floor(1e6 * np.log(float(n_docs) / d)).astype(np.int64)
        return pa.table({"th": t.column("th"), "idf": pa.array(idf)})

    idf = df.map_batches(idf_rows, batch_format="pyarrow")

    scored = bucket_join(
        tf, idf, left_on="th", right_on="th",
        left_types={"th": pa.uint64(), id_col: pa.int64(), "tf": pa.int64()},
        right_types={"th": pa.uint64(), "idf": pa.int64()},
        p=p,
    )

    def weigh(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False)
        idfv = t.column("idf").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "w": pa.array(tfv * idfv),
            "tf": t.column("tf"),
        })

    per_doc = bucket_reduce(
        scored.map_batches(weigh, batch_format="pyarrow"),
        id_col, [("w", "sum"), ("tf", "sum")], p=p,
    )

    out = bucket_join(
        docs.select_columns([id_col]), per_doc,
        left_on=id_col, right_on=id_col, how="left outer",
        left_types={id_col: pa.int64()},
        right_types={id_col: pa.int64(), "w": pa.int64(), "tf": pa.int64()},
        p=p,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.fill_null(t.column("w"), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.fill_null(t.column("tf"), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        avg = np.where(n > 0, w // np.where(n > 0, n, 1), 0)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n),
            "tfidf_sum": pa.array(w),
            "tfidf_avg": pa.array(avg),
        })

    return out.map_batches(finish, batch_format="pyarrow")
