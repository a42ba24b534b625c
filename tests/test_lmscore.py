"""ngram_lm_score (lmscore.py): corpus-trained add-1 bigram LM scoring
vs a pure-Python reference on a tiny corpus."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa


def _reference(texts: dict[int, str]):
    toks = {d: t.split() for d, t in texts.items()}
    bigrams = Counter()
    ctx = Counter()
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bigrams[(a, b)] += 1
            ctx[a] += 1
    V = len(vocab)
    out = {}
    for d, ts in toks.items():
        qs = [
            math.floor(1e6 * math.log((bigrams[(a, b)] + 1) / (ctx[a] + V)))
            for a, b in zip(ts, ts[1:])
        ]
        n = len(qs)
        sum_q = sum(qs)
        avg = ((-sum_q) // n) / 1e6 if n else 0.0
        out[d] = (n, sum_q, avg)
    return out


def test_ngram_lm_score_matches_reference(ray_session):
    import ray.data as rd

    from georay.lmscore import ngram_lm_score

    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the cat",
        2: "dogs bark",
        3: "single",          # < 2 tokens: n_bigrams 0, avg 0.0
        4: "",                # empty doc
        5: "the the the the",  # repetition scores CHEAP (high prob)
        6: "zebra quark vortex nimbus",  # all-unseen bigrams score dear
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)]),
        }
    )
    got = (
        ngram_lm_score(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    ref = _reference(texts)
    for d, (n, sum_q, avg) in ref.items():
        assert got.loc[d, "n_bigrams"] == n, d
        assert got.loc[d, "sum_q"] == sum_q, d
        assert np.isclose(got.loc[d, "avg_nll"], avg, atol=0), d
    # the self-trained LM ranks repetition as higher-likelihood than
    # novel text (the CCNet filtering signal, inverted for word soup)
    assert got.loc[5, "avg_nll"] < got.loc[6, "avg_nll"]


def test_tfidf_score_matches_reference(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    from georay.lmscore import tfidf_score

    texts = {
        0: "apple banana apple cherry",
        1: "banana cherry cherry dates",
        2: "apple apple apple",
        3: "",
        4: "unique quintessence",
    }
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)]),
    })
    got = (
        tfidf_score(rd.from_arrow(t).repartition(3))
        .to_pandas().set_index("doc_id").sort_index()
    )
    N = len(texts)
    df = Counter()
    for s in texts.values():
        df.update(set(s.split()))
    idf = {w: math.floor(1e6 * math.log(N / d)) for w, d in df.items()}
    for d, s in texts.items():
        tf = Counter(s.split())
        sum_w = sum(c * idf[w] for w, c in tf.items())
        n = sum(tf.values())
        assert got.loc[d, "n_tokens"] == n
        assert got.loc[d, "tfidf_sum"] == sum_w
        assert got.loc[d, "tfidf_avg"] == (sum_w // n if n else 0)
    # common terms (df = N) contribute zero mass; rare terms dominate
    assert got.loc[4, "tfidf_avg"] > got.loc[2, "tfidf_avg"]
