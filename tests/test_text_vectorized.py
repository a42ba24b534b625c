"""r4 vectorized text kernels vs their per-row reference semantics.

The scalar functions in georay.text are the REFERENCE; the batch
kernels (md5vec lanes, Horner token hashes, RE2 counting, winnow
sliding-min) must be bit-identical on adversarial inputs: empty docs,
whitespace-only, edge whitespace, equal-hash ties, multi-language
stopwords, non-ASCII fallback.
"""

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pytest

from georay import md5vec
from georay import text as T
from georay import texthash as TH

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[a-zA-Z0-9\s]")


def _corpus():
    rs = np.random.RandomState(42)
    words = ["the", "and", "of", "der", "die", "und", "le", "la", "les", "que",
             "el", "los", "y", "de5", "shi4", "xyz", "hello", "a", "b", "pour",
             "para", "dans", "es", "est", "is", "no", "pas", "not"]
    docs = ["", " ", "a", "ab", "abcd", "abcde", "abcdef", "la la la",
            "que y la", "le la que", "el la que y", "the der le el de5",
            "LA QUE", "x" * 9, "aaaaabaaaaab" * 3, " lead", "trail ",
            "\t\n mixed \t ws \n"]
    for _ in range(300):
        docs.append(" ".join(rs.choice(words, rs.randint(0, 40))))
    for _ in range(150):
        docs.append("".join(chr(rs.randint(32, 127)) for _ in range(rs.randint(0, 120))))
    return docs


def test_md5_lanes_match_hashlib():
    docs = _corpus() + ["z" * 55, "z" * 56, "z" * 64, "z" * 119, "z" * 120, "q" * 1000]
    arr = pa.array(docs)
    got = md5vec.md5_hex(arr).to_pylist()
    assert got == [hashlib.md5(t.encode()).hexdigest() for t in docs]


def test_md5_h32_fixed_path_matches_general():
    rs = np.random.RandomState(1)
    data = rs.randint(0, 256, 5000).astype(np.uint8)
    ws = np.arange(0, 4900, 3, dtype=np.int64)
    for k in (1, 4, 5, 8, 55):
        got = md5vec.md5_h32(ws, ws + k, data)
        want = np.array(
            [int(hashlib.md5(data[s : s + k].tobytes()).hexdigest()[:8], 16) for s in ws]
        )
        assert (got == want).all(), k


def test_winnow_batch_matches_scalar():
    arr = pa.array(_corpus())
    n_fp, min_fp = T.winnow_stats_batch(arr)
    for i, t in enumerate(arr.to_pylist()):
        fps = T.winnow_fingerprints(t)
        assert n_fp[i] == len(fps), (i, repr(t))
        assert min_fp[i] == min((h for _, h in fps), default=0), (i, repr(t))


def test_lang_batch_matches_scalar():
    arr = pa.array(_corpus())
    got = T.lang_guess_batch(arr)
    for i, t in enumerate(arr.to_pylist()):
        assert got[i] == T.guess_lang(t), (i, repr(t))


def test_quality_and_tokens_match_scalar():
    docs = _corpus()
    arr = pa.array(docs)
    pr, mtl = T.quality_batch(arr)
    ntok = T.token_count_batch(arr).to_numpy(zero_copy_only=False)

    def rha(x, d):
        p = 10.0**d
        return math.floor(abs(x) * p + 0.5) / p * (1.0 if x >= 0 else -1.0)

    for i, t in enumerate(docs):
        n = max(len(t), 1)
        assert pr[i] == rha(len(_PUNCT.sub("", t)) / n, 4), (i, repr(t))
        st = t.strip()
        want_m = 0.0 if not st else rha(len(_WS.sub("", st)) / len(_WS.split(st)), 2)
        assert mtl[i] == want_m, (i, repr(t))
        assert ntok[i] == (0 if not st else len(_WS.split(st))), (i, repr(t))


def test_token_hashes_python_split_semantics():
    """Both the ASCII byte-transition path and the unicode fallback must
    tokenize like str.split() — empty tokens from edge whitespace are
    dropped (the SQL oracles' list_filter convention)."""
    docs = _corpus()

    def ref(docs):
        offs, hs = [0], []
        for d in docs:
            toks = d.split()
            hs.extend(int(TH.hash_strings(pa.array([t]))[0]) for t in toks)
            offs.append(offs[-1] + len(toks))
        return np.array(offs), np.array(hs, np.uint64) if hs else np.zeros(0, np.uint64)

    for batch in (docs, docs + ["héllo  wörld ", " 日本語\tテスト"]):
        o1, h1 = TH.token_hashes(pa.array(batch))
        o2, h2 = ref(batch)
        assert (o1 == o2).all()
        assert (h1 == h2).all()


def test_horner_matches_table_span_hash():
    rs = np.random.RandomState(3)
    data = rs.randint(0, 256, 20000).astype(np.uint8)
    ws = np.sort(rs.randint(0, 19000, 2000)).astype(np.int64)
    lens = rs.randint(0, 60, 2000).astype(np.int64)
    got = TH.span_hashes(ws, lens, data)
    pw, S = TH._prefix_tables(data, 20000)
    want = TH._span_hash(ws, ws + lens, pw, S)
    assert (got == want).all()


def test_power_table_block_decomposition():
    for n in (0, 1, 1023, 1024, 100000):
        got = TH._power_table(TH._B, n)
        old = np.seterr(over="ignore")
        want = np.empty(n, np.uint64)
        if n:
            want[0] = 1
        if n > 1:
            want[1:] = np.cumprod(np.full(n - 1, TH._B, np.uint64))
        np.seterr(**old)
        assert (got == want).all(), n
