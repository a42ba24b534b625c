"""Corpus-hygiene operators (georay.llmtext): duplicate-n-gram
coverage, token repetition stats, PII scrub, stratified sampling —
each vectorized kernel is checked against a plain-Python oracle, and
the distributed plans against brute force / repartition invariance."""

import re

import numpy as np
import pyarrow as pa
import pytest

from georay import llmtext


# ---------------------------------------------------------------------------
# gram_keys
# ---------------------------------------------------------------------------

def test_gram_keys_exact_packing():
    docs = ["abcdefghij", "abc", "", "xxabcdefghzz", "abcdefgh"]
    k = 8
    cnt, pos, keys, didx = llmtext.gram_keys(pa.array(docs), k)
    assert cnt.tolist() == [3, 0, 0, 5, 1]
    # rebuild each gram from the packed words and compare to substrings
    flat = keys.view(np.uint8).reshape(len(keys), -1)[:, :k]
    for r in range(len(pos)):
        want = docs[didx[r]][pos[r] : pos[r] + k]
        got = bytes(flat[r]).decode()
        assert got == want
    # injective: equal keys <=> equal substrings
    a = docs[0][0:8]
    assert a == docs[3][2:10]
    rows = [r for r in range(len(pos)) if (didx[r], pos[r]) in ((0, 0), (3, 2))]
    assert len(rows) == 2
    assert np.array_equal(keys[rows[0]], keys[rows[1]])


def _brute_dup_cov(docs, k):
    """Python oracle: duplicated-position count + span-union coverage."""
    owners = {}
    for di, s in enumerate(docs):
        for i in range(max(len(s) - k + 1, 0)):
            g = s[i : i + k]
            prev = owners.get(g)
            if prev is None:
                owners[g] = di
            elif prev != di:
                owners[g] = -2
    out = {}
    for di, s in enumerate(docs):
        n_grams = max(len(s) - k + 1, 0)
        dup_pos = [
            i for i in range(n_grams) if owners.get(s[i : i + k]) == -2
        ]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + k))
        out[di] = (n_grams, len(dup_pos), len(covered))
    return out


def test_dup_ngram_plan_matches_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(words, size=rng.integers(3, 25))))
    # plant an exact shared 40-char phrase in several docs
    phrase = "the quick brown fox jumps over the lazy dog"
    docs[3] += " " + phrase
    docs[17] = phrase + " " + docs[17]
    docs[29] += " " + phrase + " " + phrase
    docs.append("xy")  # shorter than k
    k = 16
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ).repartition(5)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_cov"])
        for r in llmtext.dup_ngram_plan(ds, k=k, p=8).take_all()
    }
    assert got == _brute_dup_cov(docs, k)


# ---------------------------------------------------------------------------
# token repetition stats
# ---------------------------------------------------------------------------

def test_token_rep_stats_vs_counter():
    from collections import Counter

    docs = [
        "a b c a b a",
        "x",
        "one two three",
        "dup dup dup dup",
        "  padded   tokens  here padded ",
    ]
    out = llmtext.token_rep_stats_batch(pa.array(docs))
    for i, s in enumerate(docs):
        c = Counter(s.split())
        n = sum(c.values())
        assert out["n_tokens"][i] == n
        assert out["n_distinct"][i] == len(c)
        assert out["top_tok_frac"][i] == pytest.approx(
            round(max(c.values()) / n, 6), abs=1e-9
        )
        dup = sum(v for v in c.values() if v >= 2)
        assert out["dup_tok_frac"][i] == pytest.approx(round(dup / n, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redaction():
    docs = [
        "reach me at jane.doe+spam@mail.example.org or bob@x.io thanks",
        "call +1-555-0042 or +44-123-4567 at host 192.168.0.1",
        "no pii here",
        "edge 999.999.999.999 still counts as dotted quad shape",
    ]
    out = llmtext.pii_scrub_batch(pa.array(docs))
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 2, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0, 1]
    scrubbed = out["scrubbed"].to_pylist()
    assert "<EMAIL>" in scrubbed[0] and "@" not in scrubbed[0]
    assert scrubbed[1].count("<PHONE>") == 2 and "<IP>" in scrubbed[1]
    assert scrubbed[2] == docs[2]
    # python-re cross-check of the email pattern on doc 0
    assert len(re.findall(llmtext.PII_EMAIL, docs[0])) == 2


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_rated(ray_session):
    import ray.data as rd

    n = 4000
    langs = np.array(["en", "de", "fr", "es", "zh"])[
        np.arange(n) % 5
    ]
    tb = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                   "lang": pa.array(langs)})
    rates = {"en": 0.5, "de": 0.25}
    a = llmtext.stratified_sample(rd.from_arrow(tb), "doc_id", "lang", rates, 0.0625)
    b = llmtext.stratified_sample(
        rd.from_arrow(tb).repartition(13), "doc_id", "lang", rates, 0.0625
    )
    ra = sorted(r["doc_id"] for r in a.take_all())
    rb = sorted(r["doc_id"] for r in b.take_all())
    assert ra == rb  # partitioning-independent
    got = {}
    kept = set(ra)
    for lang in ("en", "de", "fr"):
        ids = np.nonzero(langs == lang)[0]
        got[lang] = sum(int(i) in kept for i in ids) / len(ids)
    assert got["en"] == pytest.approx(0.5, abs=0.06)
    assert got["de"] == pytest.approx(0.25, abs=0.05)
    assert got["fr"] == pytest.approx(0.0625, abs=0.03)  # default rate


# ---------------------------------------------------------------------------
# winnowing fingerprint sets + near-dup groups (r4b)
# ---------------------------------------------------------------------------

def test_winnow_fp_sets_matches_scalar():
    import pyarrow as pa

    from georay import text as gtext

    docs = ["", "ab", "abcde", "abcdefgh", "zzzzzzzzzzzz",
            "hello world this is a longer document with words " * 3,
            "héllo wörld non-ascii fallback path here"]
    offs, flat = gtext.winnow_fp_sets(pa.array(docs))
    for i, s in enumerate(docs):
        got = set(flat[offs[i]:offs[i + 1]].tolist())
        assert got == gtext.fingerprint_set(s), i


def test_winnow_neardup_groups_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import dedup

    # pseudorandom 8-hex words, distinct per (doc, position): chance
    # 5-gram overlap between different docs is negligible, so the
    # planted passage is effectively the ONLY shared content (uniform
    # formatted vocabularies share k-gram fragments by construction,
    # which is corpus noise, not an operator property)
    def word(u: int) -> str:
        return f"{(u * 2654435761) % (1 << 32):08x}"

    docs = [
        " ".join(word(i * 40 + j) for j in range(40)) for i in range(60)
    ]
    passage = " ".join(word(1_000_000 + j) for j in range(25))
    docs[5] += " " + passage
    docs[31] = passage + " " + docs[31]
    docs[47] += " " + passage
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ).repartition(4)
    # uniform "wNNNN" words share 5-gram fragments by construction, so a
    # higher shared-fingerprint threshold isolates the planted passage
    # (~60 fingerprints) from chance fragment overlap
    out = {r["doc_id"]: r["group"]
           for r in dedup.winnow_neardup(ds, t_shared=12).take_all()}
    assert len(out) == len(docs)
    # the three passage-sharing docs form one group labelled by the min id
    assert out[5] == out[31] == out[47] == 5
    # everyone else is a singleton
    for i, g in out.items():
        if i not in (5, 31, 47):
            assert g == i, (i, g)


def test_decontam_plan_planted(ray_session):
    """Planted train-eval overlap: a train doc embedding a verbatim
    eval passage is flagged with the exact hit coverage; clean docs
    are not."""
    import ray.data as rd

    from georay.llmtext import DUP_K, decontam_plan

    eval_txt = "the quick brown fox jumps over the lazy dog near the riverbank today"
    clean = "completely unrelated words fill this training document with noise"
    leaked = "prefix words here " + eval_txt + " suffix words trail after"
    train = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([clean, leaked]),
    })
    ev = pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array([eval_txt]),
    })
    got = (
        decontam_plan(rd.from_arrow(train), rd.from_arrow(ev))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert not got.loc[1, "contaminated"]
    assert got.loc[1, "n_hit"] == 0 and got.loc[1, "hit_cov"] == 0
    assert got.loc[2, "contaminated"]
    # every K-gram fully inside the embedded passage hits; the union of
    # those spans covers exactly len(eval_txt) chars
    assert got.loc[2, "n_hit"] == len(eval_txt) - DUP_K + 1
    assert got.loc[2, "hit_cov"] == len(eval_txt)


def test_bucket_topk_matches_pandas(ray_session):
    """bucket_topk == the row_number() window on a skewed synthetic
    table, independent of partitioning; per-batch pre-collapse keeps
    at most k rows per (batch, key)."""
    import pandas as pd
    import ray.data as rd

    from georay.shuffleops import bucket_topk

    rs = np.random.RandomState(5)
    n = 5000
    df = pd.DataFrame({
        "key": rs.choice(["a", "b", "hot", "d", "e"], n, p=[.1, .1, .6, .1, .1]),
        "val": rs.randint(0, 300, n).astype(np.int64),  # many ties
        "id": np.arange(n, dtype=np.int64),
    })
    want = (
        df.sort_values(["key", "val", "id"], ascending=[True, False, True])
        .groupby("key").head(4).reset_index(drop=True)
    )
    want["rank"] = want.groupby("key").cumcount() + 1
    for parts in (2, 11):
        got = (
            bucket_topk(
                rd.from_pandas(df).repartition(parts),
                key="key", order_col="val", k=4, tie_col="id",
            )
            .to_pandas().sort_values(["key", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["key", "val", "id", "rank"]],
            want[["key", "val", "id", "rank"]],
        )


def test_hll_distinct_accuracy_and_merge(ray_session):
    """HLL estimate lands within the theoretical error band
    (~1.04/sqrt(256) ~ 6.5%) of the true cardinality, identically
    across partitionings (register maxima are associative)."""
    import pandas as pd
    import ray.data as rd

    from georay.sketch import hll_distinct

    rs = np.random.RandomState(17)
    rows = []
    for g, n in (("a", 3000), ("b", 400), ("c", 12)):
        for i in range(n):
            rows.append((g, f"{g}-doc-{i}-{rs.randint(1 << 30)}"))
    df = pd.DataFrame(rows, columns=["lang", "text"])
    outs = []
    for parts in (3, 9):
        got = (
            hll_distinct(rd.from_pandas(df).repartition(parts), "lang", "text")
            .to_pandas().sort_values("lang").reset_index(drop=True)
        )
        outs.append(got)
        for g, n in (("a", 3000), ("b", 400), ("c", 12)):
            row = got[got["lang"] == g].iloc[0]
            assert row["n_exact"] == n
            assert abs(row["hll_est"] - n) / n < 0.2, (g, row["hll_est"])
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_exact_quantiles_vs_numpy(ray_session):
    """exact_quantiles == the ceil(q*n) order statistic, independent
    of partitioning, including heavy value ties."""
    import pandas as pd
    import ray.data as rd

    from georay.sketch import exact_quantiles

    rs = np.random.RandomState(23)
    df = pd.DataFrame({
        "key": rs.choice(["x", "y", "z"], 3000),
        "val": np.where(rs.rand(3000) < 0.3, 42,
                        rs.randint(0, 500, 3000)).astype(np.int64),
    })
    got = (
        exact_quantiles(rd.from_pandas(df).repartition(7), "key", "val")
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    for k in ("x", "y", "z"):
        vals = np.sort(df.loc[df["key"] == k, "val"].to_numpy())
        n = len(vals)
        row = got[got["key"] == k].iloc[0]
        assert row["n"] == n
        for frac, col in (((1, 2), "p50"), ((9, 10), "p90"), ((99, 100), "p99")):
            thr = (frac[0] * n + frac[1] - 1) // frac[1]
            assert row[col] == vals[thr - 1], (k, col)


def test_zscore_len_semantics(ray_session):
    """z_micro == floor(1e6 * classic population z-score) on a known
    corpus (cross-checked against plain numpy mean/std)."""
    from georay import queries

    got = (
        queries.zscore_len("/root/testdata/sf0.001")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    m = got.merge(docs[["doc_id", "lang", "n_chars"]], on=["doc_id", "lang"])
    for g, grp in m.groupby("lang"):
        x = grp["n_chars"].to_numpy(np.float64)
        z = (x - x.mean()) / x.std()  # population std
        want = np.floor(1e6 * z)
        assert np.abs(grp["z_micro"].to_numpy() - want).max() <= 1, g
    # per-group mean of z is ~0
    assert abs(m.groupby("lang")["z_micro"].mean()).max() < 2e4


def test_bpe_pair_counts_vs_counter(ray_session):
    from collections import Counter

    import ray.data as rd

    docs = ["hello hello world", "low lower lowest", "ab", "x", "",
            "  spaced   out  "]
    want = Counter()
    for d in docs:
        for tok in d.split():
            for a, b in zip(tok, tok[1:]):
                want[(ord(a), ord(b))] += 1
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = llmtext.bpe_top_pairs(rd.from_arrow(t).repartition(3), k=1000).to_pandas()
    got_map = {(r["b1"], r["b2"]): r["cnt"] for _, r in got.iterrows()}
    assert got_map == dict(want)
    # ranking: count desc, then (b1, b2) asc
    ranks = got.sort_values("rank")
    key = list(zip(-ranks["cnt"], ranks["b1"], ranks["b2"]))
    assert key == sorted(key)
    # 'lo' appears 5x (hello x2, low, lower, lowest), 'll' 2x (hello x2)
    assert got_map[(ord("l"), ord("o"))] == 5
    assert got_map[(ord("l"), ord("l"))] == 2


def test_dedup_spans_rewrite_planted(ray_session):
    """Planted duplicate passage: the owner (min doc_id) keeps its
    text verbatim; every other doc loses exactly the passage span;
    unique docs pass through untouched."""
    import ray.data as rd

    from georay.llmtext import DUP_K, dedup_spans_plan

    passage = "shared passage text that is comfortably longer than the gram size"
    assert len(passage) > DUP_K
    docs = {
        1: "unique document with entirely original content here",
        4: "AAA " + passage + " TAIL",
        2: passage + " owner extra words",   # min doc_id containing the grams
        9: "PREFIX " + passage,
    }
    t = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[d] for d in sorted(docs)]),
    })
    got = (
        dedup_spans_plan(rd.from_arrow(t).repartition(2))
        .to_pandas().set_index("doc_id").sort_index()
    )
    # brute-force reference of the exact semantics: a position is
    # removed iff its gram occurs in >= 2 docs and this doc is not the
    # min-id owner; removal is the union of flagged [i, i+K) spans
    gram_docs = {}
    for d, s in docs.items():
        for i in range(max(len(s) - DUP_K + 1, 0)):
            gram_docs.setdefault(s[i : i + DUP_K], set()).add(d)
    for d, s in docs.items():
        rm = np.zeros(len(s), bool)
        for i in range(max(len(s) - DUP_K + 1, 0)):
            owners = gram_docs[s[i : i + DUP_K]]
            if len(owners) >= 2 and d != min(owners):
                rm[i : i + DUP_K] = True
        want = "".join(c for c, r in zip(s, rm) if not r)
        assert got.loc[d, "clean_text"] == want, d
        assert got.loc[d, "removed_chars"] == int(rm.sum()), d
    # headline semantics: unique doc untouched, owner untouched, the
    # passage body gone from every non-owner
    assert got.loc[1, "clean_text"] == docs[1]
    assert got.loc[2, "removed_chars"] == 0  # owner of the passage grams
    for d in (4, 9):
        assert passage not in got.loc[d, "clean_text"]
        assert got.loc[d, "removed_chars"] >= len(passage)


def test_dup_ngram_prefilter_identical(ray_session):
    """The hash-prefiltered plan is result-identical to the direct
    plan (the candidate set is a strict superset of true dups)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    words = ["aa", "bb", "cc", "dd"]
    docs = [" ".join(rng.choice(words, size=rng.integers(8, 30))) for _ in range(30)]
    docs[5] += " xylophone quartz unique phrase present twice here"
    docs[21] = "xylophone quartz unique phrase present twice here " + docs[21]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ).repartition(4)
    a = sorted(map(tuple, llmtext.dup_ngram_plan(ds, k=16, p=8, prefilter=False)
                   .to_pandas().values.tolist()))
    b = sorted(map(tuple, llmtext.dup_ngram_plan(ds, k=16, p=8, prefilter=True)
                   .to_pandas().values.tolist()))
    assert a == b


def test_new_operators_empty_and_singleton_inputs(ray_session):
    """Every r4c operator handles the empty corpus and a single-row
    corpus without schema-loss crashes (the cc.py zero-edge bug
    class)."""
    import ray.data as rd

    from georay import dedup, lmscore, sketch
    from georay.shuffleops import bucket_topk

    def docs_tbl(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
        })

    empty = docs_tbl([])
    one = docs_tbl([(5, "en", "just one tiny document here")])
    cases = [
        ("lm", lambda t: lmscore.ngram_lm_score(rd.from_arrow(t))),
        ("tfidf", lambda t: lmscore.tfidf_score(rd.from_arrow(t))),
        ("dupgram", lambda t: llmtext.dup_ngram_plan(rd.from_arrow(t))),
        ("spans", lambda t: llmtext.dedup_spans_plan(
            rd.from_arrow(t).select_columns(["doc_id", "text"]))),
        ("decontam", lambda t: llmtext.decontam_plan(
            rd.from_arrow(t).select_columns(["doc_id", "text"]),
            rd.from_arrow(one).select_columns(["doc_id", "text"]))),
        ("bpe", lambda t: llmtext.bpe_top_pairs(rd.from_arrow(t))),
        ("hll", lambda t: sketch.hll_distinct(rd.from_arrow(t), "lang", "text")),
        ("quant", lambda t: sketch.exact_quantiles(rd.from_arrow(t), "lang", "n_chars")),
        ("topk", lambda t: bucket_topk(
            rd.from_arrow(t).select_columns(["lang", "doc_id", "n_chars"]),
            "lang", "n_chars", 3, "doc_id")),
        ("minhash", lambda t: dedup.minhash_lsh_dedup(rd.from_arrow(t))),
    ]
    for name, fn in cases:
        for label, t, want in (("empty", empty, 0), ("one", one, None)):
            r = fn(t)
            df = r.to_pandas() if hasattr(r, "to_pandas") else r
            if want is not None:
                assert len(df) == want, (name, label, len(df))
            else:
                assert len(df) >= (0 if name == "bpe" else 1), (name, label)
