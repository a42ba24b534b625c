"""End-to-end corpus-preparation pipeline (r4c) — the LLM-side
flagship: chain the engine's hygiene stages into ONE keep/drop
decision per document, entirely from existing operators:

1. eval-set holdout    — doc_id % 7 == 0 rows are the benchmark set
                         and never enter training output
                         (queries.DECONTAM_EVAL_MOD).
2. decontamination     — drop training docs sharing a char-32-gram
                         with the eval set (llmtext.decontam_plan).
3. quality floor       — >= MIN_TOKENS whitespace tokens.
4. near-dup dedup      — MinHash-LSH groups (dedup.minhash_lsh_dedup);
                         only the group representative (min doc_id)
                         survives.
5. stratified sampling — per-language splitmix64(doc_id) thresholds
                         (llmtext.stratified_sample).

Every stage is deterministic, so the SURVIVOR SET is recomputable in
SQL (sqlgen.q_corpus_pipeline composes the stages' oracles) and the
whole pipeline is hash-checked end to end — not just its parts.  The
combining joins are bucketed (no broadcast); the output is the
surviving (doc_id, lang, n_tokens) with per-stage boolean columns so
downstream audits can attribute every drop.

``write_corpus`` lands the survivors as tile-free partitioned parquet
through the same per-partition lineage commit protocol as the spatial
flagship (georay.lineage), so a crashed run resumes at partition
granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MIN_TOKENS = 30


def corpus_pipeline(docs):
    """documents Dataset -> surviving rows with per-stage flags."""
    from .. import dedup as gdedup
    from .. import llmtext
    from ..queries import DECONTAM_EVAL_MOD
    from ..shuffleops import bucket_join
    from ..sqlgen import MINHASH_T
    from ..text import token_count_batch

    slim = docs.select_columns(["doc_id", "lang", "text"])

    def side(keep_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = ids % DECONTAM_EVAL_MOD == 0
            return b.filter(pa.array(m if keep_eval else ~m))
        return f

    train = slim.map_batches(side(False), batch_format="pyarrow")
    ev = slim.map_batches(side(True), batch_format="pyarrow")

    # stage 2: decontamination flags (llmtext.decontam_plan)
    contam = llmtext.decontam_plan(
        train.select_columns(["doc_id", "text"]),
        ev.select_columns(["doc_id", "text"]),
    ).map_batches(
        lambda t: t.select(["doc_id", "contaminated"]), batch_format="pyarrow"
    )

    # stage 3 features + stage 5 sampling decision, one pass
    def feats(b: pa.Table) -> pa.Table:
        from ..llmtext import DEFAULT_RATE, SAMPLE_MOD, STRATA_RATES
        from ..rng import splitmix64

        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = token_count_batch(b.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        langs = b.column("lang").to_pylist()
        thr = np.array(
            [int(round(STRATA_RATES.get(g, DEFAULT_RATE) * SAMPLE_MOD)) for g in langs],
            np.uint64,
        )
        sampled = (splitmix64(ids.astype(np.uint64)) % np.uint64(SAMPLE_MOD)) < thr
        return pa.table({
            "doc_id": pa.array(ids),
            "lang": b.column("lang"),
            "n_tokens": pa.array(ntok),
            "quality_ok": pa.array(ntok >= MIN_TOKENS),
            "sampled": pa.array(sampled),
        })

    base = train.map_batches(feats, batch_format="pyarrow")

    # stage 4: near-dup representatives over the TRAINING side.
    # max_bucket: web corpora GUARANTEE hot band buckets (boilerplate);
    # the chain cap bounds them at O(m) while identical content still
    # groups.  Far above any sf-scale bucket, so the composed SQL
    # oracle (all-pairs semantics) is unaffected at verification scale.
    groups = gdedup.minhash_lsh_dedup(
        train.select_columns(["doc_id", "text"]), threshold=MINHASH_T,
        max_bucket=4096,
    ).map_batches(lambda t: t.select(["doc_id", "keep"]), batch_format="pyarrow")
    groups = groups.map_batches(
        lambda t: t.rename_columns(["doc_id", "dedup_keep"]), batch_format="pyarrow"
    )

    j1 = bucket_join(
        base, contam, "doc_id", "doc_id",
        left_types={"doc_id": pa.int64(), "lang": pa.string(),
                    "n_tokens": pa.int64(), "quality_ok": pa.bool_(),
                    "sampled": pa.bool_()},
        right_types={"doc_id": pa.int64(), "contaminated": pa.bool_()},
    )
    j2 = bucket_join(
        j1, groups, "doc_id", "doc_id",
        left_types={"doc_id": pa.int64(), "lang": pa.string(),
                    "n_tokens": pa.int64(), "quality_ok": pa.bool_(),
                    "sampled": pa.bool_(), "contaminated": pa.bool_()},
        right_types={"doc_id": pa.int64(), "dedup_keep": pa.bool_()},
    )

    def decide(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(t.column("quality_ok"), pc.invert(t.column("contaminated"))),
            pc.and_(t.column("dedup_keep"), t.column("sampled")),
        )
        return t.append_column("keep", keep)

    return j2.map_batches(decide, batch_format="pyarrow")


def corpus_survivors(docs):
    """Just the kept rows (doc_id, lang, n_tokens)."""
    out = corpus_pipeline(docs)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("keep"))
        return t.select(["doc_id", "lang", "n_tokens"])

    return out.map_batches(f, batch_format="pyarrow")


def write_corpus(docs, out_dir: str, n_parts: int = 16, resume: bool = True):
    """Land survivors as lang-partitioned parquet through the lineage
    commit protocol (one atomic partition per (lang, doc_id % n_parts)
    shard); a crashed run resumes at partition granularity."""
    from .. import lineage

    surv = corpus_survivors(docs).to_pandas()  # test scale; stream at prod scale
    done = lineage.committed_partitions(out_dir) if resume else set()
    written = []
    for lang, grp in surv.groupby("lang"):
        for shard in range(n_parts):
            part = grp[grp["doc_id"] % n_parts == shard]
            if not len(part):
                continue
            key = f"{lang}-{shard:04d}"
            if key in done:
                continue
            lineage.commit_partition(
                out_dir, key, pa.Table.from_pandas(part.reset_index(drop=True)),
                metrics={"lang": str(lang), "shard": shard, "rows": int(len(part))},
            )
            written.append(key)
    return written
