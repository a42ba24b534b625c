"""Parallelism-invariance check (SURVEY.md §7 hard part (d)).

Runs a set of partition-sensitive queries in two FRESH Ray sessions at
different num_cpus and asserts canonical-form hashes are identical —
the N-vs-4N exact-match reproducibility requirement of the north rule.

Usage: python tools/check_determinism.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

QUERIES = [
    "pip_contains",
    "knn_sample",
    "minhash_dedup",
    "dbscan_hot",
    "kmeans_assign",
    "tile_counts",
    "simhash_sig",
    "knn_all",
    "pip_count_by_polygon",
    "sessionize",
    "asof_join",
    "sliding_window",
    "kmeans_radius",
    "image_stats",
    # r4c additions — every one crosses at least one bucketed shuffle
    "semantic_dedup",
    "ngram_lm_score",
    "tfidf_docs",
    "hll_distinct_docs",
    "len_quantiles",
    "topk_docs_per_lang",
    "decontam_overlap",
    "dedup_spans",
    "bpe_top_pairs",
    "corpus_pipeline",
    "top_tokens_per_lang",
    "docs_rollup",
    "interval_join",
    # r5b additions — block-pair and band-bucket shuffles
    "embed_neardup_blocked",
    "image_neardup",
    "image_dedup_groups",
]

_WORKER = '''
import sys, hashlib
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from georay import queries
out = {{}}
for name in {queries!r}:
    res = queries.QUERIES[name](sys.argv[2])
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    out[name] = hashlib.md5(df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()
print("RESULT " + repr(out))
ray.shutdown()
'''


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.format(repo=repo, queries=QUERIES)
    path = "/tmp/georay_det_worker.py"
    with open(path, "w") as f:
        f.write(script)
    hashes = {}
    for n in ("2", "8"):
        r = subprocess.run(
            [sys.executable, path, n, sf_dir], capture_output=True, text=True, cwd=repo
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if not lines:
            print(f"run num_cpus={n} failed:\n{r.stderr[-800:]}")
            return 1
        hashes[n] = eval(lines[0][7:])  # noqa: S307 - our own repr output
    bad = 0
    for k in QUERIES:
        ok = hashes["2"][k] == hashes["8"][k]
        print(("OK  " if ok else "DIFF"), k)
        bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
