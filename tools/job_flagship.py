"""Cluster job driver for the flagship spatial-join + tiling pipeline.

Submit to a running Ray cluster (the north-rule deployment shape):

    ray job submit --working-dir /root/repo -- \
        python tools/job_flagship.py --sf-dir /data/sf1 --out /data/tiles

On a cluster the job connects to the existing session
(``address="auto"``); standalone it falls back to a local session, so
the same script smoke-tests on one node.  Output is tile-partitioned
parquet with per-partition lineage manifests and a run-level
``_metrics.json`` (operator metrics), so a resubmitted job resumes —
finished partitions are skipped without reading their input.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--predicate", default="contains")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="standalone fallback only; ignored when a cluster exists")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False, logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")

    from georay.pipelines import flagship

    t0 = time.perf_counter()
    summary = flagship.run_flagship(
        args.sf_dir, out_dir=args.out, predicate=args.predicate,
        resume=not args.no_resume,
    )
    summary["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
