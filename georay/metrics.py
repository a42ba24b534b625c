"""Operator metrics emission (north-star line item: "emits
per-partition lineage records and operator metrics").

Two complementary surfaces, both Ray-Data-idiomatic:

* **per-partition metrics** ride inside each partition's
  ``_lineage.json`` manifest (georay.lineage.commit_partition already
  carries a metrics dict): rows, payload bytes and commit wall time,
  so a resume can reason about partition cost as well as completeness.
* **per-operator metrics** come from Ray Data's own streaming-executor
  accounting (``Dataset.stats()``) — the executor already measures
  per-operator wall time, blocks and rows with zero overhead, so we
  parse that report into a stable JSON structure and persist it as
  ``_metrics.json`` next to the partitioned output instead of
  re-instrumenting every batch function.

The parser is defensive: it keeps the raw stats text verbatim (the
authoritative record) and extracts the per-operator lines it
recognises; an unrecognised format degrades to raw-only, never an
error in the write path.
"""

from __future__ import annotations

import json
import os
import re
import time

# "Operator N ReadParquet->MapBatches(f): executed in 1.23s" style
# header lines (Ray Data 2.4x); tolerate minor format drift.
_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (?:\d+ tasks executed, )?(\d+) blocks produced in ([0-9.]+)s",
    re.MULTILINE,
)
_ROWS_RE = re.compile(r"Output num rows per block: [^\n]*?([0-9,]+) total")
_BYTES_RE = re.compile(r"Output size bytes per block: [^\n]*?([0-9,]+) total")


def parse_dataset_stats(stats_text: str) -> list[dict]:
    """Best-effort structured view of ``Dataset.stats()``: one record
    per operator with wall seconds, blocks, and (when present) total
    rows/bytes out."""
    ops: list[dict] = []
    matches = list(_OP_RE.finditer(stats_text))
    for i, m in enumerate(matches):
        seg_end = matches[i + 1].start() if i + 1 < len(matches) else len(stats_text)
        seg = stats_text[m.start() : seg_end]
        rec = {
            "operator": m.group(2),
            "index": int(m.group(1)),
            "blocks": int(m.group(3)),
            "wall_s": float(m.group(4)),
        }
        rows = _ROWS_RE.search(seg)
        if rows:
            rec["rows_out"] = int(rows.group(1).replace(",", ""))
        nbytes = _BYTES_RE.search(seg)
        if nbytes:
            rec["bytes_out"] = int(nbytes.group(1).replace(",", ""))
        ops.append(rec)
    return ops


def write_run_metrics(out_dir: str, ds, extra: dict | None = None) -> str:
    """Persist the run's operator metrics next to its partitions.

    ``ds`` must be an executed Dataset (stats exist only after
    execution).  Returns the metrics file path."""
    raw = ""
    try:
        raw = ds.stats()
    except Exception:
        pass
    payload = {
        "written_at": time.time(),
        "operators": parse_dataset_stats(raw) if raw else [],
        "raw_stats": raw,
    }
    if extra:
        payload.update(extra)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_metrics.json")
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def read_run_metrics(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, "_metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
