"""Per-partition lineage records + resume-from-checkpoint.

Resumable output layout (SURVEY.md §4 checkpoint/resume row): the
flagship pipeline writes one directory per tile-bucket partition, each
committed ATOMICALLY (write to ``<dir>.tmp-<pid>``, fsync, rename) with
a ``_lineage.json`` manifest recording input fragments, row counts,
kernel versions and wall time.  A re-run lists committed manifests and
anti-joins them against the partition plan — finished partitions are
skipped without reading their input.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

KERNEL_VERSION = "georay-0.1.0"


def partition_dir(root: str, key: str) -> str:
    return os.path.join(root, f"part={key}")


def is_committed(root: str, key: str) -> bool:
    return os.path.exists(os.path.join(partition_dir(root, key), "_lineage.json"))


def committed_partitions(root: str) -> set[str]:
    if not os.path.isdir(root):
        return set()
    recover_stranded(root)
    out = set()
    for name in os.listdir(root):
        if name.startswith("part=") and os.path.exists(os.path.join(root, name, "_lineage.json")):
            out.add(name[len("part=") :])
    return out


def recover_stranded(root: str) -> list[str]:
    """Restore partitions stranded by a crash inside commit_partition's
    replace window: the old data sits at ``part=<key>.old-<pid>`` while
    ``part=<key>`` is missing (crash between the two os.replace calls —
    ADVICE r2 lineage finding).  Restores the newest complete aside when
    the final path is absent; removes leftover asides otherwise."""
    restored = []
    # group asides per key so repeated crashes restore the NEWEST
    # complete aside (ADVICE r3: lexicographic scan restored the first)
    by_key: dict[str, list[str]] = {}
    for name in os.listdir(root):
        if ".old-" not in name or not name.startswith("part="):
            continue
        by_key.setdefault(name.split(".old-")[0], []).append(name)
    for key, names in by_key.items():
        final = os.path.join(root, key)
        if not os.path.exists(final):
            complete = [
                n for n in names
                if os.path.exists(os.path.join(root, n, "_lineage.json"))
            ]
            if complete:
                newest = max(
                    complete, key=lambda n: os.stat(os.path.join(root, n)).st_mtime
                )
                os.replace(os.path.join(root, newest), final)
                names = [n for n in names if n != newest]
                restored.append(final)
        if os.path.exists(final):
            for n in names:
                shutil.rmtree(os.path.join(root, n), ignore_errors=True)
    return restored


def commit_partition(
    root: str,
    key: str,
    table: pa.Table,
    inputs: list[str] | None = None,
    metrics: dict | None = None,
) -> str:
    """Atomically write one partition + its lineage manifest."""
    final = partition_dir(root, key)
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=f".tmp-{key}-")
    try:
        t0 = time.perf_counter()
        pq.write_table(table, os.path.join(tmp, "data.parquet"), compression="zstd")
        write_s = round(time.perf_counter() - t0, 6)
        manifest = {
            "partition": key,
            "rows": table.num_rows,
            "columns": table.schema.names,
            "inputs": inputs or [],
            "kernel_version": KERNEL_VERSION,
            "committed_at": time.time(),
            # caller metrics + the partition's own parquet write time
            # (operator-metrics surface; georay.metrics aggregates the
            # executor-level view)
            "metrics": {**(metrics or {}), "write_s": write_s},
        }
        with open(os.path.join(tmp, "_lineage.json"), "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        # fsync the parquet payload and the tmp dir so the rename below
        # publishes durable bytes (crash between write and rename must
        # not commit a torn partition)
        fd = os.open(os.path.join(tmp, "data.parquet"), os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        dfd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        if os.path.exists(final):
            # rename the old partition aside first: a crash here leaves
            # either the old or the new partition committed, never neither
            aside = final + f".old-{os.getpid()}-{time.monotonic_ns()}"
            os.replace(final, aside)
            os.replace(tmp, final)
            shutil.rmtree(aside, ignore_errors=True)
        else:
            os.replace(tmp, final)
        return final
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
