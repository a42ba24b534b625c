"""Lance-shaped dataset sink/source (BASELINE.json input_hint names
Lance tables; no lance wheel ships in this container — probed again
r4: ``import lance`` / ``import pylance`` both absent).

When the real ``lance`` package is importable, write_dataset /
read_dataset delegate to it.  Otherwise a parquet STAND-IN mirrors the
Lance dataset layout so a future swap is mechanical (VERDICT r3 next
#9):

    <uri>/data/<version>-<n>.parquet     immutable fragment files
    <uri>/_versions/<version>.manifest.json
                                         fragment list + schema + stats

Manifests are append-only versions (Lance's versioned-manifest model):
``append`` writes NEW fragments and a NEW manifest listing old + new —
fragments are never rewritten, so concurrent readers of version v are
unaffected and time travel is ``read_dataset(uri, version=v)``.
Commit order (fragments -> fsync -> manifest rename) makes a crashed
append invisible: the manifest is the atomic commit point, exactly the
property the tile-partitioned lineage sink relies on.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - exercised only when a wheel appears
    import lance as _lance
except ImportError:
    _lance = None


def _versions_dir(uri: str) -> str:
    return os.path.join(uri, "_versions")


def _manifest_path(uri: str, version: int) -> str:
    return os.path.join(_versions_dir(uri), f"{version}.manifest.json")


def dataset_versions(uri: str) -> list[int]:
    vd = _versions_dir(uri)
    if not os.path.isdir(vd):
        return []
    return sorted(
        int(n.split(".")[0]) for n in os.listdir(vd) if n.endswith(".manifest.json")
    )


def _load_manifest(uri: str, version: int | None) -> dict:
    vs = dataset_versions(uri)
    if not vs:
        raise FileNotFoundError(f"no lance-layout dataset at {uri}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    with open(_manifest_path(uri, v)) as f:
        return json.load(f)


def write_dataset(data, uri: str, mode: str = "create") -> dict:
    """data: pyarrow Table or Ray Dataset.  mode: 'create' | 'append'.
    Returns the committed manifest."""
    if _lance is not None:
        _lance.write_dataset(data, uri, mode=mode)
        ds = _lance.dataset(uri)
        return {"version": ds.version, "lance": True}
    vs = dataset_versions(uri)
    if mode == "create" and vs:
        raise FileExistsError(f"{uri} exists (versions {vs}); use mode='append'")
    if mode == "append" and not vs:
        raise FileNotFoundError(f"{uri} has no versions to append to")
    version = (vs[-1] if vs else 0) + 1
    data_dir = os.path.join(uri, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(_versions_dir(uri), exist_ok=True)

    prev_frags = _load_manifest(uri, None)["fragments"] if vs else []
    new_frags = []

    def _commit_fragment(tbl: pa.Table, n: int) -> dict:
        name = f"{version}-{n}.parquet"
        tmp = os.path.join(data_dir, f".tmp-{name}")
        pq.write_table(tbl, tmp, compression="zstd")
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, os.path.join(data_dir, name))
        return {"id": len(prev_frags) + n, "file": f"data/{name}", "rows": tbl.num_rows}

    if isinstance(data, pa.Table):
        new_frags.append(_commit_fragment(data, 0))
        schema = data.schema
    else:  # Ray Dataset: one fragment per block, streamed
        schema = None
        n = 0
        for batch in data.iter_batches(batch_format="pyarrow", batch_size=None):
            if len(batch) == 0:
                continue
            if schema is None:
                schema = batch.schema
            new_frags.append(_commit_fragment(batch, n))
            n += 1
        if schema is None:
            raise ValueError("empty dataset; nothing to commit")

    manifest = {
        "version": version,
        "fragments": prev_frags + new_frags,
        "schema": {f.name: str(f.type) for f in schema},
        "rows": sum(f["rows"] for f in prev_frags + new_frags),
    }
    # manifest rename is the atomic commit point
    fdnt = tempfile.NamedTemporaryFile(
        "w", dir=_versions_dir(uri), delete=False, suffix=".tmp"
    )
    with fdnt as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(fdnt.name, _manifest_path(uri, version))
    return manifest


def read_dataset(uri: str, version: int | None = None, columns=None):
    """Ray Dataset over exactly the fragments of one manifest version."""
    if _lance is not None:
        import ray.data as rd

        return rd.read_lance(uri, columns=columns)
    import ray.data as rd

    m = _load_manifest(uri, version)
    files = [os.path.join(uri, f["file"]) for f in m["fragments"]]
    return rd.read_parquet(files, columns=columns)


def read_table(uri: str, version: int | None = None) -> pa.Table:
    """Driver-side read of one version (small results / tests)."""
    m = _load_manifest(uri, version)
    tabs = [pq.read_table(os.path.join(uri, f["file"])) for f in m["fragments"]]
    return pa.concat_tables(tabs) if tabs else pa.table({})
