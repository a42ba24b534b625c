"""Flagship pipeline: geolocate -> cell-encode -> spatial join -> tile.

    read images parquet (slim projection: the bytes column never enters
    the join hot path — SURVEY.md §7 hard part (c))
      -> map_batches(phash -> lon/lat)              [stateless, Arrow]
      -> map_batches(cell + tile encode)            [stateless, Arrow]
      -> map_batches(PipJoinActor, concurrency=N)   [actor pool, prepared
                                                     grid index per actor]
      -> (join rows)  or  tile-partitioned parquet via PipMatchCountActor

The polygon layer rides the object store once (``ray.put``) and every
actor builds its index once in ``__init__`` — no shuffle of the image
table at any point; the only wide op is the optional write partitioning.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import datagen, join, tiles
from ..imagecodec import decode_image, psnr

TILE_RES = 4  # 16 x 16 tile grid
CELL_RES = 6


def points_dataset(sf_dir: str, columns=("image_id", "phash"), override_num_blocks=None):
    paths = datagen.ensure_tables(sf_dir)
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_parquet(paths["images"], columns=list(columns), **kwargs)
    return ds.map_batches(join.add_lonlat, batch_format="pyarrow")


def polygon_table(sf_dir: str) -> pa.Table:
    paths = datagen.ensure_tables(sf_dir)
    return pq.read_table(paths["polygons"])


def join_rows(sf_dir: str, predicate: str = "contains", concurrency=(1, 8)):
    """The join archetype: (image_id, polygon_id) match pairs."""
    pts = points_dataset(sf_dir)
    polys = polygon_table(sf_dir)
    return join.broadcast_pip_join(pts, polys, predicate=predicate, concurrency=concurrency)


def check_invariants(batch: pa.Table, sample_mod: int = 64) -> pa.Table:
    """Per-row invariant stage (BASELINE.md): decode a deterministic
    sample of image bytes, assert PSNR >= 40 dB vs nothing lossy beyond
    the codec, and byte-exact captions (captions pass through Arrow
    untouched; any corruption upstream would surface here)."""
    phash = batch.column("phash").to_numpy(zero_copy_only=False)
    sample = np.nonzero(phash % sample_mod == 0)[0]
    for i in sample:
        data = batch.column("bytes")[int(i)].as_py()
        fmt = batch.column("fmt")[int(i)].as_py()
        px = decode_image(data, fmt)
        w = batch.column("w")[int(i)].as_py()
        h = batch.column("h")[int(i)].as_py()
        assert px.shape == (h, w, 3), "decoded shape mismatch"
        # reference pixels are regenerable from the deterministic stream
        img_idx = int(batch.column("image_id")[int(i)].as_py().split("-")[1])
        ref = datagen._pixels_for(img_idx, w, h)
        if fmt == "png":
            assert np.array_equal(px, ref), "lossless decode must be byte-exact"
        else:
            assert psnr(ref, px) >= 40.0, "lossy decode below 40 dB PSNR"
        cap = batch.column("caption")[int(i)].as_py()
        assert cap == datagen._caption_for(img_idx), "caption must be byte-exact"
    return batch


def join_tile_summarize(points_ds, polys: pa.Table, tile_res: int = TILE_RES):
    """The benchmark hot path: ONE fused map_batches composing the
    logical stages (geolocate -> tile -> PiP annotate -> per-block
    summary row).  Explicit composition keeps the stage fused with the
    parquet read (one task per input shard: read -> compute -> 1-row
    summary; nothing but 8-byte summaries crosses the object store),
    which measured ~2x faster than separately-declared map stages."""
    ref = ray.put(polys)

    def fused(b: pa.Table) -> pa.Table:
        b = join.add_lonlat(b)
        b = tiles.add_tile(b, tile_res)
        b = join._prepared(ref, join.PipMatchCountActor, predicate="contains")(b)
        return pa.table(
            {
                "rows": pa.array([len(b)], pa.int64()),
                "matches": pa.array([int(b.column("n_matches").to_numpy().sum())], pa.int64()),
            }
        )

    return points_ds.map_batches(fused, batch_format="pyarrow", batch_size=None)


def run_flagship(
    sf_dir: str,
    out_dir: str | None = None,
    predicate: str = "contains",
    concurrency=(1, 8),
    with_bytes: bool = True,
    resume: bool = True,
):
    """Full tiled output: every image row annotated with (n_matches,
    polygon_id, tile_id) and written as tile-bucketed parquet with
    per-partition lineage.  Returns the output Dataset (lazy) when
    out_dir is None, else writes and returns summary dict."""
    paths = datagen.ensure_tables(sf_dir)
    cols = ["image_id", "phash"] + (["bytes", "w", "h", "fmt", "caption"] if with_bytes else [])
    ds = rd.read_parquet(paths["images"], columns=cols)
    ds = ds.map_batches(join.add_lonlat, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: join.add_cell(b, CELL_RES), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: tiles.add_tile(b, TILE_RES), batch_format="pyarrow")
    if with_bytes:
        ds = ds.map_batches(check_invariants, batch_format="pyarrow")
    polys = pq.read_table(paths["polygons"])
    ds = join.broadcast_pip_annotate(
        ds, polys, predicate=predicate, batch_size=8192 if with_bytes else 65536
    )
    if out_dir is None:
        return ds

    from .. import lineage

    done = lineage.committed_partitions(out_dir) if resume else set()

    def write_tile_partition(group: pa.Table) -> pa.Table:
        tid = group.column("tile_id")[0].as_py()
        key = str(tid)
        if key in done:
            return pa.table({"tile_id": pa.array([tid], pa.int64()),
                             "rows": pa.array([0], pa.int64()),
                             "skipped": pa.array([True])})
        lineage.commit_partition(
            out_dir, key, group, inputs=[paths["images"]],
            metrics={"rows": group.num_rows, "bytes": group.nbytes},
        )
        return pa.table({"tile_id": pa.array([tid], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64()),
                         "skipped": pa.array([False])})

    grouped = ds.groupby("tile_id").map_groups(
        write_tile_partition, batch_format="pyarrow"
    )
    summary = grouped.to_pandas()
    # persist the executor's per-operator accounting next to the
    # partitions (georay.metrics — north-star operator-metrics surface)
    from .. import metrics as gmetrics

    gmetrics.write_run_metrics(
        out_dir, grouped,
        extra={"partitions": len(summary), "rows_written": int(summary["rows"].sum())},
    )
    return {
        "partitions": len(summary),
        "rows_written": int(summary["rows"].sum()),
        "skipped": int(summary["skipped"].sum()),
        "out_dir": out_dir,
    }
