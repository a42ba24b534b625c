"""Deterministic synthetic input tables (BASELINE.json input_hint shape).

The engine's primary input is an image+caption table

    (image_id: string, bytes: binary, w: int32, h: int32,
     fmt: string, caption: string, phash: int64)

joined against a polygon layer.  The driver's testdata has no such
tables, so we synthesize them deterministically (seeded counter-mode
splitmix64 — every row depends only on its index) at a scale derived
from the sf directory, and cache them as parquet under
``/tmp/georay_data/<sf>/``.  The DuckDB oracle reads the same parquet
via ``read_parquet`` (``georay.sqlgen`` emits the SQL), so both engines
see byte-identical input.

Polygon generator mix mirrors the reference's randomized bench shapes
(`geo-benches/src/utils/random.rs:55-110`): radial "circular" polygons,
rectilinear "steppy" polygons, grid squares, plus circular polygons
with a hole.  A deterministic fraction is clustered in a hot region
(dense-urban skew) to exercise hot-cell salting.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import geom, imagecodec, rng

DATA_ROOT = os.environ.get("GEORAY_DATA_ROOT", "/tmp/georay_data")

# stream tags (arbitrary distinct constants)
TAG_PHASH = 0x1111AA01
TAG_PIXEL = 0x1111AA02
TAG_CAPTION = 0x1111AA03
TAG_POLY = 0x1111AA04

DIMS = np.array([16, 24, 32], dtype=np.int32)  # w/h classes, kept small so sf0.1 generates fast
VOCAB = [
    "amber", "basalt", "cedar", "delta", "ember", "fjord", "granite", "harbor",
    "isle", "juniper", "karst", "lagoon", "mesa", "nimbus", "onyx", "prairie",
]
HOT_CENTER = (10.0, 20.0)  # lon, lat of the dense "urban" region
HOT_HALF = 1.5             # degrees half-width of the hot box


def scale_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.001


def sizes_for(sf: float) -> tuple[int, int]:
    """(n_images, n_polygons) for a scale factor."""
    n_images = max(1000, int(2_000_000 * sf))
    n_polygons = max(64, min(4096, int(10_000 * sf)))
    return n_images, n_polygons


def data_dir(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, os.path.basename(os.path.normpath(sf_dir)))


def images_path(sf_dir: str) -> str:
    # v2: lossy rows are REAL baseline JFIF JPEGs (r4) — new filename so
    # stale GRJF caches regenerate; other derived tables are unchanged
    return os.path.join(data_dir(sf_dir), "images_v2.parquet")


def events_jsonl_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "events.jsonl")


def ensure_events_jsonl(sf_dir: str) -> str:
    """A JSONL projection of the events table (event_type, value) —
    source-format breadth: the engine reads it with ray.data.read_json
    and must agree with the parquet-derived oracle."""
    path = events_jsonl_path(sf_dir)
    if not os.path.exists(path):
        import duckdb

        os.makedirs(data_dir(sf_dir), exist_ok=True)
        con = duckdb.connect()
        con.execute(
            f"COPY (SELECT event_id, event_type, value FROM "
            f"read_parquet('{sf_dir}/events.parquet') ORDER BY event_id) "
            f"TO '{path}.tmp' (FORMAT JSON)"
        )
        os.replace(path + ".tmp", path)
    return path


def audio_path(sf_dir: str) -> str:
    # v2: every 8th 512-sample window is noise-only (carrier gated) so
    # silence/VAD segmentation has real structure; new filename so v1
    # caches regenerate
    return os.path.join(data_dir(sf_dir), "audio_v2.parquet")


def videos_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "videos.parquet")


def polygons_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "polygons.parquet")


def segments_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "segments.parquet")


def lines_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "lines.parquet")


def line_segments_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "line_segments.parquet")


def lsh_planes_path(sf_dir: str) -> str:
    return os.path.join(data_dir(sf_dir), "lsh_planes.parquet")


def lsh_planes_table() -> pa.Table:
    """The embed-LSH hyperplanes as a long (table_idx, bit_idx, dim_idx,
    w) table — written so the DuckDB oracle can recompute the exact
    candidate buckets (dedup.lsh_planes is the single source)."""
    from .dedup import lsh_params_for, lsh_planes
    from .sqlgen import EMB_DIM, EMB_NEARDUP_T

    n_tables, n_bits = lsh_params_for(EMB_NEARDUP_T)
    planes = lsh_planes(n_tables, n_bits, EMB_DIM)
    t, bts, d = np.meshgrid(
        np.arange(n_tables), np.arange(n_bits), np.arange(EMB_DIM), indexing="ij"
    )
    return pa.table({
        "table_idx": pa.array(t.ravel().astype(np.int64)),
        "bit_idx": pa.array(bts.ravel().astype(np.int64)),
        "dim_idx": pa.array(d.ravel().astype(np.int64)),
        "w": pa.array(planes.ravel()),
    })


# ---------------------------------------------------------------------------
# image table
# ---------------------------------------------------------------------------

def _pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for image index i."""
    n_u64 = (w * h * 3 + 7) // 8
    words = rng.stream(TAG_PIXEL, np.uint64(i) * np.uint64(1 << 12) + np.arange(n_u64, dtype=np.uint64))
    raw = words.view(np.uint8)[: w * h * 3]
    return raw.reshape(h, w, 3)


def _caption_for(i: int) -> str:
    bits = int(rng.stream(TAG_CAPTION, np.asarray([i], dtype=np.uint64))[0])
    words = [VOCAB[(bits >> (4 * k)) & 0xF] for k in range(3)]
    return f"caption {i} " + " ".join(words)


def generate_images(n: int) -> pa.Table:
    idx = np.arange(n, dtype=np.uint64)
    phash = rng.stream(TAG_PHASH, idx).view(np.int64)
    w = DIMS[(idx % 3).astype(np.int64)]
    h = DIMS[((idx + 1) % 3).astype(np.int64)]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    image_id = [f"img-{i:012d}" for i in range(n)]
    captions = [_caption_for(i) for i in range(n)]
    blobs = []
    for i in range(n):
        px = _pixels_for(i, int(w[i]), int(h[i]))
        if fmt[i] == "png":
            blobs.append(imagecodec.encode_png(px))
        else:
            blobs.append(imagecodec.encode_jpeg(px))
    return pa.table(
        {
            "image_id": pa.array(image_id, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phash, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# audio table (r4c) — deterministic INTEGER waveforms: a triangle
# carrier (period/amplitude derived from the clip index) plus bounded
# splitmix64 noise, clipped to int16.  Every sample is an integer
# expression of (i, t), so the SQL oracle regenerates the exact PCM
# stream the WAV codec round-trips (sqlgen.q_audio_features).
# ---------------------------------------------------------------------------

AUDIO_SR = 8000
AUDIO_NOISE = 4001   # noise = word % 4001 - 2000 in [-2000, 2000]
AUDIO_GATE = 8       # carrier gated OFF on windows with (t//512) % 8 == 7
AUDIO_WIN = 512


def audio_params(i: int) -> tuple[int, int, int]:
    """(n_samples, period, amplitude) for clip index i."""
    return 4096 + (i % 4) * 2048, 40 + (i % 193), 4000 + (i % 37) * 500


def _samples_for(i: int) -> np.ndarray:
    n, p, amp = audio_params(i)
    t = np.arange(n, dtype=np.int64)
    ph = t % p
    tri = (np.abs(2 * ph - p) * 2 * amp) // p - amp
    tri = np.where((t // AUDIO_WIN) % AUDIO_GATE == AUDIO_GATE - 1, 0, tri)
    words = rng.stream(
        TAG_AUDIO, np.uint64(i) * np.uint64(1 << 20) + t.astype(np.uint64)
    )
    noise = (words % np.uint64(AUDIO_NOISE)).astype(np.int64) - (AUDIO_NOISE - 1) // 2
    return np.clip(tri + noise, -32768, 32767).astype(np.int16)


def generate_audio(n: int) -> pa.Table:
    from . import audiocodec

    blobs, ns = [], np.empty(n, np.int32)
    for i in range(n):
        s = _samples_for(i)
        ns[i] = len(s)
        blobs.append(audiocodec.encode_wav(s, AUDIO_SR))
    return pa.table(
        {
            "audio_id": pa.array([f"aud-{i:08d}" for i in range(n)], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr": pa.array(np.full(n, AUDIO_SR, np.int32)),
            "n_samples": pa.array(ns),
            "fmt": pa.array(["wav"] * n, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# video table (r5) — real MJPEG-in-AVI clips (videocodec.py): every
# frame is a real baseline JPEG of counter-mode splitmix64 pixels, so
# the SQL oracle regenerates any frame's DECODED bytes through the same
# DCT pipeline already used for the image table
# (sqlgen._img_decoded_bytes_ctes / q_video_frames).
# ---------------------------------------------------------------------------

TAG_VFRAME = 0x1111AA08
VID_MAXF = 16      # frame-index stride inside the rng stream
VID_FPS = 10


def video_params(i: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for clip index i — dims stay 8-aligned
    for the JPEG codec and small so the per-frame SQL oracle is cheap."""
    return 16 + 8 * (i % 2), 16, 6 + (i % 3) * 3


def _vframe_pixels(i: int, f: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for frame f of clip i."""
    n_u64 = (w * h * 3 + 7) // 8
    base = (np.uint64(i) * np.uint64(VID_MAXF) + np.uint64(f)) * np.uint64(1 << 12)
    words = rng.stream(TAG_VFRAME, base + np.arange(n_u64, dtype=np.uint64))
    return words.view(np.uint8)[: w * h * 3].reshape(h, w, 3)


def generate_videos(n: int) -> pa.Table:
    from . import videocodec

    ids, blobs = [], []
    ws = np.empty(n, np.int32)
    hs = np.empty(n, np.int32)
    nf = np.empty(n, np.int32)
    for i in range(n):
        w, h, k = video_params(i)
        frames = [
            imagecodec.encode_jpeg(_vframe_pixels(i, f, w, h)) for f in range(k)
        ]
        ids.append(f"vid-{i:08d}")
        blobs.append(videocodec.encode_avi(frames, w, h, fps=VID_FPS))
        ws[i], hs[i], nf[i] = w, h, k
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws),
            "h": pa.array(hs),
            "n_frames": pa.array(nf),
            "fps": pa.array(np.full(n, VID_FPS, np.int32)),
            "fmt": pa.array(["avi"] * n, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# polygon layer
# ---------------------------------------------------------------------------

def _poly_rand(j: int, k: int, n: int = 1) -> np.ndarray:
    """n uniform [0,1) floats for polygon j, sub-stream k."""
    base = np.uint64(j) * np.uint64(1 << 16) + np.uint64(k) * np.uint64(1 << 10)
    return rng.uniform01(rng.stream(TAG_POLY, base + np.arange(n, dtype=np.uint64)))


def _circular_ring(cx: float, cy: float, r0: float, j: int, k: int, nv: int) -> np.ndarray:
    """Radial polygon with jittered radii (random.rs circular_polygon analogue)."""
    ang = np.linspace(0.0, 2 * np.pi, nv, endpoint=False)
    radii = r0 * (0.6 + 0.8 * _poly_rand(j, k, nv))
    xs = cx + radii * np.cos(ang)
    ys = cy + radii * np.sin(ang)
    ring = np.column_stack([xs, ys])
    return geom.close_ring(ring)


def _steppy_ring(cx: float, cy: float, r0: float, j: int, nv: int) -> np.ndarray:
    """Rectilinear zig-zag polygon (random.rs steppy_polygon analogue)."""
    steps = max(3, nv // 4)
    u = _poly_rand(j, 7, 2 * steps)
    xs = np.linspace(cx - r0, cx + r0, steps)
    top = cy + r0 * (0.3 + 0.7 * u[:steps])
    bot = cy - r0 * (0.3 + 0.7 * u[steps:])
    pts = []
    for i in range(steps):  # staircase along the top, right to left along the bottom
        pts.append((xs[i], top[i]))
        if i + 1 < steps:
            pts.append((xs[i + 1], top[i]))
    for i in range(steps - 1, -1, -1):
        pts.append((xs[i], bot[i]))
        if i > 0:
            pts.append((xs[i - 1], bot[i]))
    return geom.close_ring(np.asarray(pts))


def _square_ring(cx: float, cy: float, r0: float) -> np.ndarray:
    return np.asarray(
        [(cx - r0, cy - r0), (cx + r0, cy - r0), (cx + r0, cy + r0), (cx - r0, cy + r0), (cx - r0, cy - r0)]
    )


def generate_polygons(n: int) -> pa.Table:
    ids, polys = [], []
    bbox = np.empty((n, 4), dtype=np.float64)
    for j in range(n):
        u = _poly_rand(j, 0, 4)
        hot = (j % 8) < 2  # 25% of polygons crowd the hot region -> cell skew
        if hot:
            cx = HOT_CENTER[0] + (u[0] - 0.5) * 2 * HOT_HALF
            cy = HOT_CENTER[1] + (u[1] - 0.5) * 2 * HOT_HALF
            r0 = 0.05 + 0.45 * u[2]
        else:
            cx = -170.0 + 340.0 * u[0]
            cy = -80.0 + 160.0 * u[1]
            r0 = 0.3 + 3.0 * u[2]
        nv = 8 + int(u[3] * 24)
        kind = j % 4
        if kind == 0:
            rings = [_circular_ring(cx, cy, r0, j, 1, nv)]
        elif kind == 1:
            rings = [_steppy_ring(cx, cy, r0, j, nv)]
        elif kind == 2:
            rings = [_square_ring(cx, cy, r0)]
        else:  # circular with a hole
            rings = [
                _circular_ring(cx, cy, r0, j, 2, nv),
                _circular_ring(cx, cy, 0.25 * r0, j, 3, max(6, nv // 2))[::-1].copy(),
            ]
        ids.append(f"poly-{j:06d}")
        polys.append(rings)
        allc = np.vstack(rings)
        bbox[j] = (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())
    rings_arr = geom.rings_to_arrow(polys)
    return pa.table(
        {
            "polygon_id": pa.array(ids, pa.string()),
            "rings": rings_arr,
            "minx": pa.array(bbox[:, 0], pa.float64()),
            "miny": pa.array(bbox[:, 1], pa.float64()),
            "maxx": pa.array(bbox[:, 2], pa.float64()),
            "maxy": pa.array(bbox[:, 3], pa.float64()),
        }
    )


TAG_LINE = 0x1111AA05
TAG_AUDIO = 0x1111AA07

PATH_TYPE = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))


def _line_rand(j: int, k: int, n: int = 1) -> np.ndarray:
    base = np.uint64(j) * np.uint64(1 << 16) + np.uint64(k) * np.uint64(1 << 10)
    return rng.uniform01(rng.stream(TAG_LINE, base + np.arange(n, dtype=np.uint64)))


def generate_lines(n: int) -> pa.Table:
    """Deterministic polyline layer (roads/trajectories stand-in): 25%
    crowd the hot region (skew, mirroring the polygon layer), each line
    a 3-9 vertex jittered walk.  Columns: line_id, path
    (list<struct<x,y>>), bbox — the line analogue of POLYGON_SCHEMA."""
    ids = []
    xs_off = [0]
    flat_x, flat_y = [], []
    bbox = np.empty((n, 4), dtype=np.float64)
    for j in range(n):
        u = _line_rand(j, 0, 4)
        hot = (j % 8) < 2
        if hot:
            cx = HOT_CENTER[0] + (u[0] - 0.5) * 2 * HOT_HALF
            cy = HOT_CENTER[1] + (u[1] - 0.5) * 2 * HOT_HALF
            step = 0.05 + 0.4 * u[2]
        else:
            cx = -170.0 + 340.0 * u[0]
            cy = -80.0 + 160.0 * u[1]
            step = 0.2 + 2.0 * u[2]
        nv = 3 + int(u[3] * 7)
        w = _line_rand(j, 1, 2 * nv)
        dx = np.cumsum((w[:nv] - 0.5) * 2 * step)
        dy = np.cumsum((w[nv:] - 0.5) * 2 * step)
        x = np.clip(cx + dx, -179.9, 179.9)
        y = np.clip(cy + dy, -89.9, 89.9)
        ids.append(f"line-{j:06d}")
        flat_x.append(x)
        flat_y.append(y)
        xs_off.append(xs_off[-1] + nv)
        bbox[j] = (x.min(), y.min(), x.max(), y.max())
    coords = pa.StructArray.from_arrays(
        [pa.array(np.concatenate(flat_x), pa.float64()),
         pa.array(np.concatenate(flat_y), pa.float64())],
        names=["x", "y"],
    )
    path = pa.ListArray.from_arrays(pa.array(xs_off, pa.int32()), coords)
    return pa.table(
        {
            "line_id": pa.array(ids, pa.string()),
            "path": path,
            "minx": pa.array(bbox[:, 0], pa.float64()),
            "miny": pa.array(bbox[:, 1], pa.float64()),
            "maxx": pa.array(bbox[:, 2], pa.float64()),
            "maxy": pa.array(bbox[:, 3], pa.float64()),
        }
    )


def line_segments_table(lines: pa.Table) -> pa.Table:
    """Flat (line_id, seg_idx, x1, y1, x2, y2) edge table for the
    DuckDB oracles (the line analogue of segments_table)."""
    from .geom import _ranges

    path = lines.column("path").combine_chunks()
    offs = path.offsets.to_numpy().astype(np.int64)
    flat = path.values
    x = flat.field("x").to_numpy(zero_copy_only=False)
    y = flat.field("y").to_numpy(zero_copy_only=False)
    nseg = np.diff(offs) - 1
    idx = np.repeat(offs[:-1], nseg) + _ranges(nseg)
    line_of = np.repeat(np.arange(len(lines), dtype=np.int64), nseg)
    ids = np.asarray(lines.column("line_id").to_pylist(), dtype=object)
    return pa.table(
        {
            "line_id": pa.array(ids[line_of], pa.string()),
            "seg_idx": pa.array(_ranges(nseg), pa.int32()),
            "x1": pa.array(x[idx], pa.float64()),
            "y1": pa.array(y[idx], pa.float64()),
            "x2": pa.array(x[idx + 1], pa.float64()),
            "y2": pa.array(y[idx + 1], pa.float64()),
        }
    )


def segments_table(layer: geom.PolygonLayer) -> pa.Table:
    """Flat (polygon_id, ring_idx, x1, y1, x2, y2) edge table — this is the
    representation the DuckDB oracle uses for pure-SQL point-in-polygon
    (crossing-number over edges) and shoelace area/centroid."""
    x1, y1, x2, y2, seg_ring = layer.segments()
    poly_of_seg = layer.ring_poly[seg_ring]
    ring_local = np.zeros(layer.num_rings, dtype=np.int64)
    for p in range(layer.num_polys):
        lo, hi = layer.poly_ring_offsets[p], layer.poly_ring_offsets[p + 1]
        ring_local[lo:hi] = np.arange(hi - lo)
    # per-ring segment ordinal (order-dependent SQL oracles need it)
    from .geom import _ranges

    seg_counts = np.bincount(seg_ring, minlength=layer.num_rings)
    seg_idx = _ranges(seg_counts)
    return pa.table(
        {
            "polygon_id": pa.array(layer.poly_ids[poly_of_seg], pa.string()),
            "ring_idx": pa.array(ring_local[seg_ring], pa.int32()),
            "seg_idx": pa.array(seg_idx, pa.int32()),
            "x1": pa.array(x1, pa.float64()),
            "y1": pa.array(y1, pa.float64()),
            "x2": pa.array(x2, pa.float64()),
            "y2": pa.array(y2, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# cache management
# ---------------------------------------------------------------------------

def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)  # atomic: concurrent generators converge on identical bytes
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def ensure_tables(sf_dir: str, force: bool = False) -> dict[str, str]:
    """Generate (once) and return paths of the derived tables for sf_dir."""
    sf = scale_of(sf_dir)
    n_images, n_polygons = sizes_for(sf)
    paths = {
        "images": images_path(sf_dir),
        "polygons": polygons_path(sf_dir),
        "segments": segments_path(sf_dir),
        "lines": lines_path(sf_dir),
        "line_segments": line_segments_path(sf_dir),
        "lsh_planes": lsh_planes_path(sf_dir),
        "audio": audio_path(sf_dir),
        "videos": videos_path(sf_dir),
    }
    if force or not os.path.exists(paths["videos"]):
        n_videos = max(24, min(800, int(10_000 * sf)))
        _atomic_write(generate_videos(n_videos), paths["videos"])
    if force or not os.path.exists(paths["lsh_planes"]):
        _atomic_write(lsh_planes_table(), paths["lsh_planes"])
    n_lines = max(96, min(6144, int(15_000 * sf)))
    if force or not os.path.exists(paths["lines"]) or not os.path.exists(paths["line_segments"]):
        lines = generate_lines(n_lines)
        _atomic_write(lines, paths["lines"])
        _atomic_write(line_segments_table(lines), paths["line_segments"])
    if force or not os.path.exists(paths["audio"]):
        n_audio = max(50, min(4000, int(20_000 * sf)))
        _atomic_write(generate_audio(n_audio), paths["audio"])
    if force or not os.path.exists(paths["images"]):
        _atomic_write(generate_images(n_images), paths["images"])
    if force or not os.path.exists(paths["polygons"]):
        poly = generate_polygons(n_polygons)
        _atomic_write(poly, paths["polygons"])
        layer = geom.PolygonLayer.from_arrow(poly)
        _atomic_write(segments_table(layer), paths["segments"])
    elif force or not os.path.exists(paths["segments"]):
        poly = pq.read_table(paths["polygons"])
        layer = geom.PolygonLayer.from_arrow(poly)
        _atomic_write(segments_table(layer), paths["segments"])
    else:
        # schema migration: older caches lack seg_idx
        if "seg_idx" not in pq.read_schema(paths["segments"]).names:
            layer = geom.PolygonLayer.from_arrow(pq.read_table(paths["polygons"]))
            _atomic_write(segments_table(layer), paths["segments"])
    return paths


def ensure_bench_points(n: int, n_shards: int = 64) -> str:
    """Slim (image_id, phash) table for large-scale benchmarking — image
    bytes are irrelevant to the join hot path and are never shuffled
    through it (SURVEY.md §7 hard part (c)).  Written as n_shards files
    so the read fans out (one block per shard minimum) — at 100 TB this
    is the input-shard layout the resume logic keys on."""
    root = os.path.join(DATA_ROOT, f"bench_{n}")
    done = os.path.join(root, "_SUCCESS")
    if not os.path.exists(done):
        per = (n + n_shards - 1) // n_shards
        for s in range(n_shards):
            lo, hi = s * per, min(n, (s + 1) * per)
            if lo >= hi:
                break
            idx = np.arange(lo, hi, dtype=np.uint64)
            phash = rng.stream(TAG_PHASH, idx).view(np.int64)
            table = pa.table(
                {
                    "image_id": pa.array([f"img-{i:012d}" for i in range(lo, hi)], pa.string()),
                    "phash": pa.array(phash, pa.int64()),
                }
            )
            _atomic_write(table, os.path.join(root, f"shard-{s:04d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return root


TAG_DOC = 0x1111AA06

_BENCH_VOCAB = [
    "join", "hash", "row", "batch", "scan", "merge", "sort", "filter",
    "group", "query", "table", "stream", "window", "key", "part",
    "agg", "data", "line", "value", "column", "slow", "fast", "big",
    "small", "dup", "spark", "customer", "order", "index", "bucket",
    "shard", "probe",
]
_BENCH_PHRASE = "the quick brown fox jumps over the lazy dog again and again"


def ensure_bench_docs(n: int, words_per_doc: int = 48, n_shards: int = 32) -> str:
    """Deterministic synthetic document corpus for the dup-n-gram bench:
    word-soup rows from a 32-word vocabulary (splitmix64 streams), with
    a shared phrase planted in every 37th document so cross-document
    duplicate grams exist at a realistic low rate.  Sharded parquet so
    the read fans out, cached like ensure_bench_points."""
    root = os.path.join(DATA_ROOT, f"bench_docs_{n}")
    done = os.path.join(root, "_SUCCESS")
    if not os.path.exists(done):
        vocab = np.array(_BENCH_VOCAB)
        per = (n + n_shards - 1) // n_shards
        for s in range(n_shards):
            lo, hi = s * per, min(n, (s + 1) * per)
            if lo >= hi:
                break
            m = hi - lo
            idx = (
                np.arange(lo, hi, dtype=np.uint64)[:, None] * np.uint64(words_per_doc)
                + np.arange(words_per_doc, dtype=np.uint64)[None, :]
            )
            w = rng.stream(TAG_DOC, idx.ravel()) % np.uint64(len(vocab))
            mat = vocab[w.astype(np.int64)].reshape(m, words_per_doc)
            texts = [" ".join(row) for row in mat]
            ids = np.arange(lo, hi, dtype=np.int64)
            planted = ids % 37 == 0
            for j in np.nonzero(planted)[0]:
                texts[j] = texts[j] + " " + _BENCH_PHRASE
            table = pa.table({
                "doc_id": pa.array(ids),
                "text": pa.array(texts, pa.string()),
            })
            _atomic_write(table, os.path.join(root, f"shard-{s:04d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return root


TAG_BEMBED = 0x1111AA0B


def ensure_bench_embeds(n: int, dim: int = 16, n_shards: int = 32) -> str:
    """Deterministic synthetic embedding table for the blocked exact
    near-dup bench: unit-scale float32 vectors from splitmix64 streams
    (uniform in [-1, 1] per coordinate), with every 41st vector a tiny
    perturbation of its predecessor so true near-dup pairs exist.
    Sharded parquet, cached like ensure_bench_points."""
    root = os.path.join(DATA_ROOT, f"bench_embeds_{n}_{dim}")
    done = os.path.join(root, "_SUCCESS")
    if not os.path.exists(done):
        per = (n + n_shards - 1) // n_shards
        for s in range(n_shards):
            lo, hi = s * per, min(n, (s + 1) * per)
            if lo >= hi:
                break
            m = hi - lo
            idx = (
                np.arange(lo, hi, dtype=np.uint64)[:, None] * np.uint64(dim)
                + np.arange(dim, dtype=np.uint64)[None, :]
            )
            u = rng.uniform01(rng.stream(TAG_BEMBED, idx.ravel())).reshape(m, dim)
            mat = (2.0 * u - 1.0).astype(np.float32)
            ids = np.arange(lo, hi, dtype=np.int64)
            dup = (ids % 41 == 0) & (ids > lo)
            rows = np.nonzero(dup)[0]
            mat[rows] = mat[rows - 1] + (mat[rows] * np.float32(0.01))
            table = pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(list(mat), pa.list_(pa.float32())),
                }
            )
            _atomic_write(table, os.path.join(root, f"shard-{s:04d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return root
