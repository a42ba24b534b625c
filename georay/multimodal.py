"""Multimodal (image/audio/video) stages over binary columns.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt) —
the input_hint shape.  Stages are actor-pool ``map_batches`` classes:
decoder state (codec dispatch tables; in a real deployment: GPU
handles, model weights) initializes once per actor, work happens per
batch, and fat ``bytes`` columns force small ``batch_size`` (the block
holds rows x ~KB payloads; see run_flagship's 8192-row batches).

Codec reality in this container (no PIL/cv2/ffmpeg): PNG, baseline
JPEG (r4), RIFF/WAVE PCM16 audio (r4c, georay.audiocodec) and
MJPEG-in-AVI video (r5, georay.videocodec) are all real
spec-conformant implementations — FrameSample demuxes AVI and decodes
real JPEG frames natively; only non-MJPEG containers still need an
external library and raise with the actor signature kept real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .imagecodec import decode_image


class DecodeStats:
    """Actor stage: decode -> per-image channel means + aHash.

    Output columns: image_id, mean_r/g/b (float64, rounded 4dp),
    ahash (int64) — an 8x8 mean-threshold perceptual hash computed on
    the decoded pixels (deterministic)."""

    def __init__(self):
        self.decode = decode_image  # codec dispatch resolved once per actor

    @staticmethod
    def _ahash(px: np.ndarray) -> int:
        """8x8 mean-threshold aHash, INTEGER-exact (r3): bit(i,j) =
        cell_mean > overall_mean evaluated as the cross-multiplied
        integer comparison cell_sum * n_total > total_sum * n_cell —
        no float summation order anywhere, so the SQL oracle computes
        the identical bit pattern (floats would tie-break by ulp noise
        on the dyadic-rational cell means these synthetic images
        produce)."""
        gray = px.astype(np.int64).sum(axis=2)  # 3x the gray value: scale-free
        h, w = gray.shape
        # one bincount over the flattened cell ids replaces the 8x8
        # Python slice loop (r5b); float64 weights exact (< 765*h*w << 2^53)
        cy = (np.arange(h, dtype=np.int64) * 8) // h
        cx = (np.arange(w, dtype=np.int64) * 8) // w
        cell = (cy[:, None] * 8 + cx[None, :]).ravel()
        s = np.bincount(cell, weights=gray.ravel(), minlength=64).astype(np.int64)
        n_cell = np.bincount(cell, minlength=64).astype(np.int64)
        total = int(gray.sum())
        n_total = h * w
        bits = s * n_total > total * n_cell
        out = np.uint64(0)
        for k in np.nonzero(bits)[0]:
            out |= np.uint64(1) << np.uint64(k)
        return int(out.astype(np.int64).view(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        means = np.empty((len(data), 3))
        hashes = np.empty(len(data), dtype=np.int64)
        for i, (blob, fmt) in enumerate(zip(data, fmts)):
            px = self.decode(blob, fmt)
            means[i] = px.reshape(-1, 3).mean(axis=0)
            hashes[i] = self._ahash(px)
        # half-away-from-zero 4dp rounding (not banker's): channel means
        # are dyadic rationals that land EXACTLY on .00005 midpoints, and
        # SQL round() is half-away — banker's np.round would flip them
        means = np.floor(means * 1e4 + 0.5) / 1e4
        return pa.table(
            {
                "image_id": ids,
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "ahash": pa.array(hashes),
            }
        )


class Resize:
    """Actor stage: integer-factor box-mean downsample of decoded pixels,
    re-encoded as PNG.  Output: image_id, bytes (PNG), w, h."""

    def __init__(self, factor: int = 2):
        from .imagecodec import encode_png

        self.factor = factor
        self.encode = encode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        ids = batch.column("image_id")
        out_bytes, ws, hs = [], [], []
        for blob, fmt in zip(batch.column("bytes").to_pylist(), batch.column("fmt").to_pylist()):
            px = decode_image(blob, fmt)
            h, w, _ = px.shape
            hh, ww = (h // f) * f, (w // f) * f
            small = (
                px[:hh, :ww]
                .reshape(hh // f, f, ww // f, f, 3)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
            out_bytes.append(self.encode(small))
            hs.append(small.shape[0])
            ws.append(small.shape[1])
        return pa.table(
            {
                "image_id": ids,
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
            }
        )


class FrameSample:
    """Actor stage: video -> one row per sampled frame (REAL, r5).

    MJPEG-in-AVI clips demux with the repo's RIFF walker and each
    sampled frame re-encodes LOSSLESSLY as PNG (videocodec.py,
    imagecodec.py — no external ffmpeg/PyAV needed), so the exploded
    frames compose directly with the image stages: the output
    (image_id='<video_id>#<frame_idx>', frame stats via DecodeStats,
    dHash, tiling) all work unchanged downstream.  Containers other
    than AVI/MJPEG still need an external demuxer and raise with a
    clear message.

    Scale: pure per-row explode, no shuffle — clips stream through an
    actor pool in small batches (fat binary rows) and only sampled
    frames leave the stage."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n
        from .videocodec import decode_avi

        self.demux = decode_avi

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import decode_jpeg, encode_png

        ids, fidx, blobs, ws, hs = [], [], [], [], []
        for vid, blob, fmt in zip(
            batch.column("video_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
        ):
            if fmt not in ("avi", "video/avi", "video/x-msvideo"):
                raise NotImplementedError(
                    f"container {fmt!r} needs an external demuxer (ffmpeg/PyAV); "
                    "only MJPEG-in-AVI decodes natively"
                )
            w, h, _fps, frames = self.demux(blob)
            for f in range(0, len(frames), self.every_n):
                px = decode_jpeg(frames[f])
                ids.append(f"{vid}#{f:04d}")
                fidx.append(f)
                blobs.append(encode_png(px))
                ws.append(px.shape[1])
                hs.append(px.shape[0])
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array(["png"] * len(ids), pa.string()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
            }
        )


def frame_sample(videos, every_n: int = 3, concurrency=(1, 8), batch_size: int = 64):
    """videos: Dataset with (video_id, bytes, fmt) -> one row per
    sampled frame, PNG-encoded, image-stage-compatible schema."""
    return videos.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,  # whole clips per row -> small batches
        concurrency=concurrency,
    )


def decode_stats(images, concurrency=(1, 8), batch_size: int = 256):
    """images: Dataset with (image_id, bytes, fmt) -> decoded stats."""
    return images.map_batches(
        DecodeStats,
        batch_format="pyarrow",
        batch_size=batch_size,  # fat binary rows -> small batches
        concurrency=concurrency,
    )


def resize(images, factor: int = 2, concurrency=(1, 8), batch_size: int = 256):
    return images.map_batches(
        Resize,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class DHash:
    """Actor stage: decode -> 8x9-grid difference hash (dHash).

    The classic perceptual dHash resizes to 9x8 and sets bit (i, j)
    iff cell (i, j+1) is brighter than cell (i, j).  Here the "resize"
    is the exact index-map partition cell of pixel (y, x) =
    ((y*8)//h, (x*9)//w) and the brightness comparison is the
    INTEGER cross-multiplication s2 * n1 > s1 * n2 (cell pixel counts
    differ when 9 does not divide w) — no float summation anywhere, so
    the SQL oracle (sqlgen.q_image_dhash) recomputes the identical bit
    pattern from its regenerated decoded pixels."""

    def __init__(self):
        self.decode = decode_image

    @staticmethod
    def _dhash(px: np.ndarray) -> int:
        gray = px.astype(np.int64).sum(axis=2)  # 3x gray: scale-free
        h, w = gray.shape
        # cell of pixel (y, x) = ((y*8)//h, (x*9)//w) — the exact index
        # map the SQL rollup uses; one bincount over the flattened cell
        # ids replaces the 8x9 Python slice loop (r5b).  float64
        # bincount weights are exact here: a cell sum is < 765 * h * w
        # << 2^53
        cy = (np.arange(h, dtype=np.int64) * 8) // h
        cx = (np.arange(w, dtype=np.int64) * 9) // w
        cell = (cy[:, None] * 9 + cx[None, :]).ravel()
        s = np.bincount(cell, weights=gray.ravel(), minlength=72).astype(np.int64).reshape(8, 9)
        n = np.bincount(cell, minlength=72).astype(np.int64).reshape(8, 9)
        bits = s[:, 1:] * n[:, :-1] > s[:, :-1] * n[:, 1:]
        out = np.uint64(0)
        for i in range(8):
            for j in range(8):
                if bits[i, j]:
                    out |= np.uint64(1) << np.uint64(i * 8 + j)
        return int(out.astype(np.int64).view(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        hashes = np.empty(len(ids), dtype=np.int64)
        for i, (blob, fmt) in enumerate(
            zip(batch.column("bytes").to_pylist(), batch.column("fmt").to_pylist())
        ):
            hashes[i] = self._dhash(self.decode(blob, fmt))
        return pa.table({"image_id": ids, "dhash": pa.array(hashes)})


def dhash(images, concurrency=(1, 8), batch_size: int = 256):
    """images: Dataset with (image_id, bytes, fmt) -> (image_id, dhash)."""
    return images.map_batches(
        DHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class DHashVariants:
    """Actor stage: decode ONCE, emit the dHash of the original AND of
    a brightness-shifted copy (every channel byte +``delta``, clipped
    at 255 — the classic perceptual-hash robustness perturbation:
    adding a constant preserves adjacent-cell brightness comparisons
    except where the clip bites, so the two hashes land within a small
    Hamming distance).  Output rows (key = 2*image_index + variant,
    dhash) feed dedup.hamming_neardup_pairs; the SQL oracle
    (sqlgen.q_image_neardup) regenerates BOTH hashes from the decoded
    byte stream with the identical integer arithmetic."""

    def __init__(self, delta: int = 8):
        self.decode = decode_image
        self.delta = int(delta)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        keys = np.empty(2 * len(ids), np.int64)
        hashes = np.empty(2 * len(ids), np.int64)
        for i, (img_id, blob, fmt) in enumerate(
            zip(ids, batch.column("bytes").to_pylist(), batch.column("fmt").to_pylist())
        ):
            px = self.decode(blob, fmt).astype(np.int64)
            idx = int(img_id[4:])
            keys[2 * i] = 2 * idx
            keys[2 * i + 1] = 2 * idx + 1
            hashes[2 * i] = DHash._dhash(px)
            hashes[2 * i + 1] = DHash._dhash(np.minimum(px + self.delta, 255))
        return pa.table({"key": pa.array(keys), "hash": pa.array(hashes)})


class AudioFeatures:
    """Actor stage: WAV decode -> per-window integer features.

    One output row per FULL window of ``window`` samples: sum of
    squares (energy, int64 — exact), zero-crossing count (sign flips
    between consecutive samples within the window) and peak |sample|.
    All features are integer arithmetic over the int16 PCM stream, so
    the SQL oracle (sqlgen.q_audio_features) recomputes them exactly
    from the regenerated samples."""

    def __init__(self, window: int = 512):
        from .audiocodec import decode_wav

        self.window = window
        self.decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        W = self.window
        ids, wins, sums, zcs, peaks = [], [], [], [], []
        for aid, blob in zip(
            batch.column("audio_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            _, s = self.decode(blob)
            n_win = len(s) // W
            if n_win == 0:
                continue
            x = s[: n_win * W].astype(np.int64).reshape(n_win, W)
            sums.append((x * x).sum(axis=1))
            neg = x < 0
            zcs.append((neg[:, 1:] != neg[:, :-1]).sum(axis=1).astype(np.int64))
            peaks.append(np.abs(x).max(axis=1))
            ids.extend([aid] * n_win)
            wins.append(np.arange(n_win, dtype=np.int64))
        if not ids:
            return pa.table({
                "audio_id": pa.array([], pa.string()),
                "win": pa.array([], pa.int64()),
                "sum_sq": pa.array([], pa.int64()),
                "n_zc": pa.array([], pa.int64()),
                "peak": pa.array([], pa.int64()),
            })
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "win": pa.array(np.concatenate(wins)),
            "sum_sq": pa.array(np.concatenate(sums)),
            "n_zc": pa.array(np.concatenate(zcs)),
            "peak": pa.array(np.concatenate(peaks)),
        })


def audio_features(audio, window: int = 512, concurrency=(1, 8), batch_size: int = 256):
    """audio: Dataset with (audio_id, bytes) -> per-window features."""
    return audio.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"window": window},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


SILENCE_THRESHOLD = 1_500_000_000  # sum_sq per 512-window; carrier >= ~3.4e9, noise-only <= ~0.7e9


class SilenceSegments:
    """Actor stage: WAV decode -> VAD-style silence segmentation.

    One output row per maximal run of consecutive low-energy windows
    (sum of squares < threshold): (audio_id, seg_idx, start_win,
    n_win).  Clips never split across batches, so the islands pass is
    zero-shuffle; energies are exact integers, so the SQL oracle
    (sqlgen.q_audio_silence) reproduces the segmentation bit-for-bit
    via gaps-and-islands over the regenerated samples."""

    def __init__(self, window: int = 512, threshold: int = SILENCE_THRESHOLD):
        from .audiocodec import decode_wav

        self.window = window
        self.threshold = threshold
        self.decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        W, T = self.window, self.threshold
        ids, segs, starts, lens = [], [], [], []
        for aid, blob in zip(
            batch.column("audio_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            _, s = self.decode(blob)
            n_win = len(s) // W
            if n_win == 0:
                continue
            x = s[: n_win * W].astype(np.int64).reshape(n_win, W)
            silent = (x * x).sum(axis=1) < T
            edges = np.diff(np.r_[0, silent.astype(np.int8), 0])
            st = np.nonzero(edges == 1)[0]
            en = np.nonzero(edges == -1)[0]
            for k, (a, b) in enumerate(zip(st, en)):
                ids.append(aid)
                segs.append(k)
                starts.append(int(a))
                lens.append(int(b - a))
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "seg_idx": pa.array(segs, pa.int64()),
            "start_win": pa.array(starts, pa.int64()),
            "n_win": pa.array(lens, pa.int64()),
        })


def silence_segments(audio, window: int = 512, threshold: int = SILENCE_THRESHOLD,
                     concurrency=(1, 8), batch_size: int = 256):
    return audio.map_batches(
        SilenceSegments,
        fn_constructor_kwargs={"window": window, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class TileCrop:
    """Actor stage: decode -> 2x2 quadrant crop -> PNG re-encode ->
    re-decode -> per-tile channel means.

    The raster-tiling stage of the pipeline: each image becomes four
    tiles (dims are even by construction), every tile round-trips
    through the real PNG codec, and the emitted means are computed
    from the RE-DECODED tile bytes — so the query verifies the whole
    crop -> encode -> decode chain, not just the arithmetic.  Output:
    (image_id, tile_idx row-major, tw, th, mean_r/g/b half-away 4dp,
    the image_stats rounding discipline)."""

    def __init__(self):
        from .imagecodec import decode_png, encode_png

        self.decode = decode_image
        self.encode_png = encode_png
        self.decode_png = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, tidx, tws, ths = [], [], [], []
        sums = []
        for iid, blob, fmt in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
        ):
            px = self.decode(blob, fmt)
            h, w, _ = px.shape
            hh, ww = h // 2, w // 2
            for i in range(2):
                for j in range(2):
                    tile = px[i * hh : (i + 1) * hh, j * ww : (j + 1) * ww]
                    rt = self.decode_png(self.encode_png(tile))
                    ids.append(iid)
                    tidx.append(i * 2 + j)
                    ths.append(rt.shape[0])
                    tws.append(rt.shape[1])
                    sums.append(rt.reshape(-1, 3).astype(np.int64).sum(axis=0))
        s = np.asarray(sums, np.int64).reshape(-1, 3)
        n = (np.asarray(tws, np.int64) * np.asarray(ths, np.int64))[:, None]
        means = np.floor(s / n * 1e4 + 0.5) / 1e4  # half-away 4dp
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "tile_idx": pa.array(tidx, pa.int64()),
            "tw": pa.array(tws, pa.int64()),
            "th": pa.array(ths, pa.int64()),
            "mean_r": pa.array(means[:, 0]),
            "mean_g": pa.array(means[:, 1]),
            "mean_b": pa.array(means[:, 2]),
        })


def tile_crop(images, concurrency=(1, 8), batch_size: int = 256):
    return images.map_batches(
        TileCrop, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
