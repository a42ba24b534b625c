"""Minimal self-contained image codecs for the synthetic image table.

The sandbox has no PIL/cv2, so the engine carries:

* a real, spec-conformant encoder/decoder for 8-bit RGB non-interlaced
  PNG (filter type 0 only) built on zlib — rows with ``fmt='png'`` are
  genuine PNG files any external tool could open;
* a deterministic "lossy" codec (``fmt='jpeg'`` rows) standing in for
  JPEG: pixels quantized to 4-level steps (PSNR vs the original
  ~46 dB >= the 40 dB invariant), zlib-compressed in a tagged
  container.  Real JPEG entropy coding is out of scope in this
  container; the Ray-side plumbing (binary column, batch sizing, decode
  actors, PSNR checks) is real and tested.  See BASELINE.md per-row
  invariant.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_JPEG_MAGIC = b"GRJF"  # "graft jpeg fake" container tag


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter 0, no interlace)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    # prepend the per-scanline filter byte (0 = None)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 1))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (filter 0, 8-bit RGB)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or color != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in for JPEG: quantize to step-4 midpoints."""
    h, w, c = pixels.shape
    q = (pixels & 0xFC) | 0x02  # error in {-2,-1,0,+1} -> PSNR ~46 dB
    return (
        FAKE_JPEG_MAGIC
        + struct.pack(">II", w, h)
        + zlib.compress(q.tobytes(), 1)
    )


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FAKE_JPEG_MAGIC:
        raise ValueError("not a GRJF payload")
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3).copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch decode by the table's ``fmt`` column."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == FAKE_JPEG_MAGIC:
            return decode_fake_jpeg(data)
        raise NotImplementedError(
            "real JPEG entropy decode requires an image library not present "
            "in this container; synthetic rows use the GRJF container"
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
