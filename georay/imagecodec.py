"""Minimal self-contained image codecs for the synthetic image table.

The sandbox has no PIL/cv2, so the engine carries:

* a real, spec-conformant encoder/decoder for 8-bit RGB non-interlaced
  PNG (filter type 0 only) built on zlib — rows with ``fmt='png'`` are
  genuine PNG files any external tool could open;
* a REAL baseline JFIF JPEG encoder/decoder (r4, ``encode_jpeg`` /
  ``decode_jpeg`` below): 8x8 DCT, Annex-K standard quantization +
  Huffman tables, 4:4:4 sampling, quality 98 (PSNR >= 40 dB even on
  the white-noise synthetic corpus, JPEG's worst case) — rows with
  ``fmt='jpeg'`` are genuine JPEG files any external decoder opens;
* a legacy deterministic "GRJF" tagged-zlib container kept only for
  decoding rounds-1-3 fixtures (``decode_fake_jpeg``); datagen no
  longer emits it.

See BASELINE.md per-row invariant (decoded-pixel PSNR >= 40 dB +
byte-exact captions).
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


# ---------------------------------------------------------------------------
# Baseline JFIF JPEG (r4, VERDICT r3 #5): real DCT + Huffman entropy
# coding, pure numpy + Python bit I/O.  4:4:4 (no chroma subsampling),
# 8-bit, single scan.  Default quality 98: the SYNTHETIC corpus is
# white noise — JPEG's worst case — and Q98 holds the BASELINE.md
# PSNR >= 40 dB per-row invariant with margin (measured worst 43.5 dB
# on noise; natural images pass at far lower quality).  The decoder
# reads DQT/DHT from the stream, so encode/decode are self-consistent
# regardless of the table constants.  Exact integer/rounding semantics
# (round-half-away quantization, one final round+clamp in RGB) are
# mirrored by the image_stats SQL oracle, which recomputes the decoded
# pixels through the same DCT pipeline.
# ---------------------------------------------------------------------------

JPEG_QUALITY = 98

_QY_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int64).reshape(8, 8)
_QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int64).reshape(8, 8)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# ITU T.81 Annex K.3 typical Huffman tables (public standard)
_DC_Y = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_Y = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct8() -> np.ndarray:
    d = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            d[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d


_D8 = _dct8()


def jpeg_quant_tables(quality: int = JPEG_QUALITY) -> tuple[np.ndarray, np.ndarray]:
    s = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    qy = np.clip(np.floor((_QY_BASE * s + 50.0) / 100.0), 1, 255).astype(np.int64)
    qc = np.clip(np.floor((_QC_BASE * s + 50.0) / 100.0), 1, 255).astype(np.int64)
    return qy, qc


def _rha(x: np.ndarray) -> np.ndarray:
    """round half away from zero (the codec's quantization rounding)."""
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0,
    ], -1)


def ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb,
    ], -1)


def jpeg_quantized_blocks(px: np.ndarray, quality: int = JPEG_QUALITY) -> np.ndarray:
    """(n_mcu*3, 64) int32 quantized coefficients in zigzag order, MCU
    raster order with Y,Cb,Cr interleaved — the exact lossy content of
    the stream (shared by the encoder and the conformance tests)."""
    h, w, _ = px.shape
    qy, qc = jpeg_quant_tables(quality)
    ycc = rgb_to_ycc(px.astype(np.float64)) - 128.0
    bh, bw = h // 8, w // 8
    out = np.empty((bh * bw, 3, 64), np.int32)
    for c in range(3):
        q = qy if c == 0 else qc
        blocks = ycc[..., c].reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        S = np.einsum("ux,ijxy,vy->ijuv", _D8, blocks, _D8)
        qv = _rha(S / q).astype(np.int32)
        out[:, c, :] = qv.reshape(bh * bw, 64)[:, _ZZ]
    return out.reshape(bh * bw * 3, 64)


def _canonical_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dht_payload(tc: int, th: int, table: tuple) -> bytes:
    bits, vals = table
    return bytes([tc << 4 | th] + bits + vals)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            byte = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n = 0
            self.acc = 0


def encode_jpeg(px: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    """Encode (h, w, 3) uint8 RGB (h, w multiples of 8) as a baseline
    JFIF JPEG, 4:4:4, single interleaved scan."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8 and h % 8 == 0 and w % 8 == 0
    qy, qc = jpeg_quant_tables(quality)
    qv = jpeg_quantized_blocks(px, quality)  # (n_blocks, 64) interleaved
    dc_y = _canonical_codes(*_DC_Y)
    dc_c = _canonical_codes(*_DC_C)
    ac_y = _canonical_codes(*_AC_Y)
    ac_c = _canonical_codes(*_AC_C)
    bw_ = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = qv.shape[0]
    for bi in range(n_blocks):
        comp = bi % 3
        dct, act = (dc_y, ac_y) if comp == 0 else (dc_c, ac_c)
        blk = qv[bi]
        # DC
        diff = int(blk[0]) - pred[comp]
        pred[comp] = int(blk[0])
        mag = abs(diff)
        s = mag.bit_length()
        code, ln = dct[s]
        bw_.put(code, ln)
        if s:
            bw_.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        # AC
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = -1
        for p in nz:
            run = int(p) - last - 1
            last = int(p)
            while run >= 16:
                code, ln = act[0xF0]  # ZRL
                bw_.put(code, ln)
                run -= 16
            v = int(blk[1 + p])
            s = abs(v).bit_length()
            code, ln = act[run << 4 | s]
            bw_.put(code, ln)
            bw_.put(v if v > 0 else v + (1 << s) - 1, s)
        if last < 62:
            code, ln = act[0x00]  # EOB
            bw_.put(code, ln)
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz = _ZZ
    dqt = seg(0xDB, bytes([0]) + bytes(qy.reshape(64)[zz].tolist())) + seg(
        0xDB, bytes([1]) + bytes(qc.reshape(64)[zz].tolist())
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = (seg(0xC4, _dht_payload(0, 0, _DC_Y)) + seg(0xC4, _dht_payload(1, 0, _AC_Y))
           + seg(0xC4, _dht_payload(0, 1, _DC_C)) + seg(0xC4, _dht_payload(1, 1, _AC_C)))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt + sof + dht + sos + bytes(bw_.buf) + b"\xff\xd9")


_PEEK_CACHE: dict = {}


def _peek_table(bits: tuple, vals: tuple) -> tuple[np.ndarray, np.ndarray]:
    """16-bit peek decode table: index by the next 16 bits -> (symbol,
    code length)."""
    key = (bits, vals)
    hit = _PEEK_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, np.int16)
    ln = np.zeros(1 << 16, np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    _PEEK_CACHE[key] = (sym, ln)
    return sym, ln


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline 4:4:4 8-bit JPEGs as produced by encode_jpeg."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, tuple] = {}
    w = h = 0
    comp_q: list[int] = []
    scan_tables: list[tuple] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            off = 0
            while off < len(payload):
                tid = payload[off] & 0x0F
                if payload[off] >> 4:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, np.int64)
                tab[_ZZ] = np.frombuffer(payload[off + 1 : off + 65], np.uint8)
                qt[tid] = tab.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            _, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if nc != 3:
                raise NotImplementedError("3-component baseline only")
            comp_q = []
            for ci in range(3):
                cid, samp, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("4:4:4 only")
                comp_q.append(qid)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("baseline (SOF0) only")
        elif marker == 0xC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0x0F
                bits = tuple(payload[off + 1 : off + 17])
                n = sum(bits)
                vals = tuple(payload[off + 17 : off + 17 + n])
                huff[(tc, th)] = (bits, vals)
                off += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            scan_tables = []
            for ci in range(ns):
                td = payload[2 + 2 * ci]
                scan_tables.append((td >> 4, td & 0x0F))
            break
    # entropy-coded data runs from pos to the EOI marker
    end = data.rfind(b"\xff\xd9")
    raw = np.frombuffer(data[pos:end], np.uint8)
    # de-stuff 0xFF00 -> 0xFF
    keep = np.ones(len(raw), bool)
    ffs = np.nonzero(raw[:-1] == 0xFF)[0]
    keep[ffs[raw[ffs + 1] == 0x00] + 1] = False
    stream = np.concatenate([raw[keep], np.zeros(4, np.uint8)])
    sbytes = stream  # local alias
    peek = [
        (_peek_table(*huff[(0, scan_tables[c][0])]), _peek_table(*huff[(1, scan_tables[c][1])]))
        for c in range(3)
    ]
    bh, bw_n = h // 8, w // 8
    n_mcu = bh * bw_n
    qv = np.zeros((n_mcu * 3, 64), np.int32)
    bitpos = 0
    pred = [0, 0, 0]

    def peek16(p: int) -> int:
        byi = p >> 3
        sh = p & 7
        return ((int(sbytes[byi]) << 16 | int(sbytes[byi + 1]) << 8 | int(sbytes[byi + 2]))
                >> (8 - sh)) & 0xFFFF

    def read_bits(p: int, n: int) -> tuple[int, int]:
        v = 0
        byi = p >> 3
        window = (int(sbytes[byi]) << 24 | int(sbytes[byi + 1]) << 16
                  | int(sbytes[byi + 2]) << 8 | int(sbytes[byi + 3]))
        v = (window >> (32 - (p & 7) - n)) & ((1 << n) - 1)
        return v, p + n

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    for m in range(n_mcu):
        for c in range(3):
            (dsym, dln), (asym, aln) = peek[c]
            blk = qv[m * 3 + c]
            pk = peek16(bitpos)
            s = int(dsym[pk])
            bitpos += int(dln[pk])
            if s:
                v, bitpos = read_bits(bitpos, s)
                pred[c] += extend(v, s)
            blk[0] = pred[c]
            k = 1
            while k < 64:
                pk = peek16(bitpos)
                rs = int(asym[pk])
                bitpos += int(aln[pk])
                if rs == 0x00:  # EOB
                    break
                run, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break
                k += run
                v, bitpos = read_bits(bitpos, s)
                blk[k] = extend(v, s)
                k += 1
    # dequantize + inverse zigzag + batched IDCT
    px = np.empty((h, w, 3), np.float64)
    izz = np.empty(64, np.int64)
    izz[_ZZ] = np.arange(64)
    for c in range(3):
        q = qt[comp_q[c]]
        coefs = qv[c::3][:, izz].reshape(n_mcu, 8, 8).astype(np.float64) * q[None, :, :]
        blocks = np.einsum("ux,iuv,vy->ixy", _D8, coefs, _D8)
        px[..., c] = (
            blocks.reshape(bh, bw_n, 8, 8).transpose(0, 2, 1, 3).reshape(h, w) + 128.0
        )
    rgb = ycc_to_rgb(px)
    return np.clip(_rha(rgb), 0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch decode by the table's ``fmt`` column."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == FAKE_JPEG_MAGIC:
            return decode_fake_jpeg(data)  # pre-r4 caches
        if data[:2] == b"\xff\xd8":
            return decode_jpeg(data)
        raise NotImplementedError(
            "unrecognized jpeg container (progressive/arithmetic JPEG not "
            "supported; baseline JFIF and the legacy GRJF container are)"
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
