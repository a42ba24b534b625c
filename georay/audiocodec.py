"""RIFF/WAVE PCM16 codec — pure numpy, spec-conformant (r4c).

The multimodal mandate treats audio as an opaque ``binary`` column
with typed metadata; unlike JPEG/video there is no library gap to
stub — canonical WAV (RIFF 'WAVE' container, 'fmt ' chunk with
format code 1 = integer PCM, 'data' chunk of little-endian int16
frames) is simple enough to implement exactly.  Encode emits the
canonical 44-byte-header mono layout; decode walks the chunk list
(tolerating extra chunks like LIST/fact, as the spec requires) and
returns (sample_rate, int16 samples).

Format reference: Microsoft/IBM "Multimedia Programming Interface
and Data Specifications 1.0" (1991); mirrors the layout CPython's
``wave`` module reads/writes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 WAV bytes of an int16 sample vector."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    n_channels, bits = 1, 16
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, bits
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from mono PCM16 WAV bytes.

    Walks the RIFF chunk list, so files with extra chunks (LIST,
    fact, ...) or a non-16-byte fmt chunk still decode."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt_seen, sr = 12, False, 0
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            code, n_ch, sr, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            if code != 1 or n_ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={code} channels={n_ch} bits={bits} "
                    f"(mono integer PCM16 only)"
                )
            fmt_seen = True
        elif cid == b"data":
            if not fmt_seen:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = blob[body : body + size]
            return sr, np.frombuffer(raw, dtype="<i2")
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV stream has no data chunk")
