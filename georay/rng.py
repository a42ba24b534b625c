"""Deterministic splitmix64 streams, bit-identical in numpy and DuckDB SQL.

Every synthetic value in this repo (phash, pixels, captions, polygon
vertices) derives from counter-mode splitmix64 so that generation is
order- and partition-independent (a row's content depends only on its
index, never on how many rows a worker generated before it).

The same mix is the engine's deterministic ``phash -> (lon, lat)``
geolocation mapping (BASELINE.json input_hint), and ``sql_*`` emitters
produce DuckDB SQL that reproduces it BIT-IDENTICALLY (verified in
tests/test_rng.py) so the driver's DuckDB oracle can recompute
geolocation from the stored phash with zero tolerance.
"""

from __future__ import annotations

import numpy as np

GOLDEN = 0x9E3779B97F4A7C15
MIX1 = 0xBF58476D1CE4E5B9
MIX2 = 0x94D049BB133111EB
P64 = 1 << 64
P32 = 1 << 32

_ERR = np.geterr()


def splitmix64(u: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping arithmetic)."""
    u = np.asarray(u, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        z = u + np.uint64(GOLDEN)
        z ^= z >> np.uint64(30)
        z *= np.uint64(MIX1)
        z ^= z >> np.uint64(27)
        z *= np.uint64(MIX2)
        z ^= z >> np.uint64(31)
        return z
    finally:
        np.seterr(**old)


def stream(tag: int, idx: np.ndarray) -> np.ndarray:
    """Independent deterministic stream: mix a tag constant with indices."""
    old = np.seterr(over="ignore")
    try:
        base = splitmix64(np.uint64(tag & (P64 - 1)))
        return splitmix64(np.asarray(idx, dtype=np.uint64) + base)
    finally:
        np.seterr(**old)


def uniform01(u: np.ndarray) -> np.ndarray:
    """uint64 -> float64 in [0, 1) using the exact /2^64 construction.

    Division by a power of two is exact in IEEE754, so downstream
    affine transforms stay bit-identical across engines.
    """
    return np.asarray(u, dtype=np.uint64).astype(np.float64) / float(P64)


def lonlat_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The engine's deterministic geolocation mapping.

    phash (int64 bit pattern) -> splitmix64 -> low 32 bits drive lon in
    [-180, 180), high 32 bits drive lat in [-85, 85).  All arithmetic is
    IEEE-exact until the final subtraction, so numpy and DuckDB agree
    bit-for-bit (tests/test_rng.py).
    """
    u = np.asarray(phash).view(np.uint64) if np.asarray(phash).dtype == np.int64 else np.asarray(phash, dtype=np.uint64)
    z = splitmix64(u)
    lo = (z & np.uint64(0xFFFFFFFF)).astype(np.float64)
    hi = (z >> np.uint64(32)).astype(np.float64)
    lon = (lo * 360.0) / 4294967296.0 - 180.0
    lat = (hi * 170.0) / 4294967296.0 - 85.0
    return lon, lat


# ---------------------------------------------------------------------------
# DuckDB SQL emitters (HUGEINT arithmetic; 64x64-bit multiply decomposed into
# 32-bit halves so products stay inside int128).
# ---------------------------------------------------------------------------

def _sql_mulmod64(a: str, b: int) -> str:
    return (
        f"((({a})%4294967296)*{b} + "
        f"((({a})//4294967296)*{b} % 4294967296)*4294967296) "
        f"% 18446744073709551616"
    )


def sql_u64(expr: str) -> str:
    """Reinterpret a signed BIGINT column as its uint64 bit pattern (HUGEINT)."""
    return (
        f"(CASE WHEN ({expr}) < 0 THEN ({expr})::HUGEINT + 18446744073709551616::HUGEINT "
        f"ELSE ({expr})::HUGEINT END)"
    )


def sql_splitmix64(u: str) -> str:
    """DuckDB SQL reproducing splitmix64(u) for a HUGEINT expr in [0, 2^64)."""
    z0 = f"((({u}) + {GOLDEN}) % 18446744073709551616)"
    z1 = f"xor(({z0})::HUGEINT, (({z0})//1073741824)::HUGEINT)"   # ^ (z >> 30)
    z2 = f"({_sql_mulmod64(z1, MIX1)})"
    z3 = f"xor(({z2})::HUGEINT, (({z2})//134217728)::HUGEINT)"    # ^ (z >> 27)
    z4 = f"({_sql_mulmod64(z3, MIX2)})"
    z5 = f"xor(({z4})::HUGEINT, (({z4})//2147483648)::HUGEINT)"   # ^ (z >> 31)
    return f"({z5})"


def sql_lonlat_cte(images_rel: str) -> str:
    """A CTE body computing (image_id, phash, lon, lat) from an images relation.

    Usage: f"WITH pts AS ({sql_lonlat_cte('images')}) SELECT ... FROM pts".
    """
    z = sql_splitmix64(sql_u64("phash"))
    return (
        f"SELECT *, "
        f"((({z}) % 4294967296)::DOUBLE * 360.0) / 4294967296.0 - 180.0 AS lon, "
        f"((({z}) // 4294967296)::DOUBLE * 170.0) / 4294967296.0 - 85.0 AS lat "
        f"FROM {images_rel}"
    )
