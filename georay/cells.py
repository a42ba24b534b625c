"""uint64 quad-cell (z-order / Morton) spatial index.

Our own H3/S2-style cell id (no external wheels in the sandbox; a
zero-dep encoding also keeps ids deterministic cross-platform — SURVEY.md
§7 step 5 decision point).  A cell at resolution ``r`` is the pair

    ix = floor((lon + 180) / 360 * 2^r),  iy = floor((lat + 90) / 180 * 2^r)

packed as ``(r << 58) | interleave(ix, iy)`` so ids from different
resolutions never collide.  Properties used by the engine:

* equal-angle grid: cell of a point is pure arithmetic (vectorized, and
  expressible in the DuckDB oracle as two floor() calls on ix/iy);
* hierarchy: parent = child >> 2 (after stripping the resolution tag);
* kNN ring expansion: the ring-R neighborhood is the (2R+1)^2 block of
  (ix, iy) offsets — `ring_cells` below.

Max resolution 29 (2 * 29 + 6 tag bits = 64).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of uint64 to even bit positions."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def cell_xy(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coordinates at resolution res (clipped to the grid)."""
    n = np.int64(1) << np.int64(res)
    ix = np.floor((np.asarray(lon) + 180.0) / 360.0 * float(n)).astype(np.int64)
    iy = np.floor((np.asarray(lat) + 90.0) / 180.0 * float(n)).astype(np.int64)
    np.clip(ix, 0, int(n) - 1, out=ix)
    np.clip(iy, 0, int(n) - 1, out=iy)
    return ix, iy


def encode_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """(ix, iy, res) -> uint64 cell id."""
    m = _part1by1(np.asarray(ix, dtype=np.uint64)) | (
        _part1by1(np.asarray(iy, dtype=np.uint64)) << np.uint64(1)
    )
    return m | (np.uint64(res) << np.uint64(58))


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    ix, iy = cell_xy(lon, lat, res)
    return encode_xy(ix, iy, res)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (ix, iy, res)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    m = cell & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    ix = _compact1by1(m).astype(np.int64)
    iy = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minlon, minlat, maxlon, maxlat) of each cell."""
    ix, iy, res = decode_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w, h = 360.0 / n, 180.0 / n
    minlon = ix * w - 180.0
    minlat = iy * h - 90.0
    return minlon, minlat, minlon + w, minlat + h


def cells_for_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cell ids whose grid square intersects the (lon/lat) bbox."""
    n = 1 << res
    ix0 = max(0, min(n - 1, int(np.floor((minx + 180.0) / 360.0 * n))))
    ix1 = max(0, min(n - 1, int(np.floor((maxx + 180.0) / 360.0 * n))))
    iy0 = max(0, min(n - 1, int(np.floor((miny + 90.0) / 180.0 * n))))
    iy1 = max(0, min(n - 1, int(np.floor((maxy + 90.0) / 180.0 * n))))
    gx, gy = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.uint64),
        np.arange(iy0, iy1 + 1, dtype=np.uint64),
    )
    return encode_xy(gx.ravel(), gy.ravel(), res)


def ring_cells(cell: int, ring: int) -> np.ndarray:
    """Cell ids of the (2*ring+1)^2 block centred on `cell` (clipped).

    The kNN candidate-expansion primitive (SURVEY.md §7 step 6): ring r
    guarantees every point within (r) * cell_size of the centre cell.
    """
    ix, iy, res = decode_xy(np.asarray([cell], dtype=np.uint64))
    ix, iy, res = int(ix[0]), int(iy[0]), int(res[0])
    n = 1 << res
    xs = np.arange(max(0, ix - ring), min(n - 1, ix + ring) + 1, dtype=np.uint64)
    ys = np.arange(max(0, iy - ring), min(n - 1, iy + ring) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return encode_xy(gx.ravel(), gy.ravel(), res)


# ---------------------------------------------------------------------------
# geohash (r4c) — the Niemeyer base32 cell id, closed form: quantize
# lon/lat to 2^k bins, interleave bits (lon first, per the standard),
# emit 5-bit base32 groups.  Identical integer arithmetic in SQL
# (sqlgen.q_geohash_pts), so the strings hash-match exactly.
# ---------------------------------------------------------------------------

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int = 8) -> list[str]:
    """Base32 geohash strings of precision characters (vectorized bit
    interleave; precision * 5 bits total, lon gets ceil(half))."""
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64)
    y = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64)
    x = np.clip(x, 0, (1 << lon_bits) - 1)
    y = np.clip(y, 0, (1 << lat_bits) - 1)
    # interleave: bit j of the code (MSB first) comes from lon when j
    # is even, lat when j is odd
    code = np.zeros(len(x), np.uint64)
    xi = lon_bits
    yi = lat_bits
    for j in range(nbits):
        code <<= np.uint64(1)
        if j % 2 == 0:
            xi -= 1
            code |= ((x >> xi) & 1).astype(np.uint64)
        else:
            yi -= 1
            code |= ((y >> yi) & 1).astype(np.uint64)
    out = []
    for c in code:
        c = int(c)
        out.append("".join(
            GEOHASH_B32[(c >> (5 * (precision - 1 - i))) & 31]
            for i in range(precision)
        ))
    return out


def geohash_decode(codes: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center (lon, lat) of base32 geohash strings (inverse of
    geohash_encode up to the cell quantization)."""
    lons = np.empty(len(codes), np.float64)
    lats = np.empty(len(codes), np.float64)
    for i, gh in enumerate(codes):
        nbits = len(gh) * 5
        lon_bits = (nbits + 1) // 2
        code = 0
        for ch in gh:
            code = (code << 5) | GEOHASH_B32.index(ch)
        x = y = 0
        for j in range(nbits):
            bit = (code >> (nbits - 1 - j)) & 1
            if j % 2 == 0:
                x = (x << 1) | bit
            else:
                y = (y << 1) | bit
        lat_bits = nbits // 2
        lons[i] = (x + 0.5) / (1 << lon_bits) * 360.0 - 180.0
        lats[i] = (y + 0.5) / (1 << lat_bits) * 180.0 - 90.0
    return lons, lats
