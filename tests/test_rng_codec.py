"""Determinism + SQL-parity of the seeded streams and the image codecs."""

import duckdb
import numpy as np
import pytest

from georay import imagecodec, rng


def test_splitmix_matches_sql():
    us = np.array(
        [0, 1, 42, 2**63 - 1, 2**64 - 1, 1234567890123456789, 2**63, 2**64 - 12345],
        dtype=np.uint64,
    )
    con = duckdb.connect()
    for u in us:
        sqlv = con.sql(f"select {rng.sql_splitmix64(str(int(u)))}").fetchone()[0]
        assert int(sqlv) == int(rng.splitmix64(np.uint64(u)))


def test_lonlat_sql_bit_identical():
    phash = rng.stream(0x1111AA01, np.arange(500, dtype=np.uint64)).view(np.int64)
    lon, lat = rng.lonlat_from_phash(phash)
    assert lon.min() >= -180 and lon.max() < 180
    assert lat.min() >= -85 and lat.max() < 85
    con = duckdb.connect()
    con.register("t", __import__("pyarrow").table({"phash": phash}))
    q = rng.sql_lonlat_cte("t")
    rows = con.sql(f"WITH pts AS ({q}) SELECT lon, lat FROM pts").fetchnumpy()
    assert np.array_equal(rows["lon"], lon)  # bit-identical, no tolerance
    assert np.array_equal(rows["lat"], lat)


def test_u64_negative_phash_roundtrip():
    con = duckdb.connect()
    v = con.sql(f"select {rng.sql_u64('-1')}").fetchone()[0]
    assert int(v) == 2**64 - 1


def test_png_roundtrip():
    rs = np.random.RandomState(0)
    px = rs.randint(0, 256, (24, 16, 3), dtype=np.uint8)
    data = imagecodec.encode_png(px)
    assert data[:8] == imagecodec.PNG_SIG
    out = imagecodec.decode_png(data)
    assert np.array_equal(out, px)


def test_fake_jpeg_psnr_above_40():
    rs = np.random.RandomState(1)
    px = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    out = imagecodec.decode_fake_jpeg(imagecodec.encode_fake_jpeg(px))
    p = imagecodec.psnr(px, out)
    assert 40.0 <= p < 60.0


def test_decode_dispatch_unknown_jpeg_raises():
    with pytest.raises(NotImplementedError):
        imagecodec.decode_image(b"\xff\xd8\xff\xe0 real jpeg", "jpeg")


def test_stream_is_counter_mode():
    a = rng.stream(5, np.arange(10, dtype=np.uint64))
    b = rng.stream(5, np.arange(5, 10, dtype=np.uint64))
    assert np.array_equal(a[5:], b)  # row content depends only on index
