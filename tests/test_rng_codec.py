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
    # progressive/foreign streams still gate honestly (no SOS marker)
    with pytest.raises((NotImplementedError, ValueError)):
        imagecodec.decode_image(b"\xffx not a jpeg at all", "jpeg")


def test_real_jpeg_roundtrip_and_psnr():
    """r4: baseline JFIF JPEG — decode(encode(px)) must equal the
    defined reconstruction (IDCT of the quantized blocks) EXACTLY and
    hold the BASELINE.md PSNR >= 40 dB invariant on white noise (the
    worst case for a DCT codec)."""
    rs = np.random.RandomState(1)
    for trial in range(6):
        h, w = int(rs.choice([16, 24, 32])), int(rs.choice([16, 24, 32]))
        px = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
        blob = imagecodec.encode_jpeg(px)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        dec = imagecodec.decode_jpeg(blob)
        assert dec.shape == px.shape
        p = imagecodec.psnr(px, dec)
        assert p >= 40.0, p
        # exact conformance to the declared lossy semantics
        qv = imagecodec.jpeg_quantized_blocks(px)
        qy, qc = imagecodec.jpeg_quant_tables()
        izz = np.empty(64, np.int64)
        izz[imagecodec._ZZ] = np.arange(64)
        bh, bw = h // 8, w // 8
        ref = np.empty((h, w, 3))
        for c in range(3):
            q = qy if c == 0 else qc
            coefs = qv[c::3][:, izz].reshape(bh * bw, 8, 8).astype(np.float64) * q[None]
            blocks = np.einsum("ux,iuv,vy->ixy", imagecodec._D8, coefs, imagecodec._D8)
            ref[..., c] = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w) + 128.0
        want = np.clip(imagecodec._rha(imagecodec.ycc_to_rgb(ref)), 0, 255).astype(np.uint8)
        assert (dec == want).all()


def test_real_jpeg_byte_stuffing_and_dispatch():
    """0xFF bytes inside the entropy stream must be stuffed/unstuffed
    transparently; dispatch picks the real decoder on FFD8."""
    px = np.full((16, 16, 3), 255, dtype=np.uint8)  # drives large DC codes
    blob = imagecodec.encode_jpeg(px)
    out = imagecodec.decode_image(blob, "jpeg")
    assert imagecodec.psnr(px, out) >= 40.0


def test_stream_is_counter_mode():
    a = rng.stream(5, np.arange(10, dtype=np.uint64))
    b = rng.stream(5, np.arange(5, 10, dtype=np.uint64))
    assert np.array_equal(a[5:], b)  # row content depends only on index


# ---------------------------------------------------------------------------
# WAV codec + audio features (r4c)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_and_chunk_walk():
    import struct

    from georay.audiocodec import decode_wav, encode_wav

    rs = np.random.RandomState(11)
    s = rs.randint(-32768, 32768, 5000).astype(np.int16)
    blob = encode_wav(s, 16000)
    sr, s2 = decode_wav(blob)
    assert sr == 16000 and np.array_equal(s, s2)
    # python's own wave module reads our output
    import io
    import wave

    with wave.open(io.BytesIO(blob)) as wf:
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        assert wf.getframerate() == 16000 and wf.getnframes() == 5000
        assert np.array_equal(np.frombuffer(wf.readframes(5000), "<i2"), s)
    # decoder walks past extra chunks (LIST before data)
    hdr_end = 12 + 8 + 16  # RIFF + fmt
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = blob[:hdr_end] + extra + blob[hdr_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    sr3, s3 = decode_wav(patched)
    assert sr3 == 16000 and np.array_equal(s3, s)
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAIFF")
    with pytest.raises(ValueError):
        decode_wav(blob[:40])  # truncated before data payload ends


def test_audio_features_vs_brute(ray_session):
    import ray.data as rd

    from georay import datagen
    from georay.multimodal import audio_features

    n = 7
    tab = datagen.generate_audio(n)
    got = (
        audio_features(rd.from_arrow(tab), window=512)
        .to_pandas()
        .set_index(["audio_id", "win"])
        .sort_index()
    )
    for i in range(n):
        s = datagen._samples_for(i).astype(np.int64)
        n_win = len(s) // 512
        for w in range(n_win):
            seg = s[w * 512 : (w + 1) * 512]
            row = got.loc[(f"aud-{i:08d}", w)]
            assert row["sum_sq"] == int((seg * seg).sum())
            neg = seg < 0
            assert row["n_zc"] == int((neg[1:] != neg[:-1]).sum())
            assert row["peak"] == int(np.abs(seg).max())
    assert len(got) == sum(len(datagen._samples_for(i)) // 512 for i in range(n))


def test_silence_segments_vs_brute(ray_session):
    import ray.data as rd

    from georay import datagen
    from georay.multimodal import SILENCE_THRESHOLD, silence_segments

    tab = datagen.generate_audio(6)
    got = (
        silence_segments(rd.from_arrow(tab), window=512)
        .to_pandas().sort_values(["audio_id", "seg_idx"]).reset_index(drop=True)
    )
    rows = []
    for i in range(6):
        s = datagen._samples_for(i).astype(np.int64)
        n_win = len(s) // 512
        sil = (s[: n_win * 512].reshape(n_win, 512) ** 2).sum(1) < SILENCE_THRESHOLD
        k, w = 0, 0
        while w < n_win:
            if sil[w]:
                start = w
                while w < n_win and sil[w]:
                    w += 1
                rows.append((f"aud-{i:08d}", k, start, w - start))
                k += 1
            else:
                w += 1
    import pandas as pd

    want = pd.DataFrame(rows, columns=["audio_id", "seg_idx", "start_win", "n_win"])
    pd.testing.assert_frame_equal(got, want)
    # the v2 gating plants a silent window every 8th: at least one
    # segment per clip
    assert set(want["audio_id"]) == {f"aud-{i:08d}" for i in range(6)}
