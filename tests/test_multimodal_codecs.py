"""Real-codec tests for the multimodal operators: PCM WAV and
uncompressed BMP decode/encode, feature extraction, and resize —
stdlib-only, end to end through the Spark mapInPandas stages."""

from __future__ import annotations

import numpy as np
import pytest

from var_elasticnet_bigdata_spark.operators.multimodal import (
    audio_features,
    decode_bmp,
    decode_media,
    decode_png,
    encode_png,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_media_features,
    image_features,
    resize_images,
    resize_nearest,
)


def _sine(n=8000, rate=8000, freq=440.0, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def _gradient_rgb(h=16, w=20):
    r = np.tile(np.arange(w, dtype=np.uint8) * 12, (h, 1))
    g = np.tile((np.arange(h, dtype=np.uint8) * 15)[:, None], (1, w))
    b = np.full((h, w), 7, dtype=np.uint8)
    return np.stack([r, g, b], axis=2)


# ---------------------------------------------------------------------------
# pure-python codec round trips
# ---------------------------------------------------------------------------


def test_wav_round_trip_16bit():
    x = _sine()
    rate, y = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    assert y.shape == (8000, 1)
    # 16-bit quantization error bound
    assert np.abs(y[:, 0] - x).max() < 1.0 / 32766


def test_wav_stereo_shape():
    x = np.stack([_sine(1000), _sine(1000, freq=220.0)], axis=1)
    rate, y = decode_wav(encode_wav(x, 16000))
    assert y.shape == (1000, 2)
    assert np.abs(y - x).max() < 1e-4


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEjunkjunkjunk")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


def test_bmp_round_trip_exact():
    img = _gradient_rgb()
    out = decode_bmp(encode_bmp(img))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_bmp_row_padding_odd_width():
    # width 3 → 9-byte rows padded to 12: padding must not leak
    img = _gradient_rgb(h=5, w=3)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_rejects_compressed_or_truncated():
    img = _gradient_rgb(4, 4)
    payload = bytearray(encode_bmp(img))
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload[:30]))  # truncated
    payload[30] = 1  # BI_RLE8 compression flag
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload))


def test_decode_media_dispatch():
    kind, dec = decode_media(encode_bmp(_gradient_rgb(4, 4)))
    assert kind == "image" and dec.shape == (4, 4, 3)
    kind, (rate, y) = decode_media(encode_wav(_sine(100), 8000))
    assert kind == "audio" and rate == 8000
    # PNG (r3) and JPEG (r4) decode for real; corrupt bodies of
    # either are a ValueError (status-row degrade)
    kind, dec = decode_media(encode_png(_gradient_rgb(4, 4)))
    assert kind == "image" and dec.shape == (4, 4, 3)
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_media(b"plain text, not media")


# ---------------------------------------------------------------------------
# features + resize (numpy references)
# ---------------------------------------------------------------------------


def test_audio_features_sine():
    x = _sine(amp=0.5)
    dur, rms, zcr, peak = audio_features(8000, x[:, None])
    assert dur == pytest.approx(1.0)
    assert rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    # 440 Hz sine crosses zero ~880 times/s
    assert zcr == pytest.approx(880 / 8000, rel=0.02)
    assert peak == pytest.approx(0.5, rel=1e-3)


def test_image_features_known_values():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    r, g, b, luma, luma_std = image_features(img)
    assert (r, g, b) == (1.0, 0.0, 0.0)
    assert luma == pytest.approx(0.2126)
    assert luma_std == pytest.approx(0.0)


def test_resize_nearest_downscale_identity_blocks():
    img = _gradient_rgb(16, 16)
    half = resize_nearest(img, 8, 8)
    assert half.shape == (8, 8, 3)
    np.testing.assert_array_equal(half, img[::2, ::2])


def test_resize_nearest_upscale():
    img = _gradient_rgb(2, 2)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    np.testing.assert_array_equal(up[0, 0], img[0, 0])
    np.testing.assert_array_equal(up[3, 3], img[1, 1])


# ---------------------------------------------------------------------------
# Spark end-to-end (Arrow mapInPandas stages)
# ---------------------------------------------------------------------------


def _media_df(spark):
    rows = [
        (1, bytearray(encode_wav(_sine(4000), 8000))),
        (2, bytearray(encode_bmp(_gradient_rgb()))),
        (3, bytearray(b"garbage payload")),
        (4, bytearray(b"\xff\xd8\xff" + b"\x00" * 40)),  # corrupt JPEG
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_extract_media_features_end_to_end(spark):
    out = {r.media_id: r for r in extract_media_features(_media_df(spark)).collect()}
    assert out[1].kind == "audio" and out[1].status == "ok"
    assert out[1].features[0] == pytest.approx(0.5)  # 4000/8000 s
    assert out[2].kind == "image" and out[2].status == "ok"
    assert len(out[2].features) == 5
    assert out[3].status.startswith("undecodable")
    # a corrupt JPEG degrades to a status row (the real decoder
    # rejects it; nothing is "codec_unavailable" anymore)
    assert out[4].status.startswith("undecodable")
    # decoded features match the local reference exactly
    want = image_features(_gradient_rgb())
    assert out[2].features == pytest.approx(want)


def test_resize_images_end_to_end(spark):
    out = {r.media_id: r for r in resize_images(_media_df(spark), 8, 8).collect()}
    ok = out[2]
    assert (ok.status, ok.width, ok.height) == ("ok", 8, 8)
    np.testing.assert_array_equal(
        decode_bmp(bytes(ok.payload)), resize_nearest(_gradient_rgb(), 8, 8)
    )
    assert out[1].status.startswith("undecodable")  # WAV through image path
    assert out[1].payload is None


def test_wav_zero_rate_header_is_undecodable(spark):
    """A crafted WAV with sample-rate 0 must become a ValueError (and
    a status row through Spark), not a ZeroDivisionError inside
    feature extraction."""
    payload = bytearray(encode_wav(_sine(100), 8000))
    import struct

    assert struct.unpack_from("<I", payload, 24)[0] == 8000
    struct.pack_into("<I", payload, 24, 0)  # fmt-chunk sample rate
    with pytest.raises(ValueError, match="corrupt WAV header"):
        decode_wav(bytes(payload))
    df = spark.createDataFrame(
        [(9, bytearray(payload))], "media_id long, payload binary"
    )
    r = extract_media_features(df).collect()[0]
    assert r.status.startswith("undecodable")


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + unfiltering; VERDICT r2 item 7)
# ---------------------------------------------------------------------------


def test_png_round_trip_all_filters_and_channels():
    rng = np.random.default_rng(5)
    for shape in [(7, 5, 3), (4, 9, 4), (8, 3, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ftype in range(5):  # None/Sub/Up/Average/Paeth
            enc = encode_png(img, filter_type=ftype)
            dec = decode_png(enc)
            assert dec.shape == shape
            assert np.array_equal(dec, img), (shape, ftype)


def test_png_gradient_paeth_prediction():
    # smooth gradients make Paeth's predictor path non-trivial
    g = (
        np.tile(np.arange(100, dtype=np.uint8), (20, 1))[:, :, None]
        .repeat(3, axis=2)
    )
    assert np.array_equal(decode_png(encode_png(g, filter_type=4)), g)


def test_png_rejects_corrupt_and_unsupported():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(enc[:30])  # truncated chunk
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)  # no IHDR/IDAT
    # 16-bit depth advertised in IHDR -> unsupported, loud
    import struct, zlib
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth=16"):
        decode_png(bad)


def test_png_gray_and_gray_alpha_features(spark):
    """ADVICE r3 (medium): a valid grayscale (color type 0) or
    gray+alpha (color type 4) PNG must produce an 'ok' feature row —
    image_features replicates the gray plane to RGB — not an
    IndexError that fails the Spark task."""
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(6, 5, 1), dtype=np.uint8)
    graya = rng.integers(0, 256, size=(4, 7, 2), dtype=np.uint8)
    # local reference: decode → features directly
    for img in (gray, graya):
        feats = image_features(decode_png(encode_png(img)))
        assert len(feats) == 5
        r, g, b = feats[:3]
        assert r == pytest.approx(g) and g == pytest.approx(b)
        want = float(img[:, :, 0].mean()) / 255.0
        assert feats[3] == pytest.approx(want, rel=1e-6)  # luma == gray mean
    # through the Spark degrade-never-fail path
    df = spark.createDataFrame(
        [(21, bytearray(encode_png(gray))), (22, bytearray(encode_png(graya)))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in extract_media_features(df).collect()}
    assert out[21].status == "ok" and out[22].status == "ok"
    assert out[21].kind == "image" and len(out[21].features) == 5


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT; the former codec seam, closed r4)
# ---------------------------------------------------------------------------


def _gradient(h, w, chans=3):
    g = np.zeros((h, w, chans), dtype=np.uint8)
    for c in range(chans):
        g[:, :, c] = np.clip(
            np.add.outer(np.linspace(0, 100, h), np.linspace(0, 135, w))
            + c * 20, 0, 255,
        ).astype(np.uint8)
    return g


def test_jpeg_round_trip_444_and_420():
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _gradient(16, 24)
    for sub in (False, True):
        dec = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        # lossy, but a smooth gradient at Annex-K q50 stays tight
        assert err.mean() < 4.0 and err.max() <= 12, (sub, err.max())


def test_jpeg_odd_dimensions_and_grayscale():
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    odd = _gradient(17, 13)
    for sub in (False, True):
        d = decode_jpeg(encode_jpeg(odd, subsample=sub))
        assert d.shape == (17, 13, 3)
        assert np.abs(d.astype(int) - odd.astype(int)).mean() < 8.0
    gray = _gradient(12, 20, 1)[:, :, 0]
    dg = decode_jpeg(encode_jpeg(gray))
    assert dg.shape == (12, 20, 1)
    assert np.abs(dg[:, :, 0].astype(int) - gray.astype(int)).mean() < 3.0


def test_jpeg_rejects_progressive_truncated_corrupt():
    import struct

    import pytest as _pytest

    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    enc = bytearray(encode_jpeg(_gradient(8, 8)))
    # flip SOF0 (0xFFC0) to SOF2: the baseline full-band scan header
    # (Ss=0, Se=63) is ILLEGAL inside a progressive frame -> loud
    # rejection, not a silent misdecode
    i = bytes(enc).find(b"\xff\xc0")
    prog = enc[:i] + b"\xff\xc2" + enc[i + 2:]
    with _pytest.raises(ValueError, match="DC band"):
        decode_jpeg(bytes(prog))
    # genuinely unsupported frame types still reject loudly
    loss = enc[:i] + b"\xff\xc3" + enc[i + 2:]
    with _pytest.raises(ValueError, match="unsupported JPEG frame"):
        decode_jpeg(bytes(loss))
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(enc[: len(enc) // 3]))  # truncated
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 40)  # garbage markers
    # zero-dimension SOF is rejected, not a zero-size allocation
    j = bytes(enc).find(b"\xff\xc0")
    hdr = bytearray(enc)
    struct.pack_into(">H", hdr, j + 5, 0)  # height := 0
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(hdr))


def test_jpeg_through_media_pipeline(spark):
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_media,
        encode_jpeg,
        extract_media_features,
        image_features,
    )

    img = _gradient(16, 24)
    kind, dec = decode_media(encode_jpeg(img))
    assert kind == "image" and dec.shape == img.shape
    df = spark.createDataFrame(
        [(31, bytearray(encode_jpeg(img))),
         (32, bytearray(encode_jpeg(img, subsample=True)))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in extract_media_features(df).collect()}
    assert out[31].status == "ok" and out[31].kind == "image"
    want = image_features(dec)
    assert out[31].features == pytest.approx(want)
    assert out[32].status == "ok"


def test_jpeg_restart_markers_resync():
    """DRI/RSTn: the decoder must resync at every restart interval
    (DC predictors reset, bit reader realigned) and produce EXACTLY
    the pixels of the unrestarted encoding — with and without chroma
    subsampling."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _gradient(24, 32)
    plain = decode_jpeg(encode_jpeg(img))
    for ri in (1, 2, 7):
        enc = encode_jpeg(img, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        assert np.array_equal(decode_jpeg(enc), plain), ri
    sub_plain = decode_jpeg(encode_jpeg(img, subsample=True))
    sub_rst = decode_jpeg(encode_jpeg(img, subsample=True, restart_interval=2))
    assert np.array_equal(sub_rst, sub_plain)


def test_jpeg_dqt_bytes_are_zigzag_scanned_annex_k():
    """T.81 B.2.4.1: DQT Qk bytes are in zigzag scan order. The
    effective weighting must be the DOCUMENTED Annex-K q50 tables —
    self-round-trip alone cannot catch a permuted table (ADVICE r4),
    so pin the emitted segment bytes directly."""
    import struct

    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _JPEG_QT_CHROMA,
        _JPEG_QT_LUMA,
        _JPEG_ZIGZAG,
        encode_jpeg,
    )

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    buf = encode_jpeg(img)
    tables = {}
    i = 2
    while i < len(buf) - 1:
        marker, ln = struct.unpack(">HH", buf[i : i + 4])
        if marker == 0xFFDA:
            break
        if marker == 0xFFDB:
            body = buf[i + 4 : i + 2 + ln]
            tables[body[0] & 0x0F] = list(body[1:65])
        i += 2 + ln
    assert set(tables) == {0, 1}
    assert tables[0] == [_JPEG_QT_LUMA[z] for z in _JPEG_ZIGZAG]
    assert tables[1] == [_JPEG_QT_CHROMA[z] for z in _JPEG_ZIGZAG]


def test_jpeg_progressive_decode_matches_baseline_exactly():
    """Progressive scans carry the SAME quantized coefficients as the
    baseline scan, split across DC/AC bands and two successive-
    approximation levels — after the final refinement scan the
    reconstruction must be BYTE-IDENTICAL to the baseline decode of
    the same image. This pins DC first/refine, per-band AC first
    (EOB runs, ZRL), and AC refinement (correction bits) end to end,
    for 4:4:4, 4:2:0, grayscale, and odd dimensions."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    cases = [
        (_gradient(16, 24), False),
        (_gradient(16, 24), True),
        (_gradient(17, 13), False),
        (_gradient(17, 13), True),
        (_gradient(12, 20, 1)[:, :, 0], False),
    ]
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    cases.append((noisy, False))  # dense AC spectrum: many new coefs
    cases.append((noisy, True))
    flat = np.full((32, 32, 3), 77, dtype=np.uint8)
    cases.append((flat, False))  # all-EOB: long EOBRUN accumulation
    for img, sub in cases:
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        prog_bytes = encode_jpeg(img, subsample=sub, progressive=True)
        assert b"\xff\xc2" in prog_bytes
        prog = decode_jpeg(prog_bytes)
        assert np.array_equal(prog, base), (img.shape, sub)


def test_jpeg_progressive_truncated_and_corrupt_degrade_loudly():
    import pytest as _pytest

    from var_elasticnet_bigdata_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    enc = encode_jpeg(_gradient(16, 16), progressive=True)
    with _pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])  # truncated mid-scan
    # corrupt one entropy byte of the last AC refinement scan: must
    # raise (huffman/overrun) or decode to SOME image, never crash
    # with a non-ValueError
    body = bytearray(enc)
    body[-20] ^= 0x55
    try:
        out = decode_jpeg(bytes(body))
        assert out.shape == (16, 16, 3)
    except ValueError:
        pass
