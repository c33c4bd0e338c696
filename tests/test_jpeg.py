"""Baseline JPEG codec (operators/jpeg.py): encode→decode round-trips
across color/gray, subsampling, restart markers, quantization, and the
unsupported-feature contract. No imaging library anywhere — the
encoder is the fixture generator, so every decoder path is exercised
against known pixels."""

import numpy as np
import pytest

from esdb_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg


def _test_image(h=37, w=50, seed=3):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    img[:, :, 2] = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return img


def test_color_roundtrip_near_lossless():
    img = _test_image()
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert dec.shape == img.shape
    # unit quant tables: only DCT + color-transform rounding remains
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_gray_roundtrip_near_lossless():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(gray))
    assert dec.shape == (24, 17, 1)
    # single component: no color transform, only DCT rounding
    assert np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max() <= 1


def test_non_multiple_of_8_dimensions():
    for h, w in [(1, 1), (8, 8), (9, 15), (16, 23)]:
        img = _test_image(h, w)
        dec = decode_jpeg_pixels(encode_jpeg(img))
        assert dec.shape == (h, w, 3)


def test_420_subsampling_decodes_with_bounded_chroma_error():
    # smooth image: box-downsampled chroma reconstructs closely
    h, w = 37, 50
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    img[:, :, 2] = (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(
        np.uint8
    )
    dec = decode_jpeg_pixels(encode_jpeg(img, subsampling="420"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 4


def test_restart_markers_roundtrip():
    img = _test_image(40, 64)
    plain = decode_jpeg_pixels(encode_jpeg(img))
    restarted = decode_jpeg_pixels(encode_jpeg(img, restart_interval=3))
    # restart markers change framing, not pixels
    assert np.array_equal(plain, restarted)


def test_quantization_degrades_gracefully():
    img = _test_image()
    q = np.full((8, 8), 16, int)
    dec = decode_jpeg_pixels(encode_jpeg(img, quant=q))
    err = np.abs(dec.astype(int) - img.astype(int))
    # q=16 loses detail but must stay in the right neighborhood
    assert err.mean() < 16
    # and the file gets smaller than near-lossless
    assert len(encode_jpeg(img, quant=q)) < len(encode_jpeg(img))


def test_dc_prediction_across_blocks():
    # constant image spanning many blocks: DC chain must not drift
    img = np.full((40, 40, 3), 137, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert np.abs(dec.astype(int) - 137).max() <= 1


def test_non_jpeg_returns_none():
    assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\nnot a jpeg") is None
    assert decode_jpeg_pixels(b"") is None


def test_unsupported_sof_rejected():
    enc = bytearray(encode_jpeg(_test_image(8, 8)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC3  # lossless sequential — genuinely unsupported
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg_pixels(bytes(enc))


# --- progressive (SOF2): full spectral selection + successive
# --- approximation, bit-equal to the baseline decode by construction


def test_progressive_equals_baseline_exactly():
    """Both modes quantize identical coefficients, so the decoded
    pixels must be bit-identical — the internal oracle that certifies
    every progressive path (DC first/refine, AC first/refine, EOB
    runs) end to end."""
    for shape, sub in [
        ((21, 34, 3), "444"),
        ((24, 17), "444"),
        ((37, 50, 3), "420"),
        ((1, 1, 3), "444"),
        ((8, 8), "444"),
    ]:
        img = _test_image(*shape[:2]) if len(shape) == 3 else np.random.default_rng(9).integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg_pixels(encode_jpeg(img, subsampling=sub))
        prog = decode_jpeg_pixels(
            encode_jpeg(img, subsampling=sub, progressive=True)
        )
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_quantized_and_smooth_eobrun():
    """A smooth quantized image drives long EOB runs (many all-zero
    bands) through both encoder and decoder."""
    h, w = 48, 40
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = np.linspace(40, 200, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = 128
    img[:, :, 2] = np.linspace(200, 40, h, dtype=np.uint8)[:, None]
    q = np.full((8, 8), 24, int)
    base = decode_jpeg_pixels(encode_jpeg(img, quant=q))
    prog = decode_jpeg_pixels(encode_jpeg(img, quant=q, progressive=True))
    assert np.array_equal(base, prog)
    # and the progressive file is recognizably SOF2
    assert b"\xff\xc2" in encode_jpeg(img, quant=q, progressive=True)


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_test_image(8, 8), progressive=True, restart_interval=2)


def test_truncated_stream_raises_not_garbage():
    enc = encode_jpeg(_test_image())
    with pytest.raises(ValueError):
        decode_jpeg_pixels(enc[: len(enc) // 2])


def test_header_parser_reads_own_output():
    from esdb_spark.operators.multimodal import parse_image_dims

    assert parse_image_dims(encode_jpeg(_test_image(21, 34))) == (
        "image/jpeg",
        34,
        21,
    )


def test_decode_pixels_dispatches_jpeg():
    from esdb_spark.operators.multimodal import decode_pixels

    img = _test_image(9, 12)
    dec = decode_pixels(encode_jpeg(img))
    assert dec.shape == (9, 12, 3)


def test_pixel_feature_operator_decodes_jpeg(spark):
    """End-to-end: JPEG blobs through the Arrow-batched pixel-stat
    operator — real decode inside mapInPandas."""
    from esdb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_pixel_features,
    )

    img = np.full((16, 16, 3), 100, np.uint8)
    img[:, :, 0] = 200  # mean_r=200, mean_g=100, mean_b=100
    rows = [
        (1, "image", bytearray(encode_jpeg(img)), ("image/jpeg", 16, 16, None)),
        (2, "image", bytearray(b"garbage"), (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_image_pixel_features(df).collect()}
    assert out[1]["width"] == 16 and out[1]["channels"] == 3
    assert abs(out[1]["mean_r"] - 200) <= 2
    assert abs(out[1]["mean_g"] - 100) <= 2
    assert out[2]["width"] is None  # malformed → nulls, task survives


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: FF FF ... <marker> is fill + marker; the decoder
    must not read a phantom 0xFF marker (round-4 review find)."""
    img = _test_image(8, 8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i:i] = b"\xff\xff"  # two fill bytes before SOF0
    dec = decode_jpeg_pixels(bytes(enc))
    assert dec is not None and dec.shape == (8, 8, 3)


def test_truncated_mid_dht_raises_value_error():
    """Cutting inside a DHT's VALUE LIST (past the 17-byte header, so
    the table build actually runs on a short list) must raise the
    malformed-DHT ValueError, not an IndexError (round-4 find). A
    shallower cut (header incomplete) raises the no-decodable-scan
    error instead — assert both paths with their messages."""
    enc = encode_jpeg(_test_image(16, 16))
    i = enc.find(b"\xff\xc4")
    with pytest.raises(ValueError, match="malformed DHT"):
        decode_jpeg_pixels(enc[: i + 4 + 17 + 3])
    with pytest.raises(ValueError, match="no decodable scan"):
        decode_jpeg_pixels(enc[: i + 10])


# --- property tests: arbitrary images round-trip within codec bounds ---

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    gray=st.booleans(),
    seed=st.integers(0, 2**31),
    restart=st.sampled_from([0, 2]),
)
def test_roundtrip_property(h, w, gray, seed, restart):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, restart_interval=restart))
    assert dec.shape == (h, w, 1 if gray else 3)
    ref = img[:, :, None] if gray else img
    # unit quant: DCT rounding only for gray; color adds YCbCr forward+
    # inverse rounding — a 2000-seed sweep measured max error exactly 3
    # (~1% of 40x40 images), and the composed-rounding worst case
    # admits 4, so the bound is 4: tight enough to catch any real
    # regression (which jumps far past it), loose enough to never flake
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= (1 if gray else 4)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    seed=st.integers(0, 2**31),
)
def test_420_roundtrip_property(h, w, seed):
    """4:2:0 is chroma-lossy; luma must stay near-exact as long as no
    RGB channel clips (Y is full resolution — mid-range pixels keep
    R/G/B inside [0,255] even under worst-case chroma averaging, so
    clipping cannot leak chroma error into recomputed luma)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(90, 166, (h, w, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, subsampling="420"))
    assert dec.shape == (h, w, 3)
    y_in = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    y_out = 0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2]
    assert np.abs(y_in - y_out).max() <= 3.0


def test_progressive_refine_zrl_with_bits_beyond_window():
    """Bands with ≥16-zero-history runs followed by significant
    coefficients: the refine encoder must emit correction bits
    positionally per ZRL window, not lumped after the first ZRL
    (review-found desync; the decoder reads bits inline while
    traversing). Exercised through the public API with coarse
    quantization, which produces exactly such bands."""
    rng = np.random.default_rng(40)
    for q in (16, 24, 32):
        qt = np.full((8, 8), q, int)
        for shape, sub in [((37, 50, 3), "444"), ((24, 17), "444"),
                           ((37, 50, 3), "420")]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = decode_jpeg_pixels(encode_jpeg(img, subsampling=sub, quant=qt))
            prog = decode_jpeg_pixels(
                encode_jpeg(img, subsampling=sub, quant=qt, progressive=True)
            )
            assert np.array_equal(base, prog), (shape, sub, q)


def test_progressive_refine_random_coefficient_bands():
    """Direct refine-scan round-trip over random coefficient bands —
    covers ZRL windows, EOB-run correction bits, and sign handling at
    the scan layer (un-stuffed through _split_scan like the real
    path)."""
    import esdb_spark.operators.jpeg as J

    ac_enc = J._encode_table(*J._PROG_AC_SPEC)
    lut = J._decode_lut(
        (tuple(J._PROG_AC_SPEC[0]), tuple(J._PROG_AC_SPEC[1]))
    )
    rng = np.random.default_rng(1)
    for _ in range(300):
        n = int(rng.integers(1, 63))
        band = rng.choice([0, 0, 0, 0, 1, -1, 2, -2, 3, -3, 37, -40], size=n)
        true_zz = np.zeros(64, dtype=np.int64)
        true_zz[1 : 1 + n] = band
        rb = bytes(
            J._encode_ac_refine(
                true_zz.reshape(1, 1, 64), (1, 1, 1, 1), ac_enc, 1, 63, 0
            )
        )
        segs, _ = J._split_scan(rb + b"\xff\xd9")
        coef = np.zeros((1, 1, 64), dtype=np.int32)
        for k in range(1, 64):
            c = int(true_zz[k])
            coef[0, 0, J._ZIGZAG[k]] = ((1 if c > 0 else -1) * (abs(c) >> 1)) << 1
        J._decode_ac_scan(coef, lut, 1, 63, 1, 0, 0, segs, (1, 1, 1, 1))
        assert np.array_equal(coef[0, 0][J._ZIGZAG], true_zz)


def test_sof_dimension_bomb_rejected():
    """A corrupt SOF claiming 65535x65535 must raise, not attempt a
    multi-GiB coefficient-store allocation (review-found)."""
    for progressive in (False, True):
        enc = bytearray(encode_jpeg(_test_image(8, 8), progressive=progressive))
        i = enc.find(b"\xff\xc2" if progressive else b"\xff\xc0")
        enc[i + 5 : i + 9] = (65535).to_bytes(2, "big") * 2
        with pytest.raises(ValueError, match="decoder limit"):
            decode_jpeg_pixels(bytes(enc))
