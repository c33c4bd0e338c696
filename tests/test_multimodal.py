"""Multimodal plumbing tests — the Spark-side path is real; codecs are
deterministic fakes (see operators/multimodal.py docstring)."""

import pytest

from esdb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_media_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytes([10, 20, 30, 40]), ("image/png", None, None, None)),
        (1, "image", bytes([200] * 1000), ("image/jpeg", None, None, None)),
        (2, "video", bytes(range(100)) * 10, ("video/mp4", None, None, 3500)),
        (3, "audio", b"", ("audio/wav", None, None, 800)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_unrecognized_payload_raises_value_error():
    # truncated magic / garbage → explicit contract error, not wrong pixels
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00" * 4  # CRC (unchecked)
    )


def _jpeg(w, h):
    # SOI, APP0 (JFIF), then SOF0 carrying the dimensions.
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _bmp(w, h):
    return (
        b"BM" + b"\x00" * 12
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 4
    )


def test_parse_image_dims_real_headers():
    from esdb_spark.operators.multimodal import parse_image_dims

    assert parse_image_dims(_png(640, 480)) == ("image/png", 640, 480)
    assert parse_image_dims(_jpeg(1920, 1080)) == ("image/jpeg", 1920, 1080)
    assert parse_image_dims(_gif(320, 200)) == ("image/gif", 320, 200)
    assert parse_image_dims(_bmp(800, 600)) == ("image/bmp", 800, 600)
    # non-images and text-looking payloads fall through to None
    assert parse_image_dims(b"plain text document") is None
    assert parse_image_dims(b"BMW is a carmaker, not a bitmap header!!!") is None
    assert parse_image_dims(b"") is None
    # truncated image headers are rejected, not misparsed
    assert parse_image_dims(_png(640, 480)[:12]) is None
    assert parse_image_dims(b"\xff\xd8\xff") is None


def test_extract_media_features_real_images(spark):
    """End-to-end: real dimensions from real image bytes through the
    Arrow mapInPandas path (no imaging library involved)."""
    rows = [
        (0, "image", _png(640, 480), ("image/png", None, None, None)),
        (1, "image", _jpeg(1920, 1080), ("image/jpeg", None, None, None)),
        (2, "image", _gif(320, 200), ("image/gif", None, None, None)),
        (3, "image", b"not an image", (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_media_features(df).collect()}
    assert (out[0].width, out[0].height) == (640, 480)
    assert (out[1].width, out[1].height) == (1920, 1080)
    assert (out[2].width, out[2].height) == (320, 200)
    # unrecognized bytes keep the deterministic fake (plumbing parity)
    assert out[3].width == 100 + ord("n") % 156


def test_extract_media_features(spark, media):
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert len(out) == 4
    assert out[0].n_bytes == 4
    assert out[1].n_bytes == 1000
    # deterministic fake dims derived from payload bytes
    assert out[0].width == 100 + 10 % 156
    assert out[3].width == 0  # empty payload


def test_sample_video_frames(spark, media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    # 3500ms video at 1000ms cadence → 3 frames
    assert len(by_media[2]) == 3
    assert [f.frame_ts_ms for f in sorted(by_media[2], key=lambda x: x.frame_idx)] == [
        0,
        1000,
        2000,
    ]
    # frame payload slices reassemble the original content
    content = b"".join(
        bytes(f.frame) for f in sorted(by_media[2], key=lambda x: x.frame_idx)
    )
    assert content == bytes(range(100)) * 10
    # empty-payload audio yields no frames
    assert 3 not in by_media


def test_resize_images(spark):
    from esdb_spark.operators.multimodal import resize_images

    rows = [
        (1, "image", b"x" * 1000, ("image/png", 512, 256, None)),
        (2, "image", b"y" * 100, ("image/png", 100, 50, None)),  # no upscale
        (3, "image", None, ("image/png", 0, 0, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(df, max_side=256).collect()}
    # aspect preserved, max side clamped
    assert (out[1].width, out[1].height) == (256, 128)
    assert len(out[1].content) < 1000  # thumbnail bytes shrink
    # small image untouched
    assert (out[2].width, out[2].height) == (100, 50)
    assert len(out[2].content) == 100
    assert out[3].content == b""


def _wav(channels=2, rate=44100, bits=16, n_samples=44100):
    """Minimal valid PCM WAV byte string."""
    byte_rate = rate * channels * bits // 8
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_parse_wav_meta():
    from esdb_spark.operators.multimodal import parse_wav_meta

    meta = parse_wav_meta(_wav(channels=2, rate=44100, n_samples=44100))
    assert meta == ("audio/wav", 2, 44100, 1000)  # exactly one second
    meta = parse_wav_meta(_wav(channels=1, rate=8000, n_samples=4000))
    assert meta == ("audio/wav", 1, 8000, 500)
    assert parse_wav_meta(b"not audio at all") is None
    assert parse_wav_meta(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt


def test_extract_audio_features(spark):
    from esdb_spark.operators.multimodal import extract_audio_features

    rows = [
        (1, _wav(channels=2, rate=44100, n_samples=22050)),
        (2, _wav(channels=1, rate=16000, n_samples=16000)),
        (3, b"plain text payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert got[1]["channels"] == 2
    assert got[1]["sample_rate_hz"] == 44100
    assert got[1]["duration_ms"] == 500
    assert got[2]["duration_ms"] == 1000
    assert got[3]["channels"] is None  # unrecognized -> nulls, no crash
    assert got[3]["n_bytes"] == len(b"plain text payload")


def _sine_wav(freq=440, rate=8000, n_samples=8000, amp=0.5):
    """PCM16 mono WAV with a real sine signal for decoded-feature tests."""
    import numpy as np

    t = np.arange(n_samples) / rate
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    data = x.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_pcm_signal_stats_real_decode():
    import math

    from esdb_spark.operators.multimodal import pcm_signal_stats

    rms, peak, zcr = pcm_signal_stats(_sine_wav(freq=440, rate=8000, amp=0.5))
    # sine: rms = amp/sqrt(2), peak = amp, zcr = 2*freq/rate
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(peak - 0.5) < 0.01
    assert abs(zcr - 2 * 440 / 8000) < 0.005
    assert pcm_signal_stats(b"not audio") is None
    # silence decodes as real zeros, not None
    assert pcm_signal_stats(_wav(channels=1, rate=8000, n_samples=100)) == (
        0.0,
        0.0,
        0.0,
    )


def test_extract_audio_signal_features(spark):
    from esdb_spark.operators.multimodal import extract_audio_signal_features

    rows = [
        (1, _sine_wav(freq=200, rate=8000, amp=0.25)),
        (2, b"plain text payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r
        for r in extract_audio_signal_features(df).collect()
    }
    assert abs(got[1]["peak"] - 0.25) < 0.01
    assert abs(got[1]["zero_cross_rate"] - 2 * 200 / 8000) < 0.005
    assert got[1]["sample_rate_hz"] == 8000
    assert got[2]["rms"] is None and got[2]["channels"] is None


def _png_pix(img, filters):
    """Minimal PNG encoder for tests: encodes `img` (h, w, ch uint8)
    using the given per-row filter types (0-4), inverting the spec's
    reconstruction formulas — so decode must reproduce `img` exactly."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype, body):
        c = struct.pack(">I", len(body)) + ctype + body
        return c + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for row, f in zip(range(h), filters):
        rec = img[row].reshape(-1).astype(np.int32)
        filt = np.empty_like(rec)
        for x in range(len(rec)):
            a = int(rec[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (int(rec[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = rec
    idat = zlib.compress(bytes(raw))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrip_all_filters():
    import numpy as np

    from esdb_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
        png = _png_pix(img, filters=[0, 1, 2, 3, 4])
        got = decode_png_pixels(png)
        assert got is not None and got.shape == img.shape, ch
        assert (got == img).all(), f"channels={ch}"
    assert decode_png_pixels(b"not a png") is None


def _bmp_pix(img, top_down=False):
    """Minimal 24-bit BMP encoder (BGR, padded rows)."""
    import struct

    import numpy as np

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = img[:, :, ::-1]  # RGB → BGR
    if not top_down:
        rows = rows[::-1]
    body = bytearray()
    for r in rows:
        body.extend(r.tobytes())
        body.extend(b"\x00" * (stride - w * 3))
    hh = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, len(body), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def test_bmp_decode_roundtrip_both_orientations():
    import numpy as np

    from esdb_spark.operators.multimodal import decode_bmp_pixels

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    for td in (False, True):
        got = decode_bmp_pixels(_bmp_pix(img, top_down=td))
        assert got is not None and (got == img).all(), td
    assert decode_bmp_pixels(b"BMgarbage") is None


def test_extract_image_pixel_features(spark):
    import numpy as np

    from esdb_spark.operators.multimodal import extract_image_pixel_features

    solid = np.zeros((4, 4, 3), dtype=np.uint8)
    solid[:, :, 0] = 200  # pure red-ish
    rows = [
        (1, _png_pix(solid, filters=[0, 1, 2, 4])),
        (2, _bmp_pix(solid)),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r for r in extract_image_pixel_features(df).collect()
    }
    for mid in (1, 2):
        assert got[mid]["mean_r"] == 200.0 and got[mid]["mean_g"] == 0.0
        assert (got[mid]["width"], got[mid]["height"]) == (4, 4)
        assert abs(got[mid]["brightness"] - 200.0 / 3) < 1e-9
    assert got[3]["width"] is None and got[3]["brightness"] is None


def test_resize_images_real_png_path(spark):
    """PNG payloads must be genuinely resized: the output content is a
    valid PNG whose decoded pixels equal a nearest-neighbor downsample
    of the source."""
    import numpy as np

    from esdb_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        resize_images,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 32, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, {"width": 32, "height": 8}, encode_png(img))],
        "media_id long, meta struct<width:int,height:int>, content binary",
    )
    row = resize_images(df, max_side=16).collect()[0]
    assert (row["width"], row["height"]) == (16, 4)
    got = decode_png_pixels(bytes(row["content"]))
    ys = np.arange(4) * 8 // 4
    xs = np.arange(16) * 32 // 16
    assert (got == img[ys][:, xs]).all()


def test_resize_images_null_meta_non_png(spark):
    """Non-decodable payloads with NULL meta dims must not crash the
    task (pandas NaN is truthy; int(NaN) raised before the guard)."""
    from esdb_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, None, b"\xff\xd8\xff\xe0 jpeg-ish")],
        "media_id long, meta struct<width:int,height:int>, content binary",
    )
    row = resize_images(df, max_side=16).collect()[0]
    assert (row["width"], row["height"]) == (0, 0)


def test_gif_decode_canonical_fixture():
    """External validity: the widely-documented minimal 1x1 white GIF
    must decode to a single white pixel."""
    from esdb_spark.operators.multimodal import decode_gif_pixels

    one = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    assert decode_gif_pixels(one).tolist() == [[[255, 255, 255]]]
    assert decode_gif_pixels(b"GIF89a truncated") is None


def test_gif_roundtrip_with_width_growth():
    import numpy as np

    from esdb_spark.operators.multimodal import decode_gif_pixels, encode_gif

    rng = np.random.default_rng(2)
    for ncol, shape in [(4, (3, 5)), (256, (24, 17)), (2, (1, 1))]:
        pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(ncol)]
        idx = rng.integers(0, ncol, shape).astype(np.uint8)
        got = decode_gif_pixels(encode_gif(idx, pal))
        assert (got == np.array(pal, dtype=np.uint8)[idx]).all(), (ncol, shape)
    # long repetitive runs: dictionary growth through width bumps
    idx = np.tile(np.arange(8, dtype=np.uint8), 2000).reshape(100, 160)
    pal = [(i * 30 % 256, i, i) for i in range(8)]
    got = decode_gif_pixels(encode_gif(idx, pal))
    assert (got[:, :, 1] == idx).all()


def test_pixel_features_cover_gif(spark):
    import numpy as np

    from esdb_spark.operators.multimodal import (
        encode_gif,
        extract_image_pixel_features,
    )

    idx = np.zeros((4, 4), dtype=np.uint8)
    gif = encode_gif(idx, [(10, 20, 30)])
    df = spark.createDataFrame([(1, gif)], "media_id long, content binary")
    row = extract_image_pixel_features(df).collect()[0]
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (10.0, 20.0, 30.0)
    assert (row["width"], row["height"]) == (4, 4)


# --- round 4: MP4 container metadata + spectral audio features ---


def _stereo_sine_wav(freq=1200, rate=8000, n_samples=8000):
    import numpy as np

    t = np.arange(n_samples) / rate
    x = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    data = np.repeat(x, 2).tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_spectral_features_find_the_tone():
    from esdb_spark.operators.multimodal import pcm_spectral_features

    dom, cen = pcm_spectral_features(_sine_wav(freq=440, rate=8000))
    assert abs(dom - 440) < 2  # FFT bin resolution at 1s/8kHz is 1 Hz
    assert abs(cen - 440) < 30  # windowing leakage spreads a little
    dom2, _ = pcm_spectral_features(_stereo_sine_wav(freq=1200))
    assert abs(dom2 - 1200) < 2
    assert pcm_spectral_features(b"not a wav") is None


def test_mp4_meta_roundtrip():
    from esdb_spark.operators.multimodal import (
        encode_minimal_mp4,
        parse_mp4_meta,
    )

    enc = encode_minimal_mp4(duration_ms=90_000, width=1920, height=1080)
    assert parse_mp4_meta(enc) == ("video/mp4", 90_000, 1, 1920, 1080)
    multi = encode_minimal_mp4(duration_ms=500, n_tracks=3)
    mime, dur, tracks, w, h = parse_mp4_meta(multi)
    assert (dur, tracks, w, h) == (500, 3, None, None)  # 0x0 → no geometry
    assert parse_mp4_meta(b"nope") is None
    # truncated/malformed boxes terminate the walk, never loop or raise
    assert parse_mp4_meta(enc[:20])[1] is None


def test_extract_video_meta_operator(spark):
    from esdb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_minimal_mp4,
        extract_video_meta,
    )

    rows = [
        (1, "video", bytearray(encode_minimal_mp4(30_000, 640, 480)),
         ("video/mp4", None, None, 30_000)),
        (2, "video", bytearray(b"garbage"), (None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_video_meta(df).collect()}
    assert out[1]["duration_ms"] == 30_000
    assert out[1]["width"] == 640 and out[1]["height"] == 480
    assert out[2]["duration_ms"] is None  # non-MP4 → nulls


def test_mp4_unknown_duration_sentinel_maps_to_none():
    """All-ones mvhd duration is the spec's 'unknown' (fragmented/live
    files) — must surface None, not 4.3M ms feeding a 4.3M-iteration
    frame loop (round-4 review find)."""
    from esdb_spark.operators.multimodal import (
        encode_minimal_mp4,
        parse_mp4_meta,
    )

    enc = bytearray(encode_minimal_mp4(duration_ms=1000))
    i = enc.find(b"mvhd")
    # mvhd v0 body starts at i+4; duration is bytes 16..20 of the body
    enc[i + 4 + 16 : i + 4 + 20] = b"\xff\xff\xff\xff"
    assert parse_mp4_meta(bytes(enc))[1] is None


def test_spectral_head_cap_bounds_decode():
    """Only the leading max_samples frames are decoded — a long tail
    after the head must not change the result."""
    from esdb_spark.operators.multimodal import pcm_spectral_features

    short = _sine_wav(freq=300, rate=8000, n_samples=4096)
    longer = _sine_wav(freq=300, rate=8000, n_samples=65536)
    a = pcm_spectral_features(short, max_samples=4096)
    b = pcm_spectral_features(longer, max_samples=4096)
    assert a == b


def test_png_16bit_roundtrip():
    """16-bit PNG: lossless round-trip of uint16 samples (big-endian
    pairs through the same filter kernel — round-4 coverage add)."""
    import numpy as np

    from esdb_spark.operators.multimodal import decode_png_pixels, encode_png

    rng = np.random.default_rng(2)
    img = rng.integers(0, 65536, (9, 13, 3), dtype=np.uint16)
    dec = decode_png_pixels(encode_png(img))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, img)
    gray = rng.integers(0, 65536, (5, 7), dtype=np.uint16)
    dec = decode_png_pixels(encode_png(gray))
    assert np.array_equal(dec[:, :, 0], gray)


def test_png_adam7_roundtrip():
    """Adam7-interlaced PNG decodes pixel-identically to the plain
    encoding, across sizes that exercise empty and partial passes."""
    import numpy as np

    from esdb_spark.operators.multimodal import decode_png_pixels, encode_png

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (13, 21)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = decode_png_pixels(encode_png(img, interlace=True))
        assert np.array_equal(dec, img), (h, w)
    # 16-bit + interlace together
    img16 = rng.integers(0, 65536, (11, 6, 4), dtype=np.uint16)
    assert np.array_equal(
        decode_png_pixels(encode_png(img16, interlace=True)), img16
    )


def test_png_palette_decode():
    """Color-type-3 PNG: 8-bit indices map through PLTE to RGB
    (round-4 coverage add; fixture hand-built from the spec)."""
    import struct
    import zlib

    import numpy as np

    from esdb_spark.operators.multimodal import decode_png_pixels

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    h, w = idx.shape

    def chunk(ctype, body):
        c = struct.pack(">I", len(body)) + ctype + body
        return c + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    dec = decode_png_pixels(png)
    assert dec.shape == (2, 3, 3)
    for r in range(h):
        for c in range(w):
            assert tuple(dec[r, c]) == palette[idx[r, c]]
    # out-of-range index raises the contract error
    import pytest

    bad_raw = b"\x00" + bytes([7, 0, 0]) + b"\x00" + bytes([0, 0, 0])
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(bad_raw)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        decode_png_pixels(bad)
    # palette image without PLTE → None, not a crash
    noplte = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(noplte) is None
