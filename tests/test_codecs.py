"""Real-codec tests: WAV/PCM16 + BMP24 round-trips (pure numpy) and the
Spark extract_features dispatch over real payloads."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from combblas_spark.functions.codecs import (
    encode_wav_pcm16,
    decode_wav_pcm16,
    encode_bmp24,
    decode_bmp24,
    wav_features,
    bmp_features,
)
from combblas_spark.functions.multimodal import extract_features


def test_wav_roundtrip():
    t = np.linspace(0, 1, 1600, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav_pcm16(sig, 16_000)
    out, rate = decode_wav_pcm16(payload)
    assert rate == 16_000
    assert len(out) == 1600
    assert np.max(np.abs(out - sig)) < 1e-3  # 16-bit quantization
    f = wav_features(payload, dim=8)
    assert f.shape == (8,) and np.all(f >= 0)
    assert f[0] == pytest.approx(0.5 / np.sqrt(2), abs=0.01)  # sine RMS


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd row pad
    payload = encode_bmp24(img)
    out = decode_bmp24(payload)
    assert out.shape == img.shape
    assert np.array_equal(out, img)  # lossless
    f = bmp_features(payload, dim=12)
    assert f.shape == (12,)
    assert f.mean() == pytest.approx(img.mean() / 255.0, abs=0.15)


def test_extract_features_real_codecs(spark):
    t = np.linspace(0, 1, 800, endpoint=False)
    wav = encode_wav_pcm16(0.25 * np.sin(2 * np.pi * 100 * t), 8_000)
    img = encode_bmp24(np.full((8, 8, 3), 128, dtype=np.uint8))
    rows = [
        (0, "audio/wav", bytearray(wav), (0, 0, 8000, 0)),
        (1, "image/bmp", bytearray(img), (8, 8, 0, 0)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    got = {r["media_id"]: r for r in extract_features(media, dim=6).collect()}
    assert got[0]["modality"] == "audio/wav"
    assert got[0]["feature"][0] == pytest.approx(0.25 / np.sqrt(2), abs=0.01)
    assert got[1]["feature"][0] == pytest.approx(128 / 255.0, abs=0.01)
    # unknown modality without fake -> declared NotImplementedError
    vid = spark.createDataFrame(
        [(2, "video/mp4", bytearray(b"xx"), (0, 0, 0, 1))],
        media.schema,
    )
    with pytest.raises(Exception, match="no codec|NotImplemented"):
        extract_features(vid, dim=4).collect()


def test_resize_images_real_bmp(spark):
    """Real nearest-neighbor resize through the BMP24 codec: a 4x4 block
    image downsampled 2x must keep one pixel per block; compressed formats
    stay declared stubs."""
    from combblas_spark.functions.multimodal import resize_images

    # 4x4 image of 2x2 constant blocks with distinct colors
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    colors = {(0, 0): 10, (0, 1): 60, (1, 0): 110, (1, 1): 210}
    for (bi, bj), v in colors.items():
        img[2 * bi:2 * bi + 2, 2 * bj:2 * bj + 2, :] = v
    rows = [(0, "image/bmp", bytearray(encode_bmp24(img)), (4, 4, 0, 0))]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    out = resize_images(media, out_h=2, out_w=2).collect()
    assert len(out) == 1
    # full MEDIA_SCHEMA meta shape: width/height rewritten, rest carried
    assert out[0]["meta"]["height"] == 2 and out[0]["meta"]["width"] == 2
    assert out[0]["meta"]["sample_rate"] == 0 and out[0]["meta"]["n_frames"] == 0
    small = decode_bmp24(bytes(out[0]["payload"]))
    assert small.shape == (2, 2, 3)
    for (bi, bj), v in colors.items():
        assert int(small[bi, bj, 0]) == v
    # upsample back: every pixel must come from the block palette
    big = resize_images(
        spark.createDataFrame(
            [(1, "image/bmp", bytearray(out[0]["payload"]), (2, 2, 0, 0))],
            media.schema,
        ),
        out_h=6, out_w=6,
    ).collect()
    up = decode_bmp24(bytes(big[0]["payload"]))
    assert up.shape == (6, 6, 3)
    assert set(np.unique(up)) <= {10, 60, 110, 210}
    # an image format with no codec -> declared NotImplementedError
    tif = spark.createDataFrame(
        [(2, "image/tiff", bytearray(b"xx"), (1, 1, 0, 0))], media.schema
    )
    with pytest.raises(Exception, match="no image codec|NotImplemented"):
        resize_images(tif, out_h=2, out_w=2).collect()


def _png_forward_filter(img, ftype):
    """Spec forward-filtering (the encoder side of filters 1-4) to exercise
    the decoder's unfiltering paths."""
    import struct as _s
    import zlib as _z

    h, w, c = img.shape
    stride = w * c
    arr = img.reshape(h, stride).astype(int)
    raw = b""
    prev = np.zeros(stride, dtype=int)
    for y in range(h):
        cur = arr[y]
        enc = np.zeros(stride, dtype=int)
        for i in range(stride):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # paeth
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(enc.tolist())
        prev = cur

    def chunk(tag, data):
        return _s.pack(">I", len(data)) + tag + data + _s.pack(
            ">I", _z.crc32(tag + data) & 0xFFFFFFFF
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b""))


def test_png_roundtrip_rgb_rgba():
    from combblas_spark.functions.codecs import encode_png, decode_png, png_features

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    f = png_features(encode_png(rgb), dim=12)
    assert f.shape == (12,)
    assert f.mean() == pytest.approx(rgb.mean() / 255.0, abs=0.15)


def test_png_decoder_handles_all_filters():
    from combblas_spark.functions.codecs import decode_png

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for ftype in (1, 2, 3, 4):
        assert np.array_equal(decode_png(_png_forward_filter(img, ftype)), img), ftype


def test_png_declared_subset():
    import struct as _s
    import zlib as _z
    from combblas_spark.functions.codecs import decode_png

    def chunk(tag, data):
        return _s.pack(">I", len(data)) + tag + data + _s.pack(
            ">I", _z.crc32(tag + data) & 0xFFFFFFFF
        )

    ihdr16 = _s.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)  # 16-bit depth
    payload = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_resize_images_real_png(spark):
    from combblas_spark.functions.codecs import encode_png, decode_png
    from combblas_spark.functions.multimodal import resize_images

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 10
    img[:2, 2:] = 60
    img[2:, :2] = 110
    img[2:, 2:] = 210
    media = spark.createDataFrame(
        [(0, "image/png", bytearray(encode_png(img)), (4, 4, 0, 0))],
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    out = resize_images(media, out_h=2, out_w=2).collect()
    small = decode_png(bytes(out[0]["payload"]))
    assert small.shape == (2, 2, 3)
    assert [int(small[i, j, 0]) for i in range(2) for j in range(2)] == [10, 60, 110, 210]


def test_resize_images_real_jpeg(spark):
    """Real resize through the from-scratch JPEG codec: lossy, so assert
    block colors within JPEG tolerance rather than exact pixels."""
    from combblas_spark.functions.jpeg import encode_jpeg, decode_jpeg
    from combblas_spark.functions.multimodal import resize_images

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = 40
    img[:8, 8:] = 90
    img[8:, :8] = 140
    img[8:, 8:] = 220
    media = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(encode_jpeg(img, quality=90)), (16, 16, 0, 0))],
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    out = resize_images(media, out_h=8, out_w=8).collect()
    assert len(out) == 1
    assert out[0]["meta"]["height"] == 8 and out[0]["meta"]["width"] == 8
    small = decode_jpeg(bytes(out[0]["payload"]))
    assert small.shape == (8, 8, 3)
    for (bi, bj), v in {(1, 1): 40, (1, 6): 90, (6, 1): 140, (6, 6): 220}.items():
        assert abs(int(small[bi, bj, 0]) - v) <= 12


def test_extract_features_real_jpeg(spark):
    from combblas_spark.functions.jpeg import encode_jpeg
    from combblas_spark.functions.multimodal import extract_features

    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(encode_jpeg(img, quality=90)), (16, 16, 0, 0))],
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    got = extract_features(media, dim=6).collect()
    assert len(got) == 1
    assert got[0]["feature"][0] == pytest.approx(128 / 255.0, abs=0.02)
