"""MP4/MP3 container parsing (combblas_spark/functions/containers.py) over
hand-built spec-valid fixtures — same strategy as the PNG forward-filter
and spliced-JPEG tests."""

import struct

import numpy as np
import pytest

from combblas_spark.functions.containers import (
    mp4_sample_ranges,
    parse_mp3_meta,
    parse_mp4_meta,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, body: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + body


def build_mp4(frames: list[bytes], w: int = 64, h: int = 48,
              timescale: int = 600, fps: int = 30) -> bytes:
    """Minimal ISO-BMFF file: ftyp + mdat(frames) + moov(one video trak)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # offset of first frame byte in file

    dur = len(frames) * timescale // fps
    mvhd = _box(b"mvhd", _full(0, struct.pack(">II", 0, 0)
                               + struct.pack(">II", timescale, dur)
                               + b"\x00" * 80))
    tkhd = _box(b"tkhd", _full(0, struct.pack(">IIII I", 0, 0, 1, 0, dur)
                               + b"\x00" * 16  # reserved/layer/alt/vol/res
                               + b"\x00" * 36  # matrix
                               + struct.pack(">II", w << 16, h << 16)))
    mdhd = _box(b"mdhd", _full(0, struct.pack(">IIII", 0, 0, timescale, dur)
                               + b"\x00" * 4))
    hdlr = _box(b"hdlr", _full(0, struct.pack(">I", 0) + b"vide"
                               + b"\x00" * 12 + b"video\x00"))
    stsz = _box(b"stsz", _full(0, struct.pack(">II", 0, len(frames))
                               + b"".join(struct.pack(">I", len(f)) for f in frames)))
    # one chunk holding all samples
    stsc = _box(b"stsc", _full(0, struct.pack(">I", 1)
                               + struct.pack(">III", 1, len(frames), 1)))
    stco = _box(b"stco", _full(0, struct.pack(">I", 1)
                               + struct.pack(">I", mdat_data_start)))
    stbl = _box(b"stbl", stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def build_mp3(n_frames: int, bri: int = 9, sri: int = 0) -> bytes:
    """MPEG-1 Layer III frames: 128 kbps (bri=9) @ 44100 Hz (sri=0)."""
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][bri]
    rate = [44100, 48000, 32000][sri]
    flen = 144 * kbps * 1000 // rate
    hdr = bytes([0xFF, 0xFB, (bri << 4) | (sri << 2), 0x00])
    frame = hdr + bytes((flen - 4) % 251 for _ in range(flen - 4))
    return frame * n_frames


def test_mp4_meta():
    frames = [bytes([i]) * (10 + i) for i in range(6)]
    payload = build_mp4(frames, w=64, h=48, fps=30)
    meta = parse_mp4_meta(payload)
    assert meta["brand"] == "isom"
    assert meta["timescale"] == 600
    assert meta["duration_s"] == pytest.approx(6 / 30, abs=1 / 600 + 1e-9)
    [trk] = meta["tracks"]
    assert trk["handler"] == "vide"
    assert (trk["width"], trk["height"]) == (64, 48)
    assert trk["n_samples"] == 6


def test_mp4_sample_ranges_recover_exact_bytes():
    frames = [bytes([i]) * (10 + i) for i in range(6)]
    payload = build_mp4(frames)
    ranges = mp4_sample_ranges(payload, handler="vide")
    assert len(ranges) == 6
    for i, (off, size) in enumerate(ranges):
        assert payload[off: off + size] == frames[i]


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        parse_mp4_meta(b"not a container at all")


def test_mp3_meta():
    payload = build_mp3(40)
    meta = parse_mp3_meta(payload)
    assert meta["n_frames"] == 40
    assert meta["sample_rate"] == 44100
    assert meta["mean_bitrate_kbps"] == pytest.approx(128)
    assert meta["duration_s"] == pytest.approx(40 * 1152 / 44100, rel=1e-9)


def test_mp3_skips_id3_and_junk():
    body = build_mp3(7)
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"\x00" * 10
    meta = parse_mp3_meta(id3 + body)
    assert meta["n_frames"] == 7
    with pytest.raises(ValueError):
        parse_mp3_meta(b"\x00" * 100)


def test_frame_ranges_spark(spark):
    """Spark-side real frame sampling: byte ranges recover the exact frame
    payloads from the MP4."""
    from combblas_spark.functions.multimodal import frame_ranges

    frames = [bytes([i]) * (20 + i) for i in range(5)]
    payload = build_mp4(frames)
    media = spark.createDataFrame(
        [(7, "video/mp4", bytearray(payload), (64, 48, 0, 5))],
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    got = sorted(
        (r["frame_idx"], r["offset"], r["size"])
        for r in frame_ranges(media, every_n=2).collect()
    )
    assert [g[0] for g in got] == [0, 2, 4]
    for idx, off, size in got:
        assert payload[off: off + size] == frames[idx]


def test_media_metadata_spark(spark):
    from combblas_spark.functions.codecs import encode_wav_pcm16
    from combblas_spark.functions.multimodal import media_metadata

    mp4 = build_mp4([b"x" * 9] * 12, w=32, h=16, fps=30)
    mp3 = build_mp3(25)
    wav = encode_wav_pcm16(np.zeros(8000), 16_000)
    media = spark.createDataFrame(
        [
            (0, "video/mp4", bytearray(mp4), (0, 0, 0, 0)),
            (1, "audio/mp3", bytearray(mp3), (0, 0, 0, 0)),
            (2, "audio/wav", bytearray(wav), (0, 0, 0, 0)),
            (3, "image/bmp", bytearray(b"junk"), (0, 0, 0, 0)),
        ],
        "media_id long, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    got = {r["media_id"]: r for r in media_metadata(media).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["n_frames"]) == (32, 16, 12)
    assert got[0]["duration_s"] == pytest.approx(12 / 30, abs=1 / 600 + 1e-9)
    assert got[1]["n_frames"] == 25 and got[1]["sample_rate"] == 44100
    assert got[2]["sample_rate"] == 16000 and got[2]["n_frames"] == 8000
    assert got[2]["duration_s"] == pytest.approx(0.5)
    assert got[3]["duration_s"] is None  # best-effort nulls, no error


def test_mp4_sample_ranges_missing_boxes_raise_valueerror():
    """Tracks missing minf/stbl/stsz/stsc/stco must raise the documented
    ValueError (caught by media_metadata -> nulls), never TypeError
    (ADVICE r4)."""
    import pytest

    # a moov with a vide trak whose mdia has hdlr but NO minf
    hdlr = _box(b"hdlr", _full(0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12))
    mdia = _box(b"mdia", hdlr)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    payload = _box(b"ftyp", b"isom" + struct.pack(">I", 512)) + moov
    with pytest.raises(ValueError, match="missing minf"):
        mp4_sample_ranges(payload, handler="vide")
