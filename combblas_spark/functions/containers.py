"""Real MP4/MP3 CONTAINER parsing (pure stdlib — no codec libraries).

The audio/video bitstream decode inside mp3/mp4 genuinely needs codec
libraries this environment lacks and stays a declared stub. (Unlike
baseline JPEG — functions/jpeg.py, whose tables are small canonical spec
data — MP3 Layer III decode depends on ~34 raw Huffman code tables plus
the 512-coefficient synthesis window from ISO 11172-3 Annexes that are
TABLE data, not formulas: with no authoritative copy and no reference
decoder in this sandbox, a from-memory transcription could not be
verified and a silently-wrong decoder is strictly worse than an honest
boundary. H.264 inside MP4 is out of scope outright.) But the
CONTAINERS are plain structured metadata a data pipeline must read at
scale (how long is this clip? how many frames? where do the sample bytes
live?), and parsing them needs nothing beyond ``struct``:

* MP4 / ISO BMFF: box tree walk (moov > trak > mdia/tkhd/mdhd > minf >
  stbl), extracting per-track handler, duration, width/height, and the
  full video sample table (stsz x stsc x stco/co64 -> per-frame
  (offset, size) byte ranges). That upgrades ``multimodal.frame_sample``
  from metadata-level indices to REAL byte ranges into the payload.
* MP3: MPEG-1/2 Layer III frame-header scan (sync walk honoring per-frame
  lengths), yielding frame count, duration, sample rate and mean bitrate.

Tests construct minimal spec-valid containers by hand (same strategy as
the PNG forward-filter and spliced-JPEG fixtures).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

# ------------------------------------------------------------------ MP4


def _boxes(data: bytes, start: int, end: int) -> Iterator[tuple[str, int, int]]:
    """Yield (type, payload_start, payload_end) of top-level boxes in
    data[start:end]; handles 64-bit largesize."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8].decode("latin1")
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr:
            raise ValueError(f"bad box size {size} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: str) -> Optional[tuple[int, int]]:
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _full_box(data: bytes, s: int) -> tuple[int, int]:
    """(version, flags) of a full box whose payload starts at s."""
    v = data[s]
    fl = int.from_bytes(data[s + 1: s + 4], "big")
    return v, fl


def parse_mp4_meta(payload: bytes) -> dict:
    """-> {brand, timescale, duration_s, tracks: [{handler, width, height,
    n_samples, duration_s}]}. Raises ValueError on a non-BMFF payload."""
    ft = _find(payload, 0, len(payload), "ftyp")
    if ft is None:
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    brand = payload[ft[0]: ft[0] + 4].decode("latin1")
    moov = _find(payload, 0, len(payload), "moov")
    if moov is None:
        raise ValueError("missing moov box")
    out = {"brand": brand, "timescale": None, "duration_s": None, "tracks": []}
    mvhd = _find(payload, *moov, "mvhd")
    if mvhd is not None:
        v, _ = _full_box(payload, mvhd[0])
        if v == 1:
            ts, dur = struct.unpack_from(">IQ", payload, mvhd[0] + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", payload, mvhd[0] + 4 + 8)
        out["timescale"], out["duration_s"] = ts, dur / ts if ts else None
    for t, s, e in _boxes(payload, *moov):
        if t != "trak":
            continue
        trk: dict = {"handler": None, "width": None, "height": None,
                     "n_samples": None, "duration_s": None}
        tkhd = _find(payload, s, e, "tkhd")
        if tkhd is not None:
            v, _ = _full_box(payload, tkhd[0])
            base = tkhd[0] + 4 + (32 if v == 1 else 20)
            # ... reserved(8) layer(2) altgroup(2) volume(2) reserved(2)
            # matrix(36) width(4 16.16) height(4 16.16)
            wh = base + 16 + 36
            w16, h16 = struct.unpack_from(">II", payload, wh)
            trk["width"], trk["height"] = w16 >> 16, h16 >> 16
        mdia = _find(payload, s, e, "mdia")
        if mdia is None:
            continue
        mdhd = _find(payload, *mdia, "mdhd")
        if mdhd is not None:
            v, _ = _full_box(payload, mdhd[0])
            if v == 1:
                ts, dur = struct.unpack_from(">IQ", payload, mdhd[0] + 4 + 16)
            else:
                ts, dur = struct.unpack_from(">II", payload, mdhd[0] + 4 + 8)
            trk["duration_s"] = dur / ts if ts else None
        hdlr = _find(payload, *mdia, "hdlr")
        if hdlr is not None:
            trk["handler"] = payload[hdlr[0] + 8: hdlr[0] + 12].decode("latin1")
        minf = _find(payload, *mdia, "minf")
        stbl = _find(payload, *minf, "stbl") if minf else None
        if stbl is not None:
            stsz = _find(payload, *stbl, "stsz")
            if stsz is not None:
                _, cnt = struct.unpack_from(">II", payload, stsz[0] + 4)
                trk["n_samples"] = cnt
        out["tracks"].append(trk)
    return out


def mp4_sample_ranges(payload: bytes, handler: str = "vide") -> list[tuple[int, int]]:
    """Per-sample (offset, size) byte ranges of the first track with the
    given handler — the stsz x stsc x stco/co64 resolution. This is what a
    frame-sampling pipeline actually needs: byte ranges to hand to a
    (stubbed) frame decoder without touching the rest of the payload."""
    moov = _find(payload, 0, len(payload), "moov")
    if moov is None:
        raise ValueError("missing moov box")
    for t, s, e in _boxes(payload, *moov):
        if t != "trak":
            continue
        mdia = _find(payload, s, e, "mdia")
        hdlr = _find(payload, *mdia, "hdlr") if mdia else None
        if hdlr is None or payload[hdlr[0] + 8: hdlr[0] + 12].decode("latin1") != handler:
            continue
        # every required box must exist — raise the documented ValueError on
        # malformed payloads (media_metadata catches it and yields nulls)
        # rather than a TypeError that would fail the whole executor batch.
        minf = _find(payload, *mdia, "minf")
        if minf is None:
            raise ValueError("missing minf box")
        stbl = _find(payload, *minf, "stbl")
        if stbl is None:
            raise ValueError("missing stbl box")
        # sample sizes
        stsz = _find(payload, *stbl, "stsz")
        if stsz is None:
            raise ValueError("missing stsz box")
        fixed, cnt = struct.unpack_from(">II", payload, stsz[0] + 4)
        if fixed:
            sizes = [fixed] * cnt
        else:
            sizes = list(struct.unpack_from(f">{cnt}I", payload, stsz[0] + 12))
        # chunk offsets
        stco = _find(payload, *stbl, "stco")
        if stco is not None:
            (nch,) = struct.unpack_from(">I", payload, stco[0] + 4)
            offs = list(struct.unpack_from(f">{nch}I", payload, stco[0] + 8))
        else:
            co64 = _find(payload, *stbl, "co64")
            if co64 is None:
                raise ValueError("missing stco/co64 box")
            (nch,) = struct.unpack_from(">I", payload, co64[0] + 4)
            offs = list(struct.unpack_from(f">{nch}Q", payload, co64[0] + 8))
        # samples-per-chunk runs
        stsc = _find(payload, *stbl, "stsc")
        if stsc is None:
            raise ValueError("missing stsc box")
        (nruns,) = struct.unpack_from(">I", payload, stsc[0] + 4)
        runs = [
            struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)[:2]
            for i in range(nruns)
        ]  # (first_chunk 1-based, samples_per_chunk)
        ranges: list[tuple[int, int]] = []
        si = 0
        for ci in range(len(offs)):
            spc = 0
            for first, n in runs:
                if ci + 1 >= first:
                    spc = n
            pos = offs[ci]
            for _ in range(spc):
                if si >= cnt:
                    break
                ranges.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
        return ranges
    raise ValueError(f"no track with handler {handler!r}")


# ------------------------------------------------------------------ MP3

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def parse_mp3_meta(payload: bytes) -> dict:
    """Frame-header walk (sync 0xFFE, MPEG-1/2/2.5 Layer III) -> {n_frames,
    duration_s, sample_rate, mean_bitrate_kbps}. Skips an ID3v2 prefix."""
    pos = 0
    if payload[:3] == b"ID3":
        size = (
            (payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F)
        )
        pos = 10 + size
    n = 0
    total_kbps = 0
    rate = None
    dur = 0.0
    while pos + 4 <= len(payload):
        b0, b1, b2, _ = payload[pos: pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1  # resync
            continue
        ver = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 3  # 1 = Layer III
        if ver == 1 or layer != 1:
            pos += 1
            continue
        bri = (b2 >> 4) & 15
        sri = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if bri in (0, 15) or sri == 3:
            pos += 1
            continue
        kbps = (_MP3_BITRATE_V1L3 if ver == 3 else _MP3_BITRATE_V2L3)[bri]
        rate = _MP3_RATES[ver][sri]
        spf = 1152 if ver == 3 else 576  # samples per frame, Layer III
        flen = (spf // 8) * kbps * 1000 // rate + pad
        if flen <= 4 or pos + flen > len(payload):
            break
        n += 1
        total_kbps += kbps
        dur += spf / rate
        pos += flen
    if n == 0:
        raise ValueError("no MP3 frames found")
    return {
        "n_frames": n,
        "duration_s": dur,
        "sample_rate": rate,
        "mean_bitrate_kbps": total_kbps / n,
    }
