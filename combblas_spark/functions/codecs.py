"""Real pure-numpy/stdlib media codecs.

No external decode libraries exist in this environment, but WAV/PCM audio
and 24-bit BMP images are plain headers + raw sample/pixel planes — numpy
decodes them exactly — PNG needs only stdlib ``zlib`` (a from-scratch
reader handles 8-bit RGB/RGBA with all five scanline filters), and
baseline JPEG is decoded by the from-scratch Huffman + dequant + IDCT
pipeline in functions/jpeg.py. These register in the codec registry that
``multimodal.extract_features`` dispatches on; the remaining compressed
formats (mp3/mp4) genuinely need audio/video codec libraries and stay
declared stubs.

Encoders exist for every decoder, so tests round-trip: synth -> encode ->
decode -> features, all deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ----------------------------------------------------------------- WAV / PCM

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono PCM16 WAV from float samples in [-1, 1]."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (float64 samples in [-1, 1], sample_rate). PCM16 only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)  # downmix
    return pcm, rate


# ----------------------------------------------------------------- BMP 24bit

def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (bottom-up rows)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    pad = row_len - w * 3
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return hdr + dib + rows


def decode_bmp24(payload: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 RGB. Uncompressed 24-bit BMPs only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (bpp={bpp}, comp={comp})")
    row_len = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_len, offset=off)
    img = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return img[::-1] if flip else img


# ----------------------------------------------------------------------- PNG

def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> PNG (8-bit RGB/RGBA, filter-0 rows, one IDAT,
    stdlib zlib). Minimal but spec-valid."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    color_type = {3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """-> (h, w, 3|4) uint8. From-scratch PNG reader: 8-bit depth, color
    types 2 (RGB) / 6 (RGBA), no interlace, ALL five scanline filters
    (None/Sub/Up/Average/Paeth) unfiltered per the spec. Palette/16-bit/
    interlaced PNGs raise NotImplementedError (declared subset)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, w, h, ct = 8, b"", None, None, None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ct not in (2, 6) or inter or comp or filt:
                raise NotImplementedError(
                    f"PNG subset is 8-bit RGB/RGBA non-interlaced "
                    f"(depth={depth}, color_type={ct}, interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    nch = 3 if ct == 2 else 4
    stride = w * nch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: per-channel cumsum mod 256 — fully vectorized
            cur = (
                np.cumsum(cur.reshape(-1, nch), axis=0, dtype=np.int64)
                .reshape(-1) & 0xFF
            ).astype(np.int32)
        elif f == 2:  # Up: + above — fully vectorized
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average: left-dependent in x; loop pixels, vector channels
            px2 = cur.reshape(-1, nch)
            pr2 = prev.reshape(-1, nch)
            left = np.zeros(nch, dtype=np.int32)
            for x in range(px2.shape[0]):
                left = (px2[x] + ((left + pr2[x]) >> 1)) & 0xFF
                px2[x] = left
            cur = px2.reshape(-1)
        elif f == 4:  # Paeth: left-dependent in x; loop pixels, vector channels
            px2 = cur.reshape(-1, nch)
            pr2 = prev.reshape(-1, nch)
            a = np.zeros(nch, dtype=np.int32)
            c = np.zeros(nch, dtype=np.int32)
            for x in range(px2.shape[0]):
                b = pr2[x]
                pa, pb, pc = np.abs(b - c), np.abs(a - c), np.abs(a + b - 2 * c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                a = (px2[x] + pred) & 0xFF
                px2[x] = a
                c = b
            cur = px2.reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {f}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, nch)


# ------------------------------------------------------------------ features

def wav_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic audio features: energy per time slice (a real decode
    feeding a real, if simple, featurizer)."""
    pcm, _ = decode_wav_pcm16(payload)
    if len(pcm) == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(pcm, dim)
    return np.array([float(np.sqrt(np.mean(c * c))) if len(c) else 0.0 for c in chunks],
                    dtype=np.float32)


def bmp_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic image features: per-channel means over a grid."""
    img = decode_bmp24(payload).astype(np.float64) / 255.0
    g = max(1, int(np.sqrt(dim / 3)))
    h, w, _ = img.shape
    out = []
    for r in range(g):
        for c in range(g):
            cell = img[r * h // g: (r + 1) * h // g or h, c * w // g: (c + 1) * w // g or w]
            out.extend(cell.reshape(-1, 3).mean(axis=0) if cell.size else (0.0, 0.0, 0.0))
    v = np.asarray(out, dtype=np.float32)
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    return v[:dim]


def png_features(payload: bytes, dim: int) -> np.ndarray:
    """Same grid-mean featurizer as BMP, through the real PNG decode
    (alpha dropped so RGB/RGBA featurize identically)."""
    img = decode_png(payload)[:, :, :3].astype(np.float64) / 255.0
    g = max(1, int(np.sqrt(dim / 3)))
    h, w, _ = img.shape
    out = []
    for r in range(g):
        for c in range(g):
            cell = img[r * h // g: (r + 1) * h // g or h, c * w // g: (c + 1) * w // g or w]
            out.extend(cell.reshape(-1, 3).mean(axis=0) if cell.size else (0.0, 0.0, 0.0))
    v = np.asarray(out, dtype=np.float32)
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    return v[:dim]


from combblas_spark.functions.jpeg import jpeg_features  # noqa: E402

#: modality -> featurizer(payload, dim). mp3/mp4 are ABSENT on purpose
#: (they genuinely need audio/video codec libraries this environment
#: lacks): requesting them raises the declared NotImplementedError in
#: multimodal.extract_features. JPEG decodes for REAL via the from-scratch
#: baseline decoder in functions/jpeg.py (Huffman + dequant + IDCT, pure
#: numpy + stdlib).
CODECS = {
    "audio/wav": wav_features,
    "image/bmp": bmp_features,
    "image/png": png_features,
    "image/jpeg": jpeg_features,
}
