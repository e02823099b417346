"""Real pure-numpy media codecs for uncompressed container formats.

No external decode libraries exist in this environment, but WAV/PCM audio
and 24-bit BMP images are plain headers + raw sample/pixel planes — numpy
decodes them exactly. These register in the codec registry that
``multimodal.extract_features`` dispatches on, upgrading the media path
from "stub" to "real codec for uncompressed formats; compressed formats
(png/jpeg/mp3/mp4) remain declared stubs".

Both encoders exist too, so tests round-trip: synth -> encode -> decode ->
features, all deterministic.
"""

from __future__ import annotations

import struct

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


#: modality -> featurizer(payload, dim). Compressed formats are ABSENT on
#: purpose: requesting them raises the declared NotImplementedError in
#: multimodal.extract_features.
CODECS = {
    "audio/wav": wav_features,
    "image/bmp": bmp_features,
}
