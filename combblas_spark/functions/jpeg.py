"""From-scratch baseline JPEG codec (pure numpy + stdlib — no libraries).

Same spirit as the PNG codec in codecs.py: the reference treats media as
opaque payloads; decode here exists to prove the Spark-side multimodal
plumbing runs REAL pixel work end-to-end. Declared subset:

* decoder: baseline sequential DCT (SOF0), 8-bit, 1 (grayscale) or 3
  (YCbCr) components, sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
  restart markers honored. Progressive (SOF2), arithmetic coding, 12-bit
  and CMYK raise NotImplementedError.
* encoder: baseline 4:4:4 (or grayscale), quality-scaled Annex-K-style
  quantization tables. Huffman tables are generated canonically (all DC
  symbols at 4 bits, all AC symbols at 8 bits) and written to the DHT
  segments — spec-valid, if not size-optimal, and the decoder reads
  whatever DHT/DQT the stream carries, so the two sides share no hidden
  state.

Entropy decode is per-bit Python (inherently sequential); the block
transforms (dequantize, IDCT, color convert) are vectorized numpy over all
blocks at once. Fine for the mapInPandas demonstration path, not a codec
library.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex-K-style base quantization tables (natural order).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """8x8 DCT-II basis A: F = A @ spatial @ A.T, spatial = A.T @ F @ A."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_basis()


def idct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) frequency -> spatial, vectorized over all blocks."""
    return np.einsum("ux,nuv,vy->nxy", _A, blocks, _A)


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> frequency, vectorized over all blocks."""
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)


# ---------------------------------------------------------------- bit I/O


class _BitReader:
    """MSB-first reader over an entropy-coded segment with 0xFF00 byte
    stuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffing marker is hit

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # pad with zeros past the end (spec: decoder may read
                # padding bits after the final EOB)
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via expect_rst()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_rst(self):
        """Consume a pending RSTn marker and realign to a byte boundary."""
        self.bits = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _extend(v: int, s: int) -> int:
    """JPEG F.12 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Huff:
    """Canonical Huffman decode table from DHT (counts[16] + symbols)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 RGB (grayscale replicated to 3 channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id)
    comps = None  # [(cid, h, v, tq)]
    h = w = None
    restart_interval = 0
    scan = None

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # spec-legal 0xFF fill bytes may pad before any marker (T.81 B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RSTn: no length field
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError(f"truncated marker segment at {pos}")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4: pos + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # DQT stores zigzag order
                qt[tq] = nat
                p += 65
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                huff[(tc, th)] = _Huff(counts, seg[p + 17: p + 17 + n])
                p += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(f"sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker {m:#x})")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tda >> 4, tda & 15))
            pos = pos + 2 + ln
            break
        pos += 2 + ln

    if comps is None or scan is None:
        raise ValueError("missing SOF0/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient block grids
    grids = {}
    for cid, hs, vs, tq in comps:
        bw, bh = mcux * hs, mcuy * vs
        grids[cid] = np.zeros((bh * bw, 8, 8), dtype=np.float64)

    br = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    scan_by_cid = {c[0]: c for c in scan}
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            br.expect_rst()
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mi, mcux)
        for cid, hs, vs, tq in comps:
            _, td, ta = scan_by_cid[cid]
            dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
            q = qt[tq]
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, dtype=np.int64)
                    s = dc_t.decode(br)
                    pred[cid] += _extend(br.read_bits(s), s)
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[ZIGZAG[k]] = _extend(br.read_bits(sz), sz)
                        k += 1
                    dq = (coef * q).reshape(8, 8).astype(np.float64)
                    bw = mcux * hs
                    grids[cid][(my * vs + by) * bw + (mx * hs + bx)] = dq

    # vectorized IDCT + reassemble planes
    planes = {}
    for cid, hs, vs, tq in comps:
        bw, bh = mcux * hs, mcuy * vs
        sp = idct2_blocks(grids[cid]) + 128.0
        plane = (
            sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU canvas by sample replication
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        y = np.clip(planes[comps[0][0]], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    ids = [c[0] for c in comps]
    y, cb, cr = planes[ids[0]], planes[ids[1]] - 128.0, planes[ids[2]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the base tables (natural order)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QT_LUMA * s + 50) // 100, 1, 255)
    qc = np.clip((QT_CHROMA * s + 50) // 100, 1, 255)
    return ql, qc


# fixed canonical Huffman: 12 DC symbols at 4 bits, 162 AC symbols at 8 bits
_DC_SYMS = bytes(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = bytes(
    sorted({(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0})
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _canonical_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bits = 0
        self.nbits = 0

    def write(self, length: int, code: int):
        self.bits = (self.bits << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bits >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.bits &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(8 - self.nbits, (1 << (8 - self.nbits)) - 1)  # 1-pad


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n, 8, 8), H/W already multiples of 8, row-major blocks."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) -> baseline 4:4:4 JPEG."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    ql, qc = _quality_tables(quality)
    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMS)

    # pad to multiples of 8 by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = ((0, ph - h), (0, pw - w)) if gray else ((0, ph - h), (0, pw - w), (0, 0))
    px = np.pad(px, pad, mode="edge").astype(np.float64)

    if gray:
        planes = [(px - 128.0, ql)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [(y - 128.0, ql), (cb, qc), (cr, qc)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT (zigzag order on the wire)
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(">BBB", i + 1, 0x11, 0 if i == 0 else 1)
    out += seg(0xC0, sof)
    # DHT: table 0 for luma, table 1 for chroma (same codes, distinct slots)
    for th in range(1 if gray else 2):
        out += seg(0xC4, bytes([0x00 | th]) + bytes(_DC_COUNTS) + _DC_SYMS)
        out += seg(0xC4, bytes([0x10 | th]) + bytes(_AC_COUNTS) + _AC_SYMS)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    # interleaved 4:4:4 MCU = one block per component, row-major
    bw_ = _BitWriter()
    comp_blocks = [_blockify(p) for p, _ in planes]
    comp_q = [q for _, q in planes]
    comp_codes = [(dc_codes, ac_codes)] * nc
    # encode MCU-interleaved: requires per-component running DC pred —
    # restructure: encode per MCU index across components
    n_blocks = comp_blocks[0].shape[0]
    freqs = [dct2_blocks(cb_) for cb_ in comp_blocks]
    zzs = [
        np.round(f / q.reshape(8, 8).astype(np.float64)).astype(np.int64)
        .reshape(-1, 64)[:, ZIGZAG]
        for f, q in zip(freqs, comp_q)
    ]
    preds = [0] * nc
    for bi in range(n_blocks):
        for ci in range(nc):
            row = zzs[ci][bi]
            dc_c, ac_c = comp_codes[ci]
            diff = int(row[0]) - preds[ci]
            preds[ci] = int(row[0])
            s = abs(diff).bit_length()
            ln, code = dc_c[s]
            bw_.write(ln, code)
            if s:
                bw_.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
            nz = np.nonzero(row[1:])[0]
            last_nz = int(nz[-1]) + 1 if len(nz) else 0
            run = 0
            for k in range(1, last_nz + 1):
                v = int(row[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_c[0xF0]
                    bw_.write(ln, code)
                    run -= 16
                s = abs(v).bit_length()
                ln, code = ac_c[(run << 4) | s]
                bw_.write(ln, code)
                bw_.write(s, v if v >= 0 else v + (1 << s) - 1)
                run = 0
            if last_nz < 63:
                ln, code = ac_c[0x00]
                bw_.write(ln, code)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_features(payload: bytes, dim: int) -> np.ndarray:
    """Grid-mean featurizer through the real JPEG decode (same shape as
    bmp_features/png_features in codecs.py)."""
    img = decode_jpeg(payload).astype(np.float64) / 255.0
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
