"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schema, Arrow batch shape, mapInPandas signatures,
partitioning by modality) is real and tested. Decode dispatches on the
codec registry (functions/codecs.py): WAV/PCM16 audio, 24-bit BMP, 8-bit
RGB/RGBA PNG and baseline JPEG images decode for REAL (pure numpy +
stdlib — PNG via zlib, JPEG via the from-scratch Huffman/IDCT pipeline in
functions/jpeg.py); the remaining compressed formats (mp3/mp4, which need
audio/video codec libraries) are declared stubs that raise
NotImplementedError, and ``fake=True`` substitutes a deterministic
payload-derived vector for tests that don't care about pixels.

Why the mp3/mp4 bitstreams stay stubs (considered and rejected, round 5):
a spec-exact MP3 Layer-III decoder needs two large blocks of NORMATIVE,
non-derivable table data from ISO/IEC 11172-3 — the Annex B.7 Huffman code
tables (32 tables, ~2000 (value, codeword) entries) and the Table C.1
synthesis-filterbank window (512 coefficients given only as printed
decimals). JPEG was implementable from scratch because its tables are
either formulaic (zigzag order) or tiny and universally reproduced
(Annex-K quant matrices), and Huffman tables ride inside the file itself
(DHT segments); MP3's tables do not ride in the stream and cannot be
derived, and this sandbox has no network to fetch the standard. A
from-memory reconstruction would round-trip against its own encoder while
silently mis-decoding every real-world file — strictly worse than the
honestly-declared NotImplementedError boundary. H.264-in-MP4 is out of
scope outright. The CONTAINER layer (frame boundaries, sample byte
ranges, duration/rate metadata — functions/containers.py) is real,
spec-tested, and is what a 100-TB ingest pipeline needs from Spark; the
inner bitstream decode is exactly the piece you delegate to a codec
library on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, modality string, feature array<float>, n_bytes long"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(32).alias("width"),
            F.lit(32).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("id") % 10 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return df


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature from payload bytes (test stand-in for a
    real decoder+encoder)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction — Arrow-batched, no per-row Python in
    the driver plan; the pandas function vectorizes per batch.

    Dispatch is on the ``modality`` column against codecs.CODECS
    ('audio/wav', 'image/bmp', 'image/png' and 'image/jpeg' decode for
    real); unknown modalities raise
    NotImplementedError at executor time unless ``fake=True``, which
    substitutes the deterministic payload-derived stand-in.
    """
    from combblas_spark.functions.codecs import CODECS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                codec = CODECS.get(modality)
                if codec is not None:
                    feats.append(codec(bytes(payload), dim))
                elif fake:
                    feats.append(_fake_feature(bytes(payload), dim))
                else:
                    raise NotImplementedError(
                        f"no codec for modality {modality!r} (compressed formats "
                        "need libraries not present in this environment)"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    # partition by modality so each decoder gets homogeneous batches
    return media.repartition("modality").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Metadata-level frame sampling plan: one output row per sampled frame
    index (decode of the frame itself is the stubbed step above). For real
    MP4 payloads use ``frame_ranges`` — it reads the container's sample
    table and returns actual byte ranges."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def frame_ranges(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling over video/mp4 rows: parse the ISO-BMFF sample
    table (stsz x stsc x stco, functions/containers.py) inside an
    Arrow-batched mapInPandas and emit one row per sampled frame with its
    exact (offset, size) byte range into the payload — what a frame
    decoder (the declared-stub step) would be handed at scale. Only the
    container METADATA is parsed; no bitstream decode happens."""
    from combblas_spark.functions.containers import mp4_sample_ranges

    def run(batches):
        for pdf in batches:
            ids, idxs, offs, szs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, (off, sz) in enumerate(mp4_sample_ranges(bytes(payload))):
                    if i % every_n:
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    szs.append(sz)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "offset": offs, "size": szs}
            )

    return (
        media.filter(F.col("modality") == "video/mp4")
        .select("media_id", "payload")
        .repartition("media_id")
        .mapInPandas(
            run, schema="media_id long, frame_idx int, offset long, size long"
        )
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Real container metadata extraction: video/mp4 via the BMFF box walk,
    audio/mp3 via the frame-header scan, audio/wav via the PCM decode —
    all pure-stdlib parses (functions/containers.py, codecs.py). Unknown
    modalities yield nulls rather than erroring (metadata extraction is a
    best-effort scan step in a pipeline). Returns (media_id, modality,
    duration_s, sample_rate, n_frames, width, height)."""
    from combblas_spark.functions.codecs import decode_wav_pcm16
    from combblas_spark.functions.containers import parse_mp3_meta, parse_mp4_meta

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                dur = rate = nfr = w = h = None
                try:
                    if modality == "video/mp4":
                        m = parse_mp4_meta(bytes(payload))
                        vids = [t for t in m["tracks"] if t["handler"] == "vide"]
                        if vids:
                            t = vids[0]
                            w, h, nfr = t["width"], t["height"], t["n_samples"]
                            dur = t["duration_s"]
                        else:
                            dur = m["duration_s"]
                    elif modality == "audio/mp3":
                        m = parse_mp3_meta(bytes(payload))
                        dur, rate, nfr = m["duration_s"], m["sample_rate"], m["n_frames"]
                    elif modality == "audio/wav":
                        pcm, rate = decode_wav_pcm16(bytes(payload))
                        dur, nfr = len(pcm) / rate if rate else None, len(pcm)
                except (ValueError, NotImplementedError):
                    pass  # best-effort: unparseable payload -> nulls
                rows.append((mid, modality, dur, rate, nfr, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "modality", "duration_s", "sample_rate",
                    "n_frames", "width", "height",
                ],
            )

    return media.select("media_id", "modality", "payload").repartition(
        "modality"
    ).mapInPandas(
        run,
        schema="media_id long, modality string, duration_s double, "
               "sample_rate int, n_frames int, width int, height int",
    )


def resize_images(
    media: DataFrame, out_h: int, out_w: int, fake: bool = False
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas transform: BMP24,
    PNG (8-bit RGB/RGBA) and baseline JPEG rows decode for REAL
    (pure-numpy/stdlib codecs), nearest-neighbor resample to
    (out_h, out_w), and re-encode in the same format; other image formats
    raise the declared NotImplementedError unless ``fake=True``,
    which passes the payload through with only the metadata rewritten —
    keeping the plumbing (schema, modality partitioning, batch shape)
    testable end-to-end.

    Returns (media_id, modality, payload, meta) with the SAME meta struct
    shape as MEDIA_SCHEMA — width/height rewritten to (out_w, out_h),
    sample_rate/n_frames carried through unchanged — so resized rows feed
    any meta-reading consumer (extract_features, frame_sample) directly.
    """
    from combblas_spark.functions.codecs import (
        decode_bmp24, encode_bmp24, decode_png, encode_png,
    )
    from combblas_spark.functions.jpeg import decode_jpeg, encode_jpeg

    pair = {
        "image/bmp": (decode_bmp24, encode_bmp24),
        "image/png": (decode_png, encode_png),
        "image/jpeg": (decode_jpeg, encode_jpeg),
    }

    def run(batches):
        for pdf in batches:
            out_payloads = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                if modality in pair:
                    dec, enc = pair[modality]
                    px = dec(bytes(payload))
                    ri = np.clip(
                        (np.arange(out_h) * px.shape[0] / out_h).astype(np.int64),
                        0, px.shape[0] - 1,
                    )
                    ci = np.clip(
                        (np.arange(out_w) * px.shape[1] / out_w).astype(np.int64),
                        0, px.shape[1] - 1,
                    )
                    out_payloads.append(enc(px[ri][:, ci]))
                elif fake:
                    out_payloads.append(bytes(payload))
                else:
                    raise NotImplementedError(
                        f"no image codec for modality {modality!r}"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out_payloads,
                    "sample_rate": pdf["sample_rate"],
                    "n_frames": pdf["n_frames"],
                }
            )

    imgs = media.filter(F.col("modality").startswith("image/"))
    return (
        imgs.select(
            "media_id", "modality", "payload",
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        )
        .repartition("modality")
        .mapInPandas(
            run,
            schema="media_id long, modality string, payload binary, "
                   "sample_rate int, n_frames int",
        )
        .select(
            "media_id", "modality", "payload",
            F.struct(
                F.lit(out_w).cast("int").alias("width"),
                F.lit(out_h).cast("int").alias("height"),
                F.col("sample_rate"),
                F.col("n_frames"),
            ).alias("meta"),
        )
    )
