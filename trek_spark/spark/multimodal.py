"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing (schemas, partitioning, Arrow batch
shapes, UDF signatures) is real and tested.

Codec status (this container ships no image/audio libraries):

* **Container-header decode is REAL** — ``decode_headers`` parses
  PNG/JPEG/GIF/BMP signatures for dimensions and RIFF/WAVE headers for
  audio duration with nothing but ``struct`` (these are fixed binary
  layouts, no codec needed). The synthetic media corpus emits genuine
  BMP/WAV payloads so this path is exercised end-to-end.
* **Pixel/sample-level steps remain STUBS** (resize, frame-sample,
  feature-extract over compressed codecs): each raises
  ``NotImplementedError`` in strict mode or produces a deterministic fake
  derived from the payload hash, so the pipeline shape stays testable.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType()),      # image|audio|video
    StructField("mime", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("content_hash", StringType()),
    StructField("width", IntegerType()),          # decoded metadata (stubbed)
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = ArrayType(FloatType())

_STRICT = False  # flip for production: stubs raise instead of faking


def _codec_unavailable(op: str):
    raise NotImplementedError(
        f"multimodal codec step '{op}' requires image/audio libraries not "
        "present in this environment; plug a decoder into decode_stub()")


def decode_headers(payload: bytes) -> dict | None:
    """REAL stdlib-only container-header decode.

    Recognizes PNG / JPEG / GIF / BMP (dimensions) and RIFF/WAVE (duration)
    from their fixed binary layouts. Returns ``{mime, width, height,
    duration_ms}`` or ``None`` for unrecognized bytes (compressed video
    etc. — those stay on the stub path)."""
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return {"mime": "image/png", "width": w, "height": h,
                "duration_ms": None}
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"mime": "image/gif", "width": w, "height": h,
                "duration_ms": None}
    if n >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return {"mime": "image/bmp", "width": w, "height": abs(h),
                "duration_ms": None}
    if n >= 4 and payload[:2] == b"\xff\xd8":
        # JPEG: scan segments for a SOF marker (C0-CF minus C4/C8/CC)
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return {"mime": "image/jpeg", "width": w, "height": h,
                        "duration_ms": None}
            i += 2 + seg_len
        return None
    if n >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk chunks for fmt (byte rate) and data (payload size)
        byte_rate = None
        data_size = None
        i = 12
        while i + 8 <= n:
            cid = payload[i:i + 4]
            size = struct.unpack("<I", payload[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 16 <= n:
                byte_rate = struct.unpack("<I", payload[i + 16:i + 20])[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)
        if byte_rate and data_size is not None:
            return {"mime": "audio/wav", "width": None, "height": None,
                    "duration_ms": int(data_size * 1000 / byte_rate)}
        return None
    return None


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the content hash
    (stable across runs/executors — usable in tests)."""
    h = hashlib.sha256(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    dur = int.from_bytes(h[2:4], "big")
    return w, ht, dur


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Decode → metadata. REAL header parse first (PNG/JPEG/GIF/BMP/WAV);
    unrecognized payloads fall back to the stub (raise in strict mode,
    deterministic fake otherwise)."""
    real = decode_headers(payload)
    if real is not None:
        return {
            "media_type": media_type,
            "mime": real["mime"],
            "n_bytes": len(payload),
            "content_hash": hashlib.md5(payload).hexdigest()[:16],
            "width": real["width"],
            "height": real["height"],
            "duration_ms": real["duration_ms"],
        }
    if _STRICT:
        _codec_unavailable("decode")
    w, h, dur = _fake_dims(payload)
    return {
        "media_type": media_type,
        "mime": {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}.get(media_type, "application/octet-stream"),
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest()[:16],
        "width": w if media_type in ("image", "video") else None,
        "height": h if media_type in ("image", "video") else None,
        "duration_ms": dur if media_type in ("audio", "video") else None,
    }


def feature_stub(payload: bytes, dim: int = 16) -> list[float]:
    """STUB feature extraction → unit-norm vector from the payload hash."""
    if _STRICT:
        _codec_unavailable("feature-extract")
    h = hashlib.sha256(payload).digest()
    vals = [struct.unpack(">h", h[2 * i: 2 * i + 2])[0] / 32768.0
            for i in range(dim)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize → bytes. Real impl: PIL/libvips behind this signature.
    The deterministic fake re-headers the payload as a BMP of the target
    size so downstream header-decode sees the new dimensions (exercises
    the full decode→resize→re-decode loop without a codec)."""
    if _STRICT:
        _codec_unavailable("resize")
    return synth_bmp(target_w, target_h,
                     hashlib.sha256(payload).digest())


def frame_sample_stub(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """STUB video frame sampling → n_frames image payloads. Real impl:
    libav keyframe extraction. The fake derives per-frame BMPs from the
    payload hash chain (deterministic, header-decodable)."""
    if _STRICT:
        _codec_unavailable("frame-sample")
    frames = []
    h = hashlib.sha256(payload).digest()
    for i in range(n_frames):
        h = hashlib.sha256(h + bytes([i])).digest()
        w = 64 + h[0] % 64
        ht = 64 + h[1] % 64
        frames.append(synth_bmp(w, ht, h))
    return frames


def resize_images(df: DataFrame, target_w: int = 224,
                  target_h: int = 224) -> DataFrame:
    """df(media_id, payload, media_type) → + resized binary column.
    Arrow-batched; binary in, binary out — the standard pre-processing
    stage shape for a vision training pipeline."""
    cols = [f"{c} {dict(df.dtypes)[c]}" for c in df.columns]

    def worker(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                resize_stub(p if isinstance(p, (bytes, bytearray)) else b"",
                            target_w, target_h)
                if mt == "image" else None
                for p, mt in zip(pdf["payload"], pdf["media_type"])]
            out = pdf.reset_index(drop=True)
            out["resized"] = resized
            yield out

    return df.mapInPandas(worker, schema=", ".join(cols + ["resized binary"]))


def sample_video_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """df(media_id, payload, media_type) → exploded (media_id, frame_idx,
    frame: binary) rows for video payloads. One row in, n rows out — the
    mapInPandas shape for frame-level training data."""

    def worker(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p, mt in zip(pdf["media_id"], pdf["payload"],
                                  pdf["media_type"]):
                if mt != "video":
                    continue
                fs = frame_sample_stub(
                    p if isinstance(p, (bytes, bytearray)) else b"",
                    n_frames)
                for i, fr in enumerate(fs):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": pd.Series(frames, dtype=object)})

    return df.mapInPandas(
        worker, schema="media_id long, frame_idx int, frame binary")


def decode_map_in_pandas(iterator: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (id, payload, media_type) → + meta struct columns.
    Arrow moves the binary column zero-copy; the per-batch loop is the
    codec boundary."""
    for pdf in iterator:
        metas = [decode_stub(p if isinstance(p, (bytes, bytearray)) else b"",
                             mt or "image")
                 for p, mt in zip(pdf["payload"], pdf["media_type"])]
        meta_df = pd.DataFrame(metas)
        out = pd.concat([pdf.reset_index(drop=True), meta_df], axis=1)
        yield out


def attach_media_meta(df: DataFrame) -> DataFrame:
    """df(id, payload: binary, media_type) → + decoded metadata columns.

    JVM-side cheap fields (n_bytes, content_hash) are computed with built-in
    functions; only the decode itself crosses into Python.
    """
    cols = [f"{c} {dict(df.dtypes)[c]}" for c in df.columns]
    meta_cols = ["media_type_meta string", "mime string", "n_bytes int",
                 "content_hash string", "width int", "height int",
                 "duration_ms int"]

    def worker(it):
        for pdf in it:
            metas = [decode_stub(p if isinstance(p, (bytes, bytearray)) else b"",
                                 mt or "image")
                     for p, mt in zip(pdf["payload"], pdf["media_type"])]
            meta_df = pd.DataFrame(metas).rename(
                columns={"media_type": "media_type_meta"})
            yield pd.concat([pdf.reset_index(drop=True), meta_df], axis=1)

    return df.mapInPandas(worker, schema=", ".join(cols + meta_cols))


def synth_bmp(width: int, height: int, body: bytes) -> bytes:
    """Genuine BMP header (BITMAPINFOHEADER) wrapping arbitrary body bytes
    — valid for header-level decode (the only level this module decodes)."""
    header_size = 54
    size = header_size + len(body)
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, header_size)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(body), 2835, 2835, 0, 0)
            + body)


def synth_wav(duration_ms: int, byte_rate: int = 16000) -> bytes:
    """Genuine RIFF/WAVE header with a data chunk sized for duration_ms."""
    data_size = int(byte_rate * duration_ms / 1000)
    fmt = struct.pack("<HHIIHH", 1, 1, byte_rate, byte_rate, 1, 8)
    data = b"\x00" * data_size
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", data_size) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body) - 4) + body


def media_corpus_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table (no external data): doc text
    becomes the payload body, wrapped in GENUINE container headers so the
    real header decoder runs — BMP for images (dimensions derived from
    doc_id), WAV for audio (duration derived from text length); "video"
    rows stay raw bytes and exercise the stub fallback path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    def synth(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = (text or "").encode("utf-8")
                kind = int(doc_id) % 3
                if kind == 0:
                    w = 16 + int(doc_id) % 64
                    h = 16 + int(doc_id) % 48
                    rows.append((int(doc_id), synth_bmp(w, h, body),
                                 "image"))
                elif kind == 1:
                    dur = 100 + (len(body) % 5000)
                    rows.append((int(doc_id), synth_wav(dur), "audio"))
                else:
                    rows.append((int(doc_id), body, "video"))
            yield pd.DataFrame(rows,
                               columns=["media_id", "payload", "media_type"])

    return docs.mapInPandas(
        synth, schema="media_id long, payload binary, media_type string")
