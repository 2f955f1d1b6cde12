"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing (schemas, partitioning, Arrow batch
shapes, UDF signatures) is real and tested; the codec steps (decode, resize,
frame-sample, feature-extract) are STUBS — this container ships no
image/audio libraries. Each stub either raises ``NotImplementedError``
(strict mode) or produces a deterministic fake derived from the payload hash
(test mode), so the pipeline shape can be exercised end-to-end.
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


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the content hash
    (stable across runs/executors — usable in tests)."""
    h = hashlib.sha256(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    dur = int.from_bytes(h[2:4], "big")
    return w, ht, dur


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode → metadata. Real impl: PIL/libav behind this signature."""
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


def media_corpus_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table: documents.text bytes stand in
    for media payloads (no external data), media_type assigned round-robin
    by doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
    )
