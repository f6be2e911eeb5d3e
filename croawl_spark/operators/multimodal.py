"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the decode
kernels are stubs (clearly marked); everything Spark-side — schemas, binary
columns, Arrow batch shapes, mapInPandas signatures, partition behavior —
is real and tested. Swapping ``_decode_image_stub`` for a PIL/ffmpeg call
is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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

MEDIA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),     # 'image'|'audio'|'video'
        StructField("payload", BinaryType()),          # opaque bytes
        StructField("content_type", StringType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),  # 8-dim embedding
    ]
)

REAL_DECODERS_AVAILABLE = False  # flips when PIL/av are installed


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic fake (width, height, feature) from bytes.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))`` —
    unavailable in this container. The fake is deterministic so tests pin
    the plumbing; raise if a caller demands real pixels.
    """
    d = hashlib.sha256(payload).digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    feat = (np.frombuffer(d[:32], dtype=np.uint8)[:8] / 255.0).astype(np.float32)
    return w, h, feat


def decode_real(payload: bytes):
    raise NotImplementedError(
        "real image/audio decode requires PIL/av, not present in this "
        "container; use the deterministic stub path (decode_features)"
    )


def synth_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table with real binary payloads (deterministic bytes)."""
    return docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("media_kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.lit("image/fake").alias("content_type"),
    )


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, kind, payload in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"]
            ):
                w, h, feat = _decode_image_stub(bytes(payload))
                rows.append((ref, kind, w, h, len(payload), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES.fields]
            )

    return media.mapInPandas(run, FEATURES)


def resize_images(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize plumbing: binary in -> binary out through one Arrow crossing,
    schema preserved plus (width, height) metadata columns. The resample
    kernel is a STUB (real form: PIL thumbnail + re-encode); the stub
    deterministically truncates/re-hashes the payload so size contraction
    and determinism are testable. Aspect ratio preserved, longest side
    capped at max_dim, never upscaled."""
    out_schema = StructType(
        list(MEDIA.fields)
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, kind, payload, ctype in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"],
                pdf["content_type"],
            ):
                b = bytes(payload)
                w, h, _ = _decode_image_stub(b)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                # stub re-encode: payload shrinks with the pixel count
                n_out = max(16, int(len(b) * (nw * nh) / (w * h)))
                out = hashlib.sha256(b).digest() * (n_out // 32 + 1)
                rows.append((ref, kind, out[:n_out], ctype, nw, nh))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.mapInPandas(run, out_schema)


FRAME = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synth_video_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake video payloads (concatenated 'frame' segments)."""
    return docs.select(
        F.concat(F.lit("vid://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("video").alias("media_kind"),
        F.encode(F.repeat(F.col(text_col), 4), "UTF-8").cast("binary").alias("payload"),
        F.lit("video/fake").alias("content_type"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one video row fans out to N frame rows
    through a single Arrow crossing (mapInPandas yields more rows than it
    receives — the 1->N batch shape real decoders need). The demux kernel
    is a STUB: fake duration = n_bytes // 1024 + 1 seconds, one 'frame'
    (a deterministic payload slice) per every_ms. Real form: av.open ->
    seek+decode keyframes."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                duration_ms = (len(b) // 1024 + 1) * 1000
                n = max(1, duration_ms // every_ms)
                seg = max(1, len(b) // n)
                for i in range(n):
                    rows.append(
                        (ref, i, i * every_ms, b[i * seg: i * seg + seg])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME.fields])

    return media.filter(F.col("media_kind") == "video").mapInPandas(run, FRAME)
