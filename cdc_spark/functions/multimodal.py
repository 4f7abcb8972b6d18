"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque `binary` columns + typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the only sanctioned Python-on-executor
path. The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-derived fake supplies dims/durations so the
Spark-side plumbing — schema, batch iteration, partition shape — is
fully real and testable.

Scale shape: mapInPandas streams Arrow batches (no per-row Python
round-trips to the JVM); media blobs never hit the driver; repartition
upstream by size so one straggler video doesn't skew a task. At 100 TB
the binary column lives in its own parquet column chunk — column
pruning means metadata-only queries never read the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

#: canonical media-asset schema (payload + typed metadata)
MEDIA_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), True),       # opaque encoded bytes
    StructField("codec", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),        # image/video
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),     # video
    StructField("duration_ms", IntegerType(), True),  # audio/video
])


def decode_image(payload: bytes, fake: bool = False) -> dict[str, Any]:
    """Decode an encoded image to (width, height).

    Real decoding needs an image lib (not in this container) — the
    deterministic fake derives dims from the byte length so tests and
    oracles are stable."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this container; pass fake=True "
            "(deterministic byte-derived dims) or plug a PIL-backed decoder"
        )
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n // 64) % 64}


def decode_audio(payload: bytes, fake: bool = False) -> dict[str, Any]:
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable in this container; pass fake=True"
        )
    return {"duration_ms": 100 + len(payload) % 10_000}


def decode_video(payload: bytes, fake: bool = False) -> dict[str, Any]:
    if not fake:
        raise NotImplementedError(
            "video codecs unavailable in this container; pass fake=True"
        )
    n = len(payload)
    return {
        "width": 16 + n % 64, "height": 16 + (n // 64) % 64,
        "n_frames": 1 + n % 240, "duration_ms": (1 + n % 240) * 33,
    }


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    The per-asset decode is unavoidable Python — it runs once per blob
    inside the Arrow batch loop, never as a JVM↔Python per-row UDF."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders = {"image": decode_image, "audio": decode_audio, "video": decode_video}
        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "width": pd.Series([None] * len(pdf), dtype="object"),
                "height": pd.Series([None] * len(pdf), dtype="object"),
                "n_frames": pd.Series([None] * len(pdf), dtype="object"),
                "duration_ms": pd.Series([None] * len(pdf), dtype="object"),
            }
            res = pd.DataFrame(out)
            for i, (mt, payload) in enumerate(zip(pdf["media_type"], pdf["payload"])):
                if payload is None:
                    continue
                feats = decoders[mt](bytes(payload), fake=fake)
                for k, v in feats.items():
                    res.iloc[i, res.columns.get_loc(k)] = v
            yield res

    return df.select("asset_id", "media_type", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, every_n: int = 30, fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (1→N expansion inside the Arrow batch). Frames themselves are the
    fake decoder's indices; a real codec slots into the same loop."""
    schema = StructType([
        StructField("asset_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video" or payload is None:
                    continue
                meta = decode_video(bytes(payload), fake=fake)
                frame_ms = meta["duration_ms"] // meta["n_frames"]  # codec is the source of truth
                for idx in range(0, meta["n_frames"], every_n):
                    rows.append((aid, idx, idx * frame_ms))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "ts_ms"])

    return df.select("asset_id", "media_type", "payload").mapInPandas(batches, schema=schema)


RESIZE_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("width_in", IntegerType(), False),
    StructField("height_in", IntegerType(), False),
    StructField("width_out", IntegerType(), False),
    StructField("height_out", IntegerType(), False),
    StructField("n_bytes_out", LongType(), False),
])


def resize_images(df: DataFrame, max_side: int = 32, fake: bool = True) -> DataFrame:
    """Resize images to fit within a `max_side` square, aspect preserved
    (integer arithmetic, so the SQL oracle reproduces it exactly).

    Decode + scale + re-encode run per blob inside the Arrow batch loop;
    the fake re-encode reports 3 bytes/pixel. A real implementation
    swaps `decode_image`/the re-encode for PIL calls in the same loop —
    the Spark-side shape (batch iteration, 1:1 rows, schema) is real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                if mt != "image" or payload is None:
                    continue
                d = decode_image(bytes(payload), fake=fake)
                w, h = d["width"], d["height"]
                m = max(w, h)
                if m <= max_side:
                    wo, ho = w, h
                else:
                    wo = max(1, (w * max_side) // m)
                    ho = max(1, (h * max_side) // m)
                rows.append((aid, w, h, wo, ho, wo * ho * 3))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width_in", "height_in",
                         "width_out", "height_out", "n_bytes_out"],
            )

    return df.select("asset_id", "media_type", "payload").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


def documents_as_media(df: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapter: treat the documents table's text bytes as opaque media
    payloads (the sandbox stand-in for real blobs — deterministic, so
    the feature extraction is oracle-able via octet_length)."""
    return df.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake").alias("codec"),
    )
