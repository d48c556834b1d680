"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contracts — schema, Arrow batch shape, partitioning,
UDF signatures — are real and tested; the actual codec work is stubbed
behind a deterministic fake (this container ships no image/audio
libraries). Swap `_decode_stub` for PIL/torchaudio/ffmpeg calls in
production: the mapInPandas plumbing is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),       # nullable typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
        StructField("feature", StringType()),  # stubbed feature payload
    ]
)


def _decode_stub(media_type: str, content: bytes) -> str:
    """Deterministic fake decode/feature-extract. Production: replace
    with real decoders; raise NotImplementedError for codecs you don't
    ship rather than silently passing bytes through."""
    digest = hashlib.sha256(content).hexdigest()[:16]
    return f"{media_type}-feat-{digest}"


def extract_features(media: DataFrame) -> DataFrame:
    """media -> typed per-item features via mapInPandas. Binary stays
    binary end-to-end (Arrow passes bytes zero-copy); partition-
    preserving, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                rows.append(
                    (
                        mid,
                        mtype,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        _decode_stub(mtype, b),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "byte_len", "content_sha", "feature"],
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.
    Pure SQL fan-out (sequence + explode) — the decode of each frame is
    the stubbed step, the distribution of work is real."""
    return (
        media.where(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )
