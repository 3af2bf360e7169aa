"""Multimodal column plumbing (engine extension; SURVEY.md §7 Phase 4).

Image/audio/video travel as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``. The image/audio codecs
are NOT in this container, so the decode step is STUBBED: a
deterministic fake extractor (byte stats) ships by default and the
real-codec slots raise ``NotImplementedError`` with the intended
library call documented. The Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: one row per media object.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("head_hex", T.StringType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents fixture as a media table (utf-8
    bytes as the opaque payload) so the binary plumbing is exercisable
    without codec libraries."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Feature extraction over binary content via ``mapInPandas``
    (Arrow-batched). The default extractor is a deterministic fake
    (byte length / head bytes / mean byte value); swap ``_extract`` for
    a real decoder where codecs exist."""

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                    "head_hex": content.map(lambda b: b[:4].hex() if b else None),
                    "byte_mean": content.map(
                        lambda b: round(sum(b) / len(b), 4) if b else None
                    ),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — real implementation: ``PIL.Image.open(io.BytesIO(b))``
    per batch inside mapInPandas, emitting (media_id, width, height,
    mode, pixels binary). Pillow is not in this container."""
    raise NotImplementedError("image decode requires Pillow; plumbing in extract_features")


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — real implementation: Pillow ``Image.resize`` inside the
    same mapInPandas pass as decode (never a second shuffle)."""
    raise NotImplementedError("image resize requires Pillow")


def sample_video_frames(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """STUB — real implementation: pyav/ffmpeg frame iterator per batch
    in mapInPandas; one output row per sampled frame (media_id,
    frame_ts, frame binary) — a flatMap-shaped pandas UDF."""
    raise NotImplementedError("video frame sampling requires pyav/ffmpeg")
