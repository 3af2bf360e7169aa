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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing with the DECODE STEP FAKED (Pillow absent): the
    mapInPandas pass, output schema, and per-batch loop are the real
    thing — swap ``_fake_resize`` for ``PIL.Image.open(...).resize(...)``
    and nothing else changes. The fake is deterministic: it tiles the
    source bytes into exactly ``width × height`` output bytes, so tests
    can assert payload sizes and idempotence without a codec. Decode +
    resize stay in ONE pass — never a second shuffle for the transform.
    """

    def _fake_resize(b: bytes | None) -> bytes | None:
        if b is None or len(b) == 0:
            return None
        need = width * height
        return (b * (need // len(b) + 1))[:need]

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["content"].map(_fake_resize),
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_ts", T.DoubleType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, frame_bytes: int = 256
) -> DataFrame:
    """Frame-sampling plumbing with the CODEC FAKED (pyav/ffmpeg
    absent): the flatMap-shaped pandas UDF — one INPUT row fanning out
    to N OUTPUT rows per sampled frame — is the real contract; swap the
    fake splitter for an ``av.open`` frame iterator and the schema,
    batching, and fan-out shape are unchanged. The fake is
    deterministic: the payload is cut into fixed-size "frames", one per
    ``every_n_seconds`` of pretended footage.
    """

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_no": [], "frame_ts": [], "frame": []}
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                if b is None:
                    continue
                n = max(1, len(b) // frame_bytes)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_ts"].append(round(i * every_n_seconds, 6))
                    out["frame"].append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(_frames, FRAME_SCHEMA)
