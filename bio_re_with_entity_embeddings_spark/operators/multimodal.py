"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image_features`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder
derives (width, height, n_channels) from the payload bytes. Everything
Spark-side — schema, partitioning, ``mapInPandas`` batch shape, UDF
signatures — is real and tested, so swapping in PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from a text table (the
    fixture path: payload = utf-8 bytes of text)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id").cast("long"), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(payload).digest()
    return (h[0] + 1) * 8, (h[1] + 1) * 8, (h[2] % 3) + 1


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode -> IMAGE_FEATURES rows. Real decode needs
    an image library (absent here); the pipeline shape is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                raw = bytes(payload)
                if fake:
                    w, h, c = _fake_decode(raw)
                else:
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv (not in this env); "
                        "pass fake=True for the deterministic stub"
                    )
                out.append(
                    (
                        media_id,
                        w,
                        h,
                        c,
                        hashlib.sha256(raw).hexdigest(),
                        len(raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "payload_sha", "n_bytes",
                ],
            )

    return media.where(F.col("modality") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, IMAGE_FEATURES)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands (video, n_frames-metadata)
    into (media_id, frame_idx) rows natively; the per-frame decode UDF
    slots in after (stubbed like decode_image_features). n_frames is
    derived deterministically from payload size here."""
    vids = media.where(F.col("modality") == "video").select(
        "media_id", (F.length("payload") / 16).cast("int").alias("n_frames")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
