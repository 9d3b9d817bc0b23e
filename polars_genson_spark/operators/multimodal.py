"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures) is real and tested; the actual codec work is
STUBBED — the container has no image/audio libraries — behind
``decoder="fake"`` (deterministic features derived from the bytes) or
``decoder="real"`` (raises NotImplementedError at the decode step).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload =
    hash-derived bytes, so decode tests are reproducible)."""
    df = spark.range(n_rows)
    payload = F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3).cast("int") + 1,
    )
    return df.select(
        F.format_string("m-%06d", F.col("id")).alias("media_id"),
        F.encode(payload, "utf-8").alias("media"),
        F.struct(
            kind.alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            (F.col("id") % 640 + 1).cast("int").alias("width"),
            (F.col("id") % 480 + 1).cast("int").alias("height"),
            (F.col("id") * 40 % 10_000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: blake2b → unit floats."""
    d = hashlib.blake2b(data or b"", digest_size=dim * 2).digest()
    arr = np.frombuffer(d, dtype=np.uint16).astype(np.float64)
    return list(np.round(arr / 65535.0, 6))


def extract_features(
    df: DataFrame, decoder: str = "fake", batch_note_col: str = "batch_rows"
) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``.

    Real Arrow plumbing: the UDF sees pandas batches of (media_id, media,
    meta) and emits (media_id, kind, features array<double>, batch_rows).
    ``decoder='real'`` marks where torchvision/PIL/ffmpeg would run.
    """

    out_schema = (
        "media_id string, kind string, features array<double>, "
        f"{batch_note_col} int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available "
                    "in this environment; use decoder='fake'"
                )
            feats = [_fake_features(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "features": feats,
                    batch_note_col: len(pdf),
                }
            )

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: plumbing keeps (media_id, media, meta) shape and
    rewrites meta dims; the pixel work is where PIL would run."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.kind").alias("kind"),
            F.col("meta.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (JVM-side sequence/explode; the actual frame grab is the
    stubbed decode step downstream)."""
    frames = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0).cast("long")),
            F.lit(every_ms).cast("long"),
        )
    )
    return df.where(F.col("meta.kind") == "video").select(
        F.col(id_col), frames.alias("frame_ts_ms")
    )
