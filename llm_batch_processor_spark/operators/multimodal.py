"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at scale: the payload is a
``binary`` column (or a reference into object storage), metadata is a
typed struct, and decode/feature steps are Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects.

The image/audio codec libraries are not in this container, so the
decode kernels are STUBBED behind ``NotImplementedError`` with a
deterministic fake used for tests/oracle checks — the Spark-side
plumbing (schema, batching, partition flow) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

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
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str, content_col: str, fmt: str = "fake/jpeg"
) -> DataFrame:
    """Wrap any string column as an opaque media payload (test stand-in
    for reading real image bytes; real ingestion: ``spark.read.format(
    'binaryFile')`` which yields the same (path, content binary) shape)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(content_col).cast("binary").alias("payload"),
        F.lit(fmt).alias("format"),
        F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> dict:
    """Real decoder stub — requires an image codec (Pillow/opencv),
    not present in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: pure arithmetic on payload length,
    so oracle SQL can replicate it exactly."""
    n = len(payload)
    return {
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "n_frames": n % 16 + 1,
    }


def decode_media(
    media: DataFrame, decoder: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Arrow-batched decode via mapInPandas: one Python hop per batch,
    bytes stay in Arrow buffers until the decoder touches them."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                }
            )
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)
