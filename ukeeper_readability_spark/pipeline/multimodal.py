"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas functions
over mapInPandas. The actual codec work is STUBBED (no image/audio libs in this
container) behind `decode_stub` — a deterministic fake deriving pseudo
dimensions from the payload bytes — while the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested. Swap
`decode_stub` for a PIL/ffmpeg call in production; nothing else changes.
"""

from __future__ import annotations

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
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("checksum_hex", StringType()),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    Production implementation raises until a codec library is wired in:
        raise NotImplementedError("wire PIL/ffmpeg decode here")
    The fake derives dimensions from the payload's first bytes so tests and
    oracles are stable: width = 1 + b[0], height = 1 + b[1], frames = 1 + b[2] % 8.
    """
    b = payload or b"\x00\x00\x00"
    b = b + b"\x00\x00\x00"
    return {
        "width": 1 + b[0],
        "height": 1 + b[1],
        "n_frames": 1 + (b[2] % 8),
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "n_bytes", "width", "height", "n_frames", "checksum_hex")}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            p = bytes(payload) if payload is not None else b""
            meta = decode_stub(p)
            rows["media_id"].append(mid)
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(p))
            rows["width"].append(meta["width"])
            rows["height"].append(meta["height"])
            rows["n_frames"].append(meta["n_frames"])
            rows["checksum_hex"].append(p.hex())
        yield pd.DataFrame(rows)


def media_features(media: DataFrame, num_partitions: int = 0) -> DataFrame:
    """Decode/feature-extract pipeline over binary media rows.

    Partitions by media_id hash when requested (payloads are large and skewed —
    spreading by id, not by kind, avoids hot partitions full of video rows).
    """
    slim = media.select("media_id", "kind", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.col("media_id"))
    return slim.mapInPandas(_extract_batches, MEDIA_FEATURES_SCHEMA)


def synthesize_media(spark, docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from documents: payload = the UTF-8
    bytes of md5(text) unhexed — a stand-in for real image bytes that both
    engines (Spark / DuckDB) can reconstruct."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(key_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(key_col).cast("long").alias("media_id"),
        kinds.alias("kind"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
