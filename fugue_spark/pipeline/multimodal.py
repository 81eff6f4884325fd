"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata structs, with decode/feature steps as Arrow-batched pandas UDFs.

The Spark-side plumbing (schemas, batch shapes, partitioning) is real and
tested; the actual media decoding is STUBBED — the container has no
image/audio libraries — behind ``register_decoder``. The default decoder is
a deterministic fake that derives "features" from the bytes, so pipelines
are exercisable end-to-end; swapping in a real decoder (PIL/librosa/ffmpeg)
changes one function, not the plan.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "as_media",
    "with_media_meta",
    "extract_features",
    "register_decoder",
]

# the typed side-car for an opaque blob
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
    ]
)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(mime_prefix: str, fn: Callable[[bytes], dict]) -> None:
    """Plug a real decoder: fn(raw_bytes) -> {'width':…, 'height':…, …}."""
    _DECODERS[mime_prefix] = fn


def _fake_decode(raw: bytes) -> dict:
    """Deterministic stand-in for a media decoder (no media libs in this
    environment). Real decode (PIL.Image.open etc.) raises ImportError here
    by design — see register_decoder."""
    crc = zlib.crc32(raw) & 0xFFFFFFFF
    return {
        "width": 1 + crc % 1024,
        "height": 1 + (crc >> 10) % 1024,
        "n_frames": 1 + (crc >> 20) % 64,
    }


def as_media(df: DataFrame, source_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Pack a column into (blob binary, meta struct). Text columns are
    utf-8 encoded; binary columns pass through."""
    src = F.col(source_col)
    dt = df.schema[source_col].dataType
    blob = src if isinstance(dt, T.BinaryType) else F.encode(src.cast("string"), "utf-8")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col("blob")).cast("long").alias("n_bytes"),
            F.sha1(F.col("blob")).alias("sha1"),
        ),
    )


def with_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Pure-JVM metadata: byte length + sha1 (no decode)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(blob_col)).cast("long").alias("n_bytes"),
            F.sha1(F.col(blob_col)).alias("sha1"),
        ),
    )


_FEATURE_SCHEMA = "id long, n_bytes long, width long, height long, n_frames long"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of blobs;
    bounded memory — one batch of media in flight per core). Uses the
    registered decoder for the mime type, else the deterministic fake."""
    decoder = _fake_decode
    for prefix, fn in _DECODERS.items():
        if mime.startswith(prefix):
            decoder = fn
            break

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(raw if isinstance(raw, bytes) else bytes(raw)) for raw in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "n_bytes": [len(r) for r in pdf[blob_col]],
                    "width": [f.get("width") for f in feats],
                    "height": [f.get("height") for f in feats],
                    "n_frames": [f.get("n_frames") for f in feats],
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, _FEATURE_SCHEMA)
