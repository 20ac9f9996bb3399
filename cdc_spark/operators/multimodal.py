"""Multimodal columns: opaque binary payloads + typed metadata.

Model (BASELINE.json north star): image/audio/video travel as
``binary`` columns beside a metadata struct (modality, mime,
width/height/duration, …). Heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched ``mapInPandas``
over the binary column — the Spark-side plumbing (schema, batch
iteration, partition sizing) is real and tested.

The actual media decode is STUBBED: the container has no image/audio
libraries, so ``decode_features`` computes deterministic byte-level
features and the ``_decode_media_real`` seam raises
``NotImplementedError`` with the integration contract documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def _decode_media_real(blob: bytes, modality: str) -> dict:
    """The real decode seam. Plug PIL/librosa/ffmpeg here on a cluster
    image that ships them: return width/height/channels for images,
    sample_rate/duration for audio, frame count for video."""
    raise NotImplementedError(
        "media decoding libraries are not available in this environment; "
        "deterministic byte-level features are computed instead "
        "(see decode_features)"
    )


def attach_binary(
    df: DataFrame, text_col: str, id_col: str, modality: str = "text"
) -> DataFrame:
    """Demo constructor: UTF-8-encode a text column into the binary
    payload + metadata struct shape real media rows would have."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
        ).alias("meta"),
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic stand-in features (length, header checksum, byte
    mean) — the mapInPandas plumbing (schema in/out, batch shape,
    zero-copy Arrow transfer) is exactly what a real decoder uses.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len),
                    "header_sum": payloads.map(
                        lambda b: int(sum(b[:8])) if len(b) else 0
                    ),
                    "byte_mean": payloads.map(
                        lambda b: round(sum(b) / len(b), 4) if len(b) else 0.0
                    ),
                }
            )

    return binary_df.mapInPandas(extract, FEATURE_SCHEMA)
