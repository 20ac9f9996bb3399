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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("target_bytes", T.LongType()),
                    T.StructField("orig_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def resize_payloads(binary_df: DataFrame, target_bytes: int) -> DataFrame:
    """Resize-shaped transform: payload in → smaller payload out.

    A real image resize swaps this body for PIL/opencv inside the same
    mapInPandas seam (``_decode_media_real``); the deterministic fake
    strided-samples the payload down to ``target_bytes`` so output size,
    schema, and the rewritten metadata struct behave exactly as a real
    thumbnailer. 1-in-1-out; payload column is REPLACED (the dominant
    pattern for storage-bound media pipelines: never carry both).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                if len(b) <= target_bytes:
                    return bytes(b)
                stride = len(b) / target_bytes
                return bytes(b[int(i * stride)] for i in range(target_bytes))

            metas = pdf["meta"]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "payload": pdf["payload"].map(shrink),
                    "meta": [
                        {
                            "modality": m["modality"],
                            "mime": m["mime"],
                            "target_bytes": target_bytes,
                            "orig_bytes": len(p),
                        }
                        for m, p in zip(metas, pdf["payload"])
                    ],
                }
            )

    return binary_df.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    binary_df: DataFrame,
    *,
    frame_bytes: int = 256,
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling transform: one row in → 0..n frame rows out.

    Treats the payload as a concatenation of fixed-size "frames"
    (a real video decoder derives frame boundaries from the container
    format through the ``_decode_media_real`` seam) and keeps every
    ``every_n``-th one. Demonstrates the fan-out mapInPandas shape —
    output row count differs from input — which is how frame extraction
    parallelizes at scale: the explode happens executor-side with no
    shuffle, and downstream per-frame work inherits the partitioning.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames, totals = [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                n_total = (len(payload) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_total, every_n):
                    ids.append(item_id)
                    nos.append(fno)
                    frames.append(
                        bytes(
                            payload[
                                fno * frame_bytes : (fno + 1) * frame_bytes
                            ]
                        )
                    )
                    totals.append(n_total)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                }
            )

    return binary_df.mapInPandas(sample, FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def perceptual_hash(binary_df: DataFrame, *, n_samples: int = 64) -> DataFrame:
    """Average-hash perceptual fingerprint over binary payloads.

    The aHash family (pHash/aHash image dedup): sample ``n_samples``
    evenly-strided bytes, set bit k when sample k exceeds the sample
    mean, yielding a 64-bit fingerprint whose Hamming distance tracks
    payload similarity. A real image pipeline decodes + downscales via
    the ``_decode_media_real`` seam and hashes pixel luma; the
    deterministic byte-level stand-in keeps the exact same Arrow
    ``mapInPandas`` plumbing, output schema, and downstream banding.

    Every step is integer arithmetic (``n_samples * s_k > total``
    replaces a float mean compare), so an external engine reproduces
    the fingerprints bit-for-bit — the mm03 oracle does.
    """

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                n = len(payload)
                if n == 0:
                    out.append(0)
                    continue
                samples = [
                    payload[(k * (n - 1)) // (n_samples - 1)]
                    for k in range(n_samples)
                ]
                total = sum(samples)
                h = 0
                for k, s in enumerate(samples):
                    if n_samples * s > total:
                        h |= 1 << k
                if h >= 1 << 63:  # two's-complement into a signed long
                    h -= 1 << 64
                out.append(h)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "simhash": pd.Series(out, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(hash_batch, PHASH_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("peak_energy", T.LongType()),
        T.StructField("total_energy", T.LongType()),
        T.StructField("peak_idx", T.LongType()),
    ]
)


def frame_energy(
    binary_df: DataFrame, *, window: int = 64
) -> DataFrame:
    """Audio-modality feature extraction over the fake-decode seam:
    the payload is treated as 8-bit unsigned PCM (the deterministic
    stand-in — a real decoder plugs into ``_decode_media_real``), and
    per-frame signal energy ``sum((s-128)^2)`` is computed over
    non-overlapping ``window``-sample frames — the framing shape VAD /
    silence-trim / segmentation pipelines use.

    numpy-vectorized inside Arrow batches (one frombuffer + reshape
    per item, no per-sample Python); energies are exact int64, so the
    whole operator is engine-portable bit for bit. Items shorter than
    one frame produce no row (no partial-frame estimates). ``peak_idx``
    is the FIRST frame attaining the max (deterministic tiebreak).
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, peak, tot, pidx = [], [], [], [], []
            for item, blob in zip(pdf["item_id"], pdf["payload"]):
                n = len(blob) // window
                if n == 0:
                    continue
                s = (
                    np.frombuffer(blob[: n * window], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(n, window)
                    - 128
                )
                es = (s * s).sum(axis=1)
                ids.append(item)
                nw.append(n)
                peak.append(int(es.max()))
                tot.append(int(es.sum()))
                pidx.append(int(es.argmax()))  # first max: numpy argmax
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "n_windows": pd.Series(nw, dtype="int64"),
                    "peak_energy": pd.Series(peak, dtype="int64"),
                    "total_energy": pd.Series(tot, dtype="int64"),
                    "peak_idx": pd.Series(pidx, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(extract, ENERGY_SCHEMA)


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def frame_energies(
    binary_df: DataFrame, *, window: int = 64
) -> DataFrame:
    """Per-frame fan-out twin of :func:`frame_energy`: one row per
    non-overlapping ``window``-sample frame with its exact int64
    energy — the input shape for segmentation / VAD logic that needs
    the frame SEQUENCE, not per-item aggregates. Same deterministic
    8-bit-PCM fake-decode seam; numpy-vectorized per Arrow batch; no
    shuffle (mapInPandas fan-out stays in the scan stage)."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idx, en = [], [], []
            for item, blob in zip(pdf["item_id"], pdf["payload"]):
                n = len(blob) // window
                if n == 0:
                    continue
                s = (
                    np.frombuffer(blob[: n * window], dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(n, window)
                    - 128
                )
                es = (s * s).sum(axis=1)
                ids.extend([item] * n)
                idx.extend(range(n))
                en.extend(int(e) for e in es)
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idx, dtype="int64"),
                    "energy": pd.Series(en, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(extract, FRAME_ENERGY_SCHEMA)
