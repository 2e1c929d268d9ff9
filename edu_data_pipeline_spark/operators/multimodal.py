"""Multimodal columns: opaque binary payloads + typed metadata.

Extends the engine for training-data pipelines that carry image/audio/
video alongside text (BASELINE north star). Design:

- Media travels as an opaque ``binary`` column plus a typed metadata
  struct (media_type, width/height, n_frames, sample_rate, n_bytes) —
  Parquet stores the bytes column-oriented, Spark never interprets them
  JVM-side.
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: the Spark-side plumbing (schemas, batch
  iteration, partitioning) is real and tested. The actual codec work is
  STUBBED: the image/audio libraries are not in this container, so
  ``_decode_real`` raises ``NotImplementedError`` and the deterministic
  byte-level fake (``_decode_fake``) stands in. Swapping in PIL/ffmpeg
  touches only those two functions.

Scale: feature extraction is embarrassingly parallel (mapInPandas, no
shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory holds
payload_size x batch_rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURE_BINS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a media table: payload = utf-8 bytes of
    the text (deterministic stand-in for real image/audio blobs), typed
    metadata derived from doc_id/n_chars. Pure native expressions."""
    k = F.col("doc_id")
    media_type = (
        F.when(k % 3 == 0, "image").when(k % 3 == 1, "audio").otherwise("video")
    )
    payload = F.encode(F.col("text"), "utf-8")
    meta = F.struct(
        (F.lit(64) + (k % 8) * 32).cast("int").alias("width"),
        (F.lit(64) + (k % 5) * 32).cast("int").alias("height"),
        F.when(k % 3 == 2, (k % 30 + 1).cast("int")).otherwise(F.lit(1).cast("int")).alias("n_frames"),
        F.when(k % 3 == 1, F.lit(16000)).otherwise(F.lit(0)).cast("int").alias("sample_rate"),
        F.length(payload).cast("int").alias("n_bytes"),
    )
    return docs.select(
        k.alias("doc_id"), media_type.alias("media_type"), payload.alias("payload"),
        meta.alias("meta"),
    )


def _decode_real(payload: bytes, media_type: str):
    """Real codec hook — intentionally unimplemented in this container.

    A deployment with PIL/torchaudio/ffmpeg installed implements this and
    ``extract_features`` picks it up automatically.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "extract_features uses the deterministic byte-level fake"
    )


def _decode_fake(payload: bytes) -> list[float]:
    """Deterministic stand-in decode: 16-bin byte histogram, L1-normalized."""
    counts = [0] * N_FEATURE_BINS
    for byte in payload:
        counts[byte % N_FEATURE_BINS] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                if use_real_codec:
                    feats.append(_decode_real(raw, mtype))  # pragma: no cover
                else:
                    feats.append(_decode_fake(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """Payload 'resize' (truncate stand-in for a real rescale): native
    expressions only — no Python in the hot path for byte slicing."""
    clipped = F.expr(f"substring(payload, 1, {max_bytes})")
    return media.select(
        "doc_id",
        "media_type",
        clipped.alias("payload"),
        F.col("meta").withField("n_bytes", F.least(F.col("meta.n_bytes"), F.lit(max_bytes))).alias("meta"),
    )


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame index,
    frame payload sliced from the blob (fake frames = fixed-width byte
    strides). Native explode — the shuffle-free fan-out pattern a real
    frame sampler would use."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
    frame_width = 64
    exploded = (
        media.where(F.col("media_type") == "video")
        .select("doc_id", "meta", F.explode(frames).alias("frame_idx"))
    )
    return exploded.select(
        "doc_id",
        "frame_idx",
        F.lit(frame_width).alias("frame_bytes"),
    )
