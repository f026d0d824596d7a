"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema conventions, Arrow-batched
``mapInPandas`` decode stages, partitioning guidance — while the actual
media decode is STUBBED (image/audio libraries are not in this container):
``decode_stub_features`` computes deterministic fake features from the raw
bytes, and ``DECODERS`` documents where a real decoder (PIL/torchaudio/
decord) plugs in behind the same UDF signature.

Scale notes: binary payloads dominate row size — keep them out of shuffles
(decode early, project the bytes away; or store media in object storage and
carry only references + metadata).  ``maxPartitionBytes`` should be sized so
a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal row: opaque bytes + typed metadata.
MULTIMODAL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def attach_binary_meta(df: DataFrame, bytes_col: str, id_col: str,
                       modality: str = "image", mime: str = "application/octet-stream") -> DataFrame:
    """Lift (id, binary) columns into the canonical multimodal schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.create_map(F.lit("n_bytes"),
                     F.length(F.col(bytes_col).cast("binary")).cast("string")).alias("meta"),
    )


def _stub_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from raw bytes.

    REAL DECODER GOES HERE: e.g. PIL.Image.open(io.BytesIO(payload)) ->
    resize -> pixel stats; torchaudio.load -> spectrogram.  Not available in
    this container, so features are byte-histogram moments — deterministic,
    schema-identical to a real embedding."""
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload[:4096]):
        buckets[b % dim] += 1
    total = max(1, sum(buckets))
    return [round(c / total, 6) for c in buckets]


DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _stub_decode,   # swap: PIL decode + resize + channel stats
    "audio": _stub_decode,   # swap: torchaudio load + mel-spec pooling
    "video": _stub_decode,   # swap: decord frame-sample + per-frame image path
}


def decode_stub_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched decode stage: multimodal rows -> per-media features.

    Real pipelines replace ``DECODERS[modality]``; the Spark plumbing —
    schema, batching, the project-away of ``payload`` right after decode —
    is exactly what production would run."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(m, _stub_decode)(p)
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return df.mapInPandas(_decode, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def frame_sample(df: DataFrame, n_frames: int = 4, frame_interval_ms: int = 1000,
                 dim: int = 8) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW PER SAMPLED FRAME — the
    row-exploding decode stage (vs :func:`decode_stub_features`' 1:1 map).

    REAL DECODER GOES HERE: decord/ffmpeg seek to each timestamp and
    decode + resize one frame.  Stubbed in this container by slicing the
    payload into ``n_frames`` byte windows and featurizing each with the
    byte-histogram stub, so row counts, batch shapes and schema are
    exactly what a real decoder produces.

    Scale notes: the fan-out happens INSIDE the Arrow batch and the
    ``payload`` bytes are projected away in the same stage — frames never
    carry source bytes into a shuffle; with B-byte videos and f frames the
    stage's output is f·dim floats per row, not f·B bytes."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [],
                   "n_bytes": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                nb = len(payload) if payload is not None else 0
                step = max(1, nb // n_frames)
                for i in range(n_frames):
                    window = (payload[i * step:(i + 1) * step]
                              if payload is not None else None)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * frame_interval_ms)
                    out["n_bytes"].append(nb)
                    out["feature"].append(_stub_decode(window, dim))
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)
