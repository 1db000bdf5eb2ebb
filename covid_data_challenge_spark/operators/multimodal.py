"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The decode kernels themselves (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is stubbed: ``decoder="fake"`` runs a
deterministic payload-derived feature extractor (real Arrow batch flow,
real schemas, real partitioning) and ``decoder="real"`` raises
``NotImplementedError`` at the exact point a decode library would be
invoked. Everything around that point — schema contracts, batch
iteration, partition sizing — is production-shaped and tested.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
feature extraction is embarrassingly parallel with NO shuffle — the
mapInPandas stage chains onto the scan. At 100 TB of media you'd
partition the input by file-size bins so batches stay uniform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),  # -1 when unknown/not applicable
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus: payload bytes derived from the id
    (sha256-expanded), metadata typed per MEDIA_SCHEMA."""
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind != "audio" else -1,
                48 + i if kind != "audio" else -1,
                1000 * (i + 1) if kind != "image" else -1,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode→embed kernel: bucket byte sums
    over ``dim`` strides, normalized to [0, 1]."""
    if not payload:
        return [0.0] * dim
    out = []
    stride = max(len(payload) // dim, 1)
    for j in range(dim):
        chunk = payload[j * stride : (j + 1) * stride] or payload[-stride:]
        out.append(round(sum(chunk) / (255.0 * len(chunk)), 6))
    return out


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder="real"`` marks where PIL/ffmpeg would decode — unavailable
    in this environment → NotImplementedError (by contract, see module
    docstring). The Spark-side plumbing is identical for both.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries not "
                    "present in this container; use decoder='fake'"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed step). Pure Column algebra —
    the expensive explode happens before decode so frame decoding
    parallelizes across the cluster rather than per-video."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("sample_ts_ms", F.col("frame_idx") * every_ms)
        .select("media_id", "frame_idx", "sample_ts_ms")
    )
