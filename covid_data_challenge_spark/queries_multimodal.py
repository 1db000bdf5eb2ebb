"""Multimodal binary payloads through Arrow-batched
mapInPandas: feature extraction and frame-sampling plans.

Registered via registry.register; queries_ext imports every themed
module and restores the frozen driver-contract registry order
(registry_order.CANONICAL_ORDER) afterwards — in-module order is
thematic, not contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from covid_data_challenge_spark.operators.multimodal import extract_features, frame_sample_plan, synth_media_table
from covid_data_challenge_spark.registry import register


# The synthetic media corpus is a pure function of the id (sha256-expanded
# payloads, operators/multimodal.py:synth_media_table), and DuckDB's
# sha256() matches hashlib byte-for-byte — so even the mapInPandas feature
# stage replays in SQL: rebuild the payload HEX, do the stride byte-sums
# with hex-nibble arithmetic, and compare the rounded float32 features as
# exploded scalars. The engine-side Python round() is banker's vs the
# oracle's HALF_UP, verified midpoint-free on this corpus offline.
_MEDIA_IDS_SQL = """
    SELECT CAST(i AS BIGINT) AS media_id,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           repeat(sha256(CAST(i AS VARCHAR)), 4 + i % 5) AS hex,
           CAST(32 * (4 + i % 5) AS BIGINT) AS n_bytes
    FROM (SELECT unnest(range(96)) AS i)
"""


@register(
    "multimodal_features",
    oracle=f"""
WITH ids AS ({_MEDIA_IDS_SQL}),
bytes AS (
    SELECT media_id, t.b, n_bytes // 8 AS stride,
           16 * (strpos('0123456789abcdef', substr(hex, CAST(2 * t.b + 1 AS INT), 1)) - 1)
             + (strpos('0123456789abcdef', substr(hex, CAST(2 * t.b + 2 AS INT), 1)) - 1) AS v
    FROM ids, LATERAL (SELECT unnest(range(n_bytes)) AS b) t
),
chunks AS (
    SELECT media_id, b // stride AS j, sum(v) AS s, count(*) AS cnt
    FROM bytes GROUP BY media_id, b // stride
)
SELECT ids.media_id, ids.kind, ids.n_bytes,
       CAST(j AS INT) AS feat_idx,
       CAST(round(s / (255.0 * cnt), 6) AS FLOAT) AS feat_value
FROM chunks JOIN ids USING (media_id)
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake-decode feature extraction (mapInPandas; the
    real decoder is the documented environment stub). The synthetic
    payloads are sha256-derived, so a DuckDB oracle rebuilds them and
    replays the stride byte-sum features bit-exactly — the features
    array is exploded to scalar rows for the comparison (the operator's
    array contract is unchanged, operators/multimodal.py)."""
    media = synth_media_table(spark, n=96)
    feats = extract_features(media, decoder="fake")
    return feats.select(
        "media_id", "kind", "n_bytes", F.posexplode("features").alias("feat_idx", "feat_value")
    )


@register(
    "multimodal_frame_plan",
    oracle=f"""
WITH ids AS ({_MEDIA_IDS_SQL}),
vids AS (
    -- video duration_ms = 1000*(id+1) → n_frames = duration/1000 = id+1
    SELECT media_id, media_id + 1 AS n_frames FROM ids WHERE kind = 'video'
)
SELECT media_id, CAST(t.f AS INT) AS frame_idx, CAST(t.f * 1000 AS INT) AS sample_ts_ms
FROM vids, LATERAL (SELECT unnest(range(n_frames)) AS f) t
""",
)
def q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (explode-before-decode). The synthetic
    corpus's durations are id-derived, so the sampled timestamps replay
    exactly in DuckDB."""
    return frame_sample_plan(synth_media_table(spark, n=96), every_ms=1000)


@register("multimodal_jpeg_features")  # rows-only: Huffman+IDCT has no SQL twin
def q_multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode → image-statistics features through the
    Arrow-batched mapInPandas stage (r7 — un-gates the most common
    real-world image format; operators/jpeg.py is a pure stdlib+numpy
    baseline JFIF decoder: Annex-K Huffman, dequant, IDCT, YCbCr→RGB,
    4:4:4/4:2:2/4:2:0, restart intervals). The fixture table cycles
    subsampling modes and restart intervals and plants one corrupt
    payload per 16; corrupt rows surface as decoded=false with null
    features — the quarantine contract, not an exception. No DuckDB
    oracle: entropy decoding is not SQL-expressible (the driver records
    the rows-only check); the decode kernel itself is pinned by golden
    pytest against the engine's own encoder (flat-image exactness,
    round-trip error bounds, restart equivalence)."""
    from covid_data_challenge_spark.operators.multimodal import synth_jpeg_table

    media = synth_jpeg_table(spark, n=32)
    feats = extract_features(media, decoder="jpeg")
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("features").isNotNull().alias("decoded"),
        "features",
    )
