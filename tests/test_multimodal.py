"""Multimodal column plumbing: schema contracts, Arrow batch flow,
deterministic fake-decoder features, stubbed real decoder, and the
frame-sampling plan. (The decode kernels are stubbed by contract — see
operators/multimodal.py — so these tests pin everything around them.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from covid_data_challenge_spark.operators.multimodal import (
    FEATURE_DIM,
    FEATURES_SCHEMA,
    extract_features,
    frame_sample_plan,
    synth_media_table,
)


def test_extract_features_schema_and_determinism(spark):
    media = synth_media_table(spark, n=24)
    feats = extract_features(media, decoder="fake")
    assert feats.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 24
    for r in rows.values():
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] > 0
    # deterministic across runs (payloads are id-derived)
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert all(again[i] == rows[i]["features"] for i in rows)


def test_extract_features_n_bytes_matches_payload(spark):
    media = synth_media_table(spark, n=12)
    expected = {
        r["media_id"]: len(r["payload"]) for r in media.select("media_id", "payload").collect()
    }
    got = {r["media_id"]: r["n_bytes"] for r in extract_features(media).collect()}
    assert got == expected


def test_real_decoder_is_stubbed(spark):
    media = synth_media_table(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_features(media, decoder="real").collect()


def test_unknown_decoder_rejected(spark):
    with pytest.raises(ValueError):
        extract_features(synth_media_table(spark, n=3), decoder="nope")


def test_frame_sample_plan_counts_and_timestamps(spark):
    media = synth_media_table(spark, n=9)
    plan = frame_sample_plan(media, every_ms=1000)
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    rows = plan.collect()
    assert {r["media_id"] for r in rows} == set(durations)
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_media.items():
        assert len(frames) == max(durations[mid] // 1000, 1)
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f["sample_ts_ms"] == f["frame_idx"] * 1000 for f in frames)
