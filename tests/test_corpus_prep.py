"""Tests for chunking, mixture sampling, and PII redaction (the
corpus-prep operators added alongside splits/packing)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.text import (
    pii_match_count,
    redact_pii,
    tokens,
)
from covid_data_challenge_spark.operators.chunking import chunk_tokens
from covid_data_challenge_spark.operators.sampling import mixture_sample

# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def _chunk(spark, text: str, chunk: int, stride: int):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = chunk_tokens(
        df.select("doc_id", tokens(F.col("text")).alias("t")),
        F.col("t"),
        ["doc_id"],
        chunk,
        stride,
    )
    return sorted(out.collect(), key=lambda r: r.chunk_id)


def test_chunk_short_doc_is_one_whole_chunk(spark):
    rows = _chunk(spark, "a b c", chunk=64, stride=48)
    assert len(rows) == 1
    assert rows[0].chunk_tokens == 3
    assert rows[0].chunk_text == "a b c"


def test_chunk_overlap_and_tail(spark):
    # 10 tokens, chunk=4, stride=3 → starts 0,3,6,9; tails shrink.
    words = [f"w{i}" for i in range(10)]
    rows = _chunk(spark, " ".join(words), chunk=4, stride=3)
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[3].chunk_text == "w9"
    assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]


def test_chunk_reconstruction_covers_every_token(spark):
    # With stride <= chunk, the union of chunk spans covers all tokens.
    words = [f"t{i}" for i in range(57)]
    rows = _chunk(spark, " ".join(words), chunk=8, stride=5)
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split(" "))
    assert seen == set(words)
    assert len(rows) == math.ceil(57 / 5)


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------


def _mix_df(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
    )


def test_mixture_whole_weights_exact(spark):
    out = mixture_sample(_mix_df(spark), "doc_id", "grp", {"g0": 2.0, "g1": 1.0, "g2": 0.0, "g3": 3.0})
    counts = {r.grp: r.cnt for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"g0": 1000, "g1": 500, "g3": 1500}  # g2 dropped entirely
    idx = {r.grp: r.mx for r in out.groupBy("grp").agg(F.max("copy_idx").alias("mx")).collect()}
    assert idx == {"g0": 1, "g1": 0, "g3": 2}


def test_mixture_fractional_rate_within_tolerance(spark):
    out = mixture_sample(_mix_df(spark), "doc_id", "grp", {"g0": 0.5, "g1": 1.5, "g2": 1.0, "g3": 1.0})
    counts = {r.grp: r.cnt for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    # 500 keys per group; md5 coin ⇒ binomial(500, .5): ±5σ ≈ ±56
    assert abs(counts["g0"] - 250) < 60
    assert abs(counts["g1"] - 750) < 60


def test_mixture_is_deterministic_and_partitioning_invariant(spark):
    df = _mix_df(spark, 500)
    w = {"g0": 1.3, "g1": 0.7, "g2": 2.1, "g3": 0.0}
    a = sorted(map(tuple, mixture_sample(df, "doc_id", "grp", w).collect()))
    b = sorted(map(tuple, mixture_sample(df.repartition(13), "doc_id", "grp", w).collect()))
    assert a == b


def test_mixture_salt_changes_fractional_sample_only(spark):
    df = _mix_df(spark, 500)
    w = {"g0": 0.5, "g1": 1.0, "g2": 1.0, "g3": 1.0}
    a = set(r.doc_id for r in mixture_sample(df, "doc_id", "grp", w, salt="s1").collect())
    b = set(r.doc_id for r in mixture_sample(df, "doc_id", "grp", w, salt="s2").collect())
    assert a != b  # different coin
    g1plus = set(r.doc_id for r in df.filter(F.col("grp") != "g0").collect())
    assert g1plus <= a and g1plus <= b  # whole-weight groups unaffected


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_goldens(spark):
    df = spark.createDataFrame(
        [
            Row(i=0, t="mail me at jane.doe+spam@mail.example.org today"),
            Row(i=1, t="call +44-207-9460000 or +1-555-0100"),
            Row(i=2, t="no pii here, just words and 42"),
            Row(i=3, t="x@y.io and +1-555-0199 both"),
        ]
    )
    out = {
        r.i: (r.red, r.n)
        for r in df.select(
            "i",
            redact_pii(F.col("t")).alias("red"),
            pii_match_count(F.col("t")).alias("n"),
        ).collect()
    }
    assert out[0] == ("mail me at <EMAIL> today", 1)
    assert out[1] == ("call <PHONE> or <PHONE>", 2)
    assert out[2] == ("no pii here, just words and 42", 0)
    assert out[3] == ("<EMAIL> and <PHONE> both", 2)
