"""DSIR — Data Selection via Importance Resampling (arXiv:2302.03169).

Select raw-corpus documents that look like a curated target domain by
contrasting two bag-of-hashed-ngram models: hash every token into one of
``n_buckets`` buckets, fit add-one-smoothed unigram models over the
TARGET slice and the RAW corpus, and score each document by the summed
per-token log-likelihood ratio

    w(doc) = sum_tokens [ ln p_target(bucket) - ln p_raw(bucket) ]

Documents above a weight quantile are kept. This is the feature-space
half of DSIR (the paper then samples Gumbel-top-k; a rank/quantile
threshold is the deterministic, engine-portable equivalent — same
selected set in expectation, reproducible run to run).

Engine-portability: the log-ratios go through
:func:`functions.pmath.portable_ln` (correctly-rounded ops only), are
quantized to integer micro-nats PER BUCKET, and each document's weight
is an integer SUM of bucket units — order-independent, so the whole
operator is bit-exact against the DuckDB oracle.

Scale notes (100 TB): the model is one map-side-combined aggregation to
``n_buckets`` rows (constant size — broadcast back), doc scoring is a
broadcast join + one groupBy(doc_id), and the selection threshold is a
single global ``percentile`` over the doc-level table (no global sort,
no Window over the corpus). Everything is ∝ corpus with constant-size
state; skew-immune because bucket keys are md5-uniform.

Reference has no equivalent (no data-selection surface at all); this is
a north-star extension operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.pmath import portable_ln
from covid_data_challenge_spark.functions.text import tokens

#: hashed-feature space size for the registered query (the operator is
#: parameterized; the DSIR paper uses 10k buckets at production scale)
DSIR_BUCKETS = 256
DSIR_SALT = "dsir-v1"
#: integer quantization of per-bucket log-ratios: micro-nats
DSIR_UNITS = 1_000_000


def hashed_bucket(term: Column, n_buckets: int, salt: str) -> Column:
    """md5 token bucket, identical in Spark and DuckDB (same idiom as
    doc_feature_hashing)."""
    h = F.conv(F.substring(F.md5(F.concat(term, F.lit(salt))), 1, 8), 16, 10).cast(
        "long"
    )
    return ((h % n_buckets + n_buckets) % n_buckets).cast("int")


def _doc_bucket_counts(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int,
    salt: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(doc_id, is_target, bucket, cnt) hashed-token counts per doc."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            is_target.alias("is_target"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .select(
            "doc_id",
            "is_target",
            hashed_bucket(F.col("term"), n_buckets, salt).alias("bucket"),
        )
        .groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_weights(doc_buckets: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, w_units) — integer micro-nat log-ratio of the smoothed
    target vs raw unigram models, for every bucket seen in the corpus.

    w_units = floor(1e6 * (ln(ct+1) - ln(Nt+B) - ln(cr+1) + ln(Nr+B)))

    with ct/cr the bucket's target/raw token counts and Nt/Nr the model
    totals. ``cr`` counts NON-target docs only, matching the paper's
    p_raw (a target-inclusive mixture denominator dampens the contrast
    whenever the target slice is a large corpus fraction — the r3
    advisor's finding). All four logs are portable_ln; the combination
    order is pinned (left-to-right) to match the oracle's expression
    tree."""
    from pyspark.sql import Window

    per_bucket = doc_buckets.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "ct"
        ),
        F.sum(F.when(~F.col("is_target"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "cr"
        ),
    )
    # model totals as an unpartitioned window over the n_buckets-row
    # aggregate — the table is constant-sized, and this keeps the model
    # at ONE corpus scan (a separate totals agg would re-derive the
    # whole doc_buckets subtree: measured 6 parquet scans for the
    # end-to-end select before this rewrite, 3 after)
    wall = Window.partitionBy()
    with_tot = per_bucket.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(wall).alias("nt"),
        F.sum("cr").over(wall).alias("nr"),
    )
    b = F.lit(n_buckets).cast("long")
    w = (
        portable_ln(F.col("ct") + F.lit(1))
        - portable_ln(F.col("nt") + b)
        - portable_ln(F.col("cr") + F.lit(1))
        + portable_ln(F.col("nr") + b)
    )
    return with_tot.select(
        "bucket",
        F.floor(F.lit(float(DSIR_UNITS)) * w).cast("long").alias("w_units"),
    )


def dsir_doc_weights(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, is_target, n_tokens, w_units) importance weight per doc:
    integer sum of per-bucket units — order-free, hence hash-exact."""
    doc_buckets = _doc_bucket_counts(
        docs, is_target, n_buckets, salt, id_col, text_col
    )
    # the model is n_buckets rows — materialize it eagerly so every
    # downstream consumer (scoring join, threshold pass) embeds a
    # literal-sized broadcast instead of re-deriving the training scan
    weights = dsir_bucket_weights(doc_buckets, n_buckets).localCheckpoint(
        eager=True
    )
    return (
        doc_buckets.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "is_target")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w_units")).alias("w_units"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    keep_frac: float = 0.25,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Non-target documents whose importance weight is at or above the
    (1 - keep_frac) quantile — the DSIR-selected training slice.

    The threshold is ONE exact ``percentile`` over the doc-level weights
    (broadcast back as a 1-row table); ties at the threshold are all
    kept, so the result is a deterministic set, not a sample. At 100 TB
    switch ``percentile`` → ``approx_percentile`` (the documented
    engine-wide accuracy/scale switch)."""
    dw = dsir_doc_weights(docs, is_target, n_buckets, salt, id_col, text_col)
    raw = dw.filter(~F.col("is_target"))
    thr = raw.agg(
        F.percentile(F.col("w_units"), F.lit(1.0 - keep_frac)).alias("thr")
    )
    return (
        raw.join(F.broadcast(thr))
        .filter(F.col("w_units").cast("double") >= F.col("thr"))
        .select("doc_id", "n_tokens", "w_units")
    )
