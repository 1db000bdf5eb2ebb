"""Mergeable-sketch operators (Apache DataSketches HLL, built into Spark).

The 100 TB distinct-count pattern: sketch once at the finest grain, then
ROLL UP by unioning sketches — no re-scan of the facts for each new
grouping, and sketches from different days/partitions/clusters merge
associatively. ``count(DISTINCT …)`` cannot do any of that (it needs the
raw keys at every grain).

Estimates are exact while a sketch is in sparse mode (cardinalities up to
~½·2^lg_k) and within ~1.6%/√(2^lg_k) beyond — so at the oracle's test
cardinalities the estimates equal the exact counts, which is what lets
the DuckDB gate hash-check this operator at test SF while the same code
is approximate-but-mergeable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(df: DataFrame, group_col: str, key_col: str, lg_k: int = 12) -> DataFrame:
    """One HLL sketch of ``key_col`` per ``group_col`` value, with its
    estimate. Keep the ``sketch`` column — it is the mergeable artifact."""
    per = df.groupBy(group_col).agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))
    return per.select(
        group_col,
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
        "sketch",
    )


def rollup_sketches(sketches: DataFrame) -> DataFrame:
    """Union per-group sketches into one — the re-aggregation step that
    replaces a full re-scan when coarsening the grouping."""
    return sketches.agg(F.hll_union_agg("sketch").alias("sketch")).select(
        F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy hitters)
# ---------------------------------------------------------------------------
#
# The 100 TB frequency-estimation pattern: one pass over the facts folds
# every key into a depth × width counter grid (width = 16^hex_chars
# buckets per row, bucket = md5 hex prefix of ``row:key``). The grid is
# tiny (depth·width rows), mergeable by plain addition across
# days/partitions/clusters, and answers "how often does key k occur?"
# with ``min`` over its depth buckets — overestimating by at most
# ~2·N/width with probability 1-2^-depth, never underestimating.
#
# md5 (not Spark hash/xxhash64) keeps the bucket assignment
# engine-portable, so a DuckDB oracle reproduces the sketch — and the
# estimates — bit-for-bit (same discipline as operators/splits.py).


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, hex_chars: int = 2
) -> DataFrame:
    """Fold ``df[key_col]`` into a count-min sketch: one row per
    (sk_row, bucket) with its collision count.

    The explode emits ``depth`` rows per input row, but map-side partial
    aggregation collapses them to ≤ depth·16^hex_chars rows per task
    before the (tiny) shuffle — the scan dominates, as it should."""
    bucketed = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("sk_row"),
        F.col(key_col).cast("string").alias("k"),
    ).select(
        "sk_row",
        F.substring(
            F.md5(F.concat_ws(":", F.col("sk_row"), F.col("k"))), 1, hex_chars
        ).alias("bucket"),
    )
    return bucketed.groupBy("sk_row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Estimated count per key in ``keys``: min over the key's ``depth``
    sketch buckets. The sketch is depth·16^hex_chars rows — always
    broadcast — so probing any candidate set is a map-side join."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("sk_row"),
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(
                F.concat_ws(":", F.col("sk_row"), F.col(key_col).cast("string"))
            ),
            1,
            hex_chars,
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["sk_row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_sketch_sql(table: str, key_sql: str, depth: int = 4, hex_chars: int = 2) -> str:
    """DuckDB twin of :func:`cms_build` as a CTE body (bit-exact)."""
    return f"""
SELECT t.i AS sk_row,
       substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST({key_sql} AS VARCHAR)), 1, {hex_chars}) AS bucket,
       count(*) AS cnt
FROM {table} CROSS JOIN range(0, {depth}) t(i)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Fixed-bin quantile sketch
# ---------------------------------------------------------------------------
#
# The third mergeable sketch next to HLL (distinct) and count-min
# (frequency): a fixed-width histogram whose per-(group, bin) counts merge
# by addition across days/partitions/clusters — one map-side-combined
# shuffle on (group, bin) no matter the data volume — and answer quantile
# queries by cumulative walk + linear interpolation inside the straddling
# bin. Error is bounded by the bin width (vs t-digest's adaptive bins);
# the fixed grid is what makes the sketch trivially mergeable AND
# engine-portable, so the estimates — not just the counts — replay
# bit-exactly in DuckDB.


def quantile_sketch_build(
    df: DataFrame, group_col: str, value_col: str, bin_width: float
) -> DataFrame:
    """(group, bin, cnt) histogram grid; bin = floor(value / width)."""
    return (
        df.select(
            F.col(group_col),
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
        )
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_sketch_estimate(
    sketch: DataFrame,
    group_col: str,
    quantiles: list[float],
    bin_width: float,
    digits: int = 4,
) -> DataFrame:
    """Per-group quantile estimates from the grid → (group, q, est).

    For each requested q: walk the cumulative counts to the straddling
    bin, then interpolate ``bin_start + width·(q·total − cum_below)/cnt``.
    The walk is a per-group window cumsum + an argmin over qualifying
    bins — all grid-sized work (|groups| × |bins|), independent of the
    row count the grid summarized."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("bin")
    cum = sketch.select(
        group_col,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(Window.partitionBy(group_col)).alias("__total"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    hit = (
        cum.select(group_col, "bin", "cnt", "__cum", "__total", qs)
        .filter(F.col("__cum") >= F.col("q") * F.col("__total"))
        .groupBy(group_col, "q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "__cum", "__total"), F.col("bin")
            ).alias("__b")
        )
        .select(group_col, "q", "__b.*")
    )
    est = (
        F.col("bin") * bin_width
        + bin_width * (F.col("q") * F.col("__total") - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
    )
    return hit.select(group_col, "q", F.round(est, digits).alias("est"))
