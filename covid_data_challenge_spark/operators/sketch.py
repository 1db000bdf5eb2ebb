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
