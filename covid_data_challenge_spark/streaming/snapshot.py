"""Snapshot-refresh as a stream (SURVEY.md §2.9's stretch slice).

The reference fetches its "current state" source once per run
(data_loader.py:142-146) and documents the staleness as a limitation
(README.md:174). Here the refresh is modeled properly: each new snapshot
file (the same disease.sh-shaped JSON array) becomes a micro-batch, and a
streaming aggregation maintains the latest-per-entity state — the exact
input the batch merge consumes, continuously fresh.

Scale notes: latest-per-key over refreshes is a declarative streaming agg
(``max_by`` on the update timestamp) — state is one row per entity,
O(|countries|), no watermark needed for a bounded key domain. For an
unbounded key domain, add a watermark on ``last_updated`` and
``dropDuplicatesWithinWatermark`` upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_challenge_spark.sources.readers import SNAPSHOT_SCHEMA, flatten_snapshot

#: Metrics carried into the maintained state (subset of the flattened
#: snapshot; extend freely — each is one more max_by in the agg).
STATE_METRICS = ("current_cases", "current_deaths", "current_recovered", "population")


def read_snapshot_stream(
    spark: SparkSession, directory: str, glob: str = "*.json"
) -> DataFrame:
    """JSON-array snapshot files appearing in ``directory`` → flattened
    snapshot stream (same projection as the batch reader S2–S4)."""
    raw = (
        spark.readStream.schema(SNAPSHOT_SCHEMA)
        .option("multiLine", True)
        .option("pathGlobFilter", glob)
        .json(directory)
    )
    return flatten_snapshot(raw)


def latest_snapshot_state(snapshots: DataFrame) -> DataFrame:
    """Latest-per-entity state across refreshes: the streaming twin of the
    batch ``latest_per_key`` alignment (A6), expressed as ``max_by`` on
    the snapshot's own update timestamp (complete-mode capable)."""
    return snapshots.groupBy("country").agg(
        F.max("last_updated").alias("last_updated"),
        *[F.max_by(m, "last_updated").alias(m) for m in STATE_METRICS],
    )


def incremental_gold_upsert(
    stream_df: DataFrame,
    gold_path: str,
    key: str,
    order_col: str,
    checkpoint: str,
    timeout_s: int = 120,
):
    """Maintain a parquet "gold" table from an update stream with
    ``foreachBatch``: each micro-batch is merged into the stored table,
    newest row per key wins (``max_by`` on ``order_col``).

    This is the sink-side half of incremental refresh — the reference
    recomputes its whole pipeline per run; here only the touched keys
    are re-resolved per micro-batch. foreachBatch gives the batch
    DataFrame API (joins against the existing gold table) inside a
    streaming query with transactional checkpointing. On engines with
    ACID table formats this is MERGE INTO; over raw parquet we rewrite
    the merged table, which is correct (idempotent per batch) but
    rewrite-cost O(|gold|) — the documented upgrade at 100 TB is a
    partitioned rewrite of only the partitions a batch touches.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(gold_path)
        except Exception:
            existing = None
        merged = batch_df if existing is None else existing.unionByName(batch_df)
        latest = merged.groupBy(key).agg(
            F.max(order_col).alias(order_col),
            *[
                F.max_by(c, order_col).alias(c)
                for c in merged.columns
                if c not in (key, order_col)
            ],
        )
        # rewrite to a temp dir then swap would be the production move;
        # overwrite is fine for the local harness (one writer).
        latest.write.mode("overwrite").parquet(gold_path + "_next")
        next_df = spark.read.parquet(gold_path + "_next")
        next_df.write.mode("overwrite").parquet(gold_path)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def cms_stream_update(
    stream_df: DataFrame,
    gold_path: str,
    checkpoint: str,
    key_col: str = "user_id",
    depth: int = 4,
    hex_chars: int = 2,
    timeout_s: int = 120,
):
    """Maintain a count-min sketch gold grid from an event stream: each
    micro-batch folds into its own depth×width grid (operators/sketch.py
    cms_build) and merges into the stored grid by plain ADDITION on
    (sk_row, bucket) — the mergeability that makes sketches the right
    100 TB frequency state. The gold grid is O(depth·16^hex_chars) rows
    forever, whatever the stream volume; heavy-hitter queries probe it
    via cms_estimate without touching raw events. Identical md5
    bucketing to the batch operator, so a streamed grid equals the
    batch grid over the same rows EXACTLY (pinned in pytest).
    """
    from covid_data_challenge_spark.operators.sketch import cms_build

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grid = cms_build(batch_df.select(key_col), key_col, depth, hex_chars)
        try:
            existing = spark.read.parquet(gold_path)
        except Exception:
            existing = None
        merged = (
            grid
            if existing is None
            else existing.unionByName(grid)
            .groupBy("sk_row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        merged.write.mode("overwrite").parquet(gold_path + "_next")
        spark.read.parquet(gold_path + "_next").write.mode("overwrite").parquet(
            gold_path
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def quantile_grid_stream_update(
    stream_df: DataFrame,
    gold_path: str,
    checkpoint: str,
    group_col: str = "event_type",
    value_col: str = "value",
    bin_width: float = 5.0,
    timeout_s: int = 120,
):
    """Maintain the fixed-bin quantile grid (operators/sketch.py:
    quantile_sketch_build) as streaming state: each micro-batch bins its
    own rows and merges into the stored grid by ADDITION on
    (group, bin) — same mergeability argument as cms_stream_update, so
    a streamed grid equals the batch grid over the same rows exactly
    (pinned in pytest). Quantile queries read the O(|groups|·|bins|)
    gold table via quantile_sketch_estimate without touching raw
    events."""
    from covid_data_challenge_spark.operators.sketch import quantile_sketch_build

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grid = quantile_sketch_build(batch_df, group_col, value_col, bin_width)
        try:
            existing = spark.read.parquet(gold_path)
        except Exception:
            existing = None
        merged = (
            grid
            if existing is None
            else existing.unionByName(grid)
            .groupBy(group_col, "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        merged.write.mode("overwrite").parquet(gold_path + "_next")
        spark.read.parquet(gold_path + "_next").write.mode("overwrite").parquet(
            gold_path
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
