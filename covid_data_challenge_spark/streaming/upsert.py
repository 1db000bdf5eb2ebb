"""Streaming CDC upsert: maintain a gold snapshot from a change stream.

The streaming half of operators/cdc.py: change batches (files of
``(key, op, new_value)`` rows) arrive as micro-batches, and each batch
is MERGE-applied to the current gold snapshot inside ``foreachBatch`` —
the standard Structured Streaming pattern for sinks that need per-batch
batch-DataFrame semantics (upserts) rather than append. Complements
streaming/snapshot.py's ``incremental_gold_upsert`` (latest-wins on a
version column, no deletes): this one speaks a real CDC op vocabulary
(I/U/D — deletes actually remove rows) and commits VERSIONED snapshots.

Snapshot storage is VERSIONED: batch N writes ``gold/v{N+1}`` and then
moves a marker file — never overwriting the version it just read, since
Spark cannot safely read and overwrite one parquet path in a single
job. This is the no-table-format core of what Delta/Iceberg commit
logs provide: readers always see a complete snapshot, a crashed batch
leaves the previous version intact, and ``foreachBatch``'s
at-least-once redelivery is absorbed because re-applying the same
change batch to the version it already produced is idempotent for
U/D and for I of already-present keys (apply_changes degrades 'I' on an
existing key to an update of the same value). Old versions are kept —
pruning them is the retention job, exactly like VACUUM.

Scale notes: per micro-batch cost is the one-key-join MERGE shape from
operators/cdc.py; at 100 TB the gold table is bucketed on the merge key
so each batch's join is shuffle-free on the base side, and the version
marker swap stays O(1) metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from covid_data_challenge_spark.operators.cdc import apply_changes

#: Change-feed file schema (file streams need a declared schema).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("new_value", T.LongType()),
    ]
)

_MARKER = "_LATEST"


def _latest_version(gold_dir: str) -> int:
    try:
        with open(os.path.join(gold_dir, _MARKER)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def read_gold(
    spark: SparkSession, gold_dir: str, version: int | None = None
) -> DataFrame:
    """Current snapshot = the version the marker points at; pass
    ``version`` to time-travel to any version still inside the
    retention window (see :func:`vacuum_gold`)."""
    v = _latest_version(gold_dir) if version is None else version
    return spark.read.parquet(os.path.join(gold_dir, f"v{v}"))


def init_gold(base: DataFrame, gold_dir: str) -> None:
    """Write version 0 of the snapshot and point the marker at it."""
    base.write.mode("overwrite").parquet(os.path.join(gold_dir, "v0"))
    _commit(gold_dir, 0)


def _commit(gold_dir: str, version: int) -> None:
    # single small file; os.replace is atomic on POSIX — the reader
    # never observes a torn marker (a real deployment uses the object
    # store's conditional-put here, same contract)
    tmp = os.path.join(gold_dir, f".{_MARKER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(gold_dir, _MARKER))


def read_change_stream(
    spark: SparkSession, changes_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based CDC feed. ORDERING CONTRACT: Structured Streaming's
    file source sequences the backlog by file MODIFICATION TIME (ms
    granularity on local/HDFS file systems), and an mtime tie is broken
    in an unspecified, non-path order — measured here: two same-ms
    change files can apply in either order (the root cause of a
    once-in-r6 test flake). Since apply order IS the CDC semantics,
    producers must guarantee strictly increasing mtimes per file (one
    file per trigger interval, or an explicit utime stamp); feeds that
    can't should carry a sequence column and window the merge instead
    (operators/cdc.apply_changes on max_by(seq))."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger is not None:
        # respected under Trigger.AvailableNow: splits the backlog into
        # deterministic micro-batches (used by tests to prove sequencing)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(changes_dir)


def start_streaming_upsert(
    spark: SparkSession,
    changes_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Run the change stream into the versioned gold table
    (Trigger.AvailableNow; call repeatedly for a scheduled pipeline, or
    drop the trigger for continuous)."""
    changes = read_change_stream(spark, changes_dir, max_files_per_trigger)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        base = read_gold(spark, gold_dir)
        v = _latest_version(gold_dir)
        merged = apply_changes(
            base, batch_df, "key", "value", "new_value", "op", with_action=False
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(gold_dir, f"v{v + 1}")
        )
        _commit(gold_dir, v + 1)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_gold(gold_dir: str, keep_versions: int = 2) -> list[int]:
    """Retention: delete snapshot versions older than the newest
    ``keep_versions`` (the committed version is always kept). The
    versioned layout makes this trivially safe — the marker never
    points at a pruned version, and a reader that resolved the marker
    before the prune reads a version inside the retention window, the
    same time-travel-window contract as Delta's VACUUM. Returns the
    pruned version numbers."""
    import re
    import shutil

    latest = _latest_version(gold_dir)
    versions = sorted(
        int(m.group(1))
        for name in os.listdir(gold_dir)
        if (m := re.fullmatch(r"v(\d+)", name))
    )
    cutoff = latest - keep_versions + 1
    pruned = [v for v in versions if v < cutoff]
    for v in pruned:
        shutil.rmtree(os.path.join(gold_dir, f"v{v}"))
    return pruned
