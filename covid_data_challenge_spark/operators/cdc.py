"""CDC apply: MERGE a change batch onto a snapshot, no table format.

The lakehouse MERGE INTO (Delta/Iceberg) expressed as a plain DataFrame
plan: one full-outer join on the merge key, deletes filtered post-join,
per-row actions emitted for audit parity with MERGE's matched /
not-matched clauses. Used by the registry query ``cdc_upsert_apply``
(hash-checked against DuckDB) and by the streaming upsert
(streaming/upsert.py), which replays it per micro-batch.

Scale shape: ONE shuffle join on the merge key — and with the snapshot
stored bucketed on that key (sinks.write_bucketed_table) the base-side
exchange disappears entirely, which is how a daily 100 TB upsert stays
bounded by the (much smaller) change batch. Spark cannot broadcast a
full-outer side, so the join is sort-merge by construction; that is the
honest MERGE shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    value_col: str,
    new_value_col: str = "new_value",
    op_col: str = "op",
    with_action: bool = True,
) -> DataFrame:
    """Apply a change batch to a snapshot.

    ``base``: (key, value). ``changes``: (key, op ∈ {'I','U','D'},
    new_value — null for deletes). Contract: at most one change row per
    key per batch (dedupe upstream with latest-per-key if the feed can
    repeat). Inserts must use keys absent from base; updates/deletes
    keys present — violations degrade gracefully (an 'I' on an existing
    key behaves as an update) rather than erroring, matching MERGE's
    whenMatched/whenNotMatched fall-through.
    """
    merged = base.join(changes, key_col, "full_outer")
    out = merged.filter(F.col(op_col).isNull() | (F.col(op_col) != "D")).select(
        key_col,
        F.coalesce(new_value_col, value_col).alias(value_col),
        F.when(F.col(op_col) == "U", "updated")
        .when(F.col(op_col) == "I", "inserted")
        .otherwise("kept")
        .alias("action"),
    )
    return out if with_action else out.drop("action")
