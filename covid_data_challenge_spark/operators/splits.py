"""Deterministic train/val/test split assignment for training corpora.

A training-data pipeline must split a corpus so that (a) the assignment
is a pure function of the row's key — stable across reruns, cluster
sizes, and partitionings, and unchanged for existing rows when new data
arrives — and (b) grouped rows that would leak across splits (all docs
from one source/site/session) can be forced into the same split by
keying on the group column.

Mechanism: ``md5(key || salt)`` → compare a fixed-width hex prefix
lexicographically against cumulative-fraction thresholds. Pure
column expressions (whole-stage codegen, no shuffle, no UDF), and —
unlike ``rand(seed)`` or Spark's ``hash`` — reproducible bit-for-bit in
any engine with md5, which is why the DuckDB oracle can check it
exactly. The reference has no sampling/splitting surface at all; this is
a scale-path extension (task brief: training-data pipeline ops).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # 16^8 buckets: split boundaries are exact to ~2.3e-10


def split_thresholds(splits: Mapping[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound hex prefix) per split, cumulative. Fractions
    must sum to 1 (±1e-9). The last split takes the ELSE branch, so the
    full hash space is always covered."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, frac in splits.items():
        acc += frac
        bound = min(int(acc * (16**_HEX_WIDTH)), 16**_HEX_WIDTH - 1)
        out.append((name, format(bound, f"0{_HEX_WIDTH}x")))
    return out


def split_expr(key: Column, splits: Mapping[str, float], salt: str = "") -> Column:
    """CASE-WHEN column assigning a split label from the key's md5."""
    prefix = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEX_WIDTH)
    bounds = split_thresholds(splits)
    expr = F.lit(bounds[-1][0])
    for name, hexbound in reversed(bounds[:-1]):
        expr = F.when(prefix < F.lit(hexbound), F.lit(name)).otherwise(expr)
    return expr


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column keyed on ``key_col``.

    Key on the row id for an i.i.d. split; key on a group column
    (source, site, session) to keep whole groups in one split and
    prevent near-duplicate leakage across train/test.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_expr(F.col(key_col), splits, salt))


def split_sql_case(key_sql: str, splits: Mapping[str, float], salt: str = "") -> str:
    """The ANSI-SQL twin of :func:`split_expr` (used for DuckDB oracles)."""
    bounds = split_thresholds(splits)
    prefix = f"substr(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, {_HEX_WIDTH})"
    whens = "".join(
        f" WHEN {prefix} < '{hexbound}' THEN '{name}'" for name, hexbound in bounds[:-1]
    )
    return f"CASE{whens} ELSE '{bounds[-1][0]}' END"
