"""Deterministic data-mixture sampling (per-source epoch weights).

LLM data recipes assign each corpus source a *mixture weight*: 2.5 means
"repeat this source 2.5 epochs", 0.4 means "keep a 40 % sample". Both
directions reduce to one rule per row, given weight ``r``:

    copies = floor(r) + (1 if frac_hash(key) < r - floor(r) else 0)

where ``frac_hash`` is a uniform-[0,1) *deterministic* hash of the row
key — the same md5-prefix trick as ``operators/splits.py``, so the
sample is stable across reruns, partitionings, and engines (which is why
a DuckDB oracle can check it bit-for-bit; ``rand(seed)`` is not portable
and not even stable across Spark partitionings).

Spark shape: a CASE-WHEN on the group column (weights are a tiny static
recipe — no join at all), then ``explode(sequence(...))`` to emit
``copies`` rows. Pure codegen, map-side only: sampling 100 TB is a scan,
and upsampled copies carry ``copy_idx`` so a downstream global shuffle
can interleave them.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8


def _frac_bound_hex(frac: float) -> str:
    """Hex prefix upper bound s.t. P(md5 prefix < bound) == frac."""
    return format(min(int(frac * 16**_HEX_WIDTH), 16**_HEX_WIDTH - 1), f"0{_HEX_WIDTH}x")


def copies_expr(
    key: Column, group: Column, weights: Mapping[str, float], salt: str = ""
) -> Column:
    """Integer column: how many copies of this row the mixture keeps."""
    prefix = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEX_WIDTH)
    expr = F.lit(0)
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for {name!r}")
        whole, frac = int(math.floor(w)), w - math.floor(w)
        branch = F.lit(whole)
        if frac > 0:
            branch = branch + F.when(prefix < F.lit(_frac_bound_hex(frac)), 1).otherwise(0)
        expr = F.when(group == F.lit(name), branch).otherwise(expr)
    return expr


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Emit ``copies`` rows per input row (0 ⇒ dropped), with ``copy_idx``
    0..copies-1 distinguishing upsampled repeats."""
    copies = copies_expr(F.col(key_col), F.col(group_col), weights, salt)
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(seq))


def mixture_oracle_sql(
    key_sql: str,
    group_sql: str,
    weights: Mapping[str, float],
    salt: str = "",
    table: str = "documents",
    extra_cols: str = "",
) -> str:
    """DuckDB replay: same md5 prefix, same CASE recipe, generate_series
    for the copies."""
    frac_cases, whole_cases = [], []
    for name, w in weights.items():
        whole, frac = int(math.floor(w)), w - math.floor(w)
        extra = (
            f"CASE WHEN h < '{_frac_bound_hex(frac)}' THEN 1 ELSE 0 END" if frac > 0 else "0"
        )
        whole_cases.append(f"WHEN '{name}' THEN {whole} + {extra}")
        frac_cases.append(name)
    case_sql = f"CASE {group_sql} " + " ".join(whole_cases) + " ELSE 0 END"
    return f"""
WITH hashed AS (
  SELECT *, substring(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, {_HEX_WIDTH}) AS h
  FROM {table}
),
counted AS (
  SELECT *, {case_sql} AS copies FROM hashed
)
SELECT {key_sql}, {group_sql}{extra_cols},
       CAST(unnest(generate_series(0, copies - 1)) AS INT) AS copy_idx
FROM counted
WHERE copies > 0
"""
