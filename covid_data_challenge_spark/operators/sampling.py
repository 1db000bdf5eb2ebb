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


def md5_unit_fraction(key: Column) -> Column:
    """Deterministic uniform-[0,1) draw per key: the first 8 hex nibbles
    of md5(key) as an integer over 2^32. Spark parses the prefix with
    one ``conv(hex, 16, 10)``; the DuckDB twin keeps the positional
    strpos arithmetic (DuckDB has no conv()) — value-identical, pinned
    by every weighted-sampling oracle. The per-row coin behind weighted
    sampling."""
    hx = F.md5(key.cast("string"))
    return (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").cast("double")
        / F.lit(float(1 << 32))
    )


def md5_unit_fraction_sql(key_sql: str) -> str:
    """DuckDB twin of :func:`md5_unit_fraction`."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(CAST({key_sql} AS VARCHAR)), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ") / 4294967296.0"
    )


def weighted_sample(df: DataFrame, key_col: str, weight_col: str) -> DataFrame:
    """Soft (probability-weighted) filter: keep each row with probability
    ``weight_col`` (a [0,1] score), decided by a deterministic per-key
    uniform draw — the FineWeb/DataComp-style 'soft quality filtering'
    move, where a hard threshold would discard every mid-quality
    document instead of thinning them proportionally. Map-side only (a
    filter on a scan), stable across reruns/partitionings/engines, and
    the decision replays bit-exactly in a DuckDB oracle because both the
    draw and the weight are exact-replayable columns."""
    return df.filter(md5_unit_fraction(F.col(key_col)) < F.col(weight_col))


def hash_reservoir_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-key uniform sample of ``n`` rows — the
    hash-ranked equivalent of reservoir sampling, used as the per-source
    document cap in training-data recipes ("at most N docs from any one
    crawl/domain").

    Rows rank within their key by ``md5(id || salt)`` (uniform, engine-
    portable — same discipline as :func:`mixture_sample`) and the ``n``
    smallest survive. Identical in distribution to a true reservoir but
    stable across reruns, partitionings, and engines, so a DuckDB oracle
    replays it bit-for-bit. The rank-limit window compiles to
    WindowGroupLimit (partial before the exchange), so capping a 100 TB
    corpus shuffles ~n·|keys| rows, not the corpus — same plan family as
    latest_per_key (pinned in test_plans).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("__rh"), F.col(id_col))
    return (
        df.withColumn(
            "__rh", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .drop("__rh")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global corpus shuffle, the scalable way: hash each
    row into one of ``n_shards`` equal hash-range shards, then rank
    within its shard by the hash (tie-break on the key). This is the
    shard-then-sort idiom training loaders expect (WebDataset-style):
    no global row_number — a single-partition window that would
    serialize 100 TB through one task — just one hash-partition shuffle
    and per-shard parallel windows. Reading shards in order while
    interleaving within shards reproduces the permutation exactly on
    any engine (md5 is portable; see mixture_sample)."""
    from pyspark.sql import Window

    prefix = F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, _HEX_WIDTH)
    bounds = [
        (str(i), format(((i + 1) * 16**_HEX_WIDTH) // n_shards - 1, f"0{_HEX_WIDTH}x"))
        for i in range(n_shards)
    ]
    shard = F.lit(int(bounds[-1][0]))
    for name, hexbound in reversed(bounds[:-1]):
        shard = F.when(prefix <= F.lit(hexbound), F.lit(int(name))).otherwise(shard)
    w = Window.partitionBy("shard").orderBy("shuffle_hash", key_col)
    return (
        df.withColumn("shuffle_hash", prefix)
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )


def shuffle_shards_oracle_sql(
    key_sql: str, n_shards: int, salt: str = "", table: str = "documents"
) -> str:
    """DuckDB replay of :func:`shuffle_shards` (same boundaries, same
    tie-break)."""
    bounds = [
        (i, format(((i + 1) * 16**_HEX_WIDTH) // n_shards - 1, f"0{_HEX_WIDTH}x"))
        for i in range(n_shards)
    ]
    case_sql = "CASE " + " ".join(
        f"WHEN h <= '{hexbound}' THEN {i}" for i, hexbound in bounds[:-1]
    ) + f" ELSE {bounds[-1][0]} END"
    return f"""
WITH hashed AS (
  SELECT {key_sql},
         substring(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, {_HEX_WIDTH}) AS h
  FROM {table}
)
SELECT {key_sql}, h AS shuffle_hash, CAST({case_sql} AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY {case_sql} ORDER BY h, {key_sql}) AS INT) AS pos
FROM hashed
"""


def mixture_sample_dynamic(
    df: DataFrame,
    key_col: str,
    group_col: str,
    epochs: DataFrame,
    epoch_col: str = "effective_epochs",
    salt: str = "",
) -> DataFrame:
    """Mixture sampling with DATA-DEPENDENT epoch weights: like
    :func:`mixture_sample`, but the per-group weight comes from a
    (small, broadcast) table computed upstream — e.g. the α-temperature
    weights of ``temperature_mixture_weights`` — instead of a literal
    dict baked into the plan. copies = ⌊e⌋ + (md5-coin < frac(e)), so
    expected copies per row is exactly its group's epoch weight and the
    decision is a pure function of (key, salt) — reproducible on any
    engine or partitioning. The fractional coin compares two doubles
    that are bit-identical across engines (md5_unit_fraction and the
    upstream weight pipeline both quantize integer-first)."""
    j = df.join(F.broadcast(epochs.select(group_col, epoch_col)), group_col)
    e = F.col(epoch_col)
    whole = F.floor(e).cast("int")
    coin = F.when(
        md5_unit_fraction(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
        < e - F.floor(e),
        1,
    ).otherwise(0)
    copies = whole + coin
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return j.withColumn("copy_idx", F.explode(seq))
