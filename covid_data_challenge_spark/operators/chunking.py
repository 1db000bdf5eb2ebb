"""Fixed-size token chunking with overlap (context-window preparation).

A training pipeline cuts each document's token stream into model-sized
windows: chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``,
so consecutive chunks overlap by ``chunk_size - stride`` tokens. The
reference has no chunking surface (its texts are row-granular); this is a
scale-path extension from the task brief (training-data pipeline ops).

Spark shape: pure column expressions — ``split`` → ``sequence`` of chunk
starts → ``explode`` → ``slice``/``array_join``. No UDF, no shuffle: the
explode is map-side, so a 100 TB corpus chunks at scan speed and the
output inherits the input partitioning. Row-count amplification is
bounded by ``ceil(n_tokens / stride)`` per doc, which AQE's coalescing
handles downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    tokens: Column,
    id_cols: list[str],
    chunk_size: int,
    stride: int,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Explode ``tokens`` (array<string>) into overlapping fixed-size
    chunks. Emits ``{prefix}_id`` (0-based), ``{prefix}_tokens`` (actual
    token count, < chunk_size only for the tail chunk) and
    ``{prefix}_text`` (space-joined tokens)."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride))
    exploded = df.select(
        *id_cols,
        tokens.alias("__toks"),
        n.alias("__n"),
        F.explode(starts).alias("__start"),
    )
    return exploded.select(
        *id_cols,
        (F.col("__start") / stride).cast("int").alias(f"{out_prefix}_id"),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("__start"))
        .cast("int")
        .alias(f"{out_prefix}_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + F.lit(1), F.lit(chunk_size)), " "
        ).alias(f"{out_prefix}_text"),
    )


def chunking_oracle_sql(
    norm_text_sql: str, chunk_size: int, stride: int, table: str = "documents"
) -> str:
    """DuckDB replay of :func:`chunk_tokens` over whitespace tokens of the
    normalized text (same start grid, same slice bounds)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({norm_text_sql}, ' ') AS t FROM {table}
),
ex AS (
  SELECT doc_id, t, len(t) AS n,
         unnest(generate_series(0, greatest(len(t) - 1, 0), {stride})) AS s
  FROM toks
)
SELECT doc_id,
       CAST(s // {stride} AS INT) AS chunk_id,
       CAST(least({chunk_size}, n - s) AS INT) AS chunk_tokens,
       array_to_string(t[s + 1 : s + {chunk_size}], ' ') AS chunk_text
FROM ex
"""
