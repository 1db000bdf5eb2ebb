"""Sequence packing: assign documents to token-budget bins for LLM
training batches.

Training pipelines pack variable-length documents into fixed-token-budget
sequences so accelerator batches waste no padding. The reference has no
such surface (it is a COVID analytics pipeline); this is a scale-path
extension alongside dedup/splits (task brief: training-data pipeline ops).

Semantics (deterministic, engine-portable — the DuckDB oracle replays it
bit-for-bit with a recursive CTE):

1. **Shard** each doc by the first hex character of ``md5(doc_id)`` — 16
   independent packing streams, a pure function of the key (stable across
   reruns, cluster sizes, partitionings).
2. Within a shard, walk docs in ``doc_id`` order and **greedy-fill**: a
   doc starts a new bin when adding it would push the running fill over
   ``budget``. A doc larger than the budget gets a bin of its own (the
   greedy rule yields this with no special case).

Scale design: one shuffle on the shard key, then an Arrow-batched
``applyInPandas`` whose per-group state is two integers (the running walk
is inherently sequential — a prefix sum *with reset*, which no SQL window
frame expresses — so the grouped-map escape hatch is the right tool, per
the task brief's custom-operator ladder). At 100 TB raise ``shard_hex``
to 2-3 hex chars (256/4096 streams) so every shard fits an executor and
all cores pack concurrently; packing quality is unchanged because each
stream is still greedy over a uniform random sample of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_expr(key: Column, shard_hex: int = 1) -> Column:
    """Shard label: leading hex chars of md5(key). 16**shard_hex shards."""
    return F.substring(F.md5(key.cast("string")), 1, shard_hex)


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_hex: int = 1,
) -> DataFrame:
    """→ (id_col, shard, bin, token_col): greedy sequential packing of
    each md5-shard in id order. ``bin`` is the 0-based bin index within
    the shard; (shard, bin) is the globally unique pack key."""
    import pandas as pd

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for t in pdf[token_col].astype("int64"):
            if bins and fill + t > budget:
                cur += 1
                fill = 0
            fill += int(t)
            bins.append(cur)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[[id_col, "shard", "bin", token_col]]

    sharded = df.select(
        F.col(id_col),
        shard_expr(F.col(id_col), shard_hex).alias("shard"),
        F.col(token_col).cast("int").alias(token_col),
    )
    schema = f"{id_col} long, shard string, bin long, {token_col} int"
    return sharded.groupBy("shard").applyInPandas(pack_shard, schema=schema)


def packing_stats(packed: DataFrame, token_col: str, budget: int) -> DataFrame:
    """Per-bin utilization: docs packed, tokens filled, fraction of
    budget used. The downstream batch loader reads this to size epochs."""
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("tokens"),
        # budget is a power of two in practice → the division is exact in
        # binary, so the oracle compare needs no rounding-mode agreement
        (F.sum(token_col).cast("double") / F.lit(float(budget))).alias("utilization"),
    )


def packing_oracle_sql(
    budget: int, norm_expr: str, shard_hex: int = 1, stats: bool = False
) -> str:
    """DuckDB twin of :func:`pack_greedy` over the ``documents`` table:
    the greedy walk as a recursive CTE stepping row_number within each
    shard. Exact at test SF; the point is that the Spark operator's
    output is pinned bit-for-bit by an independent engine. ``stats=True``
    returns the :func:`packing_stats` aggregation instead."""
    final = (
        f"""SELECT shard, bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(n_tokens) AS DOUBLE) / {budget} AS utilization
FROM walk GROUP BY shard, bin"""
        if stats
        else "SELECT doc_id, shard, bin, n_tokens FROM walk"
    )
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, n_tokens, shard,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM (
    SELECT doc_id,
           CAST(len(string_split({norm_expr}, ' ')) AS INT) AS n_tokens,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, {shard_hex}) AS shard
    FROM documents
  )
),
walk AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin, n_tokens AS fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.fill + t.n_tokens > {budget} THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n_tokens > {budget} THEN t.n_tokens
              ELSE w.fill + t.n_tokens END
  FROM walk w JOIN toks t ON t.shard = w.shard AND t.rn = w.rn + 1
)
{final}
"""
