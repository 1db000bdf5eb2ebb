"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB training-data pipeline needs:

- **brute-force top-k** (the exactness baseline): broadcast the query set,
  compute cosine against every corpus vector with JVM-side higher-order
  functions, rank per query. Cost O(|Q|·|corpus|) — right whenever |Q| is
  small enough to broadcast, which is the common "dedup these new docs
  against the corpus" shape.
- **sign-bit LSH buckets** (the scale path): hash each vector to a
  b-bit bucket from the signs of ``b`` fixed coordinates; candidate set =
  same-bucket vectors (optionally ± Hamming-1 neighbors via bit flips).
  The join is an equi-join on bucket id — no cross product anywhere, so
  the plan survives a 1000-executor scale-up. Approximate by design →
  registry entry is rows-only; recall is pinned by pytest against the
  brute-force path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.vector import (
    cosine,
    dot,
    norm,
    to_double,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank); self-matches are
    excluded; ranking ties break on neighbor id so the result is
    deterministic.
    """
    # Norms fold once per vector (|Q|+|corpus| folds, the query ones
    # inside the broadcast build) instead of once per pair (2·|Q|·|corpus|);
    # vectors are pre-cast to double once (to_double) so the per-pair fold
    # skips 2·dim casts; dot/(nq·nc) is the same double arithmetic as
    # cosine(), so similarities stay bit-identical. Neither side's arrays
    # cross a shuffle here (queries broadcast), so the 2× byte cost of
    # double arrays never hits an exchange.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double(F.col(vec_col)).alias("__qv"),
        norm(F.col(vec_col)).alias("__nq"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double(F.col(vec_col)).alias("__cv"),
        norm(F.col(vec_col)).alias("__nc"),
    )
    sim = F.when(
        (F.col("__nq") > 0) & (F.col("__nc") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__nq") * F.col("__nc")),
    ).otherwise(F.lit(0.0))
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), digits).alias("cosine_sim"),
            "rank",
        )
    )


def hard_negatives_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    digits: int = 4,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k
    MOST similar corpus vectors with a DIFFERENT label — the standard
    negatives-selection stage for training embedding/retrieval models
    (similar enough to be hard, different-labeled so they're negatives).

    Same broadcast + per-query rank shape as :func:`cosine_topk` with a
    label-mismatch predicate in the join; exact, so the DuckDB oracle is
    a direct SQL twin. At 100 TB the same mining runs on top of the IVF
    or LSH candidate tiers instead of the full corpus scan.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        to_double(F.col(vec_col)).alias("__qv"),
        norm(F.col(vec_col)).alias("__nq"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__cl"),
        to_double(F.col(vec_col)).alias("__cv"),
        norm(F.col(vec_col)).alias("__nc"),
    )
    sim = F.when(
        (F.col("__nq") > 0) & (F.col("__nc") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__nq") * F.col("__nc")),
    ).otherwise(F.lit(0.0))
    sims = (
        c.join(F.broadcast(q), F.col("__cl") != F.col("__ql"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.col("__cl").alias("neg_label"), sim.alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round(F.col("__sim"), digits).alias("cosine_sim"),
            "rank",
        )
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
    max_rows: int | None = 20_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (the dedup tier beyond
    text hashing: two documents whose embeddings point the same way are
    semantic duplicates even when their shingles differ).

    Output: (vec_a, vec_b, cosine_sim) for every unordered pair with
    cosine ≥ ``threshold``. The pair generation is O(n²) — this is the
    exactness baseline for small corpora / verification, and it REFUSES
    to run on a corpus larger than ``max_rows`` (a bounded ``limit``
    probe, not a full count): pointing the all-pairs form at a real
    corpus would be a job-killer, and the scale path —
    :func:`cosine_neardup_pairs_lsh`, candidates via an equi-join on
    LSH buckets, exact verify on candidates only — exists precisely so
    nobody needs to. Pass ``max_rows=None`` to bypass (verification
    harnesses only).
    """
    if max_rows is not None:
        probe = corpus.select(id_col).limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"cosine_neardup_pairs is the O(n^2) exactness baseline and "
                f"refuses corpora over {max_rows} rows (got > {max_rows}); "
                f"use cosine_neardup_pairs_lsh (LSH-bucketed candidates + "
                f"exact verify) for production corpora, or pass "
                f"max_rows=None to force."
            )
    # Norms are precomputed per vector (n folds, not n²) and vectors
    # pre-cast to double once (to_double — saves 2·dim casts per pair,
    # measured 1.6×); dot/(na·nb) is the same double arithmetic either
    # way, so results stay bit-identical to cosine(). The pair join is a
    # broadcast nested loop — the double arrays never cross a shuffle.
    a = corpus.select(
        F.col(id_col).alias("vec_a"), to_double(F.col(vec_col)).alias("__va"), norm(F.col(vec_col)).alias("__na")
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"), to_double(F.col(vec_col)).alias("__vb"), norm(F.col(vec_col)).alias("__nb")
    )
    sim = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .select("vec_a", "vec_b", F.round(F.col("__sim"), digits).alias("cosine_sim"))
    )


def cosine_neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: random-hyperplane LSH
    buckets generate candidates via an equi-join on (table, bucket); each
    candidate is then verified with the exact cosine. No O(n²) stage —
    corpus cost is a ×``tables`` explode plus one shuffle on bucket id.

    Recall for truly identical vectors is 1.0 by construction (identical
    vectors share every bucket); for sim≈threshold pairs it follows the
    usual 1-(1-p^bits)^tables curve.
    """
    banded = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
        F.explode(rp_lsh_buckets(f"`{vec_col}`", dim, bits, tables)).alias("tb"),
    ).select("id", "__v", "__n", "tb.table", "tb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    sim = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
    ).otherwise(F.lit(0.0))
    return (
        cand.select("vec_a", "vec_b", sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .select("vec_a", "vec_b", F.round(F.col("__sim"), digits).alias("cosine_sim"))
    )


def _signed_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes (seeded, engine-free)."""
    import random

    rng = random.Random(seed)
    return [[1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)] for _ in range(n_planes)]


def rp_lsh_buckets(vec_sql: str, dim: int, bits: int, tables: int, seed: int = 42):
    """Multi-table random-hyperplane LSH: ``tables`` bucket ids, each
    packing ``bits`` sign-of-projection bits against fixed ±1 planes.

    Projections are JVM-side ``zip_with``+``aggregate`` folds against
    literal plane arrays — no UDF, and the plane set is identical on
    every executor by construction (seeded literals). The WHOLE
    array<struct<table:int, bucket:long>> is emitted as ONE ``F.expr``
    SQL string (r12): building it Column-by-Column cost ~10⁴ py4j round
    trips ≈ 2 s of driver time PER CALL (optimization guide §5 — the
    driver is part of the query path); one string parses in
    milliseconds to the same expression tree, so every projection fold
    runs the identical double arithmetic in the identical order.
    ``vec_sql`` is the vector column as SQL text (a name or expression).
    """
    planes = _signed_planes(bits * tables, dim, seed)
    entries = []
    for t in range(tables):
        terms = []
        for j in range(bits):
            proj = _proj_sql(vec_sql, planes[t * bits + j])
            terms.append(
                f"(CASE WHEN {proj} >= 0 THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END) * CAST({1 << j} AS BIGINT)"
            )
        bucket = " + ".join(["CAST(0 AS BIGINT)"] + terms)
        entries.append(f"named_struct('table', {t}, 'bucket', {bucket})")
    return F.expr("array(" + ", ".join(entries) + ")")


def _proj_sql(vec_sql: str, plane: list[float]) -> str:
    """Signed-projection fold as SQL text — the same
    aggregate(zip_with(vec, plane, (x,w) -> double(x)*w), 0.0, +) tree
    the Column API built, one parse instead of ~20 py4j calls."""
    for w in plane:
        if w != w or w in (float("inf"), float("-inf")):
            raise ValueError(f"_proj_sql: non-finite plane weight {w!r}")
    arr = "array(" + ",".join(repr(float(w)) + "D" for w in plane) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, "
        f"(x, w) -> CAST(x AS DOUBLE) * w), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _proj(vec_sql: str, plane: list[float]):
    return F.expr(_proj_sql(vec_sql, plane))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Candidates = vectors sharing the query's bucket in ANY of the
    ``tables`` hash tables (recall ≈ 1-(1-p^bits)^tables for per-bit
    agreement p). The candidate join is an equi-join on (table, bucket) —
    corpus cost is a ×tables explode, never O(n²); at 100 TB the explode
    is the textbook space/recall trade of multi-table LSH.
    """
    # norms hoisted: folded once per vector BEFORE the bucket explode
    # (never per candidate pair); dot/(nq·nc) is the same double
    # arithmetic as cosine(), so similarities are bit-identical
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__nc"),
        F.explode(rp_lsh_buckets(f"`{vec_col}`", dim, bits, tables)).alias("tb"),
    ).select("neighbor_id", "__cv", "__nc", "tb.table", "tb.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__nq"),
        F.explode(rp_lsh_buckets(f"`{vec_col}`", dim, bits, tables)).alias("tb"),
    ).select("query_id", "__qv", "__nq", "tb.table", "tb.bucket")
    sim = F.when(
        (F.col("__nq") > 0) & (F.col("__nc") > 0),
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__nq") * F.col("__nc")),
    ).otherwise(F.lit(0.0))
    sims = (
        # sim is computed MAP-SIDE, before the pair dedup: the dedup
        # exchange then ships (query_id, neighbor_id, sim) — ~24 bytes —
        # instead of both 64-dim vectors + norms (~1 KB) per candidate
        # row (guide §2.2, shuffle fewer bytes). A pair colliding in
        # several tables re-folds the dot per collision, but that work
        # is parallel map-side CPU; the value is identical per pair, so
        # the dedup keeps the same result regardless of which row wins.
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("__sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), digits).alias("cosine_sim"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory/SIMD tier between exact float and LSH
# ---------------------------------------------------------------------------


def quantize_int8(vec) -> "F.Column":
    """L2-normalize then scalar-quantize a float vector to int8 range:
    ``q_i = floor(127·x_i/‖x‖ + 0.5)``.

    4× smaller than float32 and integer dot products are EXACT (no
    float summation order to worry about), which is what lets the
    quantized ANN tier keep a bit-exact cross-engine oracle. The norm is
    let-bound — folded once per vector, not once per element (the HOF
    re-evaluation trap). Zero-norm vectors quantize to the zero vector.
    """
    from covid_data_challenge_spark.functions.text import let

    def body(n):
        return F.when(
            n > 0,
            F.transform(
                vec,
                lambda x: F.floor(F.lit(127.0) * x.cast("double") / n + F.lit(0.5)).cast(
                    "int"
                ),
            ),
        ).otherwise(F.transform(vec, lambda x: F.lit(0)))

    return let(norm(vec), body)


def int8_dot(a, b) -> "F.Column":
    """Exact integer dot product of two quantized vectors (BIGINT fold —
    order-independent because integer addition is associative)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors by quantized integer dot product (∝ cosine after
    L2 normalization).

    The scale shape matches :func:`cosine_topk` — broadcast query set,
    per-pair work is ONE integer fold — but the corpus representation is
    4× smaller and the arithmetic is exact, so results are reproducible
    bit-for-bit on any engine/partitioning. Recall vs the float-exact
    top-k is pinned in pytest (quantization noise, not implementation
    drift, is the only divergence source)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_int8(F.col(vec_col)).alias("__qq"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_int8(F.col(vec_col)).alias("__qc"),
    )
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            int8_dot(F.col("__qq"), F.col("__qc")).alias("int_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("int_dot").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "int_dot", "rank")
    )


def jl_project_units(
    emb: DataFrame,
    out_dims: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with seeded ±1
    planes (Achlioptas 2003: database-friendly random projections —
    sign matrices preserve pairwise distances like Gaussians do):
    y_d = (1/sqrt(out_dims)) · Σ_j ±x_j, one ordered fold per output
    dim against literal plane arrays (no UDF, codegen-able, identical
    planes on every executor by construction).

    Output components quantize to integer micro-units —
    ``(vec_id, jl_units)`` with the vector as a comma-joined integer
    string — because doubles stringify differently across engines but
    integers don't (the doc_feature_hashing convention); downstream
    consumers divide by 1e6. Map-side only: no shuffle, no join —
    reduces 64-dim embeddings 8× before the quadratic-ish ANN tiers."""
    import math

    planes = _signed_planes(out_dims, dim, seed)
    scale = 1.0 / math.sqrt(out_dims)
    units = [
        F.floor(
            F.lit(1000000.0) * (_proj(f"`{vec_col}`", plane) * F.lit(scale))
        )
        .cast("long")
        .cast("string")
        for plane in planes
    ]
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.concat_ws(",", *units).alias("jl_units"),
    )
