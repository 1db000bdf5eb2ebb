"""SemDeDup-style semantic deduplication over an embedding column.

The embedding tier of the dedup ladder (after exact-hash, Jaccard,
MinHash, SimHash — see operators/dedup.py): two documents whose
embeddings are nearly parallel are semantic duplicates even when their
token streams share nothing. Following the SemDeDup recipe (Abbas et al.
2023, arXiv:2303.09540): k-means-cluster the corpus, compare pairs ONLY
within a cluster, and greedily keep the lowest-id member of every
near-parallel pair.

Why this scales where brute force cannot: the all-pairs cosine matrix is
O(n²) in the corpus; clustering first bounds the pair stage to
O(Σ cluster²). With cluster count grown ∝ corpus (the operator takes it
as a parameter; production SemDeDup uses ~100k clusters for billions of
embeddings) the expected cluster size is constant, so the pair stage is
linear in the corpus with a constant factor of (cluster size). Every
stage is DataFrame algebra on the same shapes the IVF index uses
(operators/ivf.py): centroid seeding + Lloyd refinement reuse that
module verbatim, the pair stage is an equi-join on cluster id, and the
survivor selection is one anti-join.

Deterministic by construction (seeded centroids, lowest-id-wins) →
pytest pins bit-exactness against a NumPy replica; the registry entry is
rows-only (k-means is not ANSI-SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.vector import dot, norm
from covid_data_challenge_spark.operators.ivf import (
    assign_to_centroids,
    lloyd_refine,
    seed_centroids,
)

#: Mean cluster size the sizing policy targets. SemDeDup's production
#: configuration (arXiv:2303.09540 §3: ~100k clusters over the billions
#: of LAION embeddings) works out to ~10k-50k vectors per cluster; 10k
#: keeps the pair stage's per-cluster cost (size²·dim multiplies)
#: comfortably inside one task while the centroid table stays tiny.
TARGET_CLUSTER_SIZE = 10_000


def default_n_centroids(
    corpus_rows: int,
    target_cluster_size: int = TARGET_CLUSTER_SIZE,
    min_centroids: int = 8,
    dim: int = 64,
    broadcast_budget_bytes: int = 64 * 1024 * 1024,
) -> int:
    """Corpus-proportional cluster count: ``ceil(rows / target)``,
    floored at ``min_centroids``.

    Growing the count ∝ corpus is what keeps SemDeDup linear — constant
    cluster count would send the Σ cluster² pair stage quadratic as the
    corpus grows. The ceiling check asserts the other side of the
    bargain: the centroid table (count × dim × 4 bytes float32) must
    stay under the broadcast budget (session.py pins
    autoBroadcastJoinThreshold to 64 MB), because every assignment is a
    broadcast join against it. At 1 billion vectors the policy gives
    100k centroids = ~25 MB of float32 — inside budget; a corpus that
    would blow the budget raises rather than silently degrading to a
    shuffled join.
    """
    n = max(min_centroids, -(-corpus_rows // target_cluster_size))
    cbytes = n * dim * 4
    if cbytes > broadcast_budget_bytes:
        raise ValueError(
            f"{n} centroids × {dim} float32 dims = {cbytes} bytes exceeds the "
            f"{broadcast_budget_bytes}-byte broadcast budget; raise "
            f"target_cluster_size (or shard the corpus) so the centroid "
            f"table stays broadcastable."
        )
    return n


def semdedup_assignments(
    emb: DataFrame,
    n_centroids: int | None = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster assignment stage: (id, vec, cid) with deterministic
    seeded-Lloyd centroids (see operators/ivf.py). ``n_centroids=None``
    applies the corpus-proportional policy (:func:`default_n_centroids`;
    costs one count of the corpus)."""
    return assign_to_centroids(
        emb,
        semdedup_centroids(emb, n_centroids, lloyd_iters, id_col, vec_col),
        id_col,
        vec_col,
    )


def semdedup_centroids(
    emb: DataFrame,
    n_centroids: int | None = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refined, checkpointed centroid table (cid, cvec) — the cluster
    gold table shared by assignment, SemDeDup, and the D4 prototype
    stage."""
    if n_centroids is None:
        n_centroids = default_n_centroids(emb.count())
    centroids = lloyd_refine(
        emb,
        seed_centroids(emb, n_centroids, id_col, vec_col),
        iters=lloyd_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    # Lloyd state is centroid-sized (n_centroids × dim floats): cut the
    # seeding + iteration lineage here so every downstream consumer of
    # the assignment (pair self-join sides, reps projection) replans
    # from a tiny materialized table instead of re-deriving the whole
    # Lloyd chain — same discipline as lr/bpe/graph; on a cluster this
    # is the persisted centroid gold table (ivf_build docstring).
    return centroids.localCheckpoint(eager=True)


def semdedup_prune(
    emb: DataFrame,
    n_centroids: int | None = 8,
    lloyd_iters: int = 1,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Per-embedding keep/prune decision → (id, cid, kept).

    A vector is pruned when a LOWER-id vector in the same cluster has
    cosine ≥ ``threshold`` with it (round-to-``digits`` before the
    comparison, so the decision is bit-identical across engines and
    partitionings). Keep-lowest-id is the same deterministic survivor
    rule as exact dedup (dedup_exact_keep_first) — SemDeDup's "keep one
    per ε-ball" with a total order instead of an arbitrary choice.

    Exact duplicates collapse FIRST (group on the vector itself, lowest
    id is the representative): a copy is pruned by its rep by
    definition (cosine 1 ≥ τ, rep id is minimal), and running the
    cluster/pair stages on distinct vectors removes the worst case for
    the pair join — k identical copies in one cluster would contribute
    k²/2 pairs for zero information. The sf1 stress measured exactly
    this: 10-way-replicated corpus sent the naive form to 14.5× growth;
    with the collapse the pair stage only ever sees distinct vectors
    (production pipelines run exact dedup before semantic dedup for the
    same reason). Collapsing before seeding/Lloyd is part of the
    operator's contract — the NumPy replica in pytest does the same.

    Plan: exact-collapse groupBy, cluster assignment (broadcast
    centroid join + per-id argmax), a self-equi-join on cid bounded by
    cluster size, and a vector-keyed expansion join back to the full
    corpus. No O(n²) stage, no UDF, no driver state.

    ``n_centroids=None`` applies the corpus-proportional sizing policy
    (:func:`default_n_centroids`): cluster count grows ∝ distinct
    vectors so the pair stage stays linear, with a hard assert that the
    centroid table stays under the broadcast budget.
    """
    return semdedup_detail(
        emb, n_centroids, lloyd_iters, threshold, id_col, vec_col, digits
    )[0].select(id_col, "cid", "kept")


def semdedup_detail(
    emb: DataFrame,
    n_centroids: int | None = 8,
    lloyd_iters: int = 1,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """:func:`semdedup_prune` with its intermediates exposed for
    composite recipes (D4): returns ``(per-vec frame with (id, cid,
    kept, vec), refined centroid table (cid, cvec))``. Same plan as
    semdedup_prune — the wrapper is a projection of this."""
    uniq = (
        emb.groupBy(vec_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, vec_col)
    )
    centroids = semdedup_centroids(uniq, n_centroids, lloyd_iters, id_col, vec_col)
    # The assignment table feeds both sides of the pair self-join and the
    # reps projection; Catalyst plans the shared aggregation once and
    # reuses the exchange (an eager localCheckpoint here was measured
    # SLOWER at sf0.1 — 2.9 s vs 2.6 s — the materialization costs more
    # than the recompute it saves). On a cluster, persist the assignment
    # as the index gold table instead (see ivf_build's docstring).
    assigned = assign_to_centroids(uniq, centroids, id_col, vec_col)
    sized = assigned.select(
        "id", "cid", F.col("vec").alias("__v"), norm(F.col("vec")).alias("__n")
    )
    a = sized.select(
        F.col("cid"),
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = sized.select(
        F.col("cid"),
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    sim = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
    ).otherwise(F.lit(0.0))
    pruned = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(sim, digits) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    reps = assigned.join(
        pruned.withColumn("__pruned", F.lit(True)), "id", "left"
    ).select(
        F.col("id").alias("__rep_id"),
        F.col("vec").alias("__rep_vec"),
        "cid",
        F.coalesce(~F.col("__pruned"), F.lit(True)).alias("__rep_kept"),
    )
    # expand back to the full corpus: a non-representative copy inherits
    # its rep's cluster and is pruned (rep has the lower id, cosine 1)
    full = emb.select(F.col(id_col), F.col(vec_col)).join(
        reps, F.col(vec_col) == F.col("__rep_vec")
    ).select(
        id_col,
        "cid",
        ((F.col(id_col) == F.col("__rep_id")) & F.col("__rep_kept")).alias("kept"),
        vec_col,
    )
    return full, centroids
