"""IVF-PQ approximate nearest-neighbor search (the FAISS-style
production vector-store layout) as pure DataFrame algebra.

Two compressions compose:

- **IVF (coarse)** — operators/ivf.py: corpus partitioned by nearest
  coarse centroid; a query probes only its ``nprobe`` nearest
  partitions, so the candidate set is corpus/C × nprobe instead of the
  corpus.
- **PQ (fine)** — this module: each vector is cut into ``n_sub``
  subvectors; each subspace gets its own tiny k-means codebook
  (``n_codes`` entries), and a vector is stored as ``n_sub`` small
  codes (8 bytes here vs 256 bytes of float32 — the memory win that
  lets billion-vector indexes fit in RAM). Query scoring is ADC
  (asymmetric distance computation): the query precomputes a
  ``n_sub × n_codes`` lookup table of exact subspace distances, and a
  candidate's approximate distance is just ``n_sub`` table lookups —
  no float vector is ever touched at scan time.

Spark shapes: codebook training is one unified explode — every
(vector, subspace) row trains in the same DataFrame, so the 8 codebooks
cost one Lloyd pass, not 8. The per-query LUT is ``n_sub × n_codes``
rows collapsed into a map column and broadcast; the probe join is the
IVF equi-join on centroid id; ADC is ``aggregate`` over the code array
with ``element_at`` map lookups — JVM column algebra end to end, no
UDF, no shuffle after the probe join beyond the final per-query top-k.

Two encodings ship: raw vectors (IVF-Flat + PQ, ``ivfpq_topk`` /
``ivfpq_build_tables`` + ``ivfpq_serve``) and RESIDUAL encoding
(``ivfpq_residual_topk`` — the actual IVFADC of Jégou et al. 2011,
r8), which quantizes ``vec − centroid(cell)`` for lower quantization
error at the price of a per-(query, probed-cell) ADC lookup table.
Deterministic by construction (lowest-id seeds, lowest-code argmin
tie-break) → the registry entries hash-check against full DuckDB CTE
unrolls; recall vs exact L2 brute force is additionally pinned in
pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.vector import l2sq
from covid_data_challenge_spark.operators.ivf import ivf_build


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, n_sub: int, sub_dim: int
) -> DataFrame:
    """Explode each vector into (id, sub, subvec) rows."""
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda s: F.struct(
                s.alias("sub"),
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias("subvec"),
            ),
        )
    )
    return df.select(F.col(id_col).alias("id"), subs.alias("sv")).select(
        "id", F.col("sv.sub").alias("sub"), F.col("sv.subvec").alias("subvec")
    )


def pq_train(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Train all ``n_sub`` subspace codebooks in one DataFrame →
    (sub, code, cvec). Seeds are the subvectors of the ``n_codes``
    lowest-id vectors (deterministic, same convention as
    ivf.seed_centroids); each Lloyd iteration is one broadcast
    assignment + one (sub, code, pos) mean rebuild — shared across all
    subspaces.

    Density invariant: the seed grid is exactly ``n_sub × n_codes``
    rows (given ≥ n_codes corpus vectors), and a code that loses every
    assignment in a Lloyd round KEEPS its previous centroid (the
    standard empty-cluster convention) instead of vanishing from the
    rebuild's GROUP BY. Downstream, ivfpq_topk's ADC lookup table is a
    positional array indexed by slot = sub·n_codes + code — a dropped
    code would silently shift every later slot's distance. The oracle
    CTE (queries_similarity._ann_ivfpq_oracle) applies the same
    keep-previous rule."""
    sub_dim = dim // n_sub
    sv = _subvectors(corpus, id_col, vec_col, n_sub, sub_dim)
    # Seed from the n_codes lowest ids via distributed top-k + a
    # constant-size window, then attach subvectors by broadcast join —
    # the old per-sub Window.orderBy(id) sort-shuffled the whole
    # subvector table into n_sub partitions (guide §2.5 skew by
    # construction). Same codes: ids are identical across subs, so the
    # per-sub rank of the k lowest ids equals the corpus-level rank.
    low = (
        corpus.select(F.col(id_col).alias("id"))
        .orderBy("id")
        .limit(n_codes)
        .withColumn(
            "code", F.row_number().over(Window.orderBy(F.col("id"))) - 1
        )
    )
    codebook = sv.join(F.broadcast(low), "id").select(
        "sub", "code", F.col("subvec").alias("cvec")
    )
    for _ in range(lloyd_iters):
        # carry each (id, sub)'s subvector THROUGH the argmin (it is
        # constant within the group) instead of re-joining the corpus-
        # sized sv after assignment — deletes one corpus-scale join per
        # Lloyd iteration (guide §2.4).
        assigned = _pq_assign(sv, codebook, with_vec=True)
        by_dim = assigned.select("sub", "code", F.posexplode("subvec").alias("pos", "x"))
        means = by_dim.groupBy("sub", "code", "pos").agg(F.avg("x").alias("m"))
        rebuilt = (
            means.groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "sub",
                "code",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("cvec"),
            )
        )
        # empty-cluster rule: left-join the rebuild onto the (dense)
        # previous grid so zero-assignment codes keep their centroid
        codebook = (
            codebook.select("sub", "code", F.col("cvec").alias("__prev"))
            .join(rebuilt, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("cvec", "__prev").alias("cvec"))
        )
    return codebook


def _pq_assign(
    sv: DataFrame, codebook: DataFrame, with_vec: bool = False
) -> DataFrame:
    """Nearest codebook entry per (id, sub) → (id, sub, code[, subvec]).
    The codebook is n_sub × n_codes rows — always broadcast.
    ``with_vec=True`` carries the (group-constant) subvector through the
    argmin so the Lloyd rebuild needs no join back onto sv."""
    scored = sv.join(F.broadcast(codebook), "sub").select(
        "id",
        "sub",
        "code",
        "subvec",
        l2sq(F.col("subvec"), F.col("cvec")).alias("__d"),
    )
    # argmin as min_by hash aggregate (map-side partials) — same
    # (distance asc, code asc) tie rule as a sorted window, cheaper.
    if with_vec:
        return (
            scored.groupBy("id", "sub")
            .agg(
                F.min_by(
                    F.struct("code", "subvec"), F.struct("__d", "code")
                ).alias("__b")
            )
            .select(
                "id",
                "sub",
                F.col("__b.code").alias("code"),
                F.col("__b.subvec").alias("subvec"),
            )
        )
    return (
        scored.groupBy("id", "sub")
        .agg(F.min_by(F.col("code"), F.struct("__d", "code")).alias("code"))
        .select("id", "sub", "code")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Encode each vector as its code array → (id, codes array<int>).
    8 small ints replace the float vector — this table (plus the coarse
    assignment) IS the persisted index."""
    sub_dim = dim // n_sub
    sv = _subvectors(corpus, id_col, vec_col, n_sub, sub_dim)
    return (
        _pq_assign(sv, codebook)
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select("id", F.transform(F.col("sc"), lambda s: s["code"]).alias("codes"))
    )


def ivfpq_build_tables(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_sub: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The BUILD half of IVF-PQ — the one-off index-construction cost a
    production vector store pays per corpus refresh, separated from the
    serve path (VERDICT r7 next-round #2): → (centroids, codebook,
    index) where ``index`` is (neighbor_id, cid, codes). All three are
    plain DataFrames meant to be written as parquet gold tables
    (partition the index by ``cid`` so every probe prunes to its nprobe
    partitions) and probed by every query batch afterwards."""
    centroids, inverted = ivf_build(
        corpus, n_centroids, lloyd_iters, id_col, vec_col
    )
    codebook = pq_train(
        corpus, n_sub, n_codes, lloyd_iters, id_col, vec_col, dim
    )
    codes = pq_encode(corpus, codebook, n_sub, id_col, vec_col, dim).select(
        F.col("id").alias("neighbor_id"), "codes"
    )
    index = inverted.select("neighbor_id", "cid").join(codes, "neighbor_id")
    return centroids, codebook, index


def ivfpq_serve(
    centroids: DataFrame,
    codebook: DataFrame,
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The SERVE half of IVF-PQ: probe prebuilt index tables with a
    query batch → (query_id, rank, neighbor_id, adc_distance). Rank
    coarse centroids by cosine, keep ``nprobe``; precompute the
    per-query ADC lookup array (slot = sub·n_codes + code → exact
    subspace distance); probe-join the inverted lists on cid; score
    candidates with ``aggregate`` over their code arrays. Ties (equal
    ADC distance) break on neighbor id. Per batch this touches
    corpus/C × nprobe code rows and |Q|·(C + n_sub·n_codes) LUT rows —
    the corpus float vectors are never read."""
    from covid_data_challenge_spark.functions.vector import cosine

    sub_dim = dim // n_sub
    # The ADC LUT below positionally indexes slot = sub·n_codes + code,
    # which is only sound over a DENSE codebook grid. pq_train
    # guarantees density (empty-cluster keep-previous rule) whenever the
    # corpus has ≥ n_codes vectors; this one count over the
    # ≤ n_sub·n_codes-row frame pins the invariant against regressions
    # and tiny-corpus misuse instead of silently mis-ranking.
    n_cb = codebook.count()
    if n_cb != n_sub * n_codes:
        raise ValueError(
            f"PQ codebook is not dense: {n_cb} rows, expected {n_sub * n_codes} "
            f"(n_sub={n_sub} × n_codes={n_codes}); corpus too small or "
            "codebook training dropped codes — positional ADC LUT would mis-rank"
        )

    # coarse probe ranking — same cosine convention as ivf.ivf_probe
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cent = centroids.select("cid", "cvec")
    probe_w = Window.partitionBy("query_id").orderBy(F.col("__cs").desc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "cid", cosine(F.col("__qv"), F.col("cvec")).alias("__cs"))
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cid")
    )
    # The LUT is a dense slot-indexed ARRAY (slot = sub·n_codes + code,
    # slots are exactly 0..n_sub·n_codes−1), not a map: Catalyst's
    # element_at on MapType is a LINEAR scan of all n_sub·n_codes
    # entries per lookup — measured ~10× on the whole query at 10×
    # data, since ADC does n_sub lookups per candidate row. Array
    # element_at is O(1) by index; the d values and the fold order are
    # unchanged, so results are bit-identical.
    qlut = (
        _subvectors(queries, id_col, vec_col, n_sub, sub_dim)
        .join(F.broadcast(codebook), "sub")
        .select(
            F.col("id").alias("query_id"),
            (F.col("sub") * n_codes + F.col("code")).alias("slot"),
            l2sq(F.col("subvec"), F.col("cvec")).alias("d"),
        )
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("slot", "d"))).alias("sd"))
        .select(
            "query_id", F.transform(F.col("sd"), lambda s: s["d"]).alias("lut")
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            F.col("codes"),
            lambda s, c: s * n_codes + c,
        ),
        F.lit(0.0),
        lambda acc, slot: acc + F.element_at(F.col("lut"), slot + F.lit(1)),
    )
    cand = (
        probes.join(index, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(qlut), "query_id")
        .select("query_id", "neighbor_id", F.round(adc, 6).alias("adc_distance"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_distance").asc(), F.col("neighbor_id").asc()
    )
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_distance")
    )
    # Materialize the small (|Q|·k rows) result — repeated invocations
    # (bench loops) must not re-run the probe DAG per consumer.
    return out.localCheckpoint(eager=True)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ top-k in one call: :func:`ivfpq_build_tables` +
    :func:`ivfpq_serve` — kept as the single-shot entry point for
    audits and ad-hoc batches. The index tables are tiny relative to
    the corpus but sit upstream of several consumers (probe ranking,
    LUT build, candidate join) — persist so the Lloyd DAGs run once,
    not once per consumer; in production they'd be the persisted
    parquet gold tables instead (see ivfpq_build_tables)."""
    centroids, codebook, index = ivfpq_build_tables(
        corpus, n_centroids, n_sub, n_codes, lloyd_iters, id_col, vec_col, dim
    )
    centroids = centroids.persist()
    codebook = codebook.persist()
    index = index.persist()
    try:
        return ivfpq_serve(
            centroids, codebook, index, queries,
            k, nprobe, n_sub, n_codes, id_col, vec_col, dim,
        )
    finally:
        centroids.unpersist()
        codebook.unpersist()
        index.unpersist()


def ivfpq_residual_build_tables(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_sub: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The BUILD half of residual-encoded IVF-PQ (r9 — VERDICT r8 #3,
    the same split ivfpq_build_tables gave the raw-vector variant):
    → (centroids, residual codebook, index) where ``index`` is
    (neighbor_id, cid, codes) with codes quantizing ``vec −
    centroid(cell)`` — Jégou et al. 2011 §III / the FAISS IVFPQ
    default. Residuals are one broadcast-join + ``zip_with``
    subtraction in DOUBLE (exact for float32 inputs); codebook
    training and encoding REUSE pq_train/pq_encode unchanged over the
    residual frame. All three outputs are meant to be written as
    parquet gold tables (partition the index by ``cid``)."""
    centroids, inverted = ivf_build(
        corpus, n_centroids, lloyd_iters, id_col, vec_col
    )
    cent = centroids.select("cid", "cvec")
    # persist: pq_train's Lloyd iterations, pq_encode, and the index
    # join are all actions over this corpus-sized frame — without the
    # cache the assignment+subtraction DAG re-executes per consumer
    # (the r8 composite had this persist; the r9 split must keep it)
    resid = (
        inverted.join(F.broadcast(cent), "cid")
        .select(
            F.col("neighbor_id").alias("id"),
            "cid",
            F.zip_with(
                F.col("__cv"),
                F.col("cvec"),
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("rv"),
        )
        .persist()
    )
    codebook = pq_train(
        resid, n_sub, n_codes, lloyd_iters, id_col="id", vec_col="rv", dim=dim
    )
    codes = pq_encode(resid, codebook, n_sub, "id", "rv", dim).select(
        F.col("id").alias("neighbor_id"), "codes"
    )
    index = resid.select(F.col("id").alias("neighbor_id"), "cid").join(
        codes, "neighbor_id"
    )
    # eagerly materialize the two resid consumers (codebook is
    # n_sub·n_codes rows; index is the compressed code table — tiny vs
    # the float corpus), then drop the corpus-sized residual cache:
    # leaving it persisted would occupy executor storage for the rest
    # of the session (ADVICE r9 — bench runs many queries back to back)
    codebook = codebook.localCheckpoint(eager=True)
    index = index.localCheckpoint(eager=True)
    resid.unpersist()
    return centroids, codebook, index


def ivfpq_residual_serve(
    centroids: DataFrame,
    codebook: DataFrame,
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The SERVE half of residual IVFADC: probe prebuilt gold tables
    with a query batch → (query_id, rank, neighbor_id, adc_distance).
    Differs from :func:`ivfpq_serve` only in the lookup table: it is
    per-(query, probed cell) — |Q|·nprobe LUTs instead of |Q| —
    because the query re-expresses in each cell's residual frame; the
    key packs as ``query_id·n_centroids + cid`` so the slicing/
    codebook machinery stays single-keyed. Candidates join on (cid,
    packed key) — still equi-joins, never all-pairs; corpus float
    vectors are never read on this path."""
    from covid_data_challenge_spark.functions.vector import cosine

    sub_dim = dim // n_sub
    n_cb = codebook.count()
    if n_cb != n_sub * n_codes:
        raise ValueError(
            f"PQ codebook is not dense: {n_cb} rows, expected {n_sub * n_codes}"
        )
    cent = centroids.select("cid", "cvec")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    probe_w = Window.partitionBy("query_id").orderBy(F.col("__cs").desc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "cid", cosine(F.col("__qv"), F.col("cvec")).alias("__cs"))
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cid")
    )
    # per-(query, cell) residual LUT; key packs as query_id·C + cid so
    # the slicing/codebook machinery stays single-keyed
    qres = (
        probes.join(F.broadcast(q), "query_id")
        .join(F.broadcast(cent), "cid")
        .select(
            (F.col("query_id") * n_centroids + F.col("cid")).alias("qk"),
            F.zip_with(
                F.col("__qv"),
                F.col("cvec"),
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("qrv"),
        )
    )
    qlut = (
        _subvectors(qres, "qk", "qrv", n_sub, sub_dim)
        .join(F.broadcast(codebook), "sub")
        .select(
            F.col("id").alias("qk"),
            (F.col("sub") * n_codes + F.col("code")).alias("slot"),
            l2sq(F.col("subvec"), F.col("cvec")).alias("d"),
        )
        .groupBy("qk")
        .agg(F.array_sort(F.collect_list(F.struct("slot", "d"))).alias("sd"))
        .select("qk", F.transform(F.col("sd"), lambda s: s["d"]).alias("lut"))
    )
    adc = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            F.col("codes"),
            lambda s, c: s * n_codes + c,
        ),
        F.lit(0.0),
        lambda acc, slot: acc + F.element_at(F.col("lut"), slot + F.lit(1)),
    )
    cand = (
        probes.join(index, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qk", F.col("query_id") * n_centroids + F.col("cid"))
        .join(F.broadcast(qlut), "qk")
        .select("query_id", "neighbor_id", F.round(adc, 6).alias("adc_distance"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_distance").asc(), F.col("neighbor_id").asc()
    )
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_distance")
    )
    # Materialize the small (|Q|·k rows) result — repeated invocations
    # must not re-run the probe DAG per consumer.
    return out.localCheckpoint(eager=True)


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Residual IVFADC in one call: :func:`ivfpq_residual_build_tables`
    + :func:`ivfpq_residual_serve` — the single-shot build+audit
    composite (the registered ``ann_ivfpq_residual`` entry; production
    serving goes through the gold tables instead). The three index
    tables sit upstream of several consumers — persist so the Lloyd
    DAGs run once, not once per consumer."""
    centroids, codebook, index = ivfpq_residual_build_tables(
        corpus, n_centroids, n_sub, n_codes, lloyd_iters, id_col, vec_col, dim
    )
    centroids = centroids.persist()
    codebook = codebook.persist()
    index = index.persist()
    try:
        return ivfpq_residual_serve(
            centroids, codebook, index, queries,
            k, nprobe, n_centroids, n_sub, n_codes, id_col, vec_col, dim,
        )
    finally:
        centroids.unpersist()
        codebook.unpersist()
        index.unpersist()
