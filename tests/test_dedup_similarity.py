"""Correctness pinning for the non-oracle (hash-based) operators:
MinHash-LSH recall vs exact Jaccard, sign-LSH ANN recall vs brute-force
cosine, SimHash locality, plus session/window batch semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from covid_data_challenge_spark.operators.dedup import (
    dedup_exact_keep_first,
    exact_dedup_stats,
    hamming_distance,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_neardup_pairs,
)
from covid_data_challenge_spark.operators.sessions import sessionize, tumbling_agg
from covid_data_challenge_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_neardup_pairs,
    cosine_neardup_pairs_lsh,
    cosine_topk,
)
from covid_data_challenge_spark.sources.readers import load_table

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the window and the birds sing in the morning light over the hills"
)


def _doc_corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("morning", "evening")),  # near-duplicate of 0
        (3, "completely different text about spark dataframes and shuffles"),
        (4, "another unrelated document mentioning joins and aggregations only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_stats_and_keep_first(spark):
    docs = _doc_corpus(spark)
    stats = exact_dedup_stats(docs).collect()[0]
    assert stats["n_docs"] == 5
    assert stats["n_unique"] == 4
    assert stats["n_dup_groups"] == 1
    assert stats["n_redundant_docs"] == 1
    kept = {r["doc_id"] for r in dedup_exact_keep_first(docs).collect()}
    assert kept == {0, 2, 3, 4}  # doc 1 dropped, lowest id survives


def test_jaccard_finds_near_duplicates_only(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(_doc_corpus(spark), threshold=0.2).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_lsh_recall_against_exact_jaccard(spark):
    """Every strongly-similar pair (exact J ≥ 0.5) must surface as an LSH
    candidate; nothing dissimilar may score ≥ 0.5."""
    docs = _doc_corpus(spark)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    assert exact <= set(lsh), f"LSH missed strong pairs: {exact - set(lsh)}"
    for pair, est in lsh.items():
        if est >= 0.5:
            assert pair in exact, f"false strong candidate {pair} (est={est})"


def test_simhash_locality(spark):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(_doc_corpus(spark)).collect()}
    assert fp[0] == fp[1]  # identical text → identical fingerprint
    df = spark.createDataFrame(
        [(fp[0], fp[2], fp[3])], "a long, near long, far long"
    ).select(
        hamming_distance(F.col("a"), F.col("near")).alias("d_near"),
        hamming_distance(F.col("a"), F.col("far")).alias("d_far"),
    )
    r = df.collect()[0]
    assert r["d_near"] < r["d_far"]
    assert r["d_near"] <= 12  # one-word change flips few bits


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    """Multi-table random-hyperplane LSH must recover ≥40% of the true
    top-5 neighbors on the sf0.001 embeddings (4 bits × 12 tables)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, queries, k=5, bits=4, tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"ANN recall too low: {recall}"


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0)
    rows = cosine_topk(emb, queries, k=5).collect()
    assert len(rows) == 5
    assert all(r["neighbor_id"] != 0 for r in rows)
    sims = [r["cosine_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def test_simhash_neardup_pairs_matches_brute_force(spark):
    """Pigeonhole banding is a candidate SUPERSET for hamming ≤ k, so the
    banded operator must return exactly the brute-force pair set."""
    docs = _doc_corpus(spark)
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(fps)
    expected = {
        (a, b): bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert got == expected
    assert got[(0, 1)] == 0  # the exact duplicate pair must always be there


def _planted_neardup_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return emb.unionAll(planted), {r["vec_id"] for r in planted.select("vec_id").collect()}


def test_cosine_neardup_exact_finds_planted_pairs(spark, sf_dir):
    corpus, planted_ids = _planted_neardup_corpus(spark, sf_dir)
    pairs = cosine_neardup_pairs(corpus, threshold=0.9).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cosine_sim"] for r in pairs}
    expected = {(pid - 1000000, pid) for pid in planted_ids}
    assert set(got) == expected  # nothing but the planted copies clears 0.9
    assert all(sim == 1.0 for sim in got.values())


def test_cosine_neardup_refuses_oversized_corpus(spark):
    """The O(n^2) exactness baseline must refuse a corpus over max_rows
    (pointing at the LSH twin), so no unbounded all-pairs plan is
    reachable; max_rows=None bypasses for verification harnesses."""
    import pytest

    big = spark.range(11).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="cosine_neardup_pairs_lsh"):
        cosine_neardup_pairs(big, max_rows=10)
    # at/below the cap it runs; None bypasses entirely
    assert cosine_neardup_pairs(big.limit(10), max_rows=10).count() >= 0
    assert cosine_neardup_pairs(big, max_rows=None).count() >= 0


def test_cosine_neardup_lsh_full_recall_on_identical_vectors(spark, sf_dir):
    """Identical vectors share every LSH bucket → the scale path must
    recover 100% of the exact result for planted duplicates."""
    corpus, _ = _planted_neardup_corpus(spark, sf_dir)
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(corpus, threshold=0.9).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs_lsh(corpus, threshold=0.9, bits=8, tables=6).collect()
    }
    assert approx == exact


def _event_fixture(spark):
    T = datetime.datetime
    rows = [
        (1, T(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, T(2024, 1, 1, 10, 10), 1, "click", 2.0),
        (3, T(2024, 1, 1, 11, 0), 1, "view", 3.0),  # 50-min gap → new session
        (4, T(2024, 1, 1, 10, 5), 2, "click", 4.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_gap_semantics(spark):
    sessions = sessionize(_event_fixture(spark), gap_minutes=30).collect()
    by_user = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    assert len(by_user[1]) == 2  # the 50-min gap splits user 1
    first = min(by_user[1], key=lambda s: s["session_start"])
    assert first["n_events"] == 2 and first["total_value"] == 3.0
    assert len(by_user[2]) == 1


def test_tumbling_agg_buckets(spark):
    out = tumbling_agg(_event_fixture(spark), width="1 hour").collect()
    buckets = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in out}
    assert buckets[(10, "click")] == 3
    assert buckets[(11, "view")] == 1


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    """IVF probing (16 centroids, 1 Lloyd iter, nprobe=6) must recover a
    solid share of the true top-5 on the sf0.001 embeddings."""
    from covid_data_challenge_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx_rows = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=6).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # every query got results and ranks are 1..n
    by_q = {}
    for r in approx_rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_int8_quantized_topk_recall_vs_float_exact(spark, sf_dir):
    """Scalar quantization must stay faithful to the float-exact
    ranking: top-5 overlap ≥ 0.8 across all queries, and the quantized
    vectors stay within int8 range."""
    from covid_data_challenge_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_int8,
        quantize_int8,
    )
    from covid_data_challenge_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, queries, k=5).collect()
    quant = cosine_topk_int8(emb, queries, k=5).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    qu = {(r["query_id"], r["neighbor_id"]) for r in quant}
    assert len(qu & ex) / len(ex) >= 0.8

    qv = emb.select(quantize_int8(F.col("embedding")).alias("q")).collect()
    flat = [x for r in qv for x in r["q"]]
    assert flat and all(-128 <= x <= 127 for x in flat)


def test_ivf_index_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    """The IVF index is two gold tables: probing the reloaded index must
    return exactly what probing the freshly built one returns — the
    build-once / serve-many contract."""
    from covid_data_challenge_spark.operators.ivf import ivf_build, ivf_probe
    from covid_data_challenge_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    centroids, inverted = ivf_build(emb, n_centroids=16, lloyd_iters=1)
    direct = ivf_probe(centroids, inverted, queries, k=5, nprobe=4).collect()

    cpath, ipath = str(tmp_path / "centroids"), str(tmp_path / "inverted")
    centroids.write.parquet(cpath)
    inverted.write.partitionBy("cid").parquet(ipath)
    reloaded = ivf_probe(
        spark.read.parquet(cpath), spark.read.parquet(ipath), queries, k=5, nprobe=4
    ).collect()

    assert sorted(map(tuple, direct), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, reloaded), key=lambda t: (t[0], t[3])
    )


def test_semdedup_centroid_sizing_policy():
    """default_n_centroids grows ∝ corpus (constant target cluster size),
    floors at the test-scale minimum, reproduces the paper's production
    point (~100k clusters for 1B vectors, ~25 MB of float32 centroids —
    inside the 64 MB broadcast budget), and refuses configurations whose
    centroid table would not broadcast."""
    import pytest

    from covid_data_challenge_spark.operators.semdedup import default_n_centroids

    assert default_n_centroids(500) == 8  # test-scale floor
    assert default_n_centroids(10_000_000) == 1_000
    assert default_n_centroids(1_000_000_000) == 100_000
    assert 100_000 * 64 * 4 <= 64 * 1024 * 1024  # the production point fits
    for small, big in [(10**6, 10**7), (10**7, 10**9)]:
        assert default_n_centroids(small) <= default_n_centroids(big)
    with pytest.raises(ValueError, match="broadcast"):
        default_n_centroids(10**12)  # 100M centroids = 25.6 GB: refuse


def test_semdedup_matches_numpy_replica(spark, sf_dir):
    """semdedup_prune must be bit-identical to a NumPy replay of the
    same recipe: seeded centroids (lowest ids) → 1 Lloyd iteration →
    nearest-centroid assignment (cosine, centroid-id tiebreak) →
    within-cluster cosine ≥ τ with round-4 → lowest-id survivor."""
    import numpy as np

    from covid_data_challenge_spark.operators.semdedup import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    n_cent, tau = 4, 0.9

    def assign(cent, cids):
        cn = np.linalg.norm(cent, axis=1)
        vn = np.linalg.norm(V, axis=1)
        denom = np.outer(vn, cn)
        sims = np.where(denom > 0, (V @ cent.T) / np.where(denom == 0, 1, denom), 0.0)
        # argmax with lowest-cid tiebreak == numpy argmax (first max wins,
        # cids sorted ascending)
        return cids[sims.argmax(axis=1)]

    cent = V[np.argsort(ids)[:n_cent]]  # lowest-id seeds (float32 data upcast)
    cid = assign(cent, np.arange(n_cent))
    # lloyd_refine drops a cluster that empties (the groupBy mean has no
    # rows for it) — the replica must mirror that, not keep the stale seed
    live = np.array([c for c in range(n_cent) if (cid == c).any()])
    cent = np.stack([np.float32(V[cid == c].mean(axis=0)) for c in live])
    cid = assign(cent, live)

    pruned = set()
    vn = np.linalg.norm(V, axis=1)
    for c in range(n_cent):
        members = np.where(cid == c)[0]
        for bi in members:
            for ai in members:
                if ids[ai] >= ids[bi]:
                    continue
                denom = vn[ai] * vn[bi]
                s = (V[ai] @ V[bi]) / denom if denom > 0 else 0.0
                if round(s, 4) >= tau:
                    pruned.add(int(ids[bi]))
                    break

    got = {
        r.vec_id: (r.cid, r.kept)
        for r in semdedup_prune(emb, n_centroids=n_cent, lloyd_iters=1, threshold=tau).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid][0] == cid[i], f"cluster mismatch for {vid}"
        assert got[vid][1] == (vid not in pruned), f"keep/prune mismatch for {vid}"
    assert any(not kept for _, kept in got.values()) or len(pruned) == 0


def test_bloom_decontaminate_no_false_negatives_vs_exact(spark, sf_dir):
    """Every doc the exact shingle join flags at min_common must also be
    flagged by the Bloom pass (false negatives are impossible; false
    positives are allowed and bounded)."""
    from covid_data_challenge_spark.operators.dedup import (
        bloom_decontaminate,
        doc_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    # Exact twin of the Bloom semantics: distinct train-doc grams present
    # in the union of eval grams (NOT per-eval-doc collision counts).
    exact = (
        doc_shingles(train, n=3)
        .join(doc_shingles(ev, n=3).select("shingle").distinct(), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    exact_ids = {r.id for r in exact.collect()}
    bloom_ids = {
        r.doc_id
        for r in bloom_decontaminate(train, ev, n=3, min_hit_grams=2).collect()
    }
    assert exact_ids, "fixture should produce at least one contaminated doc"
    assert exact_ids <= bloom_ids


def test_ivfpq_topk_recall_vs_exact_l2(spark, sf_dir):
    """IVF-PQ (16 coarse centroids, nprobe=8, 32×32 codebooks) must
    recover a solid share of the true L2 top-5 — uniform random
    embeddings are the adversarial case for PQ (no cluster structure),
    so 0.4 is a real bar (measured 0.56) — and its ADC distances must
    be non-decreasing within each query's ranking."""
    import numpy as np

    from covid_data_challenge_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    qmask = ids % 100 == 0
    exact = set()
    for qi in np.where(qmask)[0]:
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = sorted(
            ((float(d[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != ids[qi])
        )
        exact |= {(int(ids[qi]), nid) for _, nid in order[:5]}

    out = ivfpq_topk(
        emb, emb.filter(F.col("vec_id") % 100 == 0), k=5,
        n_centroids=16, nprobe=8, n_sub=32, n_codes=32,
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in out}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF-PQ recall too low: {recall}"

    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_distance"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        dists = [d for _, d in rs]
        assert dists == sorted(dists), f"ADC distances not monotone for query {q}"


def test_ivfpq_planted_duplicate_is_rank_one(spark, sf_dir):
    """An exact copy shares its original's coarse cell AND its full code
    word, so the original achieves the global ADC minimum for the copy's
    query — it must surface at rank 1 (id tie-break) with the copy's own
    self-distance. A deterministic guarantee, not a statistical one."""
    from covid_data_challenge_spark.operators.pq import ivfpq_topk

    corpus, planted_ids = _planted_neardup_corpus(spark, sf_dir)
    out = ivfpq_topk(
        corpus, corpus.filter(F.col("vec_id") >= 1000000), k=3,
        n_centroids=16, nprobe=4, n_sub=16, n_codes=16,
    ).collect()
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert set(rank1) == planted_ids
    for pid, nid in rank1.items():
        assert nid == pid - 1000000, f"copy {pid} did not rank its original first"


def test_pq_codebook_stays_dense_with_duplicate_seeds(spark):
    """A code whose seed subvector is an exact duplicate of a lower code
    gets ZERO Lloyd assignments (ties break to the lowest code) — the
    rebuild must keep its previous centroid, not drop the row: the ADC
    lookup table positionally indexes slot = sub·n_codes + code, so a
    dropped code would silently shift every later slot (ADVICE r6).
    Also pins the ivfpq_topk density guard for a too-small corpus."""
    import pytest as _pytest

    from covid_data_challenge_spark.operators.pq import ivfpq_topk, pq_train

    # 8 vectors, dim 8; vectors 0 and 1 are identical → with n_codes=4
    # every subspace seeds code 1 with a duplicate of code 0's centroid
    # and code 1 receives no assignments in the rebuild.
    base = [
        [float((7 * i + 3 * j) % 11) for j in range(8)] for i in range(8)
    ]
    base[1] = list(base[0])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cb = pq_train(corpus, n_sub=4, n_codes=4, lloyd_iters=1, dim=8)
    got = {(r["sub"], r["code"]) for r in cb.collect()}
    assert got == {(s, c) for s in range(4) for c in range(4)}, (
        "codebook lost (sub, code) rows — empty-cluster keep-previous rule broken"
    )
    # the retained code must keep its seed centroid (= the duplicate seed)
    kept = {
        (r["sub"], r["code"]): [float(x) for x in r["cvec"]] for r in cb.collect()
    }
    for s in range(4):
        assert kept[(s, 1)] == base[1][s * 2 : s * 2 + 2]

    # corpus smaller than n_codes → seeds can't fill the grid → the
    # positional-LUT guard must refuse loudly instead of mis-ranking
    tiny = spark.createDataFrame(rows[:3], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="not dense"):
        ivfpq_topk(tiny, tiny, k=1, n_centroids=2, nprobe=1, n_sub=4, n_codes=4, dim=8)


def test_semdedup_collapses_exact_duplicates_invariantly(spark, sf_dir):
    """Planting exact copies must (a) prune every copy in favor of its
    lowest-id original and (b) leave the originals' cluster/keep
    decisions EXACTLY as in the copy-free run — the collapse-first
    contract that keeps the pair stage linear under duplication."""
    from covid_data_challenge_spark.operators.semdedup import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    corpus, planted_ids = _planted_neardup_corpus(spark, sf_dir)
    base = {
        r.vec_id: (r.cid, r.kept)
        for r in semdedup_prune(emb, n_centroids=4, threshold=0.9).collect()
    }
    with_copies = {
        r.vec_id: (r.cid, r.kept)
        for r in semdedup_prune(corpus, n_centroids=4, threshold=0.9).collect()
    }
    assert len(with_copies) == len(base) + len(planted_ids)
    for pid in planted_ids:
        assert with_copies[pid][1] is False, f"copy {pid} must be pruned"
        assert with_copies[pid][0] == with_copies[pid - 1000000][0]  # same cluster as original
    for vid, (cid, kept) in base.items():
        assert with_copies[vid] == (cid, kept), f"original {vid} decision changed"


def test_containment_catches_subset_dup_jaccard_misses(spark):
    from covid_data_challenge_spark.operators.dedup import containment_pairs

    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (0, para),                      # short doc
        (1, para + " " + filler),       # long doc quoting doc 0 verbatim
        (2, "totally different words about nothing shared at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.5, max_doc_freq=None).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5, max_doc_freq=None).collect()
    }
    # every 3-gram of doc 0 appears in doc 1 -> containment 1.0 ...
    assert cont == {(0, 1): 1.0}
    # ... while symmetric Jaccard misses the subset pair entirely at 0.5
    assert jac == {}


def test_containment_capped_path_matches_uncapped_on_cold_corpus(spark):
    from covid_data_challenge_spark.operators.dedup import containment_pairs

    docs = _doc_corpus(spark)
    # cap far above every df in this tiny fixture: identical results
    capped = sorted(
        tuple(r) for r in containment_pairs(docs, threshold=0.2, max_doc_freq=100).collect()
    )
    uncapped = sorted(
        tuple(r) for r in containment_pairs(docs, threshold=0.2, max_doc_freq=None).collect()
    )
    assert capped == uncapped and capped  # non-empty: 0/1 exact dup pair


def test_bm25_ranks_term_dense_short_doc_first(spark, sf_dir, monkeypatch):
    # patch the module the query actually resolves _docs from (themed split)
    import covid_data_challenge_spark.queries_text as qe
    from covid_data_challenge_spark.registry import REGISTRY

    rows = [
        (0, "spark spark vector stream"),          # dense + short
        (1, "spark " + "padding " * 60),           # one hit, long
        (2, "nothing relevant whatsoever in here"),  # no hits
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(qe, "_docs", lambda _s, _d: docs.withColumn(
        "lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")))
    out = REGISTRY["bm25_topk"].spark(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 0 and 2 not in ids
    assert all(out[i]["bm25"] >= out[i + 1]["bm25"] for i in range(len(out) - 1))


def test_ngram_novelty_disjoint_vs_copied_sources(spark, sf_dir, monkeypatch):
    import covid_data_challenge_spark.queries_text as qe
    from covid_data_challenge_spark.registry import REGISTRY

    uniq = "one two three four five six seven eight"
    rows = [
        (0, uniq, "en", "srcA", 1),
        (1, uniq, "en", "srcB", 1),   # srcB copies srcA -> 0 novelty both
        (2, "red green blue cyan magenta yellow black", "en", "srcC", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(qe, "_docs", lambda _s, _d: docs)
    out = {
        r["source"]: r["novelty_ratio"]
        for r in REGISTRY["ngram_novelty_by_source"].spark(spark, sf_dir).collect()
    }
    assert out["srcA"] == 0.0 and out["srcB"] == 0.0 and out["srcC"] == 1.0


def test_containment_dominates_jaccard_on_every_pair(spark, sf_dir):
    """Mathematical invariant on real data: for any candidate pair,
    n_common/min(|A|,|B|) >= n_common/|A∪B|, so containment at threshold
    t must cover every jaccard pair at t and score each at least as
    high."""
    from covid_data_challenge_spark.operators.dedup import containment_pairs
    from covid_data_challenge_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.3, max_doc_freq=10).collect()
    }
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.3, max_doc_freq=10).collect()
    }
    assert jac, "fixture must produce at least one jaccard pair"
    for pair, j in jac.items():
        assert pair in cont and cont[pair] >= j, pair


def test_ivf_append_matches_full_rebuild_assignment(spark, sf_dir):
    """Incremental ingest contract: appending a new batch against the
    frozen centroids must give each new vector exactly the cid a full
    re-assignment over (old ∪ new) would give it, and probing the
    appended index must find planted new vectors."""
    from covid_data_challenge_spark.operators.ivf import (
        assign_to_centroids,
        ivf_append,
        ivf_build,
        ivf_probe,
    )
    from covid_data_challenge_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )

    centroids, inverted = ivf_build(old, n_centroids=8)
    centroids = centroids.localCheckpoint(eager=True)  # freeze the model
    appended = ivf_append(centroids, inverted, new)

    got = {r["neighbor_id"]: r["cid"] for r in appended.collect()}
    full = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(
            old.unionByName(new), centroids
        ).collect()
    }
    assert got and all(full[i] == c for i, c in got.items())

    # probing the appended index with a COPY of a new vector (different
    # id — self-matches are excluded by contract) must hit the planted
    # appended vector at cosine 1.0
    union = inverted.unionByName(appended)
    planted = new.orderBy("vec_id").limit(1)
    probe_q = planted.withColumn("vec_id", F.col("vec_id") + 1000000)
    top = ivf_probe(centroids, union, probe_q, k=1, nprobe=8).collect()
    assert top
    assert top[0]["neighbor_id"] == planted.collect()[0]["vec_id"]
    assert top[0]["cosine_sim"] == 1.0


def test_jl_projection_preserves_pairwise_distance_ranks(spark, sf_dir):
    """JL guarantee, empirically: for a planted triple (a near b, both
    far from c) the projected space must keep ||a-b|| << ||a-c||, and
    the Spark fold must match a NumPy replay of the same planes."""
    import numpy as np

    from covid_data_challenge_spark.operators.similarity import (
        _signed_planes,
        jl_project_units,
    )

    rng = np.random.default_rng(11)
    a = rng.normal(size=64).astype("float32")
    b = (a + 0.01 * rng.normal(size=64)).astype("float32")
    c = rng.normal(size=64).astype("float32") * 3
    emb = spark.createDataFrame(
        [(0, a.tolist()), (1, b.tolist()), (2, c.tolist())],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: np.array([int(u) for u in r.jl_units.split(",")]) / 1e6
        for r in jl_project_units(emb).collect()
    }
    d_ab = np.linalg.norm(out[0] - out[1])
    d_ac = np.linalg.norm(out[0] - out[2])
    assert d_ab * 5 < d_ac

    planes = np.array(_signed_planes(8, 64, seed=7))
    want = (planes @ a.astype("float64")) / np.sqrt(8)
    got = out[0]
    assert np.all(np.abs(got - want) <= 2e-6 + 1e-9 * np.abs(want))


def test_duplicate_spans_golden_cross_and_within_doc(spark):
    """Exact-substring span semantics on a hand-built fixture: a 9-token
    run shared by two docs yields one maximal span in each at the right
    offsets; a within-doc 8-token repeat merges its two adjacent
    duplicated windows into one 16-token span; a unique doc emits
    nothing."""
    from covid_data_challenge_spark.operators.dedup import duplicate_spans

    rows = [
        (0, "a b c d e f g h i j k l"),
        (1, "x0 x1 x2 a b c d e f g h i y0 y1"),
        (2, "p q r s t u v w"),
        (3, "m n o p2 q2 r2 s2 t2 m n o p2 q2 r2 s2 t2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_id, r.span_start): r
        for r in duplicate_spans(docs, k=8).collect()
    }
    assert set(out) == {(0, 1), (1, 4), (3, 1)}
    assert out[(0, 1)].span_end == 10 and out[(0, 1)].span_tokens == 9
    assert out[(1, 4)].span_end == 13 and out[(1, 4)].span_tokens == 9
    # within-doc repeat: windows at pos 1 and 9 are adjacent -> one span
    assert out[(3, 1)].span_end == 17 and out[(3, 1)].span_tokens == 16


def test_strip_duplicate_spans_lossless_and_exact(spark):
    """Strip semantics: the shared 9-token run disappears from BOTH
    hosts (no survivor), untouched docs round-trip losslessly, and a
    fully-duplicated doc drops out entirely."""
    from covid_data_challenge_spark.functions.text import normalize_text
    from covid_data_challenge_spark.operators.dedup import strip_duplicate_spans

    rows = [
        (0, "a b c d e f g h i j k l"),
        (1, "x0 x1 x2 a b c d e f g h i y0 y1"),
        (2, "p q r s t u v w unique tail here"),
        (3, "a b c d e f g h"),  # entirely inside the shared run
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in strip_duplicate_spans(docs, k=8).collect()}
    assert 3 not in out  # fully covered -> dropped
    assert out[0].clean_text == "j k l" and out[0].dropped_tokens == 9
    assert out[1].clean_text == "x0 x1 x2 y0 y1" and out[1].dropped_tokens == 9
    norm2 = docs.filter(F.col("doc_id") == 2).select(
        normalize_text(F.col("text")).alias("t")
    ).collect()[0].t
    assert out[2].clean_text == norm2 and out[2].dropped_tokens == 0


def test_ssl_prototype_prune_keeps_hard_half(spark, monkeypatch):
    """ssl_prototype_prune (r5): vectors most aligned with their class
    centroid (the easy, prototypical ones) are dropped; the hard half —
    strictly below the median prototypicality — is kept."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # on-axis: prototypical
        (1, [0.9, 0.1, 0.0, 0.0], 0),   # near-axis: prototypical
        (2, [0.1, 0.9, 0.0, 0.0], 0),   # off-axis: hard
        (3, [0.0, 0.0, 1.0, 0.0], 0),   # orthogonal-ish: hardest
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.vec_id: r for r in
           REGISTRY["ssl_prototype_prune"].spark(spark, "unused").collect()}
    assert len(out) == 4
    assert not out[0].keep and not out[1].keep
    assert out[2].keep and out[3].keep
    assert out[0].proto_cos > out[3].proto_cos


def test_d4_keep_implies_semdedup_kept(spark, sf_dir):
    """d4_prune_recipe (r5): the recipe's invariants on real data —
    d4_keep is a strict subset of the semdedup survivors, and per
    cluster the strictly-below-median rule keeps at most half of
    them."""
    import math

    from covid_data_challenge_spark.registry import REGISTRY

    rows = REGISTRY["d4_prune_recipe"].spark(spark, sf_dir).collect()
    assert rows
    per_cid: dict[int, list] = {}
    for r in rows:
        assert not (r.d4_keep and not r.semdedup_kept)
        per_cid.setdefault(r.cid, []).append(r)
    n_d4 = sum(1 for r in rows if r.d4_keep)
    assert 0 < n_d4 < sum(1 for r in rows if r.semdedup_kept)
    for cid, rs in per_cid.items():
        kept = [r for r in rs if r.semdedup_kept]
        d4 = [r for r in rs if r.d4_keep]
        assert len(d4) <= math.ceil(len(kept) / 2)


def test_minhash_signature_expr_matches_aggregation_path(spark, sf_dir):
    """minhash_signature_expr (r5, the streaming screen's map-side
    signature stage) is bit-identical to the explode+groupBy portable
    path on the full small-sf corpus."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.dedup import (
        minhash_signature_expr,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = minhash_signatures(docs, portable=True).orderBy("doc_id").collect()
    row_local = (
        docs.select(
            "doc_id", minhash_signature_expr(F.col("text")).alias("signature")
        )
        .filter(F.size(F.col("signature")) > 0)
        .filter(F.col("signature")[0].isNotNull())
        .orderBy("doc_id")
        .collect()
    )
    assert agg == row_local


def test_kcenter_coreset_picks_spread_centers(spark, monkeypatch):
    """kcenter_coreset (r5): on four orthogonal directions plus a pile
    of near-duplicates of the first, the greedy picks one center per
    direction before any duplicate, and the coverage radius is
    non-increasing."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0, 0.0], 0),   # near-dup of 0
        (2, [0.98, 0.02, 0.0, 0.0], 0),   # near-dup of 0
        (10, [0.0, 1.0, 0.0, 0.0], 0),
        (11, [0.0, 0.0, 1.0, 0.0], 0),
        (12, [0.0, 0.0, 0.0, 1.0], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = sorted(
        REGISTRY["kcenter_coreset"].spark(spark, "unused").collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in out] == [1, 2, 3, 4, 5]
    ids = [r.center_id for r in out]
    assert ids[0] == 0 and set(ids[1:4]) == {10, 11, 12}
    assert ids[4] in {1, 2}  # duplicates only after every direction covered
    radii = [r.radius for r in out]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert radii[4] < 0.05  # all directions + a dup covered -> tiny radius


def test_label_centroid_drift_separates_aligned_from_drifted(spark, monkeypatch):
    """label_centroid_drift (r5): a label whose members mirror the
    corpus mean scores ~1; a label pointing orthogonally scores low."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.1, 0.0, 0.0], 0),
        (2, [1.0, -0.1, 0.0, 0.0], 0),
        (3, [1.0, 0.0, 0.1, 0.0], 0),
        (10, [0.0, 0.0, 0.0, 1.0], 1),  # orthogonal minority label
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.label: r for r in
           REGISTRY["label_centroid_drift"].spark(spark, "unused").collect()}
    assert out[0].n_vecs == 4 and out[1].n_vecs == 1
    assert out[0].centroid_cos > 0.95
    assert out[1].centroid_cos < 0.5


def test_softdedup_reweight_downweights_by_cluster_size(spark, monkeypatch):
    """softdedup_reweight (r5): members of a near-dup cluster of size k
    carry weight 1/k (the cluster's total expected exposure stays 1);
    unique docs keep weight 1; effective tokens scale accordingly."""
    import covid_data_challenge_spark.queries_dedup as qd
    from covid_data_challenge_spark.registry import REGISTRY

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight"
    rows = [
        (0, dup, "en", "src0", len(dup)),
        (1, dup, "en", "src0", len(dup)),
        (2, uniq, "en", "src1", len(uniq)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(qd, "_docs", lambda spark, sf: docs)
    out = {r.doc_id: r for r in REGISTRY["softdedup_reweight"].spark(spark, "unused").collect()}
    assert len(out) == 3
    assert out[0].cluster_size == 2 and out[1].cluster_size == 2
    assert out[0].cluster_id == out[1].cluster_id == 0
    assert out[0].soft_weight == 0.5 and out[1].soft_weight == 0.5
    assert out[2].cluster_size == 1 and out[2].soft_weight == 1.0
    assert out[0].effective_tokens == out[0].n_tokens / 2.0
    assert out[2].effective_tokens == float(out[2].n_tokens)
    # per-cluster exposure: weights of the dup cluster sum to 1
    assert out[0].soft_weight + out[1].soft_weight == 1.0


def test_ann_pq_rerank_subset_of_shortlist_and_recall_dominates_adc(spark, sf_dir):
    """ann_pq_rerank (r5): the reranked top-5 is drawn from the IVF-PQ
    k'=20 shortlist, is ordered by exact cosine, and its recall@5
    against brute-force exact cosine is >= the raw ADC top-5's recall
    (rerank keeps every exact-top-5 member the shortlist contains,
    which is a superset of what ADC ranks into its own top-5)."""
    import covid_data_challenge_spark.queries_ext  # noqa: F401 — registers all queries
    from covid_data_challenge_spark.operators.pq import ivfpq_topk
    from covid_data_challenge_spark.registry import REGISTRY
    from covid_data_challenge_spark.queries_shared import _emb
    from pyspark.sql import functions as F

    rr = REGISTRY["ann_pq_rerank"].spark(spark, sf_dir).collect()
    exact = REGISTRY["ann_cosine_topk"].spark(spark, sf_dir).collect()
    adc = REGISTRY["ann_ivfpq_topk"].spark(spark, sf_dir).collect()
    emb = _emb(spark, sf_dir)
    short = ivfpq_topk(
        emb, emb.filter(F.col("vec_id") % 50 == 0),
        k=20, n_centroids=16, nprobe=8, n_sub=32, n_codes=32,
    ).collect()

    short_set = {(r.query_id, r.neighbor_id) for r in short}
    assert all((r.query_id, r.neighbor_id) in short_set for r in rr)
    by_q = {}
    for r in rr:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.cosine_sim for r in rows]
        assert all(a >= b for a, b in zip(sims, sims[1:]))

    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    rr_hits = sum((r.query_id, r.neighbor_id) in exact_set for r in rr)
    adc_hits = sum((r.query_id, r.neighbor_id) in exact_set for r in adc)
    assert rr_hits >= adc_hits


def test_embedding_top_pc_finds_dominant_direction(spark, monkeypatch):
    """embedding_top_pc (r5): on a cloud whose variance lives almost
    entirely on axis 0, PC1 aligns with axis 0 (unit component ~±1),
    the variance share is near 1, and the reported mean matches the
    micro-unit centroid."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = []
    for i in range(12):
        big = 2.0 if i % 2 == 0 else -2.0
        small = 0.05 if i % 3 == 0 else -0.05
        rows.append((i, [big, small] + [0.0] * 62, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.dim: r for r in REGISTRY["embedding_top_pc"].spark(spark, "unused").collect()}
    assert len(out) == 64
    assert abs(out[0].pc1) > 0.999
    assert all(abs(out[j].pc1) < 0.05 for j in range(1, 64))
    assert abs(sum(r.pc1 ** 2 for r in out.values()) - 1.0) < 1e-3
    assert out[0].var_share > 0.99
    assert all(r.eigval == out[0].eigval and r.eigval > 0 for r in out.values())
    assert out[0].mu == 0.0  # +2/-2 alternation cancels exactly


def test_embedding_abtt_scores_remove_common_direction(spark, monkeypatch):
    """embedding_abtt_scores (r5): on the planted 1-D cloud the PC1
    projection recovers each vector's axis-0 offset and the residual
    norm is just the small off-axis component — the common direction
    is gone."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = []
    for i in range(12):
        big = 2.0 if i % 2 == 0 else -2.0
        small = 0.05 if i % 3 == 0 else -0.05
        rows.append((i, [big, small] + [0.0] * 62, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.vec_id: r for r in
           REGISTRY["embedding_abtt_scores"].spark(spark, "unused").collect()}
    assert len(out) == 12
    for i, r in out.items():
        assert abs(abs(r.pc1_proj) - 2.0) < 0.01  # |axis-0 offset|
        assert r.resid_norm < 0.1  # only the 0.05 wiggle survives
    # projection signs follow the alternation (up to global PC sign)
    signs = {i: (1 if out[i].pc1_proj > 0 else -1) for i in out}
    assert all(signs[i] == signs[0] * (1 if i % 2 == 0 else -1) for i in signs)


def test_embedding_top_pcs_recovers_planted_2d_subspace(spark, monkeypatch):
    """embedding_top_pcs (r7 block power iteration): on a cloud whose
    variance is planted on axes 0 (strong) and 1 (weaker), PC1 aligns
    with axis 0, PC2 with axis 1, PC1 bit-matches embedding_top_pc's,
    the two PCs are orthonormal, and eig1 > eig2 > eig3."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = []
    for i in range(16):
        a = 3.0 if i % 2 == 0 else -3.0
        b = 1.0 if i % 4 < 2 else -1.0
        c = 0.03 if i % 3 == 0 else -0.03
        rows.append((i, [a, b, c] + [0.0] * 61, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.dim: r for r in
           REGISTRY["embedding_top_pcs"].spark(spark, "unused").collect()}
    assert len(out) == 64
    assert abs(out[0].pc1) > 0.999 and abs(out[0].pc2) < 0.05
    assert abs(out[1].pc2) > 0.999 and abs(out[1].pc1) < 0.05
    # orthonormal: unit norms, zero dot
    assert abs(sum(r.pc1 ** 2 for r in out.values()) - 1.0) < 1e-3
    assert abs(sum(r.pc2 ** 2 for r in out.values()) - 1.0) < 1e-3
    assert abs(sum(r.pc1 * r.pc2 for r in out.values())) < 1e-3
    r0 = out[0]
    assert r0.eig1 > r0.eig2 > r0.eig3 >= 0
    assert r0.var_share1 > 0.85 and r0.var_share2 > 0.05
    # PC1 bit-matches the single-vector helper (same trajectory)
    single = {r.dim: r.pc1 for r in
              REGISTRY["embedding_top_pc"].spark(spark, "unused").collect()}
    for j, r in out.items():
        assert r.pc1 == single[j], j


def test_abtt_v2_scores_remove_top2_subspace(spark, monkeypatch):
    """abtt_v2_scores (r7): on the planted 2-D cloud the two
    projections recover each vector's axis-0/axis-1 offsets and the
    residual norm is only the tiny axis-2 wiggle — BOTH common
    directions are gone (PC1-only removal would leave the ±1 axis-1
    component in the residual)."""
    import covid_data_challenge_spark.queries_similarity as qs
    from covid_data_challenge_spark.registry import REGISTRY

    rows = []
    for i in range(16):
        a = 3.0 if i % 2 == 0 else -3.0
        b = 1.0 if i % 4 < 2 else -1.0
        c = 0.03 if i % 3 == 0 else -0.03
        rows.append((i, [a, b, c] + [0.0] * 61, 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(qs, "_emb", lambda spark, sf: emb)
    # _emb_raw is the unwidened seam (r12 widen split) — same frame here
    monkeypatch.setattr(qs, "_emb_raw", lambda spark, sf: emb)
    out = {r.vec_id: r for r in
           REGISTRY["abtt_v2_scores"].spark(spark, "unused").collect()}
    assert len(out) == 16
    for i, r in out.items():
        assert abs(abs(r.pc1_proj) - 3.0) < 0.02, i
        assert abs(abs(r.pc2_proj) - 1.0) < 0.02, i
        assert r.resid_norm < 0.1, i  # PC1-only would leave ~1.0 here
    # v1-only removal for contrast: the old ABTT residual keeps axis 1
    old = {r.vec_id: r for r in
           REGISTRY["embedding_abtt_scores"].spark(spark, "unused").collect()}
    assert all(old[i].resid_norm > 0.9 for i in old)

def test_ivfpq_residual_quantization_beats_raw_on_clustered_corpus(spark):
    """Residual-IVFADC (r8): on CLUSTERED data — the regime the method
    was designed for — quantizing vec − centroid(cell) must cut the
    reconstruction MSE decisively vs raw-vector PQ at identical code
    budgets (cells align with clusters, so the codebooks cover small
    intra-cluster offsets instead of the whole ±10 span), and the
    recall\\@5 of the end-to-end operator must not lose either. Also
    pins residual-ADC rank monotonicity."""
    import numpy as np

    from covid_data_challenge_spark.operators.ivf import ivf_build
    from covid_data_challenge_spark.operators.pq import (
        ivfpq_residual_topk,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(7)
    centers = rng.uniform(-10.0, 10.0, (16, 64))
    rows = []
    vid = 0
    for c in range(16):
        for _ in range(30):
            v = centers[c] + rng.uniform(-0.5, 0.5, 64)
            rows.append((vid, [float(x) for x in np.float32(v)]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)

    n_sub, n_codes, sub_dim = 16, 32, 4
    centroids, inverted = ivf_build(corpus, 16, 1)
    cent = {r.cid: np.array(r.cvec, dtype=np.float64) for r in centroids.collect()}
    cell = {r.neighbor_id: r.cid for r in inverted.collect()}

    def reconstruct(codebook_df, codes_df):
        cb = {(r.sub, r.code): np.array(r.cvec, dtype=np.float64)
              for r in codebook_df.collect()}
        return {
            r.id: np.concatenate([cb[(s, r.codes[s])] for s in range(n_sub)])
            for r in codes_df.collect()
        }

    cb_raw = pq_train(corpus, n_sub, n_codes, 1)
    rec_raw = reconstruct(cb_raw, pq_encode(corpus, cb_raw, n_sub))
    mse_raw = np.mean([((rec_raw[i] - V[i]) ** 2).mean() for i in ids])

    resid = inverted.join(F.broadcast(centroids.select("cid", "cvec")), "cid").select(
        F.col("neighbor_id").alias("id"),
        F.zip_with(
            F.col("__cv"), F.col("cvec"),
            lambda x, y: x.cast("double") - y.cast("double"),
        ).alias("rv"),
    )
    cb_res = pq_train(resid, n_sub, n_codes, 1, id_col="id", vec_col="rv")
    rec_res_off = reconstruct(cb_res, pq_encode(resid, cb_res, n_sub, "id", "rv"))
    mse_res = np.mean(
        [((cent[cell[i]] + rec_res_off[i] - V[i]) ** 2).mean() for i in ids]
    )
    # measured: raw ~2.0, residual ~0.02 — two orders of magnitude
    assert mse_res < 0.5 * mse_raw, (mse_res, mse_raw)

    exact = set()
    for qi in np.where(ids % 10 == 0)[0]:
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = sorted(
            ((float(d[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != ids[qi])
        )
        exact |= {(int(ids[qi]), nid) for _, nid in order[:5]}
    qs = corpus.filter(F.col("vec_id") % 10 == 0)
    kw = dict(k=5, n_centroids=16, nprobe=4, n_sub=n_sub, n_codes=n_codes)
    raw = {(r.query_id, r.neighbor_id) for r in ivfpq_topk(corpus, qs, **kw).collect()}
    out = ivfpq_residual_topk(corpus, qs, **kw).collect()
    res = {(r.query_id, r.neighbor_id) for r in out}
    assert len(exact & res) >= len(exact & raw)

    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_distance))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        assert [d for _, d in rs] == sorted(d for _, d in rs)


def test_ivfpq_residual_gold_roundtrip_serve_matches_composite(spark, sf_dir, tmp_path):
    """r9 build/serve split: probing residual gold tables RELOADED from
    parquet is bit-identical to the in-session composite — float32/int
    parquet roundtrip is exact, so the ann_ivfpq_residual_serve oracle
    (which replays the full build + probe as CTEs) legitimately
    hash-matches either path."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.pq import (
        ivfpq_residual_build_tables,
        ivfpq_residual_serve,
        ivfpq_residual_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    kw = dict(n_centroids=16, n_sub=8, n_codes=16)

    composite = ivfpq_residual_topk(
        emb, queries, k=5, nprobe=4, **kw
    ).collect()

    cents, cb, idx = ivfpq_residual_build_tables(emb, **kw)
    cents = cents.persist()
    cb = cb.persist()
    base = str(tmp_path / "gold")
    cents.write.parquet(f"{base}/centroids")
    cb.write.parquet(f"{base}/codebook")
    idx.write.partitionBy("cid").parquet(f"{base}/pq_index")
    cents.unpersist()
    cb.unpersist()

    served = ivfpq_residual_serve(
        spark.read.parquet(f"{base}/centroids"),
        spark.read.parquet(f"{base}/codebook"),
        spark.read.parquet(f"{base}/pq_index"),
        queries,
        k=5,
        nprobe=4,
        **kw,
    ).collect()

    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, served), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, composite), key=lambda t: (t[0], t[1])
    )
    assert len(served) > 0


def test_ann_pq_rerank_serve_matches_recomputed_shortlist_and_plan(spark, sf_dir):
    """r11 rerank build/serve split: re-ranking the RELOADED shortlist
    gold (ann_pq_rerank_serve) is row-identical to re-ranking a
    shortlist probed in session (ann_pq_serve — same fixed batch, same
    index gold, same k'=20 → top-5), because the int/float parquet
    roundtrip is exact. The serve leg's executed plan must fetch
    candidates via broadcast joins into ONE corpus scan — never a
    SortMergeJoin, never a corpus shuffle before the per-query
    window."""
    import covid_data_challenge_spark.queries_ext  # noqa: F401 — registers all queries
    from covid_data_challenge_spark.registry import REGISTRY

    served = REGISTRY["ann_pq_rerank_serve"].spark(spark, sf_dir)
    via_probe = REGISTRY["ann_pq_serve"].spark(spark, sf_dir).collect()
    rows = served.collect()
    assert len(rows) > 0
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, rows)) == sorted(map(tuple, via_probe))
    for r in rows:
        assert 1 <= r.rank <= 5

    plan = served._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both sections
    assert "SortMergeJoin" not in plan
    assert final.count("BroadcastHashJoin") == 2  # shortlist⋈q, then →corpus scan


def test_near_dedup_best_quality_survivor_not_min_id(spark, monkeypatch):
    """dedup_near_keep_best_quality (r9): in a planted 3-doc near-dup
    cluster where the HIGHEST-quality member has the LARGEST id, the
    survivor must be that member (canonical min-id selection would keep
    doc 0 — the two rules are pinned apart); the unrelated singleton
    survives itself."""
    import covid_data_challenge_spark.queries_ext  # noqa: F401
    import covid_data_challenge_spark.queries_dedup as qs
    from covid_data_challenge_spark.registry import REGISTRY

    base = " ".join(
        ["the cat and the dog ran to the house of the king in the field"] * 3
    )
    docs = spark.createDataFrame(
        [
            # same shared prose → one Jaccard cluster; quality ordered
            # 0 < 1 < 2 by punctuation junk (punct penalty x10)
            (0, base + " !!! ??? ;;; ::: ,,,", "en", "s0", 1),
            (1, base + " !!! ???", "en", "s0", 1),
            (2, base, "en", "s0", 1),
            (7, "completely different words about spark shuffles and parquet footers entirely", "en", "s0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(qs, "_docs", lambda spark, sf: docs)
    rows = {
        r.cluster_id: r
        for r in REGISTRY["dedup_near_keep_best_quality"].spark(spark, "unused").collect()
    }
    cluster = next(r for r in rows.values() if r.cluster_size == 3)
    assert cluster.doc_id == 2  # best quality, NOT the min id
    singleton = next(r for r in rows.values() if r.cluster_size == 1)
    assert singleton.doc_id == 7
    # the min-id rule keeps doc 0 on the same corpus — the rules differ
    canon = {
        r.doc_id
        for r in REGISTRY["dedup_near_keep_canonical"].spark(spark, "unused").collect()
    }
    assert 0 in canon and 2 not in canon
