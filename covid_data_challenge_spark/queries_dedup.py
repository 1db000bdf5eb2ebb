"""Deduplication & decontamination: exact, n-gram Jaccard /
containment, MinHash-LSH, SimHash, boilerplate & passage dedup, Bloom
eval-decontamination, dup reporting.

Registered via registry.register; queries_ext imports every themed
module and restores the frozen driver-contract registry order
(registry_order.CANONICAL_ORDER) afterwards — in-module order is
thematic, not contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from covid_data_challenge_spark.functions.text import token_count, tokens
from covid_data_challenge_spark.operators.dedup import bloom_decontaminate, containment_pairs, decontamination_overlap, dedup_exact_keep_first, exact_dedup_stats, hot_shingles, jaccard_pairs, minhash_lsh_pairs, passage_dedup, simhash_md5, simhash_md5_sql, simhash_neardup_pairs
from covid_data_challenge_spark.operators.components import cluster_assignments, dedup_keep_canonical
from covid_data_challenge_spark.registry import register
from covid_data_challenge_spark.sources.readers import load_table
from covid_data_challenge_spark.queries_shared import (  # noqa: F401
    _JACCARD_EDGE_CTES,
    _NORM,
    _QUALITY_SQL,
    _docs,
)


@register(
    "dedup_exact_stats",
    oracle=f"""
WITH fp AS (SELECT md5({_NORM}) AS fp FROM documents),
per AS (SELECT fp, count(*) AS n FROM fp GROUP BY fp)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(count(*) FILTER (n > 1) AS BIGINT) AS n_dup_groups,
       CAST(coalesce(sum(n - 1) FILTER (n > 1), 0) AS BIGINT) AS n_redundant_docs
FROM per
""",
)
def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_stats(_docs(spark, sf_dir))


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
cold AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s) WHERE df <= 10),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
""",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with the hot-shingle cap engaged
    (``max_doc_freq=10``): shingles hotter than the cap are dropped
    before the inverted-index self-join, bounding per-shingle join cost
    at df² ≤ 100 no matter how large the corpus — the stop-word-shingle
    quadratic blowup cannot happen. Union sizes still count all
    shingles, so the reported jaccard is a documented lower bound for
    pairs that share hot shingles (the DuckDB oracle mirrors the cap
    exactly). MinHash-LSH remains the sub-quadratic scale path; this is
    the exact-verification twin."""
    return jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2, max_doc_freq=10)


@register(
    "dedup_keep_first",
    oracle=f"""
WITH fp AS (SELECT doc_id, md5({_NORM}) AS f FROM documents),
keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN keep USING (doc_id)
""",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic survivor selection (lowest id per
    fingerprint) — ``dropDuplicates`` keeps an arbitrary row, which is not
    reproducible across partitionings."""
    return dedup_exact_keep_first(_docs(spark, sf_dir)).select("doc_id", "lang", "source")


def _minhash_lsh_oracle(num_perm: int = 32, bands: int = 8, threshold: float = 0.2) -> str:
    """Banded MinHash-LSH replay: 3-gram shingles → 31-bit md5 base hash
    (nibble arithmetic) → the SAME seeded affine permutations the engine
    uses (dedup.minhash_coeffs) → per-band value-tuple candidate join →
    agreeing-position estimate. Bit-exact end to end."""
    from covid_data_challenge_spark.operators.dedup import MERSENNE31, minhash_coeffs

    rpb = num_perm // bands
    h31 = (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(s), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
            for i in range(8)
        )
        + f") % {MERSENNE31}"
    )
    perm_rows = ", ".join(f"({p}, {a}, {b})" for p, (a, b) in enumerate(minhash_coeffs(num_perm)))
    return f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
h AS (SELECT doc_id, {h31} AS h31 FROM sh),
perms(p, a, b) AS (VALUES {perm_rows}),
sig AS (
    SELECT doc_id, p, min((a * h31 + b) % {MERSENNE31}) AS v
    FROM h CROSS JOIN perms GROUP BY doc_id, p
),
sigarr AS (SELECT doc_id, list(v ORDER BY p) AS sig FROM sig GROUP BY doc_id),
banded AS (
    SELECT doc_id, bb.band, sig[bb.band * {rpb} + 1 : bb.band * {rpb} + {rpb}] AS bucket
    FROM sigarr CROSS JOIN (SELECT CAST(unnest(range({bands})) AS INT) AS band) bb
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / {num_perm}.0, 4)
           AS est_jaccard
FROM cand
JOIN sigarr sa ON sa.doc_id = doc_a
JOIN sigarr sb ON sb.doc_id = doc_b
WHERE round(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / {num_perm}.0, 4)
      >= {threshold}
"""


@register("minhash_lsh_pairs", oracle=_minhash_lsh_oracle())
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs on the portable md5-affine
    permutation family: one md5 per shingle → 31-bit base hash → seeded
    affine permutations mod 2^31-1 (exact in int64 on every engine), so
    the banding, candidate generation, AND the agreeing-position
    estimates all hash-match a DuckDB oracle. The xxhash64 family stays
    available for raw throughput (operators/dedup.py:minhash_signatures)."""
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), n=3, num_perm=32, bands=8, threshold=0.2, portable=True
    )


_SIMHASH_TOK_SQL = f"SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents"


@register(
    "simhash_fingerprints",
    oracle=f"""
WITH tok AS ({_SIMHASH_TOK_SQL}),
fp AS ({simhash_md5_sql()})
SELECT doc_id, simhash FROM fp
""",
)
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints — md5-nibble variant, so the bit
    balances (and thus every fingerprint) replay bit-exactly in DuckDB;
    the xxhash64 variant stays available for raw throughput
    (operators/dedup.py:simhash_md5)."""
    return simhash_md5(_docs(spark, sf_dir))


@register(
    "simhash_neardup_pairs",
    oracle=f"""
WITH tok AS ({_SIMHASH_TOK_SQL}),
fp AS ({simhash_md5_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming≤k SimHash pairs via pigeonhole banding (exact recall, no
    O(n²) stage), on the portable md5 fingerprint — the banded plan must
    reproduce the oracle's brute-force all-pairs answer exactly, which
    checks the banding recall proof itself, not just the fingerprints."""
    return simhash_neardup_pairs(_docs(spark, sf_dir), max_hamming=3, portable=True)


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES}
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM assigned
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over the n-gram Jaccard edge list via
    distributed connected components (large-star/small-star); the DuckDB
    oracle recomputes the same clusters with a recursive CTE, so the
    iterative DataFrame algorithm is value-checked end to end."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    return cluster_assignments(docs, pairs)


@register(
    "dedup_near_keep_canonical",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES}
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN assigned a USING (doc_id)
WHERE a.doc_id = a.cluster_id
""",
)
def q_dedup_near_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup survivors: the minimum doc id of each connected
    component — deterministic under any partitioning, unlike
    ``dropDuplicates`` survivor choice."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    return dedup_keep_canonical(docs, pairs).select("doc_id", "lang", "source")


@register(
    "decontaminate_eval_overlap",
    oracle=f"""
WITH docs AS (SELECT doc_id, source, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id, source,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
ev AS (SELECT doc_id, s FROM sh WHERE source = 'src0'),
tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
evsz AS (SELECT doc_id, count(*) AS n_eval_sh FROM ev GROUP BY doc_id),
common AS (
    SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_common
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY 1, 2
)
SELECT train_id, eval_id, CAST(n_common AS BIGINT) AS n_common,
       round(n_common / evsz.n_eval_sh, 4) AS eval_overlap
FROM common JOIN evsz ON evsz.doc_id = eval_id
WHERE n_common >= 2
""",
)
def q_decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: word 3-gram collisions between the
    training corpus (sources != src0) and a held-out eval set (src0).
    The eval shingle table is broadcast, so corpus shingles stream
    map-side and never shuffle (operators/dedup.py:decontamination_overlap)."""
    docs = _docs(spark, sf_dir)
    return decontamination_overlap(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=3,
        min_common=2,
    )


@register(
    "simjoin_levenshtein",
    oracle="""
SELECT a.c_nationkey,
       a.c_custkey AS custkey_a,
       b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
""",
)
def q_simjoin_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-≤2 similarity self-join at scale via FastSS
    deletion neighborhoods: two strings within edit distance k share a
    common variant in their ≤k-deletion neighborhoods (Bocek et al.,
    "Fast Similarity Search in Large Dictionaries", 2007 — public
    algorithm), so candidate generation is an EQUI-join on
    (nation, variant) — no per-block all-pairs, no quadratic blowup —
    followed by exact ``levenshtein`` verification. The ≤2-deletion
    neighborhood of the 9-char digit suffix is 1+9+36=46 variants per
    row, generated map-side with array ops; the variant join key is
    high-cardinality, so parallelism is by variant, and the verified
    result equals the brute-force all-pairs oracle exactly."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_name"
    )
    # ≤2-deletion neighborhood of the digit suffix of Customer#%09d
    # (lev over the full name == lev over the suffix: shared prefix)
    variants = F.expr(
        """
        array_union(
          array_union(
            array(substring(c_name, 10, 9)),
            transform(sequence(1, 9),
                      i -> concat(substring(substring(c_name, 10, 9), 1, i - 1),
                                  substring(substring(c_name, 10, 9), i + 1, 9)))
          ),
          flatten(transform(sequence(1, 8),
            i -> transform(sequence(i + 1, 9),
              j -> concat(substring(substring(c_name, 10, 9), 1, i - 1),
                          substring(substring(c_name, 10, 9), i + 1, j - i - 1),
                          substring(substring(c_name, 10, 9), j + 1, 9)))))
        )
        """
    )
    # Candidate generation WITHOUT a self-join: group rows by
    # (nation, variant) and explode i<j pairs inside each group. Group
    # sizes are combinatorially bounded independent of corpus size (a
    # variant's possible parents are the ≤(len+1)·10 one-digit
    # insertions, ≤ ~3.6k for two; observed max 42 at sf0.1), so the
    # per-group pair explosion is memory-safe and the whole operator is
    # one explode + two shuffles (group, then pair-dedup).
    tagged = cust.select(
        "c_nationkey",
        F.struct("c_custkey", "c_name").alias("rec"),
        F.explode(variants).alias("variant"),
    )
    grp = tagged.groupBy("c_nationkey", "variant").agg(
        F.collect_list("rec").alias("rs")
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                "rs",
                lambda x: F.transform(
                    "rs",
                    lambda y: F.struct(
                        x["c_custkey"].alias("custkey_a"),
                        y["c_custkey"].alias("custkey_b"),
                        x["c_name"].alias("name_a"),
                        y["c_name"].alias("name_b"),
                    ),
                ),
            )
        ),
        lambda p: p["custkey_a"] < p["custkey_b"],
    )
    cand = (
        grp.select("c_nationkey", F.explode(pair).alias("p"))
        .select("c_nationkey", "p.*")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist <= 2).select(
        "c_nationkey", "custkey_a", "custkey_b", dist.cast("int").alias("dist")
    )


@register(
    "incremental_batch_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string((string_split({_NORM}, ' '))[1:5], ' ')) AS fp
  FROM documents
),
hist AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0)
SELECT b.doc_id, b.fp,
       CAST(CASE WHEN h.fp IS NULL THEN 0 ELSE 1 END AS INT) AS dup_of_history
FROM batch b LEFT JOIN hist h ON b.fp = h.fp
""",
)
def q_incremental_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production incremental-ingest shape: dedup a NEW batch against
    the historical corpus without ever re-shuffling history against
    itself. Both sides reduce to (distinct) prefix fingerprints —
    md5 of the first 5 normalized tokens, the opening-shingle key that
    catches boilerplate-prefix duplicates exact hashing misses — and the
    join keys on fp: at 100 TB the history side is a pre-built
    fingerprint gold table (bucketed on fp), so each day's batch joins
    shuffle-free against it. md5 keeps the fingerprint engine-portable
    (splits.py discipline) → exact oracle."""
    docs = _docs(spark, sf_dir)
    fp = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 5))).alias("fp"),
    )
    hist = fp.filter(F.col("doc_id") % 5 != 0).select("fp").distinct()
    batch = fp.filter(F.col("doc_id") % 5 == 0)
    return batch.join(
        hist.withColumn("__seen", F.lit(1)), "fp", "left"
    ).select(
        "doc_id",
        "fp",
        F.when(F.col("__seen").isNull(), 0).otherwise(1).cast("int").alias("dup_of_history"),
    )


@register(
    "boilerplate_ngrams",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3]
                || ' ' || w[i + 4] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 4
),
freq AS (SELECT s AS shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s)
SELECT shingle, df FROM freq ORDER BY df DESC, shingle LIMIT 20
""",
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word 5-grams by document frequency — the boilerplate
    (header/footer/license-block) detector run before writing strip
    rules for a pretraining corpus. One explode + one shuffle on the
    shingle string; the top-k plans as TakeOrderedAndProject with the
    (df desc, shingle) total order making the cutoff deterministic
    (operators/dedup.py:hot_shingles)."""
    return hot_shingles(_docs(spark, sf_dir), n=5, top=20)


@register(
    "bloom_decontaminate",
    oracle=f"""
WITH docs AS (SELECT doc_id, source, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id, source,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
bits AS (
    SELECT DISTINCT substr(md5('b' || j || ':' || s), 1, 5) AS pos
    FROM sh JOIN (SELECT unnest(range(0, 3)) AS j) js ON true
    WHERE source = 'src0'
),
hits AS (
    SELECT doc_id,
           count(*) AS n_grams,
           count(*) FILTER (
                 substr(md5('b0:' || s), 1, 5) IN (SELECT pos FROM bits)
             AND substr(md5('b1:' || s), 1, 5) IN (SELECT pos FROM bits)
             AND substr(md5('b2:' || s), 1, 5) IN (SELECT pos FROM bits)
           ) AS n_hit_grams
    FROM sh WHERE source <> 'src0' GROUP BY doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_hit_grams AS BIGINT) AS n_hit_grams,
       round(n_hit_grams / n_grams, 4) AS hit_rate
FROM hits WHERE n_hit_grams >= 2
""",
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: train docs (source != src0) whose
    3-grams hit the Bloom filter of the eval set's (src0) 3-grams ≥ 2
    times. The filter is a fixed ~1M-slot bit set materialized as a
    (position) table of set bits and probed by a position-keyed
    broadcast hash join — bounded broadcast bytes no matter how large
    the eval set, zero false negatives, and the md5-derived positions
    make DuckDB replay the filter bit-exactly. (The earlier one-row
    collect_set + array-scan form was measured 58× slower and removed;
    see test_bloom_probe_is_broadcast_hash_join.)
    (operators/dedup.py:bloom_decontaminate)."""
    docs = _docs(spark, sf_dir)
    return bloom_decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=3,
        k=3,
        hex_width=5,
        min_hit_grams=2,
    )


@register(
    "dup_pairs_by_source",
    oracle=f"""
WITH docs AS (SELECT doc_id, source, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
cold AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s) WHERE df <= 10),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
),
lab AS (
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b
    FROM pairs
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_dup_pairs
FROM lab GROUP BY 1, 2
""",
)
def q_dup_pairs_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (capped exact
    Jaccard, the same recipe as ngram_jaccard_pairs) labeled with their
    documents' sources, counted per unordered source pair — the "which
    corpora copy from each other" screen that decides dedup ORDER in a
    multi-source training mix. The doc→source joins are broadcast
    (pair table is collision-bounded); sources canonicalized with
    least/greatest so the matrix is triangular."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
    )


@register(
    "dup_cluster_size_distribution",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
per AS (SELECT cluster_id, count(*) AS cluster_size FROM assigned GROUP BY cluster_id)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM per GROUP BY cluster_size
""",
)
def q_dup_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts over near-dup clusters: how many clusters exist
    at each size — the shape that tells you whether duplication is a
    few mega-clusters (boilerplate, mirrors) or a long tail of pairs,
    and therefore what the dedup pass will actually delete. Reuses the
    connected-components assignment; both follow-up aggregations run
    over cluster-count-sized data."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    per = (
        cluster_assignments(docs, pairs)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return per.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    ).select(F.col("cluster_size").cast("long").alias("cluster_size"), "n_clusters")


@register(
    "dedup_savings_report",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) FILTER (a.doc_id <> a.cluster_id) AS BIGINT) AS n_removed,
       CAST(coalesce(sum(d.n_chars) FILTER (a.doc_id <> a.cluster_id), 0) AS BIGINT)
           AS chars_removed,
       round(coalesce(sum(d.n_chars) FILTER (a.doc_id <> a.cluster_id), 0)
             / sum(d.n_chars), 6) AS savings_ratio
FROM documents d JOIN assigned a USING (doc_id)
""",
)
def q_dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the near-dedup pass actually buys: documents and characters
    deleted if every cluster keeps only its canonical (min-id) member —
    the capacity-planning number quoted before running corpus dedup at
    scale (exact duplicates are a subset of the clusters, so this is
    the combined exact+near figure). Reuses the connected-components
    assignment; the report is a single reduction over doc-count rows."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    assigned = cluster_assignments(docs, pairs).select("doc_id", "cluster_id")
    removed = (F.col("doc_id") != F.col("cluster_id")).cast("int")
    return (
        docs.select("doc_id", "n_chars")
        .join(assigned, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(removed).cast("long").alias("n_removed"),
            F.sum(removed * F.col("n_chars")).cast("long").alias("chars_removed"),
            F.round(
                F.sum(removed * F.col("n_chars")) / F.sum("n_chars"), 6
            ).alias("savings_ratio"),
        )
    )


@register(
    "doc_prefix_dup_rate",
    oracle=f"""
WITH p AS (
    SELECT doc_id,
           md5(array_to_string(list_slice(string_split({_NORM}, ' '), 1, 8), ' ')) AS pfx
    FROM documents
),
freq AS (SELECT pfx, count(*) AS n FROM p GROUP BY pfx)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_prefixes,
       CAST(coalesce(sum(n) FILTER (n > 1), 0) AS BIGINT) AS n_docs_sharing,
       round(coalesce(sum(n) FILTER (n > 1), 0) / sum(n), 6) AS prefix_dup_rate
FROM freq
""",
)
def q_doc_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplication screen: share of documents whose first-8-token
    prefix is shared with at least one other document — the O(n)
    pre-screen run before any pairwise dedup tier (a high rate predicts
    boilerplate/mirrors and tells you exact-hash dedup alone will pay).
    One md5-of-prefix groupBy plus a single-row reduction."""
    docs = _docs(spark, sf_dir)
    pfx = F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)))
    freq = docs.select(pfx.alias("pfx")).groupBy("pfx").agg(
        F.count(F.lit(1)).alias("n")
    )
    shared = F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))
    return freq.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_prefixes"),
        F.sum(shared).cast("long").alias("n_docs_sharing"),
        F.round(F.sum(shared) / F.sum("n"), 6).alias("prefix_dup_rate"),
    )


@register(
    "passage_dedup",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
pass AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(w[(i * 16 + 1):(i * 16 + 16)], ' ') AS passage
  FROM toks JOIN (SELECT unnest(range(0, 100000)) AS i) idx ON i * 16 < len(w)
),
kept AS (
  SELECT doc_id, pos, passage FROM (
    SELECT doc_id, pos, passage,
           row_number() OVER (PARTITION BY md5(passage) ORDER BY doc_id, pos) AS rn
    FROM pass
  ) WHERE rn = 1
)
SELECT doc_id,
       string_agg(passage, ' ' ORDER BY pos) AS clean_text,
       count(*) AS kept_passages
FROM kept GROUP BY doc_id
""",
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage-level exact dedup (CCNet/RefinedWeb line
    dedup, token-windowed): every 16-token window occurs once in the
    whole corpus — lowest (doc_id, pos) wins — and documents are
    reassembled from their surviving passages. Two shuffles at any
    corpus size: passage-hash keep-first, doc_id reassembly
    (operators/dedup.py:passage_dedup)."""
    return passage_dedup(_docs(spark, sf_dir), passage_tokens=16)


@register(
    "boilerplate_passage_strip",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
pass AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(w[(i * 16 + 1):(i * 16 + 16)], ' ') AS passage
  FROM toks JOIN (SELECT unnest(range(0, 100000)) AS i) idx ON i * 16 < len(w)
),
keyed AS (SELECT doc_id, pos, passage, md5(passage) AS h FROM pass),
hot AS (
  SELECT h FROM keyed GROUP BY h HAVING count(DISTINCT doc_id) > 4
),
kept AS (
  SELECT k.doc_id, k.pos, k.passage
  FROM keyed k WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.h = k.h)
)
SELECT doc_id,
       string_agg(passage, ' ' ORDER BY pos) AS clean_text,
       count(*) AS kept_passages
FROM kept GROUP BY doc_id
""",
)
def q_boilerplate_passage_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate passage removal: any 16-token window shared by more
    than 4 distinct documents is stripped from ALL of them (no
    first-occurrence survivor — the first page carrying a cookie banner
    doesn't own it); the strip decision is a broadcast ANTI join against
    the tiny hot-passage set (operators/dedup.py:boilerplate_passage_strip)."""
    from covid_data_challenge_spark.operators.dedup import boilerplate_passage_strip

    return boilerplate_passage_strip(_docs(spark, sf_dir), max_df=4)


def _minhash_lsh_incremental_oracle(
    num_perm: int = 32, bands: int = 8, threshold: float = 0.2
) -> str:
    """Incremental replay of the banded MinHash screen: same portable
    signature pipeline as :func:`_minhash_lsh_oracle`, but candidates
    come only from history-bands ⋈ batch-bands (batch = doc_id % 5 = 0,
    the incremental_batch_dedup convention)."""
    from covid_data_challenge_spark.operators.dedup import MERSENNE31, minhash_coeffs

    rpb = num_perm // bands
    h31 = (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(s), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
            for i in range(8)
        )
        + f") % {MERSENNE31}"
    )
    perm_rows = ", ".join(
        f"({p}, {a}, {b})" for p, (a, b) in enumerate(minhash_coeffs(num_perm))
    )
    return f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
h AS (SELECT doc_id, {h31} AS h31 FROM sh),
perms(p, a, b) AS (VALUES {perm_rows}),
sig AS (
    SELECT doc_id, p, min((a * h31 + b) % {MERSENNE31}) AS v
    FROM h CROSS JOIN perms GROUP BY doc_id, p
),
sigarr AS (SELECT doc_id, list(v ORDER BY p) AS sig FROM sig GROUP BY doc_id),
banded AS (
    SELECT doc_id, bb.band, sig[bb.band * {rpb} + 1 : bb.band * {rpb} + {rpb}] AS bucket
    FROM sigarr CROSS JOIN (SELECT CAST(unnest(range({bands})) AS INT) AS band) bb
),
cand AS (
    SELECT DISTINCT nb.doc_id AS batch_doc, hb.doc_id AS hist_doc
    FROM banded hb JOIN banded nb
      ON hb.band = nb.band AND hb.bucket = nb.bucket
    WHERE nb.doc_id % 5 = 0 AND hb.doc_id % 5 <> 0
)
SELECT batch_doc, hist_doc,
       round(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / {num_perm}.0, 4)
           AS est_jaccard
FROM cand
JOIN sigarr sa ON sa.doc_id = batch_doc
JOIN sigarr sb ON sb.doc_id = hist_doc
WHERE round(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / {num_perm}.0, 4)
      >= {threshold}
"""


@register("minhash_neardup_incremental", oracle=_minhash_lsh_incremental_oracle())
def q_minhash_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest near-dup screen: NEW-batch docs (doc_id % 5 = 0, the
    incremental_batch_dedup convention) banded against HISTORY only —
    candidate cost ∝ |batch| × collision rate, history never pairs
    against itself. At 100 TB the history bands are a pre-built gold
    table bucketed on (band, bucket) and the daily join is shuffle-free
    on the history side
    (operators/dedup.py:minhash_lsh_pairs_incremental)."""
    from covid_data_challenge_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    docs = _docs(spark, sf_dir)
    history = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_lsh_pairs_incremental(history, batch, portable=True)


@register(
    "containment_neardup_pairs",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
cold AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s) WHERE df <= 10),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       round(n_common / least(sa.n_sh, sb.n_sh), 4) AS containment
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / least(sa.n_sh, sb.n_sh), 4) >= 0.5
""",
)
def q_containment_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup by shingle CONTAINMENT (|A∩B| / min set
    size): catches a short document embedded verbatim in a long one,
    which Jaccard scores near zero. Shares the capped inverted-index
    candidate machinery with ``ngram_jaccard_pairs``
    (operators/dedup.py:pair_overlap_counts) — same df≤10 hot-shingle
    cap bounding join fan-out, same in-group i<j explode, no self-join
    — so the 100 TB analysis there carries over unchanged."""
    return containment_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_doc_freq=10
    )


# ---------------------------------------------------------------------------
# Round 4: exact substring dedup — maximal duplicated spans
# (Lee et al. 2021, arXiv:2107.06499; stride-1 window twin of the
# suffix-array approach)
# ---------------------------------------------------------------------------

_SPAN_K = 8


@register(
    "duplicate_spans",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
wins AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           md5(array_to_string(w[i:(i + {_SPAN_K - 1})], ' ')) AS h
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - {_SPAN_K - 1}
),
duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
dup AS (
    SELECT doc_id, pos, pos + {_SPAN_K} AS e
    FROM wins WHERE h IN (SELECT h FROM duph)
),
isl AS (
    SELECT doc_id, pos, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_end
    FROM dup
),
marked AS (
    SELECT doc_id, pos, e,
           CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS ni
    FROM isl
),
numbered AS (
    SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island
    FROM marked
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(pos) AS BIGINT) AS span_tokens
FROM numbered GROUP BY doc_id, island
""",
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, reporting form (Lee et al. 2021 — the
    'deduplicating training data' result that repeated SPANS, not just
    repeated documents, drive memorization): every token position
    covered by a stride-1 8-token window whose md5 occurs at least
    twice corpus-wide is duplicated; overlapping/adjacent windows merge
    into maximal (doc_id, span_start, span_end) spans via
    gaps-and-islands. Catches cross-document copied sentences that
    passage_dedup's stride-16 blocks miss when the copy is unaligned.

    Spark-first substitute for the paper's suffix array: one map-side
    let-bound window explode, a map-side-combinable count on the window
    hash, a semi-join against the >=2-count hash set, and per-DOCUMENT
    windows for the island merge (partitioned by doc_id — bounded by
    tokens-per-doc, never corpus-global). See operators/dedup.py
    duplicate_spans for the scale analysis."""
    from covid_data_challenge_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), k=_SPAN_K)


@register(
    "strip_duplicate_spans",
    oracle=f"""
WITH toks0 AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
wins AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           md5(array_to_string(w[i:(i + {_SPAN_K - 1})], ' ')) AS h
    FROM toks0 JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - {_SPAN_K - 1}
),
duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
dup AS (
    SELECT doc_id, pos, pos + {_SPAN_K} AS e
    FROM wins WHERE h IN (SELECT h FROM duph)
),
isl AS (
    SELECT doc_id, pos, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_end
    FROM dup
),
marked AS (
    SELECT doc_id, pos, e,
           CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS ni
    FROM isl
),
numbered AS (
    SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island
    FROM marked
),
spans AS (
    SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
    FROM numbered GROUP BY doc_id, island
),
tok AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS tok
    FROM toks0 JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w)
),
covered AS (
    SELECT DISTINCT t.doc_id, t.pos
    FROM tok t JOIN spans s
      ON t.doc_id = s.doc_id AND t.pos >= s.span_start AND t.pos < s.span_end
),
kept AS (
    SELECT t.doc_id, t.pos, t.tok
    FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
    WHERE c.pos IS NULL
),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id)
SELECT k.doc_id,
       string_agg(k.tok, ' ' ORDER BY k.pos) AS clean_text,
       CAST(count(*) AS BIGINT) AS kept_tokens,
       CAST(any_value(t.n) - count(*) AS BIGINT) AS dropped_tokens
FROM kept k JOIN totals t ON k.doc_id = t.doc_id
GROUP BY k.doc_id
""",
)
def q_strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strip half of exact substring dedup: duplicated spans (see
    duplicate_spans) are removed from EVERY host — no first-occurrence
    survivor, because a globally repeated span is memorization risk in
    each document carrying it — and the remaining tokens reassemble in
    order. Per-doc output: cleaned text plus kept/dropped token counts
    (docs fully covered by duplicated spans drop out).

    Scale: the span table is merged-island small; covering positions is
    a per-document range join (bounded by tokens-per-doc); reassembly is
    the one-shuffle order-struct aggregate passage_dedup uses. Lossless
    text reconstruction when no span exists is pinned in pytest."""
    from covid_data_challenge_spark.operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(_docs(spark, sf_dir), k=_SPAN_K)


@register(
    "duplicate_spans_incremental",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
wins AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           md5(array_to_string(w[i:(i + {_SPAN_K - 1})], ' ')) AS h
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - {_SPAN_K - 1}
),
hist AS (SELECT DISTINCT h FROM wins WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, pos FROM wins WHERE doc_id % 5 = 0
          AND h IN (SELECT h FROM hist)),
tot AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
    FROM wins WHERE doc_id % 5 = 0 GROUP BY doc_id
),
dup AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows
    FROM batch GROUP BY doc_id
)
SELECT t.doc_id, t.n_windows,
       coalesce(d.dup_windows, 0) AS dup_windows,
       CAST(coalesce(d.dup_windows, 0) AS DOUBLE)
         / CAST(t.n_windows AS DOUBLE) AS dup_frac
FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id
""",
)
def q_duplicate_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring screening for incremental ingest: score each NEW-batch
    document by the fraction of its stride-1 8-token windows already
    present anywhere in the historical corpus — the per-batch form of
    exact substring dedup (a high dup_frac doc is mostly recycled text
    even when no single document matches it). Same deterministic
    batch/history partition as incremental_batch_dedup (doc_id % 5).

    Scale: history reduces once to its DISTINCT window-hash set — the
    gram index gold table, bucketed on h at 100 TB so each day's batch
    semi-joins shuffle-free against it; history is never joined with
    itself. The batch side is one window explode + one hash semi-join +
    one per-doc count."""
    from covid_data_challenge_spark.operators.dedup import sliding_window_grams

    docs = _docs(spark, sf_dir)
    wins = sliding_window_grams(docs, k=_SPAN_K)
    hist = wins.filter(F.col("doc_id") % 5 != 0).select("h").distinct()
    batch = wins.filter(F.col("doc_id") % 5 == 0)
    tot = batch.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    dup = (
        batch.join(hist, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_windows"))
    )
    return tot.join(dup, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce(F.col("dup_windows"), F.lit(0)).cast("long").alias(
            "dup_windows"
        ),
        (
            F.coalesce(F.col("dup_windows"), F.lit(0)).cast("double")
            / F.col("n_windows").cast("double")
        ).alias("dup_frac"),
    )


@register(
    "lsh_quality_report",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
),
pred AS (SELECT doc_a, doc_b FROM ({_minhash_lsh_oracle()}) mh),
hit AS (
    SELECT t.doc_a, t.doc_b FROM truth t
    JOIN pred p ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
),
ct AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
cp AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM pred),
ch AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM hit)
SELECT n_truth, n_pred, n_hit,
       CASE WHEN n_pred > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_pred AS DOUBLE) ELSE 0.0
       END AS precision,
       CASE WHEN n_truth > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) ELSE 0.0
       END AS recall
FROM ct CROSS JOIN cp CROSS JOIN ch
""",
)
def q_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure-don't-guess for the approximate dedup tier: precision and
    recall of the banded MinHash-LSH pairs (32 perms × 8 bands,
    est ≥ 0.2) against UNCAPPED exact n-gram Jaccard ≥ 0.2 as ground
    truth — the audit you run before trusting an LSH configuration on a
    real corpus, and the quantitative answer to 'what did banding
    cost'. One summary row: pair counts and both rates, all exact
    integers + single IEEE divisions, hash-checked like everything
    else.

    Scale note: the TRUTH side is the exact inverted-index self-join
    with no hot-shingle cap — the honest baseline, priced accordingly;
    at 100 TB this audit runs on a sampled slice (the LSH side alone
    remains the production path), which is why it is a separate report
    query rather than part of the dedup pipeline."""
    from covid_data_challenge_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = _docs(spark, sf_dir)
    # each pair frame feeds TWO consumers (its own count + the hit
    # semi-join) — checkpoint so the expensive uncapped-jaccard and
    # banded-LSH chains run once each (the r7 release-report discipline)
    truth = (
        jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=None)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    pred = (
        minhash_lsh_pairs(
            docs, n=3, num_perm=32, bands=8, threshold=0.2, portable=True
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    hit = truth.join(pred, ["doc_a", "doc_b"], "left_semi")
    ct = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    cp = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    ch = hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        ct.join(cp)
        .join(ch)
        .select(
            "n_truth",
            "n_pred",
            "n_hit",
            F.when(
                F.col("n_pred") > 0,
                F.col("n_hit").cast("double") / F.col("n_pred").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hit").cast("double") / F.col("n_truth").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
        )
    )


@register(
    "memorization_risk_report",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
wins AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           md5(array_to_string(w[i:(i + {_SPAN_K - 1})], ' ')) AS h
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - {_SPAN_K - 1}
),
duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
dup AS (
    SELECT doc_id, pos, pos + {_SPAN_K} AS e
    FROM wins WHERE h IN (SELECT h FROM duph)
),
isl AS (
    SELECT doc_id, pos, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_end
    FROM dup
),
marked AS (
    SELECT doc_id, pos, e,
           CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS ni
    FROM isl
),
numbered AS (
    SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island
    FROM marked
),
spans AS (
    SELECT doc_id, min(pos) AS s, max(e) AS e
    FROM numbered GROUP BY doc_id, island
),
per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(e - s) AS BIGINT) AS dup_tokens,
           CAST(max(e - s) AS BIGINT) AS max_span_tokens
    FROM spans GROUP BY doc_id
)
SELECT l.doc_id, l.n_tokens,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       coalesce(p.max_span_tokens, 0) AS max_span_tokens,
       CAST(coalesce(p.dup_tokens, 0) AS DOUBLE)
         / CAST(l.n_tokens AS DOUBLE) AS dup_frac
FROM lens l LEFT JOIN per_doc p ON l.doc_id = p.doc_id
WHERE l.n_tokens > 0
""",
)
def q_memorization_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document memorization-risk profile from the exact-substring
    surface: how many maximal duplicated spans a document carries, how
    many of its tokens they cover (dup_frac), and the LONGEST single
    duplicated run — the Lee et al. 2021 / Carlini et al. 2022 risk
    ordering, where long verbatim repeats are the spans a model is most
    likely to regurgitate. Zero-filled for clean documents so the
    report covers the whole corpus, ready for a threshold gate or as a
    recipe feature.

    Scale: rides duplicate_spans' machinery (map-side window explode,
    hash-count semi-join, doc-partitioned island merge) plus one
    doc-level aggregation and a left join against doc lengths."""
    from covid_data_challenge_spark.operators.dedup import duplicate_spans

    docs = _docs(spark, sf_dir)
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    spans = duplicate_spans(docs, k=_SPAN_K)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
        F.max("span_tokens").cast("long").alias("max_span_tokens"),
    )
    return lens.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce(F.col("max_span_tokens"), F.lit(0))
        .cast("long")
        .alias("max_span_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("dup_frac"),
    )


@register(
    "cross_source_contamination",
    oracle=f"""
WITH docs AS (SELECT source, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT source,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
common AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(n_common AS BIGINT) AS n_common,
       sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
""",
)
def q_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: 3-gram shingle overlap and
    Jaccard for every source pair — the corpus-composition audit that
    catches two "different" crawls re-scraping the same sites, or an
    eval-derived source leaking into a training source, BEFORE
    pair-level dedup runs (WIMBD reports the same cross-dataset overlap
    statistic). Scale shape: the distinct (source, shingle) table is at
    most |sources|·|distinct shingles|; the self-join is a shingle-key
    equi-join whose per-shingle fan-out is bounded by |sources|² — a
    constant — not by corpus size (contrast doc-level pair joins, which
    need the hot-shingle cap); output is at most C(|sources|,2) rows.
    Counts are exact integers; jaccard is one rounded IEEE division."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.operators.dedup import word_shingle_expr

    sh = (
        docs.select(
            "source", F.explode(word_shingle_expr(F.col("text"), 3)).alias("s")
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("source").alias("src_a"), "s")
    b = sh.select(F.col("source").alias("src_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("n_sh_b"))
    return (
        common.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_sh_a",
            "n_sh_b",
            F.round(
                F.col("n_common")
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )


@register(
    "softdedup_reweight",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
per AS (
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
    FROM assigned GROUP BY 1
),
tok AS (
    SELECT doc_id, CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT a.doc_id, a.cluster_id, p.cluster_size, t.n_tokens,
       round(1.0 / CAST(p.cluster_size AS DOUBLE), 6) AS soft_weight,
       round(CAST(t.n_tokens AS DOUBLE) / CAST(p.cluster_size AS DOUBLE), 4)
           AS effective_tokens
FROM assigned a
JOIN per p USING (cluster_id)
JOIN tok t ON a.doc_id = t.doc_id
""",
)
def q_softdedup_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (He et al. 2024, "SoftDedup: an Efficient
    Data Reweighting Method for Speeding Up Language Model
    Pretraining"): instead of DELETING near-duplicates, keep every
    document and down-weight its sampling probability by its data
    commonness — here the size of its near-dup cluster, so a document
    with k-1 near-copies trains with weight 1/k and a unique document
    keeps weight 1. The cluster keeps its full diversity (hard dedup
    picks one arbitrary survivor) while the expected number of times
    the shared content is seen per epoch stays 1 — the paper's
    argument for why soft reweighting beats hard removal at equal
    compute. ``effective_tokens`` is each document's token count under
    its weight; summed per source it is the post-reweighting mixture.

    Scale shape: reuses the shingle-banded candidate join and
    connected-components assignment (operators/components.py — the
    same frame every other cluster query shares), one cluster-count
    aggregate joined back on cluster_id, and one corpus-scan token
    count joined on doc_id; AQE broadcasts the cluster-size side when
    small. No new shuffle class beyond the dedup pass itself."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    assigned = cluster_assignments(docs, pairs).select("doc_id", "cluster_id")
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    tok = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return (
        assigned.join(sizes, "cluster_id")
        .join(tok, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "n_tokens",
            F.round(F.lit(1.0) / F.col("cluster_size").cast("double"), 6).alias(
                "soft_weight"
            ),
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("cluster_size").cast("double"),
                4,
            ).alias("effective_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8: distributed suffix array (prefix doubling) + longest repeated
# spans — the data structure Lee et al. 2021's exact-substring dedup is
# actually built on; the duplicate_spans family above finds FIXED-length
# window matches, the suffix array finds the LONGEST repeats exactly.
# ---------------------------------------------------------------------------

_SA_CAP = 64


def _sa_oracle(cap: int) -> str:
    """The bounded-comparator span oracle, parameterized by the cap so
    the 64- and 256-token registrations share one text (VERDICT r8 #8;
    for cap=64 this renders byte-identically to the r8 original)."""
    return f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents),
pos AS (
    -- suffixes CAPPED at the comparator length up front: the span
    -- query's order is by first-_SA_CAP tokens then (doc_id, off),
    -- exactly the bounded comparator the radix-4 doubling builds
    SELECT doc_id, CAST(t.o AS INT) AS off,
           ws[CAST(t.o AS INT) : CAST(least(len(ws), t.o + {cap} - 1) AS INT)] AS suf
    FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS o) t
),
sa AS (
    SELECT doc_id, off, suf,
           row_number() OVER (ORDER BY suf, doc_id, off) AS sa_pos
    FROM pos
),
adj AS (
    -- a = the EARLIER (lexicographically smaller) suffix of the pair,
    -- matching the Spark side's doc_a convention
    SELECT a.doc_id AS doc_a, a.off AS off_a, a.suf AS s1,
           b.doc_id AS doc_b, b.off AS off_b, b.suf AS s2
    FROM sa a JOIN sa b ON b.sa_pos = a.sa_pos + 1
),
lc AS (
    SELECT doc_a, off_a, doc_b, off_b, s1,
           coalesce(
             (SELECT min(u.i)
              FROM (SELECT unnest(range(1, least(len(s1), len(s2), {cap}) + 1)) AS i) u
              WHERE s1[CAST(u.i AS INT)] <> s2[CAST(u.i AS INT)]) - 1,
             least(len(s1), len(s2), {cap})
           ) AS lcp
    FROM adj
)
SELECT CAST(lcp AS INT) AS lcp,
       array_to_string(s1[1:CAST(lcp AS INT)], ' ') AS span,
       doc_a, CAST(off_a AS INT) AS off_a,
       doc_b, CAST(off_b AS INT) AS off_b
FROM lc WHERE lcp >= 2
ORDER BY lcp DESC, doc_a, off_a, doc_b, off_b
LIMIT 20
"""


@register(
    "suffix_array_repeated_spans",
    oracle=_sa_oracle(_SA_CAP),
)
def q_suffix_array_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated token spans in the corpus, EXACTLY, via a
    distributed suffix array built by prefix doubling (r8;
    operators/suffix.py — Manber & Myers 1990 as log-round DataFrame
    algebra, the structure under Lee et al. 2021's exact-substring
    dedup). Adjacent suffix-array entries carry the corpus's longest
    common prefixes, so one pass over the n−1 adjacent pairs surfaces
    every maximal repeat, within or across documents.

    Scale shape: the round count is O(log max_doc_tokens) — CONSTANT in
    corpus size, because suffixes are doc-bounded — and each round is
    two hash shuffles + one range exchange, all linear in corpus token
    positions; rank re-densification uses the range-sharded cumulative
    rank (no single-partition window anywhere); per-round rank tables
    are eagerly checkpointed (O(1) lineage). The oracle sorts the
    sliced suffix lists directly — quadratic storage DuckDB can afford
    at gate scale, which is exactly the naive construction prefix
    doubling replaces — and replays the bounded LCP fold; ties
    (identical suffixes) break by (doc_id, off) in both engines."""
    from covid_data_challenge_spark.operators.suffix import longest_repeated_spans

    return longest_repeated_spans(_docs(spark, sf_dir), top_k=20, cap=_SA_CAP)


@register(
    "suffix_array_repeated_spans_cap256",
    oracle=_sa_oracle(256),
)
def q_suffix_array_repeated_spans_cap256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 256-token-comparator suffix array (r9 — VERDICT r8 #8): at
    cap 64, repeated spans LONGER than 64 tokens tie at lcp=64 and
    break by position — exact for dedup thresholds under 64 but not
    for 'longest repeated span' reporting on boilerplate-heavy
    corpora. The radix-4 doubling already quadruples per round, so 256
    costs exactly ONE more densify round than 64 (16 → 64 → 256;
    measured delta recorded in SCALING.md) and the LCP fold bound
    rises to 256 — still doc-bounded, still O(log max_doc_tokens)
    rounds, constant in corpus size. Oracle: the same bounded-
    comparator SQL at cap 256. A pytest plants a 100-token duplicated
    span: this query reports lcp=100 exactly where the cap-64 query
    ties at 64."""
    from covid_data_challenge_spark.operators.suffix import longest_repeated_spans

    return longest_repeated_spans(_docs(spark, sf_dir), top_k=20, cap=256)


@register(
    "dedup_near_keep_best_quality",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
qual AS (SELECT doc_id, quality FROM ({_QUALITY_SQL})),
scored AS (
    SELECT a.cluster_id, a.doc_id, q.quality,
           CAST(count(*) OVER (PARTITION BY a.cluster_id) AS BIGINT)
               AS cluster_size,
           row_number() OVER (PARTITION BY a.cluster_id
                              ORDER BY q.quality DESC, a.doc_id ASC) AS rn
    FROM assigned a JOIN qual q USING (doc_id)
)
SELECT doc_id, cluster_id, cluster_size, quality
FROM scored WHERE rn = 1
""",
)
def q_dedup_near_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted near-dedup survivors (r9): same transitive
    clusters as dedup_near_keep_canonical, but the kept document is the
    cluster's HIGHEST-quality member (ties → smallest doc_id) — the
    selection rule production dedup actually wants: the canonical copy
    of a boilerplate family should be the cleanest rendition, not the
    accidentally-smallest id. One ``max_by`` over a struct ordering per
    cluster — a hash aggregation, no per-cluster window/sort. At 100 TB
    the cluster table is the CC output (already key-partitioned by
    cluster), so the argmax is a map-side combine away from free."""
    from covid_data_challenge_spark.functions.text import quality_score
    from covid_data_challenge_spark.operators.components import cluster_assignments

    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    qual = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    assigned = cluster_assignments(docs, pairs).join(qual, "doc_id")
    return assigned.groupBy("cluster_id").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
        ).alias("doc_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.max_by(
            F.col("quality"), F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
        ).alias("quality"),
    ).select("doc_id", "cluster_id", "cluster_size", "quality")
