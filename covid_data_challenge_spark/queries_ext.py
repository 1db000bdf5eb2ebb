"""Extension queries: training-data-pipeline operators over the
``documents`` / ``embeddings`` / ``events`` tables (SURVEY.md §7 step 9
"north-star extensions", graded alongside the §2 parity surface).

Same oracle discipline as queries.py — and since round 3 it covers the
entire registry: the hash/sketch/clustering operators run on portable
families (md5-nibble fingerprints, seeded affine permutations and ±1
planes, unrolled seeded-Lloyd CTEs), so every registered query — the
"approximate" tier and the multimodal mapInPandas stage included — is
hash-checked against DuckDB; pytest recall tests against the exact
operators pin the algorithmic quality on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.text import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    bpe_pretoken_count,
    fingerprint,
    lang_hits,
    normalize_text,
    pii_match_count,
    quality_score,
    redact_pii,
    token_count,
    tokens,
)
from covid_data_challenge_spark.operators.chunking import (
    chunk_tokens,
    chunking_oracle_sql,
)
from covid_data_challenge_spark.operators.sampling import (
    mixture_oracle_sql,
    mixture_sample,
    shuffle_shards,
    shuffle_shards_oracle_sql,
)
from covid_data_challenge_spark.operators.dedup import (
    bloom_decontaminate,
    containment_pairs,
    decontamination_overlap,
    dedup_exact_keep_first,
    exact_dedup_stats,
    hot_shingles,
    jaccard_pairs,
    minhash_lsh_pairs,
    passage_dedup,
    simhash,
    simhash_md5,
    simhash_md5_sql,
    simhash_neardup_pairs,
    word_shingle_expr,
)
from covid_data_challenge_spark.operators.semdedup import semdedup_prune
from covid_data_challenge_spark.operators.components import (
    cluster_assignments,
    dedup_keep_canonical,
)
from covid_data_challenge_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media_table,
)
from covid_data_challenge_spark.operators.alignment import asof_join, latest_per_key
from covid_data_challenge_spark.operators.sessions import (
    sessionize,
    sliding_agg,
    tumbling_agg,
)
from covid_data_challenge_spark.operators.packing import (
    pack_greedy,
    packing_oracle_sql,
    packing_stats,
)
from covid_data_challenge_spark.operators.splits import assign_split, split_sql_case
from covid_data_challenge_spark.operators.timeseries import gapfill_interpolate
from covid_data_challenge_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_neardup_pairs,
    cosine_neardup_pairs_lsh,
    cosine_topk,
)
from covid_data_challenge_spark.registry import register
from covid_data_challenge_spark.sources.readers import load_table

#: Normalized text in DuckDB SQL ('g' flag — DuckDB replaces first match
#: only by default, Spark replaces all).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _dd_dot(a: str, b: str) -> str:
    """DuckDB twin of functions/vector.dot (ordered double fold)."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
    )


def _dd_norm(v: str) -> str:
    """DuckDB twin of functions/vector.norm."""
    return (
        f"sqrt(list_aggregate(list_transform({v}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


def _dd_cos(a: str, b: str) -> str:
    """DuckDB twin of ivf._sim: dot/(|a||b|), 0.0 on a zero norm."""
    return (
        f"CASE WHEN {_dd_norm(a)} > 0 AND {_dd_norm(b)} > 0 "
        f"THEN {_dd_dot(a, b)} / ({_dd_norm(a)} * {_dd_norm(b)}) ELSE 0.0 END"
    )


def _dd_assign(corpus: str, centroids: str) -> str:
    """DuckDB twin of ivf.assign_to_centroids: nearest-centroid (max
    cosine, lowest-cid tiebreak) via a window argmax."""
    return f"""
SELECT id, vec, cid FROM (
    SELECT u.id, u.vec, c.cid,
           row_number() OVER (
               PARTITION BY u.id
               ORDER BY {_dd_cos('u.vec', 'c.cvec')} DESC, c.cid
           ) AS rn
    FROM {corpus} u CROSS JOIN {centroids} c
) WHERE rn = 1
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split({_NORM}, ' ')) AS INT) AS n_tokens,
       CAST(len({_NORM}) AS INT) AS n_chars_norm
FROM documents
""",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length(normalize_text(F.col("text"))).alias("n_chars_norm"),
    )


@register(
    "token_stats_bpe",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]')) AS INT)
           AS n_bpe_tokens,
       CAST(len(string_split({_NORM}, ' ')) AS INT) AS n_ws_tokens
FROM documents
""",
)
def q_token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-token counts (the LLM-cost proxy) next to whitespace
    counts; the same ASCII-safe pattern runs under Java regex and RE2."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        bpe_pretoken_count(F.col("text")).alias("n_bpe_tokens"),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


_LANG_SQL_HITS = {
    "en": r"\b(the|and|of|to|in|is|that|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|que|pour|dans)\b",
    "es": r"\b(el|la|los|que|es|para|con|una)\b",
}


@register(
    "lang_id",
    oracle=f"""
WITH h AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["en"]}')) AS h_en,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["de"]}')) AS h_de,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["fr"]}')) AS h_fr,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["es"]}')) AS h_es
    FROM documents
)
SELECT doc_id, lang,
       CAST(h_en AS INT) AS hits_en, CAST(h_de AS INT) AS hits_de,
       CAST(h_fr AS INT) AS hits_fr, CAST(h_es AS INT) AS hits_es,
       CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM h
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic; argmax with fixed tie order."""
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    h = {lang: lang_hits(t, lang) for lang in ("en", "de", "fr", "es")}
    predicted = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en")
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when(h["fr"] >= h["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        h["en"].alias("hits_en"),
        h["de"].alias("hits_de"),
        h["fr"].alias("hits_fr"),
        h["es"].alias("hits_es"),
        predicted.alias("predicted_lang"),
    )


#: DuckDB twin of functions.text.quality_score over ``documents``
#: (shared by quality_score and quality_percentile_filter).
_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, lang, text,
           len(string_split({_NORM}, ' ')) AS n_tok,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["en"]}')) AS h_en,
           (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')))
               / greatest(len(text), 1) AS punct
    FROM documents
)
SELECT doc_id, lang,
       CAST(n_tok AS INT) AS n_tokens,
       round((least(n_tok / 100.0, 1.0)
            + least(h_en / greatest(n_tok, 1) * 5.0, 1.0)
            + (1.0 - least(punct * 10.0, 1.0))) / 3.0, 4) AS quality
FROM t
"""


@register(
    "quality_score",
    oracle=f"SELECT doc_id, n_tokens, quality FROM ({_QUALITY_SQL})",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


@register(
    "quality_percentile_filter",
    oracle=f"""
SELECT doc_id, lang, quality, round(pct, 6) AS quality_pct
FROM (
  SELECT doc_id, lang, quality,
         percent_rank() OVER (PARTITION BY lang ORDER BY quality) AS pct
  FROM ({_QUALITY_SQL})
)
WHERE pct >= 0.5
""",
)
def q_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation filter: keep docs at or above the median quality within
    their language. ``percent_rank`` is rank-based, so ties resolve
    identically in any engine — the filter is deterministic without a
    tie-break column. One shuffle (window partition on lang); at 100 TB
    swap the window for a two-pass approx-quantile threshold join
    (compute per-lang cutoffs once, broadcast, filter map-side)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )
    pct = F.percent_rank().over(Window.partitionBy("lang").orderBy("quality"))
    return (
        docs.withColumn("pct", pct)
        .filter(F.col("pct") >= 0.5)  # filter pre-round, exactly like the oracle
        .select("doc_id", "lang", "quality", F.round("pct", 6).alias("quality_pct"))
    )


@register(
    "repetition_score",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
tot AS (SELECT doc_id, greatest(len(w) - 4, 0) AS n_total FROM docs),
sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 4
),
d AS (SELECT doc_id, count(*) AS n_distinct FROM sh GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_total AS INT) AS n_grams,
       round(CASE WHEN t.n_total > 0
                  THEN 1.0 - coalesce(d.n_distinct, 0) / t.n_total
                  ELSE 0.0 END, 4) AS repetition
FROM tot t LEFT JOIN d USING (doc_id)
""",
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated 5-gram share per document (boilerplate/spam signal)."""
    from covid_data_challenge_spark.functions.text import repetition_ratio

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.greatest(token_count(F.col("text")) - F.lit(4), F.lit(0)).alias("n_grams"),
        repetition_ratio(F.col("text"), n=5).alias("repetition"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


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


@register(
    "curation_pipeline",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang, text,
           len(string_split({_NORM}, ' ')) AS n_tok,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["en"]}')) AS h_en,
           (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')))
               / greatest(len(text), 1) AS punct,
           md5({_NORM}) AS f
    FROM documents
),
quality AS (
    SELECT doc_id, lang, f, CAST(n_tok AS INT) AS n_tokens,
           round((least(n_tok / 100.0, 1.0)
                + least(h_en / greatest(n_tok, 1) * 5.0, 1.0)
                + (1.0 - least(punct * 10.0, 1.0))) / 3.0, 4) AS quality
    FROM scored
),
filtered AS (SELECT * FROM quality WHERE quality >= 0.5),
keep AS (SELECT f, min(doc_id) AS doc_id FROM filtered GROUP BY f)
SELECT q.doc_id, q.lang, q.n_tokens, q.quality
FROM filtered q JOIN keep USING (doc_id)
""",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation shape: quality-score filter →
    exact dedup keep-first → curated corpus. One scan, one groupBy + one
    semi-join — the whole pipeline is two shuffles at any scale."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    return dedup_exact_keep_first(scored).select("doc_id", "lang", "n_tokens", "quality")


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


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COS_SQL = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
d AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') AS dot,
           sqrt(list_aggregate(list_transform(q.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS na,
           sqrt(list_aggregate(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nb
    FROM q, embeddings c
    WHERE q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END AS sim,
           row_number() OVER (
               PARTITION BY query_id
               ORDER BY CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END DESC,
                        neighbor_id
           ) AS rank
    FROM d
)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("ann_cosine_topk", oracle=_COS_SQL)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for a deterministic query
    subset (every 50th vector). Fold arithmetic is ordered double ops on
    both engines → bit-identical similarities."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk(emb, queries, k=5)


def _dd_lsh_buckets(vec: str, bits: int, tables: int, dim: int = 64, seed: int = 42) -> list[str]:
    """Per-table DuckDB bucket expressions embedding the SAME seeded ±1
    plane literals the engine uses (similarity._signed_planes) — the
    'random' hyperplanes are driver-side constants, so the oracle can
    replay the sign-of-projection bucketing bit-exactly."""
    from covid_data_challenge_spark.operators.similarity import _signed_planes

    planes = _signed_planes(bits * tables, dim, seed)

    def proj(plane: list[float]) -> str:
        lit = "[" + ", ".join("1.0" if w > 0 else "-1.0" for w in plane) + "]"
        return (
            f"list_aggregate(list_transform(list_zip({vec}, {lit}), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')"
        )

    return [
        "("
        + " + ".join(
            f"CASE WHEN {proj(planes[t * bits + j])} >= 0 THEN {1 << j} ELSE 0 END"
            for j in range(bits)
        )
        + ")"
        for t in range(tables)
    ]


def _dd_lsh_banded(source_sql: str, id_as: str, vec: str, bits: int, tables: int) -> str:
    """UNION-ALL banded relation (id, vec, tbl, bucket) over ``source_sql``
    (which must expose the embedding as ``{vec}``)."""
    buckets = _dd_lsh_buckets(vec, bits, tables)
    return "\nUNION ALL\n".join(
        f"SELECT vec_id AS {id_as}, {vec} AS vec, {t} AS tbl, {buckets[t]} AS bucket FROM ({source_sql})"
        for t in range(tables)
    )


def _ann_lsh_oracle(bits: int = 4, tables: int = 12, k: int = 5) -> str:
    corpus = "SELECT vec_id, embedding FROM embeddings"
    queries = "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0"
    return f"""
WITH c AS ({_dd_lsh_banded(corpus, 'neighbor_id', 'embedding', bits, tables)}),
q AS ({_dd_lsh_banded(queries, 'query_id', 'embedding', bits, tables)}),
cand AS (
    SELECT DISTINCT q.query_id, c.neighbor_id, q.vec AS qv, c.vec AS cv
    FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
    WHERE q.query_id <> c.neighbor_id
),
sims AS (
    SELECT query_id, neighbor_id, {_dd_cos('qv', 'cv')} AS sim FROM cand
)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
FROM (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM sims
) WHERE rank <= {k}
"""


@register("ann_lsh_topk", oracle=_ann_lsh_oracle())
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-k. The 'random' hyperplanes are seeded
    driver-side ±1 literals, so even this approximate path replays in a
    DuckDB oracle (the oracle embeds the identical plane constants) —
    hash-checked, not rows-only."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ann_lsh_topk(emb, queries, k=5, bits=4, tables=12)


# The synthetic embeddings have no natural near-dups (max pairwise cosine
# ≈ 0.51), so — like the null-injection queries in queries.py — the near-dup
# corpus re-adds every 25th vector under a shifted id; the operator must
# find exactly those planted pairs at threshold 0.9.
_NEARDUP_CORPUS_SQL = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
"""


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return emb.unionAll(planted)


@register(
    "embedding_neardup_pairs",
    oracle=f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
d AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') AS dot,
           sqrt(list_aggregate(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS na,
           sqrt(list_aggregate(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nb
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
),
sims AS (
    SELECT vec_a, vec_b,
           CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END AS sim
    FROM d
)
SELECT vec_a, vec_b, round(sim, 4) AS cosine_sim
FROM sims WHERE sim >= 0.9
""",
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup detection (semantic dedup tier)."""
    return cosine_neardup_pairs(_neardup_corpus(spark, sf_dir), threshold=0.9)


def _ann_ivf_oracle() -> str:
    """IVF-probed ANN unrolled as a DuckDB CTE chain: seeds → one Lloyd
    iteration → inverted lists → per-query nprobe centroid ranking →
    candidate cosine top-k. Deterministic (seeded centroids, fixed
    iterations), so 'approximate' ANN still gets an exact oracle.

    NOTE: the helper CTE names below (seeds/a1/cent) intentionally mirror
    _SEMDEDUP_SQL — same Lloyd unroll, different corpus/counts."""
    return f"""
WITH uniq AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
seeds AS (
    SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, vec AS cvec
    FROM uniq ORDER BY id LIMIT 16
),
a1 AS ({_dd_assign('uniq', 'seeds')}),
by_dim AS (
    SELECT cid, unnest(vec) AS x, generate_subscripts(vec, 1) AS pos FROM a1
),
cent AS (
    SELECT cid, list(CAST(m AS FLOAT) ORDER BY pos) AS cvec
    FROM (SELECT cid, pos, avg(CAST(x AS DOUBLE)) AS m FROM by_dim GROUP BY cid, pos)
    GROUP BY cid
),
inv AS ({_dd_assign('uniq', 'cent')}),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
probes AS (
    SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_dd_cos('q.qv', 'c.cvec')} DESC, c.cid
               ) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= 4
),
cand AS (
    SELECT p.query_id, i.id AS neighbor_id, {_dd_cos('p.qv', 'i.vec')} AS sim
    FROM probes p JOIN inv i ON p.cid = i.cid
    WHERE p.query_id <> i.id
)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
FROM (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM cand
) WHERE rank <= 5
"""


@register("ann_ivf_topk", oracle=_ann_ivf_oracle())
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN (coarse centroids + inverted lists + nprobe) — the
    second scale path next to sign-LSH. Deterministic seeded-Lloyd build
    → the whole probe unrolls into a DuckDB CTE oracle (hash-checked,
    not rows-only); recall vs brute force additionally pinned in
    pytest."""
    from covid_data_challenge_spark.operators.ivf import ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4)


def _neardup_lsh_oracle(bits: int = 8, tables: int = 6, threshold: float = 0.9) -> str:
    return f"""
WITH banded AS ({_dd_lsh_banded(_NEARDUP_CORPUS_SQL, 'id', 'embedding', bits, tables)}),
cand AS (
    SELECT DISTINCT a.id AS vec_a, b.id AS vec_b, a.vec AS va, b.vec AS vb
    FROM banded a JOIN banded b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
),
sims AS (SELECT vec_a, vec_b, {_dd_cos('va', 'vb')} AS sim FROM cand)
SELECT vec_a, vec_b, round(sim, 4) AS cosine_sim
FROM sims WHERE sim >= {threshold}
"""


@register("embedding_neardup_lsh", oracle=_neardup_lsh_oracle())
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for the same semantic dedup: LSH-bucketed candidates +
    exact cosine verify. The seeded ±1 hyperplanes are driver-side
    constants, so the oracle replays the bucketing (and therefore the
    exact candidate set) bit-exactly — hash-checked, not rows-only;
    recall vs the exact operator additionally pinned in pytest."""
    return cosine_neardup_pairs_lsh(
        _neardup_corpus(spark, sf_dir), threshold=0.9, bits=8, tables=6
    )


@register(
    "embedding_norms_by_label",
    oracle="""
SELECT label,
       round(avg(sqrt(list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS avg_norm,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM embeddings GROUP BY label
""",
)
def q_embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_data_challenge_spark.functions.vector import norm

    emb = _emb(spark, sf_dir)
    return emb.groupBy("label").agg(
        F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# Event-time windowing & sessionization
# ---------------------------------------------------------------------------


@register(
    "events_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(_events(spark, sf_dir), width="1 hour")


@register(
    "events_sliding",
    oracle="""
WITH ex AS (
    SELECT event_type, value,
           unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                   time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS window_start
    FROM events
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM ex GROUP BY 1, 2
""",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(_events(spark, sf_dir), width="1 hour", slide="30 minutes")


@register(
    "events_sessionize",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value,
       CAST(session_idx AS BIGINT) AS session_idx
FROM numbered GROUP BY user_id, session_idx
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_events(spark, sf_dir), gap_minutes=30)


# ---------------------------------------------------------------------------
# Multimodal columns — binary payloads through Arrow-batched mapInPandas.
# The corpus is synthesized deterministically (no media tables exist in the
# driver's testdata) from sha256-derived payloads, which is what lets even
# this tier carry full DuckDB oracles (see below); value-level assertions
# also live in tests/test_multimodal.py.
# ---------------------------------------------------------------------------


# The synthetic media corpus is a pure function of the id (sha256-expanded
# payloads, operators/multimodal.py:synth_media_table), and DuckDB's
# sha256() matches hashlib byte-for-byte — so even the mapInPandas feature
# stage replays in SQL: rebuild the payload HEX, do the stride byte-sums
# with hex-nibble arithmetic, and compare the rounded float32 features as
# exploded scalars. The engine-side Python round() is banker's vs the
# oracle's HALF_UP, verified midpoint-free on this corpus offline.
_MEDIA_IDS_SQL = """
    SELECT CAST(i AS BIGINT) AS media_id,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           repeat(sha256(CAST(i AS VARCHAR)), 4 + i % 5) AS hex,
           CAST(32 * (4 + i % 5) AS BIGINT) AS n_bytes
    FROM (SELECT unnest(range(96)) AS i)
"""


@register(
    "multimodal_features",
    oracle=f"""
WITH ids AS ({_MEDIA_IDS_SQL}),
bytes AS (
    SELECT media_id, t.b, n_bytes // 8 AS stride,
           16 * (strpos('0123456789abcdef', substr(hex, CAST(2 * t.b + 1 AS INT), 1)) - 1)
             + (strpos('0123456789abcdef', substr(hex, CAST(2 * t.b + 2 AS INT), 1)) - 1) AS v
    FROM ids, LATERAL (SELECT unnest(range(n_bytes)) AS b) t
),
chunks AS (
    SELECT media_id, b // stride AS j, sum(v) AS s, count(*) AS cnt
    FROM bytes GROUP BY media_id, b // stride
)
SELECT ids.media_id, ids.kind, ids.n_bytes,
       CAST(j AS INT) AS feat_idx,
       CAST(round(s / (255.0 * cnt), 6) AS FLOAT) AS feat_value
FROM chunks JOIN ids USING (media_id)
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake-decode feature extraction (mapInPandas; the
    real decoder is the documented environment stub). The synthetic
    payloads are sha256-derived, so a DuckDB oracle rebuilds them and
    replays the stride byte-sum features bit-exactly — the features
    array is exploded to scalar rows for the comparison (the operator's
    array contract is unchanged, operators/multimodal.py)."""
    media = synth_media_table(spark, n=96)
    feats = extract_features(media, decoder="fake")
    return feats.select(
        "media_id", "kind", "n_bytes", F.posexplode("features").alias("feat_idx", "feat_value")
    )


@register(
    "multimodal_frame_plan",
    oracle=f"""
WITH ids AS ({_MEDIA_IDS_SQL}),
vids AS (
    -- video duration_ms = 1000*(id+1) → n_frames = duration/1000 = id+1
    SELECT media_id, media_id + 1 AS n_frames FROM ids WHERE kind = 'video'
)
SELECT media_id, CAST(t.f AS INT) AS frame_idx, CAST(t.f * 1000 AS INT) AS sample_ts_ms
FROM vids, LATERAL (SELECT unnest(range(n_frames)) AS f) t
""",
)
def q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (explode-before-decode). The synthetic
    corpus's durations are id-derived, so the sampled timestamps replay
    exactly in DuckDB."""
    return frame_sample_plan(synth_media_table(spark, n=96), every_ms=1000)


# ---------------------------------------------------------------------------
# Structured Streaming twin of events_tumbling: same logical operator run as
# readStream → watermark → window → memory sink (Trigger.AvailableNow), and
# held to the SAME batch SQL oracle — the streaming plan must hash-match the
# batch answer on static input.
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_stream",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_events_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_tumbling_counts,
    )

    stream = read_event_stream(spark, sf_dir)
    agg = streaming_tumbling_counts(stream, width="1 hour", watermark="2 hours")
    try:
        run_to_memory_sink(agg, "events_tumbling_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_tumbling_stream_sink")


@register(
    "events_sessionize_stream",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered GROUP BY user_id, session_idx
""",
)
def q_events_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming sessionization, held to the
    batch gaps-and-islands oracle: ``session_window.start`` is the first
    event's ts and ``.end`` is last ts + gap, so subtracting the gap
    recovers the batch ``session_end`` exactly."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_sessionize,
    )

    stream = read_event_stream(spark, sf_dir)
    sessions = streaming_sessionize(stream, gap="30 minutes", watermark="2 hours")
    try:
        run_to_memory_sink(sessions, "events_sessionize_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_sessionize_stream_sink").select(
        "user_id",
        "session_start",
        (F.col("session_end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        "n_events",
        "total_value",
    )


@register(
    "distinct_users_sketch",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
FROM events GROUP BY event_type
""",
)
def q_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users via mergeable HLL sketches (sparse-mode
    exact at test cardinality → hash-checkable; mergeable and ~1% at
    100 TB where countDistinct would need the raw keys at every grain)."""
    from covid_data_challenge_spark.operators.sketch import distinct_sketches

    ev = _events(spark, sf_dir)
    return distinct_sketches(ev, "event_type", "user_id").select(
        "event_type", "approx_distinct"
    )


@register(
    "price_quantiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (A5 extended) — Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit; at
    100 TB switch to ``approx_percentile`` (t-digest) and accept ε."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "events_asof_join",
    oracle="""
WITH purchases AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ) WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.ts AS ts_click, c.value AS value_click
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase ← the user's latest click at-or-before
    it), verified against DuckDB's NATIVE ASOF JOIN. Spark formulation is
    the union+window trick in alignment.asof_join — one shuffle, never a
    per-key nested loop."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = latest_per_key(
        ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id", "value"),
        ["user_id", "ts"],
        "event_id",
    ).select("user_id", "ts", "value")
    return asof_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], suffix="_click",
    )


@register(
    "events_range_join",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
),
sessions AS (
    SELECT user_id AS s_user, min(ts) AS session_start, max(ts) AS session_end
    FROM numbered WHERE user_id < 20 GROUP BY user_id, session_idx
),
purch AS (SELECT ts FROM events WHERE event_type = 'purchase' AND user_id >= 20)
SELECT s_user, session_start, session_end, CAST(count(*) AS BIGINT) AS n_copurchases
FROM sessions s JOIN purch p ON p.ts BETWEEN s.session_start AND s.session_end
GROUP BY 1, 2, 3
""",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unkeyed interval × point range join (sessions of users 0–19 vs
    other users' purchases) via time-bin bucketing — an equi-join on the
    bin id plus an exact between-filter, never a nested loop."""
    from covid_data_challenge_spark.operators.joins import range_join_binned

    ev = _events(spark, sf_dir)
    sessions = (
        sessionize(ev, gap_minutes=30)
        .filter(F.col("user_id") < 20)
        .select(
            F.col("user_id").alias("s_user"), "session_start", "session_end"
        )
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") >= 20)
    ).select("ts")
    joined = range_join_binned(
        sessions, purchases, "session_start", "session_end", "ts", bin_seconds=1800
    )
    return joined.groupBy("s_user", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_copurchases")
    )


@register(
    "events_rollup",
    oracle="""
SELECT event_type,
       CAST(date_part('hour', ts) AS INT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY ROLLUP (event_type, date_part('hour', ts))
""",
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (type × hour → type → grand total) in one
    pass — Spark expands the rollup into a single partial-agg plan, no
    re-scan per level."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .rollup("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot",
    oracle=f"""
SELECT user_id,
       {", ".join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
""",
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type counts via pivot with an EXPLICIT value
    list — at scale never let pivot infer values (that's an extra
    distinct pass over the fact table)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0, list(_EVENT_TYPES))
    )


@register(
    "user_running_totals_stream",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
)
def q_user_running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals after the stream drains must equal the batch aggregation."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
    )
    from covid_data_challenge_spark.streaming.stateful import running_user_totals

    stream = read_event_stream(spark, sf_dir)
    try:
        run_to_memory_sink(
            running_user_totals(stream), "user_running_totals_sink", mode="update"
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("user_running_totals_sink").select(
        "user_id",
        "n_events",
        F.round(F.col("total_value"), 2).alias("total_value"),
        "max_value",
    )


@register(
    "user_activity",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
       round(sum(value), 2) AS total_value,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases
FROM events GROUP BY user_id
""",
)
def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components) + deterministic splits
# ---------------------------------------------------------------------------

#: Shared CTE block recomputing the n-gram Jaccard near-dup edge list in
#: DuckDB (same semantics as `ngram_jaccard_pairs`), for the clustering
#: oracles below.
_JACCARD_EDGE_CTES = f"""
docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
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
edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL SELECT doc_b, doc_a FROM pairs
),
walk(id, comp) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id
),
assigned AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id)
"""


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


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@register(
    "train_val_test_split",
    oracle=f"""
SELECT doc_id, {split_sql_case("doc_id", _SPLITS)} AS split FROM documents
""",
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic i.i.d. 80/10/10 split keyed on doc_id: a pure
    md5-of-key expression — no shuffle, no rand(), stable for existing
    rows as the corpus grows. Bit-exact vs the DuckDB oracle because md5
    is engine-portable (Spark hash/xxhash64 are not)."""
    return assign_split(_docs(spark, sf_dir).select("doc_id"), "doc_id", _SPLITS)


@register(
    "split_by_group",
    oracle=f"""
SELECT doc_id, source, {split_sql_case("source", _SPLITS)} AS split FROM documents
""",
)
def q_split_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: keyed on the doc's source so every doc of a
    group lands in the same split (near-dups within a source can never
    straddle train/test)."""
    return assign_split(
        _docs(spark, sf_dir).select("doc_id", "source"), "source", _SPLITS
    )


# ---------------------------------------------------------------------------
# Sequence packing (token-budget bins for training batches)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per packed sequence


@register(
    "sequence_packing",
    oracle=packing_oracle_sql(_PACK_BUDGET, _NORM),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget packing of the corpus into (shard, bin) packs:
    md5-sharded streams, doc_id-ordered greedy fill (operators/packing.py).
    The walk is a prefix sum *with reset* — not window-expressible — so
    each shard packs in one Arrow-batched ``applyInPandas`` after a single
    shuffle on the shard key. Pinned bit-for-bit by a DuckDB recursive-CTE
    replay of the same spec."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_greedy(docs, "doc_id", "n_tokens", budget=_PACK_BUDGET)


@register(
    "packing_stats",
    oracle=packing_oracle_sql(_PACK_BUDGET, _NORM, stats=True),
)
def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin packing utilization (docs, tokens, fraction of budget) —
    what a batch loader reads to size epochs and audit padding waste."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_greedy(docs, "doc_id", "n_tokens", budget=_PACK_BUDGET)
    return packing_stats(packed, "n_tokens", budget=_PACK_BUDGET)


@register(
    "vocab_topk",
    oracle=f"""
SELECT token,
       CAST(count(*) AS BIGINT) AS freq,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token
LIMIT 50
""",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency top-k — the tokenizer-vocabulary building
    step of a training pipeline. explode → two-level agg; stopword skew
    is absorbed by map-side partial aggregation, and the ordered take is
    a TakeOrderedAndProject (no full sort shuffle). Tie-break on token
    makes the top-k set deterministic for the oracle compare."""
    from covid_data_challenge_spark.functions.text import tokens as _tokens

    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("freq").desc(), "token")
        .limit(50)
    )


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


# ---------------------------------------------------------------------------
# Document chunking (context-window preparation)
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48  # 16-token overlap between windows


@register(
    "doc_chunks",
    oracle=chunking_oracle_sql(_NORM, _CHUNK_SIZE, _CHUNK_STRIDE),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each doc's whitespace-token stream into 64-token windows with
    a 48-token stride (16 overlapping). Map-side explode of pure column
    exprs — no shuffle, no UDF; chunking 100 TB runs at scan speed
    (operators/chunking.py)."""
    docs = _docs(spark, sf_dir)
    return chunk_tokens(
        docs.select("doc_id", tokens(F.col("text")).alias("t")),
        F.col("t"),
        ["doc_id"],
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )


# ---------------------------------------------------------------------------
# Data-mixture sampling (per-source epoch weights)
# ---------------------------------------------------------------------------

#: Mixture recipe: src0-3 upsampled 2.5 epochs, src4-9 kept whole,
#: the long tail downsampled to 40 %.
_MIX_WEIGHTS = {
    **{f"src{i}": 2.5 for i in range(4)},
    **{f"src{i}": 1.0 for i in range(4, 10)},
    **{f"src{i}": 0.4 for i in range(10, 20)},
}
_MIX_SALT = "mix-v1"


@register(
    "mixture_sample",
    oracle=mixture_oracle_sql("doc_id", "source", _MIX_WEIGHTS, _MIX_SALT),
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: floor(weight) whole epochs per doc
    plus one fractional-epoch copy decided by an md5 coin keyed on
    doc_id. CASE-WHEN recipe + map-side explode — no join, no shuffle,
    stable under reruns and repartitioning (operators/sampling.py)."""
    return mixture_sample(
        _docs(spark, sf_dir).select("doc_id", "source"),
        "doc_id",
        "source",
        _MIX_WEIGHTS,
        _MIX_SALT,
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: The synthetic corpus has no PII, so both engines append the same
#: deterministic contact line before redacting — the redactor then has
#: real spans to find, and the oracle still checks end-to-end equality.


@register(
    "pii_redaction",
    oracle=f"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}'))
          + len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS INT) AS n_pii,
       regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM pii
""",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails/phones to typed placeholders with an audit count.
    Pure regexp_replace chain (JVM codegen, no UDF) over engine-portable
    RE2-safe patterns (functions/text.py:redact_pii)."""
    docs = _docs(spark, sf_dir)
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return with_pii.select(
        "doc_id",
        pii_match_count(F.col("t")).alias("n_pii"),
        redact_pii(F.col("t")).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Cube aggregation + ntile bucketing
# ---------------------------------------------------------------------------


@register(
    "events_cube",
    oracle="""
SELECT event_type,
       CAST(date_part('hour', ts) AS INT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE (event_type, date_part('hour', ts))
""",
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-dimension subtotals (type × hour, type, hour, grand
    total) in ONE pass — Spark expands the cube inside a single
    partial-agg plan; the reference would need four scans."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .cube("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "quality_ntile",
    oracle=f"""
SELECT doc_id, lang, quality,
       CAST(ntile(10) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS INT) AS decile
FROM ({_QUALITY_SQL})
""",
)
def q_quality_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality deciles for stratified curation. doc_id
    tie-break makes ntile's row assignment a total order, so any engine
    agrees bucket-for-bucket. One window shuffle on lang."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        quality_score(F.col("text")).alias("quality"),
    ).withColumn("decile", F.ntile(10).over(w))


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle (shard-then-sort)
# ---------------------------------------------------------------------------

_SHUFFLE_SHARDS, _SHUFFLE_SALT = 8, "shuf-v1"


@register(
    "corpus_shuffle",
    oracle=shuffle_shards_oracle_sql("doc_id", _SHUFFLE_SHARDS, _SHUFFLE_SALT),
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle as shard-then-sort: md5
    hash-range shards + per-shard rank. One hash shuffle, parallel
    windows — never a single-partition global row_number
    (operators/sampling.py:shuffle_shards)."""
    return shuffle_shards(
        _docs(spark, sf_dir).select("doc_id"), "doc_id", _SHUFFLE_SHARDS, _SHUFFLE_SALT
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
WHERE rn <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf·idf. The document
    frequency table is vocabulary-sized — smaller than the corpus but
    unbounded (it grows with the corpus per Heaps' law), so it carries
    NO broadcast hint: AQE broadcasts it while it fits the threshold and
    falls back to a term-keyed shuffle join when it doesn't. Only the
    1-row corpus count is hint-broadcast. One window per doc for the
    top-k."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tbl, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# ---------------------------------------------------------------------------
# Trailing z-score anomaly detection on the event stream
# ---------------------------------------------------------------------------

_Z_LOOKBACK, _Z_MIN_POINTS = 20, 5


@register(
    "events_anomaly_zscore",
    oracle=f"""
WITH w AS (
  SELECT event_id, user_id, value,
         avg(value)  OVER trail AS mu,
         stddev_samp(value) OVER trail AS sigma,
         count(*) OVER trail AS n_prev
  FROM events
  WINDOW trail AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       CASE WHEN n_prev >= {_Z_MIN_POINTS} AND sigma > 0
            THEN round((value - mu) / sigma, 4) END AS zscore,
       coalesce(n_prev >= {_Z_MIN_POINTS} AND sigma > 0
                AND abs((value - mu) / sigma) > 3, false) AS is_anomaly
FROM w
""",
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing z-score over the previous 20 events (current row
    excluded, ≥5 points required): the streaming-adjacent anomaly flag a
    monitoring pipeline computes. One shuffle on user_id; the frame is
    row-bounded so state is O(lookback) per key — the same op ports to
    applyInPandasWithState for the live stream."""
    ev = _events(spark, sf_dir)
    trail = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    mu, sigma = F.avg("value").over(trail), F.stddev_samp("value").over(trail)
    n_prev = F.count(F.lit(1)).over(trail)
    ok = (n_prev >= _Z_MIN_POINTS) & (sigma > 0)
    z = (F.col("value") - mu) / sigma
    return ev.select(
        "event_id",
        "user_id",
        F.when(ok, F.round(z, 4)).alias("zscore"),
        F.coalesce(ok & (F.abs(z) > 3), F.lit(False)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling + per-group winsorization
# ---------------------------------------------------------------------------

_STRAT_K, _STRAT_SALT = 20, "strat-v1"


@register(
    "stratified_sample",
    oracle=f"""
SELECT doc_id, lang, CAST(rn AS INT) AS sample_rank
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_STRAT_SALT}'), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {_STRAT_K}
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-class sample (the distributed reservoir): rank each
    class's rows by a deterministic md5 draw and keep the first k. One
    shuffle on the class key; WindowGroupLimit keeps only k rows per
    class on the map side, so the shuffle moves O(k·classes) rows —
    unlike rand()-based sampleBy, the pick is reproducible anywhere."""
    docs = _docs(spark, sf_dir)
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_STRAT_SALT)))
    w = Window.partitionBy("lang").orderBy(draw, "doc_id")
    return (
        docs.select("doc_id", "lang")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _STRAT_K)
    )


@register(
    "group_winsorize",
    oracle="""
WITH cuts AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS p05,
         quantile_cont(l_extendedprice, 0.95) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       l.l_extendedprice,
       round(least(greatest(l.l_extendedprice, c.p05), c.p95), 2) AS price_winsorized
FROM lineitem l JOIN cuts c USING (l_returnflag)
""",
)
def q_group_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier clipping for numeric features: clamp each row's price into
    its group's [p05, p95]. Two-pass shape that scales: the per-group
    cut table is groups-sized → broadcast, so the fact table is clipped
    map-side with NO shuffle of the data itself (a window-based
    percentile would shuffle all 100 TB). Exact percentiles at test SF;
    approx_percentile is the drop-in at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    cuts = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    clipped = F.round(
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")), 2
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .join(F.broadcast(cuts), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_extendedprice",
            clipped.alias("price_winsorized"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 history + funnel analysis (CDC / product-analytics staples)
# ---------------------------------------------------------------------------


@register(
    "scd2_history",
    oracle="""
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM events
""",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) versioning: each per-user event
    becomes a [valid_from, valid_to) row, closed by the next change via
    lead(). One shuffle on the entity key; the open row (valid_to NULL)
    is the current state — the standard CDC modeling the reference's
    'latest snapshot only' pipeline cannot express."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       c.t_click IS NOT NULL AS reached_click,
       p.t_purchase IS NOT NULL AS reached_purchase
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each stage is the earliest
    qualifying event strictly after the previous stage. The per-user
    stage tables are one row per user (≪ events) but UNBOUNDED — at
    100 TB of events they are billions of rows — so no join carries a
    broadcast hint: AQE broadcasts a stage table while it fits and
    degrades to shuffle joins when it doesn't, and since every join
    keys on user_id one partitioning serves all three stages."""
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention, gap-fill interpolation, JSON props, ranked top-k,
# similarity join, inverted index
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS INT) AS week_offset,
       count(DISTINCT a.user_id) AS active_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (the product-analytics staple the
    reference's snapshot model cannot express): users are bucketed by the
    week of their first event; each later active week increments that
    cohort's ``week_offset`` cell.

    Scale shape: NO join at all. Because ``date_trunc('week')`` is
    monotone, the cohort week equals ``min(act_week)`` per user, so a
    window-min over the distinct (user, week) activity set tags every
    activity row with its cohort in the same shuffle family. The event
    stream collapses to distinct (user, week) pairs first (map-side
    partial dedup), so per-user state is bounded by weeks-active —
    never broadcast, never a driver-size risk at 100 TB of events."""
    ev = _events(spark, sf_dir)
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("act_week")
    ).distinct()
    tagged = activity.withColumn(
        "cohort_week", F.min("act_week").over(Window.partitionBy("user_id"))
    )
    offset = (F.datediff("act_week", "cohort_week") / 7).cast("int")
    return (
        tagged.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "events_gapfill_interpolate",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 6) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
),
scaffold AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
joined AS (
  SELECT s.user_id, s.day, d.v
  FROM scaffold s LEFT JOIN daily d USING (user_id, day)
),
filled AS (
  SELECT *,
    last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_prev AS prev_day,
    first_value(v IGNORE NULLS) OVER w_next AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_next AS next_day
  FROM joined
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE prev_v + (next_v - prev_v)
                       * date_diff('day', prev_day, day)
                       / date_diff('day', prev_day, next_day)
             END, 4) AS value_filled,
       v IS NULL AS interpolated
FROM filled
""",
)
def q_events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + linear interpolation: scaffold every day in
    each user's [min(day), max(day)] span via ``sequence``+``explode``
    (map-side, no shuffle), left-join the observed daily totals, then
    interpolate missing days between the bracketing observations with
    two one-pass window frames (last/first ``ignorenulls``). Boundary
    days are observed by construction, so interpolation is always
    bracketed. Two exchanges total (verified): the daily pre-aggregation
    shuffles on (user_id, day), and ONE user_id exchange is shared by
    the scaffold join and both window frames; scaffold size is
    O(keys × span-days), independent of event volume."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return gapfill_interpolate(daily, key="user_id", day="day", val="v", round_to=4)


@register(
    "json_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       round(avg(k), 4) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(CASE WHEN k >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
GROUP BY event_type
""",
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: extract a field from the JSON
    ``props`` column (``get_json_object``, JVM-side — no Python in the
    loop) and aggregate per event type. At 100 TB the extraction is a
    map-side scan op; pre-parsing hot fields into real columns at ingest
    (schema-on-write) is the noted scale upgrade, but schema-on-read
    must work for exploration."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") >= 90, 1).otherwise(0)).alias("n_hot"),
        )
    )


@register(
    "grouped_topk_ties",
    oracle="""
WITH oc AS (
  SELECT c.c_nationkey, c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_nationkey, c_custkey, n_orders,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, dense_rank() OVER (
      PARTITION BY c_nationkey ORDER BY n_orders DESC) AS rnk
  FROM oc
)
WHERE rnk <= 3
""",
)
def q_grouped_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-preserving grouped top-k: ``dense_rank`` keeps every customer
    whose order count ties into the top 3 ranks of their nation — the
    semantics ``row_number`` silently breaks on ties. The rank result is
    deterministic under ties (equal key → equal rank), so the output set
    is stable across engines and partitionings. One shuffle for the
    count, one on the small per-customer aggregate for the window."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    oc = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("n_orders").desc())
    return (
        oc.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "n_orders", "rnk")
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
    "inverted_index",
    oracle=f"""
WITH td AS (
  SELECT DISTINCT term, doc_id
  FROM (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
    FROM documents
  )
  WHERE term <> ''
)
SELECT term,
       count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM td
GROUP BY term
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an inverted index (term → sorted posting list) for corpus
    search: explode tokens map-side, dedupe (term, doc_id), aggregate
    per term. One shuffle on the term key; posting lists are built with
    ``collect_set`` + ``sort_array`` so the result is order-independent
    and engine-portable. At 100 TB, postings for stop-word-grade terms
    are the skew risk — the scale path shards hot terms by doc-id range
    (salted term key) and stores postings as arrays in partitioned
    parquet rather than a single row per term."""
    docs = _docs(spark, sf_dir)
    td = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    postings = F.array_join(
        F.transform(
            F.sort_array(F.collect_set("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), postings.alias("postings")
    )


# ---------------------------------------------------------------------------
# Attribution, robust stats, vector centroids, grouping sets,
# stream-stream join
# ---------------------------------------------------------------------------


@register(
    "attribution_last_touch",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type, value,
    last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END
               IGNORE NULLS) OVER trail AS touch_event_id,
    last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
               IGNORE NULLS) OVER trail AS touch_type,
    last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END
               IGNORE NULLS) OVER trail AS touch_ts
  FROM events
  WINDOW trail AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       round(value, 2) AS purchase_value,
       touch_event_id, touch_type, touch_ts
FROM flagged WHERE event_type = 'purchase'
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the most
    recent preceding view/click by the same user — an as-of lookup
    expressed as ONE pass over the unified event stream (trailing
    ignorenulls window), not a self-join. One shuffle on user_id; state
    per key is a single carried touch row, so the same plan runs as an
    ``applyInPandasWithState`` streaming op. Purchases with no prior
    touch keep NULL (unattributed)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    touch = lambda c: F.last(F.when(is_touch, F.col(c)), ignorenulls=True).over(w)  # noqa: E731
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "value",
            touch("event_id").alias("touch_event_id"),
            touch("event_type").alias("touch_type"),
            touch("ts").alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
            "touch_event_id",
            "touch_type",
            "touch_ts",
        )
    )


@register(
    "label_centroids",
    oracle="""
SELECT label, CAST(i - 1 AS INT) AS dim,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
       count(*) AS n_vectors
FROM embeddings,
     LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
GROUP BY 1, 2
""",
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids in long format (label, dim, value) —
    the building block of IVF coarse quantizers and class-prototype
    classifiers. ``posexplode`` streams (vector → dim rows) map-side;
    one shuffle on the (label, dim) key with map-side partial averages.
    Long format keeps the oracle engine-portable (no array hashing) and
    at 100 TB lets dims of one label aggregate in parallel rather than
    funneling each label through one reducer."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


_MAD_K = 1.4826  # consistency constant: MAD × k estimates σ under normality


@register(
    "group_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad,
         any_value(m.med) AS med
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.user_id, e.event_type, e.value,
       round((e.value - s.med) / ({_MAD_K} * s.mad), 4) AS robust_z
FROM events e JOIN mad s USING (event_type)
WHERE abs(e.value - s.med) > 3 * {_MAD_K} * s.mad
""",
)
def q_group_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation
    (median/MAD resist the very outliers that corrupt mean/stddev — the
    right screen for heavy-tailed event values). Two broadcast passes:
    the per-group median table, then the per-group MAD table; the fact
    scan is filtered map-side with NO data shuffle. Exact ``percentile``
    at test SF; ``approx_percentile`` is the one-line switch at 100 TB."""
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    dev = F.col("value") - F.col("med")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(dev) > 3 * _MAD_K * F.col("mad"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.round(dev / (_MAD_K * F.col("mad")), 4).alias("robust_z"),
        )
    )


@register(
    "events_grouping_sets",
    oracle="""
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(CAST(ts AS DATE)) AS INT) AS g_day,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), (CAST(ts AS DATE)), ())
""",
)
def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup) with
    ``grouping()`` null-vs-subtotal disambiguation flags. Spark plans one
    Expand over the scan — a single pass emits all four granularities
    with map-side partial aggregation, vs four separate scans of 100 TB.
    Expressed through the SQL facade (the DataFrame API exposes only
    cube/rollup)."""
    from covid_data_challenge_spark.sources.readers import register_views

    register_views(spark, sf_dir, names=("events",))
    return spark.sql(
        """
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(grouping(event_type) AS INT) AS g_type,
               CAST(grouping(CAST(ts AS DATE)) AS INT) AS g_day,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY GROUPING SETS
            ((event_type, CAST(ts AS DATE)), (event_type), (CAST(ts AS DATE)), ())
        """
    )


@register(
    "clicks_purchases_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts,
       round(p.value, 2) AS purchase_value
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
""",
)
def q_clicks_purchases_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (the Structured Streaming flagship
    the batch suite can't show): purchases pair with same-user clicks in
    the trailing hour. The event-time bound + watermarks let Spark evict
    buffered rows once the watermark passes — bounded state on an
    unbounded stream. Held to the batch inequality-join oracle over the
    same data."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_click_purchase_join,
    )

    stream = read_event_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    joined = streaming_click_purchase_join(clicks, purchases)
    try:
        run_to_memory_sink(joined, "clicks_purchases_stream_join_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("clicks_purchases_stream_join_sink")


# ---------------------------------------------------------------------------
# Rolling engagement, sequence mining, term co-occurrence, distribution ranks
# ---------------------------------------------------------------------------


@register(
    "rolling_daily_active",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT max(day) AS max_day FROM ud),
contrib AS (
  SELECT user_id, CAST(i AS INT) AS i, day + CAST(i AS INT) AS day
  FROM ud, LATERAL (SELECT unnest(generate_series(0, 6)) AS i) t
)
SELECT day,
       count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS dau,
       count(DISTINCT user_id) AS wau,
       round(CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS DOUBLE)
             / count(DISTINCT user_id), 4) AS stickiness
FROM contrib
WHERE day <= (SELECT max_day FROM mx)
GROUP BY day
""",
)
def q_rolling_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (DAU/WAU stickiness) via
    CONTRIBUTION EXPLODE: each (user, day) fans out to the 7 window days
    it supports (map-side ×7), then ONE aggregation computes both
    measures — WAU as the distinct users per window day, DAU as the
    conditional distinct over the offset-0 contributions — instead of a
    day×events inequality join plus a DAU/WAU join. The (user, day)
    pre-distinct collapses the stream first, so the explode factor
    applies to active-user-days, not raw events. At 100 TB the exact
    distincts swap to approx_count_distinct or the mergeable HLL sketch
    table (see distinct_users_sketch)."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", "i", F.expr("date_add(day, i)").alias("day"))
    dau = F.countDistinct(F.when(F.col("i") == 0, F.col("user_id")))
    wau = F.countDistinct("user_id")
    return (
        contrib.join(F.broadcast(mx))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day")
        .agg(
            dau.alias("dau"),
            wau.alias("wau"),
            F.round(dau.cast("double") / wau, 4).alias("stickiness"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH nxt AS (
  SELECT event_type, lead(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n_transitions,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type), 4)
           AS p_transition
FROM nxt WHERE next_type IS NOT NULL
GROUP BY 1, 2
""",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``lead`` pairs each event with its successor (one shuffle
    on user_id), then a (from, to) count and a row-normalized probability
    via a window over the 5×5 aggregate — the sequence-mining primitive
    behind session-flow and churn analysis. The matrix is |types|² rows
    regardless of data volume, so the normalizing window is free."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = (
        nxt.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / total, 4).alias("p_transition"),
    )


@register(
    "term_cooccurrence_pmi",
    oracle=f"""
WITH td AS (
  SELECT DISTINCT doc_id, term
  FROM (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
    FROM documents
  )
  WHERE term <> ''
),
df AS (SELECT term, count(*) AS c FROM td GROUP BY term),
n AS (SELECT count(*) AS nd FROM documents),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_docs_both
  FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT p.term_a, p.term_b, p.n_docs_both,
       round(ln(CAST(p.n_docs_both AS DOUBLE) * n.nd / (da.c * db.c)), 4) AS pmi
FROM pairs p
JOIN df da ON da.term = p.term_a
JOIN df db ON db.term = p.term_b
CROSS JOIN n
WHERE p.n_docs_both >= 2
""",
)
def q_term_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over within-document term pairs —
    the collocation / topic-affinity signal. The (doc, term) set is
    deduped first; pairs come from a doc-keyed self-join (per-doc
    quadratic, bounded by per-doc distinct terms). The document-
    frequency sides are vocabulary-sized — unbounded — so they carry no
    broadcast hint (AQE decides; the joins key on term either way). At
    100 TB the standard guards apply: cap per-doc distinct terms and
    drop stop-word-grade terms (df cap) BEFORE the pair join — both are
    map-side filters here."""
    docs = _docs(spark, sf_dir)
    td = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    df_tbl = td.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    a, b = td.alias("a"), td.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_docs_both"))
        .filter(F.col("n_docs_both") >= 2)
    )
    da = df_tbl.select(F.col("term").alias("term_a"), F.col("c").alias("c_a"))
    db = df_tbl.select(F.col("term").alias("term_b"), F.col("c").alias("c_b"))
    pmi = F.log(
        F.col("n_docs_both").cast("double") * F.col("nd") / (F.col("c_a") * F.col("c_b"))
    )
    return (
        pairs.join(da, "term_a")
        .join(db, "term_b")
        .join(F.broadcast(n))
        .select("term_a", "term_b", "n_docs_both", F.round(pmi, 4).alias("pmi"))
    )


@register(
    "value_cume_dist",
    oracle="""
SELECT event_id, event_type, value,
       round(percent_rank() OVER dist, 6) AS pct_rank,
       round(cume_dist() OVER dist, 6) AS cum_dist
FROM events
WINDOW dist AS (PARTITION BY event_type ORDER BY value)
""",
)
def q_value_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution position of every event's value within its type:
    ``percent_rank`` (rank-based) and ``cume_dist`` (≤-share) — the
    rank-normalization primitives for score calibration. Both are
    deterministic under ties (equal value → equal rank), so the result
    is engine-portable with no tie-break column. One shuffle on the
    type key; at 100 TB swap to the broadcast-quantile-cuts shape
    (group_winsorize) when per-row exact ranks aren't required."""
    ev = _events(spark, sf_dir)
    dist = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percent_rank().over(dist), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(dist), 6).alias("cum_dist"),
    )


# ---------------------------------------------------------------------------
# Event-time range frames, calendar heatmap, snapshot diff
# ---------------------------------------------------------------------------


@register(
    "events_trailing_1h_sum",
    oracle="""
SELECT event_id, user_id, ts,
       round(sum(value) OVER trail, 4) AS trailing_1h_value,
       CAST(count(*) OVER trail AS BIGINT) AS trailing_1h_events
FROM events
WINDOW trail AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def q_events_trailing_1h_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing ONE-HOUR (event-time, not row-count) aggregate per user:
    a RANGE frame over epoch-microseconds — the load/velocity feature
    behind rate limiting and fraud scoring. Range frames bound work by
    time span, so bursty keys don't blow up row-frame assumptions. One
    shuffle on user_id; ties in ts are peer rows in both engines, so the
    result is deterministic without a tie-break column."""
    ev = _events(spark, sf_dir)
    trail = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(trail), 4).alias("trailing_1h_value"),
        F.count(F.lit(1)).over(trail).alias("trailing_1h_events"),
    )


@register(
    "activity_heatmap",
    oracle="""
SELECT CAST(isodow(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hr,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (ISO weekday, Monday=1)
    — the calendar-seasonality profile. Pure map-side date-part
    extraction into a ≤168-cell aggregate with map-side partials; the
    shuffle moves one row per cell per task regardless of data volume."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_DIFF_CUTOFF = "2024-01-20 00:00:00"


@register(
    "snapshot_diff",
    oracle=f"""
WITH old_ranked AS (
  SELECT user_id, value, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '{_DIFF_CUTOFF}'
),
new_ranked AS (
  SELECT user_id, value, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
old AS (SELECT user_id, value AS old_value FROM old_ranked WHERE rn = 1),
new AS (SELECT user_id, value AS new_value FROM new_ranked WHERE rn = 1)
SELECT n.user_id, o.old_value, n.new_value,
       CASE WHEN o.user_id IS NULL THEN 'added' ELSE 'changed' END AS change_type
FROM new n LEFT JOIN old o USING (user_id)
WHERE o.user_id IS NULL OR o.old_value <> n.new_value
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC diff: latest per-user state as of a
    cutoff vs now, classified added/changed (drop unchanged). Both
    snapshots are WindowGroupLimit argmax passes over the SAME user_id
    partitioning, and the diff join is keyed on user_id too — one
    logical partitioning serves all three stages, so at 100 TB the
    whole diff is a single shuffle plus map-side compares. This is the
    incremental-refresh primitive the reference recomputes from scratch."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snap(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("value").alias(alias))
        )

    old = snap(ev.filter(F.col("ts") < F.lit(_DIFF_CUTOFF).cast("timestamp")), "old_value")
    new = snap(ev, "new_value")
    return (
        new.join(old, "user_id", "left")
        .filter(
            F.col("old_value").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "user_id",
            "old_value",
            "new_value",
            F.when(F.col("old_value").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
        )
    )


@register(
    "bigram_topk",
    oracle=f"""
WITH toks AS (SELECT string_split({_NORM}, ' ') AS t FROM documents),
big AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
)
SELECT bigram, count(*) AS n
FROM big GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 50
""",
)
def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (the n-gram language-model statistic, n=2):
    adjacent token pairs come from zipping the token array with its own
    tail — a pure map-side array op, no self-join, no shuffle until the
    bigram aggregation. Top-k is fully tie-broken (count desc, bigram)
    so the result set is deterministic. At 100 TB the long tail is the
    cost: count-min / frequency caps or a min-support HAVING filter
    bound the aggregation state before the final TakeOrdered."""
    docs = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Regression aggregates and per-user set profiles
# ---------------------------------------------------------------------------


@register(
    "user_value_trend_slope",
    oracle="""
SELECT user_id, count(*) AS n_events,
       round(regr_slope(value, d), 5) AS slope,
       round(regr_intercept(value, d), 5) AS intercept,
       round(regr_r2(value, d), 5) AS r2
FROM (
  SELECT user_id, value,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000.0 AS d
  FROM events
)
GROUP BY user_id HAVING count(*) >= 3
""",
)
def q_user_value_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordinary-least-squares trend of event value over time
    using the SQL-standard regression aggregates (``regr_slope`` /
    ``regr_intercept`` / ``regr_r2``) — one-pass, mergeable partial
    state, so the 100 TB plan is a plain map-side-combined groupBy, not
    a per-key fit loop. Time is centered to days-since-2024-01-01
    before fitting: regression moments on raw epoch microseconds would
    cancel catastrophically in ANY engine."""
    ev = _events(spark, sf_dir)
    d = (
        F.unix_micros("ts") - F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    ) / 86_400_000_000.0
    return (
        ev.select("user_id", "value", d.alias("d"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.regr_slope("value", "d"), 5).alias("slope"),
            F.round(F.regr_intercept("value", "d"), 5).alias("intercept"),
            F.round(F.regr_r2("value", "d"), 5).alias("r2"),
        )
        .filter(F.col("n_events") >= 3)
    )


@register(
    "user_type_profiles",
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_set,
       CAST(count(DISTINCT event_type) AS INT) AS n_types,
       bool_or(event_type = 'purchase') AS has_purchase
FROM events GROUP BY user_id
""",
)
def q_user_type_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile as a SET of event types: collect_set
    + sort_array gives an order-independent canonical form (portable
    across engines and partitionings), with a membership flag for
    segment filters. The set is bounded by |event types|, so state per
    key is tiny regardless of event volume."""
    ev = _events(spark, sf_dir)
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.array_join(types, ",").alias("type_set"),
        F.size(types).alias("n_types"),
        F.bool_or(F.col("event_type") == "purchase").alias("has_purchase"),
    )


# ---------------------------------------------------------------------------
# Classic warehouse shapes on the fact tables (TPC-H Q10/Q7/Q17/Q22 forms)
# ---------------------------------------------------------------------------


def _rev_cents4():
    """Discounted revenue in exact 10^-4 units: price and discount are
    2-decimal quantities, so round-to-cents → BIGINT products sum
    EXACTLY — immune to float summation order. The final /10000.0 is a
    single IEEE division of the same integer in every engine, so the
    result is bit-identical WITHOUT a final round (a final decimal
    round would reintroduce engine-specific half-case behavior:
    Spark rounds the shortest decimal repr, DuckDB the raw double)."""
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    return price_c * disc_c


@register(
    "returned_items_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
           / 10000.0 AS revenue_lost,
       CAST(count(*) AS BIGINT) AS n_returned_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_lost DESC, c.c_custkey LIMIT 20
""",
)
def q_returned_items_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue loss per customer (TPC-H Q10 shape): the
    returnflag predicate pushes into the lineitem scan, nation (25 rows)
    hint-broadcasts, customer — which scales with SF — is left to AQE,
    and the only big join (lineitem⋈orders) keys on orderkey — at
    100 TB both sides bucket on orderkey and it goes shuffle-free.
    Top-20 plans as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (F.sum(_rev_cents4()) / 10000.0).alias("revenue_lost"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("revenue_lost").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "nation_trade_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
           / 10000.0 AS volume,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade volume by (supplier nation, customer nation,
    ship year) — TPC-H Q7 shape. The two 25-row nation dims
    hint-broadcast; supplier and customer scale with SF, so AQE decides
    their strategy; lineitem⋈orders is the only guaranteed shuffle join
    and keys on orderkey. The inequality filter runs on resolved nation
    names map-side, never as a join condition."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            (F.sum(_rev_cents4()) / 10000.0).alias("volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "small_quantity_part_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly_revenue_loss,
       CAST(count(*) AS BIGINT) AS n_small_orders
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < 0.2 * pa.avg_qty
""",
)
def q_small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-order revenue estimate (TPC-H Q17 shape): the correlated
    scalar subquery 'below 20% of this part's average quantity' is
    decorrelated into a per-part aggregate joined back to the fact —
    the aggregate is |parts| rows (≪ lineitem but scaling with SF), so
    it carries no broadcast hint: AQE broadcasts it while small and
    partitions both sides on partkey once the part dimension outgrows
    the threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias(
                "avg_yearly_revenue_loss"
            ),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


_DORMANT_CUTOFF = "2000-06-01"


@register(
    "rich_dormant_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
FROM customer c CROSS JOIN avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '{_DORMANT_CUTOFF}')
""",
)
def q_rich_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with NO recent orders (TPC-H Q22
    shape — churn-risk screen): the NOT EXISTS is a LEFT ANTI join
    against the distinct recent-order keys, the average balance is a
    1-row broadcast scalar, and both filters run map-side. The date
    predicate pushes into the orders scan BEFORE the distinct, so the
    anti-join build side is only the recent slice."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_DORMANT_CUTOFF).cast("date"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
        )
    )


@register(
    "salted_user_totals",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
           AS total_value
FROM events GROUP BY user_id
""",
)
def q_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals through the SKEW-SALTED two-stage aggregation
    (operators/skew.py): partial agg on (user_id, salt) spreads a hot
    key across reducers, the final agg merges the salt partials — the
    standard fix when one key holds 10% of 100 TB and map-side partials
    are defeated. Values sum as exact integer cents, so the result is
    bit-identical to the plain GROUP BY oracle no matter how the random
    salt scatters the addition order."""
    from covid_data_challenge_spark.operators.skew import salted_agg_sum_count

    ev = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    out = salted_agg_sum_count(ev, "user_id", ["cents"], salt=16)
    return out.select(
        "user_id",
        F.col("n_rows"),
        (F.col("sum_cents") / 100.0).alias("total_value"),
    )


@register(
    "variant_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       round(avg(k), 4) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
GROUP BY event_type
""",
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same JSON-payload aggregation as ``json_props_stats``, through
    Spark 4's VARIANT type: ``parse_json`` builds the binary variant
    ONCE, then any number of ``variant_get`` extractions are O(1) path
    reads — at 100 TB a multi-field extraction parses each payload once
    instead of once per ``get_json_object`` call, and variant columns
    stored in parquet keep that shredded form on disk. Oracle: DuckDB's
    JSON extraction over the same strings."""
    ev = _events(spark, sf_dir)
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "basket_part_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders_both
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders_both DESC, part_a, part_b LIMIT 50
""",
)
def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: parts co-occurring in the same order
    (the association-rule support counts). The (order, part) distinct
    collapses line-level repeats first; pairs are then exploded INSIDE
    each basket (collect_set per order + i<j combinations) instead of a
    fact-table self-join — baskets are bounded by order size (≤7 lines
    in TPC-H; real carts are similarly small), so the per-group
    explosion is memory-safe and the lineitem table is scanned once. At
    100 TB the standard guards apply map-side: cap basket size and drop
    ubiquitous parts before pairing (same df-cap logic as
    term_cooccurrence_pmi). Fully tie-broken top-50."""
    li = load_table(spark, sf_dir, "lineitem")
    # collect_set subsumes the (order, part) distinct — one shuffle, not
    # a distinct followed by a second group-by shuffle
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                "parts",
                lambda x: F.transform(
                    "parts",
                    lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                ),
            )
        ),
        lambda p: p["part_a"] < p["part_b"],
    )
    return (
        baskets.select(F.explode(pair).alias("p"))
        .select("p.*")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_both"))
        .orderBy(F.col("n_orders_both").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "yearly_revenue_growth",
    oracle="""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT order_year, revenue, n_orders,
       round(100.0 * (revenue - lag(revenue) OVER (ORDER BY order_year))
             / lag(revenue) OVER (ORDER BY order_year), 2) AS yoy_pct
FROM yearly
""",
)
def q_yearly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: the window lag runs over the
    YEARS-sized aggregate, not the fact table — aggregate first, window
    the summary. Revenue sums as exact integer cents (order-independent);
    the growth ratio is computed on identical doubles in both engines,
    so the final round is safe. The single-partition window is fine
    BECAUSE its input is |years| rows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        (F.sum(cents) / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("order_year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "order_year",
        "revenue",
        "n_orders",
        F.round(100.0 * (F.col("revenue") - prev) / prev, 2).alias("yoy_pct"),
    )


@register(
    "favorite_event_type",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS favorite_type, CAST(cnt AS BIGINT) AS n_events
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM counts
)
WHERE rn = 1
""",
)
def q_favorite_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user most-frequent event type — MODE with a deterministic
    tie-break (count desc, then type name), which the built-in ``mode()``
    aggregate cannot guarantee across engines. Two stages on ONE
    partitioning: the (user, type) count reuses its shuffle for the
    per-user argmax window, and WindowGroupLimit keeps only each user's
    best row map-side."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("favorite_type"),
            F.col("cnt").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Choropleth map-feed projection (reference streamlit_app.py:358-439)
# ---------------------------------------------------------------------------


@register(
    "choropleth_projection",
    oracle="""
WITH per AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS api_current_cases
  FROM customer GROUP BY c_nationkey
),
merged AS (
  SELECT n_name AS country_standardized,
         CASE WHEN n_name = 'NATION_3' THEN NULL
              WHEN n_name = 'NATION_7' THEN ''
              ELSE upper(substr(n_name, 1, 3)) END AS iso_code_owid_meta,
         coalesce(api_current_cases, 0) AS api_current_cases
  FROM nation LEFT JOIN per ON n_nationkey = c_nationkey
)
SELECT iso_code_owid_meta AS iso_code, country_standardized, api_current_cases
FROM merged
WHERE iso_code_owid_meta IS NOT NULL AND iso_code_owid_meta <> ''
""",
)
def q_choropleth_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The world-map feed behind the reference's choropleth
    (streamlit_app.py:358-439): a merged-style frame whose ISO column
    carries a merge suffix (``iso_code_owid_meta``) is resolved
    suffix-tolerantly, rows with NULL/empty locations are dropped, and
    (iso_code, name, metric) is projected. The fixture frame plants a
    NULL and an empty ISO code so the valid-location filter is
    exercised; resolution runs driver-side against the schema, so the
    executed plan is a pure filter+projection over one small join."""
    from covid_data_challenge_spark.pipeline.covid import choropleth_frame

    nation = load_table(spark, sf_dir, "nation")
    per = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("api_current_cases"))
    )
    iso = (
        F.when(F.col("n_name") == "NATION_3", F.lit(None).cast("string"))
        .when(F.col("n_name") == "NATION_7", F.lit(""))
        .otherwise(F.upper(F.substring("n_name", 1, 3)))
    )
    merged = nation.join(
        per, nation["n_nationkey"] == per["c_nationkey"], "left"
    ).select(
        F.col("n_name").alias("country_standardized"),
        iso.alias("iso_code_owid_meta"),
        F.coalesce("api_current_cases", F.lit(0).cast("long")).alias(
            "api_current_cases"
        ),
    )
    return choropleth_frame(merged, "api_current_cases")


# ---------------------------------------------------------------------------
# Round-2 warehouse shapes (TPC-H Q4/Q14/Q15/Q18/Q2 forms) + CMS sketch
# ---------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped after the order date,
    counted per priority class (TPC-H Q4 shape). The EXISTS becomes a
    LEFT SEMI hash join on orderkey with the date inequality as a
    residual condition — the probe side never duplicates orders no
    matter how many lineitems are late, and at 100 TB both sides bucket
    on orderkey so the semi join goes shuffle-free. Only
    (l_orderkey, l_shipdate) is read from the fact scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


@register(
    "promo_revenue_share",
    oracle="""
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS promo_share,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotional revenue share per ship year (TPC-H Q14 shape, yearly
    instead of single-month so the result has grading surface). Revenue
    folds as exact integer 10^-4 units, so both the share (one IEEE
    division of two identical BIGINTs) and the total are bit-identical
    to the oracle regardless of aggregation order. part scales with SF
    → no broadcast hint; AQE broadcasts it while small and falls back
    to a partkey-bucketable shuffle join at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _rev_cents4()
    promo_cents = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            (F.sum(promo_cents) / F.sum(cents)).alias("promo_share"),
            (F.sum(cents) / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "top_revenue_suppliers",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM rev)
""",
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum quarterly revenue (TPC-H Q15 shape).
    The quarter predicate pushes into the fact scan; per-supplier
    revenue folds once as exact integer units; the max is a 1-row
    broadcast joined back and compared in EXACT integer space (a
    double-equality here would be flaky — BIGINT equality is not).
    supplier scales with SF → no hint, AQE decides its side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents4()).alias("rev_c"))
    mx = rev.agg(F.max("rev_c").alias("max_c"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_c") == F.col("max_c"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_c") / 10000.0).alias("total_revenue"))
    )


@register(
    "large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey, b.total_qty
FROM big b JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind bulk orders — total quantity over 300 (TPC-H Q18
    shape). The HAVING pre-aggregation shrinks the fact table to
    |qualifying orders| BEFORE any join (quantities are integer-valued,
    so the double sum is exact in any order and the BIGINT cast is
    safe); the join chain then keys on orderkey → custkey with no
    hints — at 100 TB the big side is already just the survivors."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_d"))
        .filter(F.col("qty_d") > 300)
        .select("l_orderkey", F.col("qty_d").cast("long").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS best_price
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, l_suppkey, best_price,
         row_number() OVER (PARTITION BY l_partkey ORDER BY best_price, l_suppkey) AS rn
  FROM unit
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, r.best_price
FROM ranked r
JOIN part p ON p.p_partkey = r.l_partkey
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rn = 1
""",
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest observed supplier per part (TPC-H Q2's correlated
    min-cost subquery, decorrelated): per-(part, supplier) best unit
    price folds map-side, then the per-part ARGMIN fuses into a second
    aggregation via struct-min — lexicographic (price, suppkey) min ≡
    ORDER BY price, suppkey LIMIT 1, deterministic under ties, and two
    agg passes replace the window sort entirely (the same fused-argmax
    idiom as the flagship). Unit price is a per-row IEEE division,
    identical in every engine; no rounding anywhere."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("best_price")
    )
    best = (
        unit.groupBy("l_partkey")
        .agg(F.min(F.struct("best_price", "l_suppkey")).alias("b"))
        .select("l_partkey", F.col("b.best_price").alias("best_price"),
                F.col("b.l_suppkey").alias("l_suppkey"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(sup, best.l_suppkey == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "best_price")
    )


@register(
    "cms_heavy_hitters",
    oracle="""
WITH sketch AS (
  SELECT t.i AS sk_row,
         substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
         count(*) AS cnt
  FROM events CROSS JOIN range(0, 4) t(i)
  GROUP BY 1, 2
),
cand AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT c.user_id, t.i AS sk_row,
         substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(c.user_id AS VARCHAR)), 1, 2) AS bucket
  FROM cand c CROSS JOIN range(0, 4) t(i)
)
SELECT p.user_id, CAST(min(s.cnt) AS BIGINT) AS est_count
FROM probes p JOIN sketch s ON s.sk_row = p.sk_row AND s.bucket = p.bucket
GROUP BY 1 ORDER BY est_count DESC, user_id LIMIT 15
""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (operators/sketch.py): one
    pass folds every user_id into a 4×256 counter grid (map-side
    partials collapse the explode to ≤1024 rows per task before a tiny
    shuffle), then a candidate set probes the broadcast sketch with
    min-over-rows. At 100 TB the grid is the only state — mergeable by
    addition across days/clusters — and the probe is map-side whatever
    the candidate count. md5 bucketing (splits.py discipline) makes the
    sketch — and therefore every estimate, collisions included —
    bit-identical to the DuckDB oracle. Candidates here are the
    distinct keys so the oracle covers the whole key space; production
    would pass a shortlist."""
    from covid_data_challenge_spark.operators.sketch import cms_build, cms_estimate

    ev = _events(spark, sf_dir).select("user_id")
    sketch = cms_build(ev, "user_id", depth=4, hex_chars=2)
    cand = ev.distinct()
    est = cms_estimate(sketch, cand, "user_id", depth=4, hex_chars=2)
    return est.orderBy(F.col("est_count").desc(), "user_id").limit(15)


@register(
    "session_top_paths",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
),
paths AS (
    SELECT user_id, session_idx,
           array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
    FROM numbered GROUP BY user_id, session_idx
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10
""",
)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 in-session event sequences (operators/sessions.py
    session_paths): per-session ordering happens inside collect_list +
    array_sort, so beyond the shared session_index window pass the plan
    shuffles one row per SESSION (grouped path aggregation), never raw
    events; the prefix cap bounds path cardinality at 100 TB. Ties are
    fully deterministic (event_id in the sort, path string in the
    top-k)."""
    from covid_data_challenge_spark.operators.sessions import session_paths

    return session_paths(_events(spark, sf_dir), max_len=5, k=10)


@register(
    "char_entropy",
    oracle=f"""
WITH cs AS (SELECT doc_id, string_split({_NORM}, '') AS cs FROM documents)
SELECT doc_id,
       round(-list_reduce(
           list_transform(
             list_transform(list_sort(list_distinct(cs)),
               d -> CAST(len(list_filter(cs, c -> c = d)) AS DOUBLE) / len(cs)),
             p -> p * ln(p)),
           (a, b) -> a + b) + 0.0, 6) AS char_entropy
FROM cs
""",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy (functions/text.py char_entropy):
    the perplexity-proxy quality signal as pure row-local Column
    algebra — no shuffle, no UDF, whole-stage codegen. The -Σ p·ln p
    fold runs over sorted distinct chars, so float summation order is
    engine-identical and the oracle hash-matches at 6 digits."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.functions.text import char_entropy

    return docs.select("doc_id", char_entropy(F.col("text")).alias("char_entropy"))


@register(
    "oov_rate",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS c FROM tok GROUP BY 1 ORDER BY c DESC, term LIMIT 20
  )
),
per AS (
  SELECT t.doc_id,
         CAST(count(*) AS INT) AS n_tokens,
         CAST(count(*) FILTER (t.term NOT IN (SELECT term FROM vocab)) AS INT) AS n_oov
  FROM tok t GROUP BY 1
)
SELECT doc_id, n_tokens, n_oov,
       round(n_oov * 1.0 / n_tokens, 6) AS oov_rate
FROM per
""",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-20
    vocabulary — the tokenizer-coverage check a training pipeline runs
    before committing to a vocab. The vocab is a top-k aggregate
    (deterministic count-then-term order) broadcast into a LEFT ANTI
    membership probe on the exploded tokens; per-doc totals and OOV
    counts fold in one aggregation over the same explode, so the doc
    corpus shuffles once on doc_id whatever the vocab size."""
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(20)
        .select("term")
    )
    flagged = tok.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))), "term", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") * 1.0 / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


@register(
    "ann_cosine_topk_int8",
    oracle="""
WITH quant AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(127.0 * CAST(x AS DOUBLE) /
                  sqrt(list_reduce(list_transform(embedding,
                         e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (a, b) -> a + b))
                  + 0.5) AS INT)) AS qv
  FROM embeddings
),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS int_dot
  FROM quant q JOIN quant c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, int_dot, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY int_dot DESC, neighbor_id) AS rn FROM sims)
WHERE rn <= 5
""",
)
def q_ann_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors by int8-quantized dot product
    (operators/similarity.py cosine_topk_int8): the scalar-quantization
    ANN tier — 4× less memory than float32, integer-exact arithmetic
    (no float summation order), so even this APPROXIMATE method keeps a
    bit-exact cross-engine oracle. floor(x+0.5) quantization avoids
    round(): engines disagree on double half-cases, floor never does.
    Recall vs the float-exact top-k is pinned in pytest."""
    from covid_data_challenge_spark.operators.similarity import cosine_topk_int8

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_int8(emb, queries, k=5)


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
    "column_stats_profile",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv_orderkey,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv_partkey,
       CAST(count(DISTINCT l_returnflag) AS BIGINT) AS ndv_returnflag,
       CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT) AS nulls_shipdate,
       min(l_shipdate) AS min_shipdate,
       max(l_shipdate) AS max_shipdate,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
""",
)
def q_column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column statistics (row count, per-column
    NDV, null count, min/max) — what a catalog collects for CBO join
    ordering and what zone-map layouts are built from. ONE scan: the
    multi-NDV aggregation plans as a single pass with an Expand (3 rows
    per input), all partially aggregated map-side. Exact countDistinct
    here (oracle-checkable); at 100 TB each NDV swaps to the mergeable
    HLL sketch (operators/sketch.py) without touching the query shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("ndv_orderkey"),
        F.countDistinct("l_partkey").alias("ndv_partkey"),
        F.countDistinct("l_returnflag").alias("ndv_returnflag"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nulls_shipdate"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "sole_late_supplier",
    oracle="""
WITH per AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT l.l_suppkey) FILTER (l.l_shipdate > o.o_orderdate) AS n_late_supp,
         max(l.l_suppkey) FILTER (l.l_shipdate > o.o_orderdate) AS late_supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_sole_late_orders
FROM per JOIN supplier s ON s.s_suppkey = per.late_supp
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY 1, 2 ORDER BY n_sole_late_orders DESC, s_suppkey LIMIT 10
""",
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper on multi-supplier orders
    (TPC-H Q21's correlated EXISTS/NOT-EXISTS pair, decorrelated): both
    existence tests collapse into ONE per-order aggregation — distinct
    suppliers, distinct LATE suppliers (conditional countDistinct), and
    the late supplier key when unique (conditional max) — so the fact
    table is touched once and the only shuffles are the orderkey
    pre-agg and the small per-supplier count. max(when(late, suppkey))
    is well-defined exactly because the n_late_supp = 1 filter makes the
    set a singleton."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate")
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.join(sup, per.late_supp == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_sole_late_orders"))
        .orderBy(F.col("n_sole_late_orders").desc(), "s_suppkey")
        .limit(10)
    )


@register(
    "daily_metric_unpivot",
    oracle="""
WITH wide AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) / 100.0 AS click_value,
         sum(CASE WHEN event_type = 'purchase'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) / 100.0 AS purchase_value,
         sum(CASE WHEN event_type = 'view'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) / 100.0 AS view_value
  FROM events GROUP BY 1
)
SELECT day, metric, total FROM wide
UNPIVOT (total FOR metric IN (click_value, purchase_value, view_value))
""",
)
def q_daily_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via native UNPIVOT (``DataFrame.unpivot``, the
    melt Spark 3.4+ ships): daily per-type value totals pivot wide in
    one conditional aggregation (exact integer cents — engine- and
    order-independent), then unpivot back to (day, metric, total) rows.
    Unpivot is a zero-shuffle Expand — the reshape costs 3 rows per
    input row, no exchange, so the only shuffle is the day groupBy."""
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")

    def m(t: str) -> "F.Column":
        return (
            F.sum(F.when(F.col("event_type") == t, cents).otherwise(F.lit(0)))
            / 100.0
        )

    wide = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        m("click").alias("click_value"),
        m("purchase").alias("purchase_value"),
        m("view").alias("view_value"),
    )
    return wide.unpivot(
        ids=["day"],
        values=["click_value", "purchase_value", "view_value"],
        variableColumnName="metric",
        valueColumnName="total",
    )


@register(
    "split_by_cluster",
    oracle=f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES}
SELECT d.doc_id,
       coalesce(a.cluster_id, d.doc_id) AS cluster_id,
       {split_sql_case("coalesce(a.cluster_id, d.doc_id)", _SPLITS)} AS split
FROM documents d LEFT JOIN assigned a USING (doc_id)
""",
)
def q_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split keyed on the NEAR-DUP CLUSTER id, not the
    doc id — the leakage guard real training pipelines need: two
    near-duplicate documents land in the same split BY CONSTRUCTION
    (same cluster key → same md5 coin), so the test set can never
    contain a near-copy of a training document. Composes the verified
    connected-components clustering with the verified md5 split — and
    both engines re-derive the same clusters (recursive CTE twin), so
    the composition stays bit-exact."""
    from covid_data_challenge_spark.operators.components import cluster_assignments

    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, n=3, threshold=0.2, max_doc_freq=10).select(
        "doc_a", "doc_b"
    )
    clustered = cluster_assignments(docs, pairs).select("doc_id", "cluster_id")
    keyed = docs.select("doc_id").join(clustered, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    return assign_split(keyed, "cluster_id", _SPLITS)


@register(
    "customer_value_skyline",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_spent
  FROM orders GROUP BY 1
),
pts AS (
  SELECT c.c_custkey, c.c_name, p.total_spent, round(c.c_acctbal, 2) AS acctbal
  FROM customer c JOIN per p ON c.c_custkey = p.o_custkey
)
SELECT c_custkey, c_name, total_spent, acctbal FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.total_spent >= p.total_spent AND q.acctbal >= p.acctbal
    AND (q.total_spent > p.total_spent OR q.acctbal > p.acctbal)
)
""",
)
def q_customer_value_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of customers over (lifetime spend, account
    balance) — the skyline operator (operators/skyline.py, EDBT 2023
    pattern from PAPERS.md). Two-phase: grid-partitioned LOCAL sort
    windows eliminate in parallel, then one global pass over the
    surviving per-bucket frontiers (a sort of frontiers, never of the
    data). The DuckDB oracle is the O(n²) NOT-EXISTS dominance
    definition, so the distributed algorithm is value-checked against
    the literal semantics. Spend folds as exact integer cents."""
    from covid_data_challenge_spark.operators.skyline import skyline_2d

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0).alias(
            "total_spent"
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    pts = cust.join(per, cust.c_custkey == per.o_custkey).select(
        "c_custkey", "c_name", "total_spent", "acctbal"
    )
    return skyline_2d(pts, "total_spent", "acctbal")


@register(
    "funnel_timed_3way",
    oracle="""
SELECT CAST(v.ts AS DATE) AS view_day,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_users
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
  AND v.event_type = 'view'
  AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
  AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
GROUP BY 1
""",
)
def q_funnel_timed_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained 3-way funnel (view → click ≤24h → purchase
    ≤24h) — the multi-way join shape (ICDE multi-way stream join family,
    PAPERS.md) expressed so that ONE user_id hash partitioning serves
    BOTH joins: each stage equi-joins on user_id with the time bound as
    a residual condition, so the second join consumes the first's
    partitioning without a re-shuffle. Per-user event streams bound the
    fan-out (type-filtered slices pushed into the scan); at 100 TB the
    same plan runs over an events table bucketed on user_id, and the
    streaming form is two chained stream-stream joins with watermarks
    bounding exactly these 24h windows of state."""
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    day_s = 24 * 3600
    vc = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {day_s} SECOND")),
    )
    vcp = vc.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {day_s} SECOND")),
    )
    return vcp.groupBy(F.col("v_ts").cast("date").alias("view_day")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "dq_violations",
    oracle="""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS qty_range,
         CAST(count(*) FILTER (l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1) AS BIGINT) AS disc_range,
         CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT) AS shipdate_null,
         CAST(count(*) FILTER (l_returnflag NOT IN ('A', 'N', 'R') OR l_returnflag IS NULL) AS BIGINT) AS flag_domain,
         CAST(count(*) FILTER (l_extendedprice IS NULL OR l_extendedprice <= 0) AS BIGINT) AS price_positive
  FROM lineitem
)
SELECT rule, n_violations, round(n_violations * 1.0 / n_rows, 6) AS violation_rate
FROM agg
UNPIVOT (n_violations FOR rule IN (qty_range, disc_range, shipdate_null, flag_domain, price_positive))
""",
)
def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (Great-Expectations shape):
    FIVE rules — range, domain, null, positivity — evaluate as
    conditional counts in ONE fact scan (map-side partials, single
    1-row shuffle), then unpivot to a per-rule violation report. Adding
    a rule adds a column to the aggregation, never a scan: at 100 TB
    the cost of the whole expectation suite is one pass, which is the
    only defensible shape for ingest gating."""
    li = load_table(spark, sf_dir, "lineitem")

    def bad(cond) -> "F.Column":
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    q = F.col("l_quantity")
    d = F.col("l_discount")
    p = F.col("l_extendedprice")
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        bad(q.isNull() | (q < 1) | (q > 50)).alias("qty_range"),
        bad(d.isNull() | (d < 0) | (d > 0.1)).alias("disc_range"),
        bad(F.col("l_shipdate").isNull()).alias("shipdate_null"),
        bad(
            F.col("l_returnflag").isNull()
            | ~F.col("l_returnflag").isin("A", "N", "R")
        ).alias("flag_domain"),
        bad(p.isNull() | (p <= 0)).alias("price_positive"),
    )
    long = agg.unpivot(
        ids=["n_rows"],
        values=["qty_range", "disc_range", "shipdate_null", "flag_domain", "price_positive"],
        variableColumnName="rule",
        valueColumnName="n_violations",
    )
    return long.select(
        "rule",
        "n_violations",
        F.round(F.col("n_violations") * 1.0 / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


@register(
    "forecast_revenue_change",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 10000.0
         AS revenue_effect,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure-scan aggregate. ALL four predicates push into
    the parquet scan (PushedFilters carries the date/discount/quantity
    bounds — row groups outside them never decompress), the two used
    columns are the only ones read, and the single 1-row shuffle is the
    partial-agg merge. The simplest query in the suite and the one most
    sensitive to scan efficiency at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(price_c * disc_c) / 10000.0).alias("revenue_effect"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "disjunctive_brand_revenue",
    oracle="""
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size <= 5)
   OR (p.p_brand = 'Brand#13' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size <= 10)
   OR (p.p_brand = 'Brand#19' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size <= 15)
""",
)
def q_disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning both join
    sides. Catalyst splits the disjunction: the quantity envelope
    (1–30) and the brand/size envelope push DOWN to their respective
    scans as coarse pre-filters, while the exact cross-table
    disjunction evaluates as the join's residual condition — so most
    non-qualifying rows die at the parquet reader, not in the join. At
    100 TB the part side is the smaller relation and AQE broadcasts or
    shuffles it by partkey as size dictates (no hint)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    arm = lambda brand, lo, hi, size: (
        (F.col("p_brand") == brand) & (q >= lo) & (q <= hi) & (F.col("p_size") <= size)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(
            arm("Brand#1", 1, 11, 5)
            | arm("Brand#13", 10, 20, 10)
            | arm("Brand#19", 20, 30, 15)
        )
        .agg(
            (F.sum(_rev_cents4()) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "nation_market_share",
    oracle="""
WITH sales AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
         sn.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT order_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) AS BIGINT)
         / CAST(sum(cents) AS BIGINT) AS market_share
FROM sales GROUP BY 1
""",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of ASIA-customer revenue per year (TPC-H Q8
    shape): a six-table star whose region predicate prunes through the
    customer-nation arm, both 25-row nation dims and the 5-row region
    hint-broadcast, customer/supplier are left to AQE, and the share is
    one IEEE division of two identical exact-cents BIGINTs — so the
    conditional aggregation is bit-identical to the oracle in any
    partitioning. The only guaranteed shuffle join keys on orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cents = _rev_cents4()
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"), "left_semi"
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    target = F.when(F.col("supp_nation") == "NATION_5", cents).otherwise(F.lit(0))
    return sales.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg((F.sum(target) / F.sum(cents)).alias("market_share"))


@register(
    "customer_order_distribution",
    oracle="""
WITH per AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per GROUP BY 1
""",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (TPC-H Q13 shape): the
    LEFT join keeps zero-order customers (count(o_orderkey) ignores the
    NULLs a left-join miss produces — count(*) would not), the first
    aggregation keys on custkey sharing the join's partitioning, and
    the second groupBy runs over at most |distinct order counts| rows.
    At 100 TB the orders side pre-aggregates per custkey before the
    join, so the wide row never carries order payloads."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "nation_revenue_share_in_region",
    oracle="""
WITH per AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, cents / 10000.0 AS revenue,
       cents / CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT) AS share_of_region
FROM per
""",
)
def q_nation_revenue_share_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: each nation's share of its region's revenue —
    the unordered PARTITION-total window (no ORDER BY → no sort, one
    pass over the 25-row aggregate, never over facts). Everything
    heavy happens in the single fact aggregation (exact cents, nation/
    region broadcast); the window and the share division are identical
    integer arithmetic in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(_rev_cents4()).alias("cents"))
    )
    w = Window.partitionBy("region")
    return per.select(
        "region",
        "nation",
        (F.col("cents") / 10000.0).alias("revenue"),
        (F.col("cents") / F.sum("cents").over(w)).alias("share_of_region"),
    )


# ---------------------------------------------------------------------------
# Round 2: boilerplate detection, Bloom decontamination, SemDeDup
# ---------------------------------------------------------------------------


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


# The SemDeDup recipe unrolled as a CTE chain (the same move as
# part_pagerank's oracle): exact-collapse → 8 lowest-id seeds → one Lloyd
# iteration (assign, per-(cid,pos) mean, float32 snap — drops emptied
# clusters exactly like ivf.lloyd_refine) → final assignment →
# within-cluster round-4 cosine pairs → lowest-id survivor, expanded back
# to the full corpus on vector equality.
_SEMDEDUP_SQL = f"""
WITH uniq AS (
    SELECT min(vec_id) AS id, embedding AS vec FROM embeddings GROUP BY embedding
),
seeds AS (
    SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, vec AS cvec
    FROM uniq ORDER BY id LIMIT 8
),
a1 AS ({_dd_assign('uniq', 'seeds')}),
by_dim AS (
    SELECT cid, unnest(vec) AS x, generate_subscripts(vec, 1) AS pos FROM a1
),
cent AS (
    SELECT cid, list(CAST(m AS FLOAT) ORDER BY pos) AS cvec
    FROM (SELECT cid, pos, avg(CAST(x AS DOUBLE)) AS m FROM by_dim GROUP BY cid, pos)
    GROUP BY cid
),
a2 AS ({_dd_assign('uniq', 'cent')}),
pruned AS (
    SELECT DISTINCT b.id AS id
    FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.id < b.id
    WHERE round({_dd_cos('a.vec', 'b.vec')}, 4) >= 0.9
),
reps AS (
    SELECT a2.id, a2.vec, a2.cid, p.id IS NULL AS rep_kept
    FROM a2 LEFT JOIN pruned p ON a2.id = p.id
)
SELECT e.vec_id, r.cid, (e.vec_id = r.id AND r.rep_kept) AS kept
FROM embeddings e JOIN reps r ON e.embedding = r.vec
"""


@register("semdedup_prune", oracle=_SEMDEDUP_SQL)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) keep/prune decisions over the
    embedding corpus: seeded-Lloyd k-means (8 clusters at test SF —
    grown ∝ corpus in production), within-cluster cosine ≥ 0.9 pairs,
    lowest-id survivor per pair. Pair stage cost is Σ cluster², i.e.
    linear in the corpus at constant cluster size — never O(n²).
    The fixed-iteration seeded Lloyd unrolls into a DuckDB CTE chain
    (like part_pagerank's oracle), so this is a full hash-checked row,
    not rows-only; bit-exactness vs a NumPy replica is additionally
    pinned in tests/test_dedup_similarity.py (operators/semdedup.py)."""
    return semdedup_prune(
        _emb(spark, sf_dir), n_centroids=8, lloyd_iters=1, threshold=0.9
    )


@register(
    "events_asof_forward",
    oracle="""
WITH clicks AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       p.ts AS ts_next_purchase, p.value AS value_next_purchase
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
)
def q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (each click → the user's next purchase
    at-or-after it), verified against DuckDB's native forward ASOF
    JOIN. Same union+window shape as the backward variant — the window
    just scans descending — so it stays one shuffle on the key
    (operators/alignment.py:asof_join, direction='forward')."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = latest_per_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        "event_id",
    ).select("user_id", "ts", "value")
    return asof_join(
        clicks, purchases, by="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], suffix="_next_purchase", direction="forward",
    )


@register(
    "concurrent_sessions_peak",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
),
sessions AS (
    SELECT min(ts) AS s, max(ts) AS e
    FROM numbered GROUP BY user_id, session_idx
),
seg AS (
    SELECT unnest(generate_series(CAST(s AS DATE), CAST(e AS DATE), INTERVAL 1 DAY))::DATE AS day,
           s, e
    FROM sessions
),
clipped AS (
    SELECT day,
           greatest(s, CAST(day AS TIMESTAMP)) AS seg_start,
           least(e, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND) AS seg_end
    FROM seg
),
points AS (
    SELECT day, seg_start AS ts, 1 AS delta FROM clipped
    UNION ALL
    SELECT day, seg_end AS ts, -1 AS delta FROM clipped
),
swept AS (
    SELECT day, sum(delta) OVER (
        PARTITION BY day ORDER BY ts, delta DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS running
    FROM points
)
SELECT day, CAST(max(running) AS BIGINT) AS peak_concurrent
FROM swept GROUP BY day
""",
)
def q_concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions via a distributed sweep-line:
    sessionize (30-min gap), split sessions at midnight, emit ±1
    boundary points, running-sum per day, max. Partitioning the sweep
    by day keeps it parallel (no global ordered sort) and the
    +1-before-−1 tie rule makes back-to-back sessions count as
    concurrent in both engines
    (operators/sessions.py:concurrent_peak_by_day)."""
    from covid_data_challenge_spark.operators.sessions import concurrent_peak_by_day

    sessions = sessionize(_events(spark, sf_dir), gap_minutes=30)
    return concurrent_peak_by_day(sessions)


@register(
    "product_type_profit",
    oracle="""
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                - CAST(round(p.p_retailprice * 100) AS BIGINT) * 100
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) / 10000.0 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on widget parts by supplier nation and order year (TPC-H
    Q9 shape; the synthetic schema has no partsupp, so unit cost is the
    part's retail price — same join topology, documented proxy).
    Catalyst pushes the p_name LIKE into the part scan; part after the
    filter and the 25-row nation broadcast, the orders arm shuffles on
    orderkey only. Profit is exact integer cents⁴ arithmetic (see
    _rev_cents4) so the sum is partition-order-immune and the single
    final division matches DuckDB bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost_c4 = (
        F.round(F.col("p_retailprice") * 100, 0).cast("long")
        * F.lit(100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg((F.sum(_rev_cents4() - cost_c4) / 10000.0).alias("profit"))
    )


@register(
    "supplier_count_by_part_attr",
    oracle="""
WITH rel AS (
    SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT rel.l_suppkey) AS BIGINT) AS supplier_cnt
FROM rel
JOIN part p ON rel.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'ECONOMY'
GROUP BY 1, 2, 3
""",
)
def q_supplier_count_by_part_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) excluding one brand
    and one type (TPC-H Q16 shape; the part-supplier relation is
    derived from observed lineitem pairs since the synthetic schema has
    no partsupp). The distinct on (partkey, suppkey) is a map-side
    partial dedup before its shuffle, the part filters push into the
    scan, and the final count-distinct groups on low-cardinality attrs
    — no fact-table re-shuffle."""
    rel = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#3") & (F.col("p_type") != "ECONOMY"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        rel.join(part, rel.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "charset_profile",
    oracle="""
WITH per AS (
    SELECT source,
           length(text) AS n,
           length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
           length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_space,
           length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS n_nonascii
    FROM documents
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_chars,
       round(sum(n_alpha) / sum(n), 4) AS alpha_ratio,
       round(sum(n_digit) / sum(n), 4) AS digit_ratio,
       round(sum(n_space) / sum(n), 4) AS space_ratio,
       round(sum(n_nonascii) / sum(n), 4) AS nonascii_ratio
FROM per GROUP BY source
""",
)
def q_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class profile (alpha/digit/space/non-ASCII
    ratios) — the charset sanity check run before choosing encoders and
    filters for a crawl snapshot. Pure column algebra via
    length-after-strip deltas (no explode, no UDF): one map-side pass
    plus a tiny per-source aggregation."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    strip = lambda pat: n - F.length(F.regexp_replace(F.col("text"), pat, ""))
    per = docs.select(
        "source",
        n.alias("n"),
        strip("[a-zA-Z]").alias("n_alpha"),
        strip("[0-9]").alias("n_digit"),
        strip("[ ]").alias("n_space"),
        F.length(F.regexp_replace(F.col("text"), "[\\x00-\\x7F]", "")).alias("n_nonascii"),
    )
    return per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_chars"),
        F.round(F.sum("n_alpha") / F.sum("n"), 4).alias("alpha_ratio"),
        F.round(F.sum("n_digit") / F.sum("n"), 4).alias("digit_ratio"),
        F.round(F.sum("n_space") / F.sum("n"), 4).alias("space_ratio"),
        F.round(F.sum("n_nonascii") / F.sum("n"), 4).alias("nonascii_ratio"),
    )


@register(
    "part_pagerank",
    oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
n AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n.n AS rank FROM deg, n),
it1 AS (
  SELECT d.src AS node,
         round(CAST(0.15 AS DOUBLE) / n.n
               + CAST(0.85 AS DOUBLE) * coalesce(c.s, 0), 9) AS rank
  FROM deg d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, sum(p.rank / dg.d) AS s
    FROM edges e JOIN pr0 p ON e.src = p.node JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON c.dst = d.src
),
it2 AS (
  SELECT d.src AS node,
         round(CAST(0.15 AS DOUBLE) / n.n
               + CAST(0.85 AS DOUBLE) * coalesce(c.s, 0), 9) AS rank
  FROM deg d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, sum(p.rank / dg.d) AS s
    FROM edges e JOIN it1 p ON e.src = p.node JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON c.dst = d.src
),
it3 AS (
  SELECT d.src AS node,
         round(CAST(0.15 AS DOUBLE) / n.n
               + CAST(0.85 AS DOUBLE) * coalesce(c.s, 0), 9) AS rank
  FROM deg d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, sum(p.rank / dg.d) AS s
    FROM edges e JOIN it2 p ON e.src = p.node JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON c.dst = d.src
)
SELECT node AS part, round(rank, 6) AS rank
FROM it3 ORDER BY rank DESC, node LIMIT 20
""",
)
def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the order-co-occurrence graph
    (3 fixed iterations, damping 0.85) — the iterative-DataFrame-loop
    showcase alongside connected components. Each iteration is one
    edges⋈ranks equi-join + one per-dst aggregation; ranks snap to a
    1e-9 grid per iteration so the partition-order float jitter can't
    diverge from the DuckDB unrolled-CTE oracle
    (operators/graph.py:pagerank)."""
    from covid_data_challenge_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # basket-explode instead of an items⋈items self-join: one shuffle on
    # orderkey, then ordered pairs generated map-side inside each ≤7-part
    # basket (same guard discussion as basket_part_pairs)
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                "parts",
                lambda x: F.transform(
                    "parts",
                    lambda y: F.struct(x.alias("src"), y.alias("dst")),
                ),
            )
        ),
        lambda s: s["src"] != s["dst"],
    )
    edges = (
        baskets.select(F.explode(pair).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
    )
    # parts are a catalog dimension (bounded by schema, not SF), so the
    # 20k-row rank table broadcasts and the 2.4M-row edge list is never
    # shuffled inside the loop — measured ~2x per iteration at sf0.1
    ranks = pagerank(edges, iters=3, damping=0.85, broadcast_ranks=True)
    return (
        ranks.select(F.col("node").alias("part"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "part")
        .limit(20)
    )


@register(
    "user_daily_value_ewma",
    oracle="""
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 6) AS x
    FROM events GROUP BY 1, 2
),
lists AS (
    SELECT user_id, list(x ORDER BY day) AS xs FROM daily GROUP BY user_id
)
SELECT user_id, CAST(len(xs) AS BIGINT) AS n_days,
       round(list_reduce(CAST(xs AS DOUBLE[]),
                         (acc, x) -> CAST(0.3 AS DOUBLE) * x
                                     + CAST(0.7 AS DOUBLE) * acc), 6) AS ewma
FROM lists
""",
)
def q_user_daily_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α = 0.3) of
    daily event value, y₁ = x₁, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ — the smoothing
    recursion window functions can't express directly. Computed as a
    JVM-side sequential fold (`aggregate`) over the per-user sorted
    daily array: recursion order is explicit, so the result is
    bit-identical to DuckDB's list_reduce replay (IEEE a·x + b·acc is
    evaluation-order-fixed in both). Per-user state is bounded by the
    day count (30 here); at 100 TB the daily pre-aggregation is the
    only fact-table shuffle, and each day's partial sums are snapped
    round-6 so partition order can't leak into the fold input."""
    daily = (
        _events(spark, sf_dir)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    per = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("dx")
    )
    xs = F.transform(F.col("dx"), lambda s: s["x"])
    ewma = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return per.select(
        "user_id",
        F.size("dx").cast("long").alias("n_days"),
        F.round(ewma, 6).alias("ewma"),
    )


def _dd_l2sq(a: str, b: str) -> str:
    """DuckDB twin of functions/vector.l2sq (ordered double fold)."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        f"* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')"
    )


def _ann_ivfpq_oracle(
    n_centroids: int = 16, nprobe: int = 8, n_sub: int = 32, n_codes: int = 32, k: int = 5
) -> str:
    """IVF-PQ unrolled as a DuckDB CTE chain: the IVF half reuses the
    ann_ivf_topk Lloyd unroll; the PQ half trains all subspace codebooks
    (per-sub lowest-id seeds, one Lloyd iteration with float32 snap and
    drop-empty), encodes the corpus at (id, sub, code) granularity, and
    scores candidates by ADC — the per-(query,neighbor) sum is an
    ORDERED sub-ascending fold (list(d ORDER BY sub) → list_aggregate)
    to match the Spark side's F.aggregate fold bit-for-bit. Ranking is
    on the ROUND-6 ADC, as in operators/pq.ivfpq_topk."""
    sub_dim = 64 // n_sub
    return f"""
WITH uniq AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
seeds AS (
    SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, vec AS cvec
    FROM uniq ORDER BY id LIMIT {n_centroids}
),
a1 AS ({_dd_assign('uniq', 'seeds')}),
by_dim AS (
    SELECT cid, unnest(vec) AS x, generate_subscripts(vec, 1) AS pos FROM a1
),
cent AS (
    SELECT cid, list(CAST(m AS FLOAT) ORDER BY pos) AS cvec
    FROM (SELECT cid, pos, avg(CAST(x AS DOUBLE)) AS m FROM by_dim GROUP BY cid, pos)
    GROUP BY cid
),
inv AS ({_dd_assign('uniq', 'cent')}),
sv AS (
    SELECT id, s.sub, vec[s.sub * {sub_dim} + 1 : s.sub * {sub_dim} + {sub_dim}] AS subvec
    FROM uniq CROSS JOIN (SELECT unnest(range({n_sub})) AS sub) s
),
cb0 AS (
    SELECT sub, CAST(rn - 1 AS INT) AS code, subvec AS cvec FROM (
        SELECT sub, subvec, row_number() OVER (PARTITION BY sub ORDER BY id) AS rn FROM sv
    ) WHERE rn <= {n_codes}
),
asg1 AS (
    SELECT id, sub, code FROM (
        SELECT s.id, s.sub, c.code,
               row_number() OVER (
                   PARTITION BY s.id, s.sub
                   ORDER BY {_dd_l2sq('s.subvec', 'c.cvec')}, c.code
               ) AS rn
        FROM sv s JOIN cb0 c ON s.sub = c.sub
    ) WHERE rn = 1
),
cb_dim AS (
    SELECT a.sub, a.code, unnest(s.subvec) AS x, generate_subscripts(s.subvec, 1) AS pos
    FROM asg1 a JOIN sv s ON a.id = s.id AND a.sub = s.sub
),
cb AS (
    SELECT sub, code, list(CAST(m AS FLOAT) ORDER BY pos) AS cvec
    FROM (SELECT sub, code, pos, avg(CAST(x AS DOUBLE)) AS m FROM cb_dim GROUP BY sub, code, pos)
    GROUP BY sub, code
),
enc AS (
    SELECT id, sub, code FROM (
        SELECT s.id, s.sub, c.code,
               row_number() OVER (
                   PARTITION BY s.id, s.sub
                   ORDER BY {_dd_l2sq('s.subvec', 'c.cvec')}, c.code
               ) AS rn
        FROM sv s JOIN cb c ON s.sub = c.sub
    ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
probes AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_dd_cos('q.qv', 'c.cvec')} DESC, c.cid
               ) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= {nprobe}
),
qsv AS (
    SELECT query_id, s.sub, qv[s.sub * {sub_dim} + 1 : s.sub * {sub_dim} + {sub_dim}] AS subvec
    FROM q CROSS JOIN (SELECT unnest(range({n_sub})) AS sub) s
),
lut AS (
    SELECT s.query_id, s.sub, c.code, {_dd_l2sq('s.subvec', 'c.cvec')} AS d
    FROM qsv s JOIN cb c ON s.sub = c.sub
),
adc AS (
    SELECT p.query_id, i.id AS neighbor_id,
           round(list_aggregate(list(l.d ORDER BY e.sub), 'sum'), 6) AS adc_distance
    FROM probes p
    JOIN inv i ON p.cid = i.cid AND p.query_id <> i.id
    JOIN enc e ON e.id = i.id
    JOIN lut l ON l.query_id = p.query_id AND l.sub = e.sub AND l.code = e.code
    GROUP BY p.query_id, i.id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_distance
FROM (
    SELECT query_id, neighbor_id, adc_distance,
           row_number() OVER (
               PARTITION BY query_id ORDER BY adc_distance, neighbor_id
           ) AS rank
    FROM adc
) WHERE rank <= {k}
"""


@register("ann_ivfpq_topk", oracle=_ann_ivfpq_oracle())
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: coarse IVF probe + product-quantization ADC scoring
    (operators/pq.py) — the FAISS-style layout where the scan touches
    8-byte code arrays instead of float vectors. Deterministic build
    (lowest-id seeds, fixed Lloyd iterations) → the full two-level
    index unrolls into a DuckDB CTE oracle (hash-checked); recall vs
    exact L2 brute force additionally pinned in pytest
    (test_dedup_similarity)."""
    from covid_data_challenge_spark.operators.pq import ivfpq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # 32×32 codebooks measured at 0.56 recall@5 on the (adversarial)
    # uniform-random test embeddings vs 0.2 for 8×16 — see the pytest gate
    return ivfpq_topk(
        emb, queries, k=5, n_centroids=16, nprobe=8, n_sub=32, n_codes=32
    )


@register(
    "events_sliding_stream",
    oracle="""
WITH ex AS (
    SELECT event_type, value,
           unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                   time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS window_start
    FROM events
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM ex GROUP BY 1, 2
""",
)
def q_events_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding: watermarked hopping windows
    (1 h width, 30 min slide) drained via Trigger.AvailableNow into a
    memory sink — hash-matches the batch DuckDB oracle exactly, the
    streaming-equals-batch claim the engine makes for every window
    shape (streaming/events.py:streaming_sliding_counts)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_sliding_counts,
    )

    stream = read_event_stream(spark, sf_dir)
    agg = streaming_sliding_counts(stream, width="1 hour", slide="30 minutes", watermark="2 hours")
    try:
        run_to_memory_sink(agg, "events_sliding_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_sliding_stream_sink")


@register(
    "ship_delay_priority_counts",
    oracle="""
WITH lines AS (
    SELECT CASE
             WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) < 0 THEN 'pre-order'
             WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 30 THEN '0-30d'
             WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 90 THEN '31-90d'
             ELSE '>90d'
           END AS delay_bucket,
           o.o_orderpriority AS prio
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT delay_bucket,
       CAST(count(*) FILTER (prio IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (prio NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS low_line_count
FROM lines GROUP BY delay_bucket
""",
)
def q_ship_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High- vs low-priority line counts by ship-delay bucket (TPC-H
    Q12 shape; the synthetic schema has no l_shipmode, so the grouping
    key is the order-to-ship delay). One orderkey join (the only
    shuffle family), conditional counts fused into a single
    aggregation pass over the 4-row bucket domain."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay < 0, "pre-order")
        .when(delay <= 30, "0-30d")
        .when(delay <= 90, "31-90d")
        .otherwise(">90d")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("long").alias("low_line_count"),
        )
    )


@register(
    "key_skew_report",
    oracle="""
WITH freq AS (
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       round(max(n) / (sum(n) / count(*)), 4) AS skew_factor,
       round(quantile_cont(n, 0.5), 4) AS p50_key_rows,
       round(quantile_cont(n, 0.99), 4) AS p99_key_rows
FROM freq
""",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy-key skew diagnosis: per-key row counts reduced to
    the numbers that predict shuffle pathology at 100 TB — max key size
    vs mean (the skew factor AQE's skew-join threshold keys off),
    p50/p99 key sizes. One shuffle on the key, then a single-row
    reduction; run this BEFORE choosing salting/broadcast strategies
    (operators/skew.py is the mitigation toolkit)."""
    freq = _events(spark, sf_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.round(F.max("n") / (F.sum("n") / F.count(F.lit(1))), 4).alias("skew_factor"),
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50_key_rows"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99_key_rows"),
    )


@register(
    "events_dedup_stream",
    oracle="""
WITH d AS (SELECT DISTINCT ON (event_id) event_type FROM events ORDER BY event_id)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM d GROUP BY event_type
""",
)
def q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once event counts from an at-least-once source:
    dropDuplicatesWithinWatermark on event_id (bounded dedup state),
    then per-type counts — drained via Trigger.AvailableNow and
    hash-matched against the batch distinct. The synthetic feed has
    unique event_ids, so the dedup must be lossless — which is exactly
    the property worth pinning (a wrong watermark interaction silently
    drops rows; see the r2 NTZ incident)
    (streaming/events.py:streaming_dedup)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_dedup,
    )

    stream = read_event_stream(spark, sf_dir)
    counts = (
        streaming_dedup(stream, keys=("event_id",), watermark="2 hours")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    try:
        run_to_memory_sink(counts, "events_dedup_stream_sink", mode="complete")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_dedup_stream_sink")


@register(
    "lang_mismatch_report",
    oracle=f"""
WITH h AS (
    SELECT doc_id, lang, source,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["en"]}')) AS h_en,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["de"]}')) AS h_de,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["fr"]}')) AS h_fr,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["es"]}')) AS h_es
    FROM documents
),
pred AS (
    SELECT source, lang,
           CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                WHEN h_fr >= h_es THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM h
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (predicted_lang <> lang) AS BIGINT) AS n_mismatch,
       round(count(*) FILTER (predicted_lang <> lang) / count(*), 4) AS mismatch_rate
FROM pred GROUP BY source
""",
)
def q_lang_mismatch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content language QA: per source, how often the
    stopword-heuristic detector disagrees with the declared ``lang``
    column — the standard crawl-quality screen (mislabeled languages
    poison both filtering and mixture weights). Composes the lang_id
    detector map-side; one tiny per-source aggregation."""
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    h = {lang: lang_hits(t, lang) for lang in ("en", "de", "fr", "es")}
    predicted = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en")
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when(h["fr"] >= h["es"], "fr")
        .otherwise("es")
    )
    mism = (predicted != F.col("lang")).cast("int")
    return (
        docs.select("source", mism.alias("__m"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__m").cast("long").alias("n_mismatch"),
            F.round(F.sum("__m") / F.count(F.lit(1)), 4).alias("mismatch_rate"),
        )
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
    "weekly_growth_accounting",
    oracle="""
WITH weekly AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
    FROM events
),
flagged AS (
    SELECT user_id, week,
           lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
    FROM weekly
)
SELECT week,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(count(*) FILTER (prev_week IS NULL) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (prev_week = week - INTERVAL 7 DAY) AS BIGINT) AS retained_users,
       CAST(count(*) FILTER (prev_week IS NOT NULL
                             AND prev_week < week - INTERVAL 7 DAY) AS BIGINT) AS resurrected_users
FROM flagged GROUP BY week
""",
)
def q_weekly_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, active users split into new (first
    week ever), retained (active previous week), and resurrected
    (returning after a gap) — the standard product-health decomposition.
    Like cohort_retention this needs NO join: one distinct over (user,
    week), one lag window per user, one per-week aggregation — the same
    two shuffle families at any scale."""
    weekly = (
        _events(spark, sf_dir)
        .select("user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    flagged = weekly.withColumn("prev_week", F.lag("week").over(w))
    is_new = F.col("prev_week").isNull()
    is_retained = F.col("prev_week") == F.date_sub(F.col("week"), 7)
    is_resurrected = F.col("prev_week").isNotNull() & (
        F.col("prev_week") < F.date_sub(F.col("week"), 7)
    )
    return flagged.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("active_users"),
        F.sum(is_new.cast("int")).cast("long").alias("new_users"),
        # NULL-safe: prev_week IS NULL makes the equality NULL, and a
        # group of all-NULL ints sums to NULL, not 0 (3-valued logic)
        F.sum(F.coalesce(is_retained.cast("int"), F.lit(0))).cast("long").alias("retained_users"),
        F.sum(is_resurrected.cast("int")).cast("long").alias("resurrected_users"),
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
    "customer_rfm_segments",
    oracle="""
WITH per AS (
    SELECT o_custkey AS c_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_order,
           count(*) AS frequency,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
    FROM orders GROUP BY 1
),
scored AS (
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY last_order, c_custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency, c_custkey) AS f_score,
           ntile(4) OVER (ORDER BY monetary_cents, c_custkey) AS m_score
    FROM per
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3
""",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers quartiled on recency (last order
    date), frequency (order count), and monetary (exact-cents spend),
    then counted per (R,F,M) cell — the classic CRM cube. The ntile
    windows run over the per-customer aggregate (|customers| rows, not
    orders), tie-broken on custkey so quartile boundaries are
    deterministic in both engines; monetary is exact integer cents so
    the ordering itself is float-free."""
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    scored = per.select(
        "c_custkey",
        F.ntile(4).over(Window.orderBy("last_order", "c_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "c_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary_cents", "c_custkey")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@register(
    "events_enriched_stream",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def q_events_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins the customer
    dimension per micro-batch (no state — the dim is re-resolved each
    batch, the pattern for slowly-refreshing lookup tables), then
    aggregates per market segment; drained via AvailableNow and
    hash-matched against the batch join
    (streaming/events.py:streaming_enrich_with_static)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_enrich_with_static,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = read_event_stream(spark, sf_dir)
    enriched = streaming_enrich_with_static(stream, dim, key="user_id")
    counts = enriched.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    try:
        run_to_memory_sink(counts, "events_enriched_stream_sink", mode="complete")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_enriched_stream_sink")


@register(
    "order_fill_latency_percentiles",
    oracle="""
WITH d AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(quantile_cont(delay_days, 0.5), 4) AS p50_days,
       round(quantile_cont(delay_days, 0.9), 4) AS p90_days,
       round(quantile_cont(delay_days, 0.99), 4) AS p99_days
FROM d GROUP BY priority
""",
)
def q_order_fill_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency tail percentiles per priority class — the
    SLA view (p50/p90/p99). Exact `percentile` (≡ DuckDB quantile_cont)
    for oracle parity; `approx_percentile` with the same call shape is
    the documented 100 TB switch (error contract pinned in
    test_operators). One orderkey join, one 5-group aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_orderpriority").alias("priority"), delay.alias("__d"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.expr("percentile(__d, 0.5)"), 4).alias("p50_days"),
            F.round(F.expr("percentile(__d, 0.9)"), 4).alias("p90_days"),
            F.round(F.expr("percentile(__d, 0.99)"), 4).alias("p99_days"),
        )
    )


@register(
    "supplier_late_rate_wilson",
    oracle="""
WITH per AS (
    SELECT l.l_suppkey AS s_suppkey,
           count(*) AS n_lines,
           count(*) FILTER (date_diff('day', CAST(o.o_orderdate AS DATE),
                                      CAST(l.l_shipdate AS DATE)) > 90) AS n_late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
),
scored AS (
    SELECT s_suppkey, CAST(n_lines AS BIGINT) AS n_lines, CAST(n_late AS BIGINT) AS n_late,
           round(n_late / n_lines, 6) AS late_rate,
           round((n_late / n_lines + 1.9208 / n_lines
                  - 1.96 * sqrt((n_late / n_lines) * (1 - n_late / n_lines) / n_lines
                                + 0.9604 / (n_lines * n_lines)))
                 / (1 + 3.8416 / n_lines), 6) AS wilson_lower
    FROM per
)
SELECT * FROM scored WHERE wilson_lower > 0.3
""",
)
def q_supplier_late_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose late-shipment rate is significantly high: the
    95% Wilson score LOWER bound on the per-supplier late rate must
    clear the threshold — the small-sample-safe ranking (a 2/2-late
    supplier doesn't outrank a 180/200 one, which a raw rate does
    wrong). Pure column arithmetic over the per-supplier aggregate;
    identical IEEE formula replayed by the oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90
    ).cast("int")
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(late).cast("long").alias("n_late"),
        )
    )
    n = F.col("n_lines").cast("double")
    p = F.col("n_late") / n
    z2 = 1.9208  # z²/2 for z=1.96
    wilson = (
        p + F.lit(z2) / n
        - F.lit(1.96) * F.sqrt(p * (1 - p) / n + F.lit(0.9604) / (n * n))
    ) / (1 + F.lit(3.8416) / n)
    scored = per.select(
        "s_suppkey",
        "n_lines",
        "n_late",
        F.round(p, 6).alias("late_rate"),
        F.round(wilson, 6).alias("wilson_lower"),
    )
    return scored.filter(F.col("wilson_lower") > 0.3)


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
    "embedding_dim_stats",
    oracle="""
WITH d AS (
    SELECT CAST(i - 1 AS INT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
    FROM embeddings JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(embedding)
)
SELECT dim,
       round(avg(CAST(x AS DOUBLE)), 6) AS mean,
       round(stddev_samp(CAST(x AS DOUBLE)), 6) AS std,
       round(min(CAST(x AS DOUBLE)), 6) AS min_x,
       round(max(CAST(x AS DOUBLE)), 6) AS max_x
FROM d GROUP BY 1
""",
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile (mean/std/min/max across
    the corpus) — the dashboard that exposes collapsed dimensions
    (std≈0), mean drift, and clipping before they poison similarity
    search. (A norm-z-score outlier screen was tried first and is
    degenerate on this corpus: the vectors are unit-normalized, so
    norm variance is exactly zero — dimension-level stats are the
    screen that still carries signal.) One posexplode + one
    64-group aggregation; at 100 TB the explode is map-side and the
    aggregate is dimension-bounded."""
    emb = _emb(spark, sf_dir)
    x = F.col("x").cast("double")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(x), 6).alias("mean"),
            F.round(F.stddev_samp(x), 6).alias("std"),
            F.round(F.min(x), 6).alias("min_x"),
            F.round(F.max(x), 6).alias("max_x"),
        )
    )


@register(
    "monthly_revenue_seasonality",
    oracle="""
WITH m AS (
    SELECT CAST(month(o_orderdate) AS INT) AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
)
SELECT month, cents / 100.0 AS revenue,
       cents / CAST(sum(cents) OVER () AS BIGINT) AS share_of_year
FROM m
""",
)
def q_monthly_revenue_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue seasonality with percent-of-total share —
    exact integer cents, and the total comes from an unordered
    whole-frame window over the 12-row aggregate (never a second scan
    of orders; same shape as nation_revenue_share_in_region)."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.month("o_orderdate").cast("int").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy()
    return m.select(
        "month",
        (F.col("cents") / 100.0).alias("revenue"),
        (F.col("cents") / F.sum("cents").over(w)).alias("share_of_year"),
    )


@register(
    "user_inactivity_gaps",
    oracle="""
WITH gaps AS (
    SELECT user_id,
           date_diff('day', CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DATE),
                     CAST(ts AS DATE)) AS gap_days
    FROM events
)
SELECT user_id,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       CAST(count(*) FILTER (gap_days >= 3) AS BIGINT) AS n_gaps_3d
FROM gaps WHERE gap_days IS NOT NULL GROUP BY user_id
""",
)
def q_user_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inactivity profile: longest gap between consecutive
    events (calendar days) and the count of ≥3-day gaps — the churn-risk
    feature the growth-accounting view aggregates away. One lag window
    per user, one aggregation on the same partitioning (no extra
    shuffle)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.to_date(F.lag("ts").over(w))
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.max("gap_days").cast("long").alias("max_gap_days"),
        F.sum((F.col("gap_days") >= 3).cast("int")).cast("long").alias("n_gaps_3d"),
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
    "order_size_distribution",
    oracle="""
WITH per AS (
    SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_orders
FROM per GROUP BY n_lines
""",
)
def q_order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order count-of-counts — the basket-size profile that
    bounds every per-order explode in this engine (basket pairing,
    PageRank edge generation are Σ basket² shapes; this query is the
    evidence the bound is small). Two aggregations, the second over
    the handful of distinct sizes."""
    per = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return per.groupBy(F.col("n_lines").cast("long").alias("n_lines")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@register(
    "source_mixture_summary",
    oracle=f"""
WITH per AS (
    SELECT source,
           count(*) AS n_docs,
           sum(len(string_split({_NORM}, ' '))) AS n_tokens,
           sum(n_chars) AS n_chars
    FROM documents GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       n_tokens / CAST(sum(n_tokens) OVER () AS BIGINT) AS token_share
FROM per
""",
)
def q_source_mixture_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture table every data recipe starts from: per source, doc
    and token totals plus each source's share of corpus tokens (the
    number the mixture_sample epoch weights are chosen against). Token
    counts are the whitespace tokenizer's (functions/text.token_count);
    the share divides integer token sums via one unordered whole-frame
    window over the per-source aggregate."""
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    w = Window.partitionBy()
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_tokens") / F.sum("n_tokens").over(w)).alias("token_share"),
    )


# ---------------------------------------------------------------------------
# Round 3 additions: per-source reservoir cap + stream-stream interval join
# ---------------------------------------------------------------------------


@register(
    "reservoir_sample_per_source",
    oracle="""
SELECT source, doc_id, CAST(rn AS INT) AS sample_rank FROM (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 50
""",
)
def q_reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: a deterministic hash-ranked 'reservoir'
    keeps at most 50 docs per source — the standard per-domain/crawl cap
    in training-data recipes, as a WindowGroupLimit plan that prunes
    map-side before the shuffle (operators/sampling.py:
    hash_reservoir_per_key)."""
    from covid_data_challenge_spark.operators.sampling import hash_reservoir_per_key

    docs = _docs(spark, sf_dir)
    return hash_reservoir_per_key(docs, key_col="source", id_col="doc_id", n=50).select(
        "source", "doc_id", "sample_rank"
    )



from covid_data_challenge_spark.operators.sampling import md5_unit_fraction_sql  # noqa: E402


@register(
    "quality_weighted_sample",
    oracle=f"""
WITH q AS (
    SELECT d.doc_id, d.source, s.quality
    FROM documents d JOIN ({_QUALITY_SQL}) s USING (doc_id)
)
SELECT doc_id, source, quality FROM q
WHERE {md5_unit_fraction_sql('doc_id')} < quality
""",
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality filtering (FineWeb/DataComp-style): each doc survives
    with probability equal to its quality score, decided by a
    deterministic md5 unit-fraction draw - thins mid-quality docs
    proportionally instead of cliff-dropping them at a threshold
    (operators/sampling.py:weighted_sample). Map-side only."""
    from covid_data_challenge_spark.functions.text import quality_score
    from covid_data_challenge_spark.operators.sampling import weighted_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", quality_score(F.col("text")).alias("quality")
    )
    return weighted_sample(docs, key_col="doc_id", weight_col="quality")


@register(
    "hard_negatives_topk",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 50 = 0),
sims AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neg_label,
           {_dd_cos('q.embedding', 'c.embedding')} AS sim
    FROM q JOIN embeddings c
      ON c.label <> q.label AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, neg_label, round(sim, 4) AS cosine_sim,
       CAST(rank AS INT) AS rank
FROM (
    SELECT query_id, neighbor_id, neg_label, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM sims
) WHERE rank <= 5
""",
)
def q_hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query embedding, the 5 most
    similar vectors with a DIFFERENT label (operators/similarity.py:
    hard_negatives_topk) — the negatives-selection stage for training
    retrieval/embedding models."""
    from covid_data_challenge_spark.operators.similarity import hard_negatives_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return hard_negatives_topk(emb, queries, k=5)


@register(
    "value_quantile_sketch",
    oracle="""
WITH grid AS (
    SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bin, cnt,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS total
    FROM grid
),
qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
hit AS (
    SELECT event_type, q, bin, cnt, cum, total,
           row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
    FROM cum CROSS JOIN qs
    WHERE cum >= q * total
)
SELECT event_type, q,
       round(bin * 5.0 + 5.0 * (q * total - (cum - cnt)) / cnt, 4) AS est
FROM hit WHERE rn = 1
""",
)
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile sketch (p50/p95/p99 of event value
    per type): the third sketch next to HLL-distinct and count-min —
    per-(group, bin) counts merge by addition across days/partitions/
    clusters, and the interpolated estimates replay bit-exactly in
    DuckDB because the grid is fixed, not adaptive
    (operators/sketch.py:quantile_sketch_build/estimate)."""
    from covid_data_challenge_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    events = _events(spark, sf_dir)
    grid = quantile_sketch_build(events, "event_type", "value", bin_width=5.0)
    return quantile_sketch_estimate(
        grid, "event_type", quantiles=[0.5, 0.95, 0.99], bin_width=5.0
    )


@register(
    "token_gini_by_source",
    oracle=f"""
WITH per AS (
    SELECT source, doc_id,
           CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS x
    FROM documents
),
ranked AS (
    SELECT source, x,
           row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS i
    FROM per
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(x) AS BIGINT) AS n_tokens,
       round((2.0 * sum(i * x) - (count(*) + 1) * sum(x))
             / (count(*) * sum(x)), 6) AS gini
FROM ranked GROUP BY source
""",
)
def q_token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus balance metric: the Gini coefficient of per-document token
    counts within each source (0 = every doc the same length, →1 = a few
    giant docs hold all the tokens) — the length-concentration check run
    before choosing chunking/packing parameters for a source. The rank
    formula ``(2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)`` stays in exact integer
    arithmetic until the final division (bit-exact across engines); the
    per-source window parallelizes across sources and the totals are one
    map-side-combined aggregation."""
    docs = _docs(spark, sf_dir)
    per = docs.select(
        "source", "doc_id", token_count(F.col("text")).cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = per.withColumn("i", F.row_number().over(w))
    n, s = F.count(F.lit(1)), F.sum("x")
    return ranked.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        s.cast("long").alias("n_tokens"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x")) - (n + 1) * s) / (n * s), 6
        ).alias("gini"),
    )


@register(
    "bpe_first_merge_candidates",
    oracle=f"""
WITH words AS (
    SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
),
pairs AS (
    SELECT substr(w, i, 2) AS pair
    FROM words JOIN (SELECT CAST(unnest(range(1, 1000)) AS INT) AS i) idx
        ON i <= len(w) - 1
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""",
)
def q_bpe_first_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, step one: the top-20 adjacent character pairs
    by corpus frequency — exactly the counts the first BPE merge is
    chosen from (each further merge re-runs the same shape on the merged
    vocabulary). Map-side position explode, one aggregation on a tiny
    key space (≤ alphabet²), TakeOrderedAndProject top-k: counting pairs
    over 100 TB of text is a scan plus a kilobyte-scale shuffle."""
    docs = _docs(spark, sf_dir)
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(0))),
                lambda i: F.substring(F.col("w"), i, 2),
            )
        ).alias("pair")
    ).filter(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@register(
    "corpus_prep_recipe",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, source,
           len(string_split({_NORM}, ' ')) AS n_tok,
           len(regexp_extract_all(lower(text), '{_LANG_SQL_HITS["en"]}')) AS h_en,
           (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')))
               / greatest(len(text), 1) AS punct,
           md5({_NORM}) AS f
    FROM documents
),
quality AS (
    SELECT doc_id, source, f,
           round((least(n_tok / 100.0, 1.0)
                + least(h_en / greatest(n_tok, 1) * 5.0, 1.0)
                + (1.0 - least(punct * 10.0, 1.0))) / 3.0, 4) AS quality
    FROM scored
),
soft AS (
    SELECT * FROM quality WHERE {md5_unit_fraction_sql('doc_id')} < quality
),
keep AS (SELECT f, min(doc_id) AS doc_id FROM soft GROUP BY f),
deduped AS (SELECT s.doc_id, s.source, s.quality FROM soft s JOIN keep USING (doc_id)),
capped AS (
    SELECT doc_id, source, quality,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM deduped
)
SELECT doc_id, source, quality, CAST(rn AS INT) AS sample_rank
FROM capped WHERE rn <= 100
""",
)
def q_corpus_prep_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep recipe composed end to end — what a user of
    this engine actually runs before training: quality scoring → SOFT
    quality sampling (survival probability = score) → exact dedup with
    deterministic survivor → per-source reservoir cap. Three shuffles
    total at any scale (dedup groupBy, dedup semi-join, per-source
    window) on top of one scan; every stage is the registered operator,
    and the oracle chains the same four stages in SQL — the composition
    itself is hash-checked, not just the parts."""
    from covid_data_challenge_spark.functions.text import quality_score
    from covid_data_challenge_spark.operators.sampling import (
        hash_reservoir_per_key,
        weighted_sample,
    )

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id", "source", "text", quality_score(F.col("text")).alias("quality")
    )
    soft = weighted_sample(scored, key_col="doc_id", weight_col="quality")
    deduped = dedup_exact_keep_first(soft)
    capped = hash_reservoir_per_key(deduped, key_col="source", id_col="doc_id", n=100)
    return capped.select("doc_id", "source", "quality", "sample_rank")


# ---------------------------------------------------------------------------
# round 3 late wave: remaining TPC-H query shapes + passage-level corpus ops
# ---------------------------------------------------------------------------


@register(
    "returned_order_priority_counts",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1
""",
)
def q_returned_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority in 1996-Q1 that had at least one returned line
    (TPC-H Q4 shape; the reference data lacks commit/receipt dates, so the
    per-line EXISTS predicate is the return flag). The EXISTS is a LEFT
    SEMI join between two filtered fact scans — the quarter predicate
    pushes into the orders scan, the flag predicate into the lineitem
    scan, and the semi join shuffles only (orderkey) pairs of the two
    slices; the build side never materializes duplicate matches."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "bilateral_trade_volume",
    oracle="""
WITH sales AS (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS ship_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
     OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
)
SELECT supp_nation, cust_nation, ship_year,
       CAST(sum(cents) AS BIGINT) / 10000.0 AS volume
FROM sales GROUP BY 1, 2, 3
""",
)
def q_bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipped revenue between two nations, both directions, by ship year
    (TPC-H Q7 shape). The two 1-row nation slices broadcast into the
    supplier/customer dims FIRST, so both fact arms shrink to the two
    nations' ~8% before the only guaranteed shuffle (orderkey); the
    OR-pair predicate then runs on two tiny joined columns. Revenue sums
    as exact integer cents — bit-identical in any partitioning."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = ["NATION_1", "NATION_2"]
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    sup2 = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust2 = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    sales = (
        li.join(F.broadcast(sup2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust2, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return sales.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg((F.sum(_rev_cents4()) / 10000.0).alias("volume"))


@register(
    "major_value_parts",
    oracle="""
WITH vals AS (
  SELECT l.l_partkey AS part_key,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS part_c
  FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                WHERE s.s_suppkey = l.l_suppkey AND n.n_name = 'NATION_3')
  GROUP BY 1
),
tot AS (SELECT CAST(sum(part_c) AS BIGINT) AS total_c FROM vals)
SELECT part_key, part_c / 10000.0 AS value
FROM vals, tot
WHERE part_c * 1000 > total_c
""",
)
def q_major_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose NATION_3-supplied revenue exceeds 0.1% of that
    nation's total (TPC-H Q11 shape: a grouped aggregate HAVING against
    a global scalar over the SAME aggregate). The nation slice reaches
    lineitem as a broadcast semi join before the per-part shuffle; the
    global total is a second pass over the small per-part aggregate
    (not the fact table), shipped back as a 1-row broadcast; and the
    threshold compares exact integer cents — no float epsilon at the
    cut line in either engine."""
    n3 = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup3 = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(sup3), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    vals = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(_rev_cents4()).alias("part_c")
    )
    tot = vals.agg(F.sum("part_c").alias("total_c"))
    return (
        vals.join(F.broadcast(tot))
        .filter(F.col("part_c") * 1000 > F.col("total_c"))
        .select("part_key", (F.col("part_c") / 10000.0).alias("value"))
    )


@register(
    "heavy_promo_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    AND EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey AND p.p_type = 'PROMO')
  GROUP BY 1
  HAVING sum(CAST(round(l.l_quantity * 100) AS BIGINT)) > 30000
)
""",
)
def q_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 300 units of PROMO-type parts in
    1997 (TPC-H Q20 shape: a semi join against an aggregated, itself
    semi-joined, subquery — the candidate-supplier screen for a
    promotion). Both inner predicates push to their scans, the part
    slice reaches lineitem as a broadcast semi join BEFORE the per-
    supplier shuffle, and the outer supplier probe is a broadcast semi
    join against the tiny qualifying-keys aggregate. Quantities sum as
    exact integer centi-units."""
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li97 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    heavy = (
        li97.groupBy("l_suppkey")
        .agg(F.sum(qty_c).alias("qty_c"))
        .filter(F.col("qty_c") > 30000)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
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
    "temperature_mixture_weights",
    oracle=f"""
WITH per_source AS (
  SELECT source, CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM per_source),
shares AS (
  SELECT source, tokens,
         CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 1e9)
              AS BIGINT) AS w_units
  FROM per_source, tot
)
SELECT source, tokens, share,
       CAST(w_units AS DOUBLE) / CAST(sum(w_units) OVER () AS DOUBLE) AS weight,
       (CAST(w_units AS DOUBLE) / CAST(sum(w_units) OVER () AS DOUBLE)) / share
         AS effective_epochs
FROM shares
""",
)
def q_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (the mT5/XLM-R α=0.5
    up-sampling rule): sampling weight ∝ share^α over per-source token
    counts, plus the effective-epochs multiplier each source gets.
    α is fixed at 0.5 because sqrt is IEEE-correctly-rounded on every
    engine (pow(x, 0.7) is libm-dependent and would break the hash);
    per-row weights quantize to integer 1e-9 units before the
    normalizing sum so the result is bit-identical under any summation
    order. One scan + one tiny aggregate; the whole-frame window runs
    over #sources rows, never the corpus."""
    return _temperature_epochs(_docs(spark, sf_dir)).select(
        "source", "tokens", "share", "weight", "effective_epochs"
    )


def _temperature_epochs(docs: DataFrame) -> DataFrame:
    """(source, tokens, share, weight, effective_epochs) — the α=0.5
    temperature recipe shared by temperature_mixture_weights (reports
    it) and temperature_resampled_corpus (samples by it); one shared
    implementation so the reported weights can never diverge from the
    weights the resampler actually applies."""
    per_source = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text")).cast("long")).alias("tokens")
    )
    tot = per_source.agg(F.sum("tokens").alias("total_tokens"))
    share = F.col("tokens").cast("double") / F.col("total_tokens").cast("double")
    shares = per_source.join(F.broadcast(tot)).select(
        "source",
        "tokens",
        share.alias("share"),
        F.floor(F.sqrt(share) * F.lit(1e9)).cast("long").alias("w_units"),
    )
    w_all = Window.partitionBy()
    weight = F.col("w_units").cast("double") / F.sum("w_units").over(w_all).cast("double")
    return shares.select(
        "source",
        "tokens",
        "share",
        weight.alias("weight"),
        (weight / F.col("share")).alias("effective_epochs"),
    )


@register(
    "observed_quality_report",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_discount_lines,
       CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS negative_qty_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         / 10000.0 AS revenue
FROM lineitem
WHERE l_returnflag <> 'R'
""",
)
def q_observed_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass piggybacked DQ metrics via ``df.observe``: the counters
    ride the SAME job that materializes the kept-lines output (a noop
    sink here, the real gold write in production) — row count, rule
    violations, and exact-cents revenue appear as a side effect of the
    action, with NO second scan of the fact table. This is the Spark-
    native replacement for the reference's separate quality pass
    (data_cleaner.py:99-151) at 100 TB: profiling a table you were
    writing anyway costs zero extra I/O
    (operators/profiling.py:observe_quality shows the general form)."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") != "R")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("long")
        .alias("high_discount_lines"),
        F.sum(F.when(F.col("l_quantity") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_qty_lines"),
        (F.sum(_rev_cents4()) / 10000.0).alias("revenue"),
    )
    # the action the caller was running anyway (gold write stand-in)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["high_discount_lines"],
                m["negative_qty_lines"],
                m["revenue"],
            )
        ],
        "n_rows long, high_discount_lines long, negative_qty_lines long, revenue double",
    )


@register(
    "bpe_second_merge_candidates",
    oracle=f"""
WITH words AS (
    SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
),
pairs1 AS (
    SELECT substr(w, i, 2) AS pair
    FROM words JOIN (SELECT CAST(unnest(range(1, 1000)) AS INT) AS i) idx
        ON i <= len(w) - 1
),
win AS (
    SELECT pair FROM pairs1 GROUP BY pair
    ORDER BY count(*) DESC, pair LIMIT 1
),
merged AS (
    SELECT replace(w, win.pair, chr(1)) AS w2, win.pair AS wp
    FROM words, win
),
pairs2 AS (
    SELECT replace(substr(w2, i, 1), chr(1), wp)
             || replace(substr(w2, i + 1, 1), chr(1), wp) AS pair
    FROM merged JOIN (SELECT CAST(unnest(range(1, 1000)) AS INT) AS i) idx
        ON i <= len(w2) - 1
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM pairs2 GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""",
)
def q_bpe_second_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, step two: apply the winning first merge and
    recount adjacent-symbol pairs — one full BPE iteration, entirely as
    a DataFrame plan. The winning pair is chosen by a 1-row
    TakeOrderedAndProject and threaded into the corpus rewrite as a
    BROADCAST scalar feeding a column-argument ``replace`` (plain
    string replace is greedy leftmost non-overlapping — exactly BPE's
    merge order), so the iteration has NO driver round-trip: at 100 TB
    each merge step is scan → kilobyte shuffle → scan, and successive
    steps chain the same shape. Merged symbols travel as a reserved
    \\x01 byte and are expanded back for the output counts."""
    docs = _docs(spark, sf_dir)
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    pairs1 = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(0))),
                lambda i: F.substring(F.col("w"), i, 2),
            )
        ).alias("pair")
    ).filter(F.length("pair") == 2)
    win = (
        pairs1.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("wp"))
    )
    sep = "\x01"
    merged = words.join(F.broadcast(win)).select(
        F.replace(F.col("w"), F.col("wp"), F.lit(sep)).alias("w2"), "wp"
    )
    sym = lambda c: F.replace(c, F.lit(sep), F.col("wp"))  # noqa: E731
    pairs2 = merged.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("w2") - 1, F.lit(0))),
                # sequence(1, 0) descends for 1-char words — the i >= 1
                # guard drops the spurious i=0 slot (substring treats
                # pos 0 as 1 and would double-count the first char)
                lambda i: F.when(
                    (i >= F.lit(1)) & (i < F.length("w2")),
                    F.concat(
                        sym(F.substring(F.col("w2"), i, 1)),
                        sym(F.substring(F.col("w2"), i + F.lit(1), 1)),
                    ),
                ),
            )
        ).alias("pair")
    ).filter(F.col("pair").isNotNull())
    return (
        pairs2.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@register(
    "bigram_lm_score",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
bg AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 1
),
lm_bg AS (SELECT bg, count(*) AS c_ab FROM bg GROUP BY bg),
lm_pre AS (
    SELECT split_part(bg, ' ', 1) AS pre, CAST(sum(c_ab) AS BIGINT) AS c_a
    FROM lm_bg GROUP BY 1
),
vocab AS (
    SELECT CAST(count(*) AS BIGINT) AS v FROM lm_pre
),
scored AS (
    SELECT b.doc_id,
           CAST(floor(1e9 * (CAST(l.c_ab AS DOUBLE) + 1.0)
                      / (CAST(p.c_a AS DOUBLE) + CAST(vocab.v AS DOUBLE)))
                AS BIGINT) AS p_units
    FROM bg b
    JOIN lm_bg l ON b.bg = l.bg
    JOIN lm_pre p ON split_part(b.bg, ' ', 1) = p.pre
    CROSS JOIN vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(p_units) AS BIGINT)
         / (CAST(count(*) AS DOUBLE) * 1e9) AS lm_score
FROM scored GROUP BY doc_id
""",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus bigram language-model fluency score (the CCNet
    perplexity-filter shape, arXiv:1911.00359, self-trained so no
    external model is needed): train add-one-smoothed bigram
    probabilities p(b|a) = (C(ab)+1)/(C(a·)+V) over the whole corpus in
    two aggregations, then score each document by its mean bigram
    probability. The smoothing is load-bearing for the semantics:
    under raw MLE a doc of unique gibberish tokens scores a perfect
    1.0 (C(ab)=C(a)=1), whereas add-one sends singleton bigrams to
    ≈2/V — so unusual-for-the-corpus text scores LOW, formulaic text
    high, the complement of repetition_score for quality filtering.

    Hash-exactness across engines: each probability quantizes to
    integer 1e-9 units BEFORE the per-doc sum (exact integer addition
    in any order), and the final mean is one IEEE division — no libm
    log() whose last ulp differs per engine. Scale shape: the LM is
    |distinct bigrams| rows built by map-side-combined aggs; V is a
    1-row broadcast; scoring is one shuffle join of exploded
    doc-bigrams against the LM on the bigram key (never
    broadcast-dependent), then a per-doc re-agg. The LM is a
    build-once/serve-many gold table (operators/lm.py — persisted
    parquet scores future batches identically; roundtrip pinned in
    pytest). Because this self-trained query probes the very corpus it
    trains on, the exploded (doc, bigram) frame is checkpointed ONCE
    and shared by the build and probe stages — tokenization and the
    explode run one time, so probe cost no longer re-scans the grown
    bigram stream (the r3 sf1 tier's 3.2× growth, now linear-shared)."""
    from covid_data_challenge_spark.operators.lm import (
        bigram_lm_build,
        bigram_lm_score_with,
        doc_bigrams,
    )

    docs = _docs(spark, sf_dir)
    bg = doc_bigrams(docs).localCheckpoint(eager=True)
    return bigram_lm_score_with(docs, bigram_lm_build(docs, bigrams=bg), bigrams=bg)


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


@register(
    "corpus_prep_recipe_v2",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
pass AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(w[(i * 16 + 1):(i * 16 + 16)], ' ') AS passage
  FROM toks JOIN (SELECT unnest(range(0, 100000)) AS i) idx ON i * 16 < len(w)
),
keyed AS (SELECT doc_id, pos, passage, md5(passage) AS h FROM pass),
hot AS (SELECT h FROM keyed GROUP BY h HAVING count(DISTINCT doc_id) > 4),
clean AS (
  SELECT k.doc_id, string_agg(k.passage, ' ' ORDER BY k.pos) AS ct
  FROM keyed k WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.h = k.h)
  GROUP BY k.doc_id
),
q AS (
  SELECT doc_id, ct,
         len(string_split(ct, ' ')) AS n_tok,
         len(regexp_extract_all(ct, '{_LANG_SQL_HITS["en"]}')) AS h_en,
         (len(ct) - len(regexp_replace(ct, '[.,;:!?]', '', 'g')))
             / greatest(len(ct), 1) AS punct
  FROM clean
),
scored AS (
  SELECT doc_id, ct, CAST(n_tok AS INT) AS n_tokens_clean,
         round((least(n_tok / 100.0, 1.0)
              + least(h_en / greatest(n_tok, 1) * 5.0, 1.0)
              + (1.0 - least(punct * 10.0, 1.0))) / 3.0, 4) AS quality
  FROM q
),
gated AS (SELECT * FROM scored WHERE quality >= 0.3),
dd AS (
  SELECT doc_id, n_tokens_clean, quality,
         row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(ct), '\\s+', ' ', 'g')))
             ORDER BY doc_id
         ) AS rn
  FROM gated
)
SELECT doc_id, n_tokens_clean, quality FROM dd WHERE rn = 1
""",
)
def q_corpus_prep_recipe_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-prep recipe, round-3 edition — the web-scale cleaning
    chain (RefinedWeb/CCNet order): boilerplate passage strip → quality
    gate on the CLEANED text → exact dedup with deterministic survivor.
    Each stage is the registered operator; the whole composition is
    hash-checked end to end, as with corpus_prep_recipe (which stays
    pinned as the v1 sampling-centric chain). Shuffle budget: passage
    df-count, doc reassembly, dedup groupBy + semi join — all keyed
    shuffles, no O(n²) stage, broadcast only for the tiny hot-passage
    set."""
    from covid_data_challenge_spark.operators.dedup import (
        boilerplate_passage_strip,
        dedup_exact_keep_first,
    )

    clean = boilerplate_passage_strip(_docs(spark, sf_dir), max_df=4)
    scored = clean.select(
        "doc_id",
        F.col("clean_text"),
        token_count(F.col("clean_text")).alias("n_tokens_clean"),
        quality_score(F.col("clean_text")).alias("quality"),
    )
    gated = scored.filter(F.col("quality") >= 0.3)
    deduped = dedup_exact_keep_first(gated, text_col="clean_text")
    return deduped.select("doc_id", "n_tokens_clean", "quality")


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
    "temperature_resampled_corpus",
    oracle=f"""
WITH per_source AS (
  SELECT source, CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM per_source),
shares AS (
  SELECT source,
         CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 1e9)
              AS BIGINT) AS w_units
  FROM per_source, tot
),
epochs AS (
  SELECT source,
         (CAST(w_units AS DOUBLE) / CAST(sum(w_units) OVER () AS DOUBLE)) / share
           AS e
  FROM shares
),
counted AS (
  SELECT d.doc_id, d.source,
         CAST(floor(ep.e) AS INT)
           + CASE WHEN {md5_unit_fraction_sql('d.doc_id')} < ep.e - floor(ep.e)
                  THEN 1 ELSE 0 END AS copies
  FROM documents d JOIN epochs ep ON d.source = ep.source
)
SELECT doc_id, source,
       CAST(unnest(generate_series(0, copies - 1)) AS INT) AS copy_idx
FROM counted WHERE copies > 0
""",
)
def q_temperature_resampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature loop CLOSED: the α=0.5 mixture weights computed
    from the corpus (temperature_mixture_weights) drive the actual
    resampling — each doc emits ⌊e⌋ + (md5-coin < frac(e)) copies where
    e is its source's effective-epochs multiplier, so under-represented
    sources upsample and over-represented ones thin, deterministically.
    Data-dependent weights flow through a broadcast join (no literal
    recipe baked into the plan); the whole two-stage computation — weight
    derivation AND per-row sampling — hash-checks end to end
    (operators/sampling.py:mixture_sample_dynamic)."""
    from covid_data_challenge_spark.operators.sampling import mixture_sample_dynamic

    docs = _docs(spark, sf_dir)
    epochs = _temperature_epochs(docs).select("source", "effective_epochs")
    out = mixture_sample_dynamic(
        docs.select("doc_id", "source"), "doc_id", "source", epochs
    )
    return out.select("doc_id", "source", "copy_idx")


@register(
    "monthly_users_from_daily_sketches",
    oracle="""
SELECT strftime(ts, '%Y-%m') AS month,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days_merged,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
FROM events GROUP BY 1
""",
)
def q_monthly_users_from_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch RE-AGGREGATION pattern end to end: per-day HLL
    sketches of user_id union into monthly distinct counts WITHOUT
    re-scanning the facts — at 100 TB you persist the tiny per-day
    sketch table once and answer any date-range distinct query by
    merging sketches (count(DISTINCT) would need the raw keys at every
    grain). Sparse-mode exactness at test cardinality (150 users ≪
    2^14/2) makes the estimate equal the exact count, so the merge
    chain itself — sketch → union → estimate — is hash-checked
    (operators/sketch.py)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    return daily.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment near-dup, BM25 retrieval, per-source n-gram novelty
# ---------------------------------------------------------------------------


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


_BM25_TERMS = ("spark", "vector", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "bm25_topk",
    oracle=f"""
WITH docs AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
dl AS (SELECT doc_id, len(w) AS dl FROM docs),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(w) AS term FROM docs)
    WHERE term IN ('spark', 'vector', 'stream')
    GROUP BY 1, 2
),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id,
           sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ({_BM25_K1} + 1)
               / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
           ) AS s
    FROM tf
    JOIN dfq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY 1
)
SELECT doc_id, round(s, 6) AS bm25
FROM scored ORDER BY round(s, 6) DESC, doc_id LIMIT 10
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 (Okapi, k1=1.2 b=0.75) for a fixed
    3-term query — the retrieval scorer a RAG/data-curation stack runs
    over the inverted index. Plan: tokenize once (doc length rides the
    explode map-side, so the corpus-sized dl table is never joined),
    filter to the query terms BEFORE the tf aggregation (the shuffle
    carries only matching postings — at 100 TB that is |postings(q)|,
    not the corpus), then broadcast the |q|-row df table and the 1-row
    corpus stats; TakeOrderedAndProject caps the result at k. The idf
    uses the +1 'BM25+'-style floor so scores stay positive even when
    df > N/2."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("w")).alias("avgdl"),
    )
    posts = docs.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = posts.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w_td = (
        F.col("tf")
        * F.lit(k1 + 1)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * w_td), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@register(
    "ngram_novelty_by_source",
    oracle=f"""
WITH docs AS (SELECT source, string_split({_NORM}, ' ') AS w FROM documents),
sh AS (
    SELECT DISTINCT source,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s
    FROM docs JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 2
),
tagged AS (SELECT source, count(*) OVER (PARTITION BY s) AS n_src FROM sh)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       round(sum(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) / count(*), 6)
           AS novelty_ratio
FROM tagged GROUP BY source
""",
)
def q_ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus NOVELTY: the share of a source's distinct word
    3-grams that appear in no other source — the standard signal for
    'is this new crawl/source adding anything' before paying to ingest
    it at full weight. Plan: ONE corpus scan — (source, gram) distinct,
    a count window over the gram key (partition sizes are bounded by
    |sources| after the distinct, so the window cannot skew the way a
    raw-occurrence gram window would), then one map-side-combinable
    per-source aggregation. No joins at all."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "source",
        F.explode(word_shingle_expr(F.col("text"), 3)).alias("s"),
    ).distinct()
    n_src = F.count(F.lit(1)).over(Window.partitionBy("s"))
    excl = F.sum(F.when(F.col("n_src") == 1, 1).otherwise(0))
    return (
        sh.withColumn("n_src", n_src)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            excl.alias("n_exclusive"),
        )
        .select(
            "source",
            "n_shingles",
            "n_exclusive",
            F.round(F.col("n_exclusive") / F.col("n_shingles"), 6).alias(
                "novelty_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Full BPE training loop: K-merge table (operators/bpe.py)
# ---------------------------------------------------------------------------

from covid_data_challenge_spark.operators.bpe import (  # noqa: E402
    bpe_merge_oracle_sql,
    bpe_merge_table,
)

_BPE_MERGES = 4


@register("bpe_merge_table", oracle=bpe_merge_oracle_sql(_NORM, _BPE_MERGES))
def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the actual loop: 4 chained merges over
    the word-frequency dictionary, producing the ranked merge table
    that IS the tokenizer artifact. One corpus scan builds the
    vocab-sized (word, n) table; every iteration after that is
    pair-explode → tiny aggregate → 1-row TakeOrderedAndProject winner
    → broadcast greedy replace, with no driver round-trip anywhere
    (operators/bpe.py has the Sennrich-dictionary scale argument). The
    DuckDB oracle unrolls the identical loop as CTEs, so winner
    tie-breaks and sentinel expansion are hash-checked end to end."""
    return bpe_merge_table(_docs(spark, sf_dir), k=_BPE_MERGES)


# ---------------------------------------------------------------------------
# CDC MERGE (upsert/delete apply) against a gold snapshot
# ---------------------------------------------------------------------------

#: md5-prefix thresholds for the deterministic synthetic change feed:
#: ~5% deletes, ~10% updates, ~5% inserts (same hex-prefix idiom as
#: operators/splits.py — engine-portable, reproducible on any layout).
_CDC_SALT = "cdc-v1"
_CDC_DEL, _CDC_UPD, _CDC_INS = "0ccccccc", "26666666", "33333333"
_CDC_INS_OFFSET = 100_000_000


@register(
    "cdc_upsert_apply",
    oracle=f"""
WITH base AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
feed AS (
    SELECT o_orderkey, cents,
           substr(md5(CAST(o_orderkey AS VARCHAR) || '{_CDC_SALT}'), 1, 8) AS h
    FROM base
),
changes AS (
    SELECT CASE WHEN h >= '{_CDC_UPD}' THEN o_orderkey + {_CDC_INS_OFFSET}
                ELSE o_orderkey END AS o_orderkey,
           CASE WHEN h < '{_CDC_DEL}' THEN 'D'
                WHEN h < '{_CDC_UPD}' THEN 'U'
                ELSE 'I' END AS op,
           CASE WHEN h < '{_CDC_DEL}' THEN NULL
                WHEN h < '{_CDC_UPD}'
                    THEN CAST(floor((cents * 11 + 5) / 10) AS BIGINT)
                ELSE cents END AS new_cents
    FROM feed WHERE h < '{_CDC_INS}'
)
SELECT o_orderkey,
       coalesce(c.new_cents, b.cents) AS price_cents,
       CASE WHEN c.op = 'U' THEN 'updated'
            WHEN c.op = 'I' THEN 'inserted'
            ELSE 'kept' END AS action
FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
WHERE c.op IS NULL OR c.op <> 'D'
""",
)
def q_cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO without a table format: apply a change batch
    (inserts / updates / deletes) to a gold snapshot in one
    full-outer join — the lakehouse upsert Spark OSS lacks without
    Delta/Iceberg, expressed as a plan any engine can run. The change
    feed is synthesized deterministically from the snapshot itself
    (md5-prefix buckets: ~5% D / ~10% U / ~5% I, update = +10% in
    exact integer cents) so the apply is hash-checkable end to end.

    Scale shape: ONE shuffle join on the merge key — and with the
    snapshot stored bucketed on that key (sinks.write_bucketed_table)
    the base side's exchange disappears entirely, which is how a daily
    100 TB upsert stays bounded by the (much smaller) change batch.
    Deletes filter post-join; actions are emitted for audit parity with
    MERGE's matched/not-matched clauses."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    h = F.substring(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(_CDC_SALT))),
        1,
        8,
    )
    feed = base.withColumn("h", h).filter(F.col("h") < _CDC_INS)
    changes = feed.select(
        F.when(F.col("h") >= _CDC_UPD, F.col("o_orderkey") + _CDC_INS_OFFSET)
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        F.when(F.col("h") < _CDC_DEL, "D")
        .when(F.col("h") < _CDC_UPD, "U")
        .otherwise("I")
        .alias("op"),
        F.when(F.col("h") < _CDC_DEL, F.lit(None).cast("long"))
        .when(
            F.col("h") < _CDC_UPD,
            F.floor((F.col("cents") * 11 + 5) / 10).cast("long"),
        )
        .otherwise(F.col("cents"))
        .alias("new_cents"),
    )
    from covid_data_challenge_spark.operators.cdc import apply_changes

    return apply_changes(
        base, changes, "o_orderkey", "cents", "new_cents", "op"
    ).withColumnRenamed("cents", "price_cents")


# ---------------------------------------------------------------------------
# Feature hashing: text -> fixed-dim vector, no vocabulary (hashing trick)
# ---------------------------------------------------------------------------

_FH_DIMS = 16
_FH_SALT = "fh-v1"


@register(
    "doc_feature_hashing",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
bucketed AS (
    SELECT doc_id,
           CAST(
             (CAST(('0x' || substr(md5(term || '{_FH_SALT}'), 1, 8)) AS BIGINT)
              % {_FH_DIMS} + {_FH_DIMS}) % {_FH_DIMS} AS INT) AS bucket,
           count(*) AS cnt
    FROM toks GROUP BY 1, 2
),
dense AS (
    SELECT b.doc_id, d.bucket, coalesce(cnt, 0) AS cnt
    FROM (SELECT DISTINCT doc_id FROM bucketed) b
    CROSS JOIN (SELECT CAST(unnest(range(0, {_FH_DIMS})) AS INT) AS bucket) d
    LEFT JOIN bucketed USING (doc_id, bucket)
)
SELECT doc_id,
       string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY bucket) AS features
FROM dense GROUP BY doc_id
""",
)
def q_doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): tokens hash into a
    FIXED number of buckets, giving every document a dense count vector
    with no vocabulary table, no fitting, no second pass — the
    featurization that bridges the text tier into the vector tier (the
    output array feeds the cosine/LSH/IVF operators directly). Plan:
    one scan, one (doc, bucket) aggregation, then the dense vector is
    rebuilt row-locally (sequence + map lookup — no per-dimension
    explode join). md5-derived buckets make the vectors bit-identical
    across engines, so the whole featurization is hash-checked."""
    docs = _docs(spark, sf_dir)
    bucket = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("term"), F.lit(_FH_SALT))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _FH_DIMS
            + _FH_DIMS
        )
        % _FH_DIMS
    ).cast("int")
    counts = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list("cnt")
        ).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(_FH_DIMS - 1)),
        lambda b: F.coalesce(
            F.element_at(F.col("m"), b.cast("int")), F.lit(0)
        ).cast("long"),
    )
    # serialized as a comma-joined string (registry convention for
    # array outputs — the compare harness hashes scalars); the array
    # form for the ANN operators is the same `dense` expression unjoined
    return per_doc.select(
        "doc_id",
        F.array_join(
            F.transform(dense, lambda x: x.cast("string")), ","
        ).alias("features"),
    )


# ---------------------------------------------------------------------------
# DSIR importance selection (portable-ln log-ratios)
# ---------------------------------------------------------------------------

from covid_data_challenge_spark.functions.pmath import (  # noqa: E402
    portable_ln_sql_stages,
)
from covid_data_challenge_spark.operators.dsir import (  # noqa: E402
    DSIR_BUCKETS,
    DSIR_SALT,
    dsir_select,
)

#: curated-target slice for the registered query: two designated sources
_DSIR_TARGET_SOURCES = ("src0", "src1")

_DSIR_STAGE, _DSIR_FINAL = portable_ln_sql_stages(
    {
        "l1": "(ct + 1)",
        "l2": f"(nt + {DSIR_BUCKETS})",
        "l3": "(cr + 1)",
        "l4": f"(nr + {DSIR_BUCKETS})",
    }
)


@register(
    "dsir_importance_select",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source IN {_DSIR_TARGET_SOURCES} AS is_target,
           unnest(string_split({_NORM}, ' ')) AS term
    FROM documents
),
bucketed AS (
    SELECT doc_id, is_target,
           CAST(
             (CAST(('0x' || substr(md5(term || '{DSIR_SALT}'), 1, 8)) AS BIGINT)
              % {DSIR_BUCKETS} + {DSIR_BUCKETS}) % {DSIR_BUCKETS} AS INT
           ) AS bucket,
           count(*) AS cnt
    FROM toks GROUP BY 1, 2, 3
),
per_bucket AS (
    SELECT bucket,
           sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS ct,
           sum(CASE WHEN NOT is_target THEN cnt ELSE 0 END) AS cr
    FROM bucketed GROUP BY 1
),
grid AS (
    SELECT bucket, ct, cr,
           (SELECT sum(ct) FROM per_bucket) AS nt,
           (SELECT sum(cr) FROM per_bucket) AS nr
    FROM per_bucket
),
staged AS (SELECT bucket, {_DSIR_STAGE} FROM grid),
lns AS (SELECT bucket, {_DSIR_FINAL} FROM staged),
wtab AS (
    SELECT bucket,
           CAST(floor(1000000.0 * ((((l1) - (l2)) - (l3)) + (l4))) AS BIGINT)
             AS w_units
    FROM lns
),
docw AS (
    SELECT b.doc_id, b.is_target,
           sum(b.cnt) AS n_tokens,
           sum(b.cnt * w.w_units) AS w_units
    FROM bucketed b JOIN wtab w USING (bucket)
    GROUP BY 1, 2
),
raw AS (SELECT * FROM docw WHERE NOT is_target),
thr AS (SELECT quantile_cont(w_units, 0.75) AS thr FROM raw)
SELECT doc_id, n_tokens, w_units
FROM raw CROSS JOIN thr
WHERE CAST(w_units AS DOUBLE) >= thr
""",
)
def q_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (arXiv:2302.03169): score every raw document
    by its hashed-ngram log-likelihood ratio against a curated target
    slice (sources src0/src1), keep the top-quartile weights. The
    log-ratios run through functions/pmath.portable_ln — a fixed atanh
    series over correctly-rounded ops only — then integer-quantize per
    bucket, so the weights (and hence the selected set) are bit-exact
    against the DuckDB replay despite being log-space floats. Plan: one
    token-bucket aggregation (constant n_buckets=256 model, broadcast
    back), one doc-level aggregation, one global exact percentile for
    the threshold — no corpus-wide sort or window; at 100 TB the
    percentile swaps to approx_percentile."""
    docs = _docs(spark, sf_dir)
    return dsir_select(
        docs,
        is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES),
        keep_frac=0.25,
        n_buckets=DSIR_BUCKETS,
        salt=DSIR_SALT,
    )


# ---------------------------------------------------------------------------
# BPE encode: apply the trained merge table to the corpus
# ---------------------------------------------------------------------------

from covid_data_challenge_spark.operators.bpe import (  # noqa: E402
    bpe_encode_oracle_sql,
    bpe_encode_stats,
)


@register("bpe_encode_stats", oracle=bpe_encode_oracle_sql(_NORM, _BPE_MERGES))
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving half of the BPE tokenizer: train the 4-merge table
    (same loop as bpe_merge_table), then ENCODE every document by
    applying the merges in rank order — greedy leftmost replace with
    winners kept in sentinel form, so later merges can consume earlier
    ones exactly like a real BPE encoder's priority queue. Output is
    the per-doc unit count before/after and the compression ratio — the
    tokenizer-cost numbers a training pipeline budgets by. Winners are
    1-row localCheckpoint'ed broadcasts (the encode plan embeds k
    literals, not the training chain); the encode pass itself is
    map-side only: one corpus scan, one groupBy(doc_id)."""
    return bpe_encode_stats(_docs(spark, sf_dir), k=_BPE_MERGES)


# ---------------------------------------------------------------------------
# Bigram-LM NLL in real nats (portable-ln)
# ---------------------------------------------------------------------------

_NLL_STAGE, _NLL_FINAL = portable_ln_sql_stages(
    {"l_num": "num", "l_den": "den"}
)


@register(
    "bigram_lm_nll",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
bg AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 1
),
lm_bg AS (SELECT bg, count(*) AS c_ab FROM bg GROUP BY bg),
lm_pre AS (
    SELECT split_part(bg, ' ', 1) AS pre, CAST(sum(c_ab) AS BIGINT) AS c_a
    FROM lm_bg GROUP BY 1
),
vocab AS (
    SELECT CAST(count(*) AS BIGINT) AS v FROM lm_pre
),
args AS (
    SELECT b.doc_id, (l.c_ab + 1) AS num, (p.c_a + vocab.v) AS den
    FROM bg b
    JOIN lm_bg l ON b.bg = l.bg
    JOIN lm_pre p ON split_part(b.bg, ' ', 1) = p.pre
    CROSS JOIN vocab
),
staged AS (SELECT doc_id, {_NLL_STAGE} FROM args),
lns AS (SELECT doc_id, {_NLL_FINAL} FROM staged),
scored AS (
    SELECT doc_id,
           CAST(floor(1000000.0 * ((l_den) - (l_num))) AS BIGINT) AS nll_units
    FROM lns
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(nll_units) AS BIGINT)
         / (CAST(count(*) AS DOUBLE) * 1000000.0) AS nll
FROM scored GROUP BY doc_id
""",
)
def q_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet perplexity filter in its native units: per-doc mean
    negative log-likelihood in nats under the self-trained add-one
    bigram LM (ppl = exp(nll); bigram_lm_score's mean probability is
    only a monotone proxy). Log-space outputs were previously
    un-oracle-able — libm ln's last ulp differs between the JVM and C —
    so each bigram's -ln p runs through functions/pmath.portable_ln
    (correctly-rounded ops only) and quantizes to integer micro-nats
    before the order-free per-doc sum; one IEEE division closes the
    mean. Same plan shape as bigram_lm_score: vocab-sized LM aggs, one
    bigram-key shuffle join, per-doc re-agg — and like it, the exploded
    (doc, bigram) frame is checkpointed once and shared across the
    build and probe stages."""
    from covid_data_challenge_spark.operators.lm import (
        bigram_lm_build,
        bigram_lm_nll_with,
        doc_bigrams,
    )

    docs = _docs(spark, sf_dir)
    bg = doc_bigrams(docs).localCheckpoint(eager=True)
    return bigram_lm_nll_with(docs, bigram_lm_build(docs, bigrams=bg), bigrams=bg)


# ---------------------------------------------------------------------------
# Curriculum ordering (quality phases x deterministic shards)
# ---------------------------------------------------------------------------

_CURR_SHARDS, _CURR_SALT = 4, "curr-v1"


@register(
    "curriculum_order",
    oracle=f"""
WITH q AS (
    SELECT doc_id, lang, quality FROM ({_QUALITY_SQL})
),
phased AS (
    SELECT doc_id, lang,
           CAST(ntile(10) OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id
           ) AS INT) AS phase
    FROM q
),
sharded AS (
    SELECT doc_id, lang, phase,
           CAST(
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_CURR_SALT}'), 1, 8)) AS BIGINT)
              % {_CURR_SHARDS} + {_CURR_SHARDS}) % {_CURR_SHARDS} AS INT
           ) AS shard,
           md5(CAST(doc_id AS VARCHAR) || '{_CURR_SALT}') AS h
    FROM phased
)
SELECT lang, phase, shard,
       CAST(row_number() OVER (
           PARTITION BY lang, phase, shard ORDER BY h, doc_id
       ) AS INT) AS pos,
       doc_id
FROM sharded
""",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum for training: per-language quality
    deciles become phases (phase 1 = best), and each phase is shuffled
    by md5 shard-then-sort — the reader streams phases in order,
    interleaving shards, so high-quality data leads each language's
    stream while order within a phase is an unbiased deterministic
    shuffle. Scale shape: NO global ordering anywhere — the decile
    window partitions by lang, the position window by (lang, phase,
    shard); both stay parallel, same discipline as corpus_shuffle."""
    docs = _docs(spark, sf_dir)
    q = docs.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )
    wq = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_CURR_SALT)))
    shard = (
        (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CURR_SHARDS
            + _CURR_SHARDS
        )
        % _CURR_SHARDS
    ).cast("int")
    phased = q.withColumn("phase", F.ntile(10).over(wq)).select(
        "doc_id", "lang", "phase", shard.alias("shard"), h.alias("h")
    )
    wp = Window.partitionBy("lang", "phase", "shard").orderBy("h", "doc_id")
    return phased.select(
        "lang",
        "phase",
        "shard",
        F.row_number().over(wp).cast("int").alias("pos"),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# Late-arrival audit (the watermark-sizing report)
# ---------------------------------------------------------------------------

#: a row is "late" if it arrives (event_id order) more than this many
#: seconds behind the newest event time already seen for its user
_LATE_THRESHOLD_S = 300


@register(
    "events_late_arrival_report",
    oracle=f"""
WITH arr AS (
    SELECT event_type,
           max(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) - epoch_us(ts) AS behind_us
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN behind_us > {_LATE_THRESHOLD_S} * 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN behind_us > {_LATE_THRESHOLD_S} * 1000000 THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS late_rate,
       CAST(max(greatest(behind_us, 0)) AS BIGINT) AS max_behind_us
FROM arr GROUP BY event_type
""",
)
def q_events_late_arrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-data audit — the report that SIZES a streaming
    watermark: treating event_id as ingestion order, how far behind the
    newest already-seen event time (per user) does each row arrive, and
    what fraction would a 5-minute watermark drop? Per-user running max
    keeps the window partitioned (no global arrival ordering at scale —
    per-key disorder is what bounds per-key state); lateness stays in
    exact integer microseconds. Feeds directly into the
    withWatermark(...) delay chosen by the events_*_stream queries."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    behind = (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
        "behind_us"
    )
    late = F.col("behind_us") > F.lit(_LATE_THRESHOLD_S * 1_000_000)
    return (
        ev.select("event_type", behind)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
            (
                F.sum(F.when(late, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("late_rate"),
            F.max(F.greatest(F.col("behind_us"), F.lit(0))).alias("max_behind_us"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence vs the corpus (portable-ln)
# ---------------------------------------------------------------------------

_KL_STAGE, _KL_FINAL = portable_ln_sql_stages(
    {"l_cnt": "cnt", "l_ns": "ns", "l_ct": "ct", "l_n": "n"}
)


@register(
    "source_kl_divergence",
    oracle=f"""
WITH toks AS (
    SELECT source, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2),
ct AS (SELECT term, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY 1),
ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ns FROM st GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
args AS (
    SELECT st.source, st.cnt, ns.ns, ct.ct, n.n
    FROM st JOIN ct USING (term) JOIN ns USING (source) CROSS JOIN n
),
staged AS (SELECT source, cnt, ns, {_KL_STAGE} FROM args),
lns AS (SELECT source, cnt, ns, {_KL_FINAL} FROM staged),
units AS (
    SELECT source, ns,
           CAST(floor(1000000000.0 *
                ((CAST(cnt AS DOUBLE) / CAST(ns AS DOUBLE))
                 * ((((l_cnt) - (l_ns)) - (l_ct)) + (l_n)))) AS BIGINT)
             AS u
    FROM lns
)
SELECT source,
       CAST(max(ns) AS BIGINT) AS n_tokens,
       CAST(sum(u) AS BIGINT) / 1000000000.0 AS kl_nats
FROM units GROUP BY source
""",
)
def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-balance diagnostics in information units: KL(source ||
    corpus) over token distributions — how far each source's language
    deviates from the mixture, the principled upgrade of the count-share
    mixture tables (a source can match the corpus token SHARE while
    diverging wildly in CONTENT). Per-term contributions
    (p_s · ln(p_s/p_c)) run through portable-ln and quantize to integer
    nano-nats before the per-source sum, so the log-space result is
    hash-exact. Plan: token-level aggs (vocab-sized), one term-key join
    of the source-term table against the corpus-term table (AQE decides
    broadcast vs shuffle), 1-row totals broadcast; output is
    |sources| rows."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.functions.pmath import portable_ln

    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt"))
    ct = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    ns = st.groupBy("source").agg(F.sum("cnt").alias("ns"))
    n = toks.agg(F.count(F.lit(1)).alias("n"))
    lnr = (
        (portable_ln(F.col("cnt")) - portable_ln(F.col("ns")))
        - portable_ln(F.col("ct"))
    ) + portable_ln(F.col("n"))
    u = F.floor(
        F.lit(1000000000.0)
        * ((F.col("cnt").cast("double") / F.col("ns").cast("double")) * lnr)
    ).cast("long")
    return (
        st.join(ct, "term")
        .join(ns, "source")
        .join(F.broadcast(n))
        .select("source", "ns", u.alias("u"))
        .groupBy("source")
        .agg(
            F.max("ns").alias("n_tokens"),
            (F.sum("u").cast("double") / F.lit(1000000000.0)).alias("kl_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Triangle census of the part co-occurrence graph
# ---------------------------------------------------------------------------


@register(
    "part_triangle_census",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) GROUP BY 1
),
o AS (
  SELECT CASE WHEN da.deg <= db.deg THEN e.a ELSE e.b END AS s,
         CASE WHEN da.deg <= db.deg THEN e.b ELSE e.a END AS d
  FROM edges e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM o x JOIN o y ON x.d = y.s JOIN o z ON z.s = x.s AND z.d = y.d
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       CAST((SELECT sum(deg * (deg - 1)) FROM deg) // 2 AS BIGINT) AS n_wedges,
       n_triangles,
       CASE WHEN CAST((SELECT sum(deg * (deg - 1)) FROM deg) // 2 AS BIGINT) > 0
            THEN (3.0 * CAST(n_triangles AS DOUBLE))
                 / CAST(CAST((SELECT sum(deg * (deg - 1)) FROM deg) // 2
                             AS BIGINT) AS DOUBLE)
            ELSE 0.0 END AS global_clustering
FROM tri
""",
)
def q_part_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (parts sharing ≥2
    orders): node/edge/wedge/triangle counts and the global clustering
    coefficient 3T/W — the standard graph-cohesion diagnostic beside
    part_pagerank and the connected-components tier. Counting uses
    degree-ordered edge orientation (operators/graph.triangle_stats):
    the length-2-path join runs over out-degrees bounded by ~sqrt(2m),
    O(m^1.5) worst case instead of the hub-degree² a naive middle-node
    self-join pays — the difference between workable and not at a
    100 TB edge list. Edge construction reuses the bounded per-basket
    explode from basket_part_pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                "parts",
                lambda xx: F.transform(
                    "parts",
                    lambda yy: F.struct(xx.alias("src"), yy.alias("dst")),
                ),
            )
        ),
        lambda p: p["src"] < p["dst"],
    )
    edges = (
        baskets.select(F.explode(pair).alias("p"))
        .select("p.*")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_orders_both"))
        .filter(F.col("n_orders_both") >= 2)
        .select("src", "dst")
    )
    from covid_data_challenge_spark.operators.graph import triangle_stats

    return triangle_stats(edges)


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis, portable-ln)
# ---------------------------------------------------------------------------

_ES_K, _ES_SALT = 5, "es-v1"
_ES_U_SQL = (
    "((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '"
    + _ES_SALT
    + "'), 1, 8)) AS BIGINT) + 1) / 4294967296.0)"
)
_ES_STAGE, _ES_FINAL = portable_ln_sql_stages({"l_u": _ES_U_SQL})


@register(
    "weighted_sample_per_source",
    oracle=f"""
WITH q AS (
    SELECT doc_id, quality FROM ({_QUALITY_SQL})
),
keyed AS (
    SELECT d.doc_id, d.source, q.quality,
           greatest(q.quality, 0.0001) AS w,
           {_ES_STAGE}
    FROM documents d JOIN q USING (doc_id)
),
lns AS (SELECT doc_id, source, quality, w, {_ES_FINAL} FROM keyed),
scored AS (
    SELECT doc_id, source, quality,
           CAST(floor(1000000.0 * ((l_u) / w)) AS BIGINT) AS key_units
    FROM lns
)
SELECT source, doc_id, quality, key_units,
       CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY key_units DESC, doc_id
    ) AS rn
    FROM scored
)
WHERE rn <= {_ES_K}
""",
)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k=5 docs per
    source, inclusion probability ∝ quality — the Efraimidis-Spirakis
    one-pass scheme (Inf. Proc. Letters 2006): each row draws u from its
    md5 coin and ranks by u^(1/w), equivalently ln(u)/w, taking the
    top-k. Unlike the Bernoulli soft filter (quality_weighted_sample)
    the output size is EXACT, and unlike a quality top-k every doc has
    positive inclusion probability — the standard fix for diversity
    under a size budget. ln(u) runs through portable-ln and the sort
    key quantizes to integer micro-units, so the drawn sample is
    bit-reproducible on any engine. One scan; the only shuffle is the
    per-source WindowGroupLimit top-k (map-side pruned)."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.functions.pmath import portable_ln

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_ES_SALT))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    q = docs.select(
        "doc_id",
        "source",
        quality_score(F.col("text")).alias("quality"),
    ).withColumn("w", F.greatest(F.col("quality"), F.lit(0.0001)))
    scored = q.select(
        "doc_id",
        "source",
        "quality",
        F.floor(F.lit(1000000.0) * (portable_ln(u) / F.col("w")))
        .cast("long")
        .alias("key_units"),
    )
    wdw = Window.partitionBy("source").orderBy(F.col("key_units").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(wdw))
        .filter(F.col("rn") <= _ES_K)
        .select(
            "source", "doc_id", "quality", "key_units", F.col("rn").cast("int").alias("rank")
        )
    )


# ---------------------------------------------------------------------------
# k-core peel of the co-purchase graph
# ---------------------------------------------------------------------------

_KCORE_K, _KCORE_ROUNDS = 3, 3


def _kcore_oracle(k: int, rounds: int) -> str:
    ctes = [
        """items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)""",
        """e0 AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)""",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b AS node FROM {prev}
  ) GROUP BY 1
)"""
        )
        ctes.append(f"k{r} AS (SELECT node FROM d{r} WHERE deg >= {k})")
        ctes.append(
            f"""e{r} AS (
  SELECT e.a, e.b FROM {prev} e
  WHERE e.a IN (SELECT node FROM k{r}) AND e.b IN (SELECT node FROM k{r})
)"""
        )
        prev = f"e{r}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
  SELECT a AS node FROM {prev} UNION ALL SELECT b AS node FROM {prev}
) GROUP BY 1
"""
    )


@register("part_kcore_nodes", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def q_part_kcore_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-cluster extraction: 3 rounds of 3-core peeling on the
    co-purchase graph — iteratively drop parts with fewer than 3
    co-purchase partners, with their edges, and return the survivors
    with their end-state degrees. The fixed round count keeps the plan
    static and the oracle an unrolled CTE (pagerank/components
    discipline); each round is one degree aggregation + two semi-joins
    over the SHRINKING checkpointed edge list (operators/graph.
    kcore_peel), so cost is linear in rounds and bounded by the initial
    edge count."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                "parts",
                lambda xx: F.transform(
                    "parts",
                    lambda yy: F.struct(xx.alias("src"), yy.alias("dst")),
                ),
            )
        ),
        lambda p: p["src"] < p["dst"],
    )
    edges = (
        baskets.select(F.explode(pair).alias("p"))
        .select("p.*")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_orders_both"))
        .filter(F.col("n_orders_both") >= 2)
        .select("src", "dst")
    )
    from covid_data_challenge_spark.operators.graph import kcore_peel

    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection (seeded sign matrix)
# ---------------------------------------------------------------------------


def _jl_oracle(out_dims: int = 8, dim: int = 64, seed: int = 7) -> str:
    import math

    from covid_data_challenge_spark.operators.similarity import _signed_planes

    planes = _signed_planes(out_dims, dim, seed)
    scale = 1.0 / math.sqrt(out_dims)

    def proj(plane):
        lit = "[" + ", ".join("1.0" if w > 0 else "-1.0" for w in plane) + "]"
        return (
            f"list_aggregate(list_transform(list_zip(embedding, {lit}), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')"
        )

    comps = [
        f"CAST(CAST(floor(1000000.0 * ({proj(p)} * {scale!r})) AS BIGINT) AS VARCHAR)"
        for p in planes
    ]
    joined = " || ',' || ".join(comps)
    return f"SELECT vec_id, {joined} AS jl_units FROM embeddings"


@register("embedding_jl_projection", oracle=_jl_oracle())
def q_embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL dimensionality reduction 64→8 with a seeded ±1 sign matrix
    (Achlioptas 2003) — the cheap pre-reduction in front of the ANN
    tiers: pairwise distances survive to within the JL distortion bound
    while the vectors shrink 8×. Pure map-side column algebra (one
    ordered fold per output dim against literal planes, no shuffle);
    components quantize to integer micro-units so the projected vectors
    are hash-exact cross-engine. Distance preservation is pinned in
    pytest against NumPy."""
    from covid_data_challenge_spark.operators.similarity import jl_project_units

    return jl_project_units(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# Model-based curation recipe: DSIR -> perplexity gate -> exact dedup
# ---------------------------------------------------------------------------


@register(
    "corpus_prep_recipe_v3",
    oracle=f"""
WITH toks0 AS (
    SELECT doc_id, source IN {_DSIR_TARGET_SOURCES} AS is_target,
           unnest(string_split({_NORM}, ' ')) AS term
    FROM documents
),
bucketed AS (
    SELECT doc_id, is_target,
           CAST(
             (CAST(('0x' || substr(md5(term || '{DSIR_SALT}'), 1, 8)) AS BIGINT)
              % {DSIR_BUCKETS} + {DSIR_BUCKETS}) % {DSIR_BUCKETS} AS INT
           ) AS bucket,
           count(*) AS cnt
    FROM toks0 GROUP BY 1, 2, 3
),
per_bucket AS (
    SELECT bucket,
           sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS ct,
           sum(CASE WHEN NOT is_target THEN cnt ELSE 0 END) AS cr
    FROM bucketed GROUP BY 1
),
grid AS (
    SELECT bucket, ct, cr,
           (SELECT sum(ct) FROM per_bucket) AS nt,
           (SELECT sum(cr) FROM per_bucket) AS nr
    FROM per_bucket
),
staged0 AS (SELECT bucket, {_DSIR_STAGE} FROM grid),
lns0 AS (SELECT bucket, {_DSIR_FINAL} FROM staged0),
wtab AS (
    SELECT bucket,
           CAST(floor(1000000.0 * ((((l1) - (l2)) - (l3)) + (l4))) AS BIGINT)
             AS w_units
    FROM lns0
),
docw AS (
    SELECT b.doc_id, b.is_target, sum(b.cnt * w.w_units) AS w_units
    FROM bucketed b JOIN wtab w USING (bucket)
    GROUP BY 1, 2
),
rawdocs AS (SELECT * FROM docw WHERE NOT is_target),
wthr AS (SELECT quantile_cont(w_units, 0.5) AS thr FROM rawdocs),
sel AS (
    SELECT doc_id, w_units FROM rawdocs CROSS JOIN wthr
    WHERE CAST(w_units AS DOUBLE) >= thr
),
sel_docs AS (
    SELECT d.doc_id, d.text, d.lang, d.source, s.w_units
    FROM documents d JOIN sel s USING (doc_id)
),
toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM sel_docs),
bg AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
    FROM toks JOIN (SELECT CAST(unnest(range(1, 100000)) AS INT) AS i) idx
        ON i <= len(w) - 1
),
lm_bg AS (SELECT bg, count(*) AS c_ab FROM bg GROUP BY bg),
lm_pre AS (
    SELECT split_part(bg, ' ', 1) AS pre, CAST(sum(c_ab) AS BIGINT) AS c_a
    FROM lm_bg GROUP BY 1
),
vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lm_pre),
args AS (
    SELECT b.doc_id, (l.c_ab + 1) AS num, (p.c_a + vocab.v) AS den
    FROM bg b
    JOIN lm_bg l ON b.bg = l.bg
    JOIN lm_pre p ON split_part(b.bg, ' ', 1) = p.pre
    CROSS JOIN vocab
),
staged AS (SELECT doc_id, {_NLL_STAGE} FROM args),
lns AS (SELECT doc_id, {_NLL_FINAL} FROM staged),
scored AS (
    SELECT doc_id,
           CAST(floor(1000000.0 * ((l_den) - (l_num))) AS BIGINT) AS nll_units
    FROM lns
),
nlltab AS (
    SELECT doc_id,
           CAST(sum(nll_units) AS BIGINT)
             / (CAST(count(*) AS DOUBLE) * 1000000.0) AS nll
    FROM scored GROUP BY doc_id
),
nthr AS (SELECT quantile_cont(nll, 0.75) AS t FROM nlltab),
fluent AS (
    SELECT sd.doc_id, sd.text, sd.lang, sd.source, sd.w_units, n.nll
    FROM sel_docs sd JOIN nlltab n USING (doc_id) CROSS JOIN nthr
    WHERE n.nll <= nthr.t
),
fp AS (SELECT doc_id, md5({_NORM}) AS f FROM fluent),
keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
SELECT fl.doc_id, fl.lang, fl.source, fl.w_units, fl.nll
FROM fluent fl JOIN keep USING (doc_id)
""",
)
def q_corpus_prep_recipe_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MODEL-BASED curation recipe, composed end to end and
    hash-checked as one query (the heuristic twins are v1: quality→
    sample→dedup→cap and v2: boilerplate→quality→dedup):

    1. DSIR selection — keep raw docs in the top half of hashed-ngram
       importance weight against the curated target (src0/src1);
    2. perplexity gate — train the add-one bigram LM ON THE SELECTED
       SUBSET (the pipeline's own data, no external model) and drop the
       least-fluent quartile by mean NLL; docs too short to form a
       bigram cannot be scored and are dropped with them;
    3. exact dedup — lowest-id survivor per md5 fingerprint.

    Both model stages run on portable-ln with integer quantization, so
    the composition — selection set, LM, thresholds, survivors — is
    bit-exact against the single DuckDB CTE chain. Scale: stage models
    are constant/vocab-sized; each stage adds one threshold broadcast;
    the corpus itself flows through filters and one fingerprint
    aggregation."""
    from covid_data_challenge_spark.operators.dedup import dedup_exact_keep_first
    from covid_data_challenge_spark.operators.dsir import dsir_select
    from covid_data_challenge_spark.operators.lm import (
        bigram_lm_build,
        bigram_lm_nll_with,
    )

    docs = _docs(spark, sf_dir)
    # Stage boundaries are materialized — the composed-lazy version
    # re-derived every upstream stage per consumer (measured 126 parquet
    # scans / 483 exchanges; 8 scans with the checkpoints). In
    # production each boundary is a written gold table; localCheckpoint
    # is the in-session equivalent. The checkpointed frames are
    # doc-level id+metric lists (2-3 longs/row), never the text.
    sel = (
        dsir_select(
            docs,
            is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES),
            keep_frac=0.5,
            n_buckets=DSIR_BUCKETS,
            salt=DSIR_SALT,
        )
        .select("doc_id", "w_units")
        .localCheckpoint(eager=True)
    )
    sel_docs = docs.join(sel, "doc_id")
    lm = bigram_lm_build(sel_docs)
    nll = (
        bigram_lm_nll_with(sel_docs, lm)
        .select("doc_id", "nll")
        .localCheckpoint(eager=True)
    )
    nthr = nll.agg(F.percentile(F.col("nll"), F.lit(0.75)).alias("t"))
    fluent = (
        sel_docs.join(nll, "doc_id")
        .join(F.broadcast(nthr))
        .filter(F.col("nll") <= F.col("t"))
        .select("doc_id", "text", "lang", "source", "w_units", "nll")
    )
    return dedup_exact_keep_first(fluent).select(
        "doc_id", "lang", "source", "w_units", "nll"
    )


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (portable exp/ln, fixed-GD)
# ---------------------------------------------------------------------------

from covid_data_challenge_spark.functions.pmath import portable_exp_sql  # noqa: E402
from covid_data_challenge_spark.operators.lr import (  # noqa: E402
    LR_BIAS,
    LR_BUCKETS,
    LR_ITERS,
    LR_RATE,
    LR_SALT,
    lr_features,
    lr_score,
    lr_train,
)


def _lr_oracle_parts(n_buckets: int, iters: int, rate: float):
    ctes = [
        f"""toks AS (
    SELECT doc_id,
           CASE WHEN source IN {_DSIR_TARGET_SOURCES} THEN 1.0 ELSE 0.0 END AS y,
           unnest(string_split({_NORM}, ' ')) AS term
    FROM documents
)""",
        f"""counts AS (
    SELECT doc_id, y,
           CAST(
             (CAST(('0x' || substr(md5(term || '{LR_SALT}'), 1, 8)) AS BIGINT)
              % {n_buckets} + {n_buckets}) % {n_buckets} AS INT
           ) AS bucket,
           count(*) AS cnt
    FROM toks GROUP BY 1, 2, 3
)""",
        """tf AS (
    SELECT doc_id, y, bucket,
           CAST(cnt AS DOUBLE)
             / CAST(sum(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS x
    FROM counts
)""",
        f"""feat AS (
    SELECT doc_id, y, bucket, x FROM tf
    UNION ALL
    SELECT DISTINCT doc_id, y, CAST({LR_BIAS} AS INT) AS bucket, 1.0 AS x FROM tf
)""",
        "nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM feat)",
        f"""w0 AS (
    SELECT CAST(unnest(range({LR_BIAS}, {n_buckets})) AS INT) AS bucket,
           CAST(0 AS BIGINT) AS w_units
)""",
    ]
    for t in range(1, iters + 1):
        wp = f"w{t - 1}"
        ctes.append(
            f"""z{t} AS (
    SELECT doc_id, y,
           CAST(sum(CAST(floor(1000000000.0
               * (x * (CAST(w_units AS DOUBLE) / 1000000.0))) AS BIGINT))
             AS BIGINT) AS z
    FROM feat JOIN {wp} USING (bucket) GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""p{t} AS (
    SELECT doc_id, y,
           (1.0 / (1.0 + {portable_exp_sql("zneg")})) AS p
    FROM (SELECT doc_id, y,
                 -(CAST(z AS DOUBLE) / 1000000000.0) AS zneg FROM z{t})
)"""
        )
        ctes.append(
            f"""g{t} AS (
    SELECT bucket,
           CAST(sum(CAST(floor(1000000000.0 * ((p - y) * x)) AS BIGINT))
             AS BIGINT) AS gsum
    FROM feat JOIN p{t} USING (doc_id, y) GROUP BY 1
)"""
        )
        ctes.append(
            f"""w{t} AS (
    SELECT w.bucket,
           w.w_units - coalesce(
               CAST(floor({1000000.0 * rate!r}
                   * ((CAST(gsum AS DOUBLE) / 1000000000.0)
                      / CAST(nn.n AS DOUBLE))) AS BIGINT), 0) AS w_units
    FROM {wp} w LEFT JOIN g{t} USING (bucket) CROSS JOIN nn
)"""
        )
    final = f"""
SELECT doc_id, y,
       CAST(sum(CAST(floor(1000000000.0
           * (x * (CAST(w_units AS DOUBLE) / 1000000.0))) AS BIGINT))
         AS BIGINT) AS logit_units
FROM feat JOIN w{iters} USING (bucket) GROUP BY 1, 2
"""
    return ctes, final


def _lr_oracle(n_buckets: int, iters: int, rate: float) -> str:
    ctes, final = _lr_oracle_parts(n_buckets, iters, rate)
    return "WITH " + ",\n".join(ctes) + final


@register(
    "quality_classifier_logits",
    oracle=_lr_oracle(LR_BUCKETS, LR_ITERS, LR_RATE),
)
def q_quality_classifier_logits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3-style curation classifier (Brown et al. 2020, App. A):
    logistic regression over hashed term-frequency features, trained to
    separate the curated target slice (src0/src1) from the raw corpus —
    3 full-batch gradient-descent iterations as a pure DataFrame loop
    (no MLlib, no driver math), then every document scored under the
    trained weights. Sigmoid runs on functions/pmath.portable_exp and
    every cross-row sum (logits, gradients) is an integer sum of
    floored nano-units, so training AND scoring replay bit-exact in the
    unrolled DuckDB CTE — a supervised model whose distributed training
    is hash-checked end to end. Per iteration: one broadcast join + two
    aggregations over the checkpointed feature table; model state is a
    65-row weight table."""
    docs = _docs(spark, sf_dir)
    feats = lr_features(
        docs, is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES)
    ).localCheckpoint(eager=True)
    w = lr_train(feats)
    return lr_score(feats, w)


# ---------------------------------------------------------------------------
# Classifier evaluation: exact ROC-AUC + calibration table
# ---------------------------------------------------------------------------


@register(
    "classifier_eval_auc",
    oracle="WITH "
    + ",\n".join(_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[0])
    + f""",
scored AS ({_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[1]}),
ranked AS (
    SELECT y,
           2 * rank() OVER (ORDER BY logit_units)
             + (count(*) OVER (PARTITION BY logit_units) - 1) AS half_rank
    FROM scored
)
SELECT CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(
         (sum(CASE WHEN y = 1.0 THEN half_rank ELSE 0 END)
          - sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
            * (sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) + 1)) AS DOUBLE)
       / CAST((2 * sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
               * sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END)) AS DOUBLE) AS auc
FROM ranked
""",
)
def q_classifier_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the trained quality classifier as the
    Mann-Whitney rank statistic, tie-corrected — computed SCALE-SAFE:
    the corpus is first collapsed to the distinct-logit table
    ``groupBy(logit_units) → (n, n_pos)`` (one map-side-combinable
    shuffle), and the cumulative ranks come from a window over that
    distinct-VALUE table, bounded by logit cardinality, never by corpus
    rows. Competition rank for every row of a value is cum_before+1, so
    the integer half-rank (2·rank + ties−1) per row is 2·cum_n − n + 1
    and the positive-class half-rank sum is exactly
    Σ n_pos·(2·cum_n − n + 1) — bit-identical to ranking row-by-row
    (the DuckDB oracle still ranks rows; the hash must and does agree).
    No single-partition sort over the scored corpus remains; the plan
    pin lives in test_plans.py. On THIS synthetic corpus the sources
    share one vocabulary, so the honest AUC is barely above chance
    (~0.55) — the learner itself is pinned in pytest on a separable
    fixture, where it ranks every positive above every negative."""
    docs = _docs(spark, sf_dir)
    feats = lr_features(
        docs, is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES)
    ).localCheckpoint(eager=True)
    scored = lr_score(feats, lr_train(feats))
    per_val = scored.groupBy("logit_units").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("long").alias("n_pos"),
    )
    cum_w = Window.orderBy("logit_units").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_val.withColumn("cum_n", F.sum("n").over(cum_w))
    pos = F.sum("n_pos").cast("long")
    neg = F.sum(F.col("n") - F.col("n_pos")).cast("long")
    s_half = F.sum(
        F.col("n_pos") * (F.lit(2) * F.col("cum_n") - F.col("n") + F.lit(1))
    ).cast("long")
    return cum.agg(
        pos.alias("n_pos"),
        neg.alias("n_neg"),
        (
            (s_half - pos * (pos + F.lit(1))).cast("double")
            / (F.lit(2) * pos * neg).cast("double")
        ).alias("auc"),
    )


@register(
    "classifier_calibration",
    oracle="WITH "
    + ",\n".join(_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[0])
    + f""",
scored AS ({_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[1]}),
probs AS (
    SELECT y,
           (1.0 / (1.0 + {portable_exp_sql("zneg")})) AS p
    FROM (SELECT y, -(CAST(logit_units AS DOUBLE) / 1000000000.0) AS zneg
          FROM scored)
),
binned AS (
    SELECT CAST(least(floor(p * 10.0), 9.0) AS INT) AS bin,
           CAST(floor(1000000000.0 * p) AS BIGINT) AS p_units, y
    FROM probs
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p_units) AS BIGINT)
         / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS mean_predicted,
       CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS frac_positive
FROM binned GROUP BY bin
""",
)
def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the quality classifier: predicted
    probability deciles vs empirical positive rate — the calibration
    check that decides whether classifier scores can be used as
    sampling weights directly or need Platt/temperature scaling.
    Probabilities come from portable-exp sigmoid and quantize to
    nano-units before the per-bin mean, so the whole table is
    hash-exact. One sort-free aggregation over the scored docs."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.functions.pmath import portable_exp

    feats = lr_features(
        docs, is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES)
    ).localCheckpoint(eager=True)
    scored = lr_score(feats, lr_train(feats))
    p = (
        F.lit(1.0)
        / (
            F.lit(1.0)
            + portable_exp(-(F.col("logit_units").cast("double") / F.lit(1e9)))
        )
    )
    binned = scored.select(
        "y",
        F.least(F.floor(p * F.lit(10.0)), F.lit(9.0)).cast("int").alias("bin"),
        F.floor(F.lit(1e9) * p).cast("long").alias("p_units"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("p_units").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
        ).alias("mean_predicted"),
        (
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("frac_positive"),
    )


# ---------------------------------------------------------------------------
# Distribution drift: PSI (portable-ln) + chi-squared
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_STAGE, _PSI_FINAL = portable_ln_sql_stages(
    {"l_p": "(ca + 1)", "l_q": "(cb + 1)", "l_na": "(na + 10)", "l_nb": "(nb + 10)"}
)


@register(
    "value_drift_psi",
    oracle=f"""
WITH bounds AS (
    SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
           min(value) AS lo, max(value) AS hi
    FROM events
),
halves AS (
    SELECT CASE WHEN epoch_us(ts) * 2 <= b.t0 + b.t1 THEN 0 ELSE 1 END AS half,
           CAST(least(floor(((value - b.lo) / (b.hi - b.lo)) * {_PSI_BINS}.0),
                      {_PSI_BINS - 1}.0) AS INT) AS bin
    FROM events CROSS JOIN bounds b
),
counts AS (
    SELECT bin,
           sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
    FROM halves GROUP BY bin
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts),
grid AS (SELECT c.bin, c.ca, c.cb, t.na, t.nb FROM counts c CROSS JOIN tot t),
staged AS (SELECT bin, ca, cb, na, nb, {_PSI_STAGE} FROM grid),
lns AS (SELECT bin, ca, cb, na, nb, {_PSI_FINAL} FROM staged),
units AS (
    SELECT CAST(floor(1000000000.0 *
             (((CAST(ca + 1 AS DOUBLE) / CAST(na + {_PSI_BINS} AS DOUBLE))
               - (CAST(cb + 1 AS DOUBLE) / CAST(nb + {_PSI_BINS} AS DOUBLE)))
              * ((((l_p) - (l_na)) - (l_q)) + (l_nb)))) AS BIGINT) AS u
    FROM lns
)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_first_half,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_second_half,
       CAST(sum(u) AS BIGINT) / 1000000000.0 AS psi
FROM units
""",
)
def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream (split at the midpoint of the time range, bins =
    10 fixed-width buckets over the global value range, add-one
    smoothed): PSI = Σ (p-q)·ln(p/q), THE standard production drift
    alarm (<0.1 stable, >0.25 drifted). The log-ratios run through
    portable-ln and quantize to nano-units per bin before the sum, so a
    log-space monitoring metric is hash-exact. Two passes: one 1-row
    bounds aggregate (broadcast back), one binned count — no sort, no
    per-row state."""
    from covid_data_challenge_spark.functions.pmath import portable_ln

    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    b = _PSI_BINS
    half = F.when(
        F.unix_micros("ts") * F.lit(2) <= F.col("t0") + F.col("t1"), F.lit(0)
    ).otherwise(F.lit(1))
    binc = (
        F.least(
            F.floor(
                ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")))
                * F.lit(float(b))
            ),
            F.lit(float(b - 1)),
        )
    ).cast("int")
    counts = (
        ev.join(F.broadcast(bounds))
        .select(half.alias("half"), binc.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    wall = Window.partitionBy()
    grid = counts.select(
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    lnr = (
        (portable_ln(F.col("ca") + F.lit(1)) - portable_ln(F.col("na") + F.lit(b)))
        - portable_ln(F.col("cb") + F.lit(1))
    ) + portable_ln(F.col("nb") + F.lit(b))
    diff = (F.col("ca") + F.lit(1)).cast("double") / (
        F.col("na") + F.lit(b)
    ).cast("double") - (F.col("cb") + F.lit(1)).cast("double") / (
        F.col("nb") + F.lit(b)
    ).cast("double")
    u = F.floor(F.lit(1000000000.0) * (diff * lnr)).cast("long")
    return grid.select(
        "na", "nb", u.alias("u")
    ).groupBy().agg(
        F.max("na").alias("n_first_half"),
        F.max("nb").alias("n_second_half"),
        (F.sum("u").cast("double") / F.lit(1000000000.0)).alias("psi"),
    )


@register(
    "event_type_drift_chi2",
    oracle="""
WITH bounds AS (
    SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
),
halves AS (
    SELECT event_type,
           CASE WHEN epoch_us(ts) * 2 <= b.t0 + b.t1 THEN 0 ELSE 1 END AS half
    FROM events CROSS JOIN bounds b
),
cells AS (
    SELECT event_type,
           sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS o0,
           sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS o1
    FROM halves GROUP BY event_type
),
tot AS (SELECT sum(o0) AS na, sum(o1) AS nb, count(*) AS k FROM cells),
units AS (
    SELECT
      CAST(floor(1000000000.0 * (
        ((CAST(o0 AS DOUBLE) - (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.na AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE)))
         * (CAST(o0 AS DOUBLE) - (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.na AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE))))
        / (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.na AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE))
      )) AS BIGINT)
      +
      CAST(floor(1000000000.0 * (
        ((CAST(o1 AS DOUBLE) - (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.nb AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE)))
         * (CAST(o1 AS DOUBLE) - (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.nb AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE))))
        / (CAST(c.o0 + c.o1 AS DOUBLE) * CAST(t.nb AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE))
      )) AS BIGINT) AS u
    FROM cells c CROSS JOIN tot t
)
SELECT CAST((SELECT k FROM tot) - 1 AS BIGINT) AS dof,
       CAST(sum(u) AS BIGINT) / 1000000000.0 AS chi2
FROM units
""",
)
def q_event_type_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift between the first and second half of the event
    stream: Pearson chi-squared over the event_type × half contingency
    table (expected counts from the marginals) — PSI's companion for
    discrete features. Per-cell contributions quantize to integer
    nano-units before the sum, so the statistic is hash-exact; the plan
    is one 1-row bounds broadcast plus one |types|-row aggregation."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    half = F.when(
        F.unix_micros("ts") * F.lit(2) <= F.col("t0") + F.col("t1"), F.lit(0)
    ).otherwise(F.lit(1))
    cells = (
        ev.join(F.broadcast(bounds))
        .select("event_type", half.alias("half"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("o0"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("o1"),
        )
    )
    wall = Window.partitionBy()
    grid = cells.select(
        "o0",
        "o1",
        F.sum("o0").over(wall).alias("na"),
        F.sum("o1").over(wall).alias("nb"),
        F.count(F.lit(1)).over(wall).alias("k"),
    )

    def cell_u(o, n_side):
        e = (
            (F.col("o0") + F.col("o1")).cast("double")
            * F.col(n_side).cast("double")
            / (F.col("na") + F.col("nb")).cast("double")
        )
        return F.floor(
            F.lit(1000000000.0)
            * (((F.col(o).cast("double") - e) * (F.col(o).cast("double") - e)) / e)
        ).cast("long")

    return (
        grid.select("k", (cell_u("o0", "na") + cell_u("o1", "nb")).alias("u"))
        .groupBy()
        .agg(
            (F.max("k") - F.lit(1)).cast("long").alias("dof"),
            (F.sum("u").cast("double") / F.lit(1000000000.0)).alias("chi2"),
        )
    )


@register(
    "classifier_top_features",
    oracle="WITH "
    + ",\n".join(_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[0])
    + f""",
topw AS (
    SELECT bucket, w_units FROM w{LR_ITERS}
    WHERE bucket <> {LR_BIAS}
    ORDER BY abs(w_units) DESC, bucket LIMIT 5
),
term_counts AS (
    SELECT CAST(
             (CAST(('0x' || substr(md5(term || '{LR_SALT}'), 1, 8)) AS BIGINT)
              % {LR_BUCKETS} + {LR_BUCKETS}) % {LR_BUCKETS} AS INT
           ) AS bucket,
           term, count(*) AS cnt
    FROM toks GROUP BY 1, 2
),
ranked AS (
    SELECT t.bucket, w.w_units, t.term, t.cnt,
           row_number() OVER (
               PARTITION BY t.bucket ORDER BY t.cnt DESC, t.term
           ) AS rn
    FROM term_counts t JOIN topw w USING (bucket)
)
SELECT bucket, w_units, term, CAST(cnt AS BIGINT) AS cnt, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 3
""",
)
def q_classifier_top_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpretability for the quality classifier: the 5 buckets with
    the largest trained |weight| (bias excluded), each resolved back to
    its 3 most frequent terms — the standard 'what did the model
    learn' report for a hashing-trick model, where buckets are only
    meaningful through the terms that hash into them. Reuses the
    bit-exact training replay for the weights; the term resolution is
    one (bucket, term) aggregation + a 5-row broadcast semi-join +
    per-bucket WindowGroupLimit top-3."""
    docs = _docs(spark, sf_dir)
    from covid_data_challenge_spark.operators.dsir import hashed_bucket

    feats = lr_features(
        docs, is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES)
    ).localCheckpoint(eager=True)
    w = lr_train(feats)
    topw = (
        w.filter(F.col("bucket") != LR_BIAS)
        .orderBy(F.abs(F.col("w_units")).desc(), "bucket")
        .limit(5)
    )
    term_counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .select(
            hashed_bucket(F.col("term"), LR_BUCKETS, LR_SALT).alias("bucket"),
            "term",
        )
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wdw = Window.partitionBy("bucket").orderBy(F.col("cnt").desc(), "term")
    return (
        term_counts.join(F.broadcast(topw), "bucket")
        .withColumn("rn", F.row_number().over(wdw))
        .filter(F.col("rn") <= 3)
        .select(
            "bucket",
            "w_units",
            "term",
            "cnt",
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus prep v4: the classifier-filtered curation gate (Brown et al. 2020)
# ---------------------------------------------------------------------------


@register(
    "corpus_prep_recipe_v4",
    oracle="WITH "
    + ",\n".join(_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[0])
    + f""",
scored AS ({_lr_oracle_parts(LR_BUCKETS, LR_ITERS, LR_RATE)[1]}),
probs AS (
    SELECT doc_id, y,
           CAST(floor(1000000000.0
                * (1.0 / (1.0 + {portable_exp_sql("zneg")}))) AS BIGINT)
             AS p_units
    FROM (SELECT doc_id, y,
                 -(CAST(logit_units AS DOUBLE) / 1000000000.0) AS zneg
          FROM scored)
),
kept AS (
    SELECT d.doc_id, d.text, d.lang, d.source, p.p_units
    FROM documents d JOIN probs p USING (doc_id)
    WHERE p.y = 0.0
      AND {md5_unit_fraction_sql("d.doc_id || 'cpr4'")}
          < CAST(p.p_units AS DOUBLE) / 1000000000.0
),
fp AS (SELECT doc_id, md5({_NORM}) AS f FROM kept),
keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
SELECT k.doc_id, k.lang, k.source, k.p_units
FROM kept k JOIN keep USING (doc_id)
""",
)
def q_corpus_prep_recipe_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLASSIFIER-filtered curation recipe — the Brown et al. 2020
    (GPT-3, Appendix A) pipeline the LR components exist for, composed
    end to end and hash-checked as one query (v1/v2 are heuristic
    gates, v3 is the DSIR+perplexity model gate; v4 is the supervised
    gate):

    1. train the LR quality classifier on the full corpus (curated
       src0/src1 vs raw) — operators/lr.py's bit-exact fixed-GD loop;
    2. score every document and squash to a probability via the
       portable-exp sigmoid, quantized to integer nano-units;
    3. soft selection — keep each RAW doc iff its deterministic
       md5 coin (sampling.md5_unit_fraction, salted 'cpr4') falls
       below p: documents the classifier likes survive
       proportionally more often, Brown-2020's stochastic
       classifier-filtering with a replayable coin instead of a
       Pareto draw (curated docs are the training positives, not
       candidates — they are not re-selected);
    4. exact dedup — lowest-id survivor per md5 fingerprint.

    Every stage replays bit-exactly in the single DuckDB CTE chain:
    training is the unrolled-GD CTE, the sigmoid is portable_exp, the
    coin and fingerprint are md5. Scale: the model is a 65-row weight
    table (checkpointed), scoring is one broadcast join + per-doc agg,
    selection is a map-side filter, dedup is one fingerprint shuffle —
    nothing corpus-sized is ever sorted, windowed, or collected."""
    from covid_data_challenge_spark.functions.pmath import portable_exp
    from covid_data_challenge_spark.operators.dedup import dedup_exact_keep_first
    from covid_data_challenge_spark.operators.sampling import md5_unit_fraction

    docs = _docs(spark, sf_dir)
    feats = lr_features(
        docs, is_target=F.col("source").isin(*_DSIR_TARGET_SOURCES)
    ).localCheckpoint(eager=True)
    scored = lr_score(feats, lr_train(feats))
    p = F.lit(1.0) / (
        F.lit(1.0)
        + portable_exp(-(F.col("logit_units").cast("double") / F.lit(1e9)))
    )
    probs = scored.select(
        "doc_id", "y", F.floor(F.lit(1e9) * p).cast("long").alias("p_units")
    ).localCheckpoint(eager=True)
    kept = (
        docs.join(probs, "doc_id")
        .filter(
            (F.col("y") == 0.0)
            & (
                md5_unit_fraction(F.concat(F.col("doc_id"), F.lit("cpr4")))
                < F.col("p_units").cast("double") / F.lit(1e9)
            )
        )
        .select("doc_id", "text", "lang", "source", "p_units")
    )
    return dedup_exact_keep_first(kept).select(
        "doc_id", "lang", "source", "p_units"
    )
