"""Deduplication operators for large-scale document corpora.

Four tiers, in increasing fuzziness — all shuffle-on-key DataFrame plans
with no Python in the hot path:

- **exact**: md5 fingerprint of normalized text → groupBy. One shuffle on
  a 32-byte key; at 100 TB this is the cheapest possible dedup.
- **n-gram Jaccard**: word-shingle inverted index → self-join on shingle →
  exact pairwise Jaccard for co-shingled pairs only. A document-frequency
  cap on shingles bounds the join fan-out (hot shingles contribute
  candidate pairs quadratically; dropping them is the standard guard).
- **MinHash + LSH**: per-doc signature of P seeded xxhash64 minima, banded
  into B buckets; only same-bucket docs become candidate pairs. This is
  the 100 TB-scale near-dup path: cost is O(docs × shingles) + a shuffle
  on (band, band_hash), never O(docs²).
- **SimHash**: 64-bit locality-sensitive fingerprint from token hashes;
  near-dups differ in few bits. One explode + one groupBy.

The xxhash64 hash families are Spark-native (not reproducible in ANSI
SQL) and exist for raw throughput; each fuzzy tier also ships a
PORTABLE family the registry queries run on — SimHash from md5 hex
nibbles (simhash_md5), MinHash from seeded affine permutations of a
31-bit md5 base hash (minhash_signatures(portable=True), exact in
int64 on every engine) — so the banded candidate generation and the
estimates themselves replay bit-exactly in the DuckDB oracle.
Correctness is additionally pinned by pytest recall tests against the
exact Jaccard operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.text import (
    fingerprint,
    let,
    normalize_text,
    tokens,
)


def word_shingle_expr(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text → array<string>.

    Documents with fewer than ``n`` tokens yield an empty array.

    The token array is let-bound (see :func:`functions.text.let`) so the
    regex+split tokenization runs ONCE per document — referencing it
    directly inside the per-gram ``transform`` lambda would re-tokenize
    the whole text for every shingle (measured 7× slower at sf0.1).
    """

    def build(w: Column) -> Column:
        count = F.greatest(F.size(w) - F.lit(n - 1), F.lit(0))
        # slice+concat_ws is ~4× faster than an element_at chain per gram
        # (one array slice vs n catalyst expression evaluations per position).
        grams = F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
        return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))

    return let(tokens(text_col), build)


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded (id, shingle) pairs, distinct per doc."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingle_expr(F.col(text_col), n)).alias("shingle"),
    )


def exact_dedup_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-level exact-duplicate statistics in one pass."""
    fp = docs.select(fingerprint(F.col(text_col)).alias("fp"))
    per_fp = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    return per_fp.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        .cast("long")
        .alias("n_redundant_docs"),
    )


def dedup_exact_keep_first(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup keeping the lowest id per fingerprint (deterministic
    survivor selection — ``dropDuplicates`` would keep an arbitrary row)."""
    fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "__fp"], "left_semi").drop("__fp")


def pair_overlap_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Shared candidate-pair machinery for the exact set-overlap tiers:
    ``(doc_a, doc_b, n_common, n_a, n_b)`` for every doc pair sharing at
    least one (cap-surviving) shingle, with ``doc_a < doc_b``. Both
    :func:`jaccard_pairs` (symmetric) and :func:`containment_pairs`
    (asymmetric) are one projection away from this table — the overlap
    counting, the df cap, and the in-group i<j explode are identical, so
    the scale analysis in :func:`jaccard_pairs` applies verbatim."""
    sh = doc_shingles(docs, id_col, text_col, n)
    sh = sh.withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    if max_doc_freq is not None:
        freq = (
            doc_shingles(docs, id_col, text_col, n)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        sh = sh.join(freq.filter(F.col("df") <= max_doc_freq), "shingle", "left_semi")
        grp = sh.groupBy("shingle").agg(
            F.collect_list(F.struct("id", "n_sh")).alias("ds")
        )
        pair = F.filter(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x: F.transform(
                        "ds",
                        lambda y: F.struct(
                            x["id"].alias("doc_a"),
                            y["id"].alias("doc_b"),
                            x["n_sh"].alias("n_a"),
                            y["n_sh"].alias("n_b"),
                        ),
                    ),
                )
            ),
            lambda p: p["doc_a"] < p["doc_b"],
        )
        return (
            grp.select(F.explode(pair).alias("p"))
            .select("p.*")
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("n_common"),
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
            )
        )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.max("a.n_sh").alias("n_a"),
            F.max("b.n_sh").alias("n_b"),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all candidate pairs.

    Inverted-index shape: pairs are generated only for docs sharing ≥1
    shingle, so cost scales with sum(df²) over shingles, not docs².
    ``max_doc_freq`` drops shingles hotter than the cap before any pair
    is generated, bounding per-shingle cost at df² ≤ cap².

    Scale design (capped path): per-doc set sizes ride along on the
    shingle rows via a window count (doc-bounded partitions — no skew),
    the doc-frequency cap comes from a map-side-combined aggregation
    (skew-immune: a stop-word shingle contributes one partial count per
    task, and the semi-join that applies it is AQE-skew-splittable, per
    SPARK docs on skewJoin — unlike a window over the shingle key, which
    would sort every hot shingle's rows in a single task), and pairs are
    emitted by exploding i<j combinations inside each ≤cap-sized shingle
    group. Two corpus scans, zero self-joins, no |docs|-sized end joins:
    the pair aggregation already carries both set sizes. (A row-local
    ``n_sh = size(shingle array)`` carried through the explode was
    A/B-measured 1.4× SLOWER at sf0.1 than this window — it forces a
    (shingle, n_sh) struct-array materialization per doc, which costs
    more than shuffling doc-bounded partitions; see git history.)

    The uncapped path (``max_doc_freq=None``) keeps the classic
    inverted-index self-join — group sizes are unbounded there, so
    per-group pair explosion could OOM an executor on a hot shingle.
    """
    common = pair_overlap_counts(docs, id_col, text_col, n, max_doc_freq)
    return (
        common.withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10,
) -> DataFrame:
    """Asymmetric near-dup detection by n-gram set CONTAINMENT:
    ``|A ∩ B| / min(|A|, |B|)`` — the smaller document's shingle set
    contained in the larger one's.

    Jaccard misses subset duplication: a paragraph quoted inside a much
    longer page scores ``|A|/|B| ≈ 0`` on Jaccard but ~1.0 on
    containment, which is why corpus pipelines (Broder's original
    resemblance/containment pair, and e.g. CCNet-style dedup audits) run
    both. Candidate generation and overlap counting are shared with
    :func:`jaccard_pairs` via :func:`pair_overlap_counts` — same df cap,
    same skew analysis, no extra corpus scan. Reference scope: the
    reference has only exact duplicate checks (tests/test_integration.py
    fixture-level); this is part of the training-data extension tier.
    """
    common = pair_overlap_counts(docs, id_col, text_col, n, max_doc_freq)
    return (
        common.withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("n_a", "n_b"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_common", "containment")
    )


#: Mersenne prime 2^31-1 — the modulus of the portable MinHash
#: permutation family. With a 31-bit base hash and 31-bit coefficients,
#: ``a*h + b`` peaks below 2^62: exact in a signed 64-bit integer in BOTH
#: Spark and DuckDB (no overflow, no bignum), which is what makes the
#: affine permutations engine-portable.
MERSENNE31 = (1 << 31) - 1


def minhash_coeffs(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Seeded affine-permutation coefficients (a, b) — driver-side
    constants shared by the engine and the DuckDB oracle builder (same
    move as the sign-LSH plane literals)."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_perm)
    ]


def _md5_h31(hex_col: Column) -> Column:
    """31-bit base hash from the first 8 hex nibbles of an md5 column.

    Spark side parses the 8-nibble prefix in ONE ``conv(hex, 16, 10)``
    call (measured 2× faster than the 8×instr positional chain over the
    signature stage); the DuckDB oracle keeps the strpos/positional
    arithmetic — DuckDB has no conv() — and the two are value-identical
    (pinned by a zero-mismatch sweep and every minhash/banding oracle)."""
    return F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long") % F.lit(MERSENNE31)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    portable: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature: minimum of a per-permutation shingle
    hash, computed as ONE groupBy over the exploded shingles (all P
    minima are fused into a single aggregation pass).

    ``portable=False`` (throughput): permutation p is
    ``xxhash64(p, shingle)`` — Spark-native, not SQL-reproducible.
    ``portable=True``: one md5 per shingle → 31-bit base hash → P seeded
    affine permutations ``(a·h + b) mod 2^31-1`` (:func:`minhash_coeffs`)
    — bit-exactly replayable in DuckDB, giving the LSH pair query a full
    hash-checked oracle."""
    sh = doc_shingles(docs, id_col, text_col, n)
    if portable:
        sh = sh.withColumn("__h31", _md5_h31(F.md5(F.col("shingle"))))
        mins = [
            F.min((F.lit(a) * F.col("__h31") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"h{p}")
            for p, (a, b) in enumerate(minhash_coeffs(num_perm))
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.lit(p), F.col("shingle"))).alias(f"h{p}")
            for p in range(num_perm)
        ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        F.col("id").alias(id_col),
        F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("signature"),
    )


def minhash_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(id, band, bucket) banded view of a signature table — the
    candidate-join key. ``portable=True`` buckets are the raw value
    tuple (SQL-replayable array); otherwise a single xxhash64 digest
    long. This is also the frame to MATERIALIZE as the history gold
    table for incremental dedup: written bucketed on (band, bucket),
    every future batch screen joins it shuffle-free on the history side
    (pinned by test_skew_bucketing.test_history_bands_gold_join)."""
    rows_per_band = num_perm // bands

    def band_bucket(b: int):
        vals = [
            F.element_at("signature", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        return F.array(*vals) if portable else F.xxhash64(*vals)

    return sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Signatures are banded (``bands`` bands × ``num_perm/bands`` rows);
    docs colliding in any band become candidates; the estimated Jaccard is
    the fraction of agreeing signature positions. No O(n²) stage exists:
    the candidate join is on (band_idx, band_hash).

    ``portable=True`` uses the md5-affine signature family and joins on
    the band's raw value tuple instead of an xxhash64 band digest (the
    digest isn't SQL-reproducible); payload per banded row grows from 1
    to ``num_perm/bands`` longs — the price of the DuckDB oracle.
    """
    sig = minhash_signatures(docs, id_col, text_col, n, num_perm, portable)
    # The band join moves ONLY (id, band, bucket) — 3 longs per exploded
    # row, not the num_perm-element signature arrays (which would
    # multiply the shuffle payload ~10× at 32 perms). Signatures are
    # re-joined after candidate dedup, when each id appears once per
    # surviving pair instead of once per band collision; the identical
    # groupBy(id) exchange under sig is planned once and reused
    # (ReusedExchange) for the banded and both signature sides.
    banded = minhash_bands(sig, id_col, num_perm, bands, portable)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sig_a = sig.select(F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a"))
    sig_b = sig.select(F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est_jaccard", F.round(agree / F.lit(num_perm), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_lsh_pairs_incremental(
    history: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    portable: bool = False,
) -> DataFrame:
    """Incremental near-dup screen: NEW-batch docs that collide with a
    HISTORY doc in any MinHash band, with the agreeing-position Jaccard
    estimate — the daily-ingest twin of :func:`minhash_lsh_pairs`.

    The band join is history-bands ⋈ batch-bands only, so candidate
    cost is ∝ |batch| × collision rate and history is NEVER paired
    against itself (re-running the full pair query per ingest would
    re-pay the whole corpus every day). At 100 TB the history
    signatures/bands are a pre-built gold table bucketed on
    (band, bucket) — the daily join is then shuffle-free on the history
    side; here both are computed inline so the oracle can replay them.

    Output: (batch_doc, hist_doc, est_jaccard ≥ threshold).
    """
    sig_h = minhash_signatures(history, id_col, text_col, n, num_perm, portable)
    sig_b = minhash_signatures(batch, id_col, text_col, n, num_perm, portable)
    h = minhash_bands(sig_h, id_col, num_perm, bands, portable).alias("h")
    nb = minhash_bands(sig_b, id_col, num_perm, bands, portable).alias("nb")
    cand = (
        h.join(
            nb,
            (F.col("h.band") == F.col("nb.band"))
            & (F.col("h.bucket") == F.col("nb.bucket")),
        )
        .select(F.col("nb.id").alias("batch_doc"), F.col("h.id").alias("hist_doc"))
        .dropDuplicates(["batch_doc", "hist_doc"])
    )
    sa = sig_b.select(F.col(id_col).alias("batch_doc"), F.col("signature").alias("sig_a"))
    sb = sig_h.select(F.col(id_col).alias("hist_doc"), F.col("signature").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    return (
        cand.join(sa, "batch_doc")
        .join(sb, "hist_doc")
        .withColumn("est_jaccard", F.round(agree / F.lit(num_perm), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("batch_doc", "hist_doc", "est_jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document from token xxhash64s.

    One explode + one fused groupBy computing all bit-balances; the final
    fingerprint is assembled from the balance signs. Near-duplicate texts
    land within a small Hamming distance.
    """
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    balances = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long") if j < 63 else bit * F.lit(-(1 << 63))
        fp = term if fp is None else fp + term
    return balances.select(F.col("id").alias(id_col), fp.alias("simhash"))


def simhash_md5(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document from md5 token hashes — the
    engine-portable twin of :func:`simhash`.

    Same plan shape (one explode + one fused groupBy of 64 bit-balance
    sums), but the per-token bits come from the first 16 hex nibbles of
    ``md5(token)`` instead of xxhash64, so a DuckDB oracle replays the
    fingerprints bit-exactly (same portability discipline as
    operators/sketch.py and operators/splits.py). md5 costs more per
    token than xxhash64 — keep :func:`simhash` for throughput when
    cross-engine replay isn't needed.
    """
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("hx", F.md5("tok"))
    # nibble i = hex digit i of the md5 (0..15); bit j of the 64-bit
    # fingerprint is bit (j%4) of nibble j//4 — both instr() and the
    # shift/mask algebra exist verbatim in DuckDB. (A conv()-parsed
    # two-half variant was measured ~25% SLOWER here, unlike the minhash
    # base hash where conv won 2× — the 16 projected small ints codegen
    # better under the 64-way agg than repeated long shifts; measured,
    # not assumed.)
    nibs = tok.select(
        "id",
        *[
            (F.instr(F.lit("0123456789abcdef"), F.substring("hx", i + 1, 1)) - 1).alias(f"n{i}")
            for i in range(16)
        ],
    )
    balances = nibs.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{j // 4}"), j % 4).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long") if j < 63 else bit * F.lit(-(1 << 63))
        fp = term if fp is None else fp + term
    return balances.select(F.col("id").alias(id_col), fp.alias("simhash"))


def simhash_md5_sql(bits: int = 64) -> str:
    """DuckDB twin of :func:`simhash_md5` as a CTE body over a ``tok``
    relation with columns (doc_id, tok) — bit-exact fingerprint replay.
    Bit 63 is the sign bit: its weight is -(2^63) in two's complement,
    matching the Spark side's signed-long assembly."""

    def balance(j: int) -> str:
        nib = f"(strpos('0123456789abcdef', substr(md5(tok), {j // 4 + 1}, 1)) - 1)"
        return f"sum(CASE WHEN ({nib} >> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END)"

    def weight(j: int) -> str:
        return "(-9223372036854775807 - 1)" if j == 63 else str(1 << j)

    terms = " + ".join(
        f"CASE WHEN b{j} > 0 THEN CAST({weight(j)} AS BIGINT) ELSE 0 END"
        for j in range(bits)
    )
    bals = ",\n       ".join(f"{balance(j)} AS b{j}" for j in range(bits))
    return f"""
SELECT doc_id, {terms} AS simhash
FROM (SELECT doc_id, {bals} FROM tok GROUP BY doc_id)
"""


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    portable: bool = False,
) -> DataFrame:
    """All document pairs whose SimHash fingerprints differ in at most
    ``max_hamming`` bits — WITHOUT an O(n²) stage.

    Pigeonhole banding: the 64-bit fingerprint is split into
    ``max_hamming + 1`` bands; two fingerprints within ``max_hamming``
    bits of each other must agree exactly on at least one band, so the
    band-value equi-join generates a candidate superset with guaranteed
    100% recall, and the exact Hamming filter makes the result precise.
    Cost: one explode (×bands) + one shuffle on (band, value).
    """
    bands = max_hamming + 1
    width = (64 + bands - 1) // bands
    mask = (1 << width) - 1
    fp = (simhash_md5 if portable else simhash)(docs, id_col, text_col)
    banded = fp.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", "bv.band", "bv.val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.simhash").alias("__fa"),
            F.col("b.simhash").alias("__fb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("hamming", hamming_distance(F.col("__fa"), F.col("__fb")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def decontamination_overlap(
    corpus: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 1,
) -> DataFrame:
    """Eval-set decontamination: word n-gram collisions between training
    corpus docs and held-out eval docs, the standard benchmark-leakage
    check run before training.

    → (train_id, eval_id, n_common, eval_overlap) where ``eval_overlap``
    is the fraction of the eval doc's shingles present in the train doc.

    Scale shape: the eval side is tiny relative to a 100 TB corpus, so
    its shingle table is **broadcast** — corpus shingles stream map-side
    through the hash join and never shuffle; only the matched
    (train, eval) pairs (bounded by eval-set size × collision rate) hit
    the aggregation exchange.
    """
    tr = doc_shingles(corpus, id_col, text_col, n).select(
        F.col("id").alias("train_id"), "shingle"
    )
    ev = doc_shingles(evalset, id_col, text_col, n)
    ev_sizes = ev.groupBy("id").agg(F.count(F.lit(1)).alias("n_eval_sh"))
    common = (
        tr.join(F.broadcast(ev.select(F.col("id").alias("eval_id"), "shingle")), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(ev_sizes.select(F.col("id").alias("eval_id"), "n_eval_sh")),
            "eval_id",
        )
        .filter(F.col("n_common") >= min_common)
        .withColumn("eval_overlap", F.round(F.col("n_common") / F.col("n_eval_sh"), 4))
        .select("train_id", "eval_id", "n_common", "eval_overlap")
    )


def hot_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    top: int = 20,
) -> DataFrame:
    """Boilerplate detector: the ``top`` word n-grams by document
    frequency → (shingle, df). Repeated headers/footers/license blocks
    surface as n-grams shared by thousands of documents; this is the
    standard first look before writing boilerplate-strip rules.

    Scale shape: one explode + one groupBy on the shingle string (the
    same shuffle family as every inverted-index op here) + a top-k that
    plans as TakeOrderedAndProject — per-partition heaps of ``top``
    rows, never a global sort. Ties at the cutoff break on the shingle
    string so the result is deterministic in any partitioning.
    """
    sh = doc_shingles(docs, id_col, text_col, n)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("shingle"))
        .limit(top)
    )


def _bloom_positions(shingle: Column, k: int, hex_width: int) -> Column:
    """The ``k`` Bloom bit positions of a shingle, as ``hex_width``-char
    md5 prefixes (one shared 16^hex_width-slot array, k seeded hashes —
    md5 so any engine with a hash function can replay the filter)."""
    return F.array(
        *[
            F.substring(F.md5(F.concat(F.lit(f"b{i}:"), shingle)), 1, hex_width)
            for i in range(k)
        ]
    )


def bloom_decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 3,
    hex_width: int = 5,
    min_hit_grams: int = 2,
) -> DataFrame:
    """Bloom-filter eval-set decontamination: flag training docs whose
    word n-grams hit the Bloom filter built from the eval set's n-grams
    at least ``min_hit_grams`` times.

    This is the constant-size alternative to the exact shingle join of
    :func:`decontamination_overlap`: at 100 TB the eval shingle table
    may still be millions of rows, but its Bloom filter occupies at most
    16^hex_width slots (~1M at the default) REGARDLESS of eval-set size
    — the classic trade of filter bytes for a bounded false-positive
    rate (≈ load_factor^k per gram; false negatives are impossible,
    which is the direction decontamination must never err in).

    Plan shape: the set-bit table stays a DataFrame keyed by position
    and the membership test is a **broadcast hash join** — each of the
    corpus's k·grams probe rows costs one O(1) hash lookup. (The first
    cut shipped the bits as one array column and probed with
    ``array_contains``; that is a linear scan per probe and measured
    58× growth on 10× data — 186 s at sf0.1 vs 2.3 s for this form.
    Moral: Catalyst array/map lookups are scans, joins are the hash
    structure.) A gram is a hit when all k of its probe rows match
    (sum == k); both aggregations shrink rows before their shuffle.

    → (doc_id, n_grams, n_hit_grams, hit_rate) for flagged docs.
    """
    ev_bits = (
        doc_shingles(evalset, id_col, text_col, n)
        .select(F.explode(_bloom_positions(F.col("shingle"), k, hex_width)).alias("pos"))
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    grams = doc_shingles(corpus, id_col, text_col, n)
    probes = grams.select(
        "id",
        "shingle",
        F.explode(_bloom_positions(F.col("shingle"), k, hex_width)).alias("pos"),
    )
    per_gram = (
        probes.join(F.broadcast(ev_bits), "pos", "left")
        .groupBy("id", "shingle")
        .agg((F.sum(F.coalesce(F.col("__set"), F.lit(0))) == k).alias("__hit"))
    )
    per_doc = per_gram.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.col("__hit").cast("int")).cast("long").alias("n_hit_grams"),
    )
    return (
        per_doc.filter(F.col("n_hit_grams") >= min_hit_grams)
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_hit_grams",
            F.round(F.col("n_hit_grams") / F.col("n_grams"), 4).alias("hit_rate"),
        )
    )


def passage_dedup(
    docs: DataFrame,
    passage_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level exact dedup (the CCNet/RefinedWeb line-dedup shape,
    token-windowed because this corpus has no newlines): split each
    document into consecutive ``passage_tokens``-token windows, drop
    every repeat of a passage corpus-WIDE (first occurrence by lowest
    (doc_id, position) survives — boilerplate headers/footers shared by
    thousands of pages die here while each host document survives), then
    reassemble the surviving passages in their original order.

    Output: (doc_id, clean_text, kept_passages); documents whose every
    passage was a repeat drop out entirely.

    Scale shape: the passage explode is map-side (×⌈len/16⌉ rows of
    ~16-token strings); the keep-first decision is one shuffle on the
    32-byte passage hash (row_number over the hash partition — skew-safe
    because identical passages hash together and the window only sorts
    (doc_id, pos) longs); reassembly is one shuffle back on doc_id with
    an order-struct sort inside the aggregate, never a driver collect.
    No O(n²) stage at any corpus size.
    """
    exploded = _passage_explode(docs, passage_tokens, id_col, text_col)
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    kept = (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return _passage_reassemble(kept)


def _passage_explode(
    docs: DataFrame, passage_tokens: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, pos, passage, h): consecutive ``passage_tokens``-token
    windows of the normalized text, md5-keyed — entirely map-side.

    The token array is let-bound so tokenization runs once per doc, not
    once per window (the HOF re-evaluation trap — see bigram_lm_score's
    7→1.4 s history and word_shingle_expr)."""

    def build(w):
        # ceil(len/w) windows; len ≥ 1 always (split of "" yields [""])
        n_pass = F.ceil(F.size(w) / F.lit(passage_tokens)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n_pass, F.lit(1)) - 1),
            lambda i: F.array_join(
                F.slice(w, i * passage_tokens + F.lit(1), F.lit(passage_tokens)), " "
            ),
        )

    passages = let(tokens(F.col(text_col)), build)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(passages).alias("pos", "passage")
    ).withColumn("h", F.md5(F.col("passage")))


def _passage_reassemble(kept: DataFrame) -> DataFrame:
    """(doc_id, clean_text, kept_passages): surviving passages rejoined
    in original order — one shuffle on doc_id, sort inside the agg."""
    ordered = F.array_sort(F.collect_list(F.struct("pos", "passage")))
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["passage"]), " "
        ).alias("clean_text"),
        F.count("*").alias("kept_passages"),
    )


def boilerplate_passage_strip(
    docs: DataFrame,
    max_df: int = 4,
    passage_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate REMOVAL, the complement of :func:`passage_dedup`:
    a passage appearing in more than ``max_df`` distinct documents is
    boilerplate (header/footer/cookie banner) and is stripped from ALL
    of them — no "first occurrence" survives, unlike dedup, because the
    first page carrying a cookie banner doesn't own it. Within-doc
    repeats of a non-boilerplate passage are kept as-is.

    Scale shape: document frequency is one (hash → countDistinct doc)
    aggregation; the hot-hash set is small by construction (passages
    repeated across >max_df docs), so the anti join against it is
    AQE-converted to a broadcast at runtime — deliberately NOT a forced
    broadcast hint, because "small" is a statistical expectation, not a
    bound: a pathological corpus (one template, millions of variants)
    could push the hot set past executor memory, and the hint would
    turn a safe shuffle into an OOM. AQE picks broadcast whenever the
    runtime stats allow, which is the common case.
    """
    exploded = _passage_explode(docs, passage_tokens, id_col, text_col)
    hot = (
        exploded.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    kept = exploded.join(hot, "h", "left_anti")
    return _passage_reassemble(kept)


def sliding_window_grams(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, h): every stride-1 ``k``-token window of the
    normalized text, md5-keyed — the candidate stream for EXACT
    substring dedup (Lee et al. 2021, arXiv:2107.06499, which shows
    repeated spans — not just repeated documents — drive memorization).

    Entirely map-side: the token array is let-bound (one tokenization
    per doc), positions are 1-based, windows per doc = len − k + 1.
    Docs shorter than ``k`` tokens emit nothing. Unlike the passage
    explode (stride = window), stride-1 emits ~len rows per doc — the
    honest cost of exact-substring sensitivity; k is the dial between
    recall and volume."""

    def build(w):
        # Short docs (size < k) get an EMPTY window list rather than a
        # pre-filter on F.size(tokens(...)) — a separate filter would
        # tokenize every doc a second time (sequence(1, size-k+1) with a
        # negative stop would otherwise descend, so the guard is needed
        # either way; here it rides the same let-bound array).
        return F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - F.lit(k - 1)),
                lambda i: F.md5(F.array_join(F.slice(w, i, F.lit(k)), " ")),
            ),
        ).otherwise(F.array().cast("array<string>"))

    toks = tokens(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(let(toks, build)).alias("pos0", "h"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    wins: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated token spans per document — exact substring
    dedup's reporting half: every position covered by a k-token window
    whose hash occurs ≥ ``min_count`` times corpus-wide is duplicated;
    overlapping/adjacent duplicated windows merge into maximal spans.

    Output: (doc_id, span_start, span_end, span_tokens) with token
    positions 1-based and span_end exclusive. The production strip step
    is one `slice`+`array_join` away (drop covered tokens), exactly as
    passage_dedup reassembles.

    Scale shape — the Spark answer to the paper's suffix array: one
    map-side window explode, one map-side-combinable count on the
    32-byte hash (skew-safe: identical windows co-hash, and the count
    table collapses to |distinct grams|), a semi-join of the window
    stream against the ≥min_count hash set (AQE broadcasts when small),
    then gaps-and-islands per document — windows partitioned by doc_id,
    bounded by tokens-per-doc, never corpus-global. No suffix array, no
    driver state, no O(n²).

    The window stream feeds BOTH the hash-count aggregate and the
    semi-join probe side. It is deliberately NOT persisted by default:
    the stream is ~k× the corpus and purely map-side, and persisting it
    was MEASURED SLOWER than recomputing — materializing the explode
    pushed the 10×-data growth factor from 1.39× to 3.79× in the r5
    bench (write+read of the k×corpus stream costs more than a second
    tokenize+explode pass ever does). Callers that already hold a
    (possibly persisted) stream can still pass it via ``wins``; on a
    real cluster the equivalent boundary is a written gram gold table,
    which pays its materialization once across MANY queries, not
    twice inside one."""
    if wins is None:
        wins = sliding_window_grams(docs, k, id_col, text_col)
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("h")
    )
    dup = wins.join(dup_h, "h", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + F.lit(k)).alias("end")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = (
        dup.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max("end").cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every duplicated span (see :func:`duplicate_spans`) from
    every document — the strip step of exact substring dedup. Unlike
    keep-first document dedup, NO occurrence survives: a span repeated
    anywhere in the corpus is memorization risk in each of its hosts
    (Lee et al. 2021 strip repeated substrings globally for the same
    reason the boilerplate pass strips, not dedups).

    Output: (doc_id, clean_text, kept_tokens, dropped_tokens); docs
    whose every token was covered drop out (clean_text would be empty).

    Scale: positions are re-derived map-side, covered positions come
    from a per-document range join against that document's own spans
    (span lists are tokens-per-doc bounded), and reassembly is the same
    one-shuffle order-struct aggregate as passage_dedup. The span table
    is small (merged islands), so AQE broadcasts the join when it can.
    """
    # lazy shared frame — see duplicate_spans' docstring: persisting the
    # k×corpus window stream measured slower than recomputing map-side
    wins = sliding_window_grams(docs, k, id_col, text_col)
    spans = duplicate_spans(docs, k, min_count, id_col, text_col, wins=wins)
    # NOTE: ``toks`` is a second tokenize of the same corpus — it carries
    # the token TEXT (for reassembly), which the hash-only ``wins`` frame
    # deliberately does not; re-tokenizing map-side is cheaper than
    # shuffling tokens through the span machinery.
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    covered = (
        toks.join(spans, "doc_id")
        .filter(
            (F.col("pos") >= F.col("span_start")) & (F.col("pos") < F.col("span_end"))
        )
        .select("doc_id", "pos")
        .distinct()
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "tok")))
    n_total = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(F.transform(ordered, lambda s: s["tok"]), " ").alias(
                "clean_text"
            ),
            F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        )
        .join(n_total, "doc_id")
        .select(
            "doc_id",
            "clean_text",
            "kept_tokens",
            (F.col("__n") - F.col("kept_tokens")).cast("long").alias("dropped_tokens"),
        )
    )


def minhash_signature_expr(
    text_col: Column, n: int = 3, num_perm: int = 32
) -> Column:
    """Row-local portable MinHash signature (array<long>) — the
    map-side twin of :func:`minhash_signatures` (portable=True): the
    minimum of each seeded affine permutation of the 31-bit md5 base
    hash over the document's distinct shingles, folded per ROW with
    higher-order functions instead of explode+groupBy. Same
    coefficients, same arithmetic, bit-identical signatures (pinned by
    pytest equivalence against the aggregation path).

    Exists for STREAMING: a file stream cannot run the explode+groupBy
    signature aggregation without stateful-op restrictions, but this
    expression keeps the whole signature stage map-side, so the
    incremental near-dup screen runs as stream-static joins only.
    Documents with no shingles (< n tokens) produce NULL minima —
    callers filter them out, matching the explode path which simply
    never emits such docs.

    Both shingle array and base-hash array are let-bound: tokenization
    runs once and each of the ``num_perm`` permutations folds over the
    SAME hashed array (un-bound, every permutation would recompute one
    md5 per shingle — 32× the hash work)."""

    def over_hashes(h31s: Column) -> Column:
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        h31s,
                        lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31),
                    )
                )
                for a, b in minhash_coeffs(num_perm)
            ]
        )

    def over_shingles(sh: Column) -> Column:
        return let(
            F.transform(sh, lambda s: _md5_h31(F.md5(s))), over_hashes
        )

    return let(word_shingle_expr(text_col, n), over_shingles)
