"""Distributed suffix array over the tokenized corpus by PREFIX
DOUBLING (Manber & Myers 1990, the larsson–sadakane doubling variant as
log-round DataFrame algebra) — the data structure Lee et al. 2021's
exact-substring deduplication is actually built on (the engine's
duplicate_spans family finds FIXED-length window matches; the suffix
array finds the LONGEST repeated spans exactly, at any length).

Round structure (the part that matters at 100 TB):

1. Rank 0 = dense rank of the token itself — a distinct-vocabulary
   table ranked by :func:`operators.prefix.range_sharded_cumsum` (no
   single-partition window), joined back to positions.
2. Round k: each suffix's sort key becomes the PAIR (rank[p],
   rank[p + 2^(k-1)]), re-densified by ranking the DISTINCT pair table
   (again range-sharded) and joining back. After round k, equal ranks
   ⟺ equal first 2^k tokens.
3. Stop when every rank is unique (one count/countDistinct scalar per
   round — the k-center API-boundary discipline) or 2^k exceeds the
   longest document.

Suffixes are DOC-BOUNDED (each document is its own string; spans never
cross documents — the semantics dedup wants), so the round count is
O(log max_doc_tokens): a CONSTANT in corpus size — ~7 rounds whether
the corpus is 500 documents or 500 billion. Each round is two hash
shuffles (distinct + join-back) plus one range exchange, all linear in
corpus positions; every round's rank table is eagerly checkpointed
(O(1) lineage, one codegen stage per round — the unigram-EM loop
discipline).

Ties in the final ranks are EXACTLY the identical suffixes (duplicate
spans to end-of-doc); the suffix-array order breaks them by
(doc_id, off), which both the oracle and the Python replica mirror.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.text import tokens
from covid_data_challenge_spark.operators.prefix import (
    range_sharded_cumsum,
    range_sharded_dense_rank,
)


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, off, tok): one row per token position, off 1-based."""
    return docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("__p", "tok")
    ).select("doc_id", (F.col("__p") + 1).cast("int").alias("off"), "tok")


def window_positions(
    docs: DataFrame, width: int, text_col: str = "text"
) -> DataFrame:
    """(doc_id, off, win): the ``width``-token window starting at each
    position (shorter at doc tail) as a SPACE-JOINED STRING — the seed
    comparator for the doubling: a window is exactly the first
    min(width, remaining) tokens of its suffix, so dense-ranking
    windows IS rank round log4(width) without any doubling rounds
    below it. String form, not array: the separator (0x20) sorts
    strictly below every normalized-token character, so the joined
    string orders EXACTLY like the token array — ['a','b'] < ['ab']
    because "a b" < "ab" — while hashing/joining/range-sampling a flat
    string is several times cheaper than a 16-element array (measured
    on the seed rank). The split is bound to a column BEFORE the
    transform — the lambda reads the array per element and a raw
    tokens(text) subtree would re-run normalize+split each read (the
    hll_sparse_distinct lesson)."""
    base = docs.select("doc_id", tokens(F.col(text_col)).alias("__ws"))
    ws = F.col("__ws")
    return base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(ws)),
                lambda o: F.concat_ws(" ", F.slice(ws, o, width)),
            )
        ).alias("__p", "win"),
    ).select("doc_id", (F.col("__p") + 1).cast("int").alias("off"), "win")


def suffix_ranks(
    docs: DataFrame,
    max_len: int,
    cap: int = 64,
    seed_width: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Prefix-doubling ranks → (doc_id, off, r) where r orders suffixes
    by their first ``cap`` tokens (ties ⟺ first-``cap``-token-equal
    suffixes — the bounded-context comparator the span query and its
    oracle share; ``cap`` and ``seed_width`` must be powers of 4).

    Two accelerations over textbook binary doubling, both pure
    reshapes of the same comparator:

    - **Window seeding**: rank 0 dense-ranks the ``seed_width``-token
      WINDOW at each position (arrays range-partition and equi-join
      fine), entering the loop at covered length 16 instead of 1 —
      windows are prefixes of their suffixes, so the order is identical
      by construction. Costs one O(n·seed_width) explode, which is the
      materialization/latency trade at its sweet spot: seeding at
      ``cap`` itself would materialize the full O(n·cap) naive sort.
    - **RADIX-4 rounds**: round k combines (rank[p], rank[p+k],
      rank[p+2k], rank[p+3k]) — covered length ×4 per round, so
      16 → 64 is ONE shifted self-join + distinct-tuple re-rank.

    Net: TWO dense-rank rounds to a 64-token comparator (vs six binary
    rounds from width 1; measured 23 s → ~8 s on the sf0.1 span query).
    At larger caps the loop keeps quadrupling — cap 1024 is 4 rounds."""
    for name, v in (("cap", cap), ("seed_width", seed_width)):
        if v & (v - 1) or v.bit_length() % 2 == 0:
            raise ValueError(f"{name} must be a power of 4, got {v}")
    if cap < seed_width:
        raise ValueError("cap must be >= seed_width")
    # Dense ranks are computed IN PLACE (range_sharded_dense_rank: one
    # range exchange + per-shard window + K-row offset broadcast)
    # instead of the distinct → rank → join-back round trip — r12,
    # saves ~2 positions-scale exchanges per ranking (seed + every
    # middle round).
    wp = window_positions(docs, seed_width, text_col)
    ranks = (
        range_sharded_dense_rank(wp, ["win"], "r")
        .select("doc_id", "off", "r")
        .localCheckpoint(eager=True)
    )
    # The position count is loop-invariant (every round keeps exactly
    # one row per suffix) — hoist it; each round's distinct-rank count
    # is then just max(r) over the freshly densified table (ranks are
    # dense 1..d by construction), ONE cheap agg on a checkpointed
    # frame instead of the count+countDistinct expand pass per round.
    n_pos = None
    covered = seed_width
    while covered < min(cap, max_len):
        paired = _radix4_tuple(ranks, covered)
        covered *= 4
        if covered >= min(cap, max_len):
            # LAST round: the tuple only feeds an ORDERING downstream,
            # so re-densification (a full re-rank) is pure waste —
            # return the tuple columns as the comparator
            # (order-equivalent to the densified rank by construction).
            # Middle rounds must densify: their output re-enters a
            # shift/pack step that needs one scalar rank.
            return paired
        ranks = (
            range_sharded_dense_rank(paired, ["r", "r2", "r3", "r4"], "__nr")
            .select("doc_id", "off", F.col("__nr").alias("r"))
            .localCheckpoint(eager=True)
        )
        if n_pos is None:
            n_pos = ranks.count()
        d = ranks.agg(F.max("r")).collect()[0][0]
        if n_pos == d:
            break  # all suffixes distinguished — no more doubling needed
    return ranks


def _radix4_tuple(ranks: DataFrame, k: int) -> DataFrame:
    """(doc_id, off, r, r2, r3, r4): each position's rank 4-tuple at
    shifts (0, k, 2k, 3k); missing positions (suffix shorter than the
    shift) take −1 so shorter prefixes sort first."""
    paired = ranks
    for j, shift in enumerate((k, 2 * k, 3 * k), start=2):
        shifted = ranks.select(
            "doc_id",
            (F.col("off") - shift).cast("int").alias("off"),
            F.col("r").alias(f"__s{j}"),
        )
        paired = paired.join(shifted, ["doc_id", "off"], "left")
    return paired.select(
        "doc_id", "off", "r",
        *[
            F.coalesce(f"__s{j}", F.lit(-1)).cast("long").alias(f"r{j}")
            for j in (2, 3, 4)
        ],
    )


def suffix_array(
    docs: DataFrame, max_len: int, cap: int = 64, text_col: str = "text"
) -> DataFrame:
    """(doc_id, off, sa_pos): the suffix array under the first-``cap``-
    token comparator — global 1-based position of each suffix, ties
    (first-``cap``-equal suffixes) broken by (doc_id, off)."""
    ranks = suffix_ranks(docs, max_len, cap, text_col=text_col)
    order_cols = [c for c in ("r", "r2", "r3", "r4") if c in ranks.columns]
    sa = range_sharded_cumsum(
        ranks.withColumn("__one", F.lit(1)),
        order_cols + ["doc_id", "off"],
        {"__one": "sa_pos"},
    )
    return sa.select("doc_id", "off", F.col("sa_pos").cast("long").alias("sa_pos"))


def longest_repeated_spans(
    docs: DataFrame, top_k: int = 20, cap: int = 64, text_col: str = "text"
) -> DataFrame:
    """Longest repeated token spans in the corpus, exactly: adjacent
    suffix-array entries share the longest common prefixes anywhere in
    the corpus (the defining property of the SA), so one pass over the
    n−1 adjacent pairs finds every maximal repeat — within or across
    documents. LCP is an ordered short-circuit fold over the two
    suffixes' first ``cap`` tokens (documents are the span boundary, so
    ``cap`` bounds the compare, not the data). Output: top ``top_k``
    by (lcp desc, doc_a, off_a, doc_b, off_b) with the repeated span
    text — a TakeOrderedAndProject, never a global sort."""
    max_len = (
        token_positions(docs, text_col)
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    if max_len is None:  # max over zero rows is NULL, not 0
        raise ValueError(
            "longest_repeated_spans: empty corpus (no tokenized documents)"
        )
    # The SA feeds BOTH sides of the adjacency self-join below; without a
    # boundary the whole doubling pipeline (seed rank, radix rounds, the
    # final range-sharded cumsum) is a shared subtree Spark may or may
    # not reuse across the two consumers — checkpoint once (|positions|
    # rows of three longs) so it provably runs once (r12, measured ~2 s
    # of duplicated rank work at sf0.1).
    sa = suffix_array(docs, int(max_len), cap, text_col).localCheckpoint(eager=True)
    arrays = docs.select("doc_id", tokens(F.col(text_col)).alias("__ws"))

    left = sa.select(
        F.col("sa_pos"),
        F.col("doc_id").alias("doc_a"),
        F.col("off").alias("off_a"),
    )
    right = sa.select(
        (F.col("sa_pos") - 1).alias("sa_pos"),
        F.col("doc_id").alias("doc_b"),
        F.col("off").alias("off_b"),
    )
    # The LCP stage downstream is per-ROW CPU-bound (an interpreted
    # higher-order fold over up to ``cap`` tokens, ~100 µs/row) while its
    # INPUT rows here are ~32 bytes — AQE coalesces the adjacency
    # exchange by bytes (observed 5 post-AQE partitions at sf0.1, i.e.
    # the fold on 5 of 32 cores for a 50× downstream byte+CPU blowup
    # once the token arrays attach). Re-spread the cheap rows over the
    # session's cores before attaching arrays: the extra exchange moves
    # ~32 B/row (≈1 µs) to save ~100 µs/row of serialized compute, and
    # sizes the CPU-bound stage in one wave at any scale
    # (defaultParallelism = cluster cores, never a local constant).
    adj = left.join(right, "sa_pos").repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    withs = (
        adj.join(
            arrays.select(F.col("doc_id").alias("doc_a"), F.col("__ws").alias("__wa")),
            "doc_a",
        )
        .join(
            arrays.select(F.col("doc_id").alias("doc_b"), F.col("__ws").alias("__wb")),
            "doc_b",
        )
        .select(
            "doc_a", "off_a", "doc_b", "off_b",
            F.slice(F.col("__wa"), F.col("off_a"), cap).alias("__s1"),
            F.slice(F.col("__wb"), F.col("off_b"), cap).alias("__s2"),
        )
    )
    # LCP = index of the first mismatch: one zip_with equality mask +
    # array_position — two flat interpreted passes over ≤ cap elements
    # instead of the old stateful struct-allocating fold (~5 expression
    # nodes per element per step; this stage is the span query's
    # CPU-bound tail, guide §1.2 step 2 per-task work). Positions past
    # the shorter array compare NULL ⇒ coalesce(false) ⇒ mismatch, so
    # position 0 (no mismatch) can only mean fully-equal arrays of
    # equal length.
    m = F.least(F.size("__s1"), F.size("__s2"))

    def _lcp_over(s1: Column, s2: Column, full: Column) -> Column:
        first_ne = F.array_position(
            F.zip_with(
                s1, s2, lambda a, b: F.coalesce(a == b, F.lit(False))
            ),
            F.lit(False),
        )
        return F.when(first_ne == 0, full).otherwise(first_ne - 1)

    if cap > 64:
        # two-phase compare: adjacent suffixes rarely share 64+ tokens,
        # so probe the first 64 and only pay the full cap-wide zip on a
        # phase-1 tie (lcp1 == 64 ⇔ first 64 equal on both sides; the
        # CASE branch evaluates lazily per row). Bit-equal by
        # construction: a mismatch inside 64 is final, and the full
        # compare re-derives the whole prefix otherwise.
        lcp1 = _lcp_over(
            F.slice(F.col("__s1"), 1, 64),
            F.slice(F.col("__s2"), 1, 64),
            F.least(m, F.lit(64)),
        )
        lcp = F.when(
            lcp1 < 64, lcp1
        ).otherwise(_lcp_over(F.col("__s1"), F.col("__s2"), m))
    else:
        lcp = _lcp_over(F.col("__s1"), F.col("__s2"), m)
    scored = withs.select(
        "doc_a", "off_a", "doc_b", "off_b",
        lcp.cast("int").alias("lcp"),
        F.col("__s1").alias("__s1"),
    ).filter(F.col("lcp") >= 2)
    return (
        scored.orderBy(
            F.col("lcp").desc(), "doc_a", "off_a", "doc_b", "off_b"
        )
        .limit(top_k)
        .select(
            "lcp",
            F.concat_ws(" ", F.slice(F.col("__s1"), 1, F.col("lcp"))).alias("span"),
            "doc_a", "off_a", "doc_b", "off_b",
        )
    )
