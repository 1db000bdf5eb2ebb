"""Unigram-LM tokenizer training (SentencePiece's model family, Kudo
2018, arXiv:1804.10959) — ONE hard-EM (Viterbi) round as pure DataFrame
algebra, the probabilistic sibling of the BPE merge loop in
operators/bpe.py.

The round:

1. Seed vocabulary: every substring (length ≤ ``max_piece``) of every
   dictionary word, weighted by word frequency; keep ALL single
   characters (coverage guarantee) plus the top ``vocab_top``
   multi-character pieces. Seed score = ln(freq/total) — exactly
   Kudo's suffix-array-seeded initialization, bounded to short pieces.
2. E-step: Viterbi-segment each dictionary word under the seed scores —
   a per-word dynamic program over ≤ ``max_word`` positions.
3. M-step: piece usage counts from the Viterbi paths (weighted by word
   frequency) → re-estimated scores. Pieces with zero usage are the
   ones Kudo's loop prunes next round.

Scale design (the bpe.py discipline): the corpus is scanned ONCE into
the (word, n) frequency dictionary — vocabulary-sized by Heaps' law —
and every EM step runs over that dictionary or over piece tables
smaller still. The DP is a per-ROW column expression (two
``F.aggregate`` folds over arrays bounded by ``max_word``), so the
E-step is embarrassingly parallel with no shuffle beyond the M-step's
piece aggregation.

Bit-exactness (what makes the DuckDB oracle possible): piece scores are
integer micro-nats (``floor(1e6·(portable_ln f − portable_ln F))``), so
the Viterbi DP is INTEGER arithmetic — no float argmax ties across
engines, ever. Candidates compare as ``total·8 + j`` (score first, then
piece length j, longer wins ties), one BIGINT per DP cell; the oracle
unrolls the same DP as chained CTE columns and decodes identical cells.

Words longer than ``max_word`` characters are excluded from the EM
dictionary (documented contract — at web scale those are the URL/hash
junk a tokenizer pipeline pre-filters anyway; the fixture corpus tops
out at 8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.pmath import portable_ln, portable_ln_let
from covid_data_challenge_spark.functions.text import tokens

MAX_PIECE = 4
MAX_WORD = 12
VOCAB_TOP = 64

#: sentinel for an unreachable DP candidate — far below any real total
#: (|score| ≤ max_word · ~30e6 micro-nats ≈ 4e8, times 8 ≈ 3e9 ≪ 2^50)
_NEG_INF = -(2**50)


def _decode_j(c: Column) -> Column:
    """Piece length j from a combined DP cell (total·8 + j)."""
    return ((c % 8) + 8) % 8


def _decode_total(c: Column) -> Column:
    """Score total from a combined DP cell — exact: c − j is a multiple
    of 8 and |c| ≪ 2^53, so the double division is exact."""
    return ((c - _decode_j(c)) / F.lit(8)).cast("long")


def word_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → the (w, n) word-frequency dictionary the whole
    EM round trains on, bounded to ``MAX_WORD``-char words."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= MAX_WORD))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _substrings(wd: DataFrame) -> DataFrame:
    """(w, n, start, len, piece) for every substring of length ≤
    MAX_PIECE — the seed-candidate explode, map-side."""
    sub = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda s: F.transform(
                    F.sequence(
                        F.lit(1), F.least(F.lit(MAX_PIECE), F.length("w") - s + 1)
                    ),
                    lambda j: F.struct(
                        s.cast("int").alias("start"),
                        j.cast("int").alias("len"),
                        F.substring(F.col("w"), s, j).alias("piece"),
                    ),
                ),
            )
        )
    )
    return wd.select("w", "n", sub.alias("sl")).select(
        "w", "n", F.col("sl.start").alias("start"), F.col("sl.len").alias("len"),
        F.col("sl.piece").alias("piece"),
    )


def seed_vocab(wd: DataFrame) -> DataFrame:
    """Seed piece table (piece, f, u): substring frequencies weighted by
    word counts; ALL single chars + top ``VOCAB_TOP`` multi-char pieces
    by (f desc, piece asc); u = integer micro-nat log-probability."""
    # pf feeds FOUR consumers (singles, the multis top-k, the total, and
    # the final join) — checkpoint the piece-frequency table once or the
    # substring explode + groupBy runs four times inside the seed job
    # (measured 3.5 s → ~0.9 s at sf0.1; the table is bounded by the
    # dictionary's distinct ≤MAX_PIECE-char substrings)
    pf = (
        _substrings(wd)
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("f"))
        .localCheckpoint(eager=True)
    )
    singles = pf.filter(F.length("piece") == 1)
    multis = (
        pf.filter(F.length("piece") >= 2)
        .orderBy(F.col("f").desc(), "piece")
        .limit(VOCAB_TOP)
    )
    vocab = singles.unionByName(multis)
    total = vocab.agg(F.sum("f").cast("long").alias("__ftot"))
    return vocab.join(F.broadcast(total)).select(
        "piece",
        "f",
        F.floor(
            F.lit(1000000.0)
            * (
                portable_ln(F.col("f").cast("double"))
                - portable_ln(F.col("__ftot").cast("double"))
            )
        )
        .cast("long")
        .alias("u"),
    )


def _vocab_map(vocab: DataFrame) -> Column:
    """The (piece → u) score table as a LITERAL map column.

    The vocabulary is BOUNDED by construction (all single characters of
    the corpus alphabet + at most ``VOCAB_TOP`` multi-char pieces —
    model parameters, not data), so collecting it to the driver is the
    k-center API-boundary-scalar discipline, and inlining it as a map
    literal deletes the per-E-step substring explode + piece join +
    per-word ``collect_list`` shuffle the old slot-map build paid
    (optimization guide §2.4: remove shuffles outright — the E-step
    becomes a shuffle-free map over the checkpointed dictionary).
    Values are collected integers (micro-nats), so the DP stays
    bit-exact; lookups of absent pieces return NULL exactly like the
    old inner-join-then-``element_at`` path."""
    rows = vocab.select("piece", "u").collect()
    if not rows:
        return F.expr("cast(map() as map<string,bigint>)")
    # ONE parsed SQL expression, not 2·|vocab| py4j lit() round trips
    # (the r12 LSH _proj_sql lesson — the driver is part of the query
    # path, guide §5). Spark string literals process backslash escapes
    # BEFORE quote-doubling is seen, so backslashes must be doubled
    # first (ADVICE r12: a corpus backslash otherwise breaks the parse
    # or silently remaps pieces like "\\n"); quotes double as usual.
    parts = []
    for r in rows:
        esc = r["piece"].replace("\\", "\\\\").replace("'", "''")
        parts.append(f"'{esc}', {int(r['u'])}L")
    return F.expr("map(" + ", ".join(parts) + ")")


def viterbi_segments(wd: DataFrame, vocab: DataFrame) -> DataFrame:
    """E-step: (w, n, piece) — each dictionary word's Viterbi-best
    segmentation under the vocab scores, exploded to its pieces.

    The DP runs as one ``F.aggregate`` fold per word over positions
    1..len(w): cell i holds ``best_total·8 + j`` for the best
    segmentation of the prefix ending at i (j = length of its final
    piece; ties prefer the longer piece). Piece scores come from the
    literal vocab map (:func:`_vocab_map`) looked up directly on
    ``substring(w, i−j+1, j)`` — the whole E-step is one shuffle-free
    projection over the dictionary (r12; the old path exploded every
    substring, joined the vocab, and re-grouped per word — two
    dictionary-scale shuffles per EM round). Backtracking is a second
    bounded fold walking ``pos → pos − j``. Single characters are
    always in the vocab, so every position has a valid candidate and
    the sentinel never wins."""
    vm = _vocab_map(vocab)
    per_word = wd.select("w", "n", vm.alias("m"))

    def cell(acc: Column, i: Column) -> Column:
        cands = []
        for j in range(1, MAX_PIECE + 1):
            u_ij = F.element_at(
                F.col("m"), F.substring(F.col("w"), (i - j + 1).cast("int"), j)
            )
            prev = F.element_at(acc, (i - j + 1).cast("int"))
            cands.append(
                F.when(
                    (F.lit(j) <= i) & u_ij.isNotNull(),
                    (_decode_total(prev) + u_ij) * 8 + F.lit(j),
                ).otherwise(F.lit(_NEG_INF))
            )
        return F.concat(acc, F.array(F.greatest(*cands)))

    dp = per_word.withColumn(
        "dp",
        F.aggregate(
            F.sequence(F.lit(1), F.length("w")),
            F.array(F.lit(0).cast("long")),
            cell,
        ),
    )

    # backtrack: struct state (pos, pieces); at most MAX_WORD steps
    def step(st: Column, _i: Column) -> Column:
        pos = st.getField("pos")
        j = _decode_j(F.element_at(F.col("dp"), (pos + 1).cast("int")))
        return F.when(
            pos > 0,
            F.struct(
                (pos - j).cast("int").alias("pos"),
                F.concat(
                    F.array(F.substring(F.col("w"), (pos - j + 1).cast("int"), j.cast("int"))),
                    st.getField("pieces"),
                ).alias("pieces"),
            ),
        ).otherwise(st)

    walked = dp.withColumn(
        "seg",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(MAX_WORD)),
            F.struct(
                F.length("w").cast("int").alias("pos"),
                F.array().cast("array<string>").alias("pieces"),
            ),
            step,
        ).getField("pieces"),
    )
    # posexplode: piece order within a word is part of the segmentation
    # (equal-score paths can share a multiset, e.g. "aaa" as a+aa vs
    # aa+a) — downstream counts ignore pos, tests sort on it
    return walked.select(
        "w", "n", F.posexplode("seg").alias("pos", "piece")
    )


def unigram_em_round(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One full hard-EM round → (piece, piece_len, seed_freq,
    viterbi_count, kept, new_score_units): the seed table annotated with
    Viterbi usage (M-step counts, 0 for pieces no best path uses — the
    prune set) and the re-estimated integer micro-nat score."""
    wd = word_dictionary(docs, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wd).localCheckpoint(eager=True)
    used = _round_usage(wd, vocab)
    joined = vocab.join(used, "piece", "left").select(
        "piece",
        "f",
        F.coalesce(F.col("vc"), F.lit(0)).cast("long").alias("vc"),
    )
    vtot = joined.agg(F.sum("vc").cast("long").alias("__vtot"))
    return joined.join(F.broadcast(vtot)).select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.col("f").alias("seed_freq"),
        F.col("vc").alias("viterbi_count"),
        (F.col("vc") > 0).alias("kept"),
        F.when(
            F.col("vc") > 0,
            # let-bound variant: inside a CASE branch, codegen's
            # subexpression elimination is off and the plain tree blows
            # janino's 64 KB method limit (r6 interpreted-mode fallback)
            F.floor(
                F.lit(1000000.0)
                * (
                    portable_ln_let(F.col("vc").cast("double"))
                    - portable_ln_let(F.col("__vtot").cast("double"))
                )
            ).cast("long"),
        ).alias("new_score_units"),
    )


def unigram_encode_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The serve half (train→encode, mirroring bpe_encode_stats): train
    the seed vocab, Viterbi-segment the word DICTIONARY once, then
    broadcast the vocab-sized (word → piece count) table into one pass
    over corpus word instances → per-document (n_words, n_pieces,
    pieces_per_word). The corpus is never segmented row by row — the
    dictionary segmentation amortizes across every occurrence, which is
    the entire point of training on the Heaps-bounded dictionary."""
    wd = word_dictionary(docs, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wd).localCheckpoint(eager=True)
    wpc = (
        viterbi_segments(wd, vocab)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    docw = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= MAX_WORD))
    return (
        docw.join(F.broadcast(wpc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("k").cast("long").alias("n_pieces"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("pieces_per_word"),
        )
    )


def _round_usage(wd: DataFrame, vocab: DataFrame) -> DataFrame:
    """One E-step: Viterbi-segment the dictionary under ``vocab`` scores
    → per-piece usage counts (piece, vc), weighted by word frequency."""
    return (
        viterbi_segments(wd, vocab)
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("vc"))
    )


def _rescored_vocab(
    vocab: DataFrame, used: DataFrame, count_alias: str | None = None
) -> DataFrame:
    """One prune/re-score refit cycle (the shared M-step of the k-round
    EM trainer, the round-k serve path, and the converged trainer —
    ADVICE r7: a single implementation is what guarantees train-vs-serve
    bit-exactness): prune zero-usage pieces (keeping all single chars —
    the coverage guarantee), re-score from usage (zero-usage singles
    take the smoothed ln(1/total) floor). Returns (piece[, count_alias],
    u), ``localCheckpoint``-ed EAGERLY — that boundary is load-bearing
    twice over: (a) O(1) lineage per round, and (b) each Viterbi fold
    compiles as its OWN whole-stage-codegen stage under janino's 64 KB
    method limit (the r6 interpreted-mode fallback)."""
    rj = vocab.select("piece").join(used, "piece", "left").select(
        "piece", F.coalesce(F.col("vc"), F.lit(0)).cast("long").alias("vc")
    )
    vtot = rj.agg(F.sum("vc").cast("long").alias("__vt"))
    cols = ["piece"]
    if count_alias is not None:
        cols.append(F.col("vc").alias(count_alias))
    cols.append(
        F.floor(
            F.lit(1000000.0)
            * (
                portable_ln(F.greatest(F.col("vc"), F.lit(1)).cast("double"))
                - portable_ln(F.col("__vt").cast("double"))
            )
        )
        .cast("long")
        .alias("u")
    )
    return (
        rj.join(F.broadcast(vtot))
        .filter((F.col("vc") > 0) | (F.length("piece") == 1))
        .select(*cols)
        .localCheckpoint(eager=True)
    )


def _final_em_table(
    vocab: DataFrame, usedk: DataFrame, prev_count: str
) -> DataFrame:
    """The k-round EM output table: the round-k vocabulary annotated
    with round-k Viterbi usage and re-estimated scores."""
    j = vocab.join(usedk.withColumnRenamed("vc", "vck"), "piece", "left").select(
        "piece",
        prev_count,
        F.coalesce(F.col("vck"), F.lit(0)).cast("long").alias("vck"),
    )
    vtotk = j.agg(F.sum("vck").cast("long").alias("__vtk"))
    return j.join(F.broadcast(vtotk)).select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        prev_count,
        F.col("vck").alias("viterbi_count"),
        (F.col("vck") > 0).alias("kept"),
        F.when(
            F.col("vck") > 0,
            # let-bound: see unigram_em_round's new_score_units note
            F.floor(
                F.lit(1000000.0)
                * (
                    portable_ln_let(F.col("vck").cast("double"))
                    - portable_ln_let(F.col("__vtk").cast("double"))
                )
            ).cast("long"),
        ).alias("new_score_units"),
    )


def unigram_em_rounds(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """K chained hard-EM rounds — the REAL SentencePiece trainer loop
    (Kudo 2018 §3.2), generalizing the fixed two-step: round 1 exactly
    as :func:`unigram_em_round`; each later round PRUNES zero-usage
    pieces (keeping all single chars — the coverage guarantee),
    RE-SCORES from the previous round's usage (zero-usage singles take
    the smoothed ln(1/total) floor), and re-runs Viterbi under the new
    scores.

    Every round's re-scored vocabulary is ``localCheckpoint``-ed
    EAGERLY. That boundary is load-bearing twice over: (a) it is the
    loop's O(1)-lineage guarantee — round r's plan always starts from
    a materialized vocab, never from r−1 DP unrolls — and (b) it keeps
    each Viterbi fold compiling as its OWN whole-stage-codegen stage,
    under janino's 64 KB method limit, instead of two chained DP
    expression trees fused into one generated method (the r6
    interpreted-mode fallback).

    Output: (piece, piece_len, round{k-1}_count, viterbi_count, kept,
    new_score_units) over the round-k vocabulary — the artifact after
    k−1 full prune-and-refit cycles."""
    if k < 2:
        raise ValueError("unigram_em_rounds needs k >= 2; use unigram_em_round")
    wd = word_dictionary(docs, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wd).select("piece", "u").localCheckpoint(eager=True)
    prev_count = "round1_count"
    for r in range(1, k):
        prev_count = f"round{r}_count"
        vocab = _rescored_vocab(vocab, _round_usage(wd, vocab), prev_count)
    return _final_em_table(vocab, _round_usage(wd, vocab), prev_count)


def unigram_em_converged(
    docs: DataFrame, tol: int = 0, k_max: int = 8, text_col: str = "text"
) -> DataFrame:
    """Convergence-stopped EM (VERDICT r7 next-round #5) — the real
    SentencePiece trainer termination: loop prune/re-score rounds until
    the corpus Viterbi log-likelihood stops improving by more than
    ``tol`` micro-nats (with a ``k_max`` bound), instead of a fixed k.

    The likelihood needs no extra pass: the round-r best-path corpus
    log-probability under the round-r scores is exactly
    Σ_piece vc_r · u_r — an INTEGER micro-nat sum over the vocab-sized
    usage table, order-free and bit-identical across engines. Each round
    collects that one BIGINT as an API-boundary scalar (the k-center
    discipline: driver state is one number per round, bounded by
    ``k_max``); hard EM is monotone here, so the delta hits ``tol``
    quickly on any stationary corpus.

    Output: the round-k EM table exactly as :func:`unigram_em_rounds`
    (k = realized rounds) with the previous-round count under the FIXED
    name ``prev_round_count`` (the realized k is data-dependent, so the
    column can't carry it) plus ``rounds_run`` and ``ll_delta_units``
    — the oracle chains the same number of rounds and pins both."""
    if k_max < 2:
        raise ValueError("unigram_em_converged needs k_max >= 2")
    wd = word_dictionary(docs, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wd).select("piece", "u").localCheckpoint(eager=True)
    prev_ll: int | None = None
    delta: int = 0
    rounds = 0
    while True:
        rounds += 1
        # usage feeds BOTH the likelihood scalar and (maybe) the refit —
        # checkpoint so the Viterbi segmentation runs once per round.
        # LAZY (r13, VERDICT r12 #7): the very next statement's collect
        # is the action that materializes it, so an eager checkpoint
        # here only added a second Spark job per round for the same
        # work; the refit path reads the persisted blocks either way.
        used = _round_usage(wd, vocab).localCheckpoint(eager=False)
        ll_raw = (
            used.join(vocab.select("piece", "u"), "piece")
            .agg(F.sum(F.col("vc") * F.col("u")).cast("long"))
            .collect()[0][0]
        )
        if ll_raw is None:  # sum over zero rows is NULL, not 0
            raise ValueError(
                "unigram_em_converged: empty corpus (no usable pieces) — "
                "likelihood sum is NULL"
            )
        ll = int(ll_raw)
        if prev_ll is not None:
            delta = ll - prev_ll
            if delta <= tol or rounds == k_max:
                return _final_em_table(
                    vocab, used, "prev_round_count"
                ).withColumn("rounds_run", F.lit(rounds).cast("int")).withColumn(
                    "ll_delta_units", F.lit(delta).cast("long")
                )
        prev_ll = ll
        vocab = _rescored_vocab(vocab, used, "prev_round_count")


def unigram_em_round2(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """TWO chained hard-EM rounds — :func:`unigram_em_rounds` at k=2
    (kept as a named entry point; the registered query and its oracle
    predate the k-round generalization)."""
    return unigram_em_rounds(docs, 2, text_col)


def unigram_encode_stats_rounds(
    docs: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """The serve half under the ROUND-k trained model (train k−1
    prune/re-fit cycles exactly as :func:`unigram_em_rounds`, then
    encode): Viterbi-segment the word dictionary under the round-k
    scores once, broadcast the vocab-sized word→piece-count table into
    one corpus pass → per-document fertility stats. This is what
    shipping the SentencePiece model after training actually looks
    like — the pruned, re-scored vocabulary serves, not the seed."""
    if k < 2:
        raise ValueError("use unigram_encode_stats for the seed-model serve")
    wd = word_dictionary(docs, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wd).select("piece", "u").localCheckpoint(eager=True)
    for _r in range(1, k):
        vocab = _rescored_vocab(vocab, _round_usage(wd, vocab))
    wpc = (
        viterbi_segments(wd, vocab)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    docw = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= MAX_WORD))
    return (
        docw.join(F.broadcast(wpc), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("k").cast("long").alias("n_pieces"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("pieces_per_word"),
        )
    )
