"""Property-based tests (Hypothesis) with pandas as a secondary oracle:
the per-group window operators must agree with the reference's own pandas
idioms on arbitrary small inputs — nulls, duplicate keys, single-row
groups, negative values and all. Complements the DuckDB oracle, which
only sees the fixed synthetic tables."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from covid_data_challenge_spark.operators.alignment import latest_per_key
from covid_data_challenge_spark.operators.cleaning import forward_fill, lag_diff

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key, seq, value) rows: few keys → guaranteed group collisions; value may
# be null; (key, seq) made unique per example so orderings are total.
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False, width=32)),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: (r[0], r[1]),
)


def _round_half_up(x: float, ndigits: int) -> float:
    """Round like Spark's ``F.round`` / DuckDB ``round`` (HALF_UP on the
    shortest decimal repr of the double), NOT like Python's built-in
    ``round`` (banker's half-even). ``repr(x)`` is the shortest repr, the
    same string ``java.math.BigDecimal.valueOf(double)`` rounds — so exact
    decimal midpoints (e.g. 1.3828125 @ 6 digits) agree with the engine."""
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, s, float(v) if v is not None else None) for k, s, v in rows],
        "k long, seq long, v double",
    )


@given(rows=_rows)
@settings(**_SETTINGS)
def test_forward_fill_matches_pandas_ffill(spark, rows):
    got = {
        (r["k"], r["seq"]): r["v"]
        for r in forward_fill(_df(spark, rows), "k", "seq", ["v"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).sort_values(["k", "seq"])
    pdf["v"] = pdf.groupby("k")["v"].ffill()
    for _, row in pdf.iterrows():
        g = got[(row["k"], row["seq"])]
        if pd.isna(row["v"]):
            assert g is None
        else:
            assert g is not None and math.isclose(g, row["v"], rel_tol=1e-9)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_lag_diff_matches_pandas_diff_fill_clip(spark, rows):
    out = lag_diff(
        _df(spark, rows), keys="k", order_col="seq", src_col="v",
        out_col="d", clip_negative=True,
    )
    got = {(r["k"], r["seq"]): r["d"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).sort_values(["k", "seq"])
    # float cast first: on an all-None hypothesis draw the column is
    # object dtype and .fillna would object-downcast (FutureWarning)
    pdf["d"] = (
        pdf.groupby("k")["v"].diff().astype(float).fillna(0).clip(lower=0)
    )
    for _, row in pdf.iterrows():
        assert math.isclose(got[(row["k"], row["seq"])], row["d"], rel_tol=1e-9)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_latest_per_key_matches_pandas_argmax(spark, rows):
    got = {
        r["k"]: (r["seq"], r["v"])
        for r in latest_per_key(_df(spark, rows), "k", "seq").collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"])
    exp = pdf.loc[pdf.groupby("k")["seq"].idxmax()]
    assert set(got) == set(exp["k"])
    for _, row in exp.iterrows():
        gseq, gv = got[row["k"]]
        assert gseq == row["seq"]
        assert (gv is None) == pd.isna(row["v"]) or math.isclose(gv, row["v"], rel_tol=1e-9)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_trend_metrics_matches_pandas_loop(spark, rows):
    """The single-pass groupBy trend aggregation must reproduce the
    reference's per-group Python loop semantics (first/last by order,
    NULL→0, avg, HAVING ≥ 2) on arbitrary inputs."""
    from covid_data_challenge_spark.operators.alignment import trend_metrics

    out = trend_metrics(
        _df(spark, rows), keys="k", ts_col="seq", value_cols=["v"],
        rate_cols=["v"], window_days=None, min_points=2,
    )
    got = {
        r["k"]: (
            r["data_points_available"], r["first_v"], r["last_v"], r["avg_daily_v"],
        )
        for r in out.collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).sort_values(["k", "seq"])
    want = {}
    for k, g in pdf.groupby("k"):
        if len(g) < 2:
            continue
        first = g["v"].iloc[0]
        last = g["v"].iloc[-1]
        avg = g["v"].mean()  # pandas mean skips NaN, like Spark avg
        want[k] = (
            len(g),
            0.0 if pd.isna(first) else first,
            0.0 if pd.isna(last) else last,
            None if pd.isna(avg) else _round_half_up(float(avg), 2),
        )
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(got[k][2], want[k][2], rel_tol=1e-9, abs_tol=1e-12)
        if want[k][3] is None:
            assert got[k][3] is None
        else:
            assert got[k][3] is not None and abs(got[k][3] - want[k][3]) <= 0.011


_right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=30),
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)


@given(left_rows=_rows, right_rows=_right_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """The union+window as-of join must agree with pandas merge_asof
    (backward, exact matches allowed) on arbitrary keyed series."""
    from covid_data_challenge_spark.operators.alignment import asof_join

    left = spark.createDataFrame(
        [(k, s) for k, s, _ in left_rows], "k long, seq long"
    ).withColumn("lid", F.monotonically_increasing_id())
    right = spark.createDataFrame(
        [(k, s, float(v)) for k, s, v in right_rows] or [(99, 99, 0.0)],
        "k long, seq long, rv double",
    )
    got = {
        (r["k"], r["seq"]): (r["seq_asof"], r["rv_asof"])
        for r in asof_join(
            left, right, by="k", left_ts="seq", right_ts="seq", value_cols=["rv"]
        ).collect()
    }
    lpdf = pd.DataFrame(sorted({(k, s) for k, s, _ in left_rows}), columns=["k", "seq"]).sort_values("seq")
    rpdf = pd.DataFrame(
        sorted(right_rows) or [(99, 99, 0.0)], columns=["k", "seq", "rv"]
    ).sort_values("seq")
    rpdf["seq_r"] = rpdf["seq"]
    want = pd.merge_asof(lpdf, rpdf, on="seq", by="k", direction="backward")
    for _, row in want.iterrows():
        g_ts, g_v = got[(row["k"], row["seq"])]
        if pd.isna(row["rv"]):
            assert g_v is None and g_ts is None
        else:
            assert g_ts == row["seq_r"] and math.isclose(g_v, row["rv"], rel_tol=1e-9)


_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)),
    min_size=0,
    max_size=40,
)


@given(edges=_edges)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_connected_components_matches_union_find(spark, edges):
    """large-star/small-star must produce exactly the min-id labeling a
    sequential union-find gives, on arbitrary graphs (self-loops, dups,
    chains, isolated-by-filter nodes included)."""
    from covid_data_challenge_spark.operators.components import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # want: node -> min id of its component, only for nodes on a real edge
    on_edge = {x for a, b in edges if a != b for x in (a, b)}
    comp_min: dict[int, int] = {}
    for x in on_edge:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in on_edge}

    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == want


# (key, day-offset, value) rows — unique (key, day) per example, values
# non-null: gapfill's contract is one observation row per (key, day).
_ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=20),
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_gapfill_interpolate_matches_pandas(spark, rows):
    """The scaffold+window interpolation must equal pandas
    reindex(date_range).interpolate('linear') per key — on a complete
    daily index, positional interpolation equals day-weighted."""
    from datetime import date, timedelta

    from covid_data_challenge_spark.operators.timeseries import gapfill_interpolate

    base = date(2024, 1, 1)
    data = [(k, base + timedelta(days=d), float(v)) for k, d, v in rows]
    df = spark.createDataFrame(data, "k long, day date, v double")
    out = (
        gapfill_interpolate(df, key="k", day="day", val="v", round_to=6)
        .toPandas()
        .sort_values(["k", "day"])
        .reset_index(drop=True)
    )
    expected_rows = []
    pdf = pd.DataFrame(data, columns=["k", "day", "v"])
    for k, grp in pdf.groupby("k"):
        s = grp.set_index("day")["v"]
        idx = pd.date_range(min(s.index), max(s.index), freq="D").date
        filled = s.reindex(idx).interpolate("linear")
        for d in idx:
            expected_rows.append((k, d, filled[d], d not in s.index))
    exp = (
        pd.DataFrame(expected_rows, columns=["k", "day", "value_filled", "interpolated"])
        .sort_values(["k", "day"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    for got, want in zip(out.itertuples(), exp.itertuples()):
        assert got.k == want.k and got.day == want.day
        assert got.interpolated == want.interpolated
        assert math.isclose(
            got.value_filled, _round_half_up(float(want.value_filled), 6), abs_tol=1e-6
        )


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
_docs_words = st.lists(
    st.lists(_word, min_size=1, max_size=12), min_size=1, max_size=6
)


@given(docs=_docs_words, seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_simhash_md5_is_token_order_invariant(spark, docs, seed):
    """SimHash is a bag-of-tokens fingerprint: the bit balances sum over
    the token multiset, so permuting a document's words must leave the
    md5-variant fingerprint bit-identical (the property the near-dup
    banding relies on — word-order edits alone cannot move a doc out of
    its Hamming neighborhood)."""
    import random

    from covid_data_challenge_spark.operators.dedup import simhash_md5

    rng = random.Random(seed)
    n = len(docs)
    # one unioned frame, one Spark job: permuted twins ride the same
    # collect as the originals (ids offset by n) — halves the per-example
    # job count of the suite's slowest property test without changing
    # what is asserted
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    for i, ws in enumerate(docs):
        shuffled = ws[:]
        rng.shuffle(shuffled)
        rows.append((n + i, " ".join(shuffled)))
    f = {
        r["doc_id"]: r["simhash"]
        for r in simhash_md5(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i in range(n):
        assert f[i] == f[n + i]


@given(docs=_docs_words)
@settings(**_SETTINGS)
def test_passage_dedup_is_lossless_without_duplicates(spark, docs):
    """When every passage is globally unique, passage dedup must be the
    identity on the normalized text (reassembly preserves order and
    content exactly). Uniqueness is forced by injecting a
    POSITION-unique marker token inside every window — a merely
    doc-unique marker is not enough: on a repeated-token doc like
    ['a']*6 the same window appears twice WITHIN the doc and intra-doc
    passage dedup correctly strips the repeat (hypothesis found exactly
    that counterexample)."""
    from covid_data_challenge_spark.operators.dedup import passage_dedup

    w = 4
    rows = []
    for i, ws in enumerate(docs):
        # inject 'd<i>x<j>' every w tokens so every window is unique
        toks = []
        for j, t in enumerate(ws):
            if j % (w - 1) == 0:
                toks.append(f"d{i}x{j}")
            toks.append(t)
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text for r in passage_dedup(df, passage_tokens=w).collect()}
    assert got == {i: t for i, t in rows}


@given(docs=_docs_words)
@settings(**_SETTINGS)
def test_boilerplate_strip_with_huge_threshold_is_identity(spark, docs):
    """max_df ≥ corpus size → nothing is boilerplate → identity on the
    normalized text (strip must not drop or reorder anything on its
    own)."""
    from covid_data_challenge_spark.operators.dedup import boilerplate_passage_strip

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_passage_strip(df, max_df=len(docs) + 1, passage_tokens=4)
    got = {r.doc_id: r.clean_text for r in out.collect()}
    assert got == {i: t for i, t in rows}


def test_minhash_incremental_finds_planted_history_dup(spark):
    """A batch doc that is a verbatim copy of a history doc shares every
    signature position, so it MUST surface with est_jaccard = 1.0
    (recall 1.0 for exact copies is structural: identical docs share
    every band); unrelated docs must not pair at high estimate."""
    from covid_data_challenge_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    hist_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight nine"),
    ]
    batch_rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),  # copy of 1
        (20, "totally different words nothing shared here at all"),
    ]
    out = minhash_lsh_pairs_incremental(
        spark.createDataFrame(hist_rows, "doc_id long, text string"),
        spark.createDataFrame(batch_rows, "doc_id long, text string"),
        portable=True,
    ).collect()
    pairs = {(r.batch_doc, r.hist_doc): r.est_jaccard for r in out}
    assert pairs.get((10, 1)) == 1.0
    assert (20, 1) not in pairs and (20, 2) not in pairs


# CDC apply: random snapshot + random change batch vs a dict replay.
_cdc_base = st.dictionaries(
    st.integers(min_value=0, max_value=15), st.integers(0, 1000), max_size=10
)
_cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 1000),
    ),
    max_size=12,
    unique_by=lambda t: t[0],  # contract: one change row per key per batch
)


@given(base=_cdc_base, ops=_cdc_ops)
@settings(**_SETTINGS)
def test_cdc_apply_matches_dict_replay(spark, base, ops):
    """apply_changes must behave exactly like replaying the ops onto a
    Python dict: D removes (no-op if absent), U/I set the new value
    (MERGE fall-through: I on an existing key updates, U on a missing
    key inserts — matching the operator's documented degradation)."""
    from covid_data_challenge_spark.operators.cdc import apply_changes

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "key long, value long"
    )
    ch_df = spark.createDataFrame(
        [(k, op, None if op == "D" else nv) for k, op, nv in ops],
        "key long, op string, new_value long",
    )
    got = {
        r["key"]: r["value"]
        for r in apply_changes(base_df, ch_df, "key", "value").collect()
    }
    expect = dict(base)
    for k, op, nv in ops:
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = nv
    assert got == expect


_span_docs = st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30),
    min_size=1,
    max_size=8,
)


@given(docs=_span_docs)
@settings(**_SETTINGS)
def test_duplicate_spans_matches_bruteforce(spark, docs):
    """Property: duplicate_spans (k=3) agrees with a brute-force Python
    reference — every position covered by a 3-token window whose exact
    text occurs ≥2 times corpus-wide, merged into maximal intervals —
    for ANY corpus, including all-identical docs, empty docs, and heavy
    within-doc repetition (the shapes that break off-by-ones in
    gaps-and-islands logic)."""
    from collections import Counter, defaultdict

    from covid_data_challenge_spark.operators.dedup import duplicate_spans

    k = 3
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    # brute force: count windows, mark covered positions, merge islands
    wins = Counter()
    for t in texts:
        toks = t.split(" ") if t else [""]
        for i in range(len(toks) - k + 1):
            wins[" ".join(toks[i : i + k])] += 1
    expect = defaultdict(list)
    for did, t in enumerate(texts):
        toks = t.split(" ") if t else [""]
        covered = set()
        for i in range(len(toks) - k + 1):
            if wins[" ".join(toks[i : i + k])] >= 2:
                covered.update(range(i + 1, i + k + 1))  # 1-based
        run = []
        for p in sorted(covered):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    expect[did].append((run[0], run[-1] + 1))
                run = [p]
        if run:
            expect[did].append((run[0], run[-1] + 1))

    got = defaultdict(list)
    for r in duplicate_spans(df, k=k).collect():
        got[r.doc_id].append((r.span_start, r.span_end))
    got = {d: sorted(v) for d, v in got.items()}
    expect = {d: sorted(v) for d, v in expect.items() if v}
    assert got == expect, (got, expect, texts)


# random lowercase words ≤ 8 chars over a 3-letter alphabet — guaranteed
# substring collisions so the seed vocab and the DP tie rule get exercised
_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8),
    min_size=1,
    max_size=12,
)


@given(words=_words)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_unigram_viterbi_matches_python_dp(spark, words):
    """The unigram-LM Viterbi fold must reproduce a direct Python DP —
    same integer micro-nat scores, same (score, longer-piece) tie rule —
    on arbitrary small corpora: repeated words, single chars, words that
    are substrings of each other, whole-word pieces."""
    from collections import Counter

    from covid_data_challenge_spark.functions.pmath import portable_ln_py
    from covid_data_challenge_spark.operators.unigram import (
        MAX_PIECE,
        VOCAB_TOP,
        seed_vocab,
        viterbi_segments,
        word_dictionary,
    )

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    wd = word_dictionary(docs)
    vocab = seed_vocab(wd)
    got = {}
    for r in sorted(
        viterbi_segments(wd, vocab).collect(), key=lambda r: (r.w, r.pos)
    ):
        got.setdefault(r.w, []).append(r.piece)

    # ---- python replica ----
    wcount = Counter(words)
    pf = Counter()
    for w, n in wcount.items():
        for s in range(len(w)):
            for j in range(1, min(MAX_PIECE, len(w) - s) + 1):
                pf[w[s : s + j]] += n
    vocab_py = {p: f for p, f in pf.items() if len(p) == 1}
    vocab_py.update(
        dict(
            sorted(
                ((p, f) for p, f in pf.items() if len(p) >= 2),
                key=lambda kv: (-kv[1], kv[0]),
            )[:VOCAB_TOP]
        )
    )
    ftot = sum(vocab_py.values())
    u = {
        p: math.floor(
            1e6 * (portable_ln_py(float(f)) - portable_ln_py(float(ftot)))
        )
        for p, f in vocab_py.items()
    }
    for w in wcount:
        best = [(0, 0)]
        for i in range(1, len(w) + 1):
            cands = [
                (best[i - j][0] + u[w[i - j : i]], j)
                for j in range(1, min(MAX_PIECE, i) + 1)
                if w[i - j : i] in u
            ]
            best.append(max(cands))
        out, pos = [], len(w)
        while pos > 0:
            j = best[pos][1]
            out.append(w[pos - j : pos])
            pos -= j
        expect = out[::-1]
        assert got[w] == expect, (w, got[w], expect)
        assert "".join(got[w]) == w  # segmentation is lossless


@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=10**6),
    quality=st.integers(min_value=60, max_value=100),
    subsample=st.booleans(),
    dri=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_codec_roundtrip_property(w, h, seed, quality, subsample, dri):
    """Property: for ANY size (odd/prime dims included — the edge-pad
    paths), seed, quality >= 60, subsampling mode, and restart
    interval, encode->decode succeeds with the right shape and bounded
    error (quantization error shrinks with quality; 4:2:0 is looser on
    the per-pixel-chroma pattern)."""
    import numpy as np

    from covid_data_challenge_spark.operators.jpeg import (
        _test_pattern,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    img = _test_pattern(w, h, seed)
    payload = encode_jpeg_baseline(
        w, h, seed=seed, quality=quality, subsample=subsample,
        restart_interval=dri,
    )
    out = decode_jpeg(payload)
    assert out is not None and out.shape == (h, w, 3)
    mae = np.abs(out.astype(int) - img.astype(int)).mean()
    bound = 40.0 if subsample else 22.0
    assert mae < bound, (w, h, seed, quality, subsample, dri, mae)


@given(
    cut=st.integers(min_value=2, max_value=400),
    flip_at=st.integers(min_value=2, max_value=400),
    flip_to=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_decoder_never_raises_on_mangled_payloads(cut, flip_at, flip_to):
    """Quarantine property: truncations and single-byte corruptions of a
    valid JPEG either decode to a well-shaped image or return None —
    NEVER raise (the per-row mapInPandas contract)."""
    from covid_data_challenge_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    payload = encode_jpeg_baseline(24, 16, seed=7, quality=85)
    t = payload[: min(cut, len(payload))]
    out = decode_jpeg(t)
    assert out is None or out.shape == (16, 24, 3)
    pos = min(flip_at, len(payload) - 1)
    m = payload[:pos] + bytes([flip_to]) + payload[pos + 1 :]
    out = decode_jpeg(m)
    assert out is None or out.shape[2] == 3


@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=10**6),
    quality=st.integers(min_value=60, max_value=100),
    subsample=st.booleans(),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_scan_layouts_decode_identically_property(w, h, seed, quality, subsample):
    """Property: for ANY size/seed/quality/subsampling, the progressive
    (SOF2, spectral selection + successive approximation) and
    non-interleaved-baseline encodings of an image decode EXACTLY equal
    to the interleaved baseline decode — the three layouts are
    different entropy packings of the same quantized coefficients, so
    any per-pixel difference is a decoder bug, not quantization."""
    from covid_data_challenge_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_baseline_noninterleaved,
        encode_jpeg_progressive,
    )

    base = decode_jpeg(
        encode_jpeg_baseline(w, h, seed=seed, quality=quality, subsample=subsample)
    )
    assert base is not None and base.shape == (h, w, 3)
    ni = decode_jpeg(
        encode_jpeg_baseline_noninterleaved(
            w, h, seed=seed, quality=quality, subsample=subsample
        )
    )
    assert ni is not None and (ni == base).all()
    prog = decode_jpeg(
        encode_jpeg_progressive(w, h, seed=seed, quality=quality, subsample=subsample)
    )
    assert prog is not None and (prog == base).all()
