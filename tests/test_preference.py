"""Preference/feedback family (r9): pure-Python replicas of the
comparison derivation and the Bradley–Terry MM rounds on a small
monkeypatched corpus, plus the statistical-recovery check the
generative fixture makes possible (votes are drawn FROM a
Bradley–Terry model with strength = n_chars, so the fit must rank
items like the generator)."""

from __future__ import annotations

import hashlib
import math

import pytest

import covid_data_challenge_spark.queries_ext  # noqa: F401
import covid_data_challenge_spark.queries_preference as qp
from covid_data_challenge_spark.registry import REGISTRY

N_J = qp.N_JUDGES


def _coin(a: int, b: int, k: int) -> float:
    hx = hashlib.md5(f"{a}:{b}:{k}".encode()).hexdigest()
    return int(hx[:8], 16) / float(1 << 32)


def _py_comparisons(chars: dict[int, int]):
    """Replay _comparisons: stride +1/+2 pairing, md5-coin BT votes."""
    comps = []
    for a in sorted(chars):
        for d in (1, 2):
            b = a + d
            if b not in chars:
                continue
            pa = chars[a] / (chars[a] + chars[b])
            for k in range(N_J):
                comps.append((a, b, k, _coin(a, b, k) < pa))
    return comps


@pytest.fixture()
def small_docs(spark, monkeypatch):
    chars = {i: 50 + 37 * ((i * 13) % 11) for i in range(12)}
    docs = spark.createDataFrame(
        [(i, "x" * 5, "en", "src0", c) for i, c in chars.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(qp, "_docs", lambda spark, sf: docs)
    return chars


def test_pair_stats_matches_python_replica(spark, small_docs):
    comps = _py_comparisons(small_docs)
    wins: dict[int, int] = {}
    tot: dict[int, int] = {}
    for a, b, _k, wa in comps:
        tot[a] = tot.get(a, 0) + 1
        tot[b] = tot.get(b, 0) + 1
        wins[a] = wins.get(a, 0) + (1 if wa else 0)
        wins[b] = wins.get(b, 0) + (0 if wa else 1)
    got = {
        r.doc_id: (r.n_comparisons, r.n_wins, r.win_rate)
        for r in REGISTRY["preference_pair_stats"].spark(spark, "unused").collect()
    }
    assert set(got) == set(tot)
    for i in tot:
        assert got[i][0] == tot[i]
        assert got[i][1] == wins[i]
        assert abs(got[i][2] - round(wins[i] / tot[i], 6)) < 1e-9


def test_kappa_matches_python_replica(spark, small_docs):
    comps = _py_comparisons(small_docs)
    by_judge = {k: {} for k in range(N_J)}
    for a, b, k, wa in comps:
        by_judge[k][(a, b)] = wa
    got = {
        (r.judge_a, r.judge_b): r
        for r in REGISTRY["annotator_agreement_kappa"].spark(spark, "unused").collect()
    }
    assert len(got) == N_J * (N_J - 1) // 2
    for j1 in range(N_J):
        ra1 = round(sum(by_judge[j1].values()) / len(by_judge[j1]), 6)
        for j2 in range(j1 + 1, N_J):
            ra2 = round(sum(by_judge[j2].values()) / len(by_judge[j2]), 6)
            pairs = set(by_judge[j1]) & set(by_judge[j2])
            po = round(
                sum(by_judge[j1][p] == by_judge[j2][p] for p in pairs) / len(pairs), 6
            )
            pe = round(ra1 * ra2 + (1 - ra1) * (1 - ra2), 6)
            r = got[(j1, j2)]
            assert r.n_shared == len(pairs)
            assert abs(r.po - po) < 1e-9
            assert abs(r.pe - pe) < 1e-9
            assert abs(r.kappa - round((po - pe) / (1 - pe), 6)) < 1e-9


def test_bradley_terry_matches_python_replica(spark, small_docs):
    """Replays the exact MM rounds — nano-scaled integer denominator
    sums, round-6 snaps, micro-scaled mean normalization."""
    comps = _py_comparisons(small_docs)
    npair: dict[tuple[int, int], int] = {}
    wins: dict[int, int] = {}
    tot: dict[int, int] = {}
    for a, b, _k, wa in comps:
        npair[(a, b)] = npair.get((a, b), 0) + 1
        tot[a] = tot.get(a, 0) + 1
        tot[b] = tot.get(b, 0) + 1
        wins[a] = wins.get(a, 0) + (1 if wa else 0)
        wins[b] = wins.get(b, 0) + (0 if wa else 1)
    s = {i: 1.0 for i in tot}
    for _ in range(3):
        den = {i: 0 for i in tot}
        for (a, b), n in npair.items():
            t = math.floor(1e9 * n / (s[a] + s[b]))
            den[a] += t
            den[b] += t
        s = {i: round((wins[i] + 0.5) * 1e9 / den[i], 6) for i in tot}
    m = sum(int(round(v * 1e6)) for v in s.values()) / 1e6 / len(s)
    want = {i: round(v / m, 6) for i, v in s.items()}
    got = {
        r.doc_id: r
        for r in REGISTRY["bradley_terry_strengths"].spark(spark, "unused").collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i].strength - want[i]) < 1e-9, i
        assert got[i].n_wins == wins[i] and got[i].n_comparisons == tot[i]


def test_bradley_terry_recovers_generative_ranking(spark, sf_dir):
    """The fixture draws votes from BT(strength = n_chars); the fitted
    strengths must broadly rank items like the generator: the mean
    fitted strength of the top n_chars quartile decisively exceeds the
    bottom quartile's."""
    import covid_data_challenge_spark.queries_preference as qmod
    from covid_data_challenge_spark.queries_shared import _docs as real_docs

    docs = {r.doc_id: r.n_chars for r in
            real_docs(spark, sf_dir).select("doc_id", "n_chars").collect()}
    fit = {
        r.doc_id: r.strength
        for r in REGISTRY["bradley_terry_strengths"].spark(spark, sf_dir).collect()
    }
    ranked = sorted(docs, key=docs.get)
    q = len(ranked) // 4
    lo = sum(fit[i] for i in ranked[:q]) / q
    hi = sum(fit[i] for i in ranked[-q:]) / q
    assert hi > 1.5 * lo, (lo, hi)


def test_davidson_bias_fit_recovers_planted_parameters(spark, sf_dir):
    """The r10 fixture draws votes from the Davidson-ties +
    position-bias model with planted θ_k = 0.6 + 0.2·k, ν = 0.4, and
    strength = n_chars. The cyclic MM fit must recover all three
    structures: θ strictly increasing in k (the bias CORRECTION the r9
    report could only measure), ν within ±0.1 of planted, and fitted
    strengths rank-tracking n_chars (quartile contrast, the BT test's
    bar). A measured tie share confirms ties are a real outcome, not a
    degenerate branch."""
    from covid_data_challenge_spark.queries_shared import _docs as real_docs

    params = {
        r.metric: r.value
        for r in REGISTRY["davidson_bias_params"].spark(spark, sf_dir).collect()
    }
    thetas = [params[f"judge_{k}_theta"] for k in range(N_J)]
    assert all(a < b for a, b in zip(thetas, thetas[1:])), thetas
    assert abs(params["nu"] - 0.4) < 0.1, params["nu"]
    assert 0.05 < params["tie_rate"] < 0.35, params["tie_rate"]

    docs = {r.doc_id: r.n_chars for r in
            real_docs(spark, sf_dir).select("doc_id", "n_chars").collect()}
    fit = {
        r.doc_id: r.strength
        for r in REGISTRY["davidson_bias_strengths"].spark(spark, sf_dir).collect()
    }
    ranked = sorted(docs, key=docs.get)
    q = len(ranked) // 4
    lo = sum(fit[i] for i in ranked[:q]) / q
    hi = sum(fit[i] for i in ranked[-q:]) / q
    assert hi > 1.5 * lo, (lo, hi)
    # ties are counted per item and never negative; every item voted
    n_ties = {
        r.doc_id: r.n_ties
        for r in REGISTRY["davidson_bias_strengths"].spark(spark, sf_dir).collect()
    }
    assert sum(n_ties.values()) > 0 and min(n_ties.values()) >= 0


def test_dpo_export_and_label_noise_screen(spark, sf_dir):
    """The RLHF export surface (r10): every exported DPO pair is
    decisive (margin ≥ 4, chosen votes > rejected), orientation is the
    majority's, and the pair universe reconciles with the v2
    comparisons fact. The label-noise screen returns only pairs whose
    decisive majority CONTRADICTS the Davidson fit ordering — verified
    per row against the strengths the query itself reports — and finds
    a real, non-empty noise set on the generative fixture (a model
    draw at p < 1 guarantees some minority outcomes)."""
    pairs = REGISTRY["dpo_pair_export"].spark(spark, sf_dir).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.margin >= 4
        assert r.votes_chosen > r.votes_rejected
        assert r.votes_chosen - r.votes_rejected == r.margin
        assert r.votes_chosen + r.votes_rejected + r.n_ties == N_J * qp._DAV_REPS
        assert r.chosen_id != r.rejected_id

    noise = REGISTRY["preference_label_noise_screen"].spark(spark, sf_dir).collect()
    assert len(noise) > 0
    for r in noise:
        assert abs(r.votes_a - r.votes_b) >= 2
        if r.votes_a > r.votes_b:
            assert r.strength_a < r.strength_b  # majority vs fit contradiction
        else:
            assert r.strength_b < r.strength_a
    # the screen flags a minority of decisive pairs, not the corpus
    assert len(noise) < len(pairs)


def test_quality_report_metrics_sane(spark, sf_dir):
    rows = {
        r.metric: r.value
        for r in REGISTRY["preference_quality_report"].spark(spark, sf_dir).collect()
    }
    assert rows["n_comparisons"] == rows["n_pairs"] * N_J
    # exchangeable judges drawn from one model: Fleiss' kappa is small
    # but the metric must exist and be finite
    assert -1.0 <= rows["fleiss_kappa"] <= 1.0
    assert 0.0 <= rows["transitivity_violation_rate"] <= 1.0
    for k in range(N_J):
        assert 0.0 < rows[f"judge_{k}_rate_a"] < 1.0


def test_dpo_export_v2_orients_by_fit_and_corrects_v1_flips(spark, sf_dir):
    """The bias-corrected export (r11 — VERDICT r10 #4): v2's
    orientation can NEVER contradict the Davidson fit (model_margin
    strictly positive, p_chosen > the rejected side's implied share),
    noise-screen rows are flagged (and exactly reproduce the screen's
    pair set at its margin ≥ 2 gate), and on the pairs where v1's raw
    majority and v2's fit orientation DISAGREE, v2 agrees with the
    generative ground truth (strength = n_chars) strictly more often —
    the planted-bias flips v1 shipped and v2 corrects (measured at
    sf0.001: 24 flips, v1 right on 9, v2 on 15)."""
    from covid_data_challenge_spark.queries_shared import _docs as real_docs

    chars = {r.doc_id: r.n_chars for r in
             real_docs(spark, sf_dir).select("doc_id", "n_chars").collect()}
    v2_rows = REGISTRY["dpo_pair_export_v2"].spark(spark, sf_dir).collect()
    assert len(v2_rows) > 0
    for r in v2_rows:
        assert r.model_margin > 0  # orientation is the fit's, strictly
        assert 0.0 < r.p_chosen < 1.0
        assert r.chosen_id != r.rejected_id

    # flagged rows == the label-noise screen's pairs (same gate)
    noise = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in REGISTRY["preference_label_noise_screen"].spark(spark, sf_dir).collect()
    }
    flagged = {
        tuple(sorted((r.chosen_id, r.rejected_id)))
        for r in v2_rows
        if r.noise_flagged
    }
    assert flagged == noise

    v1 = {
        tuple(sorted((r.chosen_id, r.rejected_id))): r.chosen_id
        for r in REGISTRY["dpo_pair_export"].spark(spark, sf_dir).collect()
    }
    v2 = {
        tuple(sorted((r.chosen_id, r.rejected_id))): r.chosen_id
        for r in v2_rows
    }
    flips = [k for k in set(v1) & set(v2) if v1[k] != v2[k]]
    assert len(flips) > 0  # the planted bias really flips pairs

    def truth_ok(pair, chosen):
        a, b = pair
        other = a if chosen == b else b
        return chars[chosen] >= chars[other]

    v1_ok = sum(truth_ok(k, v1[k]) for k in flips)
    v2_ok = sum(truth_ok(k, v2[k]) for k in flips)
    assert v2_ok > v1_ok, (v1_ok, v2_ok, len(flips))


def test_davidson_incremental_warm_start_tracks_full_refit(spark, sf_dir):
    """The incremental ingest (r11 — VERDICT r10 #5): ONE warm-started
    MM round over history ∪ batch must land where a full 3-round
    from-scratch refit over the same grown fact lands — median
    relative strength gap under 10%, top-quartile rank overlap ≥ 75%
    (measured at sf0.001: median 3.7%, overlap 92% — and against a
    deeper 8-round reference the warm start is STRICTLY CLOSER than
    the 3-round refit, max 0.33 vs 0.49, so the one-round update is a
    convergence step, not an approximation tax)."""
    import statistics

    from pyspark.sql import functions as F

    warm = {
        r.doc_id: r.strength
        for r in REGISTRY["davidson_incremental_update"].spark(spark, sf_dir).collect()
    }
    allc = qp._comparisons_v2(
        spark, sf_dir, reps=qp._DAV_REPS + 1
    ).localCheckpoint(eager=True)
    stats, wts, jwts, twt = qp._dav_weights(allc)
    s = stats.select("doc_id", F.lit(1.0).alias("s"))
    th = allc.select("judge").distinct().select("judge", F.lit(1.0).alias("th"))
    nu = spark.range(1).select(F.lit(0.5).alias("nu"))
    for _ in range(qp._DAV_ROUNDS):
        s, th, nu = qp._dav_mm_round(allc, wts, jwts, twt, s, th, nu)
    m = s.agg(
        (
            F.sum(F.round(F.col("s") * F.lit(1e6)).cast("long")).cast("double")
            / F.lit(1e6)
            / F.count(F.lit(1)).cast("double")
        ).alias("m")
    ).collect()[0][0]
    full = {r.doc_id: round(r.s / m, 6) for r in s.collect()}

    assert set(warm) == set(full)
    rel = [abs(warm[i] - full[i]) / max(full[i], 1e-9) for i in full]
    assert statistics.median(rel) < 0.10, statistics.median(rel)
    ranked_w = sorted(warm, key=warm.get)
    ranked_f = sorted(full, key=full.get)
    q = len(ranked_w) // 4
    overlap = len(set(ranked_w[-q:]) & set(ranked_f[-q:])) / q
    assert overlap >= 0.75, overlap
