"""Text-analysis expression library for large-scale document pipelines.

Everything here is built-in-function Column algebra (JVM-side, codegen-
friendly) — the hot path over a 100 TB document corpus never enters
Python. Each op is also expressible in ANSI SQL so the DuckDB oracle can
verify it exactly.

These extend the reference's string surface (SURVEY.md §2.8 — contains/
lower/regex on country names) to the operations a training-data pipeline
needs: normalization, fingerprinting, token statistics, language ID,
quality scoring, shingling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword inventories for the n-gram/stopword language
#: heuristic. Deliberately small and word-boundary anchored so the same
#: regex runs identically under Java regex (Spark) and RE2 (DuckDB).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "para", "con", "una"],
}


def let(value: Column, body) -> Column:
    """Let-binding for Column algebra: evaluate ``value`` ONCE and pass
    it to ``body`` as a bound lambda variable.

    Spark's higher-order functions re-evaluate any outer (non-lambda)
    subexpression on every element, so an expression like
    ``transform(seq, i -> f(expensive_expr, i))`` recomputes
    ``expensive_expr`` per element. Binding it through a single-element
    array — ``element_at(transform(array(value), v -> body(v)), 1)`` —
    makes it a lambda variable, which is a slot read, not a subtree
    re-evaluation. Used by the shingling/repetition expressions, where
    the difference is O(len) vs O(len·shingles) per document."""
    return F.element_at(F.transform(F.array(value), body), 1)


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 is identical across engines, making exact-dedup oracle-checkable."""
    return F.md5(normalize_text(col))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


#: BPE-style pre-tokenization pattern (GPT-2-ish, ASCII-simplified so the
#: same pattern runs identically under Java regex and RE2): optional
#: leading space + letter runs | digit runs | single non-space symbol.
BPE_PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]"


def bpe_pretokens(col: Column) -> Column:
    """BPE-style pre-tokens of the raw text → array<string>. This is the
    pre-tokenization half of byte-pair encoding (the merge table is
    model-specific); its count is the standard LLM-cost proxy."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_pretoken_count(col: Column) -> Column:
    return F.size(bpe_pretokens(col))


def stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def lang_hits(col: Column, lang: str) -> Column:
    """Number of stopword hits for ``lang`` in the text."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(stopword_pattern(lang)), 0))


def char_shingles(col: Column, k: int = 8) -> Column:
    """All k-character shingles of the normalized text → array<string>.

    Built from ``sequence`` + ``transform`` (no explode here, so callers
    choose whether to keep it as a set column or flatten it). Texts
    shorter than k yield a single whole-text shingle.
    """
    return let(
        normalize_text(col),
        lambda norm: F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(k)),
        ),
    )


def repetition_ratio(col: Column, n: int = 5, digits: int = 4) -> Column:
    """Share of repeated word n-grams: 1 − distinct/total (0 for texts
    shorter than n words). High values flag boilerplate/spam — a standard
    training-data quality signal alongside :func:`quality_score`."""
    from covid_data_challenge_spark.operators.dedup import word_shingle_expr

    total = F.greatest(token_count(col) - F.lit(n - 1), F.lit(0))
    distinct = F.size(word_shingle_expr(col, n))
    return F.round(
        F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0)), digits
    )


def punct_ratio(col: Column, digits: int | None = None) -> Column:
    """Share of punctuation characters in the raw text."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))
    out = n_punct / F.greatest(F.length(col), F.lit(1))
    return F.round(out, digits) if digits is not None else out


def quality_score(col: Column, digits: int = 4) -> Column:
    """Composite document quality heuristic in [0, 1]:

    - length component: saturating ``min(n_tokens / 100, 1)``
    - stopword component: English stopword ratio scaled ×5, capped at 1
      (natural text has ≥ ~20% stopwords)
    - punctuation penalty: 1 − min(punct_ratio × 10, 1)

    Score = mean of the three components. Pure arithmetic → identical in
    Spark and DuckDB.
    """
    n_tok = token_count(col)
    len_c = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_c = F.least(lang_hits(col, "en") / F.greatest(n_tok, F.lit(1)) * 5.0, F.lit(1.0))
    punct_c = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return F.round((len_c + stop_c + punct_c) / 3.0, digits)


#: PII patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB): plain
#: character classes and bounded repetition only — no lookaround, no
#: backreferences (RE2 has neither).
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"


def redact_pii(col: Column) -> Column:
    """Replace email addresses and international-format phone numbers
    with typed placeholder tokens. Pure ``regexp_replace`` chain —
    JVM-side, codegen'd, no UDF — so redacting a 100 TB corpus is a scan.
    Engine-portable patterns (see above) let the DuckDB oracle replay it
    exactly (DuckDB needs the 'g' flag; Spark is global by default)."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_match_count(col: Column) -> Column:
    """How many PII spans the redactor would replace (audit metric)."""
    n_email = F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0))
    n_phone = F.size(F.regexp_extract_all(col, F.lit(PII_PHONE_RE), 0))
    return (n_email + n_phone).cast("int")


def char_entropy(col: Column, digits: int = 6) -> Column:
    """Shannon entropy (nats) of the normalized character distribution —
    the perplexity-proxy quality signal: gibberish/repetitive text sits
    at the entropy extremes while natural language clusters mid-range.

    Entirely row-local Column algebra (split → distinct → per-char
    frequency → ordered -Σ p·ln p fold): no shuffle, no UDF, scales as a
    pure map. The char list is let-bound (one split per doc, not per
    distinct char), the fold runs over SORTED distinct chars so the
    float summation order is engine-identical, and ``+ 0.0`` normalizes
    the -0.0 a uniform doc would produce."""

    def body(cs):
        n = F.size(cs).cast("double")
        ps = F.transform(
            F.array_sort(F.array_distinct(cs)),
            lambda d: F.size(F.filter(cs, lambda c: c == d)).cast("double") / n,
        )
        plogp = F.transform(ps, lambda p: p * F.log(p))
        return -F.aggregate(plogp, F.lit(0.0), lambda a, x: a + x) + F.lit(0.0)

    return F.round(let(F.split(normalize_text(col), ""), body), digits)
