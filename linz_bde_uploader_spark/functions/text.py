"""Text-metric column expressions for the training-data pipeline
operators: tokenization, shingling, quality metrics, language scoring.

Everything here is a JVM-side column expression (split / transform /
filter / aggregate higher-order functions) — no Python UDFs in the hot
path. Each expression has a documented SQL rendering used by the
DuckDB differential oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic (the heuristic, not
# the lexicon, is the operator).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization. SQL: string_split_regex(trim(x), '\\s+')."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def unique_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def avg_token_length(col: Column) -> Column:
    """Mean token length as double (exact integer sums -> one division)."""
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(toks).cast("double")


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    arr = F.array(*[F.lit(w) for w in sw])
    return F.size(F.filter(tokens(F.lower(col)), lambda x: F.array_contains(arr, x))).cast("bigint")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (space-joined).

    SQL equivalent (DuckDB):
      list_transform(generate_series(1, len(toks)-n+1),
                     i -> array_to_string(toks[i:i+n-1], ' '))
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    made = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]))
    return F.when(F.size(toks) >= n, made).otherwise(
        F.array().cast("array<string>"))


def quality_score(col: Column, stopwords: list[str] | None = None) -> Column:
    """Composite document quality in [0,1]:
      0.4 * min(1, n_tokens/64)            (length signal)
      + 0.3 * unique_ratio                 (repetition signal)
      + 0.3 * min(1, 4*stopword_ratio)     (naturalness signal)
    All terms are exact-integer ratios -> deterministic doubles.
    """
    n = token_count(col).cast("double")
    uniq = unique_token_count(col).cast("double")
    sw = stopword_count(col, stopwords).cast("double")
    length_term = F.least(F.lit(1.0), n / F.lit(64.0))
    unique_term = uniq / n
    stop_term = F.least(F.lit(1.0), F.lit(4.0) * sw / n)
    return (F.lit(0.4) * length_term + F.lit(0.3) * unique_term
            + F.lit(0.3) * stop_term)


# GPT-2-flavoured pretokenizer pattern, constrained to syntax RE2 also
# supports (no lookaheads) so the DuckDB oracle runs the SAME pattern:
# contractions | space?-letters | space?-digits | space?-other | spaces.
# (\s differs between engines only on vertical-tab, irrelevant here.)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish subword-boundary token count (the quick token-budget
    estimator a training pipeline runs before real tokenization).
    SQL: len(regexp_extract_all(x, BPE_PATTERN))."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)).cast("bigint")


# PII scrubbing (C4/CCNet-style pre-training cleanup). RE2-compatible
# patterns only, so any SQL engine reproduces them for differential
# testing; all three run as codegen regexp expressions, no UDF.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_DIGITS = r"\b\d{9,}\b"


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses, and long digit runs with typed
    placeholder tokens."""
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_LONG_DIGITS, "<NUMBER>")


def pii_match_count(col: Column) -> Column:
    """How many PII spans :func:`redact_pii` would replace — the
    audit-ledger metric logged alongside the scrub."""
    return (F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0)))
            + F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0)))
            + F.size(F.regexp_extract_all(col, F.lit(PII_LONG_DIGITS),
                                          F.lit(0)))).cast("bigint")
