"""Text-analysis operators over a documents table: language ID,
quality scoring, token statistics, document fingerprinting.

All pure column expressions (whole-stage codegen) — these run in the
scan stage with zero shuffles, so they cost one pass over the corpus
regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.hashing import hash60
from linz_bde_uploader_spark.functions.text import (
    LANG_STOPWORDS, avg_token_length, quality_score, stopword_count,
    token_count, unique_token_count, word_shingles,
)


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: (doc_id, n_tokens, n_unique,
    avg_token_len)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        unique_token_count(t).alias("n_unique"),
        F.round(avg_token_length(t), 6).alias("avg_token_len"),
    )


def quality(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Composite quality score per document (see
    functions.text.quality_score for the formula)."""
    return docs.select(
        F.col(id_col),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: score each language by its
    stopword hit count; predict the arg-max (ties broken by language
    code order), 'und' (undetermined) when no list scores > 0."""
    t = F.col(text_col)
    scores = [(lang, stopword_count(t, words))
              for lang, words in sorted(LANG_STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    # first matching when() wins -> ties break by language code order
    expr = None
    for lang, s in scores:
        cond = (s == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    return docs.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shingle_words: int = 3) -> DataFrame:
    """Content fingerprint: minimum 60-bit hash over word shingles
    (winnowing-style min-sampling with window = whole document).
    Robust to reordering-free edits; equal fingerprints => near-certain
    shared shingle content."""
    sh = word_shingles(F.col(text_col), shingle_words)
    fp = F.array_min(F.transform(sh, lambda s: hash60(s)))
    return docs.select(F.col(id_col), fp.alias("fingerprint"))
