"""Text analysis operators for training-data pipelines.

Language-ID (stopword/charset heuristic), quality scoring, token
counting, and document fingerprinting — all as JVM-side column
expressions over the ``documents`` table (no Python UDFs: at 100 TB
these run inside whole-stage codegen on the scan output, shuffling
nothing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

#: Tiny per-language stopword tables for the n-gram/stopword heuristic.
#: Deliberately small + deterministic; real deployments would swap in
#: fuller tables (the operator shape is what matters).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "una"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
}

#: Punctuation class shared verbatim with the DuckDB oracle.
PUNCT_CLASS = "[.,!?;:]"

#: Deterministic tie-break order for language scores.
LANG_ORDER = ("en", "es", "de", "fr")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, punctuation count, stopword ratio, mean token
    length, and a composite quality score in [0, 1]."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("bigint")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_CLASS), 0)).cast("bigint")
    stop = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_STOPWORDS["en"]))
    ).cast("bigint")
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(stop / n_tok.cast("double"))
    mean_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
        / n_tok.cast("double")
    )
    # quality: long-enough docs with some stopwords and sane word size
    quality = (
        F.least(n_tok.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 9.0), 0.3).otherwise(0.0)
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_punct.alias("n_punct"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: score = distinct stopword hits per
    language; prediction = arg-max with LANG_ORDER tie-break, 'und'
    (undetermined) when no language scores at all."""
    toks_d = F.array_distinct(tokens(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(toks_d, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:  # first max in fixed order wins ties
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(
        "*", *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"),
    )


def normalized_fingerprint(text_col: str = "text") -> Column:
    """Canonical document fingerprint: lowercase, collapse whitespace,
    md5 — identical across engines (shared normalization recipe)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(norm.cast("binary"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", normalized_fingerprint(text_col))


#: BPE-ish pre-tokenization pattern (GPT-2 style, minus the trailing
#: lookahead so RE2 engines — the DuckDB oracle — accept it verbatim):
#: contractions, optionally-space-prefixed letter runs, digit runs, and
#: punctuation runs.  Whitespace itself is not a token.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokens of a string (``array<string>``), entirely
    JVM-side (``regexp_extract_all`` — no Python in the hot path).
    Approximates a BPE tokenizer's pre-split: the unit a downstream
    merge table would operate on; the count is the standard
    cost/budget proxy for LLM training data."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count per document."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.size(tokens(t)).cast("bigint").alias("n_ws_tokens"),
        F.size(bpe_tokens(t)).cast("bigint").alias("n_bpe_tokens"),
    )
