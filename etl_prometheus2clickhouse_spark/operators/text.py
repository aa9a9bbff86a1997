"""Text-analysis operators over a document table (engine extension for
large-scale training-data pipelines; BASELINE.json north star).

All pure built-in expressions — whole-stage codegen, no Python in the hot
path, embarrassingly parallel (no shuffle), so they scale linearly with
input splits at 100 TB.

Operators:
- :func:`with_text_stats`     — token/char/punct/whitespace counts and ratios.
- :func:`with_quality_score`  — composite quality heuristic with
  SQL-expressible components (oracle-checkable).
- :func:`with_language_id`    — stopword-hit language heuristic for a
  small fixed language set (en/de/fr/es), expressed as regexp counts.
- :func:`with_fingerprint`    — deterministic document fingerprints
  (md5 hex of normalized text + xxhash64).
- :func:`with_token_count`    — whitespace and BPE-ish regex token counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer family, simplified to an ASCII-safe regex).
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Top stopwords per language — small fixed lists so the whole heuristic
# stays a constant-folded regexp per language.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "una", "es", "por", "con"],
}


def _stopword_hits(col: Column, lang: str) -> Column:
    pattern = r"(?i)\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
    return F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append char/token/punctuation/whitespace statistics."""
    c = F.col(text_col)
    n_chars = F.length(c)
    ws_tokens = F.size(
        F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)
    )
    return (
        df.withColumn("n_chars_computed", n_chars.cast("bigint"))
        .withColumn("n_tokens_ws", ws_tokens.cast("bigint"))
        .withColumn(
            "n_tokens_bpe",
            F.coalesce(F.regexp_count(c, F.lit(BPE_TOKEN_REGEX)), F.lit(0)).cast(
                "bigint"
            ),
        )
        .withColumn(
            "n_punct",
            F.coalesce(
                F.regexp_count(c, F.lit(r"[!-/:-@\[-`{-~]")), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, F.col("n_punct") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "avg_token_len",
            F.when(
                F.col("n_tokens_ws") > 0,
                (n_chars - (F.col("n_tokens_ws") - 1)) / F.col("n_tokens_ws"),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Just the two token counters (cheap path for budget accounting)."""
    c = F.col(text_col)
    return df.withColumn(
        "n_tokens_ws",
        F.size(F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)).cast(
            "bigint"
        ),
    ).withColumn(
        "n_tokens_bpe",
        F.coalesce(F.regexp_count(c, F.lit(BPE_TOKEN_REGEX)), F.lit(0)).cast(
            "bigint"
        ),
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-count language heuristic.

    Score per language = stopword hits; ``lang_pred`` = argmax with a
    deterministic tie-break on language code; ``und`` (undetermined) when
    no stopword fires. A fixed CASE-WHEN cascade, so DuckDB can replicate
    it exactly for the correctness oracle.
    """
    c = F.col(text_col)
    out = df
    for lang in _STOPWORDS:
        out = out.withColumn(f"lang_hits_{lang}", _stopword_hits(c, lang))
    best = F.greatest(*[F.col(f"lang_hits_{code}") for code in _STOPWORDS])
    pred = F.lit("und")
    # reversed: earlier languages win ties (first-match in forward order)
    for lang in reversed(list(_STOPWORDS)):
        pred = F.when(
            (best > 0) & (F.col(f"lang_hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals made
    SQL-simple): length band, punctuation sanity, stopword presence,
    mean-token-length band. Deterministic, oracle-checkable."""
    out = with_text_stats(df, text_col)
    out = with_language_id(out, text_col)
    length_ok = (F.col("n_chars_computed") >= 50) & (
        F.col("n_chars_computed") <= 20000
    )
    punct_ok = F.col("punct_ratio") <= 0.2
    stop_ok = F.col("lang_pred") != "und"
    tok_ok = (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)
    score = (
        length_ok.cast("int") * 0.25
        + punct_ok.cast("int") * 0.25
        + stop_ok.cast("int") * 0.25
        + tok_ok.cast("int") * 0.25
    )
    return out.withColumn("quality_score", score.cast("double"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fingerprints of whitespace-normalized, lowercased
    text: ``fp_md5`` (hex, cross-engine stable — DuckDB md5 matches) and
    ``fp_xxh64`` (cheap 64-bit for joins)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_xxh64", F.xxhash64(norm)
    )
