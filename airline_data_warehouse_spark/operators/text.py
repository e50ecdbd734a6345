"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All native Column expressions (regex + array
functions) — JVM-side, codegen-friendly, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"[ \t\n]+"
STOPWORDS = ("the", "a", "of", "and", "to")


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), WS)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + token density per document."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("int")
    n_tokens = F.size(_tokens(text)).cast("int")
    return (df.filter(F.length(F.trim(text)) > 0)
              .select(F.col(id_col),
                      n_chars.alias("n_chars"),
                      n_tokens.alias("n_tokens"),
                      (n_tokens.cast("double") / n_chars.cast("double"))
                      .alias("token_density")))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic training-data quality gate: stopword ratio, alphabetic
    ratio, minimum length — the classic pre-filter stack."""
    text = F.col(text_col)
    toks = _tokens(F.lower(text))
    n_tokens = F.size(toks).cast("int")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("int")
    n_chars = F.length(text).cast("int")
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("int")
    return (df.filter(F.length(F.trim(text)) > 0)
              .select(F.col(id_col),
                      (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
                      (n_alpha.cast("double") / n_chars).alias("alpha_ratio"),
                      F.when((n_tokens >= 20) & (n_stop > 0), "keep")
                       .otherwise("filter").alias("verdict")))
