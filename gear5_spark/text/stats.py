"""Corpus token statistics + PII pattern scanning.

Training-data curation stages the reference never shipped (its text
handling stops at delivering the string column): per-document lexical
quality signals (type-token ratio, repetition), corpus-level term
frequencies, and PII-pattern counting for scrubbing decisions.

Scale notes: the per-document statistics use the canonical
explode → groupBy(doc, token) word-count shape — two hash shuffles,
both with map-side partial aggregation, the textbook distributed
wordcount that scales linearly. PII counting is pure per-row JVM regex
(``regexp_count``) — no shuffle at all. Tokenization uses the same
split as ``text/quality.py`` / ``text/dedupe.py`` (lower, trim, split on
``\\s+``) with one deliberate difference: EMPTY tokens are dropped
here, so an all-whitespace document emits no token rows (while
``quality.token_counts`` counts the single empty token its split
produces) — join the two signals on doc_id with that in mind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["doc_token_stats", "corpus_top_terms", "pii_counts"]


from gear5_spark.text.quality import tokens as _tokens  # single tokenizer


def doc_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical signals: token count, distinct-token count,
    the most frequent token's share (``repetition_ratio`` — high values
    flag degenerate/templated text), and type-token ratio."""
    from gear5_spark.parallel import fan_out

    tok = fan_out(docs).select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    per_token = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_token.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.max("c") / F.sum("c"), 6).alias("repetition_ratio"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
    )


def corpus_top_terms(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Global term frequencies, top-``k`` with a deterministic
    (freq DESC, term ASC) tie-break. One wordcount shuffle + a single-
    partition top-k of an already-tiny aggregate."""
    tok = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    if stopwords:
        tok = tok.filter(~F.col("term").isin(stopwords))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("term", "freq", "rank")
    )


# deliberately simple, auditable patterns (scrubbing decisions need
# predictable recall, not clever heuristics); all run JVM-side
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\+?\d[\d\s().-]{7,}\d",
    "urls": r"https?://[^\s]+",
    "ipv4s": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document counts of each PII-ish pattern — the scrub/keep
    signal for a curation pipeline. Pure per-row ``regexp_count``; at
    100 TB this is an embarrassingly parallel scan with zero shuffle."""
    cols = [F.col(id_col)] + [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(name)
        for name, p in PII_PATTERNS.items()
    ]
    # NULL text must read as "no PII" (counts 0, has_pii false), not a
    # NULL that vanishes from BOTH has_pii filters and NULL-poisons sums
    out = docs.select(
        cols[0],
        *[F.coalesce(col, F.lit(0)).alias(name)
          for col, name in zip(cols[1:], PII_PATTERNS)],
    )
    return out.withColumn(
        "has_pii",
        sum(F.col(n) for n in PII_PATTERNS) > F.lit(0),
    )
