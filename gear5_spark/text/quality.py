"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-side built-ins (split/filter/size/md5) — no Python in the hot
path. Each function returns a DataFrame with deterministic columns so a
SQL oracle can verify it (the expressions are chosen to have exact
DuckDB equivalents)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny multilingual stopword markers for the heuristic language id
_LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "la", "los", "de"],
    "fr": ["le", "les", "des", "une"],
}
_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by",
]


def tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


# BPE-ish pre-tokenization: letter runs / digit runs / punctuation runs
# (the lookahead-free core of GPT-2-style pre-tokenizers — portable to
# RE2-based engines, so the SQL oracle computes the identical count)
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^\sa-z0-9]+"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + distinct-token count + type/token ratio
    + a BPE-ish subword-run count (letters/digits/punct split apart —
    the usual LLM-budget proxy when the real tokenizer is off-cluster)."""
    t = tokens(F.col("text"))
    bpe = F.regexp_extract_all(
        F.trim(F.lower(F.col("text"))), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.size(bpe).alias("n_tokens_bpe"),
    ).withColumn(
        "type_token_ratio",
        F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 6),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, uppercase ratio. Mirrors common pretraining-corpus filters."""
    t = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(t).alias("n_tokens"),
        F.round(F.length(F.regexp_replace("text", r"\s+", "")) / F.size(t), 6).alias(
            "mean_token_len"
        ),
        F.round(n_stop / F.size(t), 6).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language heuristic: the language with the most marker
    hits wins; ties and zero hits -> 'und'. Deterministic tie-break by
    language code order."""
    t = tokens(F.col("text"))
    hit_cols = []
    for lang in sorted(_LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        hit_cols.append(
            F.struct(
                (-F.size(F.filter(t, lambda x: F.array_contains(arr, x)))).alias(
                    "neg_hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    # ascending sort on (-hits, lang): highest hits first, ties broken by
    # lexically-smallest language code — fully deterministic
    best = F.sort_array(F.array(*hit_cols))[0]
    return docs.select(
        "doc_id",
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise("und").alias(
            "lang_guess"
        ),
        (-best["neg_hits"]).alias("marker_hits"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Stable document fingerprint (md5 of normalized text) + a 64-bit
    content hash — the dedup/lineage key for document-level provenance."""
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.xxhash64(norm).alias("content_hash64"),
    )
