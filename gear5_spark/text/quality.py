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


def gopher_quality_flags(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models" appendix A): word-count window, mean word length
    window, symbol-to-word ratio cap (# and ellipses), minimum fraction
    of words containing an alphabetic character, and minimum distinct
    stop-word count. Emits the per-rule signals plus the conjunction
    ``passes_gopher`` so a pipeline can filter or audit rule-by-rule.
    All JVM built-ins, zero shuffles; every expression has an exact
    DuckDB equivalent (oracle ``gopher_quality``)."""
    t = tokens(F.col("text"))
    n = F.size(t)
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    mean_len = F.length(F.regexp_replace("text", r"\s+", "")) / n
    symbol_ratio = (
        F.regexp_count(F.col("text"), F.lit("#"))
        + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
    ) / n
    alpha_ratio = F.size(F.filter(t, lambda x: x.rlike("[a-z]"))) / n
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop_arr))
    passes = (
        (n >= min_words)
        & (n <= max_words)
        & (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (n_stop >= min_stopwords)
    )
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.alias("distinct_stopwords"),
        passes.alias("passes_gopher"),
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


def repetition_metrics(docs: DataFrame, ngram_n: int = 5) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 repetition filters — the part gopher_quality_flags leaves
    out): duplicate-line fraction, duplicate-line CHARACTER fraction,
    duplicate word-n-gram fraction, and the occurrence fraction of the
    single most common word bigram.

    Shapes for scale: per-(doc, line) and per-(doc, gram) counts are
    hash aggregations with map-side combine — shuffle rows bounded by
    distinct lines/grams per doc, never corpus-wide; the three signal
    sets join back on doc_id (AQE broadcasts the small sides at bench
    scale). No data-dependent blowup: every intermediate is <= the
    exploded token count."""
    from gear5_spark.parallel import fan_out

    lines = F.split(F.col("text"), "\n")
    toks = tokens(F.col("text"))
    base = fan_out(docs).select(
        "doc_id",
        lines.alias("_lines"),
        toks.alias("_toks"),
    )
    per_line = (
        base.select("doc_id", F.explode("_lines").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("c"), F.length("line").alias("len"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_lines"
            ),
            F.sum(F.col("c") * F.col("len")).alias("line_chars"),
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(0)
            ).alias("dup_line_chars"),
        )
    )

    def _grams(n: int):
        idx = F.sequence(
            F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))
        )
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n))
        )

    per_ngram = (
        base.select("doc_id", F.explode(_grams(ngram_n)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_grams"
            ),
        )
    )
    per_bigram = (
        base.select("doc_id", F.explode(_grams(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bi"))
    )
    return (
        per_line.join(per_ngram, "doc_id")
        .join(per_bigram, "doc_id")
        .select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.round(F.col("dup_lines") / F.col("n_lines"), 6).alias(
                "dup_line_frac"
            ),
            F.round(
                F.col("dup_line_chars")
                / F.greatest(F.col("line_chars"), F.lit(1)),
                6,
            ).alias("dup_line_char_frac"),
            F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias(
                f"dup_{ngram_n}gram_frac"
            ),
            F.round(F.col("top_c") / F.col("n_bi"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )
