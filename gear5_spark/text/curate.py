"""End-to-end corpus curation: the standard pretraining-data funnel as
one composed, oracle-verifiable operator.

``curate_corpus`` chains the engine's curation primitives in the order a
production pipeline runs them:

1. **near-dup removal** — :func:`gear5_spark.text.dedupe.dedup_clusters`
   (LSH candidates -> exact Jaccard edges -> connected components) and
   drop every non-canonical cluster member (keep the min-doc_id
   representative);
2. **quality gate** — minimum whitespace-token count (the cheapest of
   the quality filters; swap in :func:`quality_scores` columns for
   richer gates);
3. **deterministic down-sampling** —
   :func:`gear5_spark.operators.sample.hash_sample`, so the kept set is
   a pure function of (salt, doc_id): retry/layout-stable and nested
   across fractions.

Every stage is SQL-expressible, so the whole funnel is value-checked by
one DuckDB oracle (driver query ``corpus_curation``). Scale shape: the
only wide operations are the dedup stages (banded equi-joins + the
component propagation); the gate and sample are pure predicates that
ride the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gear5_spark.operators.sample import hash_sample
from gear5_spark.text.dedupe import dedup_clusters
from gear5_spark.text.quality import tokens


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``shingle_n``-gram with an evaluation corpus (the standard
    n-gram-collision test-set leakage check).

    Scale shape: the eval side (benchmarks — thousands of docs, not
    billions) collapses to a DISTINCT n-gram set and BROADCASTS; the
    training corpus streams through one explode + broadcast-hash
    semi-join + partial-aggregated count. No shuffle of the corpus.

    Output per training doc: ``contaminated_ngrams`` (distinct shared
    n-grams) and ``is_contaminated``."""
    from gear5_spark.text.dedupe import shingles

    ev = (
        eval_docs.select(
            F.explode(shingles(F.col("text"), shingle_n)).alias("g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), shingle_n)).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("contaminated_ngrams", F.lit(0)).alias(
                "contaminated_ngrams"
            ),
            F.col("contaminated_ngrams").isNotNull().alias("is_contaminated"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic sequence packing: assign each document a (shard,
    pack_idx, offset) so downstream training can concatenate documents
    into fixed ``budget_tokens`` context windows without a global sort.

    The corpus is hash-sharded (``doc_id % n_shards``) and packed
    independently per shard with a running token cumsum — the window is
    partitioned, so packing parallelizes across shards instead of
    serializing on one global ordering (the scale fix for the naive
    single-window formulation). Within a shard, a document starts at
    ``offset_tokens = cumsum_before % budget`` of pack
    ``pack_idx = cumsum_before // budget``; documents longer than the
    remaining window spill into the next pack (the tokenizer-side
    writer handles the split). Fully deterministic — pure arithmetic on
    (doc_id, token count)."""
    from pyspark.sql import Window as W

    n_tok = F.size(tokens(F.col("text")))
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_cum = docs.select(
        "doc_id", shard.alias("shard"), n_tok.cast("long").alias("n_tokens")
    ).withColumn("cum_after", F.sum("n_tokens").over(w))
    # exact integer arithmetic end-to-end: DIV (integer division) instead
    # of double-divide-then-cast, so no float representation ever enters
    # the value path and the output is bit-identical to an integer oracle
    before = "(cum_after - n_tokens)"
    return with_cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"{before} DIV {int(budget_tokens)}").alias("pack_idx"),
        F.expr(f"{before} % {int(budget_tokens)}").cast("long").alias(
            "offset_tokens"
        ),
    )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 30,
    sample_fraction: float = 0.5,
    dedup_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    salt: str = "gear5",
) -> DataFrame:
    """Returns the curated (doc_id, n_tokens) set: near-dup losers
    dropped, short docs gated, survivors down-sampled
    deterministically."""
    non_canonical = (
        dedup_clusters(
            docs,
            threshold=dedup_threshold,
            num_hashes=num_hashes,
            bands=bands,
        )
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    kept = (
        docs.join(non_canonical, "doc_id", "left_anti")
        .withColumn("n_tokens", F.size(tokens(F.col("text"))))
        .filter(F.col("n_tokens") >= min_tokens)
    )
    return hash_sample(kept, sample_fraction, ["doc_id"], salt).select(
        "doc_id", "n_tokens"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 64,
) -> DataFrame:
    """Sliding-window document chunking for context-window preparation:
    each document becomes ceil-strided windows of ``chunk_tokens``
    whitespace tokens advancing by ``chunk_tokens - overlap_tokens``.

    Pure per-row arithmetic + explode — embarrassingly parallel, no
    shuffle at all (the chunks inherit the scan's partitioning), so the
    operator rides a 100 TB corpus scan at full width. The final window
    is emitted whenever any token remains uncovered (short docs emit
    exactly one window). Deterministic: (doc_id, chunk_idx) is a stable
    key for downstream exact/near dedup of chunks."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap({overlap_tokens}) < chunk({chunk_tokens})"
        )
    stride = chunk_tokens - overlap_tokens
    toks = tokens(F.col("text"))
    n = F.size(toks)
    # windows needed to cover n tokens: 1 + ceil(max(n - chunk, 0)/stride)
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + stride - 1) / stride
    ).cast("long")
    out = docs.select(
        "doc_id",
        toks.alias("_toks"),
        n.cast("long").alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_token"),
        F.least(F.lit(chunk_tokens), F.col("_n") - start)
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("_toks", (start + 1).cast("int"), chunk_tokens)
        ).alias("chunk_text"),
    )
