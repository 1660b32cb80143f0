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
