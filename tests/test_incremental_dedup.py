"""Incremental LSH dedup: a new crawl batch matched against a persisted
corpus signature index, no corpus signature recompute (text/dedupe.py).

Covers: witness semantics (min matching corpus doc), raw vs compacted
index equivalence, increment absorption (a second batch matches a doc
indexed by the first), audit mode (all_matches) and its compacted-index
guard."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gear5_spark.text.dedupe import (
    compact_signature_index,
    extend_signature_index,
    incremental_lsh_duplicates,
    lsh_band_buckets,
    lsh_near_duplicates,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 10, 11 near-identical; 12 unique; 13 shares nothing with the batch
    return _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "the quick brown fox jumps over the lazy dog today"),
            (12, "completely unrelated corpus text about spark shuffles"),
            (13, "another singleton document mentioning watermark state"),
        ],
    )


@pytest.fixture(scope="module")
def index(corpus):
    return lsh_band_buckets(corpus).persist()


def test_witness_is_min_matching_corpus_doc(spark, corpus, index):
    new = _docs(
        spark,
        [
            # near-dup of BOTH 10 and 11 -> witness must be min = 10
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            # novel content -> no row
            (101, "fresh unseen prose with zero shingle overlap here"),
        ],
    )
    got = {
        r["doc_id"]: r["corpus_doc_id"]
        for r in incremental_lsh_duplicates(new, index).collect()
    }
    assert got == {100: 10}


def test_compacted_index_equals_raw(spark, corpus, index):
    new = _docs(
        spark,
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
    )
    raw = incremental_lsh_duplicates(new, index).collect()
    compacted = incremental_lsh_duplicates(
        new, compact_signature_index(index)
    ).collect()
    assert sorted(map(tuple, raw)) == sorted(map(tuple, compacted))


def test_all_matches_returns_every_witness(spark, corpus, index):
    new = _docs(
        spark,
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
    )
    pairs = {
        (r["doc_id"], r["corpus_doc_id"])
        for r in incremental_lsh_duplicates(
            new, index, all_matches=True
        ).collect()
    }
    assert (100, 10) in pairs and (100, 11) in pairs
    assert all(c in (10, 11) for _, c in pairs)
    with pytest.raises(ValueError, match="compacted"):
        incremental_lsh_duplicates(
            new, compact_signature_index(index), all_matches=True
        )


def test_increment_absorbs_into_index(spark, corpus, index):
    # batch 1: novel doc 200 -> indexed; batch 2: near-dup of 200 must
    # match it through the EXTENDED index (min-compaction is union-safe).
    # The steady-state shape: the persisted index is the COMPACTED form
    # and the absorb step must compose with it (review finding r4).
    b1 = _docs(
        spark, [(200, "brand new subject matter arriving in batch one")]
    )
    assert incremental_lsh_duplicates(b1, index).count() == 0
    extended = extend_signature_index(
        compact_signature_index(index), lsh_band_buckets(b1)
    )
    b2 = _docs(
        spark, [(300, "brand new subject matter arriving in batch one")]
    )
    got = {
        r["doc_id"]: r["corpus_doc_id"]
        for r in incremental_lsh_duplicates(b2, extended).collect()
    }
    assert got == {300: 200}
    # within-batch pairs stay the batch-local operator's job
    both = b1.unionByName(b2)
    assert {(200, 300)} == {
        (r["doc_id_a"], r["doc_id_b"])
        for r in lsh_near_duplicates(both).collect()
    }


def test_md5_family_matches_gate_split(spark):
    # the gate query's corpus/new split over real documents: every
    # returned witness must share at least one band bucket, and every
    # EXACT duplicate in the new batch must be found (LSH with any
    # identical-signature doc always collides on all bands)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    index = lsh_band_buckets(corpus, hasher="md5")
    out = incremental_lsh_duplicates(new, index, hasher="md5")
    exact = (
        new.alias("n")
        .join(
            corpus.alias("c"),
            F.lower(F.trim(F.col("n.text")))
            == F.lower(F.trim(F.col("c.text"))),
        )
        .select(F.col("n.doc_id").alias("doc_id"))
        .distinct()
    )
    missed = exact.join(out, "doc_id", "left_anti").count()
    assert missed == 0


def test_rowwise_signatures_bit_identical_to_agg(spark):
    # the stream-safe projection path must produce EXACTLY the batch
    # signatures — both hash families
    from gear5_spark.text.dedupe import (
        minhash_signatures,
        minhash_signatures_rowwise,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(120)
    )
    for hasher in ("xxhash64", "md5"):
        a = {
            r["doc_id"]: tuple(r["minhash"])
            for r in minhash_signatures(docs, hasher=hasher).collect()
        }
        b = {
            r["doc_id"]: tuple(r["minhash"])
            for r in minhash_signatures_rowwise(docs, hasher=hasher).collect()
        }
        assert a == b


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    # availableNow drain over a file stream must produce the same
    # (doc_id, min witness) set as the batch operator
    from gear5_spark.streaming.dedup import run_incremental_dedup_stream

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    new_dir = str(tmp_path / "new")
    new.repartition(3).write.parquet(new_dir)

    index = compact_signature_index(lsh_band_buckets(corpus))
    index_dir = str(tmp_path / "idx")
    index.write.parquet(index_dir)
    static_index = spark.read.parquet(index_dir)

    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    out_dir = str(tmp_path / "out")
    run_incremental_dedup_stream(
        stream, static_index, out_dir, str(tmp_path / "ckpt"),
        timeout_sec=300,
    )
    got = {
        (r["doc_id"], r["corpus_doc_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["doc_id"], r["corpus_doc_id"])
        for r in incremental_lsh_duplicates(new, static_index).collect()
    }
    assert got == want and len(want) > 0
