"""Token statistics + PII scanning."""

from __future__ import annotations

import pytest

from gear5_spark.text.stats import corpus_top_terms, doc_token_stats, pii_counts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a b"),            # repetition 3/4, 2 distinct
        (2, "x y z"),              # uniform
        (3, "  A  a\tB "),         # case/whitespace normalization
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_token_stats(docs):
    got = {r["doc_id"]: r for r in doc_token_stats(docs).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 2
    assert got[1]["repetition_ratio"] == 0.75
    assert got[2]["repetition_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["n_tokens"] == 3 and got[3]["n_distinct"] == 2  # a,a,b


def test_corpus_top_terms_deterministic_tiebreak(docs):
    got = corpus_top_terms(docs, k=3).collect()
    assert [(r["term"], r["freq"], r["rank"]) for r in got] == [
        ("a", 5, 1),   # 3 from doc1 + 2 from doc3
        ("b", 2, 2),
        ("x", 1, 3),   # freq-1 ties broken alphabetically: b(2) then x
    ]


def test_corpus_top_terms_stopwords(docs):
    got = corpus_top_terms(docs, k=2, stopwords=["a"]).collect()
    assert got[0]["term"] == "b"


def test_pii_counts(spark):
    rows = [
        (1, "mail me at jo.doe+x@example.co.uk or visit https://ex.com/a?b=1"),
        (2, "call +1 (555) 123-4567; server at 10.0.0.1"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert got[1]["emails"] == 1 and got[1]["urls"] == 1 and got[1]["has_pii"]
    assert got[2]["phones"] == 1 and got[2]["ipv4s"] == 1 and got[2]["has_pii"]
    assert not got[3]["has_pii"]
    assert got[3]["emails"] == got[3]["phones"] == 0


def test_gopher_quality_flags_rules(spark):
    from gear5_spark.text.quality import gopher_quality_flags

    good = ("the quick brown fox and the lazy dog ran over a hill to "
            "find some water in it for the long hot day ahead " * 3)
    rows = [
        (1, good),                              # passes every rule
        (2, "too short for the gate"),          # word-count floor
        (3, "#### " * 60 + good),               # symbol ratio cap
        (4, ("1 2 3 4 5 6 7 8 9 10 " * 10) + "the a of it in is and on"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert out[1].passes_gopher
    assert not out[2].passes_gopher and out[2].n_words < 50
    assert not out[3].passes_gopher and out[3].symbol_word_ratio > 0.1
    # mostly-numeric doc fails the alphabetic-word floor
    assert not out[4].passes_gopher and out[4].alpha_word_ratio < 0.8
    assert out[1].distinct_stopwords >= 2


def test_ngram_contamination(spark):
    from gear5_spark.text.curate import ngram_contamination

    leak = "the exact secret benchmark answer sequence appears here today"
    rows = [
        (1, "clean document with its own completely original words only"),
        (2, "prefix words then " + leak + " then suffix words follow"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = spark.createDataFrame([(100, "question: " + leak)], ["doc_id", "text"])
    out = {r.doc_id: r for r in ngram_contamination(docs, ev, shingle_n=5).collect()}
    assert not out[1].is_contaminated and out[1].contaminated_ngrams == 0
    assert out[2].is_contaminated and out[2].contaminated_ngrams >= 1


def test_pack_sequences_invariants(spark):
    import pyspark.sql.functions as F
    from gear5_spark.text.curate import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (10 + i % 7)) for i in range(200)], ["doc_id", "text"]
    )
    out = pack_sequences(docs, budget_tokens=64, n_shards=4).cache()
    rows = out.collect()
    assert len(rows) == 200
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        # offsets advance by exactly n_tokens within a shard (mod budget)
        cum = by_shard.get(r.shard, 0)
        assert r.pack_idx == cum // 64 and r.offset_tokens == cum % 64
        by_shard[r.shard] = cum + r.n_tokens
    # deterministic under repartitioning
    again = {
        (r.doc_id, r.pack_idx, r.offset_tokens)
        for r in pack_sequences(
            docs.repartition(13), budget_tokens=64, n_shards=4
        ).collect()
    }
    assert again == {(r.doc_id, r.pack_idx, r.offset_tokens) for r in rows}


def test_repetition_metrics_known_values(spark):
    from gear5_spark.text.quality import repetition_metrics

    docs = spark.createDataFrame(
        [
            # 4 lines, "dup" twice: dup_line_frac = 2/4; bigram "a b"
            # dominates
            (1, "a b a b a b\ndup\nuniq\ndup"),
            (2, "x y z"),  # no repetition at all
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert abs(r1["dup_line_frac"] - 0.5) < 1e-9
    assert r1["top_bigram_frac"] > 0.3  # "a b" repeats
    r2 = rows[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_5gram_frac"] == 0.0


def test_chunk_documents_coverage_and_overlap(spark):
    from gear5_spark.text.curate import chunk_documents

    text_long = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text_long), (2, "only three tokens")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc: exactly one chunk holding everything
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["n_tokens"] == 3
    # long doc: strided starts, full coverage, declared overlap
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    stride = 32 - 8
    for i, c in enumerate(chunks):
        assert c["start_token"] == i * stride
        assert len(c["chunk_text"].split(" ")) == c["n_tokens"]
    last = chunks[-1]
    assert last["start_token"] + last["n_tokens"] == 100  # covers the tail
    # consecutive chunks share exactly `overlap` tokens when full
    a = chunks[0]["chunk_text"].split(" ")
    b = chunks[1]["chunk_text"].split(" ")
    assert a[stride:] == b[:8]
