"""Multimodal plumbing: binary columns through Arrow batches, stubbed
codecs, content-hash dedup, lake round-trip."""

from __future__ import annotations

import pytest

from gear5_spark.multimodal.binary import (
    dedupe_media,
    extract_features,
    synthesize_media,
)


def test_feature_extraction_deterministic(spark):
    media = synthesize_media(spark, n=30)
    f1 = extract_features(media, dim=8).orderBy("media_id").collect()
    f2 = extract_features(media, dim=8).orderBy("media_id").collect()
    assert len(f1) == 30
    for a, b in zip(f1, f2):
        assert a["sha256"] == b["sha256"]
        assert a["feature"] == b["feature"]
        assert len(a["feature"]) == 8
        assert a["n_bytes"] > 0


def test_real_codec_stub_raises(spark):
    media = synthesize_media(spark, n=3)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        extract_features(media, decode_stub=False).collect()


def test_media_dedup(spark):
    media = synthesize_media(spark, n=20)
    dupes = media.union(media.limit(5))  # 5 duplicated payloads
    result = dedupe_media(dupes).collect()
    assert len(result) == 20
    assert sum(r["dup_count"] for r in result) == 25
    assert sorted(r["dup_count"] for r in result)[-5:] == [2] * 5


def test_media_lake_roundtrip(spark, tmp_path):
    """Binary column survives the lake table write/read path."""
    from gear5_spark.lake.table import LakeTable
    from gear5_spark.multimodal.binary import MEDIA_SCHEMA

    media = synthesize_media(spark, n=12)
    table = LakeTable.create(
        spark,
        str(tmp_path / "media"),
        schema=MEDIA_SCHEMA,
        key_columns=["media_id"],
        n_buckets=4,
    )
    table.overwrite(media)
    back = table.read().orderBy("media_id").collect()
    orig = media.orderBy("media_id").collect()
    assert len(back) == 12
    for b, o in zip(back, orig):
        assert bytes(b["payload"]) == bytes(o["payload"])
        assert b["meta"] == o["meta"]
