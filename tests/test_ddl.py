"""DDL actions (reference declares-but-stubs them, types/actions.go:5-10)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from gear5_spark.lake.merge import merge_into
from gear5_spark.lake.table import LakeTable, SchemaEvolutionError

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("_cdc_lsn", T.StringType(), True),
    ]
)

_BATCH = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("_cdc_lsn", T.StringType(), True),
        T.StructField("op", T.StringType(), False),
    ]
)


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_columns=["k"], n_buckets=4
    )


def test_add_column_and_backfill(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, spark.createDataFrame([("a", 1, "1", "insert")], _BATCH))
    t.add_column("note", "string")
    assert t.schema["note"].dataType == T.StringType()
    row = t.read().first()
    assert row["note"] is None  # old files null-backfilled on read
    # idempotent / same-type re-add is a no-op
    v = t.current_version()
    t.add_column("note", T.StringType())
    assert t.current_version() == v
    # conflicting re-add (narrowing) rejected
    with pytest.raises(SchemaEvolutionError):
        t.add_column("note", "bigint")


def test_truncate_keeps_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, spark.createDataFrame([("a", 1, "1", "insert")], _BATCH))
    v_data = t.current_version()
    t.truncate()
    assert t.read().count() == 0
    assert t.read(snapshot=t.snapshot(v_data)).count() == 1  # time travel
    # vacuum is still safe: data referenced by history survives
    assert t.vacuum() == []


def test_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.exists()
    t.drop()
    assert not os.path.exists(t.table_dir)
    assert not t.exists()
