"""Opt-in clustered writes: the sort_columns table property sorts rows
within each bucket file, giving parquet row-group stats that skip inside
files for key lookups."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from gear5_spark.lake.merge import merge_into
from gear5_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("_cdc_lsn", T.StringType(), True),
        T.StructField("_cdc_updated_at", T.TimestampType(), True),
        T.StructField("_cdc_deleted_at", T.TimestampType(), True),
    ]
)

_BATCH_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]
)


def _merge(spark, table, rows):
    merge_into(
        table,
        spark.createDataFrame(
            [(k, v, str(lsn), None, None, "insert") for (k, v, lsn) in rows],
            _BATCH_SCHEMA,
        ),
    )


def _file_key_orders(table):
    orders = []
    for f in table.snapshot().files:
        ks = (
            pq.read_table(
                os.path.join(table.table_dir, f["path"]), columns=["k"]
            )
            .column("k")
            .to_pylist()
        )
        orders.append(ks)
    return orders


def test_sorted_writes_cluster_rows(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "sorted"), schema=SCHEMA, key_columns=["k"],
        n_buckets=2, extra_properties={"sort_columns": ["k"]},
    )
    # insert in deliberately scrambled order
    _merge(spark, t, [(f"k{i:03d}", i, i) for i in (9, 2, 7, 0, 5, 3, 8, 1)])
    for ks in _file_key_orders(t):
        assert ks == sorted(ks), ks
    # reads unaffected
    assert t.read().count() == 8
    assert t.lookup(k="k005").collect()[0]["v"] == 5


def test_unsorted_default_unchanged(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "plain"), schema=SCHEMA, key_columns=["k"],
        n_buckets=2,
    )
    _merge(spark, t, [(f"k{i:03d}", i, i) for i in range(8)])
    assert t.read().count() == 8  # property absent -> no sort requested
    assert t.snapshot().properties.get("sort_columns") is None
