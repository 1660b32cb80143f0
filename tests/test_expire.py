"""Snapshot expiration: bounded metadata log, archived lineage,
vacuum-eligible freed data, intact current reads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from gear5_spark.lake.merge import merge_into
from gear5_spark.lake.table import DATA_DIR, LakeTable

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


def _apply(spark, table, rows, batch_id):
    df = spark.createDataFrame(
        [(k, v, str(lsn), None, None, "update") for (k, v, lsn) in rows],
        _BATCH_SCHEMA,
    )
    merge_into(
        table, df, txn_app_id="exp", txn_batch_id=batch_id,
        lineage={"batch_id": batch_id, "event_count": len(rows)},
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_columns=["k"],
        n_buckets=2,
    )
    for b in range(5):  # v1..v5, each rewriting key k0's bucket
        _apply(spark, t, [("k0", b, 10 + b)], b)
    return t


def test_expire_keeps_recent_and_current_reads(spark, table):
    expired = table.expire_snapshots(keep_last=2)
    assert expired == [0, 1, 2, 3]
    assert [s.version for s in table.history()] == [4, 5]
    assert table.read().count() == 1
    assert table.read().collect()[0]["v"] == 4
    # time travel to a retained version still works; expired raises
    assert table.snapshot(4) is not None
    with pytest.raises(FileNotFoundError, match="expired"):
        table.snapshot(1)


def test_expire_is_noop_when_nothing_qualifies(table):
    assert table.expire_snapshots(keep_last=100) == []
    # older_than in the distant past: nothing is old enough
    assert table.expire_snapshots(keep_last=1, older_than_ms=1) == []
    assert [s.version for s in table.history()] == [0, 1, 2, 3, 4, 5]


def test_lineage_survives_expiration(table):
    before = sorted(
        r["batch_id"] for r in table.lineage_df().collect()
    )
    table.expire_snapshots(keep_last=1)
    after = sorted(r["batch_id"] for r in table.lineage_df().collect())
    assert after == before == [0, 1, 2, 3, 4]
    # idempotent under re-run (archive dedupes by version)
    table.expire_snapshots(keep_last=1)
    again = sorted(r["batch_id"] for r in table.lineage_df().collect())
    assert again == before


def test_expired_data_becomes_vacuumable(table):
    data_root = os.path.join(table.table_dir, DATA_DIR)
    n_before = len(os.listdir(data_root))
    assert table.vacuum(retention_sec=0.0) == []  # all dirs still live
    table.expire_snapshots(keep_last=1)
    removed = table.vacuum(retention_sec=0.0)
    assert removed, "expired-only commit dirs must be collectable"
    assert len(os.listdir(data_root)) == n_before - len(removed)
    assert table.read().count() == 1  # current snapshot untouched


def test_dead_manifests_deleted(table):
    mdir = os.path.join(table.table_dir, "_lake")
    n_manifests = lambda: sum(  # noqa: E731
        1 for f in os.listdir(mdir) if f.startswith("m-")
    )
    # an unreferenced young m-*.json is exactly what an in-flight
    # commit looks like between manifest write and publish: the default
    # grace must leave it alone, retention 0 sweeps it
    inflight = os.path.join(mdir, "m-99999990-inflight0000.json")
    with open(inflight, "w") as fh:
        fh.write('{"files": []}')
    before = n_manifests()
    table.expire_snapshots(keep_last=1)
    assert os.path.exists(inflight)  # grace respected
    assert n_manifests() == before  # every dead manifest is still young
    # a second expirable snapshot lets the sweep run again, now graceless
    table.add_column("extra_col", "string")
    table.expire_snapshots(keep_last=1, manifest_retention_sec=0.0)
    after = n_manifests()
    assert not os.path.exists(inflight)
    assert after < before
    # every retained snapshot still resolves
    assert table.read().count() == 1
