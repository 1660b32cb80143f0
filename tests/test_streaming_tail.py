"""Live-tail semantics: files appearing while the query runs are picked
up; the query stops itself after the idle timeout (SURVEY.md ST2)."""

from __future__ import annotations

import shutil
import threading
import time

from gear5_spark.pipeline.runner import bootstrap_table, run_stream_until_idle
from tests.oracle import oracle_rows


def test_tail_picks_up_late_files_then_stops(spark, tmp_path):
    from gen_fixtures import generate_changelog

    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    manifest = generate_changelog(staging, n_events=4000, n_convs=60, chunk_rows=1000)
    import os

    os.makedirs(live)
    chunks = sorted(
        f for f in os.listdir(staging) if f.startswith("chunk-")
    )
    # first half of the chunks exist before the query starts
    for c in chunks[:2]:
        shutil.copy(f"{staging}/{c}", f"{live}/{c}")

    def feeder():
        # remaining chunks arrive while the query is tailing
        for c in chunks[2:]:
            time.sleep(2.0)
            shutil.copy(f"{staging}/{c}", f"{live}/{c}.tmp")
            shutil.move(f"{live}/{c}.tmp", f"{live}/{c}")

    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=8)
    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    query = run_stream_until_idle(
        spark,
        live,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        idle_timeout_sec=12.0,
        max_wall_sec=240.0,
        max_files_per_trigger=1,
    )
    t.join()
    assert not query.isActive  # stopped itself on idle

    got = [
        r.asDict()
        for r in table.read()
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = oracle_rows(staging)
    assert len(got) == len(want) == manifest["final_live_keys"]
    for g, w in zip(got, want):
        assert g["text"] == w["text"]


def test_run_stream_default_timeout_drains_without_error(spark, tmp_path):
    """ADVICE r3 (high): with the default timeout_sec=None,
    awaitTermination() blocks until the availableNow drain completes and
    returns None — that is success, not a timeout; run_stream must not
    raise a spurious TimeoutError after every successful drain."""
    from gen_fixtures import generate_changelog
    from gear5_spark.pipeline.runner import run_stream

    log = str(tmp_path / "log")
    m = generate_changelog(log, n_events=1_000, n_convs=20, chunk_rows=500)
    table = bootstrap_table(spark, str(tmp_path / "t"), n_buckets=4)
    run_stream(spark, log, table, checkpoint_dir=str(tmp_path / "c"))
    assert table.read().count() == m["final_live_keys"]
