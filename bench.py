"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Measures the headline CDC path — bulk replay throughput (events/sec) at
TWO parallelism levels (the sandbox stand-in for N vs 4N executors,
BASELINE.md scaling row) plus streaming replay and the main analytic
operators at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "scaling": {...}, "config": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "4000000"))
LOW_CPUS = max(2, CPUS // 4)
SEED = 42


def _bench_changelog() -> str:
    """Seeded bench change log, cached across runs (same seed+size)."""
    from gen_fixtures import generate_changelog

    d = f"/tmp/gear5-bench-log-{N_EVENTS}-{SEED}-c64"
    if not os.path.exists(os.path.join(d, "_manifest.json")):
        shutil.rmtree(d, ignore_errors=True)
        generate_changelog(
            d, n_events=N_EVENTS, n_convs=max(200, N_EVENTS // 500),
            chunk_rows=max(10_000, N_EVENTS // 64), seed=SEED,
        )  # cached across rounds: same seed+size -> same bytes
    return d


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from gear5_spark.session import get_spark

    return get_spark(
        app_name=f"gear5-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def _replay(spark, log_dir: str, tag: str, warmup: bool = True) -> float:
    from gen_fixtures import generate_changelog
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

    work = f"/tmp/gear5-bench-replay-{tag}"
    shutil.rmtree(work, ignore_errors=True)
    if warmup:
        # JVM/codegen warmup on a small log so the first timed session
        # isn't penalized (keeps the N vs 4N comparison honest)
        wdir = f"{work}/warm"
        generate_changelog(f"{wdir}/log", n_events=5_000, n_convs=100,
                           chunk_rows=5_000, seed=7)
        wt = bootstrap_table(spark, f"{wdir}/table", n_buckets=32)
        replay_batch(spark, f"{wdir}/log", wt, checkpoint_dir=f"{wdir}/ckpt")
    table = bootstrap_table(spark, f"{work}/table", n_buckets=32)
    t0 = time.perf_counter()
    replay_batch(spark, log_dir, table, checkpoint_dir=f"{work}/ckpt")
    elapsed = time.perf_counter() - t0
    assert table.read().count() > 0
    return elapsed


def _stream_replay(spark, log_dir: str) -> float:
    from gear5_spark.pipeline.runner import bootstrap_table, run_stream

    work = "/tmp/gear5-bench-stream"
    shutil.rmtree(work, ignore_errors=True)
    table = bootstrap_table(spark, f"{work}/table", n_buckets=32)
    t0 = time.perf_counter()
    run_stream(
        spark, log_dir, table, checkpoint_dir=f"{work}/ckpt",
        max_files_per_trigger=4, timeout_sec=3600,
    )
    return time.perf_counter() - t0


def main() -> None:
    import __spark_entry__ as entrymod

    log_dir = _bench_changelog()
    results: dict[str, float] = {}
    scaling: dict[str, float] = {}

    # --- scaling evidence: identical bulk replay at N and 4N local cores.
    # min-of-2 per level: the sandbox host carries unpredictable external
    # load, and the first run pays cold page-cache; the min is the least
    # contaminated estimate of the engine's own cost.
    spark = _fresh_spark(LOW_CPUS)
    t_low = min(
        _replay(spark, log_dir, f"low{LOW_CPUS}-a"),
        _replay(spark, log_dir, f"low{LOW_CPUS}-b", warmup=False),
    )
    results[f"cdc_replay_bulk_local{LOW_CPUS}"] = round(t_low, 3)

    spark = _fresh_spark(CPUS)
    t_high = min(
        _replay(spark, log_dir, f"high{CPUS}-a"),
        _replay(spark, log_dir, f"high{CPUS}-b", warmup=False),
    )
    results[f"cdc_replay_bulk_local{CPUS}"] = round(t_high, 3)

    tp_low = N_EVENTS / t_low
    tp_high = N_EVENTS / t_high
    ratio = CPUS / LOW_CPUS
    scaling = {
        "n_events": N_EVENTS,
        "cores_low": LOW_CPUS,
        "cores_high": CPUS,
        "events_per_sec_low": round(tp_low, 1),
        "events_per_sec_high": round(tp_high, 1),
        "speedup": round(tp_high / tp_low, 3),
        "efficiency": round((tp_high / tp_low) / ratio, 3),
    }

    # --- streaming replay (micro-batched exactly-once path)
    t0 = time.perf_counter()
    results["cdc_replay_stream"] = round(_stream_replay(spark, log_dir), 3)

    # --- analytic operators at SF_DIR
    bench_queries = [
        "latest_per_key",
        "changelog_replay",
        "incremental_scan",
        "exact_dedup",
        "token_count",
        "quality_score",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "cosine_topk",
        "lsh_cosine_topk",
    ]
    qs = entrymod.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        n = qs[name](spark, SF_DIR).count()
        results[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_and_operator_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": SF_DIR,
                "scaling": scaling,
                "config": {
                    "n_events": N_EVENTS,
                    "master_high": f"local[{CPUS}]",
                    "master_low": f"local[{LOW_CPUS}]",
                    "shuffle_partitions": "=cores",
                    "n_buckets": 32,
                    "aqe": True,
                    "seed": SEED,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
