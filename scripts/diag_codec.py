"""A/B the shuffle/spill compression codec on the bulk replay.

The replay's heavy phases are bandwidth-bound on this box (SCALING.md);
shuffle bytes are zstd-compressed by default since round 4 (lz4 before).
zstd trades CPU for bytes — worth it only if the byte reduction beats
the compressor cost in the contended window. Usage:

    python scripts/diag_codec.py [n_events] [cores]

Prints one JSON line per codec with wall-clock, dedup-phase seconds, and
shuffle bytes from stage metrics. Fixture shape and warmup recipe are
imported from bench.py so this measures the SAME pipeline the bench
scores — they cannot drift apart.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/gear5-codec"


def run(codec: str, log_dir: str, cores: int, n_events: int) -> dict:
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from bench import warmup_replay
    from gear5_spark import perf
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch
    from gear5_spark.session import get_spark

    spark = get_spark(
        app_name=f"codec-{codec}",
        master=f"local[{cores}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.io.compression.codec": codec,
            "spark.local.dir": f"{WORK}/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )
    warmup_replay(spark, f"{WORK}/warm-{codec}")

    # steady-state protocol (SCALING.md "First-run JIT"): the first
    # full-scale run in a session pays tiered-JIT compilation the small
    # warmup cannot amortize — time TWO runs, score the best, report
    # both so the codec comparison never embeds first-run JIT CPU
    best = None
    runs_sec = []
    for run_idx in range(2):
        work = f"{WORK}/replay-{codec}"
        shutil.rmtree(work, ignore_errors=True)
        table = bootstrap_table(spark, f"{work}/table", n_buckets=32)
        perf.reset()
        perf.track(spark, prefix=f"codec-{codec}-r{run_idx}|")
        t0 = time.perf_counter()
        replay_batch(spark, log_dir, table, checkpoint_dir=f"{work}/ckpt")
        elapsed = time.perf_counter() - t0
        sm = perf.stage_metrics(spark, prefix=f"codec-{codec}-r{run_idx}|")
        perf.untrack()
        phases = perf.timings()
        shutil.rmtree(work, ignore_errors=True)
        runs_sec.append(round(elapsed, 2))
        if best is None or elapsed < best["wall_sec"]:
            dd = sm.get("apply.dedup_count", {})
            best = {
                "codec": codec,
                "cores": cores,
                "n_events": n_events,
                "wall_sec": round(elapsed, 2),
                "dedup_sec": round(
                    phases.get("apply.dedup_count", {}).get("sec", 0), 2
                ),
                "dedup_cpu_sec": dd.get("cpu_sec"),
                "shuffle_write_mb": dd.get("shuffle_write_mb"),
                "phases": {k: round(v["sec"], 2) for k, v in phases.items()},
            }
    best["runs_sec"] = runs_sec
    return best


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from bench import make_bench_changelog

    log_dir = f"{WORK}/log-{n_events}"
    if not os.path.exists(log_dir):
        make_bench_changelog(log_dir, n_events, seed=1234)
    for codec in ("lz4", "zstd"):
        print(json.dumps(run(codec, log_dir, cores, n_events)), flush=True)


if __name__ == "__main__":
    main()
