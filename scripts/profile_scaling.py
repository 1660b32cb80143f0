"""Profile the bulk-replay fixed cost at high core counts (VERDICT r1 #3).

Runs the same 4M-event replay at local[8] and local[32] with per-phase
timing (gear5_spark.perf spans) and prints the phase breakdown, so the
8->32 efficiency gap is attributed to concrete phases instead of guessed.

Usage: python scripts/profile_scaling.py [n_events] [cores ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
CORES = [int(c) for c in sys.argv[2:]] or [8, 32]
WORK = "/dev/shm/gear5-prof"


def log_dir() -> str:
    from gen_fixtures import generate_changelog

    d = f"/tmp/gear5-bench-log-{N_EVENTS}-42-c64"
    if not os.path.exists(os.path.join(d, "_manifest.json")):
        shutil.rmtree(d, ignore_errors=True)
        generate_changelog(
            d, n_events=N_EVENTS, n_convs=max(200, N_EVENTS // 500),
            chunk_rows=max(10_000, N_EVENTS // 64), seed=42,
        )
    return d


def run(cores: int, tag: str) -> dict:
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from gear5_spark import perf
    from gear5_spark.session import get_spark
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

    spark = get_spark(
        app_name=f"prof-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 64),
        extra_conf={"spark.local.dir": f"{WORK}/spark-tmp"},
    )
    # warmup (codegen/JIT) on a small log
    wdir = f"{WORK}/warm-{tag}"
    shutil.rmtree(wdir, ignore_errors=True)
    from gen_fixtures import generate_changelog

    generate_changelog(f"{wdir}/log", n_events=5_000, n_convs=100,
                       chunk_rows=5_000, seed=7)
    wt = bootstrap_table(spark, f"{wdir}/table", n_buckets=32)
    replay_batch(spark, f"{wdir}/log", wt, checkpoint_dir=f"{wdir}/ckpt")

    d = log_dir()
    work = f"{WORK}/replay-{tag}"
    shutil.rmtree(work, ignore_errors=True)
    perf.reset()
    t0 = time.perf_counter()
    table = bootstrap_table(spark, f"{work}/table", n_buckets=32)
    replay_batch(spark, d, table, checkpoint_dir=f"{work}/ckpt")
    total = time.perf_counter() - t0
    phases = perf.timings()
    # table.* spans nest inside apply.merge — sum only the top level
    accounted = sum(
        v["sec"] for k, v in phases.items() if k.startswith("apply.")
    )
    out = {
        "cores": cores,
        "total_sec": round(total, 3),
        "events_per_sec": round(N_EVENTS / total, 0),
        "phases": phases,
        "unaccounted_sec": round(total - accounted, 3),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    results = [run(c, f"c{c}") for c in CORES]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (
            hi["cores"] / lo["cores"]
        )
        print(json.dumps({"efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
