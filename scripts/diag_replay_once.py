"""Run ONE bulk replay at a given core count (for profiling runs —
keeps the JVM alive long enough to sample with jstack).

Usage: python scripts/diag_replay_once.py [n_events] [cores] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARK_GRAFT_BENCH_WORK", "/dev/shm/gear5-bench")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from bench import make_bench_changelog, warmup_replay
    from gear5_spark import perf
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch
    from gear5_spark.session import get_spark

    log_dir = f"/tmp/gear5-bench-log-{n_events}-42-c64"
    if not os.path.exists(os.path.join(log_dir, "_manifest.json")):
        make_bench_changelog(log_dir, n_events)
    spark = get_spark(
        app_name=f"diag-replay-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 64),
        extra_conf={
            "spark.local.dir": f"{WORK}/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )
    warmup_replay(spark, f"{WORK}/replay-once-warm")
    for i in range(repeats):
        work = f"{WORK}/replay-once-{cores}"
        shutil.rmtree(work, ignore_errors=True)
        table = bootstrap_table(spark, f"{work}/table", n_buckets=32)
        perf.reset()
        t0 = time.monotonic()
        replay_batch(spark, log_dir, table, checkpoint_dir=f"{work}/ckpt")
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "iter": i,
                    "cores": cores,
                    "wall_sec": round(wall, 2),
                    "events_per_sec": round(n_events / wall, 1),
                    "phases": perf.timings(),
                }
            ),
            flush=True,
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
