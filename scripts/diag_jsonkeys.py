"""A/B the payload-key scan: ``json_object_keys`` (shared Jackson
factory, JVM-wide canonicalizer lock) vs ``map_keys(from_json(..,
map<string,string>))`` (per-task factory) at two core counts.

Background: DIAG_DEDUP.json measured the keys scan at 49.8 task-s on 8
cores vs 805.7 task-s on 32 for identical input (~16x CPU inflation,
flat GC) — the signature of adaptive-spin contention on
``expressions/json/SharedFactory``'s canonicalizer, not real work.
``pipeline/apply._payload_keys`` documents the mechanism; this script
is the evidence harness.

Usage: python scripts/diag_jsonkeys.py [n_events] [cores ...]
Prints one JSON line per (variant, cores) with wall, task_time, cpu.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARK_GRAFT_BENCH_WORK", "/dev/shm/gear5-bench")

VARIANTS = {
    "json_object_keys": lambda F: F.json_object_keys("after_json"),
    "from_json_map_keys": lambda F: F.map_keys(
        F.from_json("after_json", "map<string,string>")
    ),
}


def run(cores: int, log_dir: str) -> list[dict]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gear5_spark import perf
    from gear5_spark.session import get_spark
    from gear5_spark.sources.changelog import read_changelog

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(
        app_name=f"diag-jsonkeys-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 64),
        extra_conf={
            "spark.local.dir": f"{WORK}/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )
    out = []
    for name, expr in VARIANTS.items():
        df = read_changelog(spark, log_dir)
        # warmup pass (JIT) on a slice, then the timed full pass
        df.limit(50_000).select(
            F.explode_outer(expr(F)).alias("k")
        ).groupBy("k").count().collect()
        perf.reset()
        perf.track(spark, prefix=f"keys-{name}|")
        with perf.span(f"keys.{name}"):
            rows = (
                df.select(F.explode_outer(expr(F)).alias("k"))
                .groupBy("k")
                .count()
                .collect()
            )
        sm = perf.stage_metrics(spark, f"keys-{name}|") or {}
        m = sm.get(f"keys.{name}", {})
        out.append(
            {
                "variant": name,
                "cores": cores,
                "wall_sec": round(perf.timings()[f"keys.{name}"]["sec"], 3),
                "task_time_sec": m.get("task_time_sec"),
                "cpu_sec": m.get("cpu_sec"),
                "gc_sec": m.get("gc_sec"),
                "n_keys": len(rows),
            }
        )
        perf.untrack()
    spark.stop()
    return out


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = [int(c) for c in sys.argv[2:]] or [8, 32]
    from bench import make_bench_changelog

    log_dir = f"/tmp/gear5-bench-log-{n_events}-42-c64"
    if not os.path.exists(os.path.join(log_dir, "_manifest.json")):
        make_bench_changelog(log_dir, n_events)
    for c in cores:
        for rec in run(c, log_dir):
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
