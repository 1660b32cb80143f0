"""Root-cause harness for the dedup_count scaling question (VERDICT r2
item 2): the driver's round-2 run showed apply.dedup_count flat from 8
to 32 cores (34.2 -> 36.4 s) while merge/write scaled and the same-run
CPU ceiling still gave 2.1x.

Decomposes the exact work covered by the apply.dedup_count span into
additive components and times each at two parallelism levels, with
Spark stage metrics (task time, CPU, GC, shuffle, spill, skew) per
component so "doesn't scale" separates into:
  - engine serialization (wall >> task_time at high cores only),
  - skew (max_task_sec ~ wall),
  - spill/GC growth,
  - host ceiling (task_time itself doesn't drop with cores).

Components:
  scan           parquet scan + count (baseline I/O + decode)
  scan_keys      scan + json_object_keys projection of every after_json
                 (the Observation discovery cost, isolated)
  observe_full   scan + the full production Observation -> count
  observe_nokeys same, minus the payload-key discovery metric
  dedup          scan + latest_per_key + count (no observe, no persist)
  full           the production shape: observe + filter + dedup +
                 persist + count (== what apply.dedup_count times)

Usage: python scripts/diag_dedup.py [n_events] [cores ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARK_GRAFT_BENCH_WORK", "/dev/shm/gear5-bench")


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from gear5_spark.session import get_spark

    parts = max(cores, int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    return get_spark(
        app_name=f"diag-dedup-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.local.dir": f"{WORK}/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )


def components(spark, log_dir: str):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from gear5_spark.operators.dedup import latest_per_key
    from gear5_spark.pipeline.apply import KEY_COLS, _malformed_key
    from gear5_spark.sources.changelog import read_changelog

    def batch():
        return read_changelog(spark, log_dir)

    def obs_metrics(with_keys: bool):
        m = [
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
            F.count(F.lit(1)).alias("event_count"),
            F.expr("bit_xor(xxhash64(txn_id))").alias("txn_hash"),
            F.collect_set(
                F.when(~_malformed_key(), F.pmod(F.xxhash64("conv_id"), F.lit(32)))
            ).alias("buckets"),
            F.sum(F.when(_malformed_key(), 1).otherwise(0)).alias(
                "malformed_count"
            ),
        ]
        if with_keys:
            m.append(
                F.array_distinct(
                    F.flatten(F.collect_set(F.json_object_keys("after_json")))
                ).alias("payload_keys")
            )
        return m

    def c_scan():
        return batch().count()

    def c_scan_keys():
        # the discovery tokenize alone: project the key array and reduce
        return (
            batch()
            .select(F.json_object_keys("after_json").alias("ks"))
            .select(F.sum(F.size("ks")))
            .collect()
        )

    def c_observe_full():
        obs = Observation("d-full")
        n = batch().observe(obs, *obs_metrics(True)).count()
        _ = obs.get
        return n

    def c_observe_nokeys():
        obs = Observation("d-nok")
        n = batch().observe(obs, *obs_metrics(False)).count()
        _ = obs.get
        return n

    def c_dedup():
        return latest_per_key(batch(), KEY_COLS).count()

    def c_full():
        # the ROUND-2 production shape (key discovery riding the
        # Observation) — kept as the regression baseline
        obs = Observation("d-prod")
        observed = batch().observe(obs, *obs_metrics(True))
        valid = observed.filter(~_malformed_key())
        d = latest_per_key(valid, KEY_COLS).persist()
        n = d.count()
        _ = obs.get
        d.unpersist()
        return n

    def c_full_nokeys():
        # the ROUND-3 production shape: discovery moved off the
        # Observation into extend_registry's codegen job
        obs = Observation("d-prod3")
        observed = batch().observe(obs, *obs_metrics(False))
        valid = observed.filter(~_malformed_key())
        d = latest_per_key(valid, KEY_COLS).persist()
        n = d.count()
        _ = obs.get
        d.unpersist()
        return n

    return {
        "scan": c_scan,
        "scan_keys": c_scan_keys,
        "observe_full": c_observe_full,
        "observe_nokeys": c_observe_nokeys,
        "dedup": c_dedup,
        "full": c_full,
        "full_nokeys": c_full_nokeys,
    }


def main() -> None:
    from gen_fixtures import generate_changelog

    from gear5_spark import perf

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores_list = [int(c) for c in sys.argv[2:]] or [8, 32]
    seed = 42
    log_dir = f"/tmp/gear5-bench-log-{n_events}-{seed}-c64"
    if not os.path.exists(os.path.join(log_dir, "_manifest.json")):
        shutil.rmtree(log_dir, ignore_errors=True)
        generate_changelog(
            log_dir,
            n_events=n_events,
            n_convs=max(200, n_events // 500),
            chunk_rows=max(10_000, n_events // 64),
            seed=seed,
        )
    report: dict[str, dict] = {}
    for cores in cores_list:
        spark = _fresh_spark(cores)
        perf.track(spark)
        comps = components(spark, log_dir)
        # warmup: a full pass primes codegen + page cache
        comps["scan"]()
        # best-of-2 passes per component (steady-state protocol,
        # SCALING.md "First-run JIT"): pass 0 absorbs tiered-JIT
        # compilation of each component's codegen at data scale; span
        # names carry the pass index so stage metrics don't mix passes
        walls: list[dict[str, float]] = []
        for p in range(2):
            w: dict[str, float] = {}
            for name, fn in comps.items():
                with perf.span(f"diag{p}.{name}"):
                    t0 = time.perf_counter()
                    fn()
                    w[name] = round(time.perf_counter() - t0, 3)
            walls.append(w)
        sm = perf.stage_metrics(spark)
        row: dict[str, dict] = {}
        for name in comps:
            p_best = 0 if walls[0][name] <= walls[1][name] else 1
            row[name] = {
                "wall_sec": walls[p_best][name],
                "wall_sec_runs": [walls[0][name], walls[1][name]],
                **(sm.get(f"diag{p_best}.{name}") or {}),
            }
        perf.untrack()
        report[str(cores)] = row
        print(f"== local[{cores}] ==", flush=True)
        for name, m in row.items():
            print(f"  {name}: {json.dumps(m)}", flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DIAG_DEDUP.json",
    )
    with open(out, "w") as fh:
        json.dump({"n_events": n_events, "by_cores": report}, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
