"""Optimization-round measurement harness (guide §1.4 noop isolation).

NOT the graded bench — bench.py stays frozen. This file isolates the
replay pipeline's phases with the noop sink and A/Bs candidate
optimizations so OPTIMIZATION_r06.md can cite real numbers.

Usage:
  python bench_extra.py --exp replay_phases --cores 8
  python bench_extra.py --exp write_codec --cores 8
  python bench_extra.py --exp replay --cores 8 --runs 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from bench import _bench_changelog, warmup_replay

WORK = os.environ.get("SPARK_GRAFT_BENCH_WORK", "/dev/shm/gear5-extra")


def _spark(cores: int, extra: dict | None = None):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from gear5_spark.session import get_spark

    parts = max(cores, int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    return get_spark(
        app_name=f"gear5-extra-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.local.dir": f"{WORK}/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            **(extra or {}),
        },
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _timed(label, fn, runs=2):
    times = []
    for _ in range(runs):
        times.append(round(fn(), 3))
    print(f"{label:<44} {min(times):8.3f}  runs={times}", flush=True)
    return min(times)


def exp_replay(spark, args) -> None:
    """Full replay_batch, bench-identical (sanity baseline)."""
    from gear5_spark import perf
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    for run in range(args.runs):
        shutil.rmtree(f"{WORK}/replay", ignore_errors=True)
        table = bootstrap_table(spark, f"{WORK}/replay/table", n_buckets=32)
        perf.reset()
        t0 = time.perf_counter()
        replay_batch(spark, log_dir, table, checkpoint_dir=f"{WORK}/replay/ckpt")
        dt = time.perf_counter() - t0
        print(f"replay run{run}: {dt:.3f}s  phases={json.dumps(perf.timings())}",
              flush=True)
    shutil.rmtree(f"{WORK}/replay", ignore_errors=True)


def exp_replay_ab(spark, args) -> None:
    """Interleaved replay_batch A/B: uncompressed batch cache (new
    default) vs compressed (r5 behavior) — same session, alternating,
    to decorrelate from host-tenancy drift."""
    from gear5_spark import perf
    from gear5_spark.pipeline.runner import bootstrap_table, replay_batch

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    results: dict[str, list] = {"old": [], "new": []}
    for rep in range(args.runs):
        for mode in ("old", "new"):
            os.environ["SPARK_GRAFT_BATCH_CACHE_COMPRESS"] = (
                "true" if mode == "old" else "false"
            )
            shutil.rmtree(f"{WORK}/ab", ignore_errors=True)
            table = bootstrap_table(spark, f"{WORK}/ab/table", n_buckets=32)
            perf.reset()
            prefix = f"ab-{mode}-r{rep}|"
            perf.track(spark, prefix=prefix)
            t0 = time.perf_counter()
            replay_batch(spark, log_dir, table, checkpoint_dir=f"{WORK}/ab/ckpt")
            dt = round(time.perf_counter() - t0, 3)
            sm = perf.stage_metrics(spark, prefix=prefix)
            perf.untrack()
            ph = {k: round(v["sec"], 2) for k, v in perf.timings().items()
                  if v["sec"] > 0.2}
            cpu = {k: round(m.get("cpu_sec", 0), 1) for k, m in sm.items()}
            results[mode].append(dt)
            print(f"ab {mode} rep{rep}: {dt}s phases={ph} cpu={cpu}",
                  flush=True)
    os.environ.pop("SPARK_GRAFT_BATCH_CACHE_COMPRESS", None)
    for mode, ts in results.items():
        print(f"ab {mode}: best {min(ts)} all {ts}", flush=True)
    shutil.rmtree(f"{WORK}/ab", ignore_errors=True)


def exp_replay_phases(spark, args) -> None:
    """Noop-isolated cumulative phases of the bulk replay plan."""
    from pyspark.sql import functions as F

    from gear5_spark.lake.table import BUCKET_COL
    from gear5_spark.operators.dedup import latest_per_key
    from gear5_spark.operators.normalize import normalize_changes
    from gear5_spark.parallel import shuffle_width
    from gear5_spark.pipeline.apply import BASE_PAYLOAD, KEY_COLS, _registry_specs
    from gear5_spark.pipeline.runner import bootstrap_table
    from gear5_spark.sources.changelog import read_changelog

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    shutil.rmtree(f"{WORK}/ph", ignore_errors=True)
    table = bootstrap_table(spark, f"{WORK}/ph/table", n_buckets=32)
    snap0 = table.snapshot()

    def base():
        return read_changelog(spark, log_dir)

    def placed():
        valid = base().filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        )
        parts = shuffle_width(spark)
        q = max(1, parts // 32)
        n_slots, slot_expr = table.placement_expr(snap0, slots_per_bucket=q)
        p = valid.withColumn(BUCKET_COL, table.bucket_expr(snap0)).withColumn(
            "_pslot", slot_expr
        )
        return p.repartition(n_slots, "_pslot")

    def deduped():
        return latest_per_key(placed(), KEY_COLS, co_group_cols=["_pslot"]).drop(
            "_pslot", BUCKET_COL
        )

    sc = spark.sparkContext
    sc.setJobDescription("phase: scan only")
    _timed("scan(all cols) -> noop", lambda: noop(base()), args.runs)
    sc.setJobDescription("phase: scan small cols")
    _timed(
        "scan(key+order cols) -> noop",
        lambda: noop(base().select("conv_id", "turn_idx", "lsn", "txn_seq")),
        args.runs,
    )
    sc.setJobDescription("phase: +placement shuffle")
    _timed("+bucket/slot repartition -> noop", lambda: noop(placed()), args.runs)
    sc.setJobDescription("phase: +dedup")
    _timed("+max_by dedup -> noop", lambda: noop(deduped()), args.runs)
    sc.setJobDescription("phase: +discovery (json_object_keys)")

    def disc():
        d = deduped()
        return (
            d.select(F.explode_outer(F.json_object_keys("after_json")).alias("k"))
            .filter(F.col("k").isNotNull() & ~F.col("k").isin("role", "text", "ts"))
            .groupBy("k")
            .count()
        )

    _timed("dedup + key-discovery agg -> noop", lambda: noop(disc()), args.runs)
    sc.setJobDescription("phase: +normalize(from_json)")
    specs = _registry_specs(
        {**BASE_PAYLOAD, "tool": {"type": "string", "source": "tool"}}
    )
    _timed(
        "dedup + normalize -> noop",
        lambda: noop(normalize_changes(deduped(), specs)),
        args.runs,
    )
    sc.setJobDescription("phase: map-parse variant")

    def map_parsed():
        d = deduped().withColumn(
            "_amap", F.from_json("after_json", "map<string,string>")
        )
        return d

    _timed(
        "dedup + map<string,string> parse -> noop",
        lambda: noop(map_parsed()),
        args.runs,
    )
    shutil.rmtree(f"{WORK}/ph", ignore_errors=True)


def exp_write_codec(spark, args) -> None:
    """Parquet write cost by codec/level for the merged batch shape."""
    from pyspark.sql import functions as F

    from gear5_spark.operators.normalize import normalize_changes
    from gear5_spark.operators.dedup import latest_per_key
    from gear5_spark.pipeline.apply import BASE_PAYLOAD, KEY_COLS, _registry_specs
    from gear5_spark.sources.changelog import read_changelog

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    specs = _registry_specs(
        {**BASE_PAYLOAD, "tool": {"type": "string", "source": "tool"}}
    )
    d = latest_per_key(
        read_changelog(spark, log_dir).filter(F.col("conv_id").isNotNull()),
        KEY_COLS,
    )
    out = normalize_changes(d, specs).filter(F.col("op") != "delete").persist()
    out.count()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for codec, level in [
        ("zstd", None), ("zstd", 1), ("snappy", None), ("lz4", None),
        ("uncompressed", None),
    ]:
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        if level is not None:
            hconf.setInt("parquet.compression.codec.zstd.level", level)
        tag = f"{codec}{'' if level is None else '-l'+str(level)}"
        dest = f"{WORK}/codec/{tag}"

        def w():
            shutil.rmtree(dest, ignore_errors=True)
            t0 = time.perf_counter()
            out.write.mode("overwrite").parquet(dest)
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"write codec {tag}")
        _timed(f"write parquet {tag}", w, args.runs)
        sz = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(dest)
            for f in fs
        )
        print(f"    size: {sz/2**20:.1f} MB", flush=True)
        # read-back decode cost matters for CoW re-reads / MoR reconstruct
        rd = spark.read.parquet(dest)
        spark.sparkContext.setJobDescription(f"read codec {tag}")
        _timed(f"  read-back {tag} -> noop", lambda: noop(rd), args.runs)
        if level is not None:
            hconf.unset("parquet.compression.codec.zstd.level")
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    out.unpersist()
    shutil.rmtree(f"{WORK}/codec", ignore_errors=True)


def exp_dedup_variants(spark, args) -> None:
    """End-to-end batch chain (dedup -> discovery -> normalize -> write):
    current wide SortAggregate plan vs narrow-decide + broadcast-semi-join
    plan (guide §8: decide with small rows, move big rows once)."""
    from pyspark.sql import functions as F

    from gear5_spark.lake.table import BUCKET_COL
    from gear5_spark.operators.dedup import latest_per_key
    from gear5_spark.operators.normalize import normalize_changes
    from gear5_spark.parallel import shuffle_width
    from gear5_spark.pipeline.apply import BASE_PAYLOAD, KEY_COLS, _registry_specs
    from gear5_spark.pipeline.runner import bootstrap_table
    from gear5_spark.sources.changelog import read_changelog

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    shutil.rmtree(f"{WORK}/dv", ignore_errors=True)
    table = bootstrap_table(spark, f"{WORK}/dv/table", n_buckets=32)
    snap0 = table.snapshot()
    specs = _registry_specs(
        {**BASE_PAYLOAD, "tool": {"type": "string", "source": "tool"}}
    )
    parts = shuffle_width(spark)
    q = max(1, parts // 32)
    n_slots, slot_expr = table.placement_expr(snap0, slots_per_bucket=q)

    def _valid():
        return read_changelog(spark, log_dir).filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        )

    def _place(df):
        p = df.withColumn(BUCKET_COL, table.bucket_expr(snap0)).withColumn(
            "_pslot", slot_expr
        )
        return p.repartition(n_slots, "_pslot")

    def _consume(deduped_raw, tag):
        d = deduped_raw.persist()
        t0 = time.perf_counter()
        n = d.count()
        ks = (
            d.select(F.explode_outer(F.json_object_keys("after_json")).alias("k"))
            .filter(F.col("k").isNotNull() & ~F.col("k").isin("role", "text", "ts"))
            .groupBy("k")
            .count()
            .collect()
        )
        t1 = time.perf_counter()
        out = normalize_changes(d, specs).filter(F.col("op") != "delete")
        dest = f"{WORK}/dv/out-{tag}"
        shutil.rmtree(dest, ignore_errors=True)
        out.withColumn(BUCKET_COL, F.lit(0)).write.mode("overwrite").parquet(dest)
        t2 = time.perf_counter()
        d.unpersist()
        return n, len(ks), t1 - t0, t2 - t1

    def run_current():
        t0 = time.perf_counter()
        placed = _place(_valid())
        d = latest_per_key(placed, KEY_COLS, co_group_cols=["_pslot"]).drop(
            "_pslot", BUCKET_COL
        )
        n, k, ta, tb = _consume(d, "cur")
        return time.perf_counter() - t0, n, ta, tb

    def run_semi():
        t0 = time.perf_counter()
        valid = _valid()
        wins = (
            _valid()  # independent scan: no shared Observation subtree
            .groupBy(*KEY_COLS)
            .agg(F.max(F.struct("lsn", "txn_seq")).alias("_w"))
            .select(
                F.col("conv_id").alias("_wc"),
                F.col("turn_idx").alias("_wt"),
                F.col("_w.lsn").alias("_wl"),
                F.col("_w.txn_seq").alias("_ws"),
            )
        )
        cond = (
            (valid.conv_id == wins._wc)
            & (valid.turn_idx == wins._wt)
            & valid.lsn.eqNullSafe(wins._wl)
            & valid.txn_seq.eqNullSafe(wins._ws)
        )
        winners = valid.join(F.broadcast(wins), cond, "left_semi")
        d = _place(winners).drop("_pslot", BUCKET_COL)
        n, k, ta, tb = _consume(d, "semi")
        return time.perf_counter() - t0, n, ta, tb

    def run_shj():
        # co-partitioned shuffled-hash left-semi: payload pays ONLY the
        # placement shuffle; narrow winners re-shuffle to the identical
        # partitioning; per-partition hash build on the narrow side
        t0 = time.perf_counter()
        wide = _place(_valid())
        wins = (
            _valid()
            .groupBy(*KEY_COLS)
            .agg(F.max(F.struct("lsn", "txn_seq")).alias("_w"))
            .withColumn(BUCKET_COL, table.bucket_expr(snap0))
            .withColumn("_wslot", slot_expr)
            .select(
                F.col("conv_id").alias("_wc"),
                F.col("turn_idx").alias("_wt"),
                F.col("_w.lsn").alias("_wl"),
                F.col("_w.txn_seq").alias("_ws"),
                "_wslot",
            )
            .repartition(n_slots, "_wslot")
        )
        cond = (
            (wide._pslot == wins._wslot)
            & (wide.conv_id == wins._wc)
            & (wide.turn_idx == wins._wt)
            & wide.lsn.eqNullSafe(wins._wl)
            & wide.txn_seq.eqNullSafe(wins._ws)
        )
        d = wide.join(wins.hint("shuffle_hash"), cond, "left_semi").drop(
            "_pslot", BUCKET_COL
        )
        n, k, ta, tb = _consume(d, "shj")
        return time.perf_counter() - t0, n, ta, tb

    from gear5_spark import perf

    variants = {"current": run_current, "semi": run_semi, "shj": run_shj}
    names = args.variants.split(",") if args.variants else list(variants)
    for rep in range(args.runs):
        for name in names:
            perf.reset()
            prefix = f"dv-{name}-r{rep}|"
            perf.track(spark, prefix=prefix)
            spark.sparkContext.setJobDescription(f"dedup variant {name}")
            with perf.span("v"):
                tot, n, ta, tb = variants[name]()
            sm = perf.stage_metrics(spark, prefix=prefix)
            perf.untrack()
            task = sum(m.get("task_time_sec", 0) for m in sm.values())
            cpu = sum(m.get("cpu_sec", 0) for m in sm.values())
            sw = sum(m.get("shuffle_write_mb", 0) for m in sm.values())
            print(
                f"variant {name:<8} total {tot:7.3f}s  rows={n}  "
                f"dedup+disc {ta:6.3f}s  norm+write {tb:6.3f}s  "
                f"task={task:.1f}s cpu={cpu:.1f}s shufW={sw:.0f}MB",
                flush=True,
            )
    shutil.rmtree(f"{WORK}/dv", ignore_errors=True)


def exp_chain(spark, args) -> None:
    """Full per-batch chain A/B: raw-cache + double JSON parse (current)
    vs parse-once map<string,string> cache, plus cache-compression and
    parquet-level knobs. Reports wall + summed task/cpu time per run."""
    import urllib.request

    from pyspark.sql import functions as F

    from gear5_spark.lake.table import BUCKET_COL
    from gear5_spark.operators.dedup import latest_per_key
    from gear5_spark.operators.normalize import normalize_changes
    from gear5_spark.parallel import shuffle_width
    from gear5_spark.pipeline.apply import BASE_PAYLOAD, KEY_COLS, _registry_specs
    from gear5_spark.pipeline.runner import bootstrap_table
    from gear5_spark.sources.changelog import read_changelog

    log_dir = _bench_changelog(args.events)
    warmup_replay(spark, f"{WORK}/warm")
    shutil.rmtree(f"{WORK}/ch", ignore_errors=True)
    table = bootstrap_table(spark, f"{WORK}/ch/table", n_buckets=32)
    snap0 = table.snapshot()
    specs = _registry_specs(
        {**BASE_PAYLOAD, "tool": {"type": "string", "source": "tool"}}
    )
    parts = shuffle_width(spark)
    q = max(1, parts // 32)
    n_slots, slot_expr = table.placement_expr(snap0, slots_per_bucket=q)
    sc = spark.sparkContext

    def _dedup():
        valid = read_changelog(spark, log_dir).filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        )
        placed = valid.withColumn(
            BUCKET_COL, table.bucket_expr(snap0)
        ).withColumn("_pslot", slot_expr).repartition(n_slots, "_pslot")
        return latest_per_key(placed, KEY_COLS, co_group_cols=["_pslot"]).drop(
            "_pslot", BUCKET_COL
        )

    def _jobs_window():
        ui = sc.uiWebUrl
        app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
            "id"
        ]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        return stages

    def run_variant(name: str):
        marker = f"chain-{name}"
        sc.setJobDescription(marker)
        t0 = time.perf_counter()
        if name.startswith("map"):
            from gear5_spark.operators.normalize import _coerce_sql

            d = _dedup().withColumn(
                "_amap", F.from_json("after_json", "map<string,string>")
            ).drop("after_json").persist()
            ks = (
                d.select(F.explode_outer(F.map_keys("_amap")).alias("k"))
                .filter(
                    F.col("k").isNotNull() & ~F.col("k").isin("role", "text", "ts")
                )
                .groupBy("k")
                .count()
                .collect()
            )
            t1 = time.perf_counter()
            out = d.select(
                "lsn", "txn_id", "txn_seq", "op", "ts_ms", "conv_id",
                "turn_idx",
                *[
                    _coerce_sql(
                        F.element_at(F.col("_amap"), s.source), s.token
                    ).alias(s.col)
                    for s in specs
                ],
            )
            from gear5_spark.operators.normalize import stamp_cdc_columns

            out = stamp_cdc_columns(out).filter(F.col("op") != "delete")
        else:
            d = _dedup().persist()
            ks = (
                d.select(
                    F.explode_outer(F.json_object_keys("after_json")).alias("k")
                )
                .filter(
                    F.col("k").isNotNull() & ~F.col("k").isin("role", "text", "ts")
                )
                .groupBy("k")
                .count()
                .collect()
            )
            t1 = time.perf_counter()
            out = normalize_changes(d, specs).filter(F.col("op") != "delete")
        dest = f"{WORK}/ch/out-{name}"
        shutil.rmtree(dest, ignore_errors=True)
        out.withColumn(BUCKET_COL, F.lit(0)).write.mode("overwrite").parquet(dest)
        t2 = time.perf_counter()
        n = d.count()
        d.unpersist()
        stages = [
            s
            for s in _jobs_window()
            if (s.get("description") or "") == marker
        ]
        task = sum(s["executorRunTime"] for s in stages) / 1000
        cpu = sum(s["executorCpuTime"] for s in stages) / 1e9
        print(
            f"chain {name:<14} dedup+disc {t1-t0:7.3f}s norm+write "
            f"{t2-t1:6.3f}s rows={n} task={task:.1f}s cpu={cpu:.1f}s",
            flush=True,
        )

    names = (args.variants or "raw,map").split(",")
    for rep in range(args.runs):
        for name in names:
            if name == "map_nocomp":
                spark.conf.set(
                    "spark.sql.inMemoryColumnarStorage.compressed", "false"
                )
            elif name == "raw_nocomp":
                spark.conf.set(
                    "spark.sql.inMemoryColumnarStorage.compressed", "false"
                )
            else:
                spark.conf.set(
                    "spark.sql.inMemoryColumnarStorage.compressed", "true"
                )
            if name.endswith("_z1"):
                sc._jsc.hadoopConfiguration().setInt(
                    "parquet.compression.codec.zstd.level", 1
                )
            run_variant(name)
    shutil.rmtree(f"{WORK}/ch", ignore_errors=True)


EXPS = {
    "replay": exp_replay,
    "replay_ab": exp_replay_ab,
    "replay_phases": exp_replay_phases,
    "write_codec": exp_write_codec,
    "dedup_variants": exp_dedup_variants,
    "chain": exp_chain,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, choices=sorted(EXPS))
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--variants", type=str, default=None)
    a = ap.parse_args()
    spark = _spark(a.cores)
    print(f"=== exp={a.exp} cores={a.cores} events={a.events}", flush=True)
    EXPS[a.exp](spark, a)
    spark.stop()


if __name__ == "__main__":
    main()
