"""Does lsh_cosine_topk's candidate-spread shuffle pay for itself?

VERDICT r4 item 3: lsh_cosine_topk was the only operator that got
SLOWER r3->r4 (5.8 -> 7.5 s) after the candidate-set repartition landed.
The builder's claim is that the spread is the scale-correct plan — AQE's
byte-based coalescing folds the skinny (q_id, b_id) pair rows into a
handful of tasks, serializing the CPU-bound exact-cosine scoring once
the candidate set is large. This harness measures the claim instead of
asserting it: run the SAME query with spread=True and spread=False at
the gate input size (1x: sf0.1-shaped, 2k vectors / 20 queries) and at
10x (20k vectors / 200 queries), steady-state best-of-N each, and
verify the two plans return identical rows.

The 10x input is generated deterministically (seeded numpy, same dim
and query-fraction as the gate fixture) — no external data.

Usage: python scripts/diag_lsh_spread.py [scale ...] [--runs N]
Writes DIAG_LSH_SPREAD.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
SEED = 11


def make_embeddings(spark, n: int):
    import numpy as np

    rng = np.random.RandomState(SEED)
    # mixture of clusters + noise, like the fixture generator: LSH
    # bucket occupancy (hence candidate-set size) resembles the gate's
    centers = rng.uniform(-1, 1, (max(8, n // 250), DIM))
    assign = rng.randint(0, len(centers), n)
    vecs = centers[assign] + rng.normal(0, 0.35, (n, DIM))
    rows = [
        (int(i), [float(x) for x in vecs[i]]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(32)


def time_plan(emb, queries, spread: bool, runs: int) -> tuple[float, int]:
    from gear5_spark.sim.ann import lsh_cosine_topk

    best, n_rows = None, -1
    for _ in range(runs):
        t0 = time.perf_counter()
        out = lsh_cosine_topk(emb, queries, k=3, spread=spread)
        n_rows = out.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, n_rows


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _fresh_spark

    # accepts both --runs=N and --runs N; everything else positional
    runs = 3
    positional: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    raise SystemExit("--runs needs a value")
                runs = int(argv[i])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            positional.append(a)
        i += 1
    scales = [int(a) for a in positional] or [1, 10]

    spark = _fresh_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    report: dict = {"dim": DIM, "runs_per_plan": runs, "scales": {}}
    for scale in scales:
        n = 2000 * scale
        emb = make_embeddings(spark, n).persist()
        emb.count()
        queries = emb.filter(F.col("vec_id") < 20 * scale).persist()
        nq = queries.count()

        # equality first: both plans must return the same rows
        rows_s = set(
            map(tuple, time_and_collect(emb, queries, True))
        )
        rows_n = set(
            map(tuple, time_and_collect(emb, queries, False))
        )
        assert rows_s == rows_n, "spread and no-spread plans diverge"

        t_spread, c1 = time_plan(emb, queries, True, runs)
        t_flat, c2 = time_plan(emb, queries, False, runs)
        assert c1 == c2
        report["scales"][str(scale)] = {
            "n_vectors": n,
            "n_queries": nq,
            "result_rows": c1,
            "spread_sec": round(t_spread, 3),
            "no_spread_sec": round(t_flat, 3),
            "spread_speedup": round(t_flat / t_spread, 3),
        }
        emb.unpersist()
        queries.unpersist()
    spark.stop()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DIAG_LSH_SPREAD.json",
    )
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


def time_and_collect(emb, queries, spread: bool):
    from gear5_spark.sim.ann import lsh_cosine_topk

    return [
        (r.vec_id, r.neighbor_id, r.rnk)
        for r in lsh_cosine_topk(emb, queries, k=3, spread=spread).collect()
    ]


if __name__ == "__main__":
    main()
