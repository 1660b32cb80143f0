"""Opportunistic full-bench-window sampler.

Loops: probe the box with a short REAL replay (400k events, local[8] —
the protocol that samples the bursty vCPU starvation faithfully, see
BASELINE.md round-5 submit section); when the probe clears the gate,
run ONE full ``bench.py`` window and stop. Every attempt — gated or
run — is appended to the log as one JSON line; the bench JSON line and
BENCH_DETAIL.json land exactly as a driver run would leave them.

Usage: python scripts/bench_when_quiet.py [max_minutes] [out_json]
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = float(os.environ.get("SPARK_GRAFT_PROBE_GATE", "85000"))
LOG = os.environ.get("SPARK_GRAFT_RECORD_LOG", "/tmp/bench_attempts.jsonl")
IDLE_BETWEEN = 120.0


def _probe() -> tuple[float, list[float]]:
    """Steady-state probe: 2 reps in one session, scored on the best.

    The first full-scale rep in a fresh session pays tiered-JIT
    compilation at data scale (measured 14.0 s cold vs 4.8 s warm for
    the identical 400k replay — the 5k-event warmup does not amortize
    it), so a single-rep probe conflates JIT with weather and can sit
    ~3x under the gate on a perfectly clean box. The warm rep is the
    weather signal; both reps are logged."""
    p = subprocess.run(
        [sys.executable, "scripts/diag_replay_once.py", "400000", "8", "2"],
        cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    reps = []
    for line in p.stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "events_per_sec" in d:
            reps.append(d["events_per_sec"])
    return (max(reps, default=0.0), reps)


def main() -> None:
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_window.out"
    t_end = time.time() + max_minutes * 60
    while time.time() < t_end:
        eps, reps = _probe()
        rec = {"ts": round(time.time(), 1), "probe_events_per_sec": eps,
               "probe_reps": reps, "gate": GATE, "ran": eps >= GATE}
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if eps >= GATE:
            with open(out_path, "w") as fh:
                p = subprocess.run(
                    [sys.executable, "bench.py"], cwd=ROOT,
                    stdout=fh, stderr=subprocess.STDOUT, timeout=3600,
                )
            print(json.dumps({"bench_rc": p.returncode,
                              "out": out_path}), flush=True)
            return
        time.sleep(IDLE_BETWEEN)
    print("window exhausted", flush=True)


if __name__ == "__main__":
    main()
