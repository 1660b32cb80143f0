"""Lightweight phase timing for the apply/commit path.

Every batch records wall-clock per engine phase into a process-global
dict (one ``perf_counter`` pair per phase — negligible overhead). Used
by bench.py and the scaling profiler to attribute fixed costs
(VERDICT r1 #3) instead of guessing; read with ``timings()``/``reset()``.
"""

from __future__ import annotations

import contextlib
import time

_TIMINGS: dict[str, float] = {}
_COUNTS: dict[str, int] = {}


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMINGS[name] = _TIMINGS.get(name, 0.0) + dt
        _COUNTS[name] = _COUNTS.get(name, 0) + 1


def timings() -> dict[str, dict[str, float]]:
    return {
        k: {"sec": round(v, 4), "n": _COUNTS[k]}
        for k, v in sorted(_TIMINGS.items(), key=lambda kv: -kv[1])
    }


def reset() -> None:
    _TIMINGS.clear()
    _COUNTS.clear()
