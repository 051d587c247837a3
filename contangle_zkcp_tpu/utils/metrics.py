"""Lightweight structured metrics/telemetry (SURVEY.md §5.5).

The reference ships only a commented-out ``pretty_env_logger`` init
(/root/reference/cmd/src/main.rs:28) — no metrics layer at all.  For a
framework intended for production serving we provide one anyway: process-
local counters, gauges and phase timers with JSON-line export, designed so
instrumentation is free when disabled (a no-op registry) and allocation-
free on the hot path when enabled (plain dict bumps; never inside jit).

Usage:
    from contangle_zkcp_tpu.utils import metrics
    with metrics.timer("groth16.prove"):
        ...
    metrics.count("msm.points", n)
    metrics.gauge("msm.heavy_buckets", len(heavy))
    print(metrics.registry().to_json())

Enable emission of one JSON line per timer exit by setting
``ZKCP_METRICS=1`` (stderr, machine-parseable).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from contextlib import contextmanager


class Registry:
    """Thread-safe counters / gauges / timer aggregates."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters: dict[str, float] = {}
        self.gauges: dict[str, float] = {}
        # name -> [count, total_sec, max_sec]
        self.timers: dict[str, list] = {}

    def count(self, name: str, delta: float = 1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + delta

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self.gauges[name] = value

    def observe(self, name: str, sec: float) -> None:
        with self._lock:
            agg = self.timers.setdefault(name, [0, 0.0, 0.0])
            agg[0] += 1
            agg[1] += sec
            agg[2] = max(agg[2], sec)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
                "timers": {
                    k: {"count": c, "total_sec": t, "max_sec": m}
                    for k, (c, t, m) in self.timers.items()
                },
            }

    def to_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.gauges.clear()
            self.timers.clear()


_REGISTRY = Registry()


def registry() -> Registry:
    return _REGISTRY


def enabled() -> bool:
    return os.environ.get("ZKCP_METRICS", "") not in ("", "0")


def count(name: str, delta: float = 1) -> None:
    _REGISTRY.count(name, delta)


def gauge(name: str, value: float) -> None:
    _REGISTRY.gauge(name, value)


def timed(name: str):
    """Decorator form of `timer` for whole-function phases."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*a, **kw):
            with timer(name):
                return fn(*a, **kw)

        return wrapped

    return deco


@contextmanager
def timer(name: str):
    """Times a phase; always aggregates, optionally emits a JSON line."""
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _REGISTRY.observe(name, dt)
        if enabled():
            print(
                json.dumps({"metric": name, "sec": round(dt, 4)}),
                file=sys.stderr,
                flush=True,
            )
