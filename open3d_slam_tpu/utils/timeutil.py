"""Time types and timers.

Mirror of the reference's Cartographer-style Universal Time Scale
(``time.hpp:41-55``): ``Time`` is an int64 count of 100 ns ticks since
year 1; plus a ``Timer`` stopwatch with running-average milliseconds
(``time.hpp:17-39``, ``src/time.cpp:35-78``) used for the engine's
self-reported telemetry.

These are host-side types (timestamps never enter jit traces; scans are
keyed by float seconds on device where needed).
"""
from __future__ import annotations

import sys as _sys
import time as _time
from dataclasses import dataclass, field
from typing import Dict, List

# 100ns ticks per second, as the reference's UTS.
TICKS_PER_SECOND = 10_000_000
# Offset between Unix epoch (1970) and year-1 epoch in seconds
# (719162 days, as Cartographer).
EPOCH_OFFSET_SECONDS = 719_162 * 24 * 3600


def from_seconds(seconds: float) -> int:
    """Seconds (duration) -> ticks."""
    return int(round(seconds * TICKS_PER_SECOND))


def to_seconds(ticks: int) -> float:
    """Ticks (duration) -> seconds."""
    return ticks / TICKS_PER_SECOND


def from_unix_seconds(unix_seconds: float) -> int:
    """Unix timestamp -> universal Time (ticks since year 1)."""
    return int(round((unix_seconds + EPOCH_OFFSET_SECONDS) * TICKS_PER_SECOND))


def to_unix_seconds(t: int) -> float:
    return t / TICKS_PER_SECOND - EPOCH_OFFSET_SECONDS


class Timer:
    """Stopwatch with running average, as the reference ``Timer``.

    ``recording`` supports SAMPLED telemetry: when False for the current
    invocation, ``stop()`` measures nothing (the registry hands out
    non-recording invocations so un-synced async dispatch times — which
    would read as ~0 ms — never pollute the average; see
    ``TelemetryRegistry.timer``).
    """

    def __init__(self, name: str = ""):
        self.name = name
        self._start = None
        self._total_ms = 0.0
        self._count = 0
        self.recording = True

    def start(self):
        self._start = _time.perf_counter()

    def elapsed_ms(self) -> float:
        return (_time.perf_counter() - self._start) * 1e3

    def add_measurement_ms(self, ms: float):
        self._total_ms += ms
        self._count += 1

    def stop(self) -> float:
        ms = self.elapsed_ms()
        if self.recording:
            self.add_measurement_ms(ms)
        self._start = None
        return ms

    @property
    def avg_ms(self) -> float:
        return self._total_ms / self._count if self._count else 0.0

    @property
    def count(self) -> int:
        return self._count

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


class TelemetryRegistry:
    """Named timers + periodic stats printing.

    Mirrors the reference's 15 s telemetry prints
    (``SlamWrapper.cpp:282-286,340-344,379-383``).
    """

    def __init__(self, print_every_sec: float = 15.0, enabled: bool = True,
                 sample_every: int = 32):
        self.timers: Dict[str, Timer] = {}
        self.print_every_sec = print_every_sec
        self.enabled = enabled
        # SAMPLED attribution: truthful per-stage timing needs a device
        # sync inside each stage (async dispatch reads as ~0 ms otherwise),
        # but each sync costs a full tunnel round-trip and serializes the
        # stage overlap.  Recording 1 of every ``sample_every`` invocations
        # keeps the printed averages honest (each sample IS a fully synced
        # stage) at ~1/sample_every of the overhead.
        self.sample_every = max(1, int(sample_every))
        self._invocations: Dict[str, int] = {}
        self._last_print = _time.monotonic()

    def timer(self, name: str, sampled: bool = False) -> Timer:
        """``sampled=True`` for HOT per-scan stages (record 1 of every
        sample_every invocations); rare stages record every invocation."""
        if name not in self.timers:
            self.timers[name] = Timer(name)
        t = self.timers[name]
        n = self._invocations.get(name, 0)
        self._invocations[name] = n + 1
        t.recording = self.enabled and (
            not sampled or n % self.sample_every == 0)
        return t

    def sync(self, x):
        """Block on device arrays in ``x`` — ONLY when telemetry is enabled.

        JAX dispatch is async: a stage that merely enqueues device work
        would otherwise report ~0 ms while its real cost drains into
        whatever blocks next (the reference's timers measure completed
        work, ``SlamWrapper.cpp:282-286``).  Callers gate this on the
        stage timer's ``recording`` flag (sampled invocations only); when
        telemetry is off we keep the async overlap — it is free pipeline
        parallelism.
        """
        if not self.enabled:
            return x
        import jax
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        return x

    def maybe_print(self, force: bool = False):
        if not self.enabled:
            return
        now = _time.monotonic()
        if force or now - self._last_print >= self.print_every_sec:
            for name, t in sorted(self.timers.items()):
                if t.count:
                    hz = 1000.0 / t.avg_ms if t.avg_ms > 0 else 0.0
                    # stderr: stdout is reserved for machine-readable output
                    # (bench JSON line, CLI eval results).
                    print(f"[o3d_slam_tpu] {name}: avg {t.avg_ms:.1f} ms, "
                          f"{hz:.1f} Hz, n={t.count}", file=_sys.stderr)
            self._last_print = now
