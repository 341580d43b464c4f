"""Wall-time profiling scopes.

Equivalent of the MPI tree's deal.II TimerOutput (src_mpi/claw.h:309; named
scopes "Setup"/"Assemble"/"Time step"/"Solve"/"RK update"/limiter at e.g.
src_mpi/claw.cc:324,513,637,730,784 with the summary table printed at exit,
src_mpi/claw.cc:966-967).  Additionally wraps jax.profiler so a scope can
emit device traces: on accelerators a scope must block on the arrays it
measures (pass a `block` array) or it only times dispatch.

Usage:
    timer = Timer()
    with timer("Assemble"):
        r = rhs(u, t)
        r.block_until_ready()
    ...
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timer:
    def __init__(self):
        self._acc = defaultdict(float)
        self._calls = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def __call__(self, name: str, block=None):
        with jax.named_scope(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                if block is not None:
                    jax.block_until_ready(block)
                self._acc[name] += time.perf_counter() - t0
                self._calls[name] += 1

    def summary(self) -> str:
        """Wall-time table like TimerOutput's rank-0 summary."""
        total = time.perf_counter() - self._t0
        lines = [f"{'Section':<24}{'calls':>8}{'wall (s)':>12}{'%':>7}"]
        lines.append("-" * 51)
        for name in sorted(self._acc, key=self._acc.get, reverse=True):
            w = self._acc[name]
            lines.append(f"{name:<24}{self._calls[name]:>8}{w:>12.3f}"
                         f"{100.0 * w / total:>6.1f}%")
        lines.append("-" * 51)
        lines.append(f"{'total wall':<24}{'':>8}{total:>12.3f}")
        return "\n".join(lines)

    def wall(self, name: str) -> float:
        return self._acc[name]


@contextlib.contextmanager
def scope(name: str):
    """Bare named scope (shows up in jax.profiler device traces)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace for TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
