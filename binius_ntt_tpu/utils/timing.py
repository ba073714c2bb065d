"""Phase timers — the analogue of the reference's embedded benchmark clocks.

The reference segments sumcheck time into memcpy / transpose / raw-compute
phases with chrono timestamps behind a `benchmarking` constructor flag
(src/ulvt/sumcheck/sumcheck.cuh:76-124, consumed by
sumcheck/bench/benchmark.cu:37-45).  Here: a context-manager timer that
blocks on device results, so each phase measures real device time, plus an
optional hook into the JAX profiler for trace capture.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["PhaseTimer", "trace_to"]


class PhaseTimer:
    """Accumulates named phase durations; device-synchronising."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        import jax

        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v * 1e3:.3f} ms" for k, v in self.phases.items()]
        lines.append(f"total: {total * 1e3:.3f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a JAX profiler trace (viewable in XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
