"""Tracing / profiling helpers (SURVEY.md section 5 plan).

The reference has no profiling hooks; here the whole step is one XLA
computation, so the useful instruments are (1) named trace annotations that
show up in Perfetto/XProf dumps, (2) a ``block_until_ready``-based throughput
meter, and (3) a one-call profiler-trace context manager.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (no-op cost when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str, *, host_tracer_level: int = 2
                  ) -> Iterator[None]:
    """Capture a device+host trace viewable in Perfetto / TensorBoard."""
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/s meter: ``tick`` after each (blocking) unit of work.

    >>> meter = Throughput(unit_steps=B * T)
    >>> for _ in range(n):
    ...     out = rollout(...)
    ...     jax.block_until_ready(out)
    ...     meter.tick()
    >>> meter.steps_per_s
    """

    def __init__(self, unit_steps: int):
        self.unit_steps = unit_steps
        self.reset()

    def reset(self) -> None:
        self._start: Optional[float] = None
        self._ticks = 0

    def tick(self) -> None:
        if self._start is None:
            # First tick starts the clock (excludes compile time).
            self._start = time.perf_counter()
        else:
            self._ticks += 1

    @property
    def steps_per_s(self) -> float:
        if self._start is None or self._ticks == 0:
            return 0.0
        return self.unit_steps * self._ticks / (time.perf_counter() - self._start)
