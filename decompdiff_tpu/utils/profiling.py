"""Profiling / tracing hooks (first-class, unlike the reference's
commented-out wall-clock probes; SURVEY.md §5).

  * `trace(logdir)`: context manager around jax.profiler for device traces
    viewable in TensorBoard/Perfetto.
  * `Timer`: lightweight named wall-clock accumulator for host phases.
  * `annotate(name)`: TraceAnnotation for labeling regions inside traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a device trace when logdir is set, else no-op."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Named wall-clock phase accumulator."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {'total_s': round(v, 4), 'count': self.counts[k],
                    'mean_ms': round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}
