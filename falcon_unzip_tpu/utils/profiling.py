"""Tracing/profiling hooks (jax.profiler + stage wall-clock).

Role parity: the reference has no built-in tracing — timing = grep the
pypeFLOW logs (SURVEY.md §5).  The rebuild provides: device traces via
jax.profiler (Perfetto-compatible dumps per host) and lightweight scoped
wall-clock timers that feed utils.metrics.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", out_dir)


class StageTimer:
    """Accumulates named wall-clock spans; .summary() -> {name: seconds}."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> dict[str, float]:
        return {k: round(v, 4) for k, v in sorted(self.spans.items())}
