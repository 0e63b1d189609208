"""Phase tracing utilities.

The reference's observability is phase banners + wall-clock prints
(SURVEY.md §5.1).  Here each pipeline phase is both a structured log record
and a ``jax.profiler.TraceAnnotation`` so device timelines carry the same
phase names.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from aegis_tpu.utils.logging import get_logger

log = get_logger("prof")


@contextlib.contextmanager
def phase(name: str, quiet: bool = False) -> Iterator[None]:
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if not quiet:
        log.info(f"{name}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device profile (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
