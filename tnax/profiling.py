"""Profiling and phase timing (SURVEY.md section 5.1).

The reference's only observability is wall-clock deltas logged per row
(reference `tnac4o/tnac4o.py:407-415`). tnax keeps those (the 'tnax' logger
reports per-row branch counts and timings) and adds accelerator-level
tracing via `jax.profiler` — traces open in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("tnax")


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
    logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def phase(name: str, sink: dict | None = None):
    """Wall-clock phase timer; logs and optionally records into ``sink``."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    logger.info("phase %s: %.3f s", name, dt)
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
