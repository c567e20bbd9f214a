"""Profiling utilities (SURVEY.md §5: instrumented timers + optional traces).

The reference's "profiling" is wall-clock instrumentation with device fences;
ours adds optional ``jax.profiler`` trace capture (viewable in TensorBoard /
Perfetto) around any callable, plus a simple fence-timed context manager.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Callable, Dict, Optional

logger = logging.getLogger(__name__)

__all__ = ["device_timer", "capture_trace", "timed"]


@contextlib.contextmanager
def device_timer(name: str = "block", results: Optional[Dict[str, float]] = None):
    """perf_counter around a block with a block_until_ready-style exit fence.

    The caller is responsible for making device work observable inside the
    block (returning arrays and calling ``block_until_ready``) — this mirrors
    the reference's cuda.synchronize + perf_counter pattern
    (evaluation/efficiency/latency.py:99-117).
    """
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    logger.debug("%s: %.3f ms", name, dt * 1000)


def timed(fn: Callable[..., Any], *args, fence: bool = True, **kw):
    """Run fn, fence on its outputs, return (result, seconds)."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kw)
    if fence:
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
    return out, time.perf_counter() - t0


def capture_trace(fn: Callable[[], Any], trace_dir: str = "/tmp/crs_tpu_trace"):
    """Run fn under a jax.profiler trace; returns (result, trace_dir)."""
    import jax

    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
    logger.info("profiler trace written to %s", trace_dir)
    return out, trace_dir
