"""Profiling / tracing helpers (the SURVEY §5 tracing subsystem).

The reference hand-rolls segment timing with cuda.synchronize
(scripts/time/vitdet_vid.py:36-44); here the equivalents are:

  * :func:`trace` — capture a jax.profiler trace viewable in
    TensorBoard / Perfetto,
  * the scalar-probe wall-clock protocol in utils/timing.py (required on
    remote-execution platforms where block_until_ready is unreliable),
  * FLOP accounting via core.counting (reported by every eval run).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir="profiles"):
    """Capture a device trace: ``with trace("profiles"): step(...)``.
    View with TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for traces: ``with annotate("backbone"): ...``"""
    return jax.profiler.TraceAnnotation(name)
