"""Profiling and tracing (SURVEY.md \u00a75 observability).

The reference's affordances are START_TIMER rdtsc macros, ``-benchmark``
wall-time, and TRACE-gated bit logging (libavutil/timer.h,
get_bits.h:620-663).  TPU equivalents here:

* ``device_trace(logdir)`` — jax.profiler trace (viewable in xprof /
  TensorBoard) around any decode region.
* ``stage_annotations()`` — the fused frame graph wraps each pipeline
  stage in ``jax.named_scope`` so profiler timelines show core / qmf /
  sbr / ps / synthesis spans.
* bit-level tracing — ``bitstream.reader.TracingBitReader`` (see the CLI
  ``--bit-trace`` flag).
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace of everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=None):
    """START_TIMER/STOP_TIMER analogue (libavutil/timer.h:46)."""
    import time

    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        (sink or (lambda m: print(m)))(f"{label}: {dt * 1e3:.3f} ms")
