"""Profiling / tracing — first-class, unlike the reference (mmcv
ProfilerHook and mmdet NVTX ranges exist but are never wired into the
GPT4RoI train path; SURVEY.md §5).

``trace(logdir)`` captures a jax.profiler trace viewable in
TensorBoard/Perfetto/XProf; ``annotate(name)`` adds named ranges that show
up in the trace; ``start_server(port)`` enables live capture from a running
trainer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range for traces AND jitted HLO metadata."""
    return jax.named_scope(name)


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def step_timer(name: str, sink=print) -> Iterator[None]:
    """Host-side wall-clock timer for coarse loop instrumentation."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"[{name}] {1e3 * (time.perf_counter() - t0):.1f} ms")
