"""Profiling / tracing hooks (no reference equivalent — the reference pins
``torch-tb-profiler`` but never imports it, SURVEY.md §5; here profiling is
first-class).

``jax.profiler`` traces are viewable in TensorBoard or Perfetto. Usage:

    python train/train_artiboost.py ... --profile_dir exp/trace --profile_steps 20

or programmatically::

    with trace("artiboost/prepare"):
        loader.prepare()
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax

_active_trace_dir: Optional[str] = None


def trace(name: str):
    """Annotate a host-side region; shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def step_trace(name: str, step: int):
    """Annotate one train/eval step (enables per-step timing in TB)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def start_trace(log_dir: str) -> None:
    global _active_trace_dir
    if _active_trace_dir is None:
        jax.profiler.start_trace(log_dir)
        _active_trace_dir = log_dir


def stop_trace() -> None:
    global _active_trace_dir
    if _active_trace_dir is not None:
        jax.profiler.stop_trace()
        _active_trace_dir = None


@contextlib.contextmanager
def trace_window(log_dir: Optional[str]):
    """Trace everything inside the block when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()
