"""Profiling helpers (reference analogs: ``StopWatch`` timers plus the
``MFEM_PERF_*`` annotation macros in ``general/annotation.hpp`` — here the
device-side story is ``jax.profiler`` with named scopes that show up in the
TensorBoard/Perfetto trace viewer).

Usage::

    from cardiac_ablation_ecm2_tpu.utils.profiling import trace, scope

    with trace("/tmp/tb"):          # captures a device trace
        with scope("bioheat-step"):
            u = step(u)
    # or annotate inside jitted code:
    @jax.jit
    def f(x):
        with scope("diffusion-apply"):
            return apply(db, qd, x)
"""

from __future__ import annotations

import contextlib

import jax


def scope(name: str):
    """Named scope: labels ops in profiler traces (works under jit)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace to ``logdir`` (TensorBoard 'profile' plugin /
    Perfetto).  No-op-safe: falls back to a bare context if the profiler is
    unavailable on the backend."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:   # pragma: no cover - backend without profiler
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Host-side trace annotation (StepTraceAnnotation analog)."""
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:   # pragma: no cover
        yield
