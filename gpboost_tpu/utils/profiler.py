"""Profiling glue: jax.profiler tracing + named annotations.

SURVEY §5-1 tracing/observability — the reference exposes wall-clock timers
(``FunctionTimer``/``global_timer``); on TPU the richer tool is the XLA
profiler (TensorBoard trace viewer). Usage::

    with gpboost_tpu.utils.profiler.trace("/tmp/tb"):
        model.fit(y=y)

    with gpboost_tpu.utils.profiler.annotate("factor-build"):
        ...

Wall-clock timers live in :mod:`gpboost_tpu.utils.timer`.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: str) -> None:
    """Write a pprof-format device memory profile."""
    import jax
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
