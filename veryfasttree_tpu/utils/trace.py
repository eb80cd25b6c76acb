"""jax-profiler trace hooks (SURVEY.md section 5.1, "TPU equivalent: jax
profiler traces").

Set ``VFT_TRACE=/path/to/dir`` to capture a device trace of the pipeline
(viewable with TensorBoard's profile plugin or Perfetto).  Phases annotate
themselves with ``TraceAnnotation`` so kernel time groups by pipeline stage.

Known limitation: on the remote axon TPU tunnel used by this rig,
``jax.profiler.trace`` hangs at trace-stop (the profiler's gRPC collection
is not proxied); traces work on local TPU/CPU backends.  The env gate keeps
the default path zero-overhead.
"""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace():
    """Wrap the whole run in jax.profiler.trace when VFT_TRACE is set."""
    trace_dir = os.environ.get("VFT_TRACE")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Name a pipeline phase in the device trace (no-op without VFT_TRACE)."""
    if not os.environ.get("VFT_TRACE"):
        yield
        return
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
