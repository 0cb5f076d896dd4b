"""Profiling/tracing (SURVEY.md §5: the reference has none — tqdm only;
this is the TPU-native replacement: jax.profiler device traces + named step
annotations, viewable in TensorBoard/Perfetto/XProf)."""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


def device_trace_options():
    """Device-op-only capture: the host python tracer emits ~50k events/s
    and floods the 1M-event trace buffer on a multi-second window, dropping
    the XLA-op events the capture exists for."""
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 0
    return opts


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str],
                device_only: bool = True) -> Iterator[None]:
    """Capture a device trace into profile_dir if set, else no-op."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(
        profile_dir,
        profiler_options=device_trace_options() if device_only else None)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


