"""Persistent XLA compile-cache setup shared by the CLI entry points.

Every distinct jitted program otherwise costs a fresh multi-minute XLA
compile per process (the reference has no compile step at all; this is the
one recurring cost of the compiled-step design). With the cache, repeat runs
of the trainer and the tools reload compiled executables from disk.
"""
from __future__ import annotations

import os
from typing import Optional

DEFAULT_CACHE_DIR = "~/.cache/splice_tpu/xla"


def enable_compile_cache(path: Optional[str] = DEFAULT_CACHE_DIR) -> None:
    """Idempotent; respects an explicit process-level cache setting (tests
    and bench configure their own dir before any entry point runs). Pass
    a falsy path to disable."""
    if not path:
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
