"""Persistent XLA compilation cache.

The reference's torch_xla stack re-traces and re-compiles its lazy-tensor
graphs on every process start (SURVEY §1 L0); the JAX rebuild compiles once
per jit signature, and this module makes those executables survive process
restarts: resumed/preempted runs (train/checkpoint.py's preemption path) skip
the 20-40 s first-compile of the train and eval steps entirely.

Local directories and gs:// paths both work (the cache writes through
jax's pluggable filesystem layer).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str]) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    No-op (returns False) when ``cache_dir`` is falsy. Thresholds are set so
    every entry is cached — the train step is always worth keeping, and tiny
    helper jits are cheap to store.
    """
    if not cache_dir:
        return False
    import jax

    if not cache_dir.startswith("gs://"):
        cache_dir = os.path.expanduser(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return True
