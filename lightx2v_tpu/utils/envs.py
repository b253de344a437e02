"""Environment flags (reference: lightx2v/utils/envs.py:5-26).

``DTYPE``: "BF16" (default, all-bf16) or anything else for mixed precision
where precision-sensitive layers (norms, embeddings, modulation, time MLP)
run in fp32. ``ENABLE_PROFILING_DEBUG`` gates per-step profiling contexts.
``ENABLE_GRAPH_MODE`` maps to whole-loop jit (always on for TPU; kept for
CLI parity). ``RUNNING_FLAG`` selects infer vs quant-export mode.
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=None)
def GET_DTYPE() -> str:
    return os.environ.get("DTYPE", "BF16")


@lru_cache(maxsize=None)
def CHECK_ENABLE_PROFILING_DEBUG() -> bool:
    return os.environ.get("ENABLE_PROFILING_DEBUG", "false").lower() == "true"


@lru_cache(maxsize=None)
def CHECK_ENABLE_GRAPH_MODE() -> bool:
    return os.environ.get("ENABLE_GRAPH_MODE", "true").lower() == "true"


@lru_cache(maxsize=None)
def GET_RUNNING_FLAG() -> str:
    return os.environ.get("RUNNING_FLAG", "infer")


def setup_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (the TPU analog of the
    reference's cached cuda-graph / TRT-engine warmup artifacts): compiled
    XLA executables are written to disk, so a process restart skips the
    20-400 s first-compile instead of re-lowering every jitted program.

    Priority: explicit arg > ``LIGHTX2V_COMPILE_CACHE`` env. Returns the
    directory in effect (None = disabled). Safe to call more than once."""
    cache_dir = cache_dir or os.environ.get("LIGHTX2V_COMPILE_CACHE")
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took meaningful compile time; tiny programs
    # stay uncached to keep the directory lean
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
