"""Peak device memory decorator (reference: lightx2v/utils/memory_profiler.py:5-29)."""

from __future__ import annotations

from functools import wraps

import jax

from .logging_utils import logger


def peak_memory_decorator(func):
    @wraps(func)
    def wrapper(*args, **kwargs):
        out = func(*args, **kwargs)
        try:
            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 2**30
            logger.info(f"[Memory] {func.__qualname__} peak device memory: {peak:.2f} GiB")
        except Exception:
            pass
        return out

    return wrapper
