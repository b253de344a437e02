"""Profiling context (reference: lightx2v/utils/profiler.py:9-95).

The reference wraps phases in ``torch.cuda.synchronize`` + wall-clock +
peak-VRAM logging. The TPU equivalent blocks on outstanding device work
via ``jax.block_until_ready`` hooks at phase boundaries (device work is
async-dispatched) and reads device memory stats where the backend exposes
them.
"""

from __future__ import annotations

import time
from functools import wraps
from typing import Optional

import jax

from .envs import CHECK_ENABLE_PROFILING_DEBUG
from .logging_utils import logger


def _device_mem_stats() -> Optional[dict]:
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return stats
    except Exception:
        return None


# last-completed duration per phase name (process-wide): the serving
# layer reports these via GET /v1/service/metrics as the most recent
# pipeline's stage breakdown
LAST_STAGES: dict = {}


class ProfilingContext:
    """Context manager + decorator: logs wall time and device peak memory."""

    def __init__(self, name: str, sync: bool = True):
        self.name = name
        self.sync = sync
        self.duration = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.duration = time.perf_counter() - self.start
        LAST_STAGES[self.name] = round(self.duration, 6)
        mem = _device_mem_stats()
        peak = f", peak_mem={mem.get('peak_bytes_in_use', 0) / 2**30:.2f}GiB" if mem else ""
        logger.info(f"[Profile] {self.name} cost {self.duration:.6f}s{peak}")
        return False

    def __call__(self, func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            with ProfilingContext(self.name, sync=self.sync):
                out = func(*args, **kwargs)
                if self.sync:
                    out = jax.block_until_ready(out) if _is_blockable(out) else out
                return out

        return wrapper


class ProfilingContext4Debug(ProfilingContext):
    """Per-step profiling, active only with ENABLE_PROFILING_DEBUG=true."""

    def __enter__(self):
        if not CHECK_ENABLE_PROFILING_DEBUG():
            return self
        return super().__enter__()

    def __exit__(self, exc_type, exc, tb):
        if not CHECK_ENABLE_PROFILING_DEBUG():
            return False
        return super().__exit__(exc_type, exc, tb)


def _is_blockable(x) -> bool:
    try:
        jax.tree_util.tree_leaves(x)
        return True
    except Exception:
        return False
