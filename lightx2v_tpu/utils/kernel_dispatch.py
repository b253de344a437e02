"""Loud, observable kernel fallbacks.

Every TPU dispatch site (flash/sage/sparge attention, int4 matmul, ring
partials) prefers a Pallas kernel and falls back to an XLA implementation
if the kernel fails to build. Round-1 review flagged that those fallbacks
were silent ``except: pass`` — a Pallas regression on real TPU would
quietly become the slow path and benchmarks would still "work".

Policy now:
* every fallback logs a WARNING once per (kernel, error class) with the
  underlying error;
* ``LIGHTX2V_STRICT_KERNELS=1`` turns fallbacks into hard errors, so TPU
  jobs (bench.py, scripts/check_tpu_kernels.py) can assert the fast path
  was actually taken.
"""

from __future__ import annotations

import os
from typing import Set, Tuple

from .logging_utils import logger

_warned: Set[Tuple[str, str]] = set()


def strict_kernels() -> bool:
    return os.environ.get("LIGHTX2V_STRICT_KERNELS", "0").lower() in ("1", "true")


def kernel_fallback(name: str, err: Exception) -> None:
    """Record that kernel ``name`` failed and the caller is falling back.
    Raises under LIGHTX2V_STRICT_KERNELS=1; otherwise warns once."""
    if strict_kernels():
        raise RuntimeError(
            f"Pallas kernel '{name}' failed and LIGHTX2V_STRICT_KERNELS=1 "
            f"forbids the XLA fallback"
        ) from err
    key = (name, type(err).__name__)
    if key not in _warned:
        _warned.add(key)
        logger.warning(
            f"Pallas kernel '{name}' unavailable — falling back to XLA path "
            f"({type(err).__name__}: {err})"
        )
