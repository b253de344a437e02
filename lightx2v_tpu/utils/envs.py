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
