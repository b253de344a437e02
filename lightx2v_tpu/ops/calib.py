"""Activation calibration for PTQ (reference: lightx2v/common/ops/mm/
mm_weight_calib.py — the "Calib" mm op records activation statistics
while running full-precision, feeding the converter's advanced-PTQ
(smooth-quant affine) path).

The "Calib" mm runs the Default GEMM but accumulates per-channel
activation absmax into a host-side collector via io_callback (outside
jit-hot paths this is ordinary numpy)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import MM_REGISTER
from .linear import mm_default


class CalibCollector:
    """Global per-tensor activation stats (absmax over the channel axis)."""

    def __init__(self):
        self.stats: Dict[int, np.ndarray] = {}
        self._names: Dict[int, str] = {}

    def reset(self):
        self.stats.clear()
        self._names.clear()

    def update(self, key: int, absmax: np.ndarray):
        prev = self.stats.get(key)
        self.stats[key] = absmax if prev is None else np.maximum(prev, absmax)

    def named_stats(self) -> Dict[str, np.ndarray]:
        return {self._names.get(k, str(k)): v for k, v in self.stats.items()}


COLLECTOR = CalibCollector()


@MM_REGISTER.register("Calib")
def mm_calib(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    key = id(params.get("w"))

    def record(absmax):
        COLLECTOR.update(key, np.asarray(absmax))

    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1]), axis=0)
    jax.experimental.io_callback(record, None, absmax)
    return mm_default(params, x)
