"""Registries mapping config strings to implementations.

The reference keys weight-op classes by strings like ``"Default"`` or
``"W-int8-channel-sym-A-int8-channel-sym-dynamic-Vllm"`` in global
registries (reference: lightx2v/utils/registry_factory.py:47-56). In the
TPU build ops are pure functions resolved once at model-build (trace)
time, so a registry is a plain name->callable table.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Union


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._table: Dict[str, Any] = {}

    def register(self, key: Union[str, Iterable[str]], obj: Optional[Any] = None):
        """Use as decorator ``@REG.register("name")`` or call ``REG.register("name", fn)``."""
        keys = [key] if isinstance(key, str) else list(key)

        def _do(o):
            for k in keys:
                if k in self._table:
                    raise KeyError(f"{self.name}: duplicate key {k!r}")
                self._table[k] = o
            return o

        if obj is not None:
            return _do(obj)
        return _do

    def __getitem__(self, key: str) -> Any:
        if key not in self._table:
            raise KeyError(f"{self.name}: unknown key {key!r}; available: {sorted(self._table)}")
        return self._table[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self._table.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self._table

    def keys(self):
        return self._table.keys()


# Function tables mirroring the reference registries
MM_REGISTER = Registry("mm")            # matmul variants (bf16 / fp32 / int8 / fp8)
ATTN_REGISTER = Registry("attention")   # attention kernels
NORM_REGISTER = Registry("norm")        # rms/layer norm variants
RUNNER_REGISTER = Registry("runner")    # model_cls -> runner class
SCHEDULER_REGISTER = Registry("scheduler")
CONV3D_REGISTER = Registry("conv3d")
