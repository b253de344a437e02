"""Wan2.1 DiT architecture description.

Values come from the checkpoint's config.json at load time (reference
merges it into the run config; lightx2v/utils/set_config.py:37-41). The
presets below match the published Wan2.1 model family and are used when
no checkpoint config is available (tests, synthetic benchmarks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class WanArch:
    dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    in_dim: int = 16
    out_dim: int = 16
    freq_dim: int = 256
    text_len: int = 512
    text_dim: int = 4096
    clip_dim: int = 1280  # i2v CLIP feature dim
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6
    task: str = "t2v"  # "t2v" | "i2v"
    enable_dynamic_cfg: bool = False
    # q/k in half-split rope-pair layout (weights permuted at load) and
    # RoPE applied inside the flash kernel — see weights.permute_qk_half
    rope_fused: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


PRESETS = {
    "wan2.1_1.3b": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30),
    "wan2.1_14b": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40),
}


def arch_from_config(config) -> WanArch:
    """Build a WanArch from the merged run config (dict-like)."""
    kw = {}
    for f_ in WanArch.__dataclass_fields__:
        if f_ in ("task",):
            kw[f_] = config.get("task", "t2v")
        elif f_ == "patch_size":
            kw[f_] = tuple(config.get("patch_size", (1, 2, 2)))
        elif f_ in config:
            kw[f_] = config[f_]
    if config.get("task") == "i2v" and "in_dim" not in config:
        kw["in_dim"] = 36
    kw["enable_dynamic_cfg"] = bool(config.get("enable_dynamic_cfg", False))
    kw["rope_fused"] = bool(config.get("rope_fused", False))
    return WanArch(**kw)
