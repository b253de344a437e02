"""Activation calibration -> smooth-quant (advanced_ptq) production.

The reference's flow: run inference with ``do_mm_calib`` (the "Calib" mm
op records per-channel activation absmax, mm_weight_calib.py), then a
quant tool folds the stats into per-block smooth factors consumed as
``blocks.{i}.affine_norm1/affine_norm3`` tensors
(weights/transformer_weights.py:193-209,352-362). Round 1 could consume
those checkpoints but never produce them; this module closes the loop:

* ``collect_block_stats``: run each DiT block EAGERLY (one host loop, not
  under jit — block identity and call order stay observable) with a
  counting mm wrapper that names every matmul input by the block's fixed
  call order, accumulating per-in-channel absmax;
* ``smooth_factors``: SmoothQuant s_c = act_max_c^alpha / w_max_c^(1-alpha)
  for the two smoothable sites (self-attn qkv input, FFN input);
* tools/convert.py --calib_stats applies them: activation side becomes
  affine_norm{1,3} = 1/s, weight columns multiply by s before per-channel
  quantization.

CLI (stats from a synthetic or real prompt):
    python -m lightx2v_tpu.tools.calibrate --model <ckpt_or_synthetic> \
        --output calib_stats.npz
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List

import numpy as np

from ..utils.logging_utils import logger

# wan_block_parts calls its mm_fn in this fixed order (models/wan/model.py)
_T2V_ORDER = [
    "self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
    "cross_attn.q", "cross_attn.k", "cross_attn.v", "cross_attn.o",
    "ffn.0", "ffn.2",
]
_I2V_ORDER = [
    "self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
    "cross_attn.q", "cross_attn.k", "cross_attn.v",
    "cross_attn.k_img", "cross_attn.v_img", "cross_attn.o",
    "ffn.0", "ffn.2",
]


class _NamingCalibMM:
    """mm_fn wrapper that attributes each call to a (block, linear) name
    via the block's fixed matmul order, recording input absmax."""

    def __init__(self, stats: Dict[str, np.ndarray], order: List[str]):
        self.stats = stats
        self.order = order
        self.block_idx = 0
        self.call_idx = 0

    def start_block(self, i: int):
        self.block_idx = i
        self.call_idx = 0

    def __call__(self, params, x):
        from ..ops.linear import mm_default

        name = f"blocks.{self.block_idx}.{self.order[self.call_idx]}"
        self.call_idx += 1
        absmax = np.max(np.abs(np.asarray(x, np.float32)).reshape(-1, x.shape[-1]), axis=0)
        prev = self.stats.get(name)
        self.stats[name] = absmax if prev is None else np.maximum(prev, absmax)
        return mm_default(params, x)


def collect_block_stats(params, arch, latents, t, context, rope_cos, rope_sin,
                        y=None, clip_fea=None, self_attn_type: str = "xla") -> Dict[str, np.ndarray]:
    """One eager forward through all blocks, returning
    {"blocks.{i}.{linear}": per-in-channel absmax} (numpy fp32)."""
    from functools import partial

    import jax

    from ..models.wan.model import wan_block, wan_pre_process
    from ..models.wan.streaming import split_blocks_to_host
    from ..ops.attention import attention

    stats: Dict[str, np.ndarray] = {}
    order = _I2V_ORDER if arch.task == "i2v" and "k_img" in params["blocks"]["cross_attn"] else _T2V_ORDER
    mm = _NamingCalibMM(stats, order)
    attn_fn = partial(attention, self_attn_type)

    host = split_blocks_to_host(params)
    small = {k: v for k, v in host.items() if k != "blocks"}
    x, _embed, embed0, ctx_e, ctx_img, _grid, _s = wan_pre_process(
        small, latents, t, context, arch, y=y, clip_fea=clip_fea)
    for i, blk in enumerate(host["blocks"]):
        mm.start_block(i)
        blk_dev = jax.tree_util.tree_map(
            lambda a: a if a is None else jax.numpy.asarray(a), blk,
            is_leaf=lambda a: a is None)
        x = wan_block(blk_dev, x, embed0, ctx_e, ctx_img, rope_cos, rope_sin,
                      arch, mm, attn_fn, attn_fn)
    logger.info(f"calibrated {len(stats)} matmul inputs over {len(host['blocks'])} blocks")
    return stats


def smooth_factors(w_cols_absmax: np.ndarray, act_absmax: np.ndarray,
                   alpha: float = 0.5) -> np.ndarray:
    """SmoothQuant per-in-channel factor s = act^a / w^(1-a), clipped."""
    s = np.power(np.maximum(act_absmax, 1e-5), alpha) / np.power(
        np.maximum(w_cols_absmax, 1e-5), 1.0 - alpha)
    return np.clip(s, 1e-2, 1e2).astype(np.float32)


def save_stats(stats: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **stats)


def load_stats(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def main():
    p = argparse.ArgumentParser(description="collect PTQ activation stats")
    p.add_argument("--model_path", default=None, help="checkpoint dir (omit for synthetic)")
    p.add_argument("--output", required=True, help="output .npz stats file")
    p.add_argument("--task", default="t2v")
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from ..models.wan.config import WanArch, arch_from_config
    from ..models.wan.pipeline import rope_for_shape
    from ..models.wan.weights import init_random_weight_dict, load_wan_params
    from ..utils.safetensors_io import load_sharded

    if args.model_path:
        wd = load_sharded(args.model_path)
        n_layers = 1 + max(int(k.split(".")[1]) for k in wd if k.startswith("blocks."))
        dim = wd["patch_embedding.bias"].shape[0]
        arch = arch_from_config({"dim": dim, "num_layers": n_layers,
                                 "ffn_dim": wd["blocks.0.ffn.0.bias"].shape[0],
                                 "num_heads": max(2, dim // 128), "task": args.task})
        params = load_wan_params(wd, arch)
    else:
        arch = WanArch(dim=64, ffn_dim=128, num_heads=2, num_layers=2, text_dim=32)
        params = load_wan_params(init_random_weight_dict(arch, seed=1), arch)

    rng = np.random.default_rng(args.seed)
    target = (arch.in_dim if args.task != "i2v" else 16, args.frames, args.height // 8, args.width // 8)
    lat = jnp.asarray(rng.standard_normal((1, *target)), jnp.float32)
    t = jnp.asarray([800.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, arch.text_len, arch.text_dim)) * 0.3, jnp.float32)
    cos, sin, _ = rope_for_shape(arch, target)
    stats = collect_block_stats(params, arch, lat, t, ctx, cos, sin)
    save_stats(stats, args.output)
    logger.info(f"wrote {args.output}")


if __name__ == "__main__":
    main()
