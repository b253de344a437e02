"""Host-RAM weight streaming (the reference's offload tier, TPU-style).

The reference streams block weights disk -> pinned CPU -> GPU on three
CUDA streams (lightx2v/common/offload/manager.py:10-287) to fit 14B
models in 8 GB VRAM. On TPU the equivalent for models larger than one
chip's HBM: block weights stay in host RAM as numpy; the denoise step
runs a host loop over blocks calling ONE jitted block function while
``jax.device_put`` of block i+1 overlaps block i's compute (JAX dispatch
is async — the transfer and the running block pipeline naturally, the
role of the reference's prefetch/compute streams). HBM holds exactly two
blocks plus activations.

The whole-loop ``lax.scan`` path stays the default; streaming activates
with ``weight_streaming: true`` for over-HBM deployments.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from .config import WanArch
from .model import wan_block, wan_pre_process, wan_post_process

Params = Dict[str, Any]


def split_blocks_to_host(params: Params) -> Params:
    """Stacked (L, ...) block pytree -> list of per-block host (numpy)
    pytrees; the rest of the params stay on device."""
    import numpy as np

    blocks = params["blocks"]
    num_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    host_blocks: List[Params] = []
    for i in range(num_layers):
        host_blocks.append(jax.tree_util.tree_map(lambda a: np.asarray(a[i]), blocks))
    out = dict(params)
    out["blocks"] = host_blocks
    return out


def make_streamed_forward(arch: WanArch, mm_type: str = "Default",
                          self_attn_type: str = "flash_attn3",
                          cross_attn_type: str = "flash_attn3"):
    """Returns fn(params_with_host_blocks, latents, t, context, rope_cos,
    rope_sin, **kw) -> noise prediction, streaming block weights."""
    mm_fn = resolve_mm(mm_type)
    self_fn = partial(attention, self_attn_type)
    cross_fn = partial(attention, cross_attn_type)

    @jax.jit
    def pre(params_small, latents, t, context, y=None, clip_fea=None):
        x, embed, embed0, ctx_e, ctx_img, _grid, _s = wan_pre_process(
            params_small, latents, t, context, arch, y=y, clip_fea=clip_fea)
        return x, embed, embed0, ctx_e, ctx_img

    @partial(jax.jit, donate_argnums=(1,))
    def block_step(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin):
        return wan_block(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin,
                         arch, mm_fn, self_fn, cross_fn)

    @partial(jax.jit, static_argnums=(3, 4))
    def post(params_small, x, embed, grid, s_tokens):
        return wan_post_process(params_small, x, embed, grid, s_tokens, arch)

    def forward(params, latents, t, context, rope_cos, rope_sin,
                y=None, clip_fea=None):
        small = {k: v for k, v in params.items() if k != "blocks"}
        blocks = params["blocks"]  # list of host pytrees OR a BlockPrefetcher
        if hasattr(blocks, "get"):  # disk tier: prefetcher pops blocks
            n_blocks = blocks.store.num_blocks()
            blocks.schedule(range(n_blocks))
            fetch = blocks.get
        else:
            n_blocks = len(blocks)
            fetch = blocks.__getitem__
        pt, ph, pw = arch.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph, latents.shape[4] // pw)
        s_tokens = grid[0] * grid[1] * grid[2]
        x, embed, embed0, ctx_e, ctx_img = pre(small, latents, t, context, y=y, clip_fea=clip_fea)
        # double-buffered streaming: put(i+1) overlaps block i compute
        dev_block = jax.device_put(fetch(0))
        for i in range(n_blocks):
            nxt = jax.device_put(fetch(i + 1)) if i + 1 < n_blocks else None
            x = block_step(dev_block, x, embed0, ctx_e, ctx_img, rope_cos, rope_sin)
            dev_block = nxt
        return post(small, x, embed, grid, s_tokens)

    return forward
