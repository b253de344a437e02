"""Jitted denoise loop: ``lax.scan`` over diffusion steps.

This replaces the reference's host-side Python loop
(lightx2v/models/runners/default_runner.py:97-114: step_pre -> model.infer
-> step_post per step) with ONE compiled program: scheduler state is the
scan carry, the DiT forward + scheduler update is the body. For the
4-step distilled model the whole denoise is a single device launch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.rope import build_wan_rope_grid
from .config import WanArch
from .model import wan_forward, wan_forward_cfg
from .sharded import wan_forward_sharded


def rope_for_shape(arch: WanArch, target_shape, sp_pad: int = 1):
    """Host-precomputed RoPE grids for a latent shape (C, F, H, W).
    Pads the token count to a multiple of ``sp_pad`` (sequence parallel)."""
    _, f, h, w = target_shape
    pt, ph, pw = arch.patch_size
    gf, gh, gw = f // pt, h // ph, w // pw
    cos, sin = build_wan_rope_grid(arch.head_dim, gf, gh, gw)
    s = cos.shape[0]
    pad = (-s) % sp_pad
    if pad:
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), cos.dtype)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), sin.dtype)])
    return jnp.asarray(cos), jnp.asarray(sin), s + pad


def make_denoise_fn(
    arch: WanArch,
    scheduler,
    target_shape,
    enable_cfg: bool = True,
    guide_scale: float = 5.0,
    mm_type: str = "Default",
    self_attn_type: str = "flash_attn3",
    cross_attn_type: str = "flash_attn3",
    mesh=None,
    sp_size: int = 1,
    cfg_scale_embed: Optional[float] = None,
):
    """Build a jitted fn(params, state, context, context_null, y, clip_fea)
    -> final scheduler state, running all ``scheduler.num_steps()`` steps
    on device."""
    rope_cos, rope_sin, seq_len = rope_for_shape(arch, target_shape, sp_pad=sp_size)

    fwd_kw = dict(
        mm_type=mm_type,
        self_attn_type=self_attn_type,
        cross_attn_type=cross_attn_type,
        seq_len=seq_len,
    )

    def one_step(params, state, context, context_null, y, clip_fea):
        lat_b, t = scheduler.step_pre(state)  # (C,F,H,W) bf16, scalar t
        lat = lat_b[None]
        tb = t[None].astype(jnp.float32)
        cfg_vec = None
        if cfg_scale_embed is not None:
            cfg_vec = jnp.full((1,), cfg_scale_embed, jnp.float32)
        if mesh is not None:
            fwd = partial(wan_forward_sharded, mesh=mesh)
        else:
            fwd = wan_forward
        if enable_cfg:
            if mesh is not None:
                # batched CFG: B=2 through the dp axis
                lat2 = jnp.concatenate([lat, lat], axis=0)
                t2 = jnp.concatenate([tb, tb], axis=0)
                ctx2 = jnp.concatenate([context, context_null], axis=0)
                y2 = None if y is None else jnp.concatenate([y, y], axis=0)
                c2 = None if clip_fea is None else jnp.concatenate([clip_fea, clip_fea], axis=0)
                out = fwd(params, lat2, t2, ctx2, rope_cos, rope_sin, arch,
                          y=y2, clip_fea=c2, cfg_scale=cfg_vec, **fwd_kw)
                noise_pred = out[1] + guide_scale * (out[0] - out[1])
            else:
                noise_pred = wan_forward_cfg(
                    params, lat, tb, context, context_null, guide_scale,
                    rope_cos, rope_sin, arch, y=y, clip_fea=clip_fea,
                    cfg_scale=cfg_vec, **fwd_kw,
                )[0]
        else:
            noise_pred = fwd(params, lat, tb, context, rope_cos, rope_sin, arch,
                             y=y, clip_fea=clip_fea, cfg_scale=cfg_vec, **fwd_kw)[0]
        return scheduler.step_post(state, noise_pred)

    n_steps = scheduler.num_steps()

    @jax.jit
    def denoise(params, state, context, context_null, y=None, clip_fea=None):
        def body(st, _):
            return one_step(params, st, context, context_null, y, clip_fea), None

        state_f, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state_f

    denoise.one_step = one_step  # exposed for step-wise drivers (caching)
    return denoise
