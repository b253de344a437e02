"""Jitted denoise loop: ``lax.scan`` over diffusion steps.

This replaces the reference's host-side Python loop
(lightx2v/models/runners/default_runner.py:97-114: step_pre -> model.infer
-> step_post per step) with ONE compiled program: scheduler state is the
scan carry, the DiT forward + scheduler update is the body. For the
4-step distilled model the whole denoise is a single device launch.

Feature caching (TeaCache) runs as traced ``lax.cond`` state inside the
scan — the decision scalar never leaves the device (the reference decides
host-side per step, feature_caching/transformer_infer.py:31-81).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...caching.adacache import ada_skip_length, init_ada_state
from ...caching.taylorseer import (init_taylor_cache, init_taylor_ws_cache,
                                   taylor_calc_step, taylor_schedule,
                                   taylor_skip_step, taylor_ws_calc,
                                   taylor_ws_skip)
from ...caching.teacache import (TeaCacheConfig, init_tea_state, tea_decide,
                                 tea_decide_per_side, tea_transform,
                                 tea_transform_per_side)
from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...ops.rope import build_wan_rope_grid
from .config import WanArch
from .model import wan_block_parts, wan_pre_process, wan_post_process, wan_transformer
from .sharded import make_sharded_transformer

from jax.sharding import NamedSharding, PartitionSpec as P


def rope_for_shape(arch: WanArch, target_shape, sp_pad: int = 1, to_jax: bool = True):
    """Host-precomputed RoPE grids for a latent shape (C, F, H, W).
    Pads the token count to a multiple of ``sp_pad`` (sequence parallel).

    ``to_jax=False`` keeps numpy: closures that are traced into jitted
    fns must hold HOST arrays — a closed-over device array is hoisted as
    a program constant via a device->host fetch at trace time, which is
    both slow through a tunneled chip and what RESOURCE_EXHAUSTED'd the
    host-stepped bench (numpy embeds directly)."""
    _, f, h, w = target_shape
    pt, ph, pw = arch.patch_size
    gf, gh, gw = f // pt, h // ph, w // pw
    cos, sin = build_wan_rope_grid(arch.head_dim, gf, gh, gw)
    s = cos.shape[0]
    pad = (-s) % sp_pad
    if pad:
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), cos.dtype)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), sin.dtype)])
    if not to_jax:
        return cos, sin, s + pad
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
    feature_caching: str = "NoCaching",
    caching_config=None,
    num_steps: Optional[int] = None,
    self_attn_kwargs: Optional[dict] = None,
    parallel_attn_type: str = "ulysses",
):
    """Build a jitted fn(params, state, context, context_null, y, clip_fea)
    -> final scheduler state, running all ``scheduler.num_steps()`` steps
    on device."""
    # host numpy on purpose: these are CLOSURES of the jitted step/denoise
    # fns (see rope_for_shape's to_jax note)
    rope_cos, rope_sin, seq_len = rope_for_shape(arch, target_shape, sp_pad=sp_size,
                                                 to_jax=False)
    batch = 2 if enable_cfg else 1

    tea_cfg: Optional[TeaCacheConfig] = None
    if feature_caching in ("Tea", "Custom"):
        tea_cfg = TeaCacheConfig.from_config(caching_config) if caching_config is not None else TeaCacheConfig()
    use_taylor = feature_caching == "TaylorSeer"
    # whole-stack Taylor: one (B, S, D) f0/f1 pair — the capacity-fit
    # variant (per-module caches are 6*L*S*D ≈ 20.8 GB fp8 at 14B 720P);
    # same semantics as the weight-streaming path's taylor dict
    use_taylor_ws = feature_caching == "TaylorWS"
    use_ada = feature_caching == "Ada"
    ada_cfg_scale = float(caching_config.get("ada_metric_scale", 1.0)) \
        if caching_config is not None else 1.0
    # TaylorSeer/Custom cache dtype: "fp8" quarters the 6*L*S*D cache
    # footprint vs fp32 (and halves bf16), letting the FULL-token 480P
    # cache fit one 16 GB v5e (the reference holds bf16 caches on an
    # 80 GB H200, cache_source.md:49-71); e4m3 range covers module
    # outputs, derivative entries lose <0.5% relative
    _tdt = (caching_config.get("taylor_cache_dtype", "bf16")
            if caching_config is not None else "bf16")
    taylor_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn,
                    "fp32": jnp.float32}[str(_tdt)]
    # Tea residual cache dtype: fp8 halves the (B, S, D) whole-stack
    # residual (clipped to e4m3 range on store) — the lever that fits the
    # 14B 720P Tea cache beside int4 weights on one 16 GB v5e
    _teadt = (caching_config.get("tea_cache_dtype", "bf16")
              if caching_config is not None else "bf16")
    tea_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn,
                 "fp32": jnp.float32}[str(_teadt)]
    # Custom = TeaCache's rel-L1 decision + TaylorSeer's per-module
    # extrapolation on skipped steps (reference
    # WanTransformerInferCustomCaching, feature_caching/transformer_infer.py:522-620)
    use_custom = feature_caching == "Custom"
    # TaylorSeer/Ada/Custom keep per-module caches threaded through their
    # own block loops, so they can't ride the shard_map transformer; under
    # a mesh they run GSPMD-sharded instead (activations constrained to
    # (dp, sp), XLA inserts the attention collectives). Ulysses/ring stay
    # the explicit paths for NoCaching/Tea.
    gspmd_cached = (use_taylor or use_ada or use_custom) and mesh is not None
    n_steps_static = scheduler.num_steps()
    if use_taylor or use_taylor_ws:
        taylor_is_calc, taylor_step_diff = taylor_schedule(n_steps_static)

    sharded_tf = None
    if mesh is not None:
        # unpadded token count: when sp padding exists, the pad tokens'
        # K rows are nonzero (modulation shifts) and must be masked out of
        # every distributed attention path, as the single-device forward
        # does via kv_len (model.py wan_forward)
        _, f_, h_, w_ = target_shape
        pt_, ph_, pw_ = arch.patch_size
        s_tokens = (f_ // pt_) * (h_ // ph_) * (w_ // pw_)
        kv_tokens = s_tokens if seq_len > s_tokens else None
        sharded_tf = make_sharded_transformer(mesh, arch, mm_type, self_attn_type,
                                              cross_attn_type, parallel_attn_type or "ulysses",
                                              kv_tokens=kv_tokens)

    def transformer(params, x, embed0, ctx, ctx_img):
        if sharded_tf is not None:
            if ctx_img is None:
                ctx_img = jnp.zeros((x.shape[0], 1, x.shape[-1]), x.dtype)
            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("dp", "sp", None)))
            return sharded_tf(params["blocks"], x, embed0, ctx, ctx_img, rope_cos, rope_sin)
        return wan_transformer(
            params["blocks"], x, embed0, ctx, ctx_img, rope_cos, rope_sin,
            arch, mm_type, self_attn_type, cross_attn_type, self_attn_kwargs,
        )

    def one_step(params, state, cache, context, context_null, y, clip_fea,
                 _branch=None):
        # _branch: None = traced lax.cond on the caching decision (the
        # scan-compatible default). True/False = the calc/skip branch is
        # selected at TRACE time, producing two separate, roughly
        # half-sized programs for host-stepped drivers. Taylor's schedule
        # is static, and Tea/Custom's decision depends only on the
        # timestep-embedding series (host-precomputable exactly —
        # caching/teacache.tea_decision_series), so a host driver can pick
        # the branch per step. Motivation: the tunnel's remote compile
        # helper dies on the full-token dual-branch Taylor program
        # (BENCHLOG_r04 caching rows); splitting compiles where cond can't.
        lat_b, t = scheduler.step_pre(state)  # (C,F,H,W) bf16, scalar t
        lat = lat_b[None]
        tb = t[None].astype(jnp.float32)
        cfg_vec = None
        if cfg_scale_embed is not None:
            cfg_vec = jnp.full((batch,), cfg_scale_embed, jnp.float32)
        if enable_cfg:
            lat = jnp.concatenate([lat, lat], axis=0)
            tb = jnp.concatenate([tb, tb], axis=0)
            ctx2 = jnp.concatenate([context, context_null], axis=0)
            y2 = None if y is None else jnp.concatenate([y, y], axis=0)
            c2 = None if clip_fea is None else jnp.concatenate([clip_fea, clip_fea], axis=0)
        else:
            ctx2, y2, c2 = context, y, clip_fea

        x, embed, embed0, ctx_e, ctx_img, grid, s_tokens = wan_pre_process(
            params, lat, tb, ctx2, arch, y=y2, clip_fea=c2, cfg_scale=cfg_vec, seq_len=seq_len,
        )
        if gspmd_cached:
            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("dp", "sp", None)))

        i = state["step_index"]
        if use_custom:
            tea_c = cache["tea"]
            should, tea_c = tea_decide(tea_c, embed, embed0, i, tea_cfg)
            self_fn = partial(attention, self_attn_type)
            cross_fn = partial(attention, cross_attn_type)
            # distance to the previous calc step; >= 1 to keep the
            # derivative update finite on the first step
            step_diff = jnp.maximum(i - cache["last_calc"], 1).astype(jnp.float32)

            def calc(op):
                xx, c = op
                x_out, tc = taylor_calc_step(params, xx, embed0, ctx_e, ctx_img, rope_cos,
                                             rope_sin, arch, c["taylor"], step_diff,
                                             mm_type, self_fn, cross_fn, primed=i > 0)
                return x_out, {**c, "taylor": tc, "last_calc": i}

            def skip(op):
                xx, c = op
                return taylor_skip_step(params, xx, embed0, arch, c["taylor"], step_diff, mm_type), dict(c)

            if _branch is None:
                x, cache = jax.lax.cond(should, calc, skip, (x, cache))
            else:
                x, cache = (calc if _branch else skip)((x, cache))
            cache = {**cache, "tea": tea_c}
        elif tea_cfg is not None:
            tf = lambda xx: transformer(params, xx, embed0, ctx_e, ctx_img)
            if enable_cfg and mesh is None and _branch is None:
                # trace-time branching implies a host-replayed SHARED
                # decision (tea_decision_series), so the per-side cond
                # path only applies to the traced variant
                # per-side cond/uncond skipping (reference
                # feature_caching/transformer_infer.py:14-19); under a dp
                # mesh the batch axis is sharded, so the shared decision
                # (strictly more conservative) is kept there
                def tf_single(xx, side):
                    return transformer(
                        params, xx, embed0[side:side + 1], ctx_e[side:side + 1],
                        None if ctx_img is None else ctx_img[side:side + 1])

                should_vec, cache = tea_decide_per_side(cache, embed, embed0, i, tea_cfg)
                x, cache = tea_transform_per_side(cache, should_vec, x, tf, tf_single)
            else:
                should, cache = tea_decide(cache, embed, embed0, i, tea_cfg)
                x, cache = tea_transform(cache, should, x, tf, branch=_branch)
        elif use_taylor:
            is_calc = jnp.asarray(taylor_is_calc)[i]
            step_diff = jnp.asarray(taylor_step_diff)[i]
            self_fn = partial(attention, self_attn_type)
            cross_fn = partial(attention, cross_attn_type)

            def calc(op):
                xx, c = op
                return taylor_calc_step(params, xx, embed0, ctx_e, ctx_img, rope_cos, rope_sin,
                                        arch, c, step_diff, mm_type, self_fn, cross_fn,
                                        primed=i > 0)

            def skip(op):
                xx, c = op
                return taylor_skip_step(params, xx, embed0, arch, c, step_diff, mm_type), c

            if _branch is None:
                x, cache = jax.lax.cond(is_calc, calc, skip, (x, cache))
            else:
                x, cache = (calc if _branch else skip)((x, cache))
        elif use_taylor_ws:
            is_calc = jnp.asarray(taylor_is_calc)[i]
            tf = lambda xx: transformer(params, xx, embed0, ctx_e, ctx_img)

            def calc(op):
                xx, c = op
                return taylor_ws_calc(tf, xx, c, i)

            def skip(op):
                xx, c = op
                return taylor_ws_skip(xx, c, i), dict(c)

            if _branch is None:
                x, cache = jax.lax.cond(is_calc, calc, skip, (x, cache))
            else:
                x, cache = (calc if _branch else skip)((x, cache))
        elif use_ada:
            mid = arch.num_layers // 2
            mm_fn = resolve_mm(mm_type)
            self_fn = partial(attention, self_attn_type)
            cross_fn = partial(attention, cross_attn_type)
            tokens_per_frame = seq_len // max(target_shape[1] // arch.patch_size[0], 1)

            def compute(op):
                xx, c = op
                x_in = xx

                def body(carry, layer):
                    xc, tiny = carry
                    block, li = layer
                    xc, y_self, _, _ = wan_block_parts(
                        block, xc, embed0, ctx_e, ctx_img, rope_cos, rope_sin,
                        arch, mm_fn, self_fn, cross_fn)
                    # gated self-attn output of the decisive middle block
                    gate = (block["modulation"][2] + embed0[:, 2].astype(jnp.float32))[:, None, :]
                    tiny = jnp.where(li == mid, (y_self.astype(jnp.float32) * gate), tiny)
                    return (xc, tiny), None

                tiny0 = jnp.zeros(x_in.shape, jnp.float32)
                (x_out, tiny), _ = jax.lax.scan(
                    body, (x_in, tiny0),
                    (params["blocks"], jnp.arange(arch.num_layers)))
                c = dict(c)
                c["prev_residual"] = (x_out - x_in).astype(c["prev_residual"].dtype)
                _, c = ada_skip_length(c, tiny, i, n_steps_static, tokens_per_frame)
                c["calc_count"] = c["calc_count"] + 1
                return x_out, c

            def skip(op):
                xx, c = op
                return xx + c["prev_residual"].astype(xx.dtype), dict(c)

            if _branch is None:
                x, cache = jax.lax.cond(i >= cache["skip_until"], compute, skip,
                                        (x, cache))
            else:
                # host-forced schedule (matched-calc-count comparisons vs
                # the reference's published Ada operating point; the
                # codebook's own decisions ride the traced cond above)
                x, cache = (compute if _branch else skip)((x, cache))
        else:
            x = transformer(params, x, embed0, ctx_e, ctx_img)

        out = wan_post_process(params, x, embed, grid, s_tokens, arch)
        if enable_cfg:
            noise_pred = out[1] + guide_scale * (out[0] - out[1])
        else:
            noise_pred = out[0]
        return scheduler.step_post(state, noise_pred), cache

    def init_cache():
        d = arch.dim
        if use_custom:
            mod_shape = (batch, 6, d) if tea_cfg.use_ret_steps else (batch, d)
            return {
                # Custom reconstructs skipped steps via Taylor, never via
                # the Tea residual — only prev_mod/accum are read, so the
                # (B, S, D) residual is allocated at token size 1
                "tea": init_tea_state((batch, 1, d), mod_shape),
                "taylor": init_taylor_cache(arch, batch, seq_len, dtype=taylor_dtype),
                "last_calc": jnp.asarray(0, jnp.int32),
            }
        if tea_cfg is not None:
            mod_shape = (batch, 6, d) if tea_cfg.use_ret_steps else (batch, d)
            return init_tea_state((batch, seq_len, d), mod_shape, dtype=tea_dtype)
        if use_taylor:
            return init_taylor_cache(arch, batch, seq_len, dtype=taylor_dtype)
        if use_taylor_ws:
            return init_taylor_ws_cache(batch, seq_len, d, dtype=taylor_dtype)
        if use_ada:
            return init_ada_state((batch, seq_len, d), metric_scale=ada_cfg_scale)
        return {}

    n_steps = num_steps if num_steps is not None else scheduler.num_steps()

    @jax.jit
    def denoise(params, state, context, context_null, y=None, clip_fea=None):
        def body(carry, _):
            st, cache = carry
            st, cache = one_step(params, st, cache, context, context_null, y, clip_fea)
            return (st, cache), None

        (state_f, _), _ = jax.lax.scan(body, (state, init_cache()), None, length=n_steps)
        return state_f

    denoise.one_step = one_step  # exposed for step-wise drivers
    # trace-time-branched step variants for host-scheduled caching
    # (TaylorSeer/Custom; see one_step's _branch note)
    denoise.one_step_calc = partial(one_step, _branch=True)
    denoise.one_step_skip = partial(one_step, _branch=False)
    denoise.init_cache = init_cache
    return denoise
