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

Feature composition (reference combines offload with caching and sparse
attention freely):

* TeaCache — pass ``tea`` to ``forward``: the decision runs host-side
  per step (the host loop already syncs per block), and a skipped step
  streams ZERO blocks — the whole-stack residual (staged in host RAM,
  the analog of the reference's residual-to-CPU move under cpu_offload,
  feature_caching/transformer_infer.py:50-51,134-139) is applied to the
  pre_infer output and post_infer runs directly.
* TaylorSeer / Custom — pass ``taylor`` (plus ``tea`` for Custom's
  rel-L1 decision): calc steps additionally stage a first-order state
  (f0, f1) of the WHOLE-STACK residual in host RAM; skip steps apply
  ``f0 + f1 * dt`` and stream zero blocks. This is deliberately the
  whole-stack variant, NOT the reference's per-module caches
  (feature_caching/transformer_infer.py:173-307): streaming per-module
  caches would move 6*B*S*D values per block per skip — at 14B/480P
  ~2 GB/block vs ~350 MB/block of int8 weights, i.e. a "skip" 5.7x more
  expensive than computing. The whole-stack state keeps the reference's
  first-calc semantics (f0-only, no derivative term —
  common/transformer_infer/transformer_infer.py:30-37).
* AdaCache — pass ``ada``: compute steps capture the decisive middle
  block's gated self-attn output in the block loop, feed the SAME
  ``ada_skip_length`` codebook as the resident path, and stage the
  whole-stack residual host-side; steps below ``skip_until`` replay it
  with zero fetches (the reference's replay is already whole-stack,
  feature_caching/transformer_infer.py:309-519 — streamed and resident
  Ada are exactly equivalent).
* sparge / any attention op — ``self_attn_kwargs`` threads through to
  the per-block attention call, including per-layer l1 budgets.

The whole-loop ``lax.scan`` path stays the default; streaming activates
with ``weight_streaming: true`` for over-HBM deployments.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from .config import WanArch
from .model import wan_block, wan_block_parts, wan_pre_process, wan_post_process

Params = Dict[str, Any]


def split_blocks_to_host(params: Params) -> Params:
    """Stacked (L, ...) block pytree -> list of per-block host (numpy)
    pytrees; the rest of the params stay on device."""
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
                          cross_attn_type: str = "flash_attn3",
                          self_attn_kwargs: Optional[dict] = None):
    """Returns fn(params_with_host_blocks, latents, t, context, rope_cos,
    rope_sin, **kw) -> noise prediction, streaming block weights.

    ``tea`` (optional dict {cfg: TeaCacheConfig, state, step, skipped})
    enables whole-stack TeaCache under streaming; on a skipped step no
    block is fetched. The caller owns the dict across steps."""
    mm_fn = resolve_mm(mm_type)
    kw = dict(self_attn_kwargs or {})
    l1_per_layer = kw.pop("l1_per_layer", None)
    # tuner-failed leading layers run dense (model.wan_transformer
    # dense_prefix); under streaming this is just a second jitted block
    # program selected by host index — no segmented scan needed
    dense_prefix = int(kw.pop("dense_prefix", 0) or 0)
    self_fn = partial(attention, self_attn_type, **kw)
    cross_fn = partial(attention, cross_attn_type)
    dense_attn_fn = partial(attention, "flash_attn3")

    @jax.jit
    def pre(params_small, latents, t, context, y=None, clip_fea=None):
        x, embed, embed0, ctx_e, ctx_img, _grid, _s = wan_pre_process(
            params_small, latents, t, context, arch, y=y, clip_fea=clip_fea)
        return x, embed, embed0, ctx_e, ctx_img

    @partial(jax.jit, donate_argnums=(1,))
    def block_step(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin):
        return wan_block(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin,
                         arch, mm_fn, self_fn, cross_fn)

    @partial(jax.jit, donate_argnums=(1,))
    def block_step_l1(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin, l1):
        return wan_block(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin,
                         arch, mm_fn, partial(self_fn, l1=l1), cross_fn)

    @partial(jax.jit, donate_argnums=(1,))
    def block_step_dense(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin):
        return wan_block(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin,
                         arch, mm_fn, dense_attn_fn, cross_fn)

    @partial(jax.jit, static_argnums=(3, 4))
    def post(params_small, x, embed, grid, s_tokens):
        return wan_post_process(params_small, x, embed, grid, s_tokens, arch)

    @partial(jax.jit, donate_argnums=(1,))
    def block_step_tiny(block, x, embed0, ctx, ctx_img, rope_cos, rope_sin, l1=None):
        """Block step that also returns the gated self-attn output — the
        AdaCache decision tensor at the decisive middle block (same
        expression as the resident path, pipeline.py ada branch)."""
        sf = self_fn if l1 is None else partial(self_fn, l1=l1)
        x, y_self, _, _ = wan_block_parts(block, x, embed0, ctx, ctx_img,
                                          rope_cos, rope_sin, arch, mm_fn,
                                          sf, cross_fn)
        gate = (block["modulation"][2] + embed0[:, 2].astype(jnp.float32))[:, None, :]
        return x, y_self.astype(jnp.float32) * gate

    @partial(jax.jit, static_argnums=(3, 4))
    def ada_update(state, tiny, step, n_steps, tokens_per_frame):
        from ...caching.adacache import ada_skip_length

        _, state = ada_skip_length(state, tiny, step, n_steps, tokens_per_frame)
        return state

    def _tea_should_calc(tea, embed, embed0) -> bool:
        """Host-side per-step decision with the resident path's exact
        semantics (caching/teacache.py tea_decide: per-side accumulators,
        conservative joint decision)."""
        from ...caching.teacache import init_tea_state, tea_decide

        if tea["state"] is None:
            mod = (embed0 if tea["cfg"].use_ret_steps else embed)
            # x-shaped residual slot is host-staged, not part of this state
            tea["state"] = {"prev_mod": jnp.zeros_like(mod, dtype=jnp.float32),
                            "accum": jnp.zeros((mod.shape[0],), jnp.float32),
                            "prev_residual": jnp.zeros((1,), jnp.bfloat16)}
        should, tea["state"] = tea_decide(tea["state"], embed, embed0,
                                          jnp.asarray(tea["step"]), tea["cfg"])
        return bool(should)

    def _sat_cast(r, dtype):
        # fp8 host staging: saturate explicitly (XLA's convert maps
        # out-of-range to NaN, not max) — mirrors taylorseer.store
        if dtype == jnp.float8_e4m3fn:
            r = jnp.clip(r, -448.0, 448.0)
        return np.asarray(r.astype(dtype))

    def forward(params, latents, t, context, rope_cos, rope_sin,
                y=None, clip_fea=None, tea=None, taylor=None, ada=None):
        small = {k: v for k, v in params.items() if k != "blocks"}
        blocks = params["blocks"]  # list of host pytrees OR a BlockPrefetcher
        pt, ph, pw = arch.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph, latents.shape[4] // pw)
        s_tokens = grid[0] * grid[1] * grid[2]
        x, embed, embed0, ctx_e, ctx_img = pre(small, latents, t, context, y=y, clip_fea=clip_fea)

        # ---- host-side skip decision: a skipped step fetches ZERO blocks
        if taylor is not None:
            # Custom = Tea's rel-L1 decision + Taylor reconstruction
            # (reference WanTransformerInferCustomCaching); plain
            # TaylorSeer uses its fixed calc pattern
            if tea is not None:
                should = _tea_should_calc(tea, embed, embed0)
            else:
                should = bool(taylor["is_calc"][taylor["step"]])
            if not should and taylor.get("f0") is not None:
                taylor["skipped"] += 1
                dt = jnp.float32(taylor["step"] - taylor["last_calc"])
                rec = (jnp.asarray(taylor["f0"]).astype(jnp.float32)
                       + jnp.asarray(taylor["f1"]).astype(jnp.float32) * dt)
                # add in fp32: with an fp32 cache the f0 replay is then
                # bit-exact vs the calc output (r is exact in fp32)
                x = (x.astype(jnp.float32) + rec).astype(x.dtype)
                return post(small, x, embed, grid, s_tokens)
        elif ada is not None:
            if ada["step"] < ada["skip_until"] and "residual" in ada:
                ada["skipped"] += 1
                x = (x.astype(jnp.float32)
                     + jnp.asarray(ada["residual"]).astype(jnp.float32)).astype(x.dtype)
                return post(small, x, embed, grid, s_tokens)
        elif tea is not None:
            should = _tea_should_calc(tea, embed, embed0)
            if not should and "residual" in tea:
                # skipped step: zero block fetches; host-staged residual
                tea["skipped"] += 1
                x = (x.astype(jnp.float32)
                     + jnp.asarray(tea["residual"]).astype(jnp.float32)).astype(x.dtype)
                return post(small, x, embed, grid, s_tokens)

        if hasattr(blocks, "get"):  # disk tier: prefetcher pops blocks
            n_blocks = blocks.store.num_blocks()
            blocks.schedule(range(n_blocks))
            fetch = blocks.get
        else:
            n_blocks = len(blocks)
            fetch = blocks.__getitem__
        caching = tea is not None or taylor is not None or ada is not None
        # separate buffer: block_step donates x's buffer on the first call
        x_in = jnp.copy(x) if caching else None
        mid = arch.num_layers // 2
        tiny = None
        # double-buffered streaming: put(i+1) overlaps block i compute
        dev_block = jax.device_put(fetch(0))
        for i in range(n_blocks):
            nxt = jax.device_put(fetch(i + 1)) if i + 1 < n_blocks else None
            l1 = None if l1_per_layer is None else jnp.float32(l1_per_layer[i])
            if ada is not None and i == mid:
                x, tiny = block_step_tiny(dev_block, x, embed0, ctx_e, ctx_img,
                                          rope_cos, rope_sin, l1=l1)
            elif i < dense_prefix:
                x = block_step_dense(dev_block, x, embed0, ctx_e, ctx_img,
                                     rope_cos, rope_sin)
            elif l1 is not None:
                x = block_step_l1(dev_block, x, embed0, ctx_e, ctx_img,
                                  rope_cos, rope_sin, l1)
            else:
                x = block_step(dev_block, x, embed0, ctx_e, ctx_img, rope_cos, rope_sin)
            dev_block = nxt
        if caching:
            # whole-stack residual staged in host RAM (reference moves it
            # to CPU under cpu_offload)
            r = x.astype(jnp.float32) - x_in.astype(jnp.float32)
        if taylor is not None:
            dt = float(max(taylor["step"] - taylor["last_calc"], 1))
            dtype = taylor.get("dtype", jnp.bfloat16)
            if taylor.get("f0") is None:
                # reference first-calc semantics: f0 only, no derivative
                f1 = jnp.zeros_like(r)
            else:
                f1 = (r - jnp.asarray(taylor["f0"]).astype(jnp.float32)) / dt
            taylor["f1"] = _sat_cast(f1, dtype)
            taylor["f0"] = _sat_cast(r, dtype)
            taylor["last_calc"] = taylor["step"]
        elif ada is not None:
            ada["residual"] = np.asarray(r.astype(jnp.bfloat16))
            ada["state"] = ada_update(ada["state"], tiny, jnp.asarray(ada["step"]),
                                      ada["n_steps"], ada["tokens_per_frame"])
            ada["skip_until"] = int(ada["state"]["skip_until"])
        elif tea is not None:
            tea["residual"] = np.asarray(r.astype(jnp.bfloat16))
        return post(small, x, embed, grid, s_tokens)

    return forward
