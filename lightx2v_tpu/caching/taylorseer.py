"""TaylorSeer caching: per-block per-module Taylor extrapolation.

Reference (lightx2v/models/networks/wan/infer/feature_caching/
transformer_infer.py:173-307 + common/transformer_infer/transformer_infer.py
:30-47): a fixed 1-calc / 3-skip step pattern; on calc steps every block's
self-attn / cross-attn / FFN outputs and their finite-difference
derivatives are cached; skip steps reconstruct each module's output with
the first-order Taylor formula f0 + f1 * dt and apply only the (cheap)
modulation gates.

TPU structure: the pattern and step distances are host-precomputed and fed
to the denoise scan as per-step inputs; caches are stacked (L, B, S, D)
arrays in the scan carry, and the skip branch is a ``lax.scan`` over
blocks touching only gates and cached tensors. Memory note: the cache is
6 * L * S * D values — sized for big-HBM parts (v5p) at 14B/480P, or small
models anywhere (the reference holds the same on the GPU).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.config import WanArch
from ..models.wan.model import _mm, _split_modulation, wan_block_parts
from ..ops.linear import resolve_mm


def taylor_schedule(n_steps: int, pattern: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """(is_calc (n,), step_diff (n,)): calc every `pattern` steps
    (reference scheduler sets [True, False, False, False] repeating);
    step_diff = distance from the previous calc step (both for the
    derivative at calc steps and the Taylor x at skip steps)."""
    is_calc = np.array([i % pattern == 0 for i in range(n_steps)])
    step_diff = np.zeros(n_steps, np.float32)
    last_calc = 0
    for i in range(n_steps):
        if is_calc[i]:
            step_diff[i] = i - last_calc if i > 0 else 1.0
            last_calc = i
        else:
            step_diff[i] = i - last_calc
    return is_calc, step_diff


def init_taylor_cache(arch: WanArch, batch: int, seq_len: int, dtype=jnp.bfloat16) -> Dict:
    shape = (arch.num_layers, batch, seq_len, arch.dim)
    z = lambda: jnp.zeros(shape, dtype)
    return {name: {"f0": z(), "f1": z()} for name in ("self_attn", "cross_attn", "ffn")}


def taylor_calc_step(params, x, embed0, ctx, ctx_img, rope_cos, rope_sin, arch: WanArch,
                     cache: Dict, step_diff, mm_type="Default",
                     self_attn_fn=None, cross_attn_fn=None, primed=True):
    """Full compute, recording module outputs + derivatives
    (reference derivative_approximation).

    ``primed``: False on the FIRST calc step — the reference stores only
    f0 then (`common/transformer_infer/transformer_infer.py:30-37`:
    `if module_name not in block_cache`), so early skips replay f0 with
    no derivative term; a derivative against the zero-initialized cache
    would double the residual on the first skip."""
    mm_fn = resolve_mm(mm_type)

    def store(y, dtype):
        # fp8 caches (full-token 480P on 16 GB HBM): saturate explicitly —
        # XLA's convert to e4m3fn maps out-of-range to NaN, not max
        if dtype == jnp.float8_e4m3fn:
            y = jnp.clip(y.astype(jnp.float32), -448.0, 448.0)
        return y.astype(dtype)

    # The cache rides the scan CARRY and is updated layer-by-layer with
    # dynamic-update-slice, NOT emitted as stacked scan ys: stacked ys
    # allocate a second full-size cache buffer alongside the scanned-over
    # old one (xs stay live for the whole loop), which at full 480P
    # tokens is 2 x 9 GB and OOMs one v5e even with the input donated.
    # A DUS-updated carry is rewritten in place (the per-layer old slice
    # is read before the same slice is written, costing one ~50 MB slice
    # temp), so the donated step program holds ONE cache plus temps.
    def body(carry, layer):
        xc, cf = carry
        l, block = layer
        xc, y_self, y_cross, y_ffn = wan_block_parts(
            block, xc, embed0, ctx, ctx_img, rope_cos, rope_sin, arch, mm_fn,
            self_attn_fn, cross_attn_fn)
        for name, y in (("self_attn", y_self), ("cross_attn", y_cross), ("ffn", y_ffn)):
            old_f0 = jax.lax.dynamic_index_in_dim(cf[name]["f0"], l, 0, keepdims=False)
            f1 = (y.astype(jnp.float32) - old_f0.astype(jnp.float32)) / step_diff
            f1 = jnp.where(primed, f1, jnp.zeros_like(f1))
            cf = {**cf, name: {
                "f0": jax.lax.dynamic_update_index_in_dim(
                    cf[name]["f0"], store(y, cf[name]["f0"].dtype), l, 0),
                "f1": jax.lax.dynamic_update_index_in_dim(
                    cf[name]["f1"], store(f1, cf[name]["f1"].dtype), l, 0),
            }}
        return (xc, cf), None

    (x, cache), _ = jax.lax.scan(
        body, (x, cache), (jnp.arange(arch.num_layers), params["blocks"]))
    return x, cache


def taylor_skip_step(params, x, embed0, arch: WanArch, cache: Dict, x_diff, mm_type="Default"):
    """Cheap reconstruction: x += taylor(self)*gate + taylor(cross) +
    taylor(ffn)*c_gate per block (reference infer_block :254-282)."""

    def taylor(c):
        return c["f0"].astype(jnp.float32) + c["f1"].astype(jnp.float32) * x_diff

    def body(carry, layer):
        xc = carry.astype(jnp.float32)
        block, c_self, c_cross, c_ffn = layer
        _, _, gate, _, _, c_gate = _split_modulation(block, embed0)
        xc = xc + taylor(c_self) * gate.astype(jnp.float32)
        xc = xc + taylor(c_cross)
        xc = xc + taylor(c_ffn) * c_gate.astype(jnp.float32)
        return xc.astype(carry.dtype), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], cache["self_attn"], cache["cross_attn"], cache["ffn"]))
    return x


def init_taylor_ws_cache(batch: int, seq_len: int, dim: int,
                         dtype=jnp.bfloat16) -> Dict:
    """Whole-stack Taylor cache: ONE (B, S, D) f0/f1 pair for the entire
    transformer residual instead of per-module per-block entries.

    This is the capacity-fit variant: the reference-faithful per-module
    cache is 6*L*S*D values (~20.8 GB fp8 at 14B 720P — over one v5e,
    and its step program kills the remote compile helper), while the
    whole-stack pair is 2*S*D (~775 MB fp8 at 720P). Same semantics the
    weight-streaming path uses (models/wan/streaming.py taylor dict);
    quality trades the per-module gating for a single stack-level
    extrapolation."""
    z = lambda: jnp.zeros((batch, seq_len, dim), dtype)
    return {"f0": z(), "f1": z(), "last_calc": jnp.asarray(0, jnp.int32)}


def _ws_store(y: jnp.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.float8_e4m3fn:
        y = jnp.clip(y.astype(jnp.float32), -448.0, 448.0)
    return y.astype(dtype)


def taylor_ws_calc(transformer_fn, x: jnp.ndarray, cache: Dict,
                   step_index) -> Tuple[jnp.ndarray, Dict]:
    """Full compute; store the whole-stack residual + first-order
    derivative (first calc stores f0 only, like the per-module path's
    ``primed`` handling — a derivative against the zero init would
    double the residual on the first skip)."""
    x_out = transformer_fn(x)
    # residual/derivative chain in bf16, not fp32: at 14B 720P the three
    # (B, 75600, 5120) f32 temps (r, f0_old, f1) are ~4.6 GB on top of
    # the forward peak and RESOURCE_EXHAUST one v5e; the cache itself is
    # fp8/bf16, so bf16 intermediates lose nothing the store keeps
    mdt = jnp.float32 if cache["f0"].dtype == jnp.float32 else jnp.bfloat16
    r = (x_out - x).astype(mdt)
    dt = jnp.maximum(step_index - cache["last_calc"], 1).astype(mdt)
    f1 = (r - cache["f0"].astype(mdt)) / dt
    f1 = jnp.where(step_index > 0, f1, jnp.zeros_like(f1))
    return x_out, {"f0": _ws_store(r, cache["f0"].dtype),
                   "f1": _ws_store(f1, cache["f1"].dtype),
                   "last_calc": step_index.astype(jnp.int32)}


def taylor_ws_skip(x: jnp.ndarray, cache: Dict, step_index) -> jnp.ndarray:
    """x += f0 + f1 * (i - last_calc) — add in fp32 so an fp32 cache's
    f0 replay is bit-exact vs the calc output."""
    dt = (step_index - cache["last_calc"]).astype(jnp.float32)
    rec = cache["f0"].astype(jnp.float32) + cache["f1"].astype(jnp.float32) * dt
    return (x.astype(jnp.float32) + rec).astype(x.dtype)
