"""CausVid: block-autoregressive Wan generation with KV caches.

Reference: lightx2v/models/networks/wan/infer/causvid/transformer_infer.py
(per-layer self-attn KV cache written at [kv_start:kv_end], queries attend
cache[:kv_end]; cross-attn K/V computed once and reused) and
models/runners/wan/wan_causvid_runner.py:75-130 (fragment loop, per-block
3-9-step distilled denoise, cache re-anchoring between fragments).

TPU structure: the KV cache is a pair of (L, kv_size, N, D) arrays scanned
alongside the stacked block weights — each scan step consumes its layer's
cache slice and emits the updated one. ``kv_start``/``kv_len`` are traced
scalars (dynamic_update_slice + the flash kernel's SMEM length bound), so
one compiled function serves every AR block position.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...ops.norms import layer_norm, modulated_layer_norm, rms_norm
from ...ops.rope import apply_rope
from .config import WanArch
from .model import _mm, _split_modulation, time_embeddings, text_embeddings, patchify, unpatchify

Params = Dict[str, Any]


def init_kv_cache(arch: WanArch, kv_size: int, batch: int = 1, dtype=jnp.bfloat16):
    """(reference _init_kv_cache :18-30)."""
    shape = (arch.num_layers, batch, kv_size, arch.num_heads, arch.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(params: Params, context: jnp.ndarray, arch: WanArch, mm_fn=None):
    """Per-layer cross-attn K/V over the (padded) text context — computed
    once per prompt (the reference's crossattn_cache is_init path)."""
    mm_fn = mm_fn or resolve_mm("Default")
    b = context.shape[0]

    def layer_kv(block):
        ca = block["cross_attn"]
        k = rms_norm(_mm(ca["k"], context, mm_fn), ca["norm_k"], eps=1e-5)
        v = _mm(ca["v"], context, mm_fn)
        n, hd = arch.num_heads, arch.head_dim
        return k.reshape(b, -1, n, hd), v.reshape(b, -1, n, hd)

    return jax.lax.map(layer_kv, params["blocks"])


def causvid_block(
    block: Params,
    x: jnp.ndarray,              # (B, S_blk, D)
    kv_k: jnp.ndarray,           # (B, kv_size, N, Hd)
    kv_v: jnp.ndarray,
    cross_k: jnp.ndarray,        # (B, Lt, N, Hd)
    cross_v: jnp.ndarray,
    embed0: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_start: jnp.ndarray,       # traced scalar
    kv_len: jnp.ndarray,         # traced scalar (== kv_end)
    arch: WanArch,
    mm_fn,
    attn_type: str,
):
    b, s, d = x.shape
    n, hd = arch.num_heads, arch.head_dim
    shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = _split_modulation(block, embed0)

    sa = block["self_attn"]
    norm1 = modulated_layer_norm(x, shift_msa, scale_msa, eps=arch.eps)
    q = rms_norm(_mm(sa["q"], norm1, mm_fn), sa["norm_q"], eps=1e-5).reshape(b, s, n, hd)
    k = rms_norm(_mm(sa["k"], norm1, mm_fn), sa["norm_k"], eps=1e-5).reshape(b, s, n, hd)
    v = _mm(sa["v"], norm1, mm_fn).reshape(b, s, n, hd)
    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)

    kv_k = jax.lax.dynamic_update_slice(kv_k, k.astype(kv_k.dtype), (0, kv_start, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v.astype(kv_v.dtype), (0, kv_start, 0, 0))

    attn_out = attention(attn_type, q, kv_k, kv_v, kv_len=kv_len).reshape(b, s, d)
    y = _mm(sa["o"], attn_out, mm_fn)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * gate_msa.astype(jnp.float32)).astype(x.dtype)

    # cross attention against the precomputed per-layer context K/V
    ca = block["cross_attn"]
    norm3 = layer_norm(x, block["norm3"]["w"], block["norm3"]["b"], eps=arch.eps)
    cq = rms_norm(_mm(ca["q"], norm3, mm_fn), ca["norm_q"], eps=1e-5).reshape(b, s, n, hd)
    cross_out = attention(attn_type, cq, cross_k, cross_v).reshape(b, s, d)
    x = x + _mm(ca["o"], cross_out, mm_fn)

    norm2 = modulated_layer_norm(x, c_shift, c_scale, eps=arch.eps)
    h = _mm(block["ffn"]["0"], norm2, mm_fn)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    y = _mm(block["ffn"]["2"], h, mm_fn)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * c_gate.astype(jnp.float32)).astype(x.dtype)
    return x, kv_k, kv_v


def causvid_forward(
    params: Params,
    latents: jnp.ndarray,        # (B, C, F_blk, H, W) one AR block of frames
    t: jnp.ndarray,              # (B,)
    kv_cache: Dict[str, jnp.ndarray],
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_start: jnp.ndarray,
    kv_len: jnp.ndarray,
    arch: WanArch,
    context_raw: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    attn_type: str = "flash_attn3",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One denoise forward over an AR frame block, updating the KV cache."""
    mm_fn = resolve_mm("Default")
    x = patchify(latents.astype(jnp.bfloat16), arch.patch_size)
    x = _mm(params["patch_embedding"], x, mm_fn)
    pt, ph, pw = arch.patch_size
    grid = (latents.shape[2] // pt, latents.shape[3] // ph, latents.shape[4] // pw)
    s_tokens = x.shape[1]

    embed, embed0 = time_embeddings(params, t, arch)

    mm_blk = resolve_mm(mm_type)
    cross_k, cross_v = cross_kv

    def body(carry, layer):
        xc = carry
        block, kk, vv, ck, cv = layer
        xc, kk, vv = causvid_block(
            block, xc, kk, vv, ck, cv, embed0, rope_cos, rope_sin,
            kv_start, kv_len, arch, mm_blk, attn_type,
        )
        return xc, (kk, vv)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (params["blocks"], kv_cache["k"], kv_cache["v"], cross_k, cross_v)
    )

    from .model import wan_head

    out = wan_head(params, x, embed, arch, mm_fn)
    out = unpatchify(out.astype(jnp.float32), grid, arch.patch_size, arch.out_dim)
    return out, {"k": new_k, "v": new_v}
