"""Tensor parallelism for the Wan DiT block.

The reference's only TP is head-parallel attention (partial_heads_attn).
Here TP is a first-class mesh axis: attention heads AND the FFN hidden
dim shard over ``tp``; each device computes its slice and the two
row-parallel projections (attn o-proj, ffn fc2) finish with a ``psum``
over ``tp`` — the Megatron column/row-parallel pattern expressed in
shard_map. Combines with ``sp`` (Ulysses) and ``dp`` (CFG) on one mesh.

Weight sharding happens via the shard_map in_specs (see
``tp_block_specs``): q/k/v/ffn0 shard their OUTPUT dim, o/ffn2 shard
their INPUT dim; everything else is replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.wan.config import WanArch
from ..models.wan.model import _mm, _split_modulation
from ..ops.linear import mm_gelu
from ..ops.norms import layer_norm, modulated_layer_norm, rms_norm
from ..ops.rope import apply_rope

Params = Dict[str, Any]


def tp_block_specs(task: str = "t2v") -> Dict[str, Any]:
    """PartitionSpecs for the stacked Wan block pytree under tp.
    Linear weights are (L, out, in)."""
    col = {"w": P(None, "tp", None), "b": P(None, "tp")}   # output-sharded
    row = {"w": P(None, None, "tp"), "b": P()}              # input-sharded
    rep = {"w": P(), "b": P()}
    attn = {
        "q": dict(col), "k": dict(col), "v": dict(col), "o": dict(row),
        # QK RMSNorm acts on the full dim -> shard its scale like the outputs
        "norm_q": P(None, "tp"), "norm_k": P(None, "tp"),
    }
    cross = dict(attn)
    if task == "i2v":
        cross["k_img"] = dict(col)
        cross["v_img"] = dict(col)
        cross["norm_k_img"] = P(None, "tp")
    return {
        "modulation": P(),
        "norm3": {"w": P(), "b": P()},
        "self_attn": attn,
        "cross_attn": cross,
        "ffn": {"0": dict(col), "2": dict(row)},
    }


def _rms_tp(x: jnp.ndarray, w: jnp.ndarray, full_dim: int, tp_axis: str, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm whose statistics span the FULL (tp-sharded) dim: the local
    sum of squares is psum'd before normalizing (Wan's QK norm acts on the
    whole projection, model.py wan_block_parts)."""
    xf = x.astype(jnp.float32)
    ssq = jax.lax.psum(jnp.sum(xf * xf, axis=-1, keepdims=True), tp_axis)
    out = xf * jax.lax.rsqrt(ssq / full_dim + eps) * w.astype(jnp.float32)
    return out.astype(x.dtype)


def _row_mm(p: Params, x: jnp.ndarray, mm_fn, tp_axis: str) -> jnp.ndarray:
    """Row-parallel linear: partial matmul + psum, bias added ONCE after."""
    stripped = {k: v for k, v in p.items() if k != "b"}
    stripped["b"] = None
    out = jax.lax.psum(mm_fn(stripped, x), tp_axis)
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def wan_block_tp(
    block: Params,
    x: jnp.ndarray,
    embed0: jnp.ndarray,
    context: jnp.ndarray,
    context_img: Optional[jnp.ndarray],
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    mm_fn,
    attn_fn,
    cross_attn_fn=None,
    tp_axis: str = "tp",
) -> jnp.ndarray:
    """wan_block with head/ffn shards local to this device and psums on
    the row-parallel projections. ``arch.num_heads`` is the GLOBAL head
    count; the local slice is num_heads // tp. ``attn_fn`` is the (possibly
    Ulysses-wrapped) self attention; ``cross_attn_fn`` must be the dense
    local one (text K/V is replicated, never all-to-all'd)."""
    cross_attn_fn = cross_attn_fn or attn_fn
    b, s, d = x.shape
    tp = jax.lax.axis_size(tp_axis)
    n_loc = arch.num_heads // tp
    hd = arch.head_dim
    d_loc = n_loc * hd
    shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = _split_modulation(block, embed0)

    sa = block["self_attn"]
    norm1 = modulated_layer_norm(x, shift_msa, scale_msa, eps=arch.eps)
    q = _rms_tp(_mm(sa["q"], norm1, mm_fn), sa["norm_q"], d, tp_axis).reshape(b, s, n_loc, hd)
    k = _rms_tp(_mm(sa["k"], norm1, mm_fn), sa["norm_k"], d, tp_axis).reshape(b, s, n_loc, hd)
    v = _mm(sa["v"], norm1, mm_fn).reshape(b, s, n_loc, hd)
    if arch.rope_fused:
        # q/k weights are half-split-permuted (permute_qk_half): the
        # rotation belongs to attn_fn (fused in-kernel, or the half-split
        # XLA pass) — plain apply_rope on permuted projections would
        # silently corrupt every frame (model.py:178-184 same branch)
        attn_out = attn_fn(q, k, v, rope_cos=rope_cos, rope_sin=rope_sin).reshape(b, s, d_loc)
    else:
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn_out = attn_fn(q, k, v).reshape(b, s, d_loc)
    y = _row_mm(sa["o"], attn_out, mm_fn, tp_axis)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * gate_msa.astype(jnp.float32)).astype(x.dtype)

    ca = block["cross_attn"]
    norm3 = layer_norm(x, block["norm3"]["w"], block["norm3"]["b"], eps=arch.eps)
    cq = _rms_tp(_mm(ca["q"], norm3, mm_fn), ca["norm_q"], d, tp_axis).reshape(b, s, n_loc, hd)
    ck = _rms_tp(_mm(ca["k"], context, mm_fn), ca["norm_k"], d, tp_axis).reshape(b, -1, n_loc, hd)
    cv = _mm(ca["v"], context, mm_fn).reshape(b, -1, n_loc, hd)
    cross_out = cross_attn_fn(cq, ck, cv).reshape(b, s, d_loc)
    if context_img is not None and "k_img" in ca:
        ik = _rms_tp(_mm(ca["k_img"], context_img, mm_fn), ca["norm_k_img"], d, tp_axis).reshape(b, -1, n_loc, hd)
        iv = _mm(ca["v_img"], context_img, mm_fn).reshape(b, -1, n_loc, hd)
        cross_out = cross_out + cross_attn_fn(cq, ik, iv).reshape(b, s, d_loc)
    x = x + _row_mm(ca["o"], cross_out, mm_fn, tp_axis)

    norm2 = modulated_layer_norm(x, c_shift, c_scale, eps=arch.eps)
    h = mm_gelu(mm_fn, block["ffn"]["0"], norm2)  # in-kernel GELU on w8a8
    y = _row_mm(block["ffn"]["2"], h, mm_fn, tp_axis)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * c_gate.astype(jnp.float32)).astype(x.dtype)
    return x
