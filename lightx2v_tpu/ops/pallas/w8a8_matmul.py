"""Fused dynamic-activation-quant w8a8 matmul (Pallas TPU).

The jnp w8a8 path (ops/linear.py _mm_int8/_mm_fp8) materializes fp32
activation temps in HBM: quantize reads x, writes q + scales, the dot
reads q, and the f32 rescale materializes (M, N) — at 14B/480P shapes
(32760 x 5120) those temps are ~640 MB each and three of them pushed the
int8 DiT forward 700 MB past a v5e's 15.75 GB HBM.

This kernel fuses quantize -> int8/fp8 dot -> rescale in VMEM:
  grid (M/bm, N/bn, K/bk), k minor; per (bm, bk) x-tile compute the
  per-token absmax IN-KERNEL, quantize to int8/fp8 on the VPU, run the
  quantized dot on the MXU, and accumulate f32 partials rescaled by the
  per-token-per-k-block scale. HBM traffic: x bf16 once, w int8 once,
  out bf16 once — no f32 temps at all.

Quantization granularity is per-token-per-k-block(bk) — strictly FINER
than the jnp path's per-token scales (each k-block gets its own absmax),
so accuracy is >= the reference's dynamic per-token scheme
(lightx2v_kernel per-token quant; mm_weight.py act_quant_* paths).

Weight layout matches the checkpoint/NT convention: w (N, K) int8 or
f8e4m3 with per-channel ``w_scale`` (N,) f32; bias (N,) f32 or None.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BM = 512
DEFAULT_BN = 512
DEFAULT_BK = 1024


def _w8a8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, acc_ref, *, nk, kind, out_dtype, act=None):
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (bm, bk)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (bm, 1)
    if kind == "int8":
        scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        s = jax.lax.dot_general(q, w_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc_ref[:] += s.astype(jnp.float32) * scale
    else:  # fp8
        scale = jnp.maximum(absmax, 1e-8) * (1.0 / 448.0)
        q = (x / scale).astype(jnp.float8_e4m3fn)
        s = jax.lax.dot_general(q, w_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[:] += s * scale

    @pl.when(kb == nk - 1)
    def _():
        y = acc_ref[:] * ws_ref[...].astype(jnp.float32)  # (1, bn) w_scale row
        y = y + b_ref[...].astype(jnp.float32)
        if act == "gelu":
            # fused FFN activation (fp32, tanh approx — matches
            # jax.nn.gelu(approximate=True)); saves a full-size HBM
            # round-trip of the 13824-wide intermediate
            y = 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y)))
        o_ref[0] = y.astype(out_dtype)


def w8a8_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kind: str = "int8",
    bm: int = DEFAULT_BM,
    bn: int = DEFAULT_BN,
    bk: int = DEFAULT_BK,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., K) float -> (..., N). w (N, K) int8/f8e4m3, w_scale (N,) f32.
    ``act="gelu"`` applies tanh-GELU to the fp32 accumulator in-kernel.

    The kernel runs on x's NATIVE (B, S, K) layout (leading dims folded to
    one batch axis, a bitcast): reshaping to (M, K) on the host side made
    XLA materialize a full-size copy at the custom-call layout boundary —
    the (1, S, D) norm output AND its (S, D) reshape were simultaneously
    live (2 x 320 MB at 14B/480P)."""
    *lead, K = x.shape
    N = w.shape[0]
    out_dtype = x.dtype
    if len(lead) == 1:
        B, S = 1, lead[0]
        x3 = x[None]
    else:
        B, S = int(math.prod(lead[:-1])), lead[-1]
        x3 = x.reshape(B, S, K)  # collapsing leading dims is a bitcast

    # k MUST tile exactly (out-of-bounds k would contribute garbage to the
    # accumulation): pick the largest power-of-two block dividing K. s/n are
    # left RAGGED — Pallas masks the partial edge blocks, and a host-side
    # jnp.pad here would duplicate the whole activation in HBM (an 864 MB
    # copy of the 14B FFN gelu output is what re-OOMed the first version).
    bm = min(bm, max(8, 1 << (S - 1).bit_length()))
    bn = min(bn, max(128, 1 << (N - 1).bit_length()))
    while bk > 128 and K % bk:
        bk //= 2
    if K % bk:
        pk = (-K) % bk
        x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, pk)))
        w = jnp.pad(w, ((0, 0), (0, pk)))
        K += pk
    b = bias.astype(jnp.float32) if bias is not None else jnp.zeros((N,), jnp.float32)

    grid = (B, -(-S // bm), -(-N // bn), K // bk)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, nk=grid[3], kind=kind, out_dtype=out_dtype, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda bb, i, j, kb: (bb, i, kb)),
            pl.BlockSpec((bn, bk), lambda bb, i, j, kb: (j, kb)),
            pl.BlockSpec((1, bn), lambda bb, i, j, kb: (0, j)),
            pl.BlockSpec((1, bn), lambda bb, i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda bb, i, j, kb: (bb, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * N * K,
            bytes_accessed=2 * B * S * K + N * K + 2 * B * S * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, w, w_scale.reshape(1, -1).astype(jnp.float32), b.reshape(1, -1))
    return out.reshape(*lead, N)


def _w8a8_fullk_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref,
                       *, kind, out_dtype, act=None):
    """Full-K w8a8: quantize the x tile ONCE into VMEM scratch, then one
    (bm, K) x (bn, K) dot per n-block — no k loop, no accumulator, no
    per-step requantize. The k-blocked kernel above re-quantizes the x
    tile for every (n, k) grid step, which left it VPU-bound at ~48 TOPS
    on the 14B qkvo shape; this form runs the MXU's int8 rate with one
    quantize per (s-block) and a single (bm, bn) rescale per step."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        if kind == "int8":
            s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
            xq_ref[:] = jnp.clip(jnp.round(x / s), -127, 127).astype(xq_ref.dtype)
        else:
            s = jnp.maximum(absmax, 1e-8) * (1.0 / 448.0)
            xq_ref[:] = (x / s).astype(xq_ref.dtype)
        xs_ref[:] = jnp.broadcast_to(s, xs_ref.shape)

    if kind == "int8":
        acc = jax.lax.dot_general(xq_ref[:], w_ref[...], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(xq_ref[:], w_ref[...], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    y = acc * xs_ref[:, :1] * ws_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if act == "gelu":
        y = 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y)))
    o_ref[0] = y.astype(out_dtype)


def w8a8_matmul_fullk(
    x: jnp.ndarray,
    w: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kind: str = "int8",
    bm: int = 512,
    bn: int = 1024,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-K variant of w8a8_matmul (per-token scales over the WHOLE K —
    the jnp path's exact granularity). Requires K % 128 == 0 and a K that
    fits VMEM alongside the weight block (use the k-blocked kernel for
    K > ~8k)."""
    *lead, K = x.shape
    N = w.shape[0]
    out_dtype = x.dtype
    if len(lead) == 1:
        B, S = 1, lead[0]
        x3 = x[None]
    else:
        B, S = int(math.prod(lead[:-1])), lead[-1]
        x3 = x.reshape(B, S, K)
    if K % 128:
        raise ValueError(f"w8a8_matmul_fullk needs K%128==0, got {K}")
    bm = min(bm, max(8, 1 << (S - 1).bit_length()))
    bn = min(bn, max(128, 1 << (N - 1).bit_length()))
    qdt = jnp.int8 if kind == "int8" else jnp.float8_e4m3fn
    b = (bias if bias is not None else jnp.zeros((N,), jnp.float32)).astype(jnp.float32)

    grid = (B, -(-S // bm), -(-N // bn))
    out = pl.pallas_call(
        functools.partial(_w8a8_fullk_kernel, kind=kind, out_dtype=out_dtype, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, K), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((bn, K), lambda bb, i, j: (j, 0)),
            pl.BlockSpec((1, bn), lambda bb, i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda bb, i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda bb, i, j: (bb, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), qdt),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * N * K,
            bytes_accessed=2 * B * S * K + N * K + 2 * B * S * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, w, w_scale.reshape(1, -1).astype(jnp.float32), b.reshape(1, -1))
    return out.reshape(*lead, N)


def _ffn_w8a8_kernel(x_ref, w0_ref, s0_ref, b0_ref, w2_ref, s2_ref, b2_ref,
                     o_ref, acc_ref, xq_ref, xs_ref, *, nh, kind, out_dtype):
    """Whole FFN (x @ w0 -> gelu -> @ w2) in one kernel.

    Grid (B, S/bm, H/bh), hidden minor. The x tile's block index is
    constant over the hidden loop so Pallas fetches it once per s-block;
    it is quantized into VMEM scratch at hb==0 and reused for all nh
    first-GEMM steps. The gelu'd (bm, bh) hidden tile is quantized and
    consumed by the second GEMM immediately — the (S, H) intermediate
    (864 MB bf16 at 14B/480P) never exists in HBM, and neither do the
    separate kernels' h-write + 10x h-re-read (second-GEMM n-loop).
    HBM per call: x once, out once, w0+w2 once per s-block.
    """
    hb = pl.program_id(2)

    @pl.when(hb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[0].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        if kind == "int8":
            s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
            xq_ref[:] = jnp.clip(jnp.round(x / s), -127, 127).astype(xq_ref.dtype)
        else:
            s = jnp.maximum(absmax, 1e-8) * (1.0 / 448.0)
            xq_ref[:] = (x / s).astype(xq_ref.dtype)
        xs_ref[:] = jnp.broadcast_to(s, xs_ref.shape)

    xs = xs_ref[:, :1]  # (bm, 1) per-token act scale
    if kind == "int8":
        h = jax.lax.dot_general(xq_ref[:], w0_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        h = jax.lax.dot_general(xq_ref[:], w0_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    h = h * xs * s0_ref[...].astype(jnp.float32) + b0_ref[...].astype(jnp.float32)
    # tanh-GELU on the fp32 tile (matches jax.nn.gelu(approximate=True))
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))

    habs = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    if kind == "int8":
        hs = jnp.maximum(habs, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        p = jax.lax.dot_general(hq, w2_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        hs = jnp.maximum(habs, 1e-8) * (1.0 / 448.0)
        hq = (h / hs).astype(jnp.float8_e4m3fn)
        p = jax.lax.dot_general(hq, w2_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    acc_ref[:] += p * hs

    @pl.when(hb == nh - 1)
    def _():
        y = acc_ref[:] * s2_ref[...].astype(jnp.float32) + b2_ref[...].astype(jnp.float32)
        o_ref[0] = y.astype(out_dtype)


def ffn_w8a8(
    x: jnp.ndarray,
    w0: jnp.ndarray,
    w0_scale: jnp.ndarray,
    b0: Optional[jnp.ndarray],
    w2: jnp.ndarray,
    w2_scale: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    kind: str = "int8",
    bm: int = 512,
    bh: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused quantized FFN: x (..., K) -> gelu(x @ w0^T) @ w2^T -> (..., N).

    w0 (H, K), w2 (N, H) int8/f8e4m3 with per-channel scales (H,) / (N,).
    Requires K % 128 == 0 and H % bh == 0 (an out-of-range hidden block
    would feed garbage into the accumulation); callers fall back to the
    two-kernel path otherwise. The hidden activation is re-quantized
    per-token-per-h-block in-kernel (same granularity class as the
    two-kernel path's per-token-per-k-block scheme)."""
    *lead, K = x.shape
    H = w0.shape[0]
    N = w2.shape[0]
    out_dtype = x.dtype
    if len(lead) == 1:
        B, S = 1, lead[0]
        x3 = x[None]
    else:
        B, S = int(math.prod(lead[:-1])), lead[-1]
        x3 = x.reshape(B, S, K)
    while bh > 128 and H % bh:
        bh //= 2
    if K % 128 or H % bh:
        raise ValueError(f"ffn_w8a8 needs K%128==0 and H%bh==0, got K={K} H={H} bh={bh}")
    bm = min(bm, max(8, 1 << (S - 1).bit_length()))
    qdt = jnp.int8 if kind == "int8" else jnp.float8_e4m3fn
    b0a = (b0 if b0 is not None else jnp.zeros((H,), jnp.float32)).astype(jnp.float32)
    b2a = (b2 if b2 is not None else jnp.zeros((N,), jnp.float32)).astype(jnp.float32)

    grid = (B, -(-S // bm), H // bh)
    out = pl.pallas_call(
        functools.partial(_ffn_w8a8_kernel, nh=grid[2], kind=kind, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, K), lambda bb, i, hb: (bb, i, 0)),
            pl.BlockSpec((bh, K), lambda bb, i, hb: (hb, 0)),
            pl.BlockSpec((1, bh), lambda bb, i, hb: (0, hb)),
            pl.BlockSpec((1, bh), lambda bb, i, hb: (0, hb)),
            pl.BlockSpec((N, bh), lambda bb, i, hb: (0, hb)),
            pl.BlockSpec((1, N), lambda bb, i, hb: (0, 0)),
            pl.BlockSpec((1, N), lambda bb, i, hb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, N), lambda bb, i, hb: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, N), jnp.float32),
            pltpu.VMEM((bm, K), qdt),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # full-K x tile + (bm, N) accumulator exceed the 16 MB scoped
            # default; ~47 MB at bm=512 on a 128 MB-VMEM v5e
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * H * (K + N),
            bytes_accessed=2 * B * S * K + H * K + N * H + 2 * B * S * N,
            transcendentals=B * S * H,
        ),
        interpret=interpret,
    )(x3, w0, w0_scale.reshape(1, -1).astype(jnp.float32), b0a.reshape(1, -1),
      w2, w2_scale.reshape(1, -1).astype(jnp.float32), b2a.reshape(1, -1))
    return out.reshape(*lead, N)


def _unpack_nibbles(wp_i32, axis: int = 1):
    """(rows, cols) uint8-widened-to-i32 -> (rows, 2*cols) int8 along axis.
    Packing layout per group: low nibbles = first half, high = second
    (int4_matmul.quantize_int4)."""
    lo = (wp_i32 & 15) - 8
    hi = (wp_i32 >> 4) - 8
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.int8)


def _ffn_w4a8_kernel(x_ref, w0_ref, s0_ref, b0_ref, w2_ref, s2_ref, b2_ref,
                     o_ref, acc_ref, xq_ref, xs_ref, *, nh, g0, group, out_dtype):
    """Whole FFN with int4 (nibble-packed) weights on the int8 MXU.

    Same structure as _ffn_w8a8_kernel, but both GEMMs unpack nibbles
    in-kernel and the FIRST GEMM contracts full K as a sum of g0
    per-group partials, each rescaled by its per-(token, group) act scale
    and per-(channel, group) weight scale — a single output-side rescale
    would be wrong because int4 scales vary along the contraction.
    The k-block of the second GEMM equals the quant group, so its scale
    column applies exactly per grid step (as in _w4a8_kernel)."""
    hb = pl.program_id(2)

    @pl.when(hb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[0].astype(jnp.float32).reshape(x_ref.shape[1], g0, group)
        absmax = jnp.max(jnp.abs(x), axis=2, keepdims=True)  # (bm, g0, 1)
        s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(x / s), -127, 127)
        xq_ref[:] = q.reshape(xq_ref.shape).astype(jnp.int8)
        # full-width store (partial lane stores don't lower reliably)
        pad_w = xs_ref.shape[1] - g0
        xs_ref[:] = jnp.concatenate(
            [s[:, :, 0], jnp.zeros((s.shape[0], pad_w), jnp.float32)], axis=1)

    # ---- GEMM 1: h_blk = sum_g (xq_g @ w0_g^T) * xs_g * w0s_g ----
    h = jnp.zeros((xq_ref.shape[0], w0_ref.shape[0]), jnp.float32)
    for g in range(g0):
        wp = w0_ref[:, g * (group // 2):(g + 1) * (group // 2)].astype(jnp.int32)
        w8 = _unpack_nibbles(wp)  # (bh, group)
        part = jax.lax.dot_general(
            xq_ref[:, g * group:(g + 1) * group], w8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        h = h + part * xs_ref[:, g:g + 1] * s0_ref[0][:, g][None, :]
    h = h + b0_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))

    # ---- requantize + GEMM 2 over this h-group ----
    habs = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    hs = jnp.maximum(habs, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    w2 = _unpack_nibbles(w2_ref[...].astype(jnp.int32))  # (N, bh)
    p = jax.lax.dot_general(hq, w2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32).astype(jnp.float32)
    acc_ref[:] += p * hs * s2_ref[0]

    @pl.when(hb == nh - 1)
    def _():
        o_ref[0] = (acc_ref[:] + b2_ref[...].astype(jnp.float32)).astype(out_dtype)


def ffn_w4a8(
    x: jnp.ndarray,
    w0: jnp.ndarray,
    w0_scale: jnp.ndarray,
    b0: Optional[jnp.ndarray],
    w2: jnp.ndarray,
    w2_scale: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    bm: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused FFN for int4 checkpoints: x (..., K) -> (..., N).

    w0 (H, K//2) / w2 (N, H//2) nibble-packed uint8 with per-(channel,
    group) scales (H, K//group) / (N, H//group); the hidden block size is
    w2's quant group. Activations int8-quantize per-(token, group)
    in-kernel (the w4a8 contract, ops/linear._mm_int4_a8)."""
    *lead, K = x.shape
    H = w0.shape[0]
    N = w2.shape[0]
    g0 = w0_scale.shape[1]
    group = K // g0
    bh = H // w2_scale.shape[1]  # w2 quant group == hidden block
    out_dtype = x.dtype
    if len(lead) == 1:
        B, S = 1, lead[0]
        x3 = x[None]
    else:
        B, S = int(math.prod(lead[:-1])), lead[-1]
        x3 = x.reshape(B, S, K)
    if K % group or H % bh or g0 > 128:
        raise ValueError(f"ffn_w4a8 shape mismatch K={K} H={H} group={group} bh={bh}")
    bm = min(bm, max(8, 1 << (S - 1).bit_length()))
    b0a = (b0 if b0 is not None else jnp.zeros((H,), jnp.float32)).astype(jnp.float32)
    b2a = (b2 if b2 is not None else jnp.zeros((N,), jnp.float32)).astype(jnp.float32)

    grid = (B, -(-S // bm), H // bh)
    out = pl.pallas_call(
        functools.partial(_ffn_w4a8_kernel, nh=grid[2], g0=g0, group=group,
                          out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, K), lambda bb, i, hb: (bb, i, 0)),
            pl.BlockSpec((bh, K // 2), lambda bb, i, hb: (hb, 0)),
            pl.BlockSpec((1, bh, g0), lambda bb, i, hb: (0, hb, 0)),
            pl.BlockSpec((1, bh), lambda bb, i, hb: (0, hb)),
            pl.BlockSpec((N, bh // 2), lambda bb, i, hb: (0, hb)),
            pl.BlockSpec((1, 1, N), lambda bb, i, hb: (hb, 0, 0)),
            pl.BlockSpec((1, N), lambda bb, i, hb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, N), lambda bb, i, hb: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, N), jnp.float32),
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * H * (K + N),
            bytes_accessed=2 * B * S * K + (H * K + N * H) // 2 + 2 * B * S * N,
            transcendentals=B * S * H,
        ),
        interpret=interpret,
    )(x3, w0, w0_scale.reshape(1, H, g0).astype(jnp.float32), b0a.reshape(1, -1),
      w2, w2_scale.T.reshape(-1, 1, N).astype(jnp.float32), b2a.reshape(1, -1))
    return out.reshape(*lead, N)


def _w4a8_fullk_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref,
                       *, g0, group, out_dtype, act=None):
    """Full-K w4a8: per-(token, group) int8 act quant ONCE into scratch at
    j==0, then per n-block one pass over the g0 weight groups with
    per-group rescaled partials (scales vary along K, so a single
    output-side rescale would be wrong — same structure as
    _ffn_w4a8_kernel's first GEMM). Replaces the (B, S/bm, N/bn, G) grid
    whose every step re-quantized its x slice."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        x = x_ref[0].astype(jnp.float32).reshape(x_ref.shape[1], g0, group)
        absmax = jnp.max(jnp.abs(x), axis=2, keepdims=True)
        s = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(x / s), -127, 127)
        xq_ref[:] = q.reshape(xq_ref.shape).astype(jnp.int8)
        pad_w = xs_ref.shape[1] - g0
        xs_ref[:] = jnp.concatenate(
            [s[:, :, 0], jnp.zeros((s.shape[0], pad_w), jnp.float32)], axis=1)

    y = jnp.zeros((xq_ref.shape[0], w_ref.shape[0]), jnp.float32)
    for g in range(g0):
        wp = w_ref[:, g * (group // 2):(g + 1) * (group // 2)].astype(jnp.int32)
        w8 = _unpack_nibbles(wp)  # (bn, group)
        part = jax.lax.dot_general(
            xq_ref[:, g * group:(g + 1) * group], w8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        y = y + part * xs_ref[:, g:g + 1] * ws_ref[0][:, g][None, :]
    y = y + b_ref[...].astype(jnp.float32)
    if act == "gelu":
        y = 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y)))
    o_ref[0] = y.astype(out_dtype)


def _w4a8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, acc_ref, *, nk, half, out_dtype, act=None):
    """int4-weight x int8-activation: nibbles unpack to int8 IN-KERNEL and
    the dot runs on the int8 MXU path (2x bf16 throughput) — the
    weight-only int4 kernel's bf16 dequant+dot measured 53% slower than
    int8 at 14B. The k-block size equals the quantization group, so the
    per-(channel, group) weight scale applies exactly per grid step."""
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (bm, bk)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)

    # unpack nibbles in int32 (Mosaic has no 8-bit arithmetic); packing
    # layout per group: low nibbles = first half, high = second half
    # (int4_matmul.quantize_int4)
    wp = w_ref[...].astype(jnp.int32)  # (bn, bk//2) uint8 widened
    lo = (wp & 15) - 8
    hi = (wp >> 4) - 8
    w8 = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # (bn, bk)

    s = jax.lax.dot_general(q, w8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    # xs: (bm, 1) act scale; ws: (1, bn) weight scale for THIS k group
    # (scales ship as (G, 1, N) so the block's trailing dims are lane-legal)
    acc_ref[:] += s.astype(jnp.float32) * xs * ws_ref[0]

    @pl.when(kb == nk - 1)
    def _():
        y = acc_ref[:] + b_ref[...].astype(jnp.float32)
        if act == "gelu":
            y = 0.5 * y * (1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y)))
        o_ref[0] = y.astype(out_dtype)


def w4a8_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    bm: int = DEFAULT_BM,
    bn: int = DEFAULT_BN,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., K) float -> (..., N). packed (N, K//2) uint8 nibbles,
    w_scale (N, K//group) f32 per-(channel, group) scales. Activations are
    int8-quantized per-token-per-group in-kernel (finer than the
    W-int4-A-bf16 contract — documented divergence: this is the
    A-int8 alias's semantics, not the weight-only path's)."""
    *lead, K = x.shape
    N = packed.shape[0]
    groups = w_scale.shape[1]
    bk = K // groups  # k block == quant group (512/256/128 by construction)
    out_dtype = x.dtype
    if len(lead) == 1:
        B, S = 1, lead[0]
        x3 = x[None]
    else:
        B, S = int(math.prod(lead[:-1])), lead[-1]
        x3 = x.reshape(B, S, K)
    bm = min(bm, max(8, 1 << (S - 1).bit_length()))
    bn = min(bn, max(128, 1 << (N - 1).bit_length()))
    b = bias.astype(jnp.float32) if bias is not None else jnp.zeros((N,), jnp.float32)

    # LIGHTX2V_W4A8_BLOCKED=1 forces the k-blocked grid even at small K.
    # Round-5 sweep (BENCHLOG_r05 kernel decomposition): the blocked path
    # pipelines its small (bm,bk)x(bk,bn) dots at ~93% of the int8 MXU
    # peak (K=13824 row) while the full-K path sits at ~33% on the
    # K=5120 qkvo shape — the 10-iteration in-kernel group loop with a
    # (bm,K) x tile stalls the pipeline where the 4D grid does not.
    force_blocked = os.environ.get("LIGHTX2V_W4A8_BLOCKED") == "1"
    if K <= 8192 and groups <= 128 and not force_blocked:
        # full-K form: quantize once per s-block (see _w4a8_fullk_kernel)
        grid = (B, -(-S // bm), -(-N // bn))
        out = pl.pallas_call(
            functools.partial(_w4a8_fullk_kernel, g0=groups, group=bk,
                              out_dtype=out_dtype, act=act),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bm, K), lambda bb, i, j: (bb, i, 0)),
                pl.BlockSpec((bn, K // 2), lambda bb, i, j: (j, 0)),
                pl.BlockSpec((1, bn, groups), lambda bb, i, j: (0, j, 0)),
                pl.BlockSpec((1, bn), lambda bb, i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, bm, bn), lambda bb, i, j: (bb, i, j)),
            out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((bm, K), jnp.int8),
                pltpu.VMEM((bm, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * S * N * K,
                bytes_accessed=2 * B * S * K + N * K // 2 + 2 * B * S * N,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x3, packed, w_scale.reshape(1, N, groups).astype(jnp.float32),
          b.reshape(1, -1))
        return out.reshape(*lead, N)

    grid = (B, -(-S // bm), -(-N // bn), groups)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, nk=groups, half=bk // 2,
                          out_dtype=out_dtype, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda bb, i, j, kb: (bb, i, kb)),
            pl.BlockSpec((bn, bk // 2), lambda bb, i, j, kb: (j, kb)),
            pl.BlockSpec((1, 1, bn), lambda bb, i, j, kb: (kb, 0, j)),
            pl.BlockSpec((1, bn), lambda bb, i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda bb, i, j, kb: (bb, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * N * K,
            bytes_accessed=2 * B * S * K + N * K // 2 + 2 * B * S * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, packed, w_scale.T.reshape(groups, 1, N).astype(jnp.float32), b.reshape(1, -1))
    return out.reshape(*lead, N)
