"""Matmul ("mm") op table (reference: lightx2v/common/ops/mm/mm_weight.py).

The reference registers weight-op classes per quant scheme
("Default", "Default-Force-FP32", "W-int8-channel-sym-A-int8-...",
"W-fp8-channel-sym-A-fp8-...") that do: dynamic per-token activation
quant -> quantized GEMM -> bf16 out (+bias). Here each scheme is a pure
function ``apply(params, x) -> y`` resolved at model build time via
MM_REGISTER; quantized paths use TPU-native int8/fp8 MXU matmuls
(jnp dot with int8/fp8 inputs lowers onto the MXU) and a Pallas
weight-only int4 kernel with in-VMEM dequant (ops/pallas/int4_matmul.py,
the nvfp4-GEMM analog).

Weight layout: params["w"] keeps the checkpoint's (out_features,
in_features) torch-Linear layout; the GEMM contracts x's last dim with
w's dim 1 (an "NT" gemm). XLA picks the optimal on-device layout for the
MXU either way, and skipping the host-side transpose keeps checkpoint
loading at memcpy speed. Quantized params carry "w_scale" (out,) fp32.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.kernel_dispatch import kernel_fallback
from ..utils.registry import MM_REGISTER


def _bias_add(y: jnp.ndarray, b: Optional[jnp.ndarray], out_dtype) -> jnp.ndarray:
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(out_dtype)


def _nt_dot(x: jnp.ndarray, w: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """x (..., in) @ w (out, in)^T -> (..., out)."""
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=out_dtype
    )


@MM_REGISTER.register("Default")
def mm_default(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """bf16 GEMM, fp32 accumulation on the MXU."""
    y = _nt_dot(x, params["w"].astype(x.dtype), jnp.float32)
    return _bias_add(y, params.get("b"), x.dtype)


@MM_REGISTER.register("Default-Force-FP32")
def mm_fp32(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = _nt_dot(x.astype(jnp.float32), params["w"].astype(jnp.float32), jnp.float32)
    if params.get("b") is not None:
        y = y + params["b"].astype(jnp.float32)
    return y


def quantize_per_token_int8(x: jnp.ndarray):
    """Dynamic symmetric per-token int8 quantization of activations."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_per_token_fp8(x: jnp.ndarray):
    """Dynamic symmetric per-token fp8(e4m3) quantization."""
    fp8_max = 448.0
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / fp8_max
    q = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def _mm_w8a8(params: Dict, x: jnp.ndarray, kind: str, act: Optional[str] = None) -> jnp.ndarray:
    """TPU + large dims: fused Pallas quantize+dot (no fp32 HBM temps —
    the jnp path's three ~640 MB f32 temps are what pushed the 14B int8
    forward OOM on a 16 GB v5e; measured 11.8 s/forward fused). Small
    dims (1.3B's 1536-wide projections) stay on the jnp path — XLA's
    int8 dot wins there (2188 vs 2316 ms/forward measured) and the fp32
    temps are only ~190 MB."""
    n, k = params["w"].shape[-2:]
    if jax.default_backend() == "tpu" and min(n, k) >= 4096:
        try:
            if k % 128 == 0 and k <= 8192:
                # full-K form: one quantize per s-block + one dot per
                # n-block (the k-blocked kernel re-quantizes per (n, k)
                # step and measured VPU-bound at ~48 TOPS on 14B qkvo)
                from .pallas.w8a8_matmul import w8a8_matmul_fullk

                return w8a8_matmul_fullk(x, params["w"], params["w_scale"],
                                         params.get("b"), kind=kind, act=act)
            from .pallas.w8a8_matmul import w8a8_matmul

            return w8a8_matmul(x, params["w"], params["w_scale"], params.get("b"),
                               kind=kind, act=act)
        except Exception as e:
            kernel_fallback("w8a8_matmul", e)
    if kind == "int8":
        q, x_scale = quantize_per_token_int8(x)
        acc = _nt_dot(q, params["w"], jnp.int32)
        y = acc.astype(jnp.float32) * x_scale * params["w_scale"].astype(jnp.float32)
    else:
        q, x_scale = quantize_per_token_fp8(x)
        acc = _nt_dot(q, params["w"], jnp.float32)
        y = acc * x_scale * params["w_scale"].astype(jnp.float32)
    if act == "gelu":
        if params.get("b") is not None:
            y = y + params["b"].astype(jnp.float32)
        return jax.nn.gelu(y, approximate=True).astype(x.dtype)
    return _bias_add(y, params.get("b"), x.dtype)


def mm_ffn(mm_fn, p0: Dict, p2: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Whole FFN (mm -> gelu -> mm) with one fused Pallas kernel on the
    quantized TPU path. The two-kernel route writes the (S, H) gelu'd
    intermediate to HBM and re-reads it N/bn times in the second GEMM
    (~9.5 GB/block extra traffic at 14B/480P); the fused kernel keeps the
    hidden tile in VMEM (ops/pallas/w8a8_matmul.ffn_w8a8). Falls back to
    mm_gelu + mm for non-w8a8 types, small dims, or non-dividing shapes."""
    n, k = p0["w"].shape[-2:]
    kind = "int8" if mm_fn is _mm_int8 else "fp8" if mm_fn is _mm_fp8 else None
    # unlike the single-matmul w8a8 (where XLA's int8 dot wins below
    # 4096-wide), the fused FFN's no-HBM-intermediate advantage already
    # pays at 1.3B dims: 33.9 vs 37.4 ms/FFN measured at (1536, 8960)
    if kind and jax.default_backend() == "tpu" and min(n, k) >= 1024:
        try:
            from .pallas.w8a8_matmul import ffn_w8a8

            return ffn_w8a8(x, p0["w"], p0["w_scale"], p0.get("b"),
                            p2["w"], p2["w_scale"], p2.get("b"), kind=kind)
        except Exception as e:
            kernel_fallback("ffn_w8a8", e)
    if (mm_fn is _mm_int4_a8 and jax.default_backend() == "tpu"
            and p0["w_scale"].ndim == 2 and min(n, k) >= 2048):
        try:
            from .pallas.w8a8_matmul import ffn_w4a8

            return ffn_w4a8(x, p0["w"], p0["w_scale"], p0.get("b"),
                            p2["w"], p2["w_scale"], p2.get("b"))
        except Exception as e:
            kernel_fallback("ffn_w4a8", e)
    h = mm_gelu(mm_fn, p0, x)
    return mm_fn(p2, h)


def mm_gelu(mm_fn, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """matmul + GELU for the FFN's first projection. On the Pallas w8a8
    path the activation is applied to the fp32 accumulator in-kernel —
    the 14B FFN's 864 MB intermediate otherwise costs a full HBM
    round-trip AND a second live buffer (the final ~160 MB of a 16 GB
    v5e OOM). Other mm types fall back to mm -> jnp gelu (XLA fuses)."""
    if mm_fn is _mm_int8:
        return _mm_w8a8(params, x, "int8", act="gelu")
    if mm_fn is _mm_fp8:
        return _mm_w8a8(params, x, "fp8", act="gelu")
    h = mm_fn(params, x)
    return jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)


def _mm_int8(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return _mm_w8a8(params, x, "int8")


def _mm_fp8(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return _mm_w8a8(params, x, "fp8")


def quantize_per_token_group_fp8(x: jnp.ndarray, group: int = 128):
    """Dynamic per-token-per-group(k) fp8 act quant (reference Deepgemm act
    path, mm_weight.py act_quant_fp8_perchannelgroup128_sym_*). Returns
    q (..., in) fp8 and scales (..., in/group) fp32."""
    g = x.shape[-1] // group
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, group)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 448.0
    q = (xf / scale).astype(jnp.float8_e4m3fn).reshape(x.shape)
    return q, scale[..., 0]


def _mm_fp8_block128(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """True Deepgemm block-scale semantics (reference mm_weight.py:418-494):
    weight fp8 with (out/128, in/128) block scales, activations fp8 with
    per-token-per-group(128) scales; partial products are rescaled per
    k-group before accumulation (a plain output-side rescale would be
    wrong — the scale varies along the contraction).

    Also serves the mxfp8 aliases (reference lightx2v_kernel
    mxfp8_*.cu: block-32 e8m0 scales): an mx checkpoint carries
    per-(channel, in/32) scales — detected by ws rows == out_features —
    and the activation group follows the weight group (32).

    A checkpoint quantized per-channel (1D scale) routed to a Deepgemm
    mm_type degrades to the per-channel kernel (same numerics class)."""
    ws = params["w_scale"]
    if ws.ndim == 1:  # per-channel ckpt under a block-128 alias
        return _mm_fp8(params, x)
    w = params["w"]  # (out, in) fp8
    out_f, in_f = w.shape
    if ws.shape[0] == out_f:
        # mx layout: per-(channel, k-group) scales; converter asserts
        # in % group == 0, so the division is exact
        group = in_f // ws.shape[1]
        ws_full = ws.astype(jnp.float32)  # (out, G)
    else:
        # Deepgemm layout: the group is 128 BY DEFINITION (the converter
        # quantizes on 128-column boundaries then truncates the pad, so
        # inferring group = in // n_cols is wrong whenever in % 128 != 0
        # — e.g. in=200 would rescale columns 100..127 with block 0's
        # scales). Zero-pad x and w to the block grid instead: zero
        # columns contribute nothing to the dot.
        group = 128
        pad = (-in_f) % group
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            w = jnp.pad(w, ((0, 0), (0, pad)))
            in_f += pad
        # 128-row blocks -> expand to per-(out, group)
        ws_full = jnp.repeat(ws.astype(jnp.float32), 128, axis=0)[:out_f]  # (out, G)
    q, x_scale = quantize_per_token_group_fp8(x, group)  # (..., in), (..., G)
    g = in_f // group

    # scan over k-groups with the group axis leading (no dynamic gathers)
    qg = jnp.moveaxis(q.reshape(*q.shape[:-1], g, group), -2, 0)  # (g, ..., group)
    wg = jnp.moveaxis(w.reshape(out_f, g, group), 1, 0)  # (g, out, group)
    sg = jnp.moveaxis(x_scale, -1, 0)  # (g, ...)
    wsg = ws_full.T  # (g, out)

    def body(acc, inp):
        qi, wi, si, wsi = inp
        part = jax.lax.dot_general(
            qi, wi, (((qi.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (..., out)
        return acc + part * (si[..., None] * wsi), None

    acc0 = jnp.zeros((*q.shape[:-1], out_f), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (qg, wg, sg, wsg))
    return _bias_add(acc, params.get("b"), x.dtype)


# Register the quant schemes under every backend alias the reference accepts
# (the backend suffix — Vllm/Sgl/Q8F/Deepgemm — picks a CUDA library there;
# on TPU they all hit the same MXU path).
for _alias in [
    "W-int8-channel-sym-A-int8-channel-sym-dynamic-Vllm",
    "W-int8-channel-sym-A-int8-channel-sym-dynamic-Q8F",
    "W-int8-channel-sym-A-int8-channel-sym-dynamic-Sgl-ActVllm",
    "W-int8-channel-sym-A-int8-channel-sym-dynamic-Tpu",
]:
    MM_REGISTER.register(_alias, _mm_int8)

for _alias in [
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Vllm",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Q8F",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Vllm-ActSgl",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Sgl-ActVllm",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Sgl",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Tpu",
]:
    MM_REGISTER.register(_alias, _mm_fp8)

for _alias in [
    "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Deepgemm",
    "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Deepgemm-ActSgl",
    "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Tpu",
    # mx-format fp8: same group-rescaled accumulation, block-32 pow2 scales
    # (reference lightx2v_kernel cutlass_scaled_mxfp8_mm_sm120)
    "W-mxfp8-A-mxfp8-dynamic-Tpu",
    "W-fp8-block128-A-fp8-block128-dynamic-Tpu",
]:
    MM_REGISTER.register(_alias, _mm_fp8_block128)


def unpack_fp6_e2m3(packed: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Unpack 3n/4-byte fp6(e2m3) rows to f32 (reference lightx2v_kernel
    mxfp6 packing: 4 six-bit codes per 3 bytes, little-endian bit order).

    Decode is pure integer/VPU math (TPU has no fp6 dtype): code
    s|ee|mmm -> (-1)^s * (e==0 ? m/8 : (1+m/8)*2^(e-1))."""
    rows = packed.shape[0]
    trip = packed.reshape(rows, -1, 3).astype(jnp.int32)
    bits = trip[..., 0] | (trip[..., 1] << 8) | (trip[..., 2] << 16)
    codes = jnp.stack([(bits >> (6 * i)) & 63 for i in range(4)], axis=-1)
    codes = codes.reshape(rows, n_cols)
    sign = jnp.where(codes & 32 != 0, -1.0, 1.0)
    e = (codes >> 3) & 3
    m = (codes & 7).astype(jnp.float32)
    mag = jnp.where(e == 0, m * 0.125, (1.0 + m * 0.125) * jnp.exp2((e - 1).astype(jnp.float32)))
    return sign * mag


def _mm_mxfp6(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """mxfp6-weight matmul (reference cutlass_scaled_mxfp6_mxfp8_mm_sm120):
    weights stored as packed fp6(e2m3) at 6 bits/value (+ block-32 pow2
    scales) for the capacity win; compute dequantizes to bf16 and runs the
    MXU bf16 path — the TPU MXU has no fp6 feed, so the mx-hardware act
    path has no equivalent and weight-only semantics are the honest
    analog (strictly MORE accurate on the activation side)."""
    w = params["w"]  # (out, 3*in/4) uint8 packed
    ws = params["w_scale"]  # (out, in/32) f32 pow2
    out_f = w.shape[0]
    in_f = x.shape[-1]
    wf = unpack_fp6_e2m3(w, in_f)
    wf = wf.reshape(out_f, ws.shape[1], -1) * ws.astype(jnp.float32)[:, :, None]
    y = _nt_dot(x, wf.reshape(out_f, in_f).astype(x.dtype), jnp.float32)
    return _bias_add(y, params.get("b"), x.dtype)


for _alias in ["W-mxfp6-A-mxfp8-dynamic-Tpu", "W-mxfp6-A-bf16-Tpu"]:
    MM_REGISTER.register(_alias, _mm_mxfp6)


def _mm_int4(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Weight-only int4 (per-channel-per-group scales), bf16 activations.
    TPU analog of the reference's nvfp4 GEMM path (lightx2v_kernel)."""
    if jax.default_backend() == "tpu":
        try:
            from .pallas.int4_matmul import int4_matmul

            y = int4_matmul(x, params["w"], params["w_scale"])
            return _bias_add(y.astype(jnp.float32), params.get("b"), x.dtype)
        except Exception as e:
            kernel_fallback("int4_matmul", e)
    from .pallas.int4_matmul import int4_matmul_xla

    y = int4_matmul_xla(x, params["w"], params["w_scale"])
    return _bias_add(y.astype(jnp.float32), params.get("b"), x.dtype)


for _alias in [
    "W-int4-group-sym-A-bf16-Tpu",
    "W-int4-group128-sym-A-bf16",
    "W-nvfp4-A-bf16-Tpu",  # reference fp4 configs map onto the int4 path
]:
    MM_REGISTER.register(_alias, _mm_int4)


def _mm_int4_a8(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """int4 weights x dynamic per-token-per-group int8 activations.

    Same checkpoints as the weight-only path (nibble-packed ``w`` +
    per-(channel, group) scales) but the dot runs on the int8 MXU path:
    nibbles unpack to int8 in-kernel and activations quantize to int8 per
    k-group (the nvfp4-GEMM w4a4 analog — reference lightx2v_kernel
    quantizes activations to fp4 there; int8 acts are strictly finer).
    Weight-only bf16 dequant measured 18.0 s per 14B forward vs 11.8 s
    for int8 — this path trades ~0.4% extra activation-quant noise for
    the int8 MXU rate at half the int8 footprint."""
    if jax.default_backend() == "tpu":
        try:
            from .pallas.w8a8_matmul import w4a8_matmul

            return w4a8_matmul(x, params["w"], params["w_scale"], params.get("b"))
        except Exception as e:
            kernel_fallback("w4a8_matmul", e)
    # non-TPU fallback: weight-only semantics (upper numerics bound)
    from .pallas.int4_matmul import int4_matmul_xla

    y = int4_matmul_xla(x, params["w"], params["w_scale"])
    return _bias_add(y.astype(jnp.float32), params.get("b"), x.dtype)


for _alias in [
    "W-int4-group-sym-A-int8-token-dynamic-Tpu",
    "W-nvfp4-A-nvfp4-dynamic-Tpu",  # reference w4a4 GEMM analog
]:
    MM_REGISTER.register(_alias, _mm_int4_a8)


def resolve_mm(mm_type: str):
    """Resolve an mm_type string to its apply function."""
    return MM_REGISTER[mm_type]


def quant_scheme_of(mm_type: str) -> Optional[str]:
    """Return 'int8' / 'fp8' / None for a given mm_type string."""
    if mm_type in ("Default", "Default-Force-FP32", "Calib", None):
        return None
    parts = mm_type.split("-")
    return parts[1] if len(parts) > 1 else None
