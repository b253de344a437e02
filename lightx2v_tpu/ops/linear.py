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


def _mm_int8(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    q, x_scale = quantize_per_token_int8(x)
    acc = _nt_dot(q, params["w"], jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * params["w_scale"].astype(jnp.float32)
    return _bias_add(y, params.get("b"), x.dtype)


def _mm_fp8(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    q, x_scale = quantize_per_token_fp8(x)
    acc = _nt_dot(q, params["w"], jnp.float32)
    y = acc * x_scale * params["w_scale"].astype(jnp.float32)
    return _bias_add(y, params.get("b"), x.dtype)


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
    "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Deepgemm",
    "W-fp8-block128-sym-A-fp8-channel-group128-sym-dynamic-Deepgemm-ActSgl",
    "W-fp8-channel-sym-A-fp8-channel-sym-dynamic-Tpu",
]:
    MM_REGISTER.register(_alias, _mm_fp8)


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


def resolve_mm(mm_type: str):
    """Resolve an mm_type string to its apply function."""
    return MM_REGISTER[mm_type]


def quant_scheme_of(mm_type: str) -> Optional[str]:
    """Return 'int8' / 'fp8' / None for a given mm_type string."""
    if mm_type in ("Default", "Default-Force-FP32", "Calib", None):
        return None
    parts = mm_type.split("-")
    return parts[1] if len(parts) > 1 else None
