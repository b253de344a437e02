"""Normalization ops (reference: lightx2v/common/ops/norm/*.py).

All norms accumulate in fp32 and cast back to the input dtype, matching
the reference's fp32-sensitive-layer policy. These are deliberately plain
jnp (no Pallas): under jit XLA fuses the normalize/scale/shift chains into
the surrounding elementwise ops, while a standalone Pallas norm kernel
would force a materialization boundary at each call — the reference needs
custom CUDA norm kernels (sgl-kernel), TPU does not.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm over the last axis. weight: (dim,) fp32.

    Statistics in fp32; the scale multiply stays in x's dtype. For bf16
    inputs the result is identical up to bf16 rounding (the output is
    consumed in bf16 by the attention kernels anyway), and it keeps the
    full-size fp32 intermediate out of HBM — at 14B/480P, XLA materialized
    two ~640 MB fp32 layout-copies of the q/k norms between this op and
    the flash kernel's reshape. fp32 inputs keep exact fp32 math."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return x * inv.astype(x.dtype) * weight.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm over the last axis; affine optional (Wan's norm1/norm2 are
    non-affine, norm3 is affine; reference uses eps=1e-6)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    out = centered * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def modulated_layer_norm(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """AdaLN: LayerNorm(x) * (1 + scale) + shift, fp32 internally
    (reference: wan/infer/transformer_infer.py:321-337).

    shift/scale broadcast against x: (..., 1, dim) vs (..., seq, dim).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    return out.astype(x.dtype)
