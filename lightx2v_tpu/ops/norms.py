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
    """RMSNorm over the last axis. weight: (dim,) fp32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps)) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


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
