"""Fused normalization Pallas kernels (SURVEY §2.7: fused RMSNorm /
AdaLN-modulation TPU equivalents of the reference's sgl-kernel fused
RMSNorm, lightx2v/common/ops/norm/rms_norm_weight.py:53-118).

These fuse the normalize + affine/modulation elementwise chain into one
VMEM pass per token block (XLA usually fuses these already; the kernels
pin the fusion and keep the fp32 statistics on-chip). Used opportunistically
on TPU; the jnp versions in ops/norms.py remain the portable path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_TOKENS = 1024


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[...] = (x * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5,
                   interpret: bool = False) -> jnp.ndarray:
    """x (..., S, D), weight (D,)."""
    orig_shape = x.shape
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    s = xf.shape[0]
    bt = min(BLOCK_TOKENS, max(8, 1 << (s - 1).bit_length()))
    pad = (-s) % bt
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(xf.shape[0] // bt,),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bt, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, weight)
    if pad:
        out = out[:s]
    return out.reshape(orig_shape)


def _adaln_kernel(x_ref, shift_ref, scale_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    normed = xc * jax.lax.rsqrt(var + eps)
    out = normed * (1.0 + scale_ref[...].astype(jnp.float32)) + shift_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def fused_adaln(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                eps: float = 1e-6, interpret: bool = False) -> jnp.ndarray:
    """AdaLN: LayerNorm(x)*(1+scale)+shift fused in one pass.
    x (B, S, D); shift/scale (B, 1, D) broadcast per batch row."""
    b, s, d = x.shape
    bt = min(BLOCK_TOKENS, max(8, 1 << (s - 1).bit_length()))
    pad = (-s) % bt
    xf = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    out = pl.pallas_call(
        functools.partial(_adaln_kernel, eps=eps),
        grid=(b, xf.shape[1] // bt),
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, shift, scale)
    return out[:, :s] if pad else out
