"""Weight-only int4 matmul (Pallas TPU) with per-(channel, k-block) scales.

TPU analog of the reference's nvfp4/mxfp6 CUDA GEMMs
(lightx2v_kernel/csrc/gemm/nvfp4_scaled_mm_kernels_sm120.cu and the
block-scaled quant kernels): 4-bit weights with block scales, bf16
activations, bf16 out. On TPU there is no 4-bit MXU datapath, so the win
is HBM: weights stream at 4 bits and are dequantized in VMEM right before
the bf16 MXU dot — a 14B model's DiT weights drop from 28 GB (bf16) to
7 GB and fit a single v5e's 16 GB HBM.

Packing: within each BK-wide k-block, byte j of a row holds the nibbles
of columns j (low) and j + BK/2 (high) — unpacking is a lane-contiguous
``concat([b & 15, b >> 4])``, no interleave shuffles.

Grid: (m_blocks, n_blocks, k_blocks), k minor with an fp32 VMEM
accumulator, mirroring flash_attention.py's scratch pattern.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 512  # quant group size along in-features (scale granularity)
BM = 256
BN = 256


def _pick_bk(kin: int, bk: int = BK) -> int:
    while bk > 128 and kin % bk:
        bk //= 2
    if kin % bk:
        # tiny matrices (test arches, encoder side layers): one group per
        # row — the Pallas kernel never sees these (size-aware dispatch
        # falls back to the jnp path below its threshold)
        bk = kin
    return bk


def quantize_int4(w: np.ndarray, bk: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """w (out, in) fp -> (packed (out, in//2) uint8, scales (out, in//bk) fp32).
    Symmetric int4 in [-7, 7] ((-8 unused, keeps the scale symmetric).
    Group size is the largest of {512, 256, 128} dividing in_features."""
    out, kin = w.shape
    bk = _pick_bk(kin) if bk is None else bk
    wb = w.reshape(out, kin // bk, bk).astype(np.float32)
    scale = np.maximum(np.abs(wb).max(axis=-1), 1e-8) / 7.0  # (out, nk)
    q = np.clip(np.round(wb / scale[..., None]), -7, 7).astype(np.int8)  # (out, nk, bk)
    lo = (q[..., : bk // 2] + 8).astype(np.uint8)
    hi = (q[..., bk // 2 :] + 8).astype(np.uint8)
    packed = (lo | (hi << 4)).reshape(out, kin // 2)
    return packed, scale.astype(np.float32)


def unpack_int4(packed: jnp.ndarray, scale: jnp.ndarray, bk: Optional[int] = None) -> jnp.ndarray:
    """Reference dequant (XLA fallback / tests): -> (out, in) fp32."""
    out, half = packed.shape
    nk = scale.shape[1]
    bk = 2 * half // nk if bk is None else bk
    pb = packed.reshape(out, nk, bk // 2)
    lo = (pb & 15).astype(jnp.int8) - 8
    hi = (pb >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)  # (out, nk, bk)
    return (q * scale[..., None].astype(jnp.float32)).reshape(out, 2 * half)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (bm, bk) bf16
    # nibble math in int32 — Mosaic has no 8-bit arith.subi on TPU
    wi = w_ref[...].astype(jnp.int32)  # (bn, bk//2)
    lo = (wi & 15) - 8
    hi = (wi >> 4) - 8
    w8 = jnp.concatenate([lo, hi], axis=1)  # (bn, bk) int4 values
    p = jax.lax.dot_general(
        x, w8.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bm, bn)
    # the scale is constant within a k-block per out channel, so it can be
    # applied to the (bm, bn) partial product instead of the (bn, bk)
    # dequantized weights; the (nk, bn) scale block rides along whole
    # (Mosaic rejects 1-row blocks of a >1-row array) and row k is
    # selected dynamically
    s_row = s_ref[pl.dslice(k, 1), :]  # (1, bn) dynamic ref load
    acc_ref[:] += p * s_row

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[:].astype(o_ref.dtype)


def int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    bm: int = BM,
    bn: int = BN,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., K) bf16 @ int4-packed w (N, K/2) -> (..., N) in x.dtype.
    The group size is inferred from the scale shape."""
    lead = x.shape[:-1]
    kin = x.shape[-1]
    n = packed.shape[0]
    bk = kin // scale.shape[1] if bk is None else bk
    xf = x.reshape(-1, kin)
    m = xf.shape[0]
    pm = (-m) % bm
    if pm:
        xf = jnp.pad(xf, ((0, pm), (0, 0)))
    pn = (-n) % bn
    wp = packed
    sc = scale.T  # (nk, n): scales as lane-major rows for the kernel
    if pn:
        wp = jnp.pad(wp, ((0, pn), (0, 0)))
        sc = jnp.pad(sc, ((0, 0), (0, pn)))
    nk = kin // bk
    grid = (xf.shape[0] // bm, wp.shape[0] // bn, nk)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk // 2), lambda i, j, k: (j, k)),
            pl.BlockSpec((nk, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], wp.shape[0]), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kin,
            bytes_accessed=2 * m * kin + n * kin // 2 + 2 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf.astype(jnp.bfloat16), wp, sc)
    return out[:m, :n].reshape(*lead, n)


def int4_matmul_xla(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                    bk: Optional[int] = None) -> jnp.ndarray:
    """Portable fallback: dequantize then dense dot (XLA fuses the unpack
    into the dot operand on CPU; on TPU prefer the Pallas path)."""
    wd = unpack_int4(packed, scale, bk).astype(jnp.bfloat16)
    y = jax.lax.dot_general(x.astype(jnp.bfloat16), wd,
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(x.dtype)
