"""SageAttention-style INT8-QK flash attention (Pallas TPU).

The reference dispatches to the SageAttention2 CUDA kernel
(lightx2v/common/ops/attn/attn_weight.py sage_attn2): Q/K are quantized to
int8 so the big S x S logits matmul runs on the int8 tensor cores; softmax
and P @ V stay high precision. On TPU the int8 MXU path has 2x the bf16
throughput, and at video sequence lengths (32k+) QK^T is ~half the
attention FLOPs — worth ~1.5x on the attention-dominated 480P workload.

Structure matches ops/pallas/flash_attention.py (kv-minor grid, online
softmax in VMEM scratch). Q/K are quantized per token-row IN-KERNEL —
head_dim (128) fits one tile, so per-row scales are exact, no fp32/int8
copies of q/k ever hit HBM (the earlier host-side quantize materialized
~640 MB fp32 temps at 14B shapes), and the kernel reads bf16 q/k
directly.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e sweep @32k, 12 heads, q-quant cached in scratch: (4096,2048)
# 142.1 TFLOP/s, (1024,1024) 142.0, (2048,2048) 137.7. Dense flash
# reaches 150.3 at the same shape: the per-tile qs*ks logit rescale (two
# broadcast muls over (bq, bk)) outweighs the int8-QK MXU saving at
# d=128, so sage on TPU is a numerics/compat option, not a speed win
# (unlike CUDA tensor cores, where the int8 path doubles throughput).
DEFAULT_BQ = 4096
DEFAULT_BK = 2048


LOG2E = 1.4426950408889634


def _sage_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref, qq_ref, qs_ref, *, scale, bk, nk,
                 mask_mode="all", kvlen_static=None):
    """VPU-lean form (see flash_attention._flash_body): scale*log2e folds
    into the per-row q scale so softmax runs in the exp2 domain; the kv
    mask is a (1, bk) row bias applied only on boundary blocks when the
    length is static. The k-row scale varies per COLUMN, so one (bq, bk)
    rescale of the int32 logits is irreducible."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def quant_rows(x):
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sc = jnp.maximum(absmax, 1e-6) * (1.0 / 127.0)
        return jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8), sc

    # q is constant over the kv sweep: quantize once into scratch at
    # k_idx==0 (qq int8; its scale rides in the first lane column of qs_ref)
    @pl.when(k_idx == 0)
    def _():
        qi, qsc = quant_rows(q_ref[0])
        qq_ref[:] = qi
        qs_ref[:] = jnp.broadcast_to(qsc, qs_ref.shape)

    q, qs = qq_ref[:], qs_ref[:, 0:1]
    k, ks = quant_rows(k_ref[0])   # (bk, d) int8, (bk, 1) f32
    v = v_ref[0]   # (bk, d) bf16

    s_i32 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * (qs * (scale * LOG2E)) * ks[:, 0][None, :]

    def update(s):
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def masked(s):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + k_idx * bk
        return s + jnp.where(col < kvlen_ref[0], 0.0, -jnp.inf).astype(jnp.float32)

    if mask_mode in ("none", "phantom"):
        update(s)
    elif mask_mode == "all":
        update(masked(s))
    else:
        boundary = kvlen_static // bk

        @pl.when(k_idx < boundary)
        def _():
            update(s)

        @pl.when(k_idx >= boundary)
        def _():
            update(masked(s))

    npad = (nk * bk - kvlen_static) if mask_mode == "phantom" else 0

    @pl.when(k_idx == nk - 1)
    def _():
        l_fin = l_ref[:, 0:1]
        if npad:
            # zero pad rows quantize to zero int8 keys -> logit 0, value 0
            l_fin = l_fin - npad * jnp.exp2(-m_ref[:, 0:1])
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def sage_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[Union[int, jnp.ndarray]] = None,
    bq: int = DEFAULT_BQ,
    bk: int = DEFAULT_BK,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (B, S, N, D) bf16 -> (B, Sq, N, D)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    kv_len = kv_len if kv_len is not None else sk
    bq = min(bq, max(128, 1 << (sq - 1).bit_length()))
    bk = min(bk, max(128, 1 << (sk - 1).bit_length()))
    scale = 1.0 / math.sqrt(d)

    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d).astype(jnp.bfloat16)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d).astype(jnp.bfloat16)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d).astype(jnp.bfloat16)

    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        qf = jnp.pad(qf, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kf = jnp.pad(kf, ((0, 0), (0, pk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pk), (0, 0)))
    nq = qf.shape[1] // bq
    nk = kf.shape[1] // bk

    from .flash_attention import _mask_mode_for

    mask_mode, kvlen_static = _mask_mode_for(kv_len, sk, kf.shape[1], bk)
    kvlen_arr = jnp.asarray(kv_len, jnp.int32).reshape(1)
    kernel = functools.partial(_sage_kernel, scale=scale, bk=bk, nk=nk,
                               mask_mode=mask_mode, kvlen_static=kvlen_static)
    out = pl.pallas_call(
        kernel,
        grid=(b * n, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, qf.shape[1], d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, d), jnp.int8),      # cached quantized q
            pltpu.VMEM((bq, 128), jnp.float32),  # cached q row scales
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * sq * sk * d,
            bytes_accessed=b * n * (sq * d + 2 * sk * d) * 2,
            transcendentals=b * n * sq * sk,
        ),
        interpret=interpret,
    )(kvlen_arr, qf, kf, vf)
    if pq:
        out = out[:, :sq]
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)
