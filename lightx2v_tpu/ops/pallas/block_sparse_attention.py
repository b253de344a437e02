"""Block-sparse flash attention (Pallas TPU) for radial attention.

The (nq, nk) block mask is compressed to per-row column indices + counts,
scalar-prefetched so the K/V BlockSpec index_map fetches ONLY the active
blocks — skipped blocks cost neither DMA nor FLOPs (the reference gets
this from flashinfer's BSR wrapper; here it's PrefetchScalarGridSpec).
Grid: (batch*heads, q_blocks, max_nnz_per_row) with the nnz axis minor and
the online-softmax state in VMEM scratch, as in flash_attention.py.

Execution block sizes are independent of the 128-token mask granularity:
callers coarsen a fine mask (union-pool) to superblocks and run the MXU at
dense-kernel tile sizes (the dense sweep's 2048x1024 hits 132 TFLOP/s on
v5e vs ~25 at 128x128) — see ops/radial.py / ops/sparge.py. Padding rows
beyond each row's count repeat the last active block index, so the
pipeline's revisit of an unchanged index costs no DMA and the compute is
skipped by the ``j < cnt`` guard.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


LOG2E = 1.4426950408889634


def _bs_body(kvlen_ref, blk_id, active, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nnz):
    """Shared online-softmax body, VPU-lean (see flash_attention):
    scale*log2e folds into the q tile (softmax in exp2 domain) and the
    key-validity mask runs ONLY on steps whose selected block straddles
    the padded tail — ``blk_id`` is scalar-prefetched, so the boundary
    test is a scalar `pl.when`, not a per-element where.

    Invariant: the j=0 selected block must contain at least one valid key
    (guaranteed by diagonal inclusion), else m stays -inf and p NaNs."""
    j = pl.program_id(2)
    bk = k_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def update(masked: bool):
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + blk_id * bk
            s = s + jnp.where(col < kvlen_ref[0], 0.0, -jnp.inf).astype(jnp.float32)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    straddles = (blk_id + 1) * bk > kvlen_ref[0]

    @pl.when(active & jnp.logical_not(straddles))
    def _():
        update(False)

    @pl.when(active & straddles)
    def _():
        update(True)

    @pl.when(j == nnz - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, 0:1], 1e-30)).astype(o_ref.dtype)


def _bs_kernel(kvlen_ref, idx_ref, cnt_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nnz):
    i = pl.program_id(1)
    j = pl.program_id(2)
    _bs_body(kvlen_ref, idx_ref[i, j], j < cnt_ref[i], q_ref, k_ref, v_ref,
             o_ref, m_ref, l_ref, acc_ref, scale=scale, nnz=nnz)


def _bs_kernel_per_head(kvlen_ref, idx_ref, cnt_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nnz):
    """Indices/counts carry a leading batch*heads axis (per-head sparsity
    patterns, e.g. sparge selection)."""
    bb = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    _bs_body(kvlen_ref, idx_ref[bb, i, j], j < cnt_ref[bb, i], q_ref, k_ref, v_ref,
             o_ref, m_ref, l_ref, acc_ref, scale=scale, nnz=nnz)


def _bs_per_head_call(qf, kf, vf, idx, cnt, sk, bq, bk, nq, nnz, scale, interpret):
    """One pallas_call over a chunk of the batch*heads axis (padded inputs)."""
    bn = qf.shape[0]
    d = qf.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bn, nq, nnz),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i, j, kvl, ix, ct: (bb, i, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j, kvl, ix, ct: (bb, ix[bb, i, j], 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j, kvl, ix, ct: (bb, ix[bb, i, j], 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i, j, kvl, ix, ct: (bb, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bs_kernel_per_head, scale=scale, nnz=nnz),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(sk, jnp.int32).reshape(1), idx.astype(jnp.int32),
      cnt.astype(jnp.int32), qf, kf, vf)


def block_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    indices: jnp.ndarray,  # (nq, max_nnz) or (B*N, nq, max_nnz) int32 block ids
    counts: jnp.ndarray,   # (nq,) or (B*N, nq) int32
    interpret: bool = False,
    bq: int = BLOCK,
    bk: int = BLOCK,
) -> jnp.ndarray:
    """``indices``/``counts`` are at (bq query tokens x bk key tokens)
    granularity — row i covers q tokens [i*bq, (i+1)*bq), entry j names a
    bk-token key block."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    bq = min(bq, max(128, 1 << (sq - 1).bit_length()))
    bk = min(bk, max(128, 1 << (sk - 1).bit_length()))

    pq = (-sq) % bq
    pk = (-sk) % bk
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    if pq:
        qf = jnp.pad(qf, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kf = jnp.pad(kf, ((0, 0), (0, pk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pk), (0, 0)))
    nq = qf.shape[1] // bq
    nnz = indices.shape[-1]
    per_head = indices.ndim == 3
    assert indices.shape[-2] >= nq, f"mask rows {indices.shape[-2]} < {nq}"
    if per_head:
        assert indices.shape[0] == b * n and counts.ndim == 2
        # scalar-prefetch operands live in SMEM (~1 MB); chunk the
        # batch*heads axis so each call's index table fits
        idx_bytes = indices.shape[1] * nnz * 4
        chunk = max(1, min(b * n, (512 * 1024) // max(idx_bytes, 1)))
        if chunk < b * n:
            outs = []
            for s0 in range(0, b * n, chunk):
                s1 = min(s0 + chunk, b * n)
                o = _bs_per_head_call(
                    qf[s0:s1], kf[s0:s1], vf[s0:s1], indices[s0:s1], counts[s0:s1],
                    sk, bq, bk, nq, nnz, scale, interpret)
                outs.append(o)
            out = jnp.concatenate(outs, axis=0)
            if pq:
                out = out[:, :sq]
            return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3)
        kv_map = lambda bb, i, j, kvl, idx, cnt: (bb, idx[bb, i, j], 0)
        kernel = functools.partial(_bs_kernel_per_head, scale=scale, nnz=nnz)
    else:
        kv_map = lambda bb, i, j, kvl, idx, cnt: (bb, idx[i, j], 0)
        kernel = functools.partial(_bs_kernel, scale=scale, nnz=nnz)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * n, nq, nnz),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i, j, kvl, idx, cnt: (bb, i, 0)),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bk, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i, j, kvl, idx, cnt: (bb, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(sk, jnp.int32).reshape(1), indices.astype(jnp.int32),
      counts.astype(jnp.int32), qf, kf, vf)
    if pq:
        out = out[:, :sq]
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3)
