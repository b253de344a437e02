"""Flash attention Pallas TPU kernel.

Replaces the reference's external flash-attn 2/3 CUDA kernels
(lightx2v/common/ops/attn/attn_weight.py:71-186) for the DiT's bidirectional
video attention (no causal mask; optional key-length mask for padded
sequences — Wan pads text context, Hunyuan concatenates img+txt tokens
with a per-prompt valid length).

Design: grid (batch*heads, q_blocks, kv_blocks) with the kv axis minor —
TPU grid iterations are sequential, so the (m, l, acc) online-softmax
state lives in VMEM scratch across the kv sweep and the output block is
written once on the last kv step. The key-length bound is a dynamic SMEM
scalar, so prompts of any length reuse one compiled kernel.
Logits/statistics in fp32 on the MXU, p@v accumulated in fp32, inputs bf16.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block-size sweep on v5e @ 32k tokens (loop-amortized, unmasked/phantom):
# (4096,2048) 153.2 TFLOP/s, (2048,2048) 152.4, (2048,4096) 150.3,
# (4096,1024) 140.3, (2048,1024) 136.0 — the >16M-VMEM configs unlocked
# by the per-kernel vmem_limit_bytes raise; round-1 best was 132.3
DEFAULT_BQ = 4096
DEFAULT_BK = 2048

# Measured tile table (scripts/bench/bench_flash_tiles.py on v5e, 12 heads
# d=128, bf16): best (bq, bk) per per-device sequence-length bucket. The
# spread is small above 8k (<5%) but bk=2048 wins everywhere >= 8k, bq
# flips from 4096 (8-16k, fewer grid rows) to 2048 (>= 32k): 75.6k runs
# 162.1 TFLOP/s at (2048, 2048) vs 157.6 at the old global (4096, 2048).
# Under sequence parallelism the per-device S lands in the small buckets,
# which the global clamp mis-served (VERDICT r2 #8).
_TILE_TABLE = (
    # (min_seq, bq, bk) — first row whose min_seq <= S wins
    (32768, 2048, 2048),  # 162.1 TF/s @75.6k, 148.3 @32k
    (8192, 4096, 2048),   # 62.7 @8k, 116.8 @16k
    (0, 2048, 1024),      # 21.3 @4k (launch-bound; spread ~10%)
)


def _auto_blocks(sq: int, sk: int, bq, bk):
    """Resolve (bq, bk): explicit caller values win; None consults the
    measured table keyed on max(sq, sk), then clamps to the padded size."""
    if bq is None or bk is None:
        s = max(sq, sk)
        for min_s, tbq, tbk in _TILE_TABLE:
            if s >= min_s:
                bq = tbq if bq is None else bq
                bk = tbk if bk is None else bk
                break
    bq = min(bq, max(128, 1 << (sq - 1).bit_length()))
    bk = min(bk, max(128, 1 << (sk - 1).bit_length()))
    return bq, bk


LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _flash_kernel_lse(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale, bk, nk, mask_mode="all", kvlen_static=None):
    """Variant emitting log-sum-exp per query row (ring-attention partials)."""
    _flash_body(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                scale=scale, bk=bk, nk=nk, lse_ref=lse_ref, mask_mode=mask_mode,
                kvlen_static=kvlen_static)


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, bk, nk, mask_mode="all", kvlen_static=None):
    _flash_body(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                scale=scale, bk=bk, nk=nk, lse_ref=None, mask_mode=mask_mode,
                kvlen_static=kvlen_static)


def _flash_body(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, bk, nk, lse_ref, mask_mode="all", kvlen_static=None):
    """Online-softmax inner body, VPU-lean form.

    The per-tile elementwise work is the bottleneck at d=128 (the two
    dots cost ~5.4 us/step on a v5e MXU; a (2048, 1024) tile's scale-mul
    + mask-add + exp are ~3x that on the VPU), so:
      * the softmax scale is folded into q ONCE per q-tile as
        scale*log2(e), making the logits land directly in the exp2
        domain — the 2M-element `s * scale` disappears and `exp`
        becomes the hardware-native `exp2`;
      * mask_mode "phantom" (the model's common case: full-length static
        kv, only the kernel's own zero pad rows invalid) does NO masking
        at all: a zero key row yields logit 0 and a zero value row, so
        the pad rows contribute EXACTLY npad*exp2(-m) to l and nothing
        to acc — subtracted in closed form at the final step. Measured
        on v5e: per-step mask adds cost ~4%, and a `pl.when`
        masked/unmasked step split costs ~12% (the dual body defeats
        Mosaic's cross-step software pipelining), while phantom mode
        runs at the unmasked kernel's rate bit-exactly (precision note:
        if EVERY true logit in a row sat below ~-126 in log2 units the
        true mass would underflow against the phantom max of 0 — beyond
        attention's realistic logit range by two orders of magnitude);
      * mask_mode "all" (traced kv_len, or static short kv with NONZERO
        rows beyond it, e.g. sequence-parallel pad tokens) applies the
        (1, bk) row-bias mask every step; "none"/"last" as named."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fold scale*log2e into q: (bq, d) muls instead of (bq, bk); the bf16
    # re-round adds <= 2^-9 relative logit noise (same class as the bf16
    # inputs themselves)
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def update(s):
        m_prev = m_ref[:, 0:1]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def masked(s):
        # bias row is (1, bk): iota/compare run once per tile, the add is
        # the (bq, bk) cost this branch exists to localize
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1) + k_idx * bk
        return s + jnp.where(col < kvlen_ref[0], 0.0, -jnp.inf).astype(jnp.float32)

    if mask_mode in ("none", "phantom"):
        update(s)
    elif mask_mode == "all":
        update(masked(s))
    else:  # "last": static boundary, mask only blocks containing/past it
        boundary = kvlen_static // bk  # first block index needing a mask

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
            # remove the zero-pad rows' exact mass (logit 0, value 0)
            l_fin = l_fin - npad * jnp.exp2(-m_ref[:, 0:1])
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)
        if lse_ref is not None:
            # natural-log LSE contract (ring merge): m is in log2 units
            lse = m_ref[:, 0:1] * LN2 + jnp.log(jnp.maximum(l_fin, 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(jnp.float32)


def _flash_rope_kernel(kvlen_ref, q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, scale, bk, nk,
                       mask_mode="all", kvlen_static=None):
    """Flash attention with RoPE applied in-kernel (half-split pair layout;
    q/k projections permuted at load, models/wan/weights.py). Saves the
    XLA apply_rope pass over q and k (~8% of attention time at 32k tokens,
    measured on v5e). Rotation: x*[c|c] + roll_half(x)*[-s|s] in fp32.
    Softmax scale/exp2 folding and mask modes as in _flash_body."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def rot(x, c, s, gain=1.0):
        d2 = x.shape[1] // 2
        xf = x.astype(jnp.float32)
        rolled = jnp.concatenate([xf[:, d2:], xf[:, :d2]], axis=1)
        return ((xf * c + rolled * s) * gain).astype(jnp.bfloat16)

    # softmax scale folded into the q rotation (exp2 domain, see _flash_body)
    q = rot(q_ref[0], cq_ref[...], sq_ref[...], gain=scale * LOG2E)
    k = rot(k_ref[0], ck_ref[...], sk_ref[...])
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def update(s):
        m_prev = m_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
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
            # zero pad rows rotate to zero keys: exact mass npad*exp2(-m)
            l_fin = l_fin - npad * jnp.exp2(-m_ref[:, 0:1])
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def flash_attention_fused_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_len: Optional[Union[int, jnp.ndarray]] = None,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v (B, S, N, D) in half-split pair layout; cos/sin (S_rope, D/2)
    pair tables. Tokens past S_rope get identity rotation (matching
    apply_rope's pass-through tail).

    Blocks default to 2048x1024 like the dense kernel (the four fp32
    table blocks need the raised per-kernel VMEM limit; at the default
    16M scope this config AOT-OOMed at 21.7M)."""
    from ...ops.rope import rope_tables_full

    b, sq, n, d = q.shape
    sk = k.shape[1]
    kv_len = kv_len if kv_len is not None else sk
    bq, bk = _auto_blocks(sq, sk, bq, bk)
    scale = 1.0 / math.sqrt(d)

    cos_full, sin_full = rope_tables_full(cos, sin)  # (S_rope, d)
    s_rope = cos_full.shape[0]
    if s_rope < sq:  # identity rotation for the tail
        pad_c = jnp.ones((sq - s_rope, d), jnp.float32)
        pad_s = jnp.zeros((sq - s_rope, d), jnp.float32)
        cos_full = jnp.concatenate([cos_full, pad_c], axis=0)
        sin_full = jnp.concatenate([sin_full, pad_s], axis=0)
    else:
        cos_full, sin_full = cos_full[:sq], sin_full[:sq]

    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        qf = jnp.pad(qf, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kf = jnp.pad(kf, ((0, 0), (0, pk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pk), (0, 0)))
    table_len = max(qf.shape[1], kf.shape[1])
    if table_len > cos_full.shape[0]:
        extra = table_len - cos_full.shape[0]
        cos_full = jnp.concatenate([cos_full, jnp.ones((extra, d), jnp.float32)], axis=0)
        sin_full = jnp.concatenate([sin_full, jnp.zeros((extra, d), jnp.float32)], axis=0)
    nq = qf.shape[1] // bq
    nk = kf.shape[1] // bk

    mask_mode, kvlen_static = _mask_mode_for(kv_len, sk, kf.shape[1], bk)
    kvlen_arr = jnp.asarray(kv_len, jnp.int32).reshape(1)
    kernel = functools.partial(_flash_rope_kernel, scale=scale, bk=bk, nk=nk,
                               mask_mode=mask_mode, kvlen_static=kvlen_static)
    out = pl.pallas_call(
        kernel,
        grid=(b * n, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((bq, d), lambda bb, i, j: (i, 0)),
            pl.BlockSpec((bq, d), lambda bb, i, j: (i, 0)),
            pl.BlockSpec((bk, d), lambda bb, i, j: (j, 0)),
            pl.BlockSpec((bk, d), lambda bb, i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # four fp32 table blocks push 2048-wide q blocks past the
            # 16M scoped default; the v5e has 128M VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kvlen_arr, qf, kf, vf, cos_full, sin_full, cos_full, sin_full)
    if pq:
        out = out[:, :sq]
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def _mask_mode_for(kv_len, sk_orig: int, padded_sk: int, bk: int):
    """("all"|"phantom"|"none", kvlen_static): traced lengths mask every
    step. A static length equal to the caller's (pre-pad) key count means
    the only invalid rows are the kernel's own zero padding — handled in
    closed form ("phantom", see _flash_body) with no per-step masking. A
    static length SHORTER than the caller's key count means real data
    rows sit beyond it (e.g. sequence-parallel pad tokens), which are not
    zero — conservatively mask every step."""
    import numpy as np

    if isinstance(kv_len, (int, np.integer)):
        kv = int(kv_len)
        if kv >= padded_sk:
            return "none", None
        if kv == sk_orig:
            return "phantom", kv
        # static boundary below the caller's key count (real rows beyond it,
        # e.g. sp pad tokens): blocks fully before the boundary need no mask,
        # only blocks containing/past it pay the (bq, bk) mask add
        return "last", kv
    return "all", None


def _flash_bnsd(q, k, v, kv_len, bq: int, bk: int, interpret: bool = False):
    """q: (BN, Sq, D), k/v: (BN, Sk, D) -> (BN, Sq, D). kv_len: i32 scalar."""
    bn, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    nq = q.shape[1] // bq
    nk = k.shape[1] // bk

    mask_mode, kvlen_static = _mask_mode_for(kv_len, sk, k.shape[1], bk)
    kvlen_arr = jnp.asarray(kv_len, jnp.int32).reshape(1)
    kernel = functools.partial(_flash_kernel, scale=scale, bk=bk, nk=nk,
                               mask_mode=mask_mode, kvlen_static=kvlen_static)
    out = pl.pallas_call(
        kernel,
        grid=(bn, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # m
            pltpu.VMEM((bq, 128), jnp.float32),  # l
            pltpu.VMEM((bq, d), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bn * sq * sk * d,
            bytes_accessed=2 * bn * (sq * d + 2 * sk * d),
            transcendentals=bn * sq * sk,
        ),
        interpret=interpret,
    )(kvlen_arr, q, k, v)
    if pq:
        out = out[:, :sq]
    return out


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[Union[int, jnp.ndarray]] = None,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (B, S, N, D) -> (B, Sq, N, D). Full bidirectional attention,
    keys masked beyond ``kv_len`` (int or traced scalar)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    kv_len = kv_len if kv_len is not None else sk
    bq, bk = _auto_blocks(sq, sk, bq, bk)

    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    of = _flash_bnsd(qf, kf, vf, kv_len, bq, bk, interpret=interpret)
    return of.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[Union[int, jnp.ndarray]] = None,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: bool = False,
):
    """(out (B,S,N,D), lse (B,S,N) fp32) — ring-attention building block."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    kv_len = kv_len if kv_len is not None else sk
    bq, bk = _auto_blocks(sq, sk, bq, bk)
    scale = 1.0 / math.sqrt(d)

    qf = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    pq = (-sq) % bq
    pk = (-sk) % bk
    if pq:
        qf = jnp.pad(qf, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kf = jnp.pad(kf, ((0, 0), (0, pk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pk), (0, 0)))
    nq = qf.shape[1] // bq
    nk = kf.shape[1] // bk
    mask_mode, kvlen_static = _mask_mode_for(kv_len, sk, kf.shape[1], bk)
    kvlen_arr = jnp.asarray(kv_len, jnp.int32).reshape(1)
    kernel = functools.partial(_flash_kernel_lse, scale=scale, bk=bk, nk=nk,
                               mask_mode=mask_mode, kvlen_static=kvlen_static)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * n, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, bk, d), lambda bb, i, j: (bb, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda bb, i, j: (bb, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, q.dtype),
            jax.ShapeDtypeStruct((b * n, qf.shape[1], 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # same raise as the dense kernel: default 28M scoped vmem OOMs
            # at the big-tile configs (radial near pass hit 55.6M)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kvlen_arr, qf, kf, vf)
    out = out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)
    lse = lse[:, :sq, 0].reshape(b, n, sq).transpose(0, 2, 1)
    return out, lse
