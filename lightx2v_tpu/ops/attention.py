"""Attention kernel dispatch (reference: lightx2v/attentions/__init__.py:8-20
and lightx2v/common/ops/attn/attn_weight.py:71-292).

The reference dispatches on strings (flash_attn2/flash_attn3/sage_attn2/
radial_attn/torch_sdpa) to external CUDA kernels. Here the same strings
resolve to TPU implementations:

* ``flash_attn2`` / ``flash_attn3`` -> Pallas flash-attention kernel
  (ops/pallas/flash_attention.py) on TPU, chunked online-softmax XLA
  fallback elsewhere;
* ``torch_sdpa`` / ``xla`` -> plain XLA softmax attention (small shapes);
* ``sage_attn2`` -> int8-QK Pallas kernel (falls back to flash);
* ``radial_attn`` -> block-sparse spatiotemporal-decay Pallas kernel.

All functions take q, k, v of shape (B, S, N, D) (batch, tokens, heads,
head_dim) and return (B, S, N, D) in the input dtype. Softmax statistics
are fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.kernel_dispatch import kernel_fallback
from ..utils.registry import ATTN_REGISTER


def _scale(d: int) -> float:
    return 1.0 / math.sqrt(d)


def attn_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, kv_len=None) -> jnp.ndarray:
    """Reference softmax attention; materializes (S_q, S_k) logits.
    ``kv_len`` may be a static int or a traced scalar (masked)."""
    if isinstance(kv_len, int):
        k, v = k[:, :kv_len], v[:, :kv_len]
        kv_len = None
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * _scale(q.shape[-1])
    if kv_len is not None:
        valid = jnp.arange(k.shape[1]) < kv_len
        logits = jnp.where(valid[None, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attn_xla_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len=None,
    q_chunk: int = 2048,
    k_chunk: int = 2048,
) -> jnp.ndarray:
    """Online-softmax attention, O(S_q * k_chunk) memory.

    The same (m, l, acc) recurrence as flash attention, expressed with
    ``lax.scan`` so XLA pipelines it on any backend. Used as the portable
    fallback and as the numerics oracle for the Pallas kernel tests.
    ``kv_len`` may be a static int or a traced scalar.
    """
    if isinstance(kv_len, int):
        k, v = k[:, :kv_len], v[:, :kv_len]
        kv_len = None
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale = _scale(d)

    # Pad to chunk multiples (padding keys are masked out)
    pq = (-sq) % q_chunk
    pk = (-sk) % k_chunk
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
    nq, nk = qp.shape[1] // q_chunk, kp.shape[1] // k_chunk

    kb = kp.reshape(b, nk, k_chunk, n, d).transpose(1, 0, 2, 3, 4)  # (nk,b,kc,n,d)
    vb = vp.reshape(b, nk, k_chunk, n, d).transpose(1, 0, 2, 3, 4)
    valid_to = sk if kv_len is None else kv_len
    k_ids = (jnp.arange(nk * k_chunk) < valid_to).reshape(nk, k_chunk)

    def q_block(qi):
        # qi: (b, q_chunk, n, d)
        def kv_step(carry, inp):
            m, l, acc = carry
            kc, vc, valid = inp
            s = jnp.einsum("bqnd,bknd->bnqk", qi, kc, preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            # guard fully-masked rows
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(s - m_safe[..., None])
            alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
            l_new = l * alpha + jnp.sum(p, axis=-1)
            pv = jnp.einsum("bnqk,bknd->bnqd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
            acc_new = acc * alpha[..., None] + pv
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((b, n, q_chunk), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, n, q_chunk), jnp.float32)
        a0 = jnp.zeros((b, n, q_chunk, d), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(kv_step, (m0, l0, a0), (kb, vb, k_ids))
        out = acc / jnp.maximum(l[..., None], 1e-20)
        return out.transpose(0, 2, 1, 3)  # (b, q_chunk, n, d)

    qb = qp.reshape(b, nq, q_chunk, n, d).transpose(1, 0, 2, 3, 4)
    outs = jax.lax.map(q_block, qb)  # (nq, b, q_chunk, n, d)
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, nq * q_chunk, n, d)
    return out[:, :sq].astype(q.dtype)


def _pallas_flash(q, k, v, kv_len=None, **kw):
    from .pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, kv_len=kv_len)


def _dispatch_flash(q, k, v, kv_len: Optional[int] = None, rope_cos=None, rope_sin=None, **kw):
    """flash_attn2/3: Pallas on TPU, chunked XLA elsewhere. When rope
    tables are passed (arch.rope_fused: q/k in half-split pair layout),
    rotation happens inside the kernel (saves the XLA rope pass, ~8% of
    attention time at 32k tokens on v5e)."""
    if rope_cos is not None:
        if jax.default_backend() == "tpu":
            try:
                from .pallas.flash_attention import flash_attention_fused_rope

                return flash_attention_fused_rope(q, k, v, rope_cos, rope_sin, kv_len=kv_len)
            except Exception as e:
                kernel_fallback("flash_attention_fused_rope", e)
        from .rope import apply_rope_half

        q = apply_rope_half(q, rope_cos, rope_sin)
        k = apply_rope_half(k, rope_cos, rope_sin)
    if jax.default_backend() == "tpu":
        try:
            return _pallas_flash(q, k, v, kv_len=kv_len)
        except Exception as e:
            kernel_fallback("flash_attention", e)
    return attn_xla_chunked(q, k, v, kv_len=kv_len)


def _dispatch_sage(q, k, v, kv_len: Optional[int] = None, **kw):
    """sage_attn2 (INT8 QK): Pallas int8-QK kernel on TPU, flash fallback."""
    if jax.default_backend() == "tpu":
        try:
            from .pallas.sage_attention import sage_attention

            return sage_attention(q, k, v, kv_len=kv_len)
        except Exception as e:
            kernel_fallback("sage_attention", e)
    return _dispatch_flash(q, k, v, kv_len=kv_len)


def _dispatch_radial(q, k, v, kv_len: Optional[int] = None, mask_map=None, sparsity_type="radial",
                     decay_factor=1.0, block_q=2048, block_k=1024, **kw):
    """radial_attn: block-sparse O(n log n) spatiotemporal-decay attention."""
    from .radial import radial_attention

    return radial_attention(q, k, v, mask_map=mask_map, sparsity_type=sparsity_type,
                            decay_factor=decay_factor, block_q=block_q, block_k=block_k)


def _dispatch_sparge(q, k, v, kv_len: Optional[int] = None, keep_ratio=0.3, l1=0.07,
                     block_q=2048, block_k=1024, **kw):
    """Sparge: dynamic meansim block sparsity (reference attn_weight.py:242-291
    wraps the spas_sage_attn CUDA package; ops/sparge.py is the TPU analog).
    Executes at MXU-sized superblocks by default (selection stays at 128)."""
    from .sparge import sparge_attention, sparge_attention_xla

    if jax.default_backend() == "tpu":
        try:
            return sparge_attention(q, k, v, keep_ratio=keep_ratio, l1=l1,
                                    block_q=block_q, block_k=block_k)
        except Exception as e:
            kernel_fallback("sparge_attention", e)
    return sparge_attention_xla(q, k, v, keep_ratio=keep_ratio, l1=l1,
                                block_q=block_q, block_k=block_k)


ATTN_REGISTER.register(["flash_attn2", "flash_attn3"], _dispatch_flash)
ATTN_REGISTER.register("sage_attn2", _dispatch_sage)
ATTN_REGISTER.register(["Sparge", "sparge", "sparge_attn"], _dispatch_sparge)
ATTN_REGISTER.register(["torch_sdpa", "xla"], lambda q, k, v, kv_len=None, **kw: attn_xla(q, k, v, kv_len=kv_len))
ATTN_REGISTER.register("xla_chunked", lambda q, k, v, kv_len=None, **kw: attn_xla_chunked(q, k, v, kv_len=kv_len))
ATTN_REGISTER.register("radial_attn", _dispatch_radial)


def attention(attention_type: str, q, k, v, **kw):
    """Functional dispatch, mirroring lightx2v/attentions/__init__.py:8-20.

    ``rope_cos``/``rope_sin`` kwargs mean q/k arrive un-rotated in
    half-split pair layout (arch.rope_fused); flash fuses the rotation
    in-kernel, every other op applies apply_rope_half up front."""
    if "rope_cos" in kw and attention_type not in ("flash_attn2", "flash_attn3"):
        from .rope import apply_rope_half

        cos = kw.pop("rope_cos")
        sin = kw.pop("rope_sin")
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
    return ATTN_REGISTER[attention_type](q, k, v, **kw)
