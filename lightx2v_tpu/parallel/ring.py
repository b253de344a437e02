"""Ring attention sequence parallelism.

Reference (lightx2v/attentions/distributed/ring/attn.py:25-162 +
comm/ring_comm.py:7-47): K/V shards rotate around the ring via batched
isend/irecv; per step the local flash partial (out, lse) merges into the
running result with the online-softmax identity; text-context K/V join on
the last step.

TPU version: rotation is ``jax.lax.ppermute`` over the ``sp`` mesh axis
inside ``shard_map``; each step's partial comes from the Pallas flash
kernel's (out, lse) output (jnp fallback off-TPU). The merge

    out = out_a * sigmoid(lse_a - lse_b) + out_b * sigmoid(lse_b - lse_a)
    lse = logaddexp(lse_a, lse_b)

is the reference's update_out_and_lse in stable form.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.kernel_dispatch import kernel_fallback


def _partial_attn_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      kv_len=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense partial attention returning (out, lse). q/k/v: (B, S, N, D)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    if kv_len is not None:
        col = jnp.arange(k.shape[1])
        logits = jnp.where(col[None, None, None, :] < kv_len, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bnqk,bknd->bqnd", (p / l).astype(v.dtype), v, preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)  # (B, S, N)
    return out.astype(q.dtype), lse


def partial_attention(q, k, v, kv_len=None):
    if jax.default_backend() == "tpu":
        try:
            from ..ops.pallas.flash_attention import flash_attention_with_lse

            return flash_attention_with_lse(q, k, v, kv_len=kv_len)
        except Exception as e:
            kernel_fallback("flash_attention_with_lse", e)
    return _partial_attn_jnp(q, k, v, kv_len=kv_len)


def merge_partials(out_a, lse_a, out_b, lse_b):
    """Numerically stable online-softmax merge (reference ring/attn.py:25-63)."""
    wa = jax.nn.sigmoid(lse_a - lse_b)[..., None]  # (B, S, N, 1)
    out = out_a.astype(jnp.float32) * wa + out_b.astype(jnp.float32) * (1.0 - wa)
    lse = jnp.logaddexp(lse_a, lse_b)
    return out.astype(out_a.dtype), lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "sp",
    txt_k: Optional[jnp.ndarray] = None,
    txt_v: Optional[jnp.ndarray] = None,
    pad_tail: int = 0,
) -> jnp.ndarray:
    """Inside shard_map: q/k/v seq-sharded (B, S/sp, N, D). Rotates K/V
    around the ring; optionally appends replicated text K/V on the final
    step (reference :160-162).

    ``pad_tail``: number of sequence-parallel pad tokens at the global
    tail. They live in the LAST device's chunk, whose k rows are NOT zero
    (the zero embeddings pick up modulation shifts), so the step holding
    that chunk masks its tail — matching the single-device forward's
    kv_len masking."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    d_idx = jax.lax.axis_index(axis)
    chunk = k.shape[1]

    def kvlen_for(src_chunk):
        if not pad_tail:
            return None
        return jnp.where(src_chunk == n_dev - 1, chunk - pad_tail, chunk)

    out, lse = partial_attention(q, k, v, kv_len=kvlen_for(d_idx))
    kc, vc = k, v

    def step(carry, t):
        out, lse, kc, vc = carry
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        # after t rotations along (i -> i+1), device d holds chunk (d - t) % n
        o2, l2 = partial_attention(q, kc, vc, kv_len=kvlen_for((d_idx - t) % n_dev))
        out, lse = merge_partials(out, lse, o2, l2)
        return (out, lse, kc, vc), None

    if n_dev > 1:
        (out, lse, _, _), _ = jax.lax.scan(step, (out, lse, kc, vc),
                                           jnp.arange(1, n_dev))

    if txt_k is not None:
        o2, l2 = partial_attention(q, txt_k, txt_v)
        out, lse = merge_partials(out, lse, o2, l2)
    return out
