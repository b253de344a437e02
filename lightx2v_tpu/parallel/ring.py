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


def _partial_attn_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense partial attention returning (out, lse). q/k/v: (B, S, N, D)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bnqk,bknd->bqnd", (p / l).astype(v.dtype), v, preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)  # (B, S, N)
    return out.astype(q.dtype), lse


def partial_attention(q, k, v):
    if jax.default_backend() == "tpu":
        try:
            from ..ops.pallas.flash_attention import flash_attention_with_lse

            return flash_attention_with_lse(q, k, v)
        except Exception as e:
            kernel_fallback("flash_attention_with_lse", e)
    return _partial_attn_jnp(q, k, v)


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
) -> jnp.ndarray:
    """Inside shard_map: q/k/v seq-sharded (B, S/sp, N, D). Rotates K/V
    around the ring; optionally appends replicated text K/V on the final
    step (reference :160-162)."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    out, lse = partial_attention(q, k, v)
    kc, vc = k, v

    def step(carry, _):
        out, lse, kc, vc = carry
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        o2, l2 = partial_attention(q, kc, vc)
        out, lse = merge_partials(out, lse, o2, l2)
        return (out, lse, kc, vc), None

    if n_dev > 1:
        (out, lse, _, _), _ = jax.lax.scan(step, (out, lse, kc, vc), None, length=n_dev - 1)

    if txt_k is not None:
        o2, l2 = partial_attention(q, txt_k, txt_v)
        out, lse = merge_partials(out, lse, o2, l2)
    return out
