"""Ulysses sequence parallelism: seq-shard <-> head-shard all-to-all.

The reference shards the token axis across ranks and swaps to
head-sharding around attention with ``dist.all_to_all_single``
(lightx2v/attentions/distributed/ulysses/attn.py:7-91,
comm/all2all.py:7-89). Here the same dataflow is ``jax.lax.all_to_all``
over the ``sp`` mesh axis inside ``shard_map`` — XLA lowers it onto ICI.

Layouts (per-device views inside shard_map):
  seq-sharded:  (B, S/sp, N, D)
  head-sharded: (B, S, N/sp, D)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def seq2head(x: jnp.ndarray, axis: str = "sp") -> jnp.ndarray:
    """(B, S/sp, N, D) -> (B, S, N/sp, D) (reference all2all_seq2head,
    comm/all2all.py:7-45)."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def head2seq(x: jnp.ndarray, axis: str = "sp") -> jnp.ndarray:
    """(B, S, N/sp, D) -> (B, S/sp, N, D) (reference all2all_head2seq,
    comm/all2all.py:48-89)."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(
    attn_fn,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "sp",
    kv_len=None,
) -> jnp.ndarray:
    """Full-sequence attention with per-device head slices.

    q/k/v: (B, S/sp, N, D) seq-sharded -> returns (B, S/sp, N, D).
    ``attn_fn(q, k, v)`` computes dense attention on (B, S, N/sp, D).
    ``kv_len`` (static int) masks the global tail after the head swap —
    the sequence-parallel pad tokens, whose k rows are not zero."""
    qh = seq2head(q, axis)
    kh = seq2head(k, axis)
    vh = seq2head(v, axis)
    oh = attn_fn(qh, kh, vh) if kv_len is None else attn_fn(qh, kh, vh, kv_len=kv_len)
    return head2seq(oh, axis)


def ulysses_concat_attention(
    attn_fn,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    img_len: int,
    axis: str = "sp",
    kv_len=None,
) -> jnp.ndarray:
    """Ulysses for a CONCATENATED img+txt stream (Hunyuan MMDiT double/
    single blocks; reference hunyuan ulysses wrap,
    attentions/distributed/ulysses/attn.py hunyuan variant): the first
    ``img_len`` rows of the per-device view are the seq-sharded video
    tokens, the tail is the REPLICATED text. The seq<->head all_to_all
    moves only the img part; each device takes its head slice of the
    (identical) text rows, attends over [all img tokens + text], and the
    text outputs all-gather back to full heads so every device returns
    the same txt stream.

    q/k/v: (B, img_len + St, N, D) -> (B, img_len + St, N, D)."""
    sp = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    n = q.shape[2]
    hs = n // sp

    def split(x):
        return x[:, :img_len], x[:, img_len:]

    qi, qt = split(q)
    ki, kt = split(k)
    vi, vt = split(v)
    qih, kih, vih = seq2head(qi, axis), seq2head(ki, axis), seq2head(vi, axis)

    def head_slice(x):
        return jax.lax.dynamic_slice_in_dim(x, idx * hs, hs, axis=2)

    qh = jnp.concatenate([qih, head_slice(qt)], axis=1)
    kh = jnp.concatenate([kih, head_slice(kt)], axis=1)
    vh = jnp.concatenate([vih, head_slice(vt)], axis=1)
    oh = attn_fn(qh, kh, vh) if kv_len is None else attn_fn(qh, kh, vh, kv_len=kv_len)
    si = qih.shape[1]
    oi = head2seq(oh[:, :si], axis)
    ot = jax.lax.all_gather(oh[:, si:], axis, axis=2, tiled=True)
    return jnp.concatenate([oi, ot], axis=1)


def partial_heads_attention(attn_fn, q, k, v, axis: str = "sp"):
    """Head-parallel attention TP (reference attentions/distributed/
    partial_heads_attn/attn.py:6-37): inputs already head-sharded
    (B, S, N/sp, D) inside shard_map; each device computes its head slice
    on the full sequence — no communication inside (the all-gather is the
    shard_map out_spec)."""
    return attn_fn(q, k, v)
