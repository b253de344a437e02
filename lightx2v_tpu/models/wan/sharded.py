"""Multi-chip Wan DiT: Ulysses sequence parallelism + CFG data parallelism.

Replaces the reference's monkey-patched NCCL wrappers
(lightx2v/attentions/distributed/ulysses/wrap.py:5-71, invoked from
models/networks/wan/model.py:53-59) with a ``jax.shard_map`` over a
``Mesh``:

* ``dp`` shards the batch axis (cond/uncond CFG pair — CFG parallelism the
  reference runs sequentially);
* ``sp`` shards the video-token axis; self-attention swaps to head
  sharding with ``lax.all_to_all`` (parallel/ulysses.py) and back;
* cross-attention needs no communication (queries local, text K/V
  replicated) — same property the reference exploits;
* RoPE tables are passed sharded along tokens, the mesh-position slicing
  the reference does by rank arithmetic (infer/utils.py:86-104) falls out
  of the sharding;
* pre/post (patchify, t/text embeddings, head) run under GSPMD outside
  the shard_map — they are <1% of FLOPs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...ops.rope import apply_rope_half
from ...parallel.mesh import mesh_axis_size
from ...parallel.ring import ring_attention
from ...parallel.tensor_parallel import tp_block_specs, wan_block_tp
from ...parallel.ulysses import ulysses_attention
from ...utils.logging_utils import logger
from .config import WanArch
from .model import wan_block, wan_forward


def _ring_pad(kv_tokens: int, sp: int, local_chunk: int) -> int:
    """Pad rows at the global tail: sp*chunk padded length minus the true
    token count (0 when the sequence divides sp)."""
    return max(sp * local_chunk - kv_tokens, 0)


def make_sharded_transformer(
    mesh: Mesh,
    arch: WanArch,
    mm_type: str = "Default",
    self_attn_type: str = "flash_attn3",
    cross_attn_type: str = "flash_attn3",
    parallel_attn_type: str = "ulysses",
    kv_tokens: Optional[int] = None,
):
    """Returns transformer_fn(blocks, x, embed0, context, context_img) with
    x sharded (dp, sp) — pluggable into wan_forward(transformer_fn=...).

    ``parallel_attn_type`` selects the sequence-parallel algorithm over the
    ``sp`` axis: "ulysses" (all_to_all seq<->head swap, reference
    ulysses/attn.py:7-91) or "ring" (K/V rotation via ppermute with
    online-softmax merge, reference ring/attn.py:96-162)."""
    sp = mesh_axis_size(mesh, "sp")
    tp = mesh_axis_size(mesh, "tp")
    # fused rope under a mesh: with ulysses, q/k travel the all_to_all
    # UN-rotated and the dense flash kernel rotates the full-sequence
    # head slice with the replicated tables (positions line up — the
    # all_to_all concatenates contiguous sp chunks in device order);
    # tp-only heads see the full sequence, so the kernel fuses directly.
    # Ring must pre-rotate each device's K chunk before it starts
    # traveling the ring, so it keeps the XLA half-split pass.
    rope_fused_in_attn = (
        arch.rope_fused
        and self_attn_type in ("flash_attn2", "flash_attn3")
        and not (sp > 1 and parallel_attn_type == "ring")
    )
    if arch.rope_fused and not rope_fused_in_attn:
        logger.warning("rope_fused + %s: applying RoPE as an XLA half-split "
                       "pass (in-kernel fusion needs flash + ulysses)",
                       parallel_attn_type or self_attn_type)
    mm_fn = resolve_mm(mm_type)
    dense_self = partial(attention, self_attn_type)
    dense_cross = partial(attention, cross_attn_type)
    if parallel_attn_type not in (None, "ulysses", "ring"):
        raise ValueError(f"unsupported parallel_attn_type: {parallel_attn_type}")

    def transformer(blocks, x, embed0, context, context_img, cos, sin):
        # kv_tokens masks the sequence-parallel pad tail (nonzero k rows —
        # zero embeddings pick up modulation shifts), matching the
        # single-device forward's kv_len masking. None when S divides sp.
        if sp > 1:
            if parallel_attn_type == "ring":
                def sp_attn(q, k, v, **rkw):
                    assert not rkw, "ring pre-rotates; rope kwargs must not reach it"
                    return ring_attention(
                        q, k, v, axis="sp",
                        pad_tail=0 if kv_tokens is None else _ring_pad(kv_tokens, sp, k.shape[1]))
            else:
                def sp_attn(q, k, v, **rkw):
                    # rkw carries rope tables on the fused path; they ride
                    # into the dense kernel AFTER the seq->head all_to_all
                    fn = (dense_self if not rkw
                          else (lambda qh, kh, vh, **kw: dense_self(qh, kh, vh, **rkw, **kw)))
                    return ulysses_attention(fn, q, k, v, axis="sp", kv_len=kv_tokens)
        else:
            def sp_attn(q, k, v, **rkw):
                if kv_tokens is not None:
                    rkw["kv_len"] = kv_tokens
                return dense_self(q, k, v, **rkw)

        def self_fn(q, k, v, rope_cos=None, rope_sin=None):
            if rope_cos is not None and not rope_fused_in_attn:
                # arch.rope_fused but the attention path can't fuse:
                # rotate here (half-split layout matches permuted weights)
                q = apply_rope_half(q, rope_cos, rope_sin)
                k = apply_rope_half(k, rope_cos, rope_sin)
                rope_cos = rope_sin = None
            if rope_cos is not None:
                return sp_attn(q, k, v, rope_cos=rope_cos, rope_sin=rope_sin)
            return sp_attn(q, k, v)

        if tp > 1:
            # heads + FFN sharded over tp (Megatron pattern); the attention
            # fn sees the local head slice (and still Ulysses-shards tokens)
            def body(carry, layer):
                out = wan_block_tp(
                    layer, carry, embed0, context, context_img, cos, sin,
                    arch, mm_fn, self_fn, dense_cross, tp_axis="tp",
                )
                return out, None
        else:
            def body(carry, layer):
                out = wan_block(
                    layer, carry, embed0, context, context_img, cos, sin,
                    arch, mm_fn, self_fn, dense_cross,
                )
                return out, None

        x, _ = jax.lax.scan(body, x, blocks)
        return x

    rep = tp_block_specs(arch.task) if tp > 1 else P()
    xspec = P("dp", "sp", None)
    bspec = P("dp")
    # fused-ulysses rotates the FULL sequence inside the kernel after the
    # all_to_all, so the tables replicate; the local half-rope pass (ring /
    # non-flash / unfused) wants the device's own token slice
    rope_spec = P() if (rope_fused_in_attn and sp > 1) else P("sp", None)

    def transformer_fn(blocks, x, embed0, context, context_img, cos, sin):
        block_spec = _expand_quant_specs(blocks, rep, tp) if tp > 1 else rep
        return jax.shard_map(
            transformer,
            mesh=mesh,
            in_specs=(block_spec, xspec, bspec, bspec, bspec, rope_spec, rope_spec),
            out_specs=xspec,
            check_vma=False,
        )(blocks, x, embed0, context, context_img, cos, sin)

    return transformer_fn


def _expand_quant_specs(blocks, template, tp: int):
    """Fill the hand-written tp spec template out to the ACTUAL block
    pytree: quantized linears carry extra leaves (``w_scale``, smooth-quant
    factors) the template doesn't know. Scales follow their weight's
    sharding on matching dims — per-channel (L, out) scales take the
    template's first two w entries; group scales (L, out, nk) take all
    three (replicated on the group dim when tp doesn't divide nk, which is
    exact: a group then spans shards and every shard needs its scale)."""

    def rec(b, t):
        if not isinstance(b, dict):
            return t if isinstance(t, P) else P()
        tdict = t if isinstance(t, dict) else {}
        w_spec = tdict.get("w")
        out = {}
        for k, v in b.items():
            if k in tdict:
                out[k] = rec(v, tdict[k])
            elif k == "w_scale" and isinstance(w_spec, P) and v is not None:
                nd = getattr(v, "ndim", len(getattr(v, "shape", ())))
                spec = tuple(w_spec)[:nd] + (None,) * max(0, nd - len(tuple(w_spec)))
                if nd == 3 and spec[2] is not None and v.shape[2] % tp:
                    spec = (spec[0], spec[1], None)
                out[k] = P(*spec)
            elif isinstance(v, dict):
                out[k] = rec(v, {})
            else:
                out[k] = P()  # replicate unknown leaves (smooth factors etc.)
        return out

    return rec(blocks, template)


def wan_forward_sharded(
    params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    mesh: Mesh,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    cfg_scale: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    self_attn_type: str = "flash_attn3",
    cross_attn_type: str = "flash_attn3",
    seq_len: Optional[int] = None,
    parallel_attn_type: str = "ulysses",
) -> jnp.ndarray:
    """Drop-in sharded version of wan_forward. The token count (after
    optional padding to ``seq_len``) must divide the sp axis; num_heads
    must divide sp as well (Ulysses head split)."""
    sp = mesh_axis_size(mesh, "sp")
    assert arch.num_heads % sp == 0, f"heads {arch.num_heads} % sp {sp} != 0"

    pt, ph, pw = arch.patch_size
    s_tokens = (latents.shape[2] // pt) * (latents.shape[3] // ph) * (latents.shape[4] // pw)
    kv_tokens = s_tokens if (seq_len is not None and seq_len > s_tokens) else None
    sharded_tf = make_sharded_transformer(mesh, arch, mm_type, self_attn_type,
                                          cross_attn_type, parallel_attn_type,
                                          kv_tokens=kv_tokens)

    def transformer_fn(blocks, x, embed0, context, context_img):
        if context_img is None:
            # shard_map needs a uniform pytree; a zero-width stand-in keeps
            # the t2v signature identical (k_img absent -> branch unused)
            context_img = jnp.zeros((x.shape[0], 1, x.shape[-1]), x.dtype)
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("dp", "sp", None)))
        return sharded_tf(blocks, x, embed0, context, context_img, rope_cos, rope_sin)

    return wan_forward(
        params, latents, t, context, rope_cos, rope_sin, arch,
        y=y, clip_fea=clip_fea, cfg_scale=cfg_scale, mm_type=mm_type,
        self_attn_type=self_attn_type, cross_attn_type=cross_attn_type,
        seq_len=seq_len, transformer_fn=transformer_fn,
    )
