"""Multi-chip HunyuanVideo MMDiT: Ulysses sequence parallelism over the
concatenated img+txt stream.

Reference: lightx2v/attentions/distributed/ulysses/wrap.py
parallelize_hunyuan + attentions/distributed/utils/hunyuan/processor.py
(latents + rope freqs split over ranks, text replicated, txt attention
all-gathered). Here the same dataflow is a ``jax.shard_map`` over the
``sp`` mesh axis:

* img tokens (and their RoPE table rows) sharded over ``sp``;
* txt tokens, modulation vectors, and block weights replicated;
* each double/single block runs ``ulysses_concat_attention``
  (parallel/ulysses.py): img q/k/v all_to_all seq->head, local head
  slice of the replicated txt appended, dense attention over
  [all img + txt], img out all_to_all back, txt out all-gathered;
* pre/post (patchify, text refiner, final layer) run under GSPMD outside
  the shard_map — <1% of FLOPs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...parallel.mesh import mesh_axis_size
from ...parallel.ulysses import ulysses_concat_attention
from .config import HunyuanArch
from .model import (
    hunyuan_double_block,
    hunyuan_pre_process,
    hunyuan_single_block,
    layer_norm,
)


def hunyuan_forward_sharded(
    params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    text_states: jnp.ndarray,
    text_mask: jnp.ndarray,
    text_states_2: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: HunyuanArch,
    mesh: Mesh,
    guidance: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    attn_type: str = "xla",
) -> jnp.ndarray:
    """SP (ulysses) Hunyuan forward. t2v only (the i2v token_replace
    modulation needs the global token index, which the sp shard hides —
    tracked as a follow-up)."""
    sp = mesh_axis_size(mesh, "sp")
    mm_fn = resolve_mm(mm_type)
    dense = partial(attention, attn_type)

    img, txt, vec, _tr, grid = hunyuan_pre_process(
        params, latents, t, text_states, text_mask, text_states_2, guidance, arch
    )
    b, li, d = img.shape
    assert li % sp == 0, f"img tokens {li} must divide sp={sp}"
    vec_silu = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    kv_len = li + jnp.sum(text_mask[0] > 0).astype(jnp.int32)
    kv_arr = kv_len[None]

    def stacks(dbl, sng, img, txt, vs, cos, sin, kv):
        kv = kv[0]

        def attn_fn(q, k, v, kv_len=None, img_len=None):
            return ulysses_concat_attention(dense, q, k, v, img_len,
                                            axis="sp", kv_len=kv)

        def dbody(carry, block):
            im, tx = carry
            im, tx = hunyuan_double_block(block, im, tx, vs, None, cos, sin,
                                          kv, arch, mm_fn, attn_fn, 0)
            return (im, tx), None

        (im, tx), _ = jax.lax.scan(dbody, (img, txt), dbl)
        x = jnp.concatenate([im, tx], axis=1)
        li_local = im.shape[1]

        def sbody(carry, block):
            out = hunyuan_single_block(block, carry, vs, None, li_local,
                                       cos, sin, kv, arch, mm_fn, attn_fn, 0)
            return out, None

        x, _ = jax.lax.scan(sbody, x, sng)
        return x[:, :li_local], x[:, li_local:]

    sharded = jax.shard_map(
        stacks,
        mesh=mesh,
        in_specs=(P(), P(),                    # block stacks replicated
                  P(None, "sp", None),         # img tokens sharded
                  P(), P(),                    # txt, vec replicated
                  P("sp"), P("sp"),            # rope rows follow img tokens
                  P()),
        out_specs=(P(None, "sp", None), P()),
        check_vma=False,  # txt out is all-gathered (replication by construction)
    )
    img, txt = sharded(params["double_blocks"], params["single_blocks"],
                       img, txt, vec_silu, rope_cos, rope_sin, kv_arr)

    # final layer (model.py hunyuan_forward post section)
    mmd = resolve_mm("Default")
    sv = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    mod = mmd(params["final_layer"]["adaLN"], sv)
    shift, scale = jnp.split(mod, 2, axis=-1)
    out = layer_norm(img, eps=1e-6)
    out = out * (1.0 + scale[:, None, :]) + shift[:, None, :]
    out = resolve_mm("Default-Force-FP32")(params["final_layer"]["linear"], out)

    f, h, w = grid
    pt, ph, pw = arch.patch_size
    c = arch.out_channels
    out = out.reshape(b, f, h, w, c, pt, ph, pw)
    out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return out.reshape(b, c, f * pt, h * ph, w * pw)
