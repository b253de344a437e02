"""Multi-chip CogVideoX DiT: Ulysses sequence parallelism over the joint
[text; video] stream.

The CogVideoX block attends over a single concatenated stream with TEXT
first (model.py cog_block:113). The sharded forward reuses the Hunyuan
img+txt ulysses primitive (parallel/ulysses.py ulysses_concat_attention,
which expects the SHARDED part first) by rotating the stream to
[video; text] around the attention call — attention is row-permutation
equivariant, so the rotation is exact. Video tokens + their RoPE rows
shard over ``sp``; text, temb, and block weights are replicated; the
text outputs all-gather back to full heads (reference
attentions/distributed/ulysses wrap dataflow, applied to the third
family)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...parallel.mesh import mesh_axis_size
from ...parallel.ulysses import ulysses_concat_attention
from .model import (
    CogArch,
    _timestep_embedding,
    cog_block,
    cog_patchify,
    cog_unpatchify,
    layer_norm,
)


def cog_forward_sharded(
    params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: CogArch,
    mesh: Mesh,
    mm_type: str = "Default",
    attn_type: str = "xla",
) -> jnp.ndarray:
    sp = mesh_axis_size(mesh, "sp")
    mm_fn = resolve_mm("Default")
    mm_blk = resolve_mm(mm_type)
    dense = partial(attention, attn_type)

    b = latents.shape[0]
    p, p_t = arch.patch_size, arch.patch_size_t
    f_lat = latents.shape[2]
    pad_f = (-f_lat) % p_t
    if pad_f:
        latents = jnp.concatenate([latents, latents[:, :, -pad_f:]], axis=2)
    grid = (latents.shape[2] // p_t, latents.shape[3] // p, latents.shape[4] // p)

    temb = _timestep_embedding(t, arch.dim)
    temb = mm_fn(params["time_embedding"]["1"], temb.astype(jnp.bfloat16))
    temb = jax.nn.silu(temb.astype(jnp.float32)).astype(jnp.bfloat16)
    temb = mm_fn(params["time_embedding"]["2"], temb)
    enc = mm_fn(params["text_proj"], context.astype(jnp.bfloat16))
    x = mm_fn(params["patch_proj"], cog_patchify(latents.astype(jnp.bfloat16), p, p_t))
    assert x.shape[1] % sp == 0, f"video tokens {x.shape[1]} must divide sp={sp}"

    def stacks(blocks, x, enc, temb, cos, sin):
        def attn_fn(q, k, v, txt_len=None):
            def rot(z):  # [text; video] -> [video; text] (sharded part first)
                return jnp.concatenate([z[:, txt_len:], z[:, :txt_len]], axis=1)

            vid_len = q.shape[1] - txt_len
            out = ulysses_concat_attention(dense, rot(q), rot(k), rot(v),
                                           vid_len, axis="sp")
            return jnp.concatenate([out[:, vid_len:], out[:, :vid_len]], axis=1)

        def body(carry, block):
            xc, ec = carry
            xc, ec = cog_block(block, xc, ec, temb, cos, sin, arch, mm_blk, attn_fn)
            return (xc, ec), None

        (x, enc), _ = jax.lax.scan(body, (x, enc), blocks)
        return x, enc

    x, enc = jax.shard_map(
        stacks,
        mesh=mesh,
        in_specs=(P(), P(None, "sp", None), P(), P(), P("sp"), P("sp")),
        out_specs=(P(None, "sp", None), P()),
        check_vma=False,  # enc out is all-gathered (replicated by construction)
    )(params["blocks"], x, enc, temb, rope_cos, rope_sin)

    joint = jnp.concatenate([enc, x], axis=1)
    joint = layer_norm(joint, params["norm_final"]["w"], params["norm_final"]["b"], eps=1e-5)
    x = joint[:, arch.text_len:]
    tm = mm_fn(params["norm_out_linear"], jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype))
    shift, scale = jnp.split(tm, 2, axis=-1)
    x = layer_norm(x, params["norm_out_norm"]["w"], params["norm_out_norm"]["b"], eps=1e-5)
    x = x * (1 + scale[:, None]) + shift[:, None]
    out = resolve_mm("Default-Force-FP32")(params["proj_out"], x)
    video = cog_unpatchify(out, grid, p, p_t, arch.out_channels)
    if pad_f:
        video = video[:, :, :f_lat]
    return video
