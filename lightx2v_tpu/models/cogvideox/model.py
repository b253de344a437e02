"""CogVideoX1.5 DiT in pure JAX.

Computation mirrors the reference (lightx2v/models/networks/cogvideox/
infer/{pre_infer.py,transformer_infer.py,post_infer.py}): joint
[text; video] token stream, AdaLN with per-stream (hidden/encoder) shift/
scale/gate from the time embedding, QK LayerNorm, rotary embeddings on
video tokens only (rotate-half form == our pair form), gelu-tanh FFN over
the concatenated stream, temporal patching p_t=2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...ops.norms import layer_norm
from ...ops.rope import apply_rope

Params = Dict[str, Any]


@dataclass(frozen=True)
class CogArch:
    num_layers: int = 42
    num_heads: int = 48
    head_dim: int = 64
    text_len: int = 226
    text_dim: int = 4096
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    patch_size_t: int = 2
    time_embed_dim: int = 512

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim


def build_cog_rope(arch: CogArch, f: int, h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """3D rope, diffusers get_3d_rotary_pos_embed semantics: head_dim split
    t : h : w = 1/4 : 3/8 : 3/8, theta 10000. Returns (S, head_dim//2)."""
    d = arch.head_dim
    dim_t, dim_h = d // 4, d * 3 // 8
    dim_w = d - dim_t - dim_h
    cos_p, sin_p = [], []
    for i, (dim, size) in enumerate(((dim_t, f), (dim_h, h), (dim_w, w))):
        freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        ang = np.outer(np.arange(size, dtype=np.float64), freqs)
        shape = [1, 1, 1, ang.shape[1]]
        shape[i] = size
        ang = np.broadcast_to(ang.reshape(shape), (f, h, w, ang.shape[1]))
        cos_p.append(np.cos(ang))
        sin_p.append(np.sin(ang))
    cos = np.concatenate(cos_p, -1).reshape(f * h * w, -1).astype(np.float32)
    sin = np.concatenate(sin_p, -1).reshape(f * h * w, -1).astype(np.float32)
    return cos, sin


def _timestep_embedding(t: jnp.ndarray, dim: int, flip: bool = True) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip:  # flip_sin_to_cos=True -> [cos | sin]
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    return emb


def cog_patchify(x: jnp.ndarray, p: int, p_t: int) -> jnp.ndarray:
    """(B, C, F, H, W) -> (B, S, C*p_t*p*p) with the reference's layout
    (pre_infer.py:56-59: frames->channels-last then (pt, ph, pw) flatten)."""
    b, c, f, h, w = x.shape
    x = x.transpose(0, 2, 3, 4, 1)  # (B, F, H, W, C)
    x = x.reshape(b, f // p_t, p_t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # (B, f, h, w, C, pt, ph, pw)
    return x.reshape(b, (f // p_t) * (h // p) * (w // p), c * p_t * p * p)


def cog_unpatchify(x: jnp.ndarray, grid, p: int, p_t: int, c: int) -> jnp.ndarray:
    """(B, S, c*p_t*p*p) -> (B, C, F, H, W). The reference head output is
    CHANNEL-major per token: reshape (f,h,w,-1,p_t,p,p) puts C before
    (p_t,ph,pw) (post_infer.py:24-26), mirroring the patchify layout."""
    b = x.shape[0]
    f, h, w = grid
    x = x.reshape(b, f, h, w, c, p_t, p, p)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)  # (B, c, f, pt, h, ph, w, pw)
    return x.reshape(b, c, f * p_t, h * p, w * p)


def _ada_dual(p_lin, temb, x, enc, norm_w, norm_b, mm_fn):
    """norm1/norm2 pattern: silu(temb) -> linear -> 6 chunks; LN both streams."""
    tm = mm_fn(p_lin, jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype))
    sh, sc, g, esh, esc, eg = jnp.split(tm, 6, axis=-1)
    xn = layer_norm(x, norm_w, norm_b, eps=1e-5) * (1 + sc[:, None]) + sh[:, None]
    en = layer_norm(enc, norm_w, norm_b, eps=1e-5) * (1 + esc[:, None]) + esh[:, None]
    return xn.astype(x.dtype), en.astype(x.dtype), g, eg


def cog_block(block: Params, x, enc, temb, rope_cos, rope_sin, arch: CogArch, mm_fn, attn_fn):
    b, li, d = x.shape
    lt = enc.shape[1]
    n, hd = arch.num_heads, arch.head_dim

    xn, en, gate, egate = _ada_dual(block["norm1_linear"], temb, x, enc,
                                    block["norm1_norm"]["w"], block["norm1_norm"]["b"], mm_fn)
    h = jnp.concatenate([en, xn], axis=1)  # [text; video]
    q = mm_fn(block["to_q"], h).reshape(b, -1, n, hd)
    k = mm_fn(block["to_k"], h).reshape(b, -1, n, hd)
    v = mm_fn(block["to_v"], h).reshape(b, -1, n, hd)
    # QK LayerNorm over head_dim. The reference's CogVideoXBlock leaves the
    # LN eps at the registry default 1e-6 for norm_q/k
    # (cogvideox/weights/transformers_weights.py:48-49 passes no eps;
    # layer_norm_weight.py:8 defaults 1e-6) — unlike norm1/norm2 (1e-5).
    q = layer_norm(q, block["norm_q"]["w"], block["norm_q"]["b"], eps=1e-6)
    k = layer_norm(k, block["norm_k"]["w"], block["norm_k"]["b"], eps=1e-6)
    # rope on video tokens only
    qv = apply_rope(q[:, lt:], rope_cos, rope_sin)
    kv_ = apply_rope(k[:, lt:], rope_cos, rope_sin)
    q = jnp.concatenate([q[:, :lt], qv], axis=1)
    k = jnp.concatenate([k[:, :lt], kv_], axis=1)
    attn = attn_fn(q, k, v, txt_len=lt).reshape(b, lt + li, d)
    attn = mm_fn(block["to_out"], attn)
    enc = enc + egate[:, None] * attn[:, :lt]
    x = x + gate[:, None] * attn[:, lt:]

    xn, en, gate, egate = _ada_dual(block["norm2_linear"], temb, x, enc,
                                    block["norm2_norm"]["w"], block["norm2_norm"]["b"], mm_fn)
    h = jnp.concatenate([en, xn], axis=1)
    h = mm_fn(block["ff_0"], h)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    h = mm_fn(block["ff_2"], h)
    enc = enc + egate[:, None] * h[:, :lt]
    x = x + gate[:, None] * h[:, lt:]
    return x, enc


def cog_forward(
    params: Params,
    latents: jnp.ndarray,         # (B, C, F, H, W) latent frames
    t: jnp.ndarray,               # (B,)
    context: jnp.ndarray,         # (B, text_len, text_dim)
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: CogArch,
    mm_type: str = "Default",
    attn_type: str = "flash_attn3",
) -> jnp.ndarray:
    mm_fn = resolve_mm("Default")
    b = latents.shape[0]
    p, p_t = arch.patch_size, arch.patch_size_t
    # pad frames to a p_t multiple (CogVideoX1.5 pads the temporal axis)
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

    mm_blk = resolve_mm(mm_type)

    def attn_fn(q, k, v, txt_len=None):
        return attention(attn_type, q, k, v)

    def body(carry, block):
        xc, ec = carry
        xc, ec = cog_block(block, xc, ec, temb, rope_cos, rope_sin, arch, mm_blk, attn_fn)
        return (xc, ec), None

    (x, enc), _ = jax.lax.scan(body, (x, enc), params["blocks"])

    # final norm over the joint stream, then AdaLN head (post_infer.py:15-26)
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


# ---------------------------------------------------------------------------

def load_cog_params(sd: Dict[str, np.ndarray], arch: CogArch, dtype=None) -> Params:
    import ml_dtypes

    dtype = dtype or ml_dtypes.bfloat16

    def lin(key):
        w = np.asarray(sd[f"{key}.weight"])
        p = {"w": w.astype(dtype) if w.dtype != np.dtype(dtype) else w}
        if f"{key}.bias" in sd:
            p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
        else:
            p["b"] = None
        return p

    def norm(key):
        return {"w": np.asarray(sd[f"{key}.weight"], np.float32),
                "b": np.asarray(sd[f"{key}.bias"], np.float32)}

    def block(i):
        pfx = f"transformer_blocks.{i}"
        return {
            "norm1_linear": lin(f"{pfx}.norm1.linear"),
            "norm1_norm": norm(f"{pfx}.norm1.norm"),
            "to_q": lin(f"{pfx}.attn1.to_q"),
            "to_k": lin(f"{pfx}.attn1.to_k"),
            "to_v": lin(f"{pfx}.attn1.to_v"),
            "norm_q": norm(f"{pfx}.attn1.norm_q"),
            "norm_k": norm(f"{pfx}.attn1.norm_k"),
            "to_out": lin(f"{pfx}.attn1.to_out.0"),
            "norm2_linear": lin(f"{pfx}.norm2.linear"),
            "norm2_norm": norm(f"{pfx}.norm2.norm"),
            "ff_0": lin(f"{pfx}.ff.net.0.proj"),
            "ff_2": lin(f"{pfx}.ff.net.2"),
        }

    blocks = [block(i) for i in range(arch.num_layers)]
    stacked = jax.tree_util.tree_map(
        lambda *ls: None if ls[0] is None else np.stack(ls), *blocks,
        is_leaf=lambda v: v is None)
    params = {
        "patch_proj": lin("patch_embed.proj"),
        "text_proj": lin("patch_embed.text_proj"),
        "time_embedding": {"1": lin("time_embedding.linear_1"), "2": lin("time_embedding.linear_2")},
        "blocks": stacked,
        "norm_final": norm("norm_final"),
        "norm_out_linear": lin("norm_out.linear"),
        "norm_out_norm": norm("norm_out.norm"),
        "proj_out": lin("proj_out"),
    }
    return jax.tree_util.tree_map(
        lambda v: None if v is None else jnp.asarray(v), params, is_leaf=lambda v: v is None)


def init_random_cog_state_dict(arch: CogArch, seed: int = 0, scale: float = 0.02) -> Dict[str, np.ndarray]:
    import ml_dtypes

    rng = np.random.default_rng(seed)
    pool = (rng.standard_normal(65537, dtype=np.float32) * scale).astype(ml_dtypes.bfloat16)
    _off = [0]

    def randn(*shape):
        _off[0] = (_off[0] + 10007) % len(pool)
        return np.resize(np.roll(pool, -_off[0]), shape)

    sd: Dict[str, np.ndarray] = {}
    d = arch.dim

    def lin(key, i, o):
        sd[f"{key}.weight"] = randn(o, i)
        sd[f"{key}.bias"] = randn(o)

    def norm(key, n_):
        sd[f"{key}.weight"] = np.ones(n_, np.float32)
        sd[f"{key}.bias"] = np.zeros(n_, np.float32)

    lin("patch_embed.proj", arch.in_channels * arch.patch_size_t * arch.patch_size**2, d)
    lin("patch_embed.text_proj", arch.text_dim, d)
    lin("time_embedding.linear_1", d, arch.time_embed_dim)
    lin("time_embedding.linear_2", arch.time_embed_dim, arch.time_embed_dim)
    for i in range(arch.num_layers):
        pfx = f"transformer_blocks.{i}"
        lin(f"{pfx}.norm1.linear", arch.time_embed_dim, 6 * d)
        norm(f"{pfx}.norm1.norm", d)
        for m in ("to_q", "to_k", "to_v"):
            lin(f"{pfx}.attn1.{m}", d, d)
        norm(f"{pfx}.attn1.norm_q", arch.head_dim)
        norm(f"{pfx}.attn1.norm_k", arch.head_dim)
        lin(f"{pfx}.attn1.to_out.0", d, d)
        lin(f"{pfx}.norm2.linear", arch.time_embed_dim, 6 * d)
        norm(f"{pfx}.norm2.norm", d)
        lin(f"{pfx}.ff.net.0.proj", d, 4 * d)
        lin(f"{pfx}.ff.net.2", 4 * d, d)
    norm("norm_final", d)
    lin("norm_out.linear", arch.time_embed_dim, 2 * d)
    norm("norm_out.norm", d)
    lin("proj_out", d, arch.patch_size_t * arch.out_channels * arch.patch_size**2)
    return sd


def init_random_cog_params_on_device(arch: CogArch, scheme: str = "bf16",
                                     seed: int = 0, scale: float = 0.02) -> Params:
    """Synthesize the full CogVideoX params pytree ON the accelerator
    (same rationale as wan/hunyuan: the tunneled bench chip cannot ship
    ~10 GB from host). Layouts match ``load_cog_params``; scheme
    "int8"/"fp8" quantizes every transformer-block linear (all of them
    run through mm_blk, cog_block above) with per-channel ``w_scale``."""
    import itertools

    import jax.random as jr

    d, ted = arch.dim, arch.time_embed_dim
    L = arch.num_layers
    cnt = itertools.count()

    def build(base):
        def nrm(shape, dtype=jnp.bfloat16, std=scale):
            return jr.normal(jr.fold_in(base, next(cnt)), shape, dtype) * jnp.asarray(std, dtype)

        def bf16lin(out, kin):
            return {"w": nrm((out, kin)), "b": nrm((out,), jnp.float32)}

        def qlin(out, kin):
            sh, bsh = (L, out, kin), (L, out)
            key = jr.fold_in(base, next(cnt))
            lin: Params = {"b": jr.normal(jr.fold_in(base, next(cnt)), bsh, jnp.float32) * scale}
            if scheme == "int8":
                lin["w"] = jr.randint(key, sh, -127, 128, jnp.int8)
                lin["w_scale"] = jnp.full(bsh, scale / 127.0, jnp.float32)
            elif scheme == "fp8":
                lin["w"] = (jr.normal(key, sh, jnp.bfloat16) * 100.0).astype(jnp.float8_e4m3fn)
                lin["w_scale"] = jnp.full(bsh, scale / 100.0, jnp.float32)
            else:
                lin["w"] = jr.normal(key, sh, jnp.bfloat16) * scale
            return lin

        def onesn(n_):
            return {"w": jnp.ones((L, n_), jnp.float32), "b": jnp.zeros((L, n_), jnp.float32)}

        p, pt = arch.patch_size, arch.patch_size_t
        params: Params = {
            "patch_proj": bf16lin(d, arch.in_channels * pt * p * p),
            "text_proj": bf16lin(d, arch.text_dim),
            "time_embedding": {"1": bf16lin(ted, d), "2": bf16lin(ted, ted)},
            "blocks": {
                "norm1_linear": qlin(6 * d, ted),
                "norm1_norm": onesn(d),
                "to_q": qlin(d, d), "to_k": qlin(d, d), "to_v": qlin(d, d),
                "norm_q": onesn(arch.head_dim), "norm_k": onesn(arch.head_dim),
                "to_out": qlin(d, d),
                "norm2_linear": qlin(6 * d, ted),
                "norm2_norm": onesn(d),
                "ff_0": qlin(4 * d, d),
                "ff_2": qlin(d, 4 * d),
            },
            "norm_final": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
            "norm_out_linear": bf16lin(2 * d, ted),
            "norm_out_norm": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
            "proj_out": bf16lin(pt * arch.out_channels * p * p, d),
        }
        return params

    return jax.jit(build)(jax.random.PRNGKey(seed))
