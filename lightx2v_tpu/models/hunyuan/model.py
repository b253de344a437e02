"""HunyuanVideo MMDiT forward in pure JAX.

Computation mirrors the reference HunyuanPreInfer / HunyuanTransformerInfer /
HunyuanPostInfer (lightx2v/models/networks/hunyuan/infer/{pre_infer.py,
transformer_infer.py,post_infer.py}): 20 double-stream blocks (separate
img/txt weights, joint attention) + 40 single-stream blocks (fused
qkv+mlp linear1/linear2), text refiner (2 blocks) on Llama hidden states,
CLIP pooled vector conditioning, embedded-guidance conditioning, rope
theta 256 with dims (16, 56, 56), i2v token_replace modulation for the
first frame's tokens.

TPU structure: double and single stacks are two ``lax.scan``s over stacked
weights; tokens are ordered [img; txt] with a dynamic valid-length scalar
feeding the flash kernel's SMEM mask (no recompilation across prompt
lengths).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.linear import resolve_mm
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import apply_rope
from .config import HunyuanArch

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# RoPE (theta 256, per-axis dims, RIFLEx temporal extrapolation)
# --------------------------------------------------------------------------

def build_hunyuan_rope(
    arch: HunyuanArch, f: int, h: int, w: int,
    riflex_k: Optional[int] = None, l_test: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin (f*h*w, head_dim//2). RIFLEx (reference scheduler.py:182-236)
    lowers the k-th temporal intrinsic frequency for >192-frame extrapolation."""
    sizes = (f, h, w)
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(arch.rope_dim_list):
        freqs = 1.0 / (arch.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        if i == 0 and riflex_k is not None:
            freqs[riflex_k - 1] = 0.9 * 2 * np.pi / l_test
        pos = np.arange(sizes[i], dtype=np.float64)
        ang = np.outer(pos, freqs)  # (size, dim/2)
        shape = [1, 1, 1, ang.shape[1]]
        shape[i] = sizes[i]
        ang = np.broadcast_to(ang.reshape(shape), (f, h, w, ang.shape[1]))
        cos_parts.append(np.cos(ang))
        sin_parts.append(np.sin(ang))
    cos = np.concatenate(cos_parts, axis=-1).reshape(f * h * w, -1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).reshape(f * h * w, -1).astype(np.float32)
    return cos, sin


def riflex_k_for(video_length: int, l_train: int = 25) -> Optional[int]:
    """reference scheduler.py:330-334."""
    if video_length <= 192:
        return None
    k = 2 + ((video_length + 3) // (4 * l_train))
    return max(4, min(8, k))


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------

def _timestep_embedding(t: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """[cos | sin] halves with freqs exp(-log(1e4)*i/128) (reference
    pre_infer.py:63-66)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp2(p: Params, x, mm_fn):
    return mm_fn(p["2"], jax.nn.silu(mm_fn(p["0"], x).astype(jnp.float32)).astype(x.dtype))


def _refiner_block(p: Params, x: jnp.ndarray, c: jnp.ndarray, mask_bias: Optional[jnp.ndarray],
                   arch: HunyuanArch, mm_fn) -> jnp.ndarray:
    """Token refiner block (reference pre_infer.py:102-140): LN(affine) ->
    qkv self-attn (with text mask) gated by adaLN, then MLP(silu) gated."""
    b, L, d = x.shape
    n, hd = arch.heads_num, arch.head_dim
    cx = jax.nn.silu(c.astype(jnp.float32)).astype(x.dtype)
    gates = mm_fn(p["adaLN"], cx)  # (B, 2D)
    gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)
    normx = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=1e-6)
    qkv = mm_fn(p["qkv"], normx).reshape(b, L, 3, n, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(hd)
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, L, d)
    x = x + mm_fn(p["proj"], attn) * gate_msa[:, None, :]
    h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=1e-6)
    h = mm_fn(p["mlp_fc2"], jax.nn.silu(mm_fn(p["mlp_fc1"], h).astype(jnp.float32)).astype(x.dtype))
    return x + h * gate_mlp[:, None, :]


def hunyuan_pre_process(
    params: Params,
    latents: jnp.ndarray,          # (B, C, F, H, W)
    t: jnp.ndarray,                # (B,)
    text_states: jnp.ndarray,      # (B, Lt, 4096) Llama hidden
    text_mask: jnp.ndarray,        # (B, Lt)
    text_states_2: jnp.ndarray,    # (B, 768) CLIP pooled
    guidance: Optional[jnp.ndarray],
    arch: HunyuanArch,
):
    """reference pre_infer.py:14-61. Returns (img, txt, vec,
    token_replace_vec, grid)."""
    mm_fn = resolve_mm("Default")
    b = latents.shape[0]
    pt, ph, pw = arch.patch_size
    grid = (latents.shape[2] // pt, latents.shape[3] // ph, latents.shape[4] // pw)

    # img_in: stride==kernel conv3d == reshape+matmul (weights flattened at load)
    from ..wan.model import patchify

    img = mm_fn(params["img_in"], patchify(latents.astype(jnp.bfloat16), arch.patch_size))

    vec = _mlp2(params["time_in"], _timestep_embedding(t).astype(jnp.bfloat16), mm_fn)
    vec = vec + _mlp2(params["vector_in"], text_states_2.astype(jnp.bfloat16), mm_fn)
    if guidance is not None and "guidance_in" in params:
        vec = vec + _mlp2(params["guidance_in"], _timestep_embedding(guidance).astype(jnp.bfloat16), mm_fn)

    token_replace_vec = None
    if arch.task == "i2v":
        trv = _mlp2(params["time_in"], _timestep_embedding(jnp.zeros_like(t)).astype(jnp.bfloat16), mm_fn)
        token_replace_vec = trv + _mlp2(params["vector_in"], text_states_2.astype(jnp.bfloat16), mm_fn)

    # text refiner (reference pre_infer.py:77-140)
    ts = text_states.astype(jnp.bfloat16)
    temb = _mlp2(params["txt_in"]["t_embedder"], _timestep_embedding(t).astype(jnp.bfloat16), mm_fn)
    maskf = text_mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(ts.astype(jnp.float32) * maskf, axis=1) / jnp.maximum(jnp.sum(maskf, axis=1), 1e-6)
    cemb1 = mm_fn(params["txt_in"]["c_embedder_1"], pooled.astype(jnp.bfloat16))
    cemb = mm_fn(params["txt_in"]["c_embedder_2"], jax.nn.silu(cemb1.astype(jnp.float32)).astype(jnp.bfloat16))
    c = temb + cemb
    txt = mm_fn(params["txt_in"]["input_embedder"], ts)
    m1 = text_mask[:, None, None, :].astype(bool)
    mask = m1 & jnp.transpose(m1, (0, 1, 3, 2))
    mask = mask.at[:, :, :, 0].set(True)
    bias = jnp.where(mask, 0.0, jnp.float32(-1e9))
    for rb in params["txt_in"]["refiner"]:
        txt = _refiner_block(rb, txt, c, bias, arch, mm_fn)

    return img, txt, vec, token_replace_vec, grid


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

def _modulate(x, shift, scale, tr_shift=None, tr_scale=None, tr_len: int = 0):
    """AdaLN modulation; the first ``tr_len`` tokens (i2v token_replace) use
    the t=0 modulation (reference transformer_infer.py:283-289)."""
    out = x * (1.0 + scale[:, None, :]) + shift[:, None, :]
    if tr_shift is not None and tr_len > 0:
        tr_out = x * (1.0 + tr_scale[:, None, :]) + tr_shift[:, None, :]
        idx = jnp.arange(x.shape[1])[None, :, None] < tr_len
        out = jnp.where(idx, tr_out, out)
    return out


def _gate(out, gate, tr_gate=None, tr_len: int = 0):
    g = out * gate[:, None, :]
    if tr_gate is not None and tr_len > 0:
        tg = out * tr_gate[:, None, :]
        idx = jnp.arange(out.shape[1])[None, :, None] < tr_len
        g = jnp.where(idx, tg, g)
    return g


def hunyuan_double_block(
    block: Params, img, txt, vec_silu, tr_vec_silu, rope_cos, rope_sin,
    kv_len, arch: HunyuanArch, mm_fn, attn_fn, tr_len: int = 0,
):
    b, li, d = img.shape
    lt = txt.shape[1]
    n, hd = arch.heads_num, arch.head_dim

    img_mod = mm_fn(block["img_mod"], vec_silu)
    im1s, im1c, im1g, im2s, im2c, im2g = jnp.split(img_mod, 6, axis=-1)
    txt_mod = mm_fn(block["txt_mod"], vec_silu)
    tm1s, tm1c, tm1g, tm2s, tm2c, tm2g = jnp.split(txt_mod, 6, axis=-1)
    trs = [None] * 6
    if tr_vec_silu is not None:
        trs = jnp.split(mm_fn(block["img_mod"], tr_vec_silu), 6, axis=-1)

    # img stream attention inputs
    img_ln = layer_norm(img, eps=1e-6)
    img_m = _modulate(img_ln, im1s, im1c, trs[0], trs[1], tr_len)
    iqkv = mm_fn(block["img_attn_qkv"], img_m).reshape(b, li, 3, n, hd)
    iq = rms_norm(iqkv[:, :, 0], block["img_attn_q_norm"], eps=1e-6)
    ik = rms_norm(iqkv[:, :, 1], block["img_attn_k_norm"], eps=1e-6)
    iv = iqkv[:, :, 2]
    iq = apply_rope(iq, rope_cos, rope_sin)
    ik = apply_rope(ik, rope_cos, rope_sin)

    txt_ln = layer_norm(txt, eps=1e-6)
    txt_m = _modulate(txt_ln, tm1s, tm1c)
    tqkv = mm_fn(block["txt_attn_qkv"], txt_m).reshape(b, lt, 3, n, hd)
    tq = rms_norm(tqkv[:, :, 0], block["txt_attn_q_norm"], eps=1e-6)
    tk = rms_norm(tqkv[:, :, 1], block["txt_attn_k_norm"], eps=1e-6)
    tv = tqkv[:, :, 2]

    q = jnp.concatenate([iq, tq], axis=1)
    k = jnp.concatenate([ik, tk], axis=1)
    v = jnp.concatenate([iv, tv], axis=1)
    attn = attn_fn(q, k, v, kv_len=kv_len, img_len=li)
    img_attn = attn[:, :li].reshape(b, li, d)
    txt_attn = attn[:, li:].reshape(b, lt, d)

    img = img + _gate(mm_fn(block["img_attn_proj"], img_attn), im1g, trs[2], tr_len)
    img_h = _modulate(layer_norm(img, eps=1e-6), im2s, im2c, trs[3], trs[4], tr_len)
    img_h = mm_fn(block["img_mlp_fc1"], img_h)
    img_h = jax.nn.gelu(img_h.astype(jnp.float32), approximate=True).astype(img.dtype)
    img = img + _gate(mm_fn(block["img_mlp_fc2"], img_h), im2g, trs[5], tr_len)

    txt = txt + mm_fn(block["txt_attn_proj"], txt_attn) * tm1g[:, None, :]
    txt_h = _modulate(layer_norm(txt, eps=1e-6), tm2s, tm2c)
    txt_h = mm_fn(block["txt_mlp_fc1"], txt_h)
    txt_h = jax.nn.gelu(txt_h.astype(jnp.float32), approximate=True).astype(txt.dtype)
    txt = txt + mm_fn(block["txt_mlp_fc2"], txt_h) * tm2g[:, None, :]
    return img, txt


def hunyuan_single_block(
    block: Params, x, vec_silu, tr_vec_silu, img_len: int, rope_cos, rope_sin,
    kv_len, arch: HunyuanArch, mm_fn, attn_fn, tr_len: int = 0,
):
    b, L, d = x.shape
    n, hd = arch.heads_num, arch.head_dim
    mod = mm_fn(block["modulation"], vec_silu)
    ms, mc, mg = jnp.split(mod, 3, axis=-1)
    tr_ms = tr_mc = tr_mg = None
    if tr_vec_silu is not None:
        tr_ms, tr_mc, tr_mg = jnp.split(mm_fn(block["modulation"], tr_vec_silu), 3, axis=-1)

    x_m = _modulate(layer_norm(x, eps=1e-6), ms, mc, tr_ms, tr_mc, tr_len)
    h = mm_fn(block["linear1"], x_m)
    qkv, mlp = h[..., : 3 * d], h[..., 3 * d :]
    qkv = qkv.reshape(b, L, 3, n, hd)
    q = rms_norm(qkv[:, :, 0], block["q_norm"], eps=1e-6)
    k = rms_norm(qkv[:, :, 1], block["k_norm"], eps=1e-6)
    v = qkv[:, :, 2]
    # rope applies to img tokens only (reference :341-343)
    iq = apply_rope(q[:, :img_len], rope_cos, rope_sin)
    ik = apply_rope(k[:, :img_len], rope_cos, rope_sin)
    q = jnp.concatenate([iq, q[:, img_len:]], axis=1)
    k = jnp.concatenate([ik, k[:, img_len:]], axis=1)
    attn = attn_fn(q, k, v, kv_len=kv_len, img_len=img_len).reshape(b, L, d)
    mlp = jax.nn.gelu(mlp.astype(jnp.float32), approximate=True).astype(x.dtype)
    out = mm_fn(block["linear2"], jnp.concatenate([attn, mlp], axis=-1))
    return x + _gate(out, mg, tr_mg, tr_len)


def hunyuan_forward(
    params: Params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    text_states: jnp.ndarray,
    text_mask: jnp.ndarray,
    text_states_2: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: HunyuanArch,
    guidance: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    attn_type: str = "flash_attn3",
    token_replace: bool = False,
) -> jnp.ndarray:
    """(B, C, F, H, W) + conditioning -> flow prediction, same shape."""
    img, txt, vec, tr_vec, grid = hunyuan_pre_process(
        params, latents, t, text_states, text_mask, text_states_2, guidance, arch
    )
    b, li, d = img.shape
    lt = txt.shape[1]
    mm_fn = resolve_mm(mm_type)
    vec_silu = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    tr_vec_silu = None
    tr_len = 0
    if token_replace and tr_vec is not None:
        tr_vec_silu = jax.nn.silu(tr_vec.astype(jnp.float32)).astype(img.dtype)
        tr_len = grid[1] * grid[2]  # first latent frame's tokens

    # dynamic valid length: img tokens + actual text length
    kv_len = li + jnp.sum(text_mask[0] > 0).astype(jnp.int32)

    def attn_fn(q, k, v, kv_len=None, img_len=None):
        return attention(attn_type, q, k, v, kv_len=kv_len)

    def dbody(carry, block):
        im, tx = carry
        im, tx = hunyuan_double_block(block, im, tx, vec_silu, tr_vec_silu,
                                      rope_cos, rope_sin, kv_len, arch, mm_fn, attn_fn, tr_len)
        return (im, tx), None

    (img, txt), _ = jax.lax.scan(dbody, (img, txt), params["double_blocks"])

    x = jnp.concatenate([img, txt], axis=1)

    def sbody(carry, block):
        out = hunyuan_single_block(block, carry, vec_silu, tr_vec_silu, li,
                                   rope_cos, rope_sin, kv_len, arch, mm_fn, attn_fn, tr_len)
        return out, None

    x, _ = jax.lax.scan(sbody, x, params["single_blocks"])
    img = x[:, :li]

    # final layer (reference post_infer.py:11-33)
    mmd = resolve_mm("Default")
    sv = jax.nn.silu(vec.astype(jnp.float32)).astype(img.dtype)
    mod = mmd(params["final_layer"]["adaLN"], sv)
    shift, scale = jnp.split(mod, 2, axis=-1)
    out = layer_norm(img, eps=1e-6)
    out = out * (1.0 + scale[:, None, :]) + shift[:, None, :]
    out = resolve_mm("Default-Force-FP32")(params["final_layer"]["linear"], out)

    from ..wan.model import unpatchify

    # head output layout (t, h, w, c, pt, ph, pw) with einsum nthwcopq->nctohpwq
    f, h, w = grid
    pt, ph, pw = arch.patch_size
    c = arch.out_channels
    out = out.reshape(b, f, h, w, c, pt, ph, pw)
    out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return out.reshape(b, c, f * pt, h * ph, w * pw)
