"""Wan2.1 DiT forward pass — pure JAX functions.

Mirrors the computation of the reference's WanPreInfer / WanTransformerInfer /
WanPostInfer (lightx2v/models/networks/wan/infer/{pre_infer.py:29-120,
transformer_infer.py:289-508, post_infer.py:15-50}) with a TPU-first
structure:

* the 30/40-block loop is a single ``lax.scan`` over stacked block weights
  (one compiled block body; weights stream HBM->VMEM per iteration);
* CFG runs as a batch axis (B=2 cond/uncond in one pass) instead of the
  reference's sequential double inference (model.py:213-218);
* patchify/unpatchify are reshape+matmul (stride==kernel conv == exact
  block reshape), keeping all FLOPs on the MXU;
* RoPE uses precomputed fp32 cos/sin grids (ops/rope.py) applied in pair
  form; timestep/text embeddings run in fp32, the bulk in bf16.

Everything here is shape-static and jittable; the denoise loop wraps
``wan_forward`` in ``lax.scan`` over steps (see runners/).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.linear import mm_ffn, resolve_mm
from ...ops.norms import layer_norm, modulated_layer_norm, rms_norm
from ...ops.rope import apply_rope, guidance_scale_embedding, sinusoidal_embedding_1d
from .config import WanArch

Params = Dict[str, Any]


def patchify(x: jnp.ndarray, patch: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, C, F, H, W) -> (B, S, C*pt*ph*pw), flattened (c, kt, kh, kw)."""
    b, c, f, h, w = x.shape
    pt, ph, pw = patch
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B, f, h, w, C, pt, ph, pw)
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(x: jnp.ndarray, grid: Tuple[int, int, int], patch: Tuple[int, int, int], out_dim: int) -> jnp.ndarray:
    """(B, S, pt*ph*pw*out_dim) -> (B, out_dim, F, H, W).

    Head output layout is (f, h, w, pt, ph, pw, c) with c fastest
    (reference unpatchify einsum 'fhwpqrc->cfphqwr', post_infer.py:41-50).
    """
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # (B, c, f, pt, h, ph, w, pw)
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def _mm(params: Params, x: jnp.ndarray, mm_fn) -> jnp.ndarray:
    return mm_fn(params, x)


def time_embeddings(params: Params, t: jnp.ndarray, arch: WanArch, cfg_scale: Optional[jnp.ndarray] = None):
    """timestep -> (embed (B, D) fp32, embed0 (B, 6, D) fp32).

    reference: pre_infer.py:64-78. ``t`` is (B,) (or (B, S) for diffusion
    forcing, giving (B, S, D) / (B, S, 6, D)).
    """
    mm = resolve_mm("Default-Force-FP32")
    sin_emb = sinusoidal_embedding_1d(arch.freq_dim, t)
    if cfg_scale is not None and "cfg_cond_proj" in params:
        cfg_emb = guidance_scale_embedding(cfg_scale, 256)
        sin_emb = sin_emb + _mm(params["cfg_cond_proj"], cfg_emb, mm)
    e = _mm(params["time_embedding"]["0"], sin_emb, mm)
    e = jax.nn.silu(e)
    embed = _mm(params["time_embedding"]["2"], e, mm)
    e0 = jax.nn.silu(embed)
    e0 = _mm(params["time_projection"]["1"], e0, mm)
    embed0 = e0.reshape(*e0.shape[:-1], 6, arch.dim)
    return embed, embed0


def text_embeddings(params: Params, context: jnp.ndarray, mm_fn) -> jnp.ndarray:
    """(B, Lt, text_dim) padded T5 context -> (B, Lt, D) bf16
    (reference pre_infer.py:89-96)."""
    h = _mm(params["text_embedding"]["0"], context.astype(jnp.bfloat16), mm_fn)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(jnp.bfloat16)
    return _mm(params["text_embedding"]["2"], h, mm_fn)


def img_embeddings(params: Params, clip_fea: jnp.ndarray, mm_fn, eps: float = 1e-6) -> jnp.ndarray:
    """i2v CLIP features (B, 257, clip_dim) -> (B, 257, D)
    (reference pre_infer.py:101-112: LN -> Linear -> GELU(exact) -> Linear -> LN)."""
    p = params["img_emb"]
    h = layer_norm(clip_fea.astype(jnp.float32), p["norm0"]["w"], p["norm0"]["b"], eps=eps)
    h = _mm(p["1"], h.astype(jnp.bfloat16), mm_fn)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
    h = _mm(p["3"], h, mm_fn)
    h = layer_norm(h, p["norm4"]["w"], p["norm4"]["b"], eps=eps)
    return h.astype(jnp.bfloat16)


def _split_modulation(block: Params, embed0: jnp.ndarray):
    """e = modulation + embed0 -> six (B, ..., 1, D)-broadcastable chunks.

    embed0: (B, 6, D) or (B, S, 6, D) (diffusion forcing).
    reference: transformer_infer.py:308-319."""
    mod = block["modulation"]  # (6, D) fp32
    e = mod + embed0.astype(jnp.float32)
    if e.ndim == 3:  # (B, 6, D) -> six (B, 1, D)
        chunks = [e[:, i : i + 1, :] for i in range(6)]
    else:  # (B, S, 6, D) -> six (B, S, D)
        chunks = [e[..., i, :] for i in range(6)]
    return chunks


def wan_block(
    block: Params,
    x: jnp.ndarray,
    embed0: jnp.ndarray,
    context: jnp.ndarray,
    context_img: Optional[jnp.ndarray],
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    mm_fn,
    self_attn_fn=None,
    cross_attn_fn=None,
) -> jnp.ndarray:
    """One DiT block (reference infer_block, transformer_infer.py:289-306).

    ``self_attn_fn`` / ``cross_attn_fn`` are dense-attention callables
    (q, k, v) -> out; the sequence-parallel path injects Ulysses-wrapped
    versions here."""
    x, _, _, _ = wan_block_parts(
        block, x, embed0, context, context_img, rope_cos, rope_sin,
        arch, mm_fn, self_attn_fn, cross_attn_fn)
    return x


def wan_block_parts(
    block: Params,
    x: jnp.ndarray,
    embed0: jnp.ndarray,
    context: jnp.ndarray,
    context_img: Optional[jnp.ndarray],
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    mm_fn,
    self_attn_fn=None,
    cross_attn_fn=None,
):
    """wan_block that also returns the per-module outputs
    (self-attn o-proj out, cross-attn o-proj out, FFN out) — the tensors
    TaylorSeer caches (feature_caching/transformer_infer.py:223-246)."""
    b, s, d = x.shape
    n, hd = arch.num_heads, arch.head_dim
    shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = _split_modulation(block, embed0)

    # ---- self attention ----
    sa = block["self_attn"]
    if "smooth_norm1" in block:
        # advanced_ptq smooth-quant affine (transformer_infer.py:322-327)
        xs = layer_norm(x, eps=arch.eps).astype(jnp.float32)
        w = (1.0 + scale_msa) * block["smooth_norm1"]["w"]
        bvec = shift_msa * block["smooth_norm1"]["b"]
        norm1 = (xs * w + bvec).astype(x.dtype)
    else:
        norm1 = modulated_layer_norm(x, shift_msa, scale_msa, eps=arch.eps)
    # QK RMSNorm acts on the full (S, D) projection before the head split
    # (reference transformer_infer.py:341-343)
    q = rms_norm(_mm(sa["q"], norm1, mm_fn), sa["norm_q"], eps=arch.eps).reshape(b, s, n, hd)
    k = rms_norm(_mm(sa["k"], norm1, mm_fn), sa["norm_k"], eps=arch.eps).reshape(b, s, n, hd)
    v = _mm(sa["v"], norm1, mm_fn).reshape(b, s, n, hd)
    if arch.rope_fused:
        # q/k are in half-split pair layout (weights permuted at load,
        # weights.py permute_qk_half); the attention op rotates in-kernel
        attn_out = self_attn_fn(q, k, v, rope_cos=rope_cos, rope_sin=rope_sin).reshape(b, s, d)
    else:
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn_out = self_attn_fn(q, k, v).reshape(b, s, d)
    y_sa = _mm(sa["o"], attn_out, mm_fn)
    x = (x.astype(jnp.float32) + y_sa.astype(jnp.float32) * gate_msa.astype(jnp.float32)).astype(x.dtype)

    # ---- cross attention ----
    ca = block["cross_attn"]
    norm3 = layer_norm(x, block["norm3"]["w"], block["norm3"]["b"], eps=arch.eps)
    cq = rms_norm(_mm(ca["q"], norm3, mm_fn), ca["norm_q"], eps=arch.eps).reshape(b, s, n, hd)
    ck = rms_norm(_mm(ca["k"], context, mm_fn), ca["norm_k"], eps=arch.eps).reshape(b, -1, n, hd)
    cv = _mm(ca["v"], context, mm_fn).reshape(b, -1, n, hd)
    cross_out = cross_attn_fn(cq, ck, cv).reshape(b, s, d)
    if context_img is not None and "k_img" in ca:
        ik = rms_norm(_mm(ca["k_img"], context_img, mm_fn), ca["norm_k_img"], eps=arch.eps).reshape(b, -1, n, hd)
        iv = _mm(ca["v_img"], context_img, mm_fn).reshape(b, -1, n, hd)
        cross_out = cross_out + cross_attn_fn(cq, ik, iv).reshape(b, s, d)
    cross_proj = _mm(ca["o"], cross_out, mm_fn)
    x = x + cross_proj

    # ---- FFN ----
    if "smooth_norm2" in block:
        xs = layer_norm(x, eps=arch.eps).astype(jnp.float32)
        w = (1.0 + c_scale) * block["smooth_norm2"]["w"]
        bvec = c_shift * block["smooth_norm2"]["b"]
        norm2 = (xs * w + bvec).astype(x.dtype)
    else:
        norm2 = modulated_layer_norm(x, c_shift, c_scale, eps=arch.eps)
    # on the quantized TPU path the WHOLE FFN runs as one Pallas kernel
    # (quantize -> GEMM -> gelu -> requantize -> GEMM, hidden tile kept in
    # VMEM); elsewhere mm -> gelu -> mm with gelu fused into the first
    # matmul where the mm type supports it (ops/linear.mm_ffn)
    y_ffn = mm_ffn(mm_fn, block["ffn"]["0"], block["ffn"]["2"], norm2)
    x = (x.astype(jnp.float32) + y_ffn.astype(jnp.float32) * c_gate.astype(jnp.float32)).astype(x.dtype)
    return x, y_sa, cross_proj, y_ffn


def wan_transformer(
    blocks: Params,
    x: jnp.ndarray,
    embed0: jnp.ndarray,
    context: jnp.ndarray,
    context_img: Optional[jnp.ndarray],
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    mm_type: str = "Default",
    self_attn_type: str = "flash_attn3",
    cross_attn_type: str = "flash_attn3",
    self_attn_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Scan the block stack (reference _infer_without_offload loop,
    transformer_infer.py:269-287).

    ``self_attn_kwargs["l1_per_layer"]`` (an (L,) array) threads a
    per-layer sparge mass budget through the scan as a traced xs leaf —
    the analog of the reference's per-block tuned (l1, pv_l1) tables from
    ``sparge_ckpt`` (transformer_weights.py:183-190). keep_ratio stays a
    shared static (it sets the top-k SHAPE); l1 only moves the dynamic
    per-row count, so it can vary layer to layer inside one compiled scan.

    ``self_attn_kwargs["dense_prefix"]`` (static int) runs the first p
    layers with dense flash attention instead of the sparse kernel.
    Motivated by tuned tables (tools/tune_sparge.py): early Wan layers
    are the least sparsifiable (structured-trajectory tables fail the
    leading layer(s) at every l1 candidate under a 25 dB bar), and the
    keep_ratio cap means even l1=0.0 cannot make a scanned layer dense.
    Implementation: ONE scan whose body lax.cond's the ATTENTION OP on a
    per-layer flag — both kernels compile once, the rest of the block is
    shared. (The first version scanned two sliced segments; slicing the
    stacked 14B weight pytree materialized multi-GB remat copies of the
    tail stack and OOMed the flagship — the cond form touches no
    weights.)"""
    mm_fn = resolve_mm(mm_type)
    kw = dict(self_attn_kwargs or {})
    l1_layers = kw.pop("l1_per_layer", None)
    dense_prefix = int(kw.pop("dense_prefix", 0) or 0)
    self_attn_fn = partial(attention, self_attn_type, **kw)
    cross_attn_fn = partial(attention, cross_attn_type)

    if dense_prefix > 0:
        num_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        p = min(dense_prefix, num_layers)
        dense_fn = partial(attention, "flash_attn3")
        is_dense = jnp.arange(num_layers) < p
        l1_arr = (jnp.zeros((num_layers,), jnp.float32) if l1_layers is None
                  else jnp.asarray(l1_layers, jnp.float32))

        def body(carry, xs):
            layer, l1, dense_flag = xs

            def attn(q, k, v, **akw):
                return jax.lax.cond(
                    dense_flag,
                    lambda q, k, v: dense_fn(q, k, v, **akw),
                    lambda q, k, v: self_attn_fn(q, k, v, l1=l1, **akw),
                    q, k, v)

            out = wan_block(
                layer, carry, embed0, context, context_img, rope_cos,
                rope_sin, arch, mm_fn, attn, cross_attn_fn,
            )
            return out, None

        x, _ = jax.lax.scan(body, x, (blocks, l1_arr, is_dense))
        return x

    if l1_layers is not None:
        l1_arr = jnp.asarray(l1_layers, jnp.float32)

        def body(carry, xs):
            layer, l1 = xs
            out = wan_block(
                layer, carry, embed0, context, context_img, rope_cos, rope_sin,
                arch, mm_fn, partial(self_attn_fn, l1=l1), cross_attn_fn,
            )
            return out, None

        x, _ = jax.lax.scan(body, x, (blocks, l1_arr))
        return x

    def body(carry, layer):
        out = wan_block(
            layer, carry, embed0, context, context_img, rope_cos, rope_sin,
            arch, mm_fn, self_attn_fn, cross_attn_fn,
        )
        return out, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def wan_head(params: Params, x: jnp.ndarray, embed: jnp.ndarray, arch: WanArch, mm_fn) -> jnp.ndarray:
    """Final AdaLN + linear head (reference post_infer.py:15-39)."""
    mod = params["head"]["modulation"]  # (2, D) fp32
    if embed.ndim == 2:  # (B, D)
        e = mod[None, :, :] + embed[:, None, :].astype(jnp.float32)  # (B, 2, D)
        shift, scale = e[:, 0:1, :], e[:, 1:2, :]
    else:  # diffusion forcing: (B, S, D)
        e = mod[None, :, None, :] + embed[:, None, :, :].astype(jnp.float32)
        shift, scale = e[:, 0], e[:, 1]
    out = modulated_layer_norm(x, shift, scale, eps=arch.eps)
    return _mm(params["head"], out, mm_fn)


def wan_pre_process(
    params: Params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    arch: WanArch,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    cfg_scale: Optional[jnp.ndarray] = None,
    seq_len: Optional[int] = None,
):
    """Patchify + embeddings (reference WanPreInfer, pre_infer.py:29-120).
    Returns (x, embed, embed0, ctx, ctx_img, grid, s_tokens)."""
    pt, ph, pw = arch.patch_size
    if y is not None:
        latents = jnp.concatenate([latents, y.astype(latents.dtype)], axis=1)
    grid = (latents.shape[2] // pt, latents.shape[3] // ph, latents.shape[4] // pw)

    # pre/post layers always run the Default bf16 GEMM; mm_type (quant)
    # applies only to the transformer blocks, as in the reference
    # (pre_weights.py / post_weights.py hardcode "Default").
    mm_fn = resolve_mm("Default")
    x = patchify(latents.astype(jnp.bfloat16), arch.patch_size)
    x = _mm(params["patch_embedding"], x, mm_fn)
    s_tokens = x.shape[1]
    if seq_len is not None and seq_len > s_tokens:
        x = jnp.pad(x, ((0, 0), (0, seq_len - s_tokens), (0, 0)))

    embed, embed0 = time_embeddings(params, t, arch, cfg_scale)
    ctx = text_embeddings(params, context, mm_fn)
    ctx_img = None
    if clip_fea is not None and "img_emb" in params:
        ctx_img = img_embeddings(params, clip_fea, mm_fn, eps=arch.eps)
    return x, embed, embed0, ctx, ctx_img, grid, s_tokens


def wan_post_process(params: Params, x: jnp.ndarray, embed: jnp.ndarray, grid, s_tokens: int, arch: WanArch) -> jnp.ndarray:
    """Head + unpatchify (reference WanPostInfer)."""
    out = wan_head(params, x, embed, arch, resolve_mm("Default"))
    out = out[:, :s_tokens]
    return unpatchify(out.astype(jnp.float32), grid, arch.patch_size, arch.out_dim)


def wan_forward(
    params: Params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    cfg_scale: Optional[jnp.ndarray] = None,
    mm_type: str = "Default",
    self_attn_type: str = "flash_attn3",
    cross_attn_type: str = "flash_attn3",
    seq_len: Optional[int] = None,
    transformer_fn=None,
    self_attn_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Full DiT forward: latents (B, C, F, H, W) + timestep + context ->
    flow prediction (B, out_dim, F, H, W).

    ``y`` is the i2v VAE/mask conditioning concatenated on channels
    (reference pre_infer.py:44-54); ``clip_fea`` the CLIP image tokens.
    ``seq_len`` optionally pads the token sequence to a bucket length
    (reference pads to scheduler.seq_len, pre_infer.py:62).
    """
    x, embed, embed0, ctx, ctx_img, grid, s_tokens = wan_pre_process(
        params, latents, t, context, arch, y=y, clip_fea=clip_fea,
        cfg_scale=cfg_scale, seq_len=seq_len,
    )
    if seq_len is not None and seq_len > s_tokens:
        # Mask the zero-embedding pad tokens out of self-attention K/V
        # (reference masks via seq_lens/cu_seqlens in its varlen kernels).
        self_attn_kwargs = dict(self_attn_kwargs or {})
        self_attn_kwargs.setdefault("kv_len", s_tokens)

    if transformer_fn is not None:
        # injected transformer (e.g. the shard_map'd sequence-parallel one)
        x = transformer_fn(params["blocks"], x, embed0, ctx, ctx_img)
    else:
        x = wan_transformer(
            params["blocks"], x, embed0, ctx, ctx_img, rope_cos, rope_sin,
            arch, mm_type, self_attn_type, cross_attn_type, self_attn_kwargs,
        )

    return wan_post_process(params, x, embed, grid, s_tokens, arch)


def wan_forward_cfg(
    params: Params,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    context_null: jnp.ndarray,
    guide_scale: float,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    arch: WanArch,
    **kw,
) -> jnp.ndarray:
    """Classifier-free guidance as one batched forward (B doubles).

    reference runs two sequential passes and combines
    ``uncond + scale*(cond - uncond)`` (model.py:213-218); batching them
    keeps the MXU at full occupancy for small-batch inference.
    """
    b = latents.shape[0]
    lat2 = jnp.concatenate([latents, latents], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    ctx2 = jnp.concatenate([context, context_null], axis=0)
    for key in ("y", "clip_fea"):
        if kw.get(key) is not None:
            kw[key] = jnp.concatenate([kw[key], kw[key]], axis=0)
    out = wan_forward(params, lat2, t2, ctx2, rope_cos, rope_sin, arch, **kw)
    cond, uncond = out[:b], out[b:]
    return uncond + guide_scale * (cond - uncond)
