"""Wan2.1 causal 3D video VAE (encoder + decoder), TPU-native.

Architecture (reference: lightx2v/models/video_encoders/hf/wan/vae.py):
dim=96, z=16, dim_mult [1,2,4,4], 2 res blocks per stage, temporal
downsample [False, True, True] (so stride (4, 8, 8) overall), RMS-norm +
SiLU + causal 3x3x3 convs, single middle attention block, 1x1 conv to
mu/logvar, per-channel latent mean/std stats.

TPU-first redesign of the streaming decode: the reference walks frames in
a Python loop threading per-conv ``feat_cache`` dicts through module
forwards (vae.py:695-739). Here the stream is two compiled programs:

  * ``*_first``: processes the first frame chunk (which bypasses temporal
    up/down-sampling — that's why T latent frames decode to (T-1)*4+1
    video frames) and RETURNS the initial cache pytree;
  * ``*_step``: a ``lax.scan`` body over the remaining frames with the
    cache pytree as carry — every causal conv consumes (cache, x) and
    emits its new 2-frame cache.

All shapes are static; layout is channels-last (B, T, H, W, C) which is
what the TPU convolution engine wants. Weights come straight from the
torch checkpoint's state_dict keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CACHE_T = 2

# Wan2.1 latent distribution stats (reference vae.py:804-841)
WAN_LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
WAN_LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


@dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))


# --------------------------------------------------------------------------
# primitives (channels-last)
# --------------------------------------------------------------------------

def _conv_any(p: Dict, x: jnp.ndarray, window_strides, padding, dn) -> jnp.ndarray:
    """Run one conv from a param dict; dispatches on quantization.

    bf16 path: ``p = {w, b}``. int8 path: ``p = {w: int8, w_scale: (O,)
    fp32, b}`` (see ``quantize_vae_decoder_int8``) — activations are
    quantized per-tensor dynamic symmetric int8, the conv accumulates in
    int32 on the MXU (2x bf16 throughput on v5e), and the output is
    rescaled by ``act_scale * w_scale`` per output channel. Mirrors the
    reference's w8a8 GEMM recipe (mm_weight.py per-channel dynamic
    activation quant) applied to the VAE's convs."""
    w = p["w"]
    if "w_scale" in p:
        a_s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s), -127, 127).astype(jnp.int8)
        out = jax.lax.conv_general_dilated(
            xq, w, window_strides=window_strides, padding=padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        out = out.astype(jnp.float32) * (a_s * p["w_scale"].astype(jnp.float32))
        if p.get("b") is not None:
            out = out + p["b"].astype(jnp.float32)
        return out.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=window_strides, padding=padding,
        dimension_numbers=dn,
    )
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def cconv3d(p: Dict, x: jnp.ndarray, cache: Optional[jnp.ndarray], t_stride: int = 1,
            causal_pad: bool = True) -> jnp.ndarray:
    """Causal 3D conv. x (B,T,H,W,C); weight (kt,kh,kw,I,O) from torch
    (O,I,kt,kh,kw). ``cache`` supplies the temporal left context (else
    zero-pad by kt-1). Spatial padding is SAME-style symmetric (kh//2).
    ``causal_pad=False`` gives a temporally-valid conv (the encoder's
    stride-2 time_conv has padding=0 in the reference, vae.py:100)."""
    w = p["w"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    pad_t = (kt - 1) if causal_pad else 0
    if pad_t > 0 or cache is not None:
        if cache is not None:
            x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            pad_t = max(pad_t - cache.shape[1], 0)
        if pad_t > 0:
            x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
    return _conv_any(
        p, x, window_strides=(t_stride, 1, 1),
        padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dn=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv2d(p: Dict, x: jnp.ndarray, stride: int = 1, pad: Any = "same") -> jnp.ndarray:
    """Per-frame 2D conv on (B,T,H,W,C) (maps over T). weight (kh,kw,I,O)."""
    w = p["w"]
    kh, kw = w.shape[0], w.shape[1]
    b, t = x.shape[0], x.shape[1]
    xf = x.reshape(b * t, *x.shape[2:])
    if pad == "same":
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    else:
        padding = pad  # explicit ((top,bottom),(left,right))
    out = _conv_any(p, xf, window_strides=(stride, stride), padding=padding,
                    dn=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, t, *out.shape[1:])


def quantize_vae_decoder_int8(params: Dict) -> Dict:
    """Quantize the decoder's FLOP-carrying convs to per-output-channel
    symmetric int8 (consumed by ``_conv_any``'s w8a8 path).

    Kept in bf16 for quality: the final ``head_conv`` (3-channel output,
    negligible FLOPs, directly visible in frames) and the mid-block
    attention's ``to_qkv``/``proj`` 1x1 convs (softmax inputs are
    scale-sensitive and the mid block runs at the lowest resolution).
    The reference has no VAE quantization — this is a TPU-native decode
    optimization gated behind config ``vae_int8`` / BENCH_VAE_INT8.

    Given the full VAE tree ({encoder, decoder, conv1, conv2}), only the
    ``decoder`` subtree is quantized — the encoder (i2v conditioning) and
    the tiny quant/post-quant 1x1 convs stay bf16."""
    skip = {"head_conv", "to_qkv", "proj"}

    if isinstance(params, dict) and "decoder" in params and "encoder" in params:
        out = dict(params)
        out["decoder"] = quantize_vae_decoder_int8(params["decoder"])
        return out

    def quant(lin: Dict) -> Dict:
        w = np.asarray(lin["w"], np.float32) if isinstance(lin["w"], np.ndarray) \
            else lin["w"].astype(jnp.float32)
        red = tuple(range(w.ndim - 1))  # all but the trailing O axis
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=red), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out = {"w": q, "w_scale": s}
        if lin.get("b") is not None:
            out["b"] = lin["b"]
        return out

    def walk(node, key=""):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim in (4, 5) \
                    and key not in skip and jnp.issubdtype(node["w"].dtype, jnp.floating):
                return quant(node)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, key) for v in node]
        return node

    return walk(params)


def rms_norm_ch(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """The VAE's RMS_norm: F.normalize over channels * sqrt(C) * gamma
    (reference vae.py:46-59). Channels-last: normalize the final axis."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
    c = x.shape[-1]
    out = xf / norm * np.sqrt(c) * p["g"].astype(jnp.float32)
    return out.astype(x.dtype)


def spatial_attention(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head per-frame spatial self-attention (reference vae.py:231-273).

    Tiled decode tokens (32x32 latent = 1024) materialize the logits
    directly; the UNTILED 480P/720P mid-block is 6-14k tokens whose
    (HW)^2 fp32 logits cost hundreds of MB x chunk frames — those route
    through the online-softmax chunked path (same math, O(S*chunk))."""
    b, t, h, w, c = x.shape
    identity = x
    xn = rms_norm_ch(p["norm"], x)
    qkv = conv2d(p["to_qkv"], xn)  # (B,T,H,W,3C)
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    if h * w > 4096:
        from ..ops.attention import attn_xla_chunked

        out = attn_xla_chunked(q[:, :, None], k[:, :, None], v[:, :, None])
        out = out[:, :, 0].reshape(b, t, h, w, c)
    else:
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, t, h, w, c)
    out = conv2d(p["proj"], out)
    return identity + out


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B,T,H,W,C) -> (B,T,2H,2W,C), nearest-exact."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


# --------------------------------------------------------------------------
# cache-threading helpers: every causal conv with kt>1 pulls its cache from
# a flat list by traversal order (mirrors the reference feat_idx discipline)
# --------------------------------------------------------------------------

class CacheTape:
    """Reads caches (prev run) and records new caches (this run)."""

    def __init__(self, prev: Optional[List]):
        self.prev = prev
        self.idx = 0
        self.new: List = []

    def pull(self):
        if self.prev is None:
            self.idx += 1
            return None
        c = self.prev[self.idx]
        self.idx += 1
        return c

    def push(self, new_cache):
        self.new.append(new_cache)


def _tail(x: jnp.ndarray, n: int = CACHE_T) -> jnp.ndarray:
    """Last n frames of x, left-padded with zeros if x is shorter."""
    t = x.shape[1]
    if t >= n:
        return x[:, t - n :]
    pad = n - t
    return jnp.concatenate([jnp.zeros((x.shape[0], pad, *x.shape[2:]), x.dtype), x], axis=1)


def cconv3d_cached(p: Dict, x: jnp.ndarray, tape: CacheTape, t_stride: int = 1) -> jnp.ndarray:
    cache = tape.pull()
    # next-call cache = last CACHE_T frames of the cumulative input stream
    # (reference keeps [prev_cache[-1], x] when the chunk is 1 frame,
    # vae.py:210-216)
    stream = x if cache is None else jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    tape.push(_tail(stream))
    return cconv3d(p, x, cache, t_stride=t_stride)


def residual_block(p: Dict, x: jnp.ndarray, tape: CacheTape) -> jnp.ndarray:
    h = cconv3d(p["shortcut"], x, None) if "shortcut" in p else x
    y = rms_norm_ch(p["norm1"], x)
    y = jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)
    y = cconv3d_cached(p["conv1"], y, tape)
    y = rms_norm_ch(p["norm2"], y)
    y = jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)
    y = cconv3d_cached(p["conv2"], y, tape)
    return y + h


def upsample3d_time(p: Dict, x: jnp.ndarray, tape: CacheTape, first: bool) -> jnp.ndarray:
    """Temporal 2x for the decoder (reference Resample upsample3d,
    vae.py:104-139). First chunk bypasses (keeps 1 frame); later chunks run
    the causal time_conv (which never sees frame 0 — the 'Rep' zero-cache
    semantics) and interleave the doubled channels into doubled time."""
    if first:
        # record the 'Rep' state as a zero cache (time_conv never saw x0)
        tape.push(jnp.zeros((x.shape[0], CACHE_T, *x.shape[2:]), x.dtype))
        return x
    cache = tape.pull()
    tape.push(_tail(jnp.concatenate([cache.astype(x.dtype), x], axis=1)))
    y = cconv3d(p["time_conv"], x, cache)  # (B,T,H,W,2C)
    b, t, h, w, c2 = y.shape
    c = c2 // 2
    # channel pairs -> adjacent frames: reference reshapes (b,2,c,t,...) and
    # stacks on the time axis (vae.py:136-138)
    y = y.reshape(b, t, h, w, 2, c)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, t * 2, h, w, c)
    return y


def downsample3d_time(p: Dict, x: jnp.ndarray, tape: CacheTape, first: bool) -> jnp.ndarray:
    """Temporal stride-2 for the encoder (reference vae.py:144-159)."""
    if first:
        tape.push(x[:, -1:])
        return x
    cache = tape.pull()
    tape.push(x[:, -1:])
    full = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    return cconv3d(p["time_conv"], full, None, t_stride=2, causal_pad=False)


# --------------------------------------------------------------------------
# encoder / decoder cores (one chunk at a time)
# --------------------------------------------------------------------------

def encoder_chunk(params: Dict, cfg: WanVAEConfig, x: jnp.ndarray, tape: CacheTape, first: bool) -> jnp.ndarray:
    """x: (B, t, H, W, 3) pixel chunk -> (B, t', H/8, W/8, 2*z)."""
    x = cconv3d_cached(params["conv1"], x, tape)
    for si, stage in enumerate(params["down"]):
        for rb in stage["blocks"]:
            x = residual_block(rb, x, tape)
        if "resample" in stage:
            r = stage["resample"]
            if r["mode"] == "downsample3d":
                x = conv2d(r["conv"], x, stride=2, pad=((0, 1), (0, 1)))
                x = downsample3d_time(r, x, tape, first)
            elif r["mode"] == "downsample2d":
                x = conv2d(r["conv"], x, stride=2, pad=((0, 1), (0, 1)))
    x = residual_block(params["mid_res1"], x, tape)
    x = spatial_attention(params["mid_attn"], x)
    x = residual_block(params["mid_res2"], x, tape)
    x = rms_norm_ch(params["head_norm"], x)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = cconv3d_cached(params["head_conv"], x, tape)
    return x


def decoder_chunk(params: Dict, cfg: WanVAEConfig, x: jnp.ndarray, tape: CacheTape, first: bool) -> jnp.ndarray:
    """x: (B, 1, h, w, z) latent frame -> (B, 1 or 4, 8h, 8w, 3)."""
    x = cconv3d_cached(params["conv1"], x, tape)
    x = residual_block(params["mid_res1"], x, tape)
    x = spatial_attention(params["mid_attn"], x)
    x = residual_block(params["mid_res2"], x, tape)
    for stage in params["up"]:
        for rb in stage["blocks"]:
            x = residual_block(rb, x, tape)
        if "resample" in stage:
            r = stage["resample"]
            if r["mode"] == "upsample3d":
                x = upsample3d_time(r, x, tape, first)
                x = upsample_nearest2x(x)
                x = conv2d(r["conv"], x)
            elif r["mode"] == "upsample2d":
                x = upsample_nearest2x(x)
                x = conv2d(r["conv"], x)
    x = rms_norm_ch(params["head_norm"], x)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = cconv3d_cached(params["head_conv"], x, tape)
    return x


# --------------------------------------------------------------------------
# streaming encode / decode (first call + lax.scan)
# --------------------------------------------------------------------------

def vae_decode(params: Dict, z: jnp.ndarray, cfg: WanVAEConfig = WanVAEConfig(),
               scale: bool = True, dtype=jnp.float32, chunk: int = 4) -> jnp.ndarray:
    """z: (B, T, h, w, z_dim) normalized latents -> (B, (T-1)*4+1, 8h, 8w, 3).

    reference decode loop: vae.py:715-739 (per-frame with feat cache).

    ``chunk`` latent frames decode per scan step (the largest divisor of
    T-1 that is <= chunk is used). Every causal conv's window only sees
    frames i-2..i, so feeding k frames with the same 2-frame cache chain
    computes bit-identical windows to the per-frame stream — but the
    convs run k x larger N*T batches on the MXU and the sequential scan
    is k x shorter. Memory grows ~k x in activations; chunk=4 keeps the
    full-resolution intermediates of a 480P untiled decode under ~2 GB.
    """
    if scale:
        mean = jnp.asarray(WAN_LATENT_MEAN, jnp.float32)
        std = jnp.asarray(WAN_LATENT_STD, jnp.float32)
        z = z.astype(jnp.float32) * std + mean
    z = z.astype(dtype)
    z = cconv3d(params["conv2"], z, None)  # 1x1x1

    tape = CacheTape(None)
    out0 = decoder_chunk(params["decoder"], cfg, z[:, :1], tape, first=True)
    cache0 = tape.new

    if z.shape[1] == 1:
        return out0.astype(jnp.float32)

    t1 = z.shape[1] - 1
    k = max(d for d in range(1, max(1, min(chunk, t1)) + 1) if t1 % d == 0)

    def body(cache, zc):
        tape = CacheTape(cache)
        out = decoder_chunk(params["decoder"], cfg, zc, tape, first=False)
        return tape.new, out

    # scan over remaining latent frames in chunks; zs: (T-1)/k, B, k, h, w, z)
    bsz = z.shape[0]
    zs = z[:, 1:].reshape(bsz, t1 // k, k, *z.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
    _, outs = jax.lax.scan(body, cache0, zs)
    # outs: ((T-1)/k, B, 4k, H, W, 3)
    rest = outs.transpose(1, 0, 2, 3, 4, 5).reshape(bsz, t1 * 4, *out0.shape[2:])
    return jnp.concatenate([out0, rest], axis=1).astype(jnp.float32)


def vae_encode(params: Dict, x: jnp.ndarray, cfg: WanVAEConfig = WanVAEConfig(),
               scale: bool = True, dtype=jnp.float32, rng: Optional[jax.Array] = None,
               chunk: int = 4) -> jnp.ndarray:
    """x: (B, T, H, W, 3) pixels (T = 4k+1) -> (B, (T-1)//4+1, H/8, W/8, z)
    normalized mu (reference encode: vae.py:687-713).

    ``chunk`` latent steps (4*chunk pixel frames) encode per scan step —
    same window-identical argument as the chunked decode: causal convs
    keep a 2-frame cache and the stride-2 time conv's windows align
    across any chunking of the stream."""
    x = x.astype(dtype)
    tape = CacheTape(None)
    out0 = encoder_chunk(params["encoder"], cfg, x[:, :1], tape, first=True)
    cache0 = tape.new

    t = x.shape[1]
    if t > 1:
        n_chunks = (t - 1) // 4
        k = max(d for d in range(1, max(1, min(chunk, n_chunks)) + 1) if n_chunks % d == 0)
        xs = x[:, 1:].reshape(x.shape[0], n_chunks // k, 4 * k, *x.shape[2:]).transpose(1, 0, 2, 3, 4, 5)

        def body(cache, xc):
            tape = CacheTape(cache)
            out = encoder_chunk(params["encoder"], cfg, xc, tape, first=False)
            return tape.new, out

        _, outs = jax.lax.scan(body, cache0, xs)
        rest = outs.transpose(1, 0, 2, 3, 4, 5).reshape(out0.shape[0], -1, *out0.shape[2:])
        enc = jnp.concatenate([out0, rest], axis=1)
    else:
        enc = out0

    moments = cconv3d(params["conv1"], enc, None)  # 1x1x1: (.., 2z)
    mu, log_var = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        std = jnp.exp(0.5 * jnp.clip(log_var.astype(jnp.float32), -30.0, 20.0))
        mu = mu + std * jax.random.normal(rng, mu.shape, jnp.float32)
    if scale:
        mean = jnp.asarray(WAN_LATENT_MEAN, jnp.float32)
        stdv = jnp.asarray(WAN_LATENT_STD, jnp.float32)
        mu = (mu.astype(jnp.float32) - mean) / stdv
    return mu.astype(jnp.float32)


# --------------------------------------------------------------------------
# weight loading
# --------------------------------------------------------------------------

def _conv3d_p(sd, key, dtype) -> Dict:
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (O,I,kt,kh,kw)
    p = {"w": w.transpose(2, 3, 4, 1, 0).astype(dtype)}
    if f"{key}.bias" in sd:
        p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return p


def _conv2d_p(sd, key, dtype) -> Dict:
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (O,I,kh,kw)
    p = {"w": w.transpose(2, 3, 1, 0).astype(dtype)}
    if f"{key}.bias" in sd:
        p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return p


def _norm_p(sd, key) -> Dict:
    return {"g": np.asarray(sd[f"{key}.gamma"], np.float32).reshape(-1)}


def _res_p(sd, key, has_shortcut, dtype) -> Dict:
    p = {
        "norm1": _norm_p(sd, f"{key}.residual.0"),
        "conv1": _conv3d_p(sd, f"{key}.residual.2", dtype),
        "norm2": _norm_p(sd, f"{key}.residual.3"),
        "conv2": _conv3d_p(sd, f"{key}.residual.6", dtype),
    }
    if has_shortcut:
        p["shortcut"] = _conv3d_p(sd, f"{key}.shortcut", dtype)
    return p


def _attn_p(sd, key, dtype) -> Dict:
    return {
        "norm": _norm_p(sd, f"{key}.norm"),
        "to_qkv": _conv2d_p(sd, f"{key}.to_qkv", dtype),
        "proj": _conv2d_p(sd, f"{key}.proj", dtype),
    }


def load_wan_vae_params(state_dict: Dict[str, Any], cfg: WanVAEConfig = WanVAEConfig(),
                        dtype=np.float32, to_jax: bool = True) -> Dict:
    """Map the torch checkpoint (reference layer numbering from the
    nn.Sequential layouts in vae.py Encoder3d/Decoder3d) to our pytree."""
    sd = state_dict

    def enc_stages():
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        stages, li = [], 0
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            blocks = []
            d = din
            for _ in range(cfg.num_res_blocks):
                blocks.append(_res_p(sd, f"encoder.downsamples.{li}", d != dout, dtype))
                li += 1
                d = dout
            st = {"blocks": blocks}
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
                st["resample"] = {"mode": mode, "conv": _conv2d_p(sd, f"encoder.downsamples.{li}.resample.1", dtype)}
                if mode == "downsample3d":
                    st["resample"]["time_conv"] = _conv3d_p(sd, f"encoder.downsamples.{li}.time_conv", dtype)
                li += 1
            stages.append(st)
        return stages

    def dec_stages():
        dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
        stages, li = [], 0
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            if i in (1, 2, 3):
                din = din // 2
            blocks = []
            d = din
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(_res_p(sd, f"decoder.upsamples.{li}", d != dout, dtype))
                li += 1
                d = dout
            st = {"blocks": blocks}
            if i != len(cfg.dim_mult) - 1:
                mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
                st["resample"] = {"mode": mode, "conv": _conv2d_p(sd, f"decoder.upsamples.{li}.resample.1", dtype)}
                if mode == "upsample3d":
                    st["resample"]["time_conv"] = _conv3d_p(sd, f"decoder.upsamples.{li}.time_conv", dtype)
                li += 1
            stages.append(st)
        return stages

    params = {
        "conv1": _conv3d_p(sd, "conv1", dtype),
        "conv2": _conv3d_p(sd, "conv2", dtype),
        "encoder": {
            "conv1": _conv3d_p(sd, "encoder.conv1", dtype),
            "down": enc_stages(),
            "mid_res1": _res_p(sd, "encoder.middle.0", False, dtype),
            "mid_attn": _attn_p(sd, "encoder.middle.1", dtype),
            "mid_res2": _res_p(sd, "encoder.middle.2", False, dtype),
            "head_norm": _norm_p(sd, "encoder.head.0"),
            "head_conv": _conv3d_p(sd, "encoder.head.2", dtype),
        },
        "decoder": {
            "conv1": _conv3d_p(sd, "decoder.conv1", dtype),
            "mid_res1": _res_p(sd, "decoder.middle.0", False, dtype),
            "mid_attn": _attn_p(sd, "decoder.middle.1", dtype),
            "mid_res2": _res_p(sd, "decoder.middle.2", False, dtype),
            "up": dec_stages(),
            "head_norm": _norm_p(sd, "decoder.head.0"),
            "head_conv": _conv3d_p(sd, "decoder.head.2", dtype),
        },
    }
    if not to_jax:  # numpy leaves (e.g. as a shape template for
        return params  # utils/synth.device_randn_like — no device transfer)
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, str) else jnp.asarray(x), params
    )


def load_wan_vae_from_path(path: str, cfg: WanVAEConfig = WanVAEConfig(), dtype=np.float32) -> Dict:
    """Load from .pth (torch pickle) or .safetensors."""
    if path.endswith(".safetensors"):
        from ..utils.safetensors_io import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.float().numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
    return load_wan_vae_params(sd, cfg, dtype)


def init_random_vae_state_dict(cfg: WanVAEConfig, seed: int = 0, scale: float = 0.1) -> Dict[str, np.ndarray]:
    """Random state_dict with the reference's exact key layout (tests)."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv3(key, i, o, k=(3, 3, 3)):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, *k), dtype=np.float32) * scale / np.sqrt(i * np.prod(k))
        sd[f"{key}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.01

    def conv2(key, i, o, k=(3, 3)):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, *k), dtype=np.float32) * scale / np.sqrt(i * np.prod(k))
        sd[f"{key}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.01

    def norm(key, d):
        sd[f"{key}.gamma"] = np.ones((d, 1, 1, 1), np.float32)

    def res(key, i, o):
        norm(f"{key}.residual.0", i)
        conv3(f"{key}.residual.2", i, o)
        norm(f"{key}.residual.3", o)
        conv3(f"{key}.residual.6", o, o)
        if i != o:
            conv3(f"{key}.shortcut", i, o, k=(1, 1, 1))

    def attn(key, d):
        # attention norm is RMS_norm(images=False): gamma (d, 1, 1)
        # (reference vae.py:48-60), vs (d, 1, 1, 1) on the video norms
        sd[f"{key}.norm.gamma"] = np.ones((d, 1, 1), np.float32)
        conv2(f"{key}.to_qkv", d, d * 3, k=(1, 1))
        conv2(f"{key}.proj", d, d, k=(1, 1))

    z2 = cfg.z_dim * 2
    conv3("conv1", z2, z2, k=(1, 1, 1))
    conv3("conv2", cfg.z_dim, cfg.z_dim, k=(1, 1, 1))

    # encoder
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    conv3("encoder.conv1", 3, dims[0])
    li = 0
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din
        for _ in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{li}", d, dout)
            li += 1
            d = dout
        if i != len(cfg.dim_mult) - 1:
            conv2(f"encoder.downsamples.{li}.resample.1", dout, dout)
            if cfg.temperal_downsample[i]:
                conv3(f"encoder.downsamples.{li}.time_conv", dout, dout, k=(3, 1, 1))
            li += 1
    res("encoder.middle.0", dims[-1], dims[-1])
    attn("encoder.middle.1", dims[-1])
    res("encoder.middle.2", dims[-1], dims[-1])
    norm("encoder.head.0", dims[-1])
    conv3("encoder.head.2", dims[-1], z2)

    # decoder
    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    conv3("decoder.conv1", cfg.z_dim, ddims[0])
    res("decoder.middle.0", ddims[0], ddims[0])
    attn("decoder.middle.1", ddims[0])
    res("decoder.middle.2", ddims[0], ddims[0])
    li = 0
    for i, (din, dout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            din = din // 2
        d = din
        for _ in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{li}", d, dout)
            li += 1
            d = dout
        if i != len(cfg.dim_mult) - 1:
            conv2(f"decoder.upsamples.{li}.resample.1", dout, dout // 2)
            if cfg.temperal_upsample[i]:
                conv3(f"decoder.upsamples.{li}.time_conv", dout, dout * 2, k=(3, 1, 1))
            li += 1
    norm("decoder.head.0", ddims[-1])
    conv3("decoder.head.2", ddims[-1], 3)
    return sd


# --------------------------------------------------------------------------
# spatial tiling (reference tiled_encode/tiled_decode, vae.py:568-685:
# overlapping tiles, linear-ramp blending of the overlaps, crop to stride)
# --------------------------------------------------------------------------

def _blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Blend tile b's left edge with tile a's right edge along W (axis 3)."""
    e = min(a.shape[3], b.shape[3], extent)
    if e <= 0:
        return b
    w = (jnp.arange(e, dtype=jnp.float32) / e).reshape(1, 1, 1, e, 1)
    mixed = a[:, :, :, -e:].astype(jnp.float32) * (1 - w) + b[:, :, :, :e].astype(jnp.float32) * w
    return jnp.concatenate([mixed.astype(b.dtype), b[:, :, :, e:]], axis=3)


def _blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Blend tile b's top edge with tile a's bottom edge along H (axis 2)."""
    e = min(a.shape[2], b.shape[2], extent)
    if e <= 0:
        return b
    w = (jnp.arange(e, dtype=jnp.float32) / e).reshape(1, 1, e, 1, 1)
    mixed = a[:, :, -e:].astype(jnp.float32) * (1 - w) + b[:, :, :e].astype(jnp.float32) * w
    return jnp.concatenate([mixed.astype(b.dtype), b[:, :, e:]], axis=2)


def vae_decode_tiled(params: Dict, z: jnp.ndarray, cfg: WanVAEConfig = WanVAEConfig(),
                     scale: bool = True, dtype=jnp.float32,
                     tile_latent: int = 32, stride_latent: int = 24,
                     chunk: int = 4) -> jnp.ndarray:
    """Tiled decode: 256px tiles with 192px stride by default (reference
    tile_sample_min/stride, vae.py:530-535). z: (B, T, h, w, C)."""
    b, t, h, w, c = z.shape
    blend = (tile_latent - stride_latent) * 8
    rows = []
    for i in range(0, h, stride_latent):
        row = []
        for j in range(0, w, stride_latent):
            tile = z[:, :, i : i + tile_latent, j : j + tile_latent]
            row.append(vae_decode(params, tile, cfg, scale=scale, dtype=dtype, chunk=chunk))
        rows.append(row)
    out_rows = []
    for i, row in enumerate(rows):
        merged = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            # reference torch blend_v/h mutate b in place, so later blends
            # see already-blended neighbors (vae.py:556-565) — mirror it
            row[j] = tile
            merged.append(tile[:, :, : stride_latent * 8, : stride_latent * 8])
        out_rows.append(jnp.concatenate(merged, axis=3))
    out = jnp.concatenate(out_rows, axis=2)
    return out[:, :, : h * 8, : w * 8]


def vae_encode_tiled(params: Dict, x: jnp.ndarray, cfg: WanVAEConfig = WanVAEConfig(),
                     scale: bool = True, dtype=jnp.float32,
                     tile_px: int = 256, stride_px: int = 192) -> jnp.ndarray:
    """Tiled encode (reference tiled_encode, vae.py:568-630). x: (B,T,H,W,3)."""
    b, t, h, w, _ = x.shape
    tl, sl = tile_px // 8, stride_px // 8
    blend = tl - sl
    rows = []
    for i in range(0, h, stride_px):
        row = []
        for j in range(0, w, stride_px):
            tile = x[:, :, i : i + tile_px, j : j + tile_px]
            row.append(vae_encode(params, tile, cfg, scale=scale, dtype=dtype))
        rows.append(row)
    out_rows = []
    for i, row in enumerate(rows):
        merged = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            row[j] = tile  # mirror the reference's in-place blend cascade
            merged.append(tile[:, :, :sl, :sl])
        out_rows.append(jnp.concatenate(merged, axis=3))
    out = jnp.concatenate(out_rows, axis=2)
    return out[:, :, : h // 8, : w // 8]


def make_jitted_decode(params: Dict, cfg: WanVAEConfig, tiled: bool = False,
                       scale: bool = True, dtype=None, chunk: int = 4):
    """One COMPILED program for the whole decode (the TRT-engine analog).

    Calling vae_decode eagerly runs every conv as its own XLA program —
    no cross-op fusion, one dispatch per op (hundreds per decode). The
    params tree carries static string layer tags that cannot cross jit
    as arguments, so array leaves ride as args and tags stay closured.
    Returns decode_fn(z) -> frames; jit re-specializes per z shape."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten(params, is_leaf=lambda x: isinstance(x, str))
    arr_idx = [i for i, l in enumerate(flat) if hasattr(l, "shape")]
    arrs = [flat[i] for i in arr_idx]

    @jax.jit
    def _decode(z, *leaves_in):
        leaves = list(flat)
        for i, a in zip(arr_idx, leaves_in):
            leaves[i] = a
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        if tiled:
            return vae_decode_tiled(p, z, cfg, scale=scale, chunk=chunk,
                                    **({"dtype": dtype} if dtype else {}))
        return vae_decode(p, z, cfg, scale=scale, chunk=chunk)

    return lambda z: _decode(z, *arrs)
