"""HunyuanVideo causal 3D VAE (diffusers-style AutoencoderKLCausal3D).

Reference: lightx2v/models/video_encoders/hf/autoencoder_kl_causal_3d/
{autoencoder_kl_causal_3d.py, vae.py, unet_causal_3d_blocks.py}. The
"884-16c" configuration: block channels (128, 256, 512, 512), 2 resnet
layers per block, 16 latent channels, GroupNorm(32) + SiLU, causal convs
with REPLICATE temporal padding, strided-causal-conv downsampling,
nearest upsampling where the first frame upsamples spatially only (hence
T latent frames -> 4(T-1)+1 video frames), and a frame-causal single-head
attention in the mid blocks.

TPU notes: channels-last layout; whole-clip forward (the reference relies
on spatial/temporal tiling rather than streaming — mid-block attention is
quadratic in tile tokens), with the same tiling entry points.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

HUNYUAN_LATENT_SCALING = 0.476986


@dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8

    def down_strides(self):
        """Per-stage (t, h, w) downsample stride (reference vae.py:62-75)."""
        n = len(self.block_out_channels)
        nspat = int(np.log2(self.spatial_compression_ratio))
        ntime = int(np.log2(self.time_compression_ratio))
        strides = []
        for i in range(n):
            final = i == n - 1
            sp = i < nspat
            tm = (i >= n - 1 - ntime) and not final
            strides.append(((2 if tm else 1, 2 if sp else 1, 2 if sp else 1) if (sp or tm) else None))
        return strides

    def up_scales(self):
        """Per-stage decoder (t, h, w) upsample factors (reference :178-192)."""
        n = len(self.block_out_channels)
        nspat = int(np.log2(self.spatial_compression_ratio))
        ntime = int(np.log2(self.time_compression_ratio))
        scales = []
        for i in range(n):
            final = i == n - 1
            sp = i < nspat
            tm = (i >= n - 1 - ntime) and not final
            scales.append(((2 if tm else 1, 2 if sp else 1, 2 if sp else 1) if (sp or tm) else None))
        return scales


# ---------------------------------------------------------------- primitives

def causal_conv3d(p: Params, x: jnp.ndarray, stride=(1, 1, 1)) -> jnp.ndarray:
    """Causal conv with REPLICATE padding on every dim — spatial k//2 each
    side plus temporal k-1 on the left (reference unet_causal_3d_blocks.py
    CausalConv3d: ``F.pad(x, (kw//2, kw//2, kh//2, kh//2, kt-1, 0),
    mode="replicate")``). x (B,T,H,W,C); w (kt,kh,kw,I,O)."""
    w = p["w"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt > 1 or kh > 1 or kw > 1:
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def group_norm(p: Params, x: jnp.ndarray, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over (T, H, W, C/G) per group, channels-last."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t * h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, t, h, w, c)
    return (xf * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def resnet_block(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """GroupNorm -> SiLU -> conv -> GroupNorm -> SiLU -> conv (+ 1x1
    shortcut) (reference ResnetBlockCausal3D :265-380)."""
    h = group_norm(p["norm1"], x, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(p["conv1"], h)
    h = group_norm(p["norm2"], h, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(p["conv2"], h)
    sc = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return sc + h


def causal_frame_attention(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Mid-block single-head attention with the frame-causal mask
    (reference UNetMidBlockCausal3D forward + prepare_causal_attention_mask)."""
    b, t, h, w, c = x.shape
    res = x
    xn = group_norm(p["group_norm"], x, groups)
    flat = xn.reshape(b, t * h * w, c)

    def lin(pp, v):
        return (jax.lax.dot_general(v, pp["w"], (((2,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) + pp["b"]).astype(v.dtype)

    q, k, v = lin(p["to_q"], flat), lin(p["to_k"], flat), lin(p["to_v"], flat)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
    hw = h * w
    qf = jnp.arange(t * hw) // hw
    mask = qf[:, None] >= qf[None, :]
    logits = jnp.where(mask[None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = lin(p["to_out"], out).reshape(b, t, h, w, c)
    return res + out


def upsample_causal(x: jnp.ndarray, scale: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest upsample; first frame spatial-only (reference
    UpsampleCausal3D.forward :146-200)."""
    st, sh, sw = scale
    first, rest = x[:, :1], x[:, 1:]
    if sh > 1:
        first = jnp.repeat(jnp.repeat(first, sh, axis=2), sw, axis=3)
        rest = jnp.repeat(jnp.repeat(rest, sh, axis=2), sw, axis=3)
    if st > 1 and rest.shape[1] > 0:
        rest = jnp.repeat(rest, st, axis=1)
    return jnp.concatenate([first, rest], axis=1) if rest.shape[1] > 0 else first


# ---------------------------------------------------------------- forward

def hunyuan_vae_encode(params: Params, x: jnp.ndarray, cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                       scale: bool = True, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """x (B, T, H, W, 3) -> latents (B, t, h, w, 16) scaled."""
    g = cfg.norm_num_groups
    h = causal_conv3d(params["encoder"]["conv_in"], x.astype(jnp.float32))
    for stage, stride in zip(params["encoder"]["down"], cfg.down_strides()):
        for rb in stage["resnets"]:
            h = resnet_block(rb, h, g)
        if stride is not None:
            h = causal_conv3d(stage["downsample"], h, stride=stride)
    mid = params["encoder"]["mid"]
    h = resnet_block(mid["resnet1"], h, g)
    h = causal_frame_attention(mid["attn"], h, g)
    h = resnet_block(mid["resnet2"], h, g)
    h = group_norm(params["encoder"]["norm_out"], h, g)
    h = jax.nn.silu(h.astype(jnp.float32))
    h = causal_conv3d(params["encoder"]["conv_out"], h)
    moments = causal_conv3d(params["quant_conv"], h)
    mu, logvar = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mu = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
    if scale:
        mu = mu * HUNYUAN_LATENT_SCALING
    return mu


def hunyuan_vae_decode(params: Params, z: jnp.ndarray, cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                       scale: bool = True) -> jnp.ndarray:
    """z (B, t, h, w, 16) -> frames (B, 4(t-1)+1, 8h, 8w, 3)."""
    g = cfg.norm_num_groups
    if scale:
        z = z / HUNYUAN_LATENT_SCALING
    h = causal_conv3d(params["post_quant_conv"], z.astype(jnp.float32))
    h = causal_conv3d(params["decoder"]["conv_in"], h)
    mid = params["decoder"]["mid"]
    h = resnet_block(mid["resnet1"], h, g)
    h = causal_frame_attention(mid["attn"], h, g)
    h = resnet_block(mid["resnet2"], h, g)
    for stage, sc in zip(params["decoder"]["up"], cfg.up_scales()):
        for rb in stage["resnets"]:
            h = resnet_block(rb, h, g)
        if sc is not None:
            h = upsample_causal(h, sc)
            h = causal_conv3d(stage["upsample"], h)
    h = group_norm(params["decoder"]["norm_out"], h, g)
    h = jax.nn.silu(h.astype(jnp.float32))
    return causal_conv3d(params["decoder"]["conv_out"], h)


# ------------------------------------------------------- tiled decode
# Reference AutoencoderKLCausal3D tiling (autoencoder_kl_causal_3d.py:
# 343-520): spatial tiles of 256 px (32 latent) and temporal tiles of 64
# output frames (16 latent), both with overlap factor 0.25 and linear
# blending of the overlap; a temporal tile past the start carries ONE
# extra leading latent frame whose (causal-bypass) first output frame is
# dropped before blending.

def _blend_dim(a: jnp.ndarray, b: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    """Linear-ramp blend of b's leading `n` slices with a's trailing `n`
    along `axis` (reference blend_t/blend_v/blend_h)."""
    n = min(a.shape[axis], b.shape[axis], n)
    if n <= 0:
        return b
    shape = [1] * b.ndim
    shape[axis] = n
    w = (jnp.arange(n, dtype=jnp.float32) / n).reshape(shape)
    a_t = jax.lax.slice_in_dim(a, a.shape[axis] - n, a.shape[axis], axis=axis).astype(jnp.float32)
    b_h = jax.lax.slice_in_dim(b, 0, n, axis=axis).astype(jnp.float32)
    mixed = (a_t * (1 - w) + b_h * w).astype(b.dtype)
    rest = jax.lax.slice_in_dim(b, n, b.shape[axis], axis=axis)
    return jnp.concatenate([mixed, rest], axis=axis)


_TILE_JIT: dict = {}


def _jit_tile_decode(cfg: HunyuanVAEConfig, scale: bool):
    """Per-(cfg, scale) cached jitted single-tile decode. jax.jit's own
    shape cache handles the handful of distinct edge-tile shapes."""
    key = (cfg, scale)
    fn = _TILE_JIT.get(key)
    if fn is None:
        fn = jax.jit(partial(hunyuan_vae_decode, cfg=cfg, scale=scale))
        _TILE_JIT[key] = fn
    return fn


def hunyuan_vae_decode_spatial_tiled(params: Params, z: jnp.ndarray,
                                     cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                                     scale: bool = True, tile_latent: int = 32,
                                     overlap: float = 0.25,
                                     tile_jit: bool = False) -> jnp.ndarray:
    """Spatial tiling (reference spatial_tiled_decode :419-453); z
    channels-last (B, t, h, w, 16).

    ``tile_jit=True`` runs EACH tile as its own jitted program (host loop,
    eager blends) instead of tracing the whole tile grid into one XLA
    program. One program holding ~16 tile decodes lets the scheduler keep
    many tiles' intermediates alive at once — measured 46.85 GB peak at
    480P on v5e, an OOM; per-tile programs peak at one tile's activations."""
    b, t, h, w, c = z.shape
    step = max(1, int(tile_latent * (1 - overlap)))
    # blend/limit derived from the step so tiles align at ANY tile size
    # (identical to the reference's tile*8*overlap at its 32-latent tiles,
    # where 8*step == tile*8*(1-overlap) exactly)
    blend = (tile_latent - step) * 8
    limit = step * 8
    dec = _jit_tile_decode(cfg, scale) if tile_jit else \
        partial(hunyuan_vae_decode, cfg=cfg, scale=scale)
    rows = []
    for i in range(0, h, step):
        row = []
        for j in range(0, w, step):
            tile = z[:, :, i : i + tile_latent, j : j + tile_latent]
            row.append(dec(params, tile))
        rows.append(row)
    out_rows = []
    for i, row in enumerate(rows):
        merged = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_dim(rows[i - 1][j], tile, blend, axis=2)
            if j > 0:
                tile = _blend_dim(row[j - 1], tile, blend, axis=3)
            # the reference's torch blend_v/h mutate b IN PLACE, so later
            # blends see already-blended neighbors — mirror that cascade
            row[j] = tile
            merged.append(tile[:, :, :limit, :limit])
        out_rows.append(jnp.concatenate(merged, axis=3))
    out = jnp.concatenate(out_rows, axis=2)
    return out[:, :, : h * 8, : w * 8]


def hunyuan_vae_decode_tiled(params: Params, z: jnp.ndarray,
                             cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                             scale: bool = True, t_tile_latent: int = 16,
                             spatial_tile_latent: int = 32,
                             overlap: float = 0.25,
                             use_spatial: Optional[bool] = None,
                             tile_jit: bool = False) -> jnp.ndarray:
    """Temporal (outer) + spatial (inner) tiled decode — the reference's
    temporal_tiled_decode (:487-514) dispatching to spatial_tiled_decode
    when a tile exceeds the spatial tile size. ``tile_jit`` — see
    hunyuan_vae_decode_spatial_tiled (per-tile jitted programs; required
    to fit the 480P decode on one v5e)."""
    b, t, h, w, c = z.shape
    if use_spatial is None:
        use_spatial = max(h, w) > spatial_tile_latent

    def dec(tile):
        if use_spatial:
            return hunyuan_vae_decode_spatial_tiled(
                params, tile, cfg, scale=scale, tile_latent=spatial_tile_latent,
                overlap=overlap, tile_jit=tile_jit)
        if tile_jit:
            return _jit_tile_decode(cfg, scale)(params, tile)
        return hunyuan_vae_decode(params, tile, cfg, scale=scale)

    if t <= t_tile_latent:
        return dec(z)
    step = max(1, int(t_tile_latent * (1 - overlap)))
    # step-derived blend (== the reference's int(t_sample*overlap) at its
    # 16-latent tiles where 4*step aligns exactly): each non-first tile
    # contributes 4*step new frames and overlaps the previous by the rest
    blend = t_tile_latent * 4 - 4 * step
    limit = 4 * step
    row = []
    for i in range(0, t, step):
        tile = z[:, i : i + t_tile_latent + 1]
        if i > 0 and tile.shape[1] <= 1:
            break  # degenerate tail: only the (dropped) lead latent left
        d = dec(tile)
        if i > 0:
            d = d[:, 1:]  # drop the extra leading latent frame's output
        row.append(d)
    merged = []
    for i, tile in enumerate(row):
        if i > 0:
            tile = _blend_dim(row[i - 1], tile, blend, axis=1)
            row[i] = tile  # reference blend_t mutates in place (cascade)
            merged.append(tile[:, :limit])
        else:
            merged.append(tile[:, : limit + 1])
    return jnp.concatenate(merged, axis=1)


# ---------------------------------------------------------------- weights

def _conv_p(sd, key, dtype=np.float32) -> Params:
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (O,I,kt,kh,kw)
    p = {"w": w.transpose(2, 3, 4, 1, 0).astype(dtype)}
    if f"{key}.bias" in sd:
        p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return p


def _norm_p(sd, key) -> Params:
    return {"w": np.asarray(sd[f"{key}.weight"], np.float32),
            "b": np.asarray(sd[f"{key}.bias"], np.float32)}


def _lin_p(sd, key, dtype=np.float32) -> Params:
    return {"w": np.asarray(sd[f"{key}.weight"], np.float32).astype(dtype),
            "b": np.asarray(sd[f"{key}.bias"], np.float32)}


def load_hunyuan_vae_params(sd: Dict[str, np.ndarray], cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                            dtype=np.float32) -> Params:
    def resnet(prefix, has_shortcut):
        p = {
            "norm1": _norm_p(sd, f"{prefix}.norm1"),
            "conv1": _conv_p(sd, f"{prefix}.conv1.conv", dtype),
            "norm2": _norm_p(sd, f"{prefix}.norm2"),
            "conv2": _conv_p(sd, f"{prefix}.conv2.conv", dtype),
        }
        if has_shortcut:
            p["shortcut"] = _conv_p(sd, f"{prefix}.conv_shortcut.conv", dtype)
        return p

    def attn(prefix):
        return {
            "group_norm": _norm_p(sd, f"{prefix}.group_norm"),
            "to_q": _lin_p(sd, f"{prefix}.to_q", dtype),
            "to_k": _lin_p(sd, f"{prefix}.to_k", dtype),
            "to_v": _lin_p(sd, f"{prefix}.to_v", dtype),
            "to_out": _lin_p(sd, f"{prefix}.to_out.0", dtype),
        }

    boc = cfg.block_out_channels

    def enc_stage(i):
        cin = boc[0] if i == 0 else boc[i - 1]
        st = {"resnets": [
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   has_shortcut=(j == 0 and cin != boc[i]))
            for j in range(cfg.layers_per_block)
        ]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.conv.weight" in sd:
            st["downsample"] = _conv_p(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv.conv", dtype)
        return st

    rev = list(reversed(boc))

    def dec_stage(i):
        cin = rev[0] if i == 0 else rev[i - 1]
        st = {"resnets": [
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   has_shortcut=(j == 0 and cin != rev[i]))
            for j in range(cfg.layers_per_block + 1)
        ]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.conv.weight" in sd:
            st["upsample"] = _conv_p(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv.conv", dtype)
        return st

    params = {
        "quant_conv": _conv_p(sd, "quant_conv", dtype),
        "post_quant_conv": _conv_p(sd, "post_quant_conv", dtype),
        "encoder": {
            "conv_in": _conv_p(sd, "encoder.conv_in.conv", dtype),
            "down": [enc_stage(i) for i in range(len(boc))],
            "mid": {
                "resnet1": resnet("encoder.mid_block.resnets.0", False),
                "attn": attn("encoder.mid_block.attentions.0"),
                "resnet2": resnet("encoder.mid_block.resnets.1", False),
            },
            "norm_out": _norm_p(sd, "encoder.conv_norm_out"),
            "conv_out": _conv_p(sd, "encoder.conv_out.conv", dtype),
        },
        "decoder": {
            "conv_in": _conv_p(sd, "decoder.conv_in.conv", dtype),
            "mid": {
                "resnet1": resnet("decoder.mid_block.resnets.0", False),
                "attn": attn("decoder.mid_block.attentions.0"),
                "resnet2": resnet("decoder.mid_block.resnets.1", False),
            },
            "up": [dec_stage(i) for i in range(len(boc))],
            "norm_out": _norm_p(sd, "decoder.conv_norm_out"),
            "conv_out": _conv_p(sd, "decoder.conv_out.conv", dtype),
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_hunyuan_vae_from_path(path: str, cfg: HunyuanVAEConfig = HunyuanVAEConfig()) -> Params:
    if path.endswith(".safetensors"):
        from ..utils.safetensors_io import load_file

        sd = load_file(path)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in raw:
            raw = raw["state_dict"]
        sd = {k.replace("vae.", "", 1) if k.startswith("vae.") else k:
              v.float().numpy() for k, v in raw.items()}
    return load_hunyuan_vae_params(sd, cfg)


def init_random_hunyuan_vae_state_dict(cfg: HunyuanVAEConfig, seed: int = 0, scale: float = 0.1) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(key, i, o, k=3):
        fan = i * k * k * k
        sd[f"{key}.weight"] = (rng.standard_normal((o, i, k, k, k), dtype=np.float32) * scale / np.sqrt(fan))
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def lin(key, i, o):
        sd[f"{key}.weight"] = rng.standard_normal((o, i), dtype=np.float32) * scale / np.sqrt(i)
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def resnet(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1.conv", cin, cout)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2.conv", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut.conv", cin, cout, k=1)

    def attn(prefix, c):
        norm(f"{prefix}.group_norm", c)
        for m in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.{m}", c, c)
        lin(f"{prefix}.to_out.0", c, c)

    boc = cfg.block_out_channels
    z2 = cfg.latent_channels * 2
    conv("quant_conv", z2, z2, k=1)
    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    conv("encoder.conv_in.conv", cfg.in_channels, boc[0])
    for i in range(len(boc)):
        cin = boc[0] if i == 0 else boc[i - 1]
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else boc[i], boc[i])
        if cfg.down_strides()[i] is not None:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv", boc[i], boc[i])
    for j, nm in ((0, "resnets.0"), (1, "resnets.1")):
        resnet(f"encoder.mid_block.{nm}", boc[-1], boc[-1])
    attn("encoder.mid_block.attentions.0", boc[-1])
    norm("encoder.conv_norm_out", boc[-1])
    conv("encoder.conv_out.conv", boc[-1], z2)

    rev = list(reversed(boc))
    conv("decoder.conv_in.conv", cfg.latent_channels, rev[0])
    for j, nm in ((0, "resnets.0"), (1, "resnets.1")):
        resnet(f"decoder.mid_block.{nm}", rev[0], rev[0])
    attn("decoder.mid_block.attentions.0", rev[0])
    for i in range(len(rev)):
        cin = rev[0] if i == 0 else rev[i - 1]
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i])
        if cfg.up_scales()[i] is not None:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv", rev[i], rev[i])
    norm("decoder.conv_norm_out", boc[0])
    conv("decoder.conv_out.conv", boc[0], cfg.in_channels)
    return sd
