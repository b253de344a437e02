"""CogVideoX causal 3D VAE (AutoencoderKLCogVideoX).

Reference: lightx2v/models/video_encoders/hf/cogvideox/
autoencoder_ks_cogvidex.py — block channels (128, 256, 256, 512), 3
resnets per encoder block / 4 per decoder block, 16 latent channels,
GroupNorm(32) in the encoder and SpatialNorm3D (GroupNorm modulated by
1x1 convs of the latent zq) in the decoder, "first"-pad causal convs
(temporal pad replicates the first frame), temporal compression via
first-frame-preserving avg-pooling in the first two down blocks (and the
mirrored nearest upsampling), scaling_factor 0.7.

TPU notes: channels-last, whole-clip forward (the reference tiles long
videos; frame-wise conv caches exist there for context-parallel decode,
which single-controller JAX does not need).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

COGVIDEOX_SCALING = 0.7


@dataclass(frozen=True)
class CogVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compress_level: int = 2  # log2(temporal_compression_ratio)


# ---------------------------------------------------------------- primitives


class _ConvCacheCtx:
    """Sequential conv-cache carrier for chunked decode (reference
    CogVideoXCausalConv3d conv_cache, autoencoder_ks_cogvidex.py:117-138:
    the temporal left-pad of chunk i+1 is the last kt-1 frames chunk i fed
    the same conv). Caches are keyed by execution order — the decoder's
    conv sequence is static, so index i always lands on the same conv."""

    def __init__(self, caches: Optional[Tuple[jnp.ndarray, ...]] = None):
        self.old = caches  # None on the first chunk (replicate-first pad)
        self.new: list = []
        self.i = 0

    def pad(self, x: jnp.ndarray, kt: int) -> jnp.ndarray:
        if self.old is not None:
            xp = jnp.concatenate([self.old[self.i].astype(x.dtype), x], axis=1)
        else:
            xp = jnp.concatenate([jnp.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
        self.i += 1
        self.new.append(xp[:, -(kt - 1):])  # reference :134 (post-pad slice)
        return xp


def causal_conv3d(p: Params, x: jnp.ndarray,
                  ctx: Optional[_ConvCacheCtx] = None) -> jnp.ndarray:
    """'first'-pad causal conv: temporal left pad replicates the first
    frame (reference fake_context_parallel_forward :117-128); with ``ctx``
    the pad comes from the previous chunk's cache instead.
    x (B,T,H,W,C); w (kt,kh,kw,I,O)."""
    w = p["w"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt > 1:
        if ctx is not None:
            x = ctx.pad(x, kt)
        else:
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([first, x], axis=1)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((0, 0), ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def group_norm(p: Params, x: jnp.ndarray, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t * h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (xf * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _resize_zq(zq: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    """Nearest-resize the latents to a feature shape, splitting the first
    frame when T is odd (reference SpatialNorm3D :253-263)."""
    b = zq.shape[0]
    c = zq.shape[-1]
    if t > 1 and t % 2 == 1:
        zf = jax.image.resize(zq[:, :1], (b, 1, h, w, c), "nearest")
        zr = jax.image.resize(zq[:, 1:], (b, t - 1, h, w, c), "nearest")
        return jnp.concatenate([zf, zr], axis=1)
    return jax.image.resize(zq, (b, t, h, w, c), "nearest")


def spatial_norm(p: Params, f: jnp.ndarray, zq: jnp.ndarray, groups: int,
                 ctx: Optional[_ConvCacheCtx] = None) -> jnp.ndarray:
    """GroupNorm(f) * conv_y(zq) + conv_b(zq) (reference :141-188)."""
    b, t, h, w, c = f.shape
    z = _resize_zq(zq, t, h, w)
    y = causal_conv3d(p["conv_y"], z, ctx)
    bb = causal_conv3d(p["conv_b"], z, ctx)
    nf = group_norm(p["norm"], f, groups)
    return nf * y + bb


def resnet_block(p: Params, x: jnp.ndarray, groups: int, zq: Optional[jnp.ndarray] = None,
                 ctx: Optional[_ConvCacheCtx] = None) -> jnp.ndarray:
    """reference CogVideoXResnetBlock3D :190-309 (temb unused: temb_channels=0)."""
    norm = (lambda q, v: spatial_norm(q, v, zq, groups, ctx)) if zq is not None else (lambda q, v: group_norm(q, v, groups))
    h = norm(p["norm1"], x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(p["conv1"], h, ctx)
    h = norm(p["norm2"], h)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(p["conv2"], h, ctx)
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x, ctx)  # SafeConv3d 1x1 (no causality needed)
    return x + h


def downsample3d(p: Params, x: jnp.ndarray, compress_time: bool) -> jnp.ndarray:
    """reference diffusers CogVideoXDownsample3D: optional first-frame-
    preserving temporal avg-pool, then stride-2 2D conv with (0,1,0,1) pad."""
    if compress_time:
        t = x.shape[1]
        if t % 2 == 1 and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            rest = (rest[:, 0::2] + rest[:, 1::2]) * 0.5
            x = jnp.concatenate([first, rest], axis=1)
        elif t > 1:
            x = (x[:, 0::2] + x[:, 1::2]) * 0.5
    b, t = x.shape[0], x.shape[1]
    xf = x.reshape(b * t, *x.shape[2:])
    out = jax.lax.conv_general_dilated(
        xf, p["w"].astype(x.dtype), window_strides=(2, 2),
        padding=((0, 1), (0, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out.reshape(b, t, *out.shape[1:])


def upsample3d(p: Params, x: jnp.ndarray, compress_time: bool) -> jnp.ndarray:
    """reference diffusers CogVideoXUpsample3D: nearest upsampling with
    first-frame split for odd T, then 3x3 2D conv."""
    b, t, h, w, c = x.shape
    if compress_time:
        if t > 1 and t % 2 == 1:
            first, rest = x[:, :1], x[:, 1:]
            first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
            rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2), 2, axis=3)
            x = jnp.concatenate([first, rest], axis=1)
        elif t > 1:
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    else:
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    b, t = x.shape[0], x.shape[1]
    xf = x.reshape(b * t, *x.shape[2:])
    out = jax.lax.conv_general_dilated(
        xf, p["w"].astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out.reshape(b, t, *out.shape[1:])


# ---------------------------------------------------------------- forward

def cog_vae_encode(params: Params, x: jnp.ndarray, cfg: CogVAEConfig = CogVAEConfig(),
                   scale: bool = True, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    g = cfg.norm_num_groups
    h = causal_conv3d(params["encoder"]["conv_in"], x.astype(jnp.float32))
    for i, stage in enumerate(params["encoder"]["down"]):
        for rb in stage["resnets"]:
            h = resnet_block(rb, h, g)
        if "downsample" in stage:
            h = downsample3d(stage["downsample"], h, compress_time=i < cfg.temporal_compress_level)
    for rb in params["encoder"]["mid"]:
        h = resnet_block(rb, h, g)
    h = group_norm(params["encoder"]["norm_out"], h, g)
    h = jax.nn.silu(h.astype(jnp.float32))
    moments = causal_conv3d(params["encoder"]["conv_out"], h)
    mu, logvar = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mu = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
    return mu * COGVIDEOX_SCALING if scale else mu


def cog_vae_decode(params: Params, z: jnp.ndarray, cfg: CogVAEConfig = CogVAEConfig(),
                   scale: bool = True,
                   ctx: Optional[_ConvCacheCtx] = None) -> jnp.ndarray:
    g = cfg.norm_num_groups
    if scale:
        z = z / COGVIDEOX_SCALING
    zq = z.astype(jnp.float32)
    h = causal_conv3d(params["decoder"]["conv_in"], zq, ctx)
    for rb in params["decoder"]["mid"]:
        h = resnet_block(rb, h, g, zq=zq, ctx=ctx)
    n_up = len(params["decoder"]["up"])
    for i, stage in enumerate(params["decoder"]["up"]):
        for rb in stage["resnets"]:
            h = resnet_block(rb, h, g, zq=zq, ctx=ctx)
        if "upsample" in stage:
            h = upsample3d(stage["upsample"], h, compress_time=i < cfg.temporal_compress_level)
    h = spatial_norm(params["decoder"]["norm_out"], h, zq, g, ctx)
    h = jax.nn.silu(h.astype(jnp.float32))
    return causal_conv3d(params["decoder"]["conv_out"], h, ctx)


_COG_CHUNK_JIT: dict = {}


def _jit_cog_chunk(cfg: CogVAEConfig, scale: bool, first: bool):
    """Jitted one-chunk decode: (params, z_chunk[, caches]) ->
    (pixels, caches). Continuation chunks donate the incoming cache
    buffers (same shapes out as in for every fixed chunk length)."""
    key = (cfg, scale, first)
    fn = _COG_CHUNK_JIT.get(key)
    if fn is None:
        if first:
            def run(params, zc):
                ctx = _ConvCacheCtx(None)
                out = cog_vae_decode(params, zc, cfg, scale=scale, ctx=ctx)
                return out, tuple(ctx.new)
            fn = jax.jit(run)
        else:
            def run(params, zc, caches):
                ctx = _ConvCacheCtx(caches)
                out = cog_vae_decode(params, zc, cfg, scale=scale, ctx=ctx)
                return out, tuple(ctx.new)
            fn = jax.jit(run, donate_argnums=(2,))
        _COG_CHUNK_JIT[key] = fn
    return fn


def cog_vae_decode_chunked(params: Params, z: jnp.ndarray,
                           cfg: CogVAEConfig = CogVAEConfig(),
                           scale: bool = True, frame_batch: int = 2) -> jnp.ndarray:
    """Frame-batched decode — the reference's ACTUAL decode loop
    (autoencoder_ks_cogvidex.py:1053 num_latent_frames_batch_size=2 and
    _decode's conv_cache-carried batches): chunk i>0 covers
    [fb*i + rem, fb*(i+1) + rem), so the first chunk absorbs the
    remainder (21 latent frames -> [3, 2, 2, ...]). Causal convs are
    exact under chunking by construction; GroupNorm/upsample see the
    same per-chunk tensors the reference's decoder does. Peak HBM is one
    chunk's activations (~10x below whole-clip at 81 output frames)."""
    t = z.shape[1]
    nb = max(t // frame_batch, 1)
    rem = t % frame_batch
    out = []
    caches = None
    for i in range(nb):
        start = frame_batch * i + (0 if i == 0 else rem)
        end = min(frame_batch * (i + 1) + rem, t)
        fn = _jit_cog_chunk(cfg, scale, first=caches is None)
        if caches is None:
            o, caches = fn(params, z[:, start:end])
        else:
            o, caches = fn(params, z[:, start:end], caches)
        out.append(o)
    return jnp.concatenate(out, axis=1)


_COG_TILE_JIT: dict = {}


def _jit_cog_tile_decode(cfg: CogVAEConfig, scale: bool):
    """Per-(cfg, scale) cached jitted single-tile decode (jax.jit's own
    shape cache handles the distinct edge-tile shapes)."""
    key = (cfg, scale)
    fn = _COG_TILE_JIT.get(key)
    if fn is None:
        import functools

        fn = jax.jit(functools.partial(cog_vae_decode, cfg=cfg, scale=scale))
        _COG_TILE_JIT[key] = fn
    return fn


def cog_vae_decode_tiled(params: Params, z: jnp.ndarray,
                         cfg: CogVAEConfig = CogVAEConfig(),
                         scale: bool = True, tile_latent: int = 32,
                         overlap: float = 0.25,
                         tile_jit: bool = False,
                         frame_batch: Optional[int] = None) -> jnp.ndarray:
    """Spatially tiled decode (reference autoencoder_ks_cogvidex.py
    tiled_decode/enable_tiling :1035-1110 — overlapping latent tiles
    decoded independently, linear-ramp blended in pixel space). Each tile
    carries its own zq slice for SpatialNorm3D, matching the reference's
    per-tile decoder calls. Full-clip 480P decode does not fit HBM (the
    128-channel top stage alone is ~16 GB fp32); tiling bounds the peak
    at one tile's activations.

    ``tile_jit=True`` runs each tile as its own jitted program (host loop,
    eager blends): tracing the whole grid into ONE program lets the XLA
    scheduler keep many tiles' intermediates alive — measured 73.76 GB
    peak at 480P on v5e, an OOM — while per-tile programs peak at one
    tile's activations.

    ``frame_batch`` additionally frame-batches each tile through
    ``cog_vae_decode_chunked`` (the reference's tiled_decode does the
    same conv-cache frame loop inside every tile) — at 480P this is the
    operating point: whole-clip single-tile programs still peak ~23 GB
    (81-frame f32 maps at the 256ch/256px stage), chunked tiles peak at
    one chunk's activations."""
    from .hunyuan_vae import _blend_dim

    b, t, h, w, c = z.shape
    if frame_batch is not None:
        dec = lambda p_, z_: cog_vae_decode_chunked(p_, z_, cfg, scale=scale,
                                                    frame_batch=frame_batch)
    elif tile_jit:
        dec = _jit_cog_tile_decode(cfg, scale)
    else:
        dec = lambda p_, z_: cog_vae_decode(p_, z_, cfg, scale=scale)
    if max(h, w) <= tile_latent:
        return dec(params, z)
    step = max(1, int(tile_latent * (1 - overlap)))
    up = 2 ** (len(cfg.block_out_channels) - 1)
    blend = (tile_latent - step) * up
    limit = step * up
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
            row[j] = tile  # reference blend_v/h mutate in place (cascade)
            merged.append(tile[:, :, :limit, :limit])
        out_rows.append(jnp.concatenate(merged, axis=3))
    out = jnp.concatenate(out_rows, axis=2)
    return out[:, :, : h * up, : w * up]


# ---------------------------------------------------------------- weights

def _conv3_p(sd, key, dtype=np.float32) -> Params:
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    p = {"w": w.transpose(2, 3, 4, 1, 0).astype(dtype)}
    if f"{key}.bias" in sd:
        p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return p


def _conv2_p(sd, key, dtype=np.float32) -> Params:
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    p = {"w": w.transpose(2, 3, 1, 0).astype(dtype)}
    if f"{key}.bias" in sd:
        p["b"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return p


def _norm_p(sd, key) -> Params:
    return {"w": np.asarray(sd[f"{key}.weight"], np.float32),
            "b": np.asarray(sd[f"{key}.bias"], np.float32)}


def load_cog_vae_params(sd: Dict[str, np.ndarray], cfg: CogVAEConfig = CogVAEConfig(),
                        dtype=np.float32) -> Params:
    boc = cfg.block_out_channels
    rev = list(reversed(boc))

    def spat_norm(prefix):
        return {
            "norm": _norm_p(sd, f"{prefix}.norm_layer"),
            "conv_y": _conv3_p(sd, f"{prefix}.conv_y.conv", dtype),
            "conv_b": _conv3_p(sd, f"{prefix}.conv_b.conv", dtype),
        }

    def resnet(prefix, cin, cout, spatial):
        p = {
            "norm1": spat_norm(f"{prefix}.norm1") if spatial else _norm_p(sd, f"{prefix}.norm1"),
            "conv1": _conv3_p(sd, f"{prefix}.conv1.conv", dtype),
            "norm2": spat_norm(f"{prefix}.norm2") if spatial else _norm_p(sd, f"{prefix}.norm2"),
            "conv2": _conv3_p(sd, f"{prefix}.conv2.conv", dtype),
        }
        if cin != cout:
            p["shortcut"] = _conv3_p(sd, f"{prefix}.conv_shortcut", dtype)
        return p

    enc = {
        "conv_in": _conv3_p(sd, "encoder.conv_in.conv", dtype),
        "down": [],
        "mid": [resnet(f"encoder.mid_block.resnets.{j}", boc[-1], boc[-1], False) for j in range(2)],
        "norm_out": _norm_p(sd, "encoder.norm_out"),
        "conv_out": _conv3_p(sd, "encoder.conv_out.conv", dtype),
    }
    for i in range(len(boc)):
        cin = boc[0] if i == 0 else boc[i - 1]
        st = {"resnets": [
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else boc[i], boc[i], False)
            for j in range(cfg.layers_per_block)
        ]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            st["downsample"] = _conv2_p(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)
        enc["down"].append(st)

    dec = {
        "conv_in": _conv3_p(sd, "decoder.conv_in.conv", dtype),
        "mid": [resnet(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], True) for j in range(2)],
        "up": [],
        "norm_out": spat_norm("decoder.norm_out"),
        "conv_out": _conv3_p(sd, "decoder.conv_out.conv", dtype),
    }
    for i in range(len(rev)):
        cin = rev[0] if i == 0 else rev[i - 1]
        st = {"resnets": [
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i], True)
            for j in range(cfg.layers_per_block + 1)
        ]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            st["upsample"] = _conv2_p(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)
        dec["up"].append(st)

    return jax.tree_util.tree_map(jnp.asarray, {"encoder": enc, "decoder": dec})


def init_random_cog_vae_state_dict(cfg: CogVAEConfig, seed: int = 0, scale: float = 0.1) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv3(key, i, o, k=3):
        fan = i * k**3
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k, k, k), dtype=np.float32) * scale / np.sqrt(fan)
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def conv2(key, i, o, k=3):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k, k), dtype=np.float32) * scale / np.sqrt(i * k * k)
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    z = cfg.latent_channels

    def spat(key, c):
        norm(f"{key}.norm_layer", c)
        conv3(f"{key}.conv_y.conv", z, c, k=1)
        conv3(f"{key}.conv_b.conv", z, c, k=1)

    def resnet(prefix, cin, cout, spatial):
        if spatial:
            spat(f"{prefix}.norm1", cin)
            spat(f"{prefix}.norm2", cout)
        else:
            norm(f"{prefix}.norm1", cin)
            norm(f"{prefix}.norm2", cout)
        conv3(f"{prefix}.conv1.conv", cin, cout)
        conv3(f"{prefix}.conv2.conv", cout, cout)
        if cin != cout:
            conv3(f"{prefix}.conv_shortcut", cin, cout, k=1)

    boc = cfg.block_out_channels
    rev = list(reversed(boc))
    conv3("encoder.conv_in.conv", cfg.in_channels, boc[0])
    for i in range(len(boc)):
        cin = boc[0] if i == 0 else boc[i - 1]
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else boc[i], boc[i], False)
        if i != len(boc) - 1:
            conv2(f"encoder.down_blocks.{i}.downsamplers.0.conv", boc[i], boc[i])
    for j in range(2):
        resnet(f"encoder.mid_block.resnets.{j}", boc[-1], boc[-1], False)
    norm("encoder.norm_out", boc[-1])
    conv3("encoder.conv_out.conv", boc[-1], 2 * z)

    conv3("decoder.conv_in.conv", z, rev[0])
    for j in range(2):
        resnet(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], True)
    for i in range(len(rev)):
        cin = rev[0] if i == 0 else rev[i - 1]
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i], True)
        if i != len(rev) - 1:
            conv2(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    spat("decoder.norm_out", rev[-1])
    conv3("decoder.conv_out.conv", rev[-1], cfg.in_channels)
    return sd
