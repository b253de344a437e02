"""Tiny VAE (TAEHV / taew2_1) — fast approximate video decoder/encoder.

Reference behavior: lightx2v/models/video_encoders/hf/tae.py:158-259 (TAEHV
encoder/decoder stacks) and hf/wan/vae_tiny.py:12-27 (WanVAE_tiny wrapper:
decode(latents) -> [-1,1] RGB, scaling_factor=1, zero mean / unit std, so
latents are consumed raw — no Wan latent normalization).

TPU-native redesign:
* channels-last (N, T, H, W, C) with `lax.conv_general_dilated` in NHWC —
  the MXU-friendly layout; torch OIHW checkpoints are converted on load.
* MemBlock (reference tae.py:24-32) concatenates the previous frame's
  features: here that is a temporal shift (`pad T by 1, drop last`) fused
  into one big batched conv over N*T frames — the reference's "parallel"
  mode without its O(T) python loop, and its sequential graph-traversal
  queue (tae.py:94-154) is unnecessary under XLA (no allocator pressure).
* TPool/TGrow (tae.py:35-55) are 1x1 convs over frame-stacked channels;
  pure reshapes + matmul here.

Layer stacks (tae.py:171-217):
  encoder: conv3(3→64) relu TPool2 conv3s2 [Mem×3 TPool2 conv3s2]×...
           → 16ch latent at /8 spatial, /4 temporal
  decoder: Clamp conv3(16→256) relu Mem×3 Up2 TGrow1 conv3(→128) Mem×3
           Up2 TGrow2 conv3(→64) Mem×3 Up2 TGrow2 conv3(→64) relu conv3(→3)
  decode trims the first 2^(time_upscales)-1 frames → 4T-3 = 1+4(T-1),
  matching Wan's frame count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LATENT_CH = 16
IMAGE_CH = 3


@dataclass(frozen=True)
class TinyVAEConfig:
    decoder_time_upscale: Tuple[bool, ...] = (True, True)
    decoder_space_upscale: Tuple[bool, ...] = (True, True, True)

    @property
    def frames_to_trim(self) -> int:
        return 2 ** sum(self.decoder_time_upscale) - 1


# ---------------------------------------------------------------- primitives


def _conv2d(x, w, b=None, stride=1):
    """x: (N, H, W, Cin); w: (kh, kw, Cin, Cout) HWIO.

    Explicit symmetric padding (torch Conv2d padding=1 semantics) — XLA's
    SAME pads asymmetrically for stride 2, which would shift the grid."""
    pad = ((1, 1), (1, 1)) if w.shape[0] > 1 else ((0, 0), (0, 0))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _frames(x):
    """(N, T, H, W, C) -> (N*T, H, W, C) so every conv is one big batch."""
    n, t = x.shape[0], x.shape[1]
    return x.reshape((n * t,) + x.shape[2:]), n, t


def _unframes(x, n, t):
    return x.reshape((n, t) + x.shape[1:])


def _mem_block(p, x, n, t):
    """Residual block with one-frame temporal context (tae.py:24-32).

    mem = previous frame's input (zeros for frame 0) — the reference's
    parallel-mode `F.pad(_x, ..., 1, 0)[:, :T]` shift, done once here and
    fused into the channel-concat conv."""
    xt = _unframes(x, n, t)
    mem = jnp.pad(xt, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :t]
    h = jnp.concatenate([x, mem.reshape(x.shape)], axis=-1)
    h = jax.nn.relu(_conv2d(h, p["c0_w"], p["c0_b"]))
    h = jax.nn.relu(_conv2d(h, p["c1_w"], p["c1_b"]))
    h = _conv2d(h, p["c2_w"], p["c2_b"])
    skip = x if "skip_w" not in p else _conv2d(x, p["skip_w"])
    return jax.nn.relu(h + skip)


def _tpool(p, x, n, t, stride):
    """Merge `stride` consecutive frames channel-wise, 1x1 conv (tae.py:35-43).
    Channel order is frame-major ([frame0 C..., frame1 C...]) to match the
    converted torch weights."""
    if stride == 1:
        return _conv2d(x, p["w"]), t
    c = x.shape[-1]
    xt = _unframes(x, n, t).reshape(n, t // stride, stride, *x.shape[1:3], c)
    xt = jnp.moveaxis(xt, 2, -2).reshape(n * (t // stride), *x.shape[1:3], stride * c)
    return _conv2d(xt, p["w"]), t // stride


def _tgrow(p, x, n, t, stride):
    """1x1 conv C -> stride*C, split channels (frame-major) into new frames
    (tae.py:46-55)."""
    y = _conv2d(x, p["w"])
    if stride == 1:
        return y, t
    c = y.shape[-1] // stride
    yt = y.reshape(n, t, *y.shape[1:3], stride, c)
    yt = jnp.moveaxis(yt, -2, 2).reshape(n * t * stride, *y.shape[1:3], c)
    return yt, t * stride


def _upsample2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


# ---------------------------------------------------------------- forward


def tiny_decode(params, latents, cfg: TinyVAEConfig = TinyVAEConfig()):
    """latents (N, T, H, W, 16) ~N(0,1) -> RGB (N, 4T-3, 8H, 8W, 3) in [0, 1].

    Mirrors TAEHV.decode_video (tae.py:248-259): raw latents in, ~[0,1]
    frames out; the Wan `*2 - 1` range map lives in the
    `tiny_decode_wan_latents` adapter (as in WanVAE_tiny.decode,
    vae_tiny.py:23-27)."""
    d = params["decoder"]
    x = jnp.tanh(latents / 3.0) * 3.0  # Clamp (tae.py:19-21)
    x, n, t = _frames(x)
    x = jax.nn.relu(_conv2d(x, d["in_w"], d["in_b"]))
    for i, (space_up, time_up) in enumerate(
        zip(cfg.decoder_space_upscale, (None,) + tuple(cfg.decoder_time_upscale))
    ):
        for j in range(3):
            x = _mem_block(d[f"s{i}_mem{j}"], x, n, t)
        if space_up:
            x = _upsample2x(x)
        stride = 1 if time_up in (None, False) else 2
        x, t = _tgrow(d[f"s{i}_grow"], x, n, t, stride)
        x = _conv2d(x, d[f"s{i}_out_w"])
        if i == len(cfg.decoder_space_upscale) - 1:
            x = jax.nn.relu(x)
    x = _conv2d(x, d["out_w"], d["out_b"])
    x = _unframes(x, n, t)
    return x[:, cfg.frames_to_trim:]


def tiny_encode(params, video):
    """video (N, T, H, W, 3) in [0, 1], T % 4 == 0 ->
    latents (N, T/4, H/8, W/8, 16) (tae.py:236-246)."""
    e = params["encoder"]
    x, n, t = _frames(video)
    x = jax.nn.relu(_conv2d(x, e["in_w"], e["in_b"]))
    for i, (pool_stride,) in enumerate(zip((2, 2, 1))):
        x, t = _tpool(e[f"s{i}_pool"], x, n, t, pool_stride)
        x = _conv2d(x, e[f"s{i}_down_w"], stride=2)
        for j in range(3):
            x = _mem_block(e[f"s{i}_mem{j}"], x, n, t)
    x = _conv2d(x, e["out_w"], e["out_b"])
    return _unframes(x, n, t)


# ---------------------------------------------------------------- weights


def _conv_p(rng, kh, kw, cin, cout, bias=True, scale=0.05):
    out = {"w": jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * scale, jnp.float32)}
    if bias:
        out["b"] = jnp.zeros((cout,), jnp.float32)
    return out


def _mem_p(rng, cin, cout, scale=0.05):
    def w(ci, co, k=3):
        return jnp.asarray(rng.standard_normal((k, k, ci, co)) * scale, jnp.float32)

    p = {
        "c0_w": w(cin * 2, cout), "c0_b": jnp.zeros((cout,), jnp.float32),
        "c1_w": w(cout, cout), "c1_b": jnp.zeros((cout,), jnp.float32),
        "c2_w": w(cout, cout), "c2_b": jnp.zeros((cout,), jnp.float32),
    }
    if cin != cout:
        p["skip_w"] = w(cin, cout, k=1)
    return p


def init_random_tiny_vae_params(seed: int = 0, cfg: TinyVAEConfig = TinyVAEConfig()):
    """Random-init parameters with the exact taew2_1 topology."""
    rng = np.random.default_rng(seed)
    enc = {}
    c = _conv_p(rng, 3, 3, IMAGE_CH, 64)
    enc["in_w"], enc["in_b"] = c["w"], c["b"]
    for i, pool_stride in enumerate((2, 2, 1)):
        enc[f"s{i}_pool"] = {"w": _conv_p(rng, 1, 1, 64 * pool_stride, 64, bias=False)["w"]}
        enc[f"s{i}_down_w"] = _conv_p(rng, 3, 3, 64, 64, bias=False)["w"]
        for j in range(3):
            enc[f"s{i}_mem{j}"] = _mem_p(rng, 64, 64)
    c = _conv_p(rng, 3, 3, 64, LATENT_CH)
    enc["out_w"], enc["out_b"] = c["w"], c["b"]

    n_f = (256, 128, 64, 64)
    dec = {}
    c = _conv_p(rng, 3, 3, LATENT_CH, n_f[0])
    dec["in_w"], dec["in_b"] = c["w"], c["b"]
    time_up = (None,) + tuple(cfg.decoder_time_upscale)
    for i in range(3):
        for j in range(3):
            dec[f"s{i}_mem{j}"] = _mem_p(rng, n_f[i], n_f[i])
        stride = 1 if time_up[i] in (None, False) else 2
        dec[f"s{i}_grow"] = {"w": _conv_p(rng, 1, 1, n_f[i], n_f[i] * stride, bias=False)["w"]}
        dec[f"s{i}_out_w"] = _conv_p(rng, 3, 3, n_f[i], n_f[i + 1], bias=False)["w"]
    c = _conv_p(rng, 3, 3, n_f[3], IMAGE_CH)
    dec["out_w"], dec["out_b"] = c["w"], c["b"]
    return {"encoder": enc, "decoder": dec}


def convert_taehv_state_dict(sd: dict, cfg: TinyVAEConfig = TinyVAEConfig()):
    """Convert a taew2_1.pth-style state dict (numpy arrays, torch OIHW
    layout, `encoder.N.*` / `decoder.N.*` keys per tae.py:171-217) into this
    module's pytree. TGrow weights are sliced to the last `stride*C` output
    channels when time upscaling is disabled (tae.py:221-234)."""

    def cw(key):  # conv weight OIHW -> HWIO
        return jnp.asarray(np.transpose(np.asarray(sd[key], np.float32), (2, 3, 1, 0)))

    def cb(key):
        return jnp.asarray(np.asarray(sd[key], np.float32))

    def mem(prefix):
        p = {
            "c0_w": cw(f"{prefix}.conv.0.weight"), "c0_b": cb(f"{prefix}.conv.0.bias"),
            "c1_w": cw(f"{prefix}.conv.2.weight"), "c1_b": cb(f"{prefix}.conv.2.bias"),
            "c2_w": cw(f"{prefix}.conv.4.weight"), "c2_b": cb(f"{prefix}.conv.4.bias"),
        }
        if f"{prefix}.skip.weight" in sd:
            p["skip_w"] = cw(f"{prefix}.skip.weight")
        return p

    # encoder indices in the reference nn.Sequential (tae.py:171-190)
    enc = {"in_w": cw("encoder.0.weight"), "in_b": cb("encoder.0.bias")}
    seq = ((2, 3, (4, 5, 6)), (7, 8, (9, 10, 11)), (12, 13, (14, 15, 16)))
    for i, (pool_i, down_i, mems) in enumerate(seq):
        enc[f"s{i}_pool"] = {"w": cw(f"encoder.{pool_i}.conv.weight")}
        enc[f"s{i}_down_w"] = cw(f"encoder.{down_i}.weight")
        for j, m in enumerate(mems):
            enc[f"s{i}_mem{j}"] = mem(f"encoder.{m}")
    enc["out_w"], enc["out_b"] = cw("encoder.17.weight"), cb("encoder.17.bias")

    # decoder indices (tae.py:193-217)
    dec = {"in_w": cw("decoder.1.weight"), "in_b": cb("decoder.1.bias")}
    dseq = (((3, 4, 5), 7, 8), ((9, 10, 11), 13, 14), ((15, 16, 17), 19, 20))
    time_up = (None,) + tuple(cfg.decoder_time_upscale)
    n_f = (256, 128, 64, 64)
    for i, (mems, grow_i, out_i) in enumerate(dseq):
        for j, m in enumerate(mems):
            dec[f"s{i}_mem{j}"] = mem(f"decoder.{m}")
        gw = cw(f"decoder.{grow_i}.conv.weight")
        stride = 1 if time_up[i] in (None, False) else 2
        want = n_f[i] * stride
        if gw.shape[-1] > want:  # patch_tgrow_layers: keep last-timestep chans
            gw = gw[..., -want:]
        dec[f"s{i}_grow"] = {"w": gw}
        dec[f"s{i}_out_w"] = cw(f"decoder.{out_i}.weight")
    dec["out_w"], dec["out_b"] = cw("decoder.22.weight"), cb("decoder.22.bias")
    return {"encoder": enc, "decoder": dec}


def load_tiny_vae_params(path: str, cfg: TinyVAEConfig = TinyVAEConfig()):
    """Load taew2_1 weights from .pth (torch) or .safetensors."""
    if path.endswith(".safetensors"):
        from ..utils.safetensors_io import load_safetensors

        sd = load_safetensors(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
    return convert_taehv_state_dict(sd, cfg)


def tiny_decode_wan_latents(params, latents_cfhw, cfg: TinyVAEConfig = TinyVAEConfig()):
    """Adapter with the Wan VAE decoder's calling convention: (C, F, H, W)
    latent in, (F', H'*8, W'*8, 3) RGB in [-1, 1] out (vae_tiny.py:23-27)."""
    x = jnp.transpose(latents_cfhw, (1, 2, 3, 0))[None]  # (1, T, H, W, C)
    out = tiny_decode(params, x, cfg) * 2.0 - 1.0
    return out[0]
