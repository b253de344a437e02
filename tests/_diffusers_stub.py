"""A minimal, faithful ``diffusers`` stand-in so reference modules that
import it can run on this image (diffusers is not installed here).

The reference (/root/reference) imports a handful of PUBLIC diffusers
APIs whose semantics are fixed and documented (diffusers==0.29-0.31):

* ``diffusers.utils.torch_utils.randn_tensor``
* ``diffusers.models.embeddings.get_timestep_embedding``
* ``diffusers.models.embeddings.get_1d_rotary_pos_embed`` /
  ``get_3d_rotary_pos_embed`` (CogVideoX rope)
* ``diffusers.models.embeddings.Timesteps`` / ``TimestepEmbedding``
  (Wan audio adapter)
* assorted mixins that are pure plumbing (ConfigMixin / ModelMixin /
  register_to_config / apply_forward_hook)

These are re-implemented here from their public definitions — NOT copied
from diffusers — so that the reference's *own* model code (which is what
the equivalence tests pin) executes unmodified. Where a faithful
re-implementation is impractical the name raises on use, so a test can
never silently rely on a wrong stub.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn

# --------------------------------------------------------------------------
# utils
# --------------------------------------------------------------------------


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """diffusers.utils.torch_utils.randn_tensor: sample on the generator's
    device (CPU here), then move/cast."""
    if isinstance(generator, list):
        generator = generator[0]
    return torch.randn(tuple(shape), generator=generator, dtype=dtype)


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1.0, scale=1.0, max_period=10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
    return emb


def get_1d_rotary_pos_embed(dim, pos, theta=10000.0, use_real=False,
                            linear_factor=1.0, ntk_factor=1.0,
                            repeat_interleave_real=True, freqs_dtype=torch.float32):
    if isinstance(pos, int):
        pos = torch.arange(pos)
    theta = theta * ntk_factor
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype, device=pos.device)[: dim // 2] / dim)) / linear_factor
    freqs = torch.outer(pos.to(freqs_dtype), freqs)
    if use_real and repeat_interleave_real:
        cos = freqs.cos().repeat_interleave(2, dim=1).float()
        sin = freqs.sin().repeat_interleave(2, dim=1).float()
        return cos, sin
    elif use_real:
        cos = torch.cat([freqs.cos(), freqs.cos()], dim=-1).float()
        sin = torch.cat([freqs.sin(), freqs.sin()], dim=-1).float()
        return cos, sin
    else:
        return torch.polar(torch.ones_like(freqs), freqs)


def get_3d_rotary_pos_embed(embed_dim, crops_coords, grid_size, temporal_size,
                            theta=10000.0, use_real=True, grid_type="linspace",
                            max_size=None, device=None):
    """CogVideoX 3D rope: head dim split t:h:w = 1/4 : 3/8 : 3/8."""
    if use_real is not True:
        raise ValueError("stub supports use_real=True only")
    grid_size_h, grid_size_w = grid_size
    if grid_type == "linspace":
        start, stop = crops_coords
        grid_h = torch.linspace(start[0], stop[0] * (grid_size_h - 1) / grid_size_h, grid_size_h, dtype=torch.float32)
        grid_w = torch.linspace(start[1], stop[1] * (grid_size_w - 1) / grid_size_w, grid_size_w, dtype=torch.float32)
        grid_t = torch.linspace(0, temporal_size * (temporal_size - 1) / temporal_size, temporal_size, dtype=torch.float32)
    elif grid_type == "slice":
        max_h, max_w = max_size
        grid_h = torch.arange(max_h, dtype=torch.float32)
        grid_w = torch.arange(max_w, dtype=torch.float32)
        grid_t = torch.arange(temporal_size, dtype=torch.float32)
    else:
        raise ValueError(grid_type)

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3

    freqs_t = get_1d_rotary_pos_embed(dim_t, grid_t, theta=theta, use_real=True)
    freqs_h = get_1d_rotary_pos_embed(dim_h, grid_h, theta=theta, use_real=True)
    freqs_w = get_1d_rotary_pos_embed(dim_w, grid_w, theta=theta, use_real=True)

    def combine(ft, fh, fw):
        ft = ft[:, None, None, :].expand(-1, grid_size_h, grid_size_w, -1)
        fh = fh[None, :, None, :].expand(temporal_size, -1, grid_size_w, -1)
        fw = fw[None, None, :, :].expand(temporal_size, grid_size_h, -1, -1)
        return torch.cat([ft, fh, fw], dim=-1).reshape(temporal_size * grid_size_h * grid_size_w, -1)

    t_cos, t_sin = freqs_t
    h_cos, h_sin = freqs_h
    w_cos, w_sin = freqs_w
    if grid_type == "slice":
        t_cos, t_sin = t_cos[:temporal_size], t_sin[:temporal_size]
        h_cos, h_sin = h_cos[:grid_size_h], h_sin[:grid_size_h]
        w_cos, w_sin = w_cos[:grid_size_w], w_sin[:grid_size_w]
    return combine(t_cos, h_cos, w_cos), combine(t_sin, h_sin, w_sin)


def get_3d_sincos_pos_embed(*a, **kw):
    raise NotImplementedError("stub: only the rotary CogVideoX path is exercised")


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift, scale=1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels, flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None,
                 post_act_fn=None, cond_proj_dim=None, sample_proj_bias=True):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim, sample_proj_bias)
        self.cond_proj = nn.Linear(cond_proj_dim, in_channels, bias=False) if cond_proj_dim is not None else None
        assert act_fn == "silu"
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim, sample_proj_bias)
        self.post_act = None if post_act_fn is None else nn.SiLU()

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        sample = self.linear_2(self.act(self.linear_1(sample)))
        if self.post_act is not None:
            sample = self.post_act(sample)
        return sample


# --------------------------------------------------------------------------
# plumbing mixins
# --------------------------------------------------------------------------


def register_to_config(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        import inspect

        sig = inspect.signature(fn)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        cfg.pop("kwargs", None)

        class _Cfg(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        self.config = _Cfg(cfg)
        fn(self, *args, **kwargs)

    return wrapper


class ConfigMixin:
    pass


class ModelMixin(nn.Module):
    pass


class FromOriginalModelMixin:
    pass


def apply_forward_hook(fn):
    return fn


def get_activation(name):
    return {"silu": nn.SiLU(), "swish": nn.SiLU(), "relu": nn.ReLU(),
            "gelu": nn.GELU(), "mish": nn.Mish()}[name]


class _Logging:
    @staticmethod
    def get_logger(name=None):
        import logging

        return logging.getLogger(name or "diffusers")


# --------------------------------------------------------------------------
# module installation
# --------------------------------------------------------------------------


def install():
    """Register the stub as ``diffusers`` in sys.modules. Idempotent; a
    real installed diffusers always wins."""
    if "diffusers" in sys.modules:
        return
    try:
        import diffusers  # noqa: F401

        return  # real package available
    except ImportError:
        pass

    root = types.ModuleType("diffusers")
    root.__path__ = []

    def sub(name):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
        return m

    utils = sub("diffusers.utils")
    utils.logging = _Logging()
    torch_utils = sub("diffusers.utils.torch_utils")
    torch_utils.randn_tensor = randn_tensor
    accel = sub("diffusers.utils.accelerate_utils")
    accel.apply_forward_hook = apply_forward_hook

    cfgu = sub("diffusers.configuration_utils")
    cfgu.ConfigMixin = ConfigMixin
    cfgu.register_to_config = register_to_config

    models = sub("diffusers.models")
    emb = sub("diffusers.models.embeddings")
    emb.get_timestep_embedding = get_timestep_embedding
    emb.get_1d_rotary_pos_embed = get_1d_rotary_pos_embed
    emb.get_3d_rotary_pos_embed = get_3d_rotary_pos_embed
    emb.get_3d_sincos_pos_embed = get_3d_sincos_pos_embed
    emb.Timesteps = Timesteps
    emb.TimestepEmbedding = TimestepEmbedding

    mu = sub("diffusers.models.modeling_utils")
    mu.ModelMixin = ModelMixin
    mo = sub("diffusers.models.modeling_outputs")

    class AutoencoderKLOutput:
        def __init__(self, latent_dist=None):
            self.latent_dist = latent_dist

    mo.AutoencoderKLOutput = AutoencoderKLOutput
    act = sub("diffusers.models.activations")
    act.get_activation = get_activation

    loaders = sub("diffusers.loaders")
    sfm = sub("diffusers.loaders.single_file_model")
    sfm.FromOriginalModelMixin = FromOriginalModelMixin

    root.utils = utils
    root.configuration_utils = cfgu
    root.models = models
    root.loaders = loaders
    # top-level names some reference modules import directly
    root.ConfigMixin = ConfigMixin
    root.ModelMixin = ModelMixin
    sys.modules["diffusers"] = root
