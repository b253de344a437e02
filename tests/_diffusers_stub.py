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
# outputs / distributions (diffusers.utils.BaseOutput and
# diffusers.models.autoencoders.vae — public semantics)
# --------------------------------------------------------------------------


class BaseOutput:
    """Dataclass base whose fields are attribute- and index-accessible."""

    def __getitem__(self, k):
        if isinstance(k, str):
            return getattr(self, k)
        import dataclasses

        return dataclasses.astuple(self)[k]


def is_torch_version(op, version):
    from packaging.version import Version

    cur = Version(torch.__version__.split("+")[0])
    tgt = Version(version)
    return {">=": cur >= tgt, ">": cur > tgt, "<=": cur <= tgt,
            "<": cur < tgt, "==": cur == tgt}[op]


class DiagonalGaussianDistribution:
    """diffusers.models.autoencoders.vae.DiagonalGaussianDistribution."""

    def __init__(self, parameters, deterministic=False):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = torch.exp(0.5 * self.logvar)
        self.var = torch.exp(self.logvar)
        if deterministic:
            self.var = self.std = torch.zeros_like(self.mean)

    def sample(self, generator=None):
        noise = randn_tensor(self.mean.shape, generator=generator,
                             dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self):
        return self.mean


# --------------------------------------------------------------------------
# attention_processor (deprecated-attn-block path used by the causal VAEs)
# --------------------------------------------------------------------------


class SpatialNorm(nn.Module):
    """diffusers SpatialNorm: GroupNorm(f) modulated by resized zq."""

    def __init__(self, f_channels, zq_channels):
        super().__init__()
        self.norm_layer = nn.GroupNorm(num_channels=f_channels, num_groups=32,
                                       eps=1e-6, affine=True)
        self.conv_y = nn.Conv2d(zq_channels, f_channels, 1)
        self.conv_b = nn.Conv2d(zq_channels, f_channels, 1)

    def forward(self, f, zq):
        f_size = f.shape[-2:]
        zq = nn.functional.interpolate(zq, size=f_size, mode="nearest")
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention, restricted to the
    self-attention configuration the causal VAEs use (group_norm +
    to_q/k/v + to_out.0, residual connection, SDPA with additive mask)."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False, norm_num_groups=None,
                 spatial_norm_dim=None, out_bias=True, scale_qk=True,
                 eps=1e-5, rescale_output_factor=1.0,
                 residual_connection=False, _from_deprecated_attn_block=False,
                 processor=None, **kwargs):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.group_norm = (nn.GroupNorm(num_channels=query_dim,
                                        num_groups=norm_num_groups, eps=eps,
                                        affine=True)
                           if norm_num_groups is not None else None)
        self.spatial_norm = (SpatialNorm(query_dim, spatial_norm_dim)
                             if spatial_norm_dim is not None else None)
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=out_bias),
                                     nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None, temb=None,
                attention_mask=None, **kwargs):
        residual = hidden_states
        b, seq, _ = hidden_states.shape
        if attention_mask is not None:
            # prepare_attention_mask + view to (b, heads, q, k)
            if attention_mask.shape[0] < b * self.heads:
                attention_mask = attention_mask.repeat_interleave(self.heads, dim=0)
            attention_mask = attention_mask.view(b, self.heads, -1, attention_mask.shape[-1])
        if self.group_norm is not None:
            hidden_states = self.group_norm(hidden_states.transpose(1, 2)).transpose(1, 2)
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self.to_q(hidden_states)
        k = self.to_k(ctx)
        v = self.to_v(ctx)
        head_dim = k.shape[-1] // self.heads
        q = q.view(b, -1, self.heads, head_dim).transpose(1, 2)
        k = k.view(b, -1, self.heads, head_dim).transpose(1, 2)
        v = v.view(b, -1, self.heads, head_dim).transpose(1, 2)
        out = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, attn_mask=attention_mask, dropout_p=0.0, is_causal=False)
        out = out.transpose(1, 2).reshape(b, -1, self.heads * head_dim).to(q.dtype)
        out = self.to_out[0](out)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor


class AttnProcessor:
    pass


class AttnAddedKVProcessor:
    pass


ADDED_KV_ATTENTION_PROCESSORS = (AttnAddedKVProcessor,)
CROSS_ATTENTION_PROCESSORS = (AttnProcessor,)


# --------------------------------------------------------------------------
# normalization (imported by unet_causal_3d_blocks; default VAE configs
# never instantiate these, but they must exist and be faithful)
# --------------------------------------------------------------------------


class AdaGroupNorm(nn.Module):
    def __init__(self, embedding_dim, out_dim, num_groups, act_fn=None, eps=1e-5):
        super().__init__()
        self.num_groups = num_groups
        self.eps = eps
        self.act = get_activation(act_fn) if act_fn else None
        self.linear = nn.Linear(embedding_dim, out_dim * 2)

    def forward(self, x, emb):
        if self.act:
            emb = self.act(emb)
        emb = self.linear(emb)[:, :, None, None]
        scale, shift = emb.chunk(2, dim=1)
        x = nn.functional.group_norm(x, self.num_groups, eps=self.eps)
        return x * (1 + scale) + shift


class RMSNorm(nn.Module):
    def __init__(self, dim, eps, elementwise_affine=True):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None

    def forward(self, hidden_states):
        input_dtype = hidden_states.dtype
        variance = hidden_states.to(torch.float32).pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states.to(torch.float32) * torch.rsqrt(variance + self.eps)
        if self.weight is not None:
            if self.weight.dtype in [torch.float16, torch.bfloat16]:
                hidden_states = hidden_states.to(self.weight.dtype)
            hidden_states = hidden_states * self.weight
        else:
            hidden_states = hidden_states.to(input_dtype)
        return hidden_states


# --------------------------------------------------------------------------
# CogVideoX up/downsampling (public diffusers modules used by the Cog VAE)
# --------------------------------------------------------------------------


class CogVideoXDownsample3D(nn.Module):
    """Optional first-frame-preserving temporal avg-pool, then stride-2
    2D conv with (0,1,0,1) asymmetric pad. NCTHW."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=2,
                 padding=0, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            b, c, t, h, w = x.shape
            if t % 2 == 1 and t > 1:
                first, rest = x[:, :, :1], x[:, :, 1:]
                rest = (rest[:, :, 0::2] + rest[:, :, 1::2]) * 0.5
                x = torch.cat([first, rest], dim=2)
            elif t > 1:
                x = (x[:, :, 0::2] + x[:, :, 1::2]) * 0.5
        x = torch.nn.functional.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        b, c, t, h, w = x.shape
        xf = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        out = self.conv(xf)
        return out.reshape(b, t, *out.shape[1:]).permute(0, 2, 1, 3, 4)


class CogVideoXUpsample3D(nn.Module):
    """Nearest 2x upsampling (first-frame spatial-only split for odd T in
    compress_time mode), then 3x3 2D conv. NCTHW."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=1, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding)
        self.compress_time = compress_time

    def forward(self, x):
        up2 = lambda v, dims: torch.repeat_interleave(
            torch.repeat_interleave(v, 2, dim=dims[0]), 2, dim=dims[1])
        if self.compress_time:
            t = x.shape[2]
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :, :1], x[:, :, 1:]
                first = up2(first, (3, 4))
                rest = torch.repeat_interleave(up2(rest, (3, 4)), 2, dim=2)
                x = torch.cat([first, rest], dim=2)
            elif t > 1:
                x = torch.repeat_interleave(up2(x, (3, 4)), 2, dim=2)
            else:
                x = up2(x, (3, 4))
        else:
            x = up2(x, (3, 4))
        b, c, t, h, w = x.shape
        xf = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        out = self.conv(xf)
        return out.reshape(b, t, *out.shape[1:]).permute(0, 2, 1, 3, 4)


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
    utils.BaseOutput = BaseOutput
    utils.is_torch_version = is_torch_version
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

    ap = sub("diffusers.models.attention_processor")
    ap.SpatialNorm = SpatialNorm
    ap.Attention = Attention
    ap.AttnProcessor = AttnProcessor
    ap.AttnAddedKVProcessor = AttnAddedKVProcessor
    ap.AttentionProcessor = AttnProcessor  # typing alias in real diffusers
    ap.ADDED_KV_ATTENTION_PROCESSORS = ADDED_KV_ATTENTION_PROCESSORS
    ap.CROSS_ATTENTION_PROCESSORS = CROSS_ATTENTION_PROCESSORS

    norm = sub("diffusers.models.normalization")
    norm.AdaGroupNorm = AdaGroupNorm
    norm.RMSNorm = RMSNorm

    ups = sub("diffusers.models.upsampling")
    ups.CogVideoXUpsample3D = CogVideoXUpsample3D
    downs = sub("diffusers.models.downsampling")
    downs.CogVideoXDownsample3D = CogVideoXDownsample3D

    av = sub("diffusers.models.autoencoders")
    avv = sub("diffusers.models.autoencoders.vae")

    class _DecoderOutput(BaseOutput):
        def __init__(self, sample, commit_loss=None):
            self.sample = sample
            self.commit_loss = commit_loss

    avv.DecoderOutput = _DecoderOutput
    avv.DiagonalGaussianDistribution = DiagonalGaussianDistribution

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
