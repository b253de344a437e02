"""Spatially-parallel VAE decode.

Reference (lightx2v/models/video_encoders/hf/wan/vae.py:883-947): the
latent W (or H) axis splits across ranks with a 1-latent-pixel halo, each
rank decodes its slice, trims 8x the halo, and all-gathers.

TPU version: ``shard_map`` over the ``sp`` axis; each device slices its
chunk+halo from the (replicated, small) latent tensor by mesh position.
Because the VAE's spatial convs are zero-padded SAME convs, giving the
true boundary devices a zero halo reproduces the serial result exactly at
the edges; interior seams carry the same 1-pixel-halo approximation the
reference accepts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..vae.wan_vae import WanVAEConfig, vae_decode


def parallel_vae_decode(params, z: jnp.ndarray, cfg: WanVAEConfig, mesh: Mesh,
                        axis: str = "sp", scale: bool = True) -> jnp.ndarray:
    """z: (B, T, h, w, C) replicated -> frames (B, T', 8h, 8w, 3), w sharded
    during compute. w must divide the axis size.

    When the mesh also has a non-trivial ``tp`` axis, decode runs on a 2D
    spatial grid — H split over tp, W split over sp — so a 720P long-video
    decode uses EVERY chip of an sp x tp mesh (the reference only splits
    one axis across ranks, vae.py:883-947)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n = sizes.get(axis, 1)
    nh = sizes.get("tp", 1) if axis != "tp" else 1
    b, t, h, w, c = z.shape
    if nh > 1 and h % nh == 0:
        return _parallel_vae_decode_2d(params, z, cfg, mesh, axis, "tp", scale)
    if n == 1:
        return vae_decode(params, z, cfg, scale=scale)
    assert w % n == 0, f"latent width {w} % sp {n} != 0"
    chunk = w // n
    halo = 1
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (halo, halo), (0, 0)))

    def local(z_full):
        i = jax.lax.axis_index(axis)
        z_loc = jax.lax.dynamic_slice_in_dim(z_full, i * chunk, chunk + 2 * halo, axis=3)
        dec = vae_decode(params, z_loc, cfg, scale=scale)  # (B, T', 8*(chunk+2), 3)
        return dec[:, :, :, 8 * halo : -8 * halo]

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(),
        out_specs=P(None, None, None, axis, None),
        check_vma=False,
    )(zp)
    return out


def _parallel_vae_decode_2d(params, z: jnp.ndarray, cfg: WanVAEConfig, mesh: Mesh,
                            ax_w: str, ax_h: str, scale: bool) -> jnp.ndarray:
    """2D spatial-grid decode: H over ``ax_h``, W over ``ax_w``, 1-latent
    halo on both axes (same seam semantics as the 1D split)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nw, nh = sizes.get(ax_w, 1), sizes.get(ax_h, 1)
    b, t, h, w, c = z.shape
    assert h % nh == 0 and w % max(nw, 1) == 0
    ch, cw = h // nh, w // max(nw, 1)
    halo = 1
    zp = jnp.pad(z, ((0, 0), (0, 0), (halo, halo), (halo, halo), (0, 0)))

    def local(z_full):
        i = jax.lax.axis_index(ax_w) if nw > 1 else 0
        j = jax.lax.axis_index(ax_h)
        z_loc = jax.lax.dynamic_slice_in_dim(z_full, j * ch, ch + 2 * halo, axis=2)
        z_loc = jax.lax.dynamic_slice_in_dim(z_loc, i * cw, cw + 2 * halo, axis=3)
        dec = vae_decode(params, z_loc, cfg, scale=scale)
        return dec[:, :, 8 * halo : -8 * halo, 8 * halo : -8 * halo]

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(),
        out_specs=P(None, None, ax_h, ax_w if nw > 1 else None, None),
        check_vma=False,
    )(zp)
    return out
