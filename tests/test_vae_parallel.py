"""Parallel VAE decode vs the reference's distributed-algorithm semantics.

The reference (hf/wan/vae.py decode_dist :883-947) slices the latent with
a 1-pixel halo, runs the FULL decoder on each local slice (mid attention
included — local-slice attention divergence is accepted), trims 8x the
halo, and gathers. The right parity oracle is therefore that algorithm
run serially, not the serial decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.parallel.mesh import build_mesh
from lightx2v_tpu.parallel.vae_parallel import parallel_vae_decode
from lightx2v_tpu.vae.wan_vae import (WanVAEConfig, init_random_vae_state_dict,
                                      load_wan_vae_params, vae_decode)


@pytest.fixture(scope="module")
def vae():
    cfg = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
    params = load_wan_vae_params(init_random_vae_state_dict(cfg, seed=2), cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 16)) * 0.4, jnp.float32)
    return cfg, params, z


def _oracle_1d(params, z, cfg, n, axis=3, halo=1):
    """decode_dist semantics, serial: pad, slice chunk+2*halo, decode,
    trim 8*halo, concat. Matches the shard_map's uniform pad-both-ends
    slicing (zero halo at true borders == SAME-conv zero padding)."""
    chunk = z.shape[axis] // n
    zp = jnp.pad(z, [(0, 0)] * axis + [(halo, halo)] + [(0, 0)] * (z.ndim - axis - 1))
    outs = []
    for i in range(n):
        zi = jax.lax.dynamic_slice_in_dim(zp, i * chunk, chunk + 2 * halo, axis=axis)
        di = vae_decode(params, zi, cfg)
        di = jax.lax.slice_in_dim(di, 8 * halo, di.shape[axis] - 8 * halo, axis=axis)
        outs.append(di)
    return jnp.concatenate(outs, axis=axis)


def test_parallel_1d_matches_reference_algorithm(vae):
    cfg, params, z = vae
    mesh = build_mesh({"sp": 2})
    out = np.asarray(parallel_vae_decode(params, z, cfg, mesh), np.float32)
    want = np.asarray(_oracle_1d(params, z, cfg, 2), np.float32)
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=2e-4, rtol=1e-3)


def test_parallel_2d_matches_nested_oracle(vae):
    cfg, params, z = vae
    mesh = build_mesh({"sp": 2, "tp": 2})
    out = np.asarray(parallel_vae_decode(params, z, cfg, mesh), np.float32)

    # nested oracle: slice H and W with halos, decode each tile, trim both
    halo = 1
    ch, cw = z.shape[2] // 2, z.shape[3] // 2
    zp = jnp.pad(z, ((0, 0), (0, 0), (halo, halo), (halo, halo), (0, 0)))
    rows = []
    for j in range(2):
        tiles = []
        for i in range(2):
            zt = zp[:, :, j * ch : j * ch + ch + 2 * halo, i * cw : i * cw + cw + 2 * halo]
            dt = vae_decode(params, zt, cfg)
            tiles.append(dt[:, :, 8 * halo : -8 * halo, 8 * halo : -8 * halo])
        rows.append(jnp.concatenate(tiles, axis=3))
    want = np.asarray(jnp.concatenate(rows, axis=2), np.float32)
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=2e-4, rtol=1e-3)


def test_parallel_2d_falls_back_when_h_indivisible(vae):
    cfg, params, _ = vae
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 3, 7, 8, 16)) * 0.4, jnp.float32)  # h=7 % 2 != 0
    mesh = build_mesh({"sp": 2, "tp": 2})
    out = np.asarray(parallel_vae_decode(params, z, cfg, mesh), np.float32)
    want = np.asarray(_oracle_1d(params, z, cfg, 2), np.float32)  # 1D w-split path
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=2e-4, rtol=1e-3)
