"""CogVideoX VAE tests (tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.vae.cogvideox_vae import (
    CogVAEConfig,
    cog_vae_decode,
    cog_vae_encode,
    init_random_cog_vae_state_dict,
    load_cog_vae_params,
)

TINY = CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                    latent_channels=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def params():
    return load_cog_vae_params(init_random_cog_vae_state_dict(TINY, seed=0), TINY)


def test_encode_shape(params):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9, 32, 32, 3)), jnp.float32)
    z = cog_vae_encode(params, x, TINY)
    assert z.shape == (1, 3, 4, 4, 4)


def test_decode_shape(params):
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 4, 4, 4)), jnp.float32)
    out = cog_vae_decode(params, z, TINY)
    assert out.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_roundtrip(params):
    # CogVideoX round-trips odd latent counts (real configs: 49/81 frames
    # -> 13/21 latents); 9 frames -> 3 latents -> 9 frames
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 9, 32, 32, 3)), jnp.float32)
    z = cog_vae_encode(params, x, TINY, scale=True)
    assert z.shape[1] == 3
    rt = cog_vae_decode(params, z, TINY, scale=True)
    assert rt.shape == x.shape


def test_single_frame(params):
    z = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, 4, 4, 4)), jnp.float32)
    out = cog_vae_decode(params, z, TINY)
    assert out.shape == (1, 1, 32, 32, 3)


def test_spatial_tiled_decode(params):
    """Tiled decode (reference autoencoder_ks_cogvidex.py tiled_decode
    :1035-1110): same output shape, tile interiors match the per-tile
    decode verbatim, and small tiles dispatch to the untiled path."""
    from lightx2v_tpu.vae.cogvideox_vae import cog_vae_decode_tiled

    z = jnp.asarray(np.random.default_rng(4).standard_normal((1, 3, 8, 12, 4)), jnp.float32)
    full = np.asarray(cog_vae_decode(params, z, TINY, scale=False))
    tiled = np.asarray(cog_vae_decode_tiled(params, z, TINY, scale=False, tile_latent=6))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    # the first tile's un-blended corner comes from decode(tile0) verbatim
    step = int(6 * (1 - 0.25))  # 4 latent -> 32 px at 8x upsampling
    tile0 = np.asarray(cog_vae_decode(params, z[:, :, :6, :6], TINY, scale=False))
    np.testing.assert_allclose(tiled[:, :, : step * 8, : step * 8],
                               tile0[:, :, : step * 8, : step * 8], rtol=1e-4, atol=1e-4)
    # <= one tile: falls back to the untiled decode exactly
    small = np.asarray(cog_vae_decode_tiled(params, z[:, :, :6, :6], TINY,
                                            scale=False, tile_latent=8))
    np.testing.assert_allclose(small, tile0, rtol=0, atol=0)


def test_tiled_decode_tile_jit_parity():
    """tile_jit=True (per-tile jitted programs — the capacity mode that
    fits 480P on one v5e) must match the traced-grid decode exactly."""
    import numpy as np

    from lightx2v_tpu.vae.cogvideox_vae import (CogVAEConfig, cog_vae_decode_tiled,
                                                init_random_cog_vae_state_dict,
                                                load_cog_vae_params)
    cfg = CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                       norm_num_groups=4)
    p = load_cog_vae_params(init_random_cog_vae_state_dict(cfg, seed=0), cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 3, 12, 20, 16)) * 0.7, jnp.float32)
    a = cog_vae_decode_tiled(p, z, cfg, scale=False, tile_latent=8)
    b = cog_vae_decode_tiled(p, z, cfg, scale=False, tile_latent=8, tile_jit=True)
    assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) < 1e-5
