"""Hunyuan causal 3D VAE tests (tiny config): shape law, causality,
encode/decode round trip structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.vae.hunyuan_vae import (
    HunyuanVAEConfig,
    hunyuan_vae_decode,
    hunyuan_vae_encode,
    init_random_hunyuan_vae_state_dict,
    load_hunyuan_vae_params,
)

TINY = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def params():
    return load_hunyuan_vae_params(init_random_hunyuan_vae_state_dict(TINY, seed=0), TINY)


def test_config_strides():
    cfg = HunyuanVAEConfig()
    assert cfg.down_strides() == [(1, 2, 2), (2, 2, 2), (2, 2, 2), None]
    assert cfg.up_scales() == [(1, 2, 2), (2, 2, 2), (2, 2, 2), None]


def test_encode_shape(params):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9, 32, 32, 3)), jnp.float32)
    z = hunyuan_vae_encode(params, x, TINY)
    assert z.shape == (1, 3, 4, 4, 4)  # (9-1)/4+1 frames, /8 spatial


def test_decode_shape(params):
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 4, 4, 4)), jnp.float32)
    out = hunyuan_vae_decode(params, z, TINY)
    assert out.shape == (1, 9, 32, 32, 3)  # 4*(3-1)+1 frames, x8 spatial


def test_conv_level_temporal_causality():
    """The causal convs themselves must not leak future frames (the full
    decode is NOT frame-causal because GroupNorm takes global statistics —
    the reference behaves identically and handles long videos by temporal
    tiling, not streaming)."""
    from lightx2v_tpu.vae.hunyuan_vae import causal_conv3d

    rng = np.random.default_rng(2)
    w = rng.standard_normal((2, 3, 3, 3, 4, 4)).astype(np.float32)[0]  # (kt,kh,kw,I,O)
    p = {"w": jnp.asarray(w), "b": None}
    x = rng.standard_normal((1, 5, 6, 6, 4)).astype(np.float32)
    out1 = np.asarray(causal_conv3d(p, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 4] += 1.0  # perturb the last frame
    out2 = np.asarray(causal_conv3d(p, jnp.asarray(x2)))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], rtol=1e-5, atol=1e-5)
    assert np.abs(out1[:, 4] - out2[:, 4]).max() > 1e-4
    # replicate padding: first-frame output uses edge replication, not zeros
    xz = np.zeros_like(x)
    xz[:, 0] = 1.0
    oz = np.asarray(causal_conv3d(p, jnp.asarray(xz)))
    assert np.abs(oz[:, 0]).max() > 0  # replicated first frame contributes


def test_decode_sensitivity(params):
    rng = np.random.default_rng(2)
    z = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    out1 = np.asarray(hunyuan_vae_decode(params, jnp.asarray(z), TINY))
    z2 = z.copy()
    z2[:, 3] += 1.0
    out2 = np.asarray(hunyuan_vae_decode(params, jnp.asarray(z2), TINY))
    # later frames respond to the perturbation
    assert np.abs(out1[:, 9:] - out2[:, 9:]).max() > 1e-4


def test_single_frame(params):
    z = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, 4, 4, 4)), jnp.float32)
    out = hunyuan_vae_decode(params, z, TINY)
    assert out.shape == (1, 1, 32, 32, 3)


def test_roundtrip_scaling(params):
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 5, 32, 32, 3)), jnp.float32)
    z = hunyuan_vae_encode(params, x, TINY, scale=True)
    rt = hunyuan_vae_decode(params, z, TINY, scale=True)
    assert rt.shape == x.shape
    assert np.isfinite(np.asarray(rt)).all()


class TestTiledDecode:
    """Structural properties of the tiled decode. (Numeric fidelity is
    pinned against the EXECUTING reference's temporal/spatial tiled decode
    in test_reference_equivalence_vaes.py — with random weights the tile
    boundaries legitimately differ from the untiled decode, since each
    tile restarts the causal context; the reference's tiling has the same
    approximation.)"""

    def test_temporal_tiled_shape_and_first_tile(self, params):
        from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode_tiled

        z = jnp.asarray(np.random.default_rng(7).standard_normal((1, 7, 4, 4, 4)), jnp.float32)
        full = np.asarray(hunyuan_vae_decode(params, z, TINY, scale=False))
        tiled = np.asarray(hunyuan_vae_decode_tiled(params, z, TINY, scale=False,
                                                    t_tile_latent=3, use_spatial=False))
        assert tiled.shape == full.shape
        # frames before the first blend region come from decode(tile0)
        # verbatim. (No exactness vs the FULL decode: GroupNorm statistics
        # span the whole clip's T, so the Hunyuan VAE is not temporally
        # prefix-stable — the reference tiles for exactly that reason.)
        step = int(3 * (1 - 0.25))
        tile0 = np.asarray(hunyuan_vae_decode(params, z[:, : 3 + 1], TINY, scale=False))
        np.testing.assert_allclose(tiled[:, : 4 * step + 1], tile0[:, : 4 * step + 1],
                                   rtol=1e-4, atol=1e-4)

    def test_spatial_tiled_shape_and_exact_corner(self, params):
        from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode_spatial_tiled

        z = jnp.asarray(np.random.default_rng(8).standard_normal((1, 2, 8, 12, 4)), jnp.float32)
        full = np.asarray(hunyuan_vae_decode(params, z, TINY, scale=False))
        tiled = np.asarray(hunyuan_vae_decode_spatial_tiled(params, z, TINY, scale=False,
                                                            tile_latent=6))
        assert tiled.shape == full.shape

    def test_spatio_temporal_composed_shape(self, params):
        from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode_tiled

        z = jnp.asarray(np.random.default_rng(9).standard_normal((1, 7, 8, 8, 4)), jnp.float32)
        full = np.asarray(hunyuan_vae_decode(params, z, TINY, scale=False))
        tiled = np.asarray(hunyuan_vae_decode_tiled(params, z, TINY, scale=False,
                                                    t_tile_latent=3,
                                                    spatial_tile_latent=6))
        assert tiled.shape == full.shape
        assert np.isfinite(tiled).all()


def test_tiled_decode_tile_jit_parity():
    """tile_jit=True (per-tile jitted programs — the capacity mode that
    fits 480P on one v5e) must match the traced-grid decode."""
    import numpy as np

    from lightx2v_tpu.vae.hunyuan_vae import (HunyuanVAEConfig,
                                              hunyuan_vae_decode_tiled,
                                              init_random_hunyuan_vae_state_dict,
                                              load_hunyuan_vae_params)
    cfg = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                           latent_channels=16, norm_num_groups=4)
    p = load_hunyuan_vae_params(init_random_hunyuan_vae_state_dict(cfg, seed=0), cfg)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 5, 12, 20, 16)) * 0.5, jnp.float32)
    a = hunyuan_vae_decode_tiled(p, z, cfg, scale=False, t_tile_latent=3,
                                 spatial_tile_latent=8)
    b = hunyuan_vae_decode_tiled(p, z, cfg, scale=False, t_tile_latent=3,
                                 spatial_tile_latent=8, tile_jit=True)
    assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) < 2e-5
