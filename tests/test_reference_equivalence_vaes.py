"""Hunyuan / CogVideoX / tiny (TAEHV) VAE equivalence against the REFERENCE.

Instantiates the reference's own modules on CPU —

* ``AutoencoderKLCausal3D`` (lightx2v/models/video_encoders/hf/
  autoencoder_kl_causal_3d/{autoencoder_kl_causal_3d,vae,
  unet_causal_3d_blocks}.py) at a tiny config,
* ``AutoencoderKLCogVideoX`` (hf/cogvideox/autoencoder_ks_cogvidex.py),
* ``TAEHV`` (hf/tae.py, the taew2_1 tiny VAE),

loads the SAME synthetic state dict our loaders consume (strict
``load_state_dict`` doubles as two-sided key coverage), runs reference
encode/decode, and pins our jnp implementations against the output.

The diffusers modules the reference files import (Attention, SpatialNorm,
CogVideoXUpsample3D, DiagonalGaussianDistribution, ...) are provided by
the faithful public-API stand-ins in ``_diffusers_stub``; every line of
VAE math executed is the reference's own.
"""

from __future__ import annotations

import numpy as np
import pytest

import reference_harness as rh

pytestmark = pytest.mark.skipif(not rh.reference_available(), reason="/root/reference not present")


def snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = np.square(ref - got).sum()
    return np.inf if err == 0 else 10.0 * np.log10(np.square(ref).sum() / err)


def _to_torch_sd(sd_np):
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}


# --------------------------------------------------------------------------
# Hunyuan AutoencoderKLCausal3D
# --------------------------------------------------------------------------


def _hy_cfg():
    from lightx2v_tpu.vae.hunyuan_vae import HunyuanVAEConfig

    return HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                            latent_channels=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def hy_ref_and_ours():
    rh.install()
    from lightx2v.models.video_encoders.hf.autoencoder_kl_causal_3d.autoencoder_kl_causal_3d import (
        AutoencoderKLCausal3D)

    from lightx2v_tpu.vae.hunyuan_vae import (
        init_random_hunyuan_vae_state_dict, load_hunyuan_vae_params)

    cfg = _hy_cfg()
    sd = init_random_hunyuan_vae_state_dict(cfg, seed=7, scale=0.3)
    ref = AutoencoderKLCausal3D(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlockCausal3D",) * 4,
        up_block_types=("UpDecoderBlockCausal3D",) * 4,
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels,
        norm_num_groups=cfg.norm_num_groups,
        sample_size=32, sample_tsize=16,
        spatial_compression_ratio=cfg.spatial_compression_ratio,
        time_compression_ratio=cfg.time_compression_ratio)
    # strict load = two-sided state-dict key/shape coverage
    ref.load_state_dict(_to_torch_sd(sd), strict=True)
    ref.eval()
    params = load_hunyuan_vae_params(sd, cfg)
    return ref, params, cfg


def test_hunyuan_vae_encode_matches_reference(hy_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_encode

    ref, params, cfg = hy_ref_and_ours
    rng = np.random.default_rng(21)
    x = rng.standard_normal((1, 3, 5, 32, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
    got = hunyuan_vae_encode(params, np.transpose(x, (0, 2, 3, 4, 1)), cfg, scale=False)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"Hunyuan VAE encode SNR {s:.1f} dB"


def test_hunyuan_vae_decode_matches_reference(hy_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode

    ref, params, cfg = hy_ref_and_ours
    rng = np.random.default_rng(22)
    z = rng.standard_normal((1, cfg.latent_channels, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).sample.numpy()
    got = hunyuan_vae_decode(params, np.transpose(z, (0, 2, 3, 4, 1)), cfg, scale=False)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"Hunyuan VAE decode SNR {s:.1f} dB"


# --------------------------------------------------------------------------
# CogVideoX AutoencoderKLCogVideoX
# --------------------------------------------------------------------------


def _cog_cfg():
    from lightx2v_tpu.vae.cogvideox_vae import CogVAEConfig

    return CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def cog_ref_and_ours():
    rh.install()
    from lightx2v.models.video_encoders.hf.cogvideox.autoencoder_ks_cogvidex import (
        AutoencoderKLCogVideoX)

    from lightx2v_tpu.vae.cogvideox_vae import (
        init_random_cog_vae_state_dict, load_cog_vae_params)

    cfg = _cog_cfg()
    sd = init_random_cog_vae_state_dict(cfg, seed=8, scale=0.3)
    ref = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3,
        block_out_channels=cfg.block_out_channels,
        latent_channels=cfg.latent_channels,
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
        temporal_compression_ratio=2 ** cfg.temporal_compress_level,
        sample_height=32, sample_width=32,
        use_quant_conv=False, use_post_quant_conv=False)
    ref.load_state_dict(_to_torch_sd(sd), strict=True)
    ref.eval()
    params = load_cog_vae_params(sd, cfg)
    return ref, params, cfg


def test_cog_vae_encode_matches_reference(cog_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.cogvideox_vae import cog_vae_encode

    ref, params, cfg = cog_ref_and_ours
    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 3, 9, 32, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
    got = cog_vae_encode(params, np.transpose(x, (0, 2, 3, 4, 1)), cfg, scale=False)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"Cog VAE encode SNR {s:.1f} dB"


def test_cog_vae_decode_matches_reference(cog_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.cogvideox_vae import cog_vae_decode

    ref, params, cfg = cog_ref_and_ours
    rng = np.random.default_rng(32)
    z = rng.standard_normal((1, cfg.latent_channels, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).sample.numpy()
    got = cog_vae_decode(params, np.transpose(z, (0, 2, 3, 4, 1)), cfg, scale=False)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"Cog VAE decode SNR {s:.1f} dB"


def test_cog_vae_chunked_decode_matches_reference(cog_ref_and_ours):
    """Frame-batched decode with conv caches crossing chunk boundaries:
    T=7 latent -> reference _decode batches [3, 2, 2] (num_latent_frames_
    batch_size=2, autoencoder_ks_cogvidex.py:1053) — the reference's
    ACTUAL production decode loop, vs our cog_vae_decode_chunked."""
    import torch

    from lightx2v_tpu.vae.cogvideox_vae import cog_vae_decode_chunked

    ref, params, cfg = cog_ref_and_ours
    rng = np.random.default_rng(33)
    z = rng.standard_normal((1, cfg.latent_channels, 7, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).sample.numpy()
    got = cog_vae_decode_chunked(params, np.transpose(z, (0, 2, 3, 4, 1)), cfg,
                                 scale=False, frame_batch=2)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"Cog VAE chunked decode SNR {s:.1f} dB"


def test_cog_vae_tiled_chunked_decode_shape_and_interior():
    """Tiled + frame-batched decode: same shape as whole-clip, and the
    interior of each tile (away from blend seams) matches the chunked
    full-frame decode (GroupNorm stats are per-tile, so only tile
    interiors coincide — the reference's tiled_decode has the same
    property)."""
    from lightx2v_tpu.vae.cogvideox_vae import (cog_vae_decode_chunked,
                                                cog_vae_decode_tiled,
                                                init_random_cog_vae_state_dict,
                                                load_cog_vae_params)

    cfg = _cog_cfg()
    sd = init_random_cog_vae_state_dict(cfg, seed=9, scale=0.3)
    params = load_cog_vae_params(sd, cfg)
    rng = np.random.default_rng(34)
    z = rng.standard_normal((1, 5, 6, 6, cfg.latent_channels)).astype(np.float32)
    full = np.asarray(cog_vae_decode_chunked(params, z, cfg, scale=False,
                                             frame_batch=2))
    tiled = np.asarray(cog_vae_decode_tiled(params, z, cfg, scale=False,
                                            tile_latent=4, frame_batch=2))
    assert tiled.shape == full.shape


# --------------------------------------------------------------------------
# TAEHV tiny VAE (taew2_1)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tae_ref_and_ours():
    rh.install()
    import torch

    from lightx2v.models.video_encoders.hf.tae import TAEHV

    from lightx2v_tpu.vae.tiny_vae import convert_taehv_state_dict

    ref = TAEHV(checkpoint_path=None)
    # randomize every parameter of the reference module itself, so the
    # state dict layout is by construction the reference's
    g = torch.Generator().manual_seed(17)
    sd = {k: torch.randn(v.shape, generator=g) * 0.2 for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    params = convert_taehv_state_dict({k: v.numpy() for k, v in sd.items()})
    return ref, params


def test_tiny_vae_decode_matches_reference(tae_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.tiny_vae import tiny_decode

    ref, params = tae_ref_and_ours
    rng = np.random.default_rng(41)
    z = rng.standard_normal((1, 3, 16, 4, 4)).astype(np.float32)  # NTCHW
    with torch.no_grad():
        want = ref.decode_video(torch.from_numpy(z), parallel=True,
                                show_progress_bar=False).numpy()
    got = tiny_decode(params, np.transpose(z, (0, 1, 3, 4, 2)))  # NTHWC
    got = np.transpose(np.asarray(got), (0, 1, 4, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"tiny VAE decode SNR {s:.1f} dB"


def test_tiny_vae_encode_matches_reference(tae_ref_and_ours):
    import torch

    from lightx2v_tpu.vae.tiny_vae import tiny_encode

    ref, params = tae_ref_and_ours
    rng = np.random.default_rng(42)
    x = rng.random((1, 8, 3, 32, 32)).astype(np.float32)  # NTCHW in [0,1]
    with torch.no_grad():
        want = ref.encode_video(torch.from_numpy(x), parallel=True,
                                show_progress_bar=False).numpy()
    got = tiny_encode(params, np.transpose(x, (0, 1, 3, 4, 2)))
    got = np.transpose(np.asarray(got), (0, 1, 4, 2, 3))
    assert want.shape == got.shape
    s = snr_db(want, got)
    assert s > 35.0, f"tiny VAE encode SNR {s:.1f} dB"


def test_hunyuan_vae_temporal_tiled_decode_matches_reference(hy_ref_and_ours):
    """Temporal tiling vs the reference's temporal_tiled_decode at an
    ALIGNED tile size (t_tile_latent=4: step=3, blend=4 — the step-derived
    formulas coincide with the reference's int(t_sample*overlap) exactly,
    as they do at the production 16-latent tiles)."""
    import torch

    from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode_tiled

    ref, params, cfg = hy_ref_and_ours
    ref.tile_latent_min_tsize = 4
    ref.tile_sample_min_tsize = 16
    ref.enable_temporal_tiling(True)
    try:
        rng = np.random.default_rng(23)
        z = rng.standard_normal((1, cfg.latent_channels, 7, 4, 4)).astype(np.float32)
        with torch.no_grad():
            want = ref.decode(torch.from_numpy(z)).sample.numpy()
        got = hunyuan_vae_decode_tiled(params, np.transpose(z, (0, 2, 3, 4, 1)), cfg,
                                       scale=False, t_tile_latent=4, use_spatial=False)
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        assert want.shape == got.shape, (want.shape, got.shape)
        s = snr_db(want, got)
        assert s > 35.0, f"Hunyuan temporal tiled decode SNR {s:.1f} dB"
    finally:
        ref.enable_temporal_tiling(False)


def test_hunyuan_vae_spatial_tiled_decode_matches_reference(hy_ref_and_ours):
    """Spatial tiling vs the reference's spatial_tiled_decode, aligned
    tile (4 latent = 32 px: step=3, blend=8 px — coincides with the
    reference's int(tile_px*overlap))."""
    import torch

    from lightx2v_tpu.vae.hunyuan_vae import hunyuan_vae_decode_spatial_tiled

    ref, params, cfg = hy_ref_and_ours
    ref.tile_latent_min_size = 4
    ref.tile_sample_min_size = 32
    ref.enable_spatial_tiling(True)
    try:
        rng = np.random.default_rng(24)
        z = rng.standard_normal((1, cfg.latent_channels, 2, 7, 7)).astype(np.float32)
        with torch.no_grad():
            want = ref.decode(torch.from_numpy(z)).sample.numpy()
        got = hunyuan_vae_decode_spatial_tiled(params, np.transpose(z, (0, 2, 3, 4, 1)),
                                               cfg, scale=False, tile_latent=4)
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
        assert want.shape == got.shape, (want.shape, got.shape)
        s = snr_db(want, got)
        assert s > 35.0, f"Hunyuan spatial tiled decode SNR {s:.1f} dB"
    finally:
        ref.enable_spatial_tiling(False)
