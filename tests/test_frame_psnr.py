"""Frame-level PSNR vs the REFERENCE pipeline — the north-star proxy.

SURVEY §6's north star is "PSNR >= 35 dB vs reference frames". No real
checkpoint is obtainable in this image (NEXT_STEPS.md), so this is the
strongest offline proxy: run the reference's OWN torch pipeline
end-to-end on CPU — its scheduler loop driving its DiT infer classes
exactly as DefaultRunner.run() does (reference
models/runners/default_runner.py:97-114) and then its causal-VAE decode
(default_runner.py:170-179) — at a small-but-real config with a shared
synthetic checkpoint, for ALL THREE families, and assert our pipeline's
FRAMES (not latents) match at PSNR >= 35 dB.

PSNR uses the reference frames' own dynamic range as peak (with real
checkpoints the decoder output range is [-1, 1] and peak = 2; random
weights shift the range, so peak follows the data). The text/image
encoders sit outside this loop on both sides — their execution
equivalence is pinned separately against tiny REAL HF models
(test_hf_text_encoders.py) and the reference's own T5/CLIP modules
(test_reference_equivalence_encoders.py); both stacks here consume one
shared synthetic context, exactly like the latent-level e2e tests.
"""

from __future__ import annotations

import numpy as np
import pytest

import reference_harness as rh

pytestmark = pytest.mark.skipif(not rh.reference_available(), reason="/root/reference not present")


def psnr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    mse = float(np.mean(np.square(ref - got)))
    peak = float(ref.max() - ref.min())
    return np.inf if mse == 0 else 10.0 * np.log10(peak * peak / mse)


# --------------------------------------------------------------------------
# Wan2.1: UniPC CFG loop -> causal 3D VAE decode
# --------------------------------------------------------------------------

WAN_VAE = dict(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
               temperal_downsample=(False, True, True))


def test_wan_frames_match_reference(tmp_path):
    cfg = rh.tiny_config(infer_steps=8)
    ckpt = rh.make_checkpoint(cfg, str(tmp_path))
    _, ref_lat = rh.run_reference_pipeline(cfg, ckpt)

    rh.install()
    import torch

    from lightx2v.models.video_encoders.hf.wan.vae import WanVAE_

    from lightx2v_tpu.vae.wan_vae import (WanVAEConfig, init_random_vae_state_dict,
                                          load_wan_vae_params, vae_decode)

    vcfg = WanVAEConfig(**WAN_VAE)
    vsd = init_random_vae_state_dict(vcfg, seed=5)
    ref_vae = WanVAE_(dim=vcfg.dim, z_dim=vcfg.z_dim, dim_mult=list(vcfg.dim_mult),
                      num_res_blocks=vcfg.num_res_blocks, attn_scales=[],
                      temperal_downsample=list(vcfg.temperal_downsample))
    missing, unexpected = ref_vae.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in vsd.items()}, strict=False)
    assert not missing and not unexpected
    ref_vae.eval()
    with torch.no_grad():
        # (B,C,T,h,w) -> frames (B,C,T,H,W); identity latent scale on both
        # sides (the runner's mean/std scale is a shared elementwise
        # constant transform, wan_vae.py WAN_LATENT_MEAN/STD)
        ref_frames = ref_vae.decode(torch.from_numpy(ref_lat[None]),
                                    scale=[0.0, 1.0]).numpy()
    ref_frames = ref_frames.transpose(0, 2, 3, 4, 1)  # -> (B,T,H,W,C)

    # ours: same checkpoint, same initial torch noise, full pipeline
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.config import arch_from_config
    from lightx2v_tpu.models.wan.pipeline import make_denoise_fn
    from lightx2v_tpu.models.wan.weights import load_wan_params
    from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler
    from lightx2v_tpu.utils.safetensors_io import load_file

    arch = arch_from_config(cfg)
    params = load_wan_params(load_file(f"{ckpt}/model.safetensors"), arch)
    scfg = rh.Cfg(dict(cfg))
    scfg["latent_init"] = "torch"
    sched = WanUniPCScheduler(scfg)
    state = sched.prepare(cfg["target_shape"], seed=cfg["seed"])
    denoise = make_denoise_fn(arch, sched, cfg["target_shape"], enable_cfg=True,
                              guide_scale=cfg["sample_guide_scale"],
                              self_attn_type="xla", cross_attn_type="xla")
    ctx, ctx_null = rh.reference_text_inputs(cfg)
    state_f = denoise(params, state, jnp.asarray(ctx)[None], jnp.asarray(ctx_null)[None])
    z = jnp.transpose(state_f["latents"].astype(jnp.float32), (1, 2, 3, 0))[None]
    got_frames = np.asarray(vae_decode(load_wan_vae_params(vsd, vcfg), z, vcfg,
                                       scale=False), np.float32)

    assert got_frames.shape == ref_frames.shape
    p = psnr_db(ref_frames, got_frames)
    print(f"wan frame PSNR {p:.2f} dB")
    assert p >= 35.0, f"Wan frame PSNR vs reference pipeline = {p:.1f} dB"


# --------------------------------------------------------------------------
# Hunyuan: flow-match Euler loop (reference HunyuanScheduler math) ->
# AutoencoderKLCausal3D decode
# --------------------------------------------------------------------------

HF, HH, HW = 3, 8, 8
HLT = 7
HSTEPS = 6


def _hy_tiny_arch():
    from lightx2v_tpu.models.hunyuan.config import HunyuanArch

    return HunyuanArch(
        hidden_size=64, heads_num=2, double_blocks=2, single_blocks=2,
        mlp_hidden_dim=128, in_channels=16, out_channels=16,
        patch_size=(1, 2, 2), text_states_dim=48, text_states_dim_2=24,
        rope_dim_list=(8, 12, 12), rope_theta=256.0, guidance_embed=True)


def _hy_inputs(seed=11):
    rng = np.random.default_rng(seed)
    text = rng.standard_normal((1, HLT, 48), dtype=np.float32) * 0.5
    mask = np.ones((1, HLT), dtype=np.int64)
    text2 = rng.standard_normal((1, 24), dtype=np.float32) * 0.5
    lat0 = rng.standard_normal((1, 16, HF, HH, HW), dtype=np.float32)
    return text, mask, text2, lat0


def test_hunyuan_frames_match_reference():
    rh.install()
    import torch

    from lightx2v.models.schedulers.hunyuan.scheduler import set_timesteps_sigmas

    arch = _hy_tiny_arch()
    cfg = rh.tiny_hunyuan_cfg("t2v")
    from lightx2v_tpu.models.hunyuan.weights import init_random_hunyuan_state_dict

    sd_np = init_random_hunyuan_state_dict(arch, seed=3, scale=0.05)
    sd = rh.to_torch_sd(sd_np)
    (pre_w, tr_w, post_w), (pre_i, tr_i, post_i) = rh.build_reference_hunyuan(
        cfg, dict(sd), arch)

    text, mask, text2, lat0 = _hy_inputs()
    fc, fs = rh.reference_hunyuan_rope(arch, HF, HH // 2, HW // 2)
    # the reference scheduler's exact timestep/sigma series
    # (hunyuan/scheduler.py:175-179, shift 7.0) + its step_post math
    # (:256-262: fp32 sample + noise_pred * dt)
    timesteps, sigmas = set_timesteps_sigmas(HSTEPS, 7.0, device=torch.device("cpu"))

    class _Sched:
        pass

    sched = _Sched()
    sched.latents = torch.from_numpy(lat0).to(torch.bfloat16)
    sched.freqs_cos = fc.to(torch.bfloat16)
    sched.freqs_sin = fs.to(torch.bfloat16)
    sched.guidance = torch.tensor([6000.0], dtype=torch.bfloat16)
    pre_i.set_scheduler(sched)
    tr_i.set_scheduler(sched)
    post_i.set_scheduler(sched)
    inputs = {
        "text_encoder_output": {
            "text_encoder_1_text_states": torch.from_numpy(text).to(torch.bfloat16),
            "text_encoder_1_attention_mask": torch.from_numpy(mask),
            "text_encoder_2_text_states": torch.from_numpy(text2).to(torch.bfloat16),
        }
    }
    with torch.no_grad():
        for i in range(HSTEPS):
            sched.step_index = i
            sched.timesteps = timesteps
            sched.latents = sched.latents.to(torch.bfloat16)  # BaseScheduler.step_pre
            pre_out = pre_i.infer(pre_w, inputs)
            img, vec = tr_i.infer(tr_w, *pre_out)
            noise_pred = post_i.infer(post_w, img, vec)
            dt = sigmas[i + 1] - sigmas[i]
            sched.latents = sched.latents.to(torch.float32) + noise_pred.to(torch.float32) * dt
    ref_lat = sched.latents.numpy()

    # reference VAE decode (AutoencoderKLCausal3D at latent_channels=16)
    from lightx2v.models.video_encoders.hf.autoencoder_kl_causal_3d.autoencoder_kl_causal_3d import (
        AutoencoderKLCausal3D)

    from lightx2v_tpu.vae.hunyuan_vae import (HunyuanVAEConfig, hunyuan_vae_decode,
                                              init_random_hunyuan_vae_state_dict,
                                              load_hunyuan_vae_params)

    vcfg = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                            latent_channels=16, norm_num_groups=4)
    vsd = init_random_hunyuan_vae_state_dict(vcfg, seed=7, scale=0.3)
    ref_vae = AutoencoderKLCausal3D(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlockCausal3D",) * 4,
        up_block_types=("UpDecoderBlockCausal3D",) * 4,
        block_out_channels=vcfg.block_out_channels,
        layers_per_block=vcfg.layers_per_block,
        latent_channels=vcfg.latent_channels,
        norm_num_groups=vcfg.norm_num_groups,
        sample_size=32, sample_tsize=16,
        spatial_compression_ratio=vcfg.spatial_compression_ratio,
        time_compression_ratio=vcfg.time_compression_ratio)
    ref_vae.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in vsd.items()},
                            strict=True)
    ref_vae.eval()
    with torch.no_grad():
        ref_frames = ref_vae.decode(torch.from_numpy(ref_lat)).sample.numpy()
    ref_frames = ref_frames.transpose(0, 2, 3, 4, 1)  # -> (B,T,H,W,C)

    # ours
    import jax.numpy as jnp

    from lightx2v_tpu.models.hunyuan.model import build_hunyuan_rope, hunyuan_forward
    from lightx2v_tpu.models.hunyuan.weights import load_hunyuan_params
    from lightx2v_tpu.schedulers.euler import FlowMatchEulerScheduler
    from lightx2v_tpu.utils.config import ConfigDict

    params = load_hunyuan_params(sd_np, arch)
    sched_ours = FlowMatchEulerScheduler(ConfigDict(infer_steps=HSTEPS, sample_shift=7.0))
    state = sched_ours.prepare((16, HF, HH, HW), seed=0)
    np.testing.assert_allclose(sched_ours.sigmas, sigmas.numpy(), atol=1e-6)
    state["latents"] = jnp.asarray(lat0[0])  # shared initial noise
    cos, sin = build_hunyuan_rope(arch, HF, HH // 2, HW // 2)
    for i in range(HSTEPS):
        lat_b = state["latents"].astype(jnp.bfloat16)
        pred = hunyuan_forward(
            params, lat_b[None], jnp.asarray([float(timesteps[i])]),
            jnp.asarray(text), jnp.asarray(mask), jnp.asarray(text2),
            jnp.asarray(cos), jnp.asarray(sin), arch,
            guidance=jnp.asarray([6000.0]), attn_type="xla")
        state = sched_ours.step_post(state, pred[0])
    z = jnp.transpose(state["latents"].astype(jnp.float32), (1, 2, 3, 0))[None]
    got_frames = np.asarray(hunyuan_vae_decode(load_hunyuan_vae_params(vsd, vcfg),
                                               z, vcfg, scale=False), np.float32)

    assert got_frames.shape == ref_frames.shape
    p = psnr_db(ref_frames, got_frames)
    print(f"hunyuan frame PSNR {p:.2f} dB")
    assert p >= 35.0, f"Hunyuan frame PSNR vs reference pipeline = {p:.1f} dB"


# --------------------------------------------------------------------------
# CogVideoX: XDPM (stochastic, shared torch noise stream) -> Cog VAE decode
# --------------------------------------------------------------------------

CFL, CHL, CWL = 2, 8, 8
CTEXT = 5
CSTEPS = 6


def _cog_tiny_arch():
    from lightx2v_tpu.models.cogvideox.model import CogArch

    return CogArch(num_layers=2, num_heads=2, head_dim=32, text_len=CTEXT,
                   text_dim=24, in_channels=16, out_channels=16,
                   patch_size=2, patch_size_t=2, time_embed_dim=32)


def test_cog_frames_match_reference():
    rh.install()
    import torch

    from lightx2v.models.networks.cogvideox.infer.post_infer import CogvideoxPostInfer
    from lightx2v.models.networks.cogvideox.infer.pre_infer import CogvideoxPreInfer
    from lightx2v.models.networks.cogvideox.infer.transformer_infer import (
        CogvideoxTransformerInfer)
    from lightx2v.models.networks.cogvideox.weights.post_weights import CogvideoxPostWeights
    from lightx2v.models.networks.cogvideox.weights.pre_weights import CogvideoxPreWeights
    from lightx2v.models.networks.cogvideox.weights.transformers_weights import (
        CogvideoxTransformerWeights)
    from lightx2v.models.schedulers.cogvideox.scheduler import CogvideoxXDPMScheduler

    from lightx2v_tpu.models.cogvideox.model import init_random_cog_state_dict

    a = _cog_tiny_arch()
    cfg = rh.Cfg(
        transformer_num_layers=a.num_layers,
        transformer_num_attention_heads=a.num_heads,
        transformer_attention_head_dim=a.head_dim,
        patch_size=a.patch_size, patch_size_t=a.patch_size_t,
        text_len=a.text_len,
        use_rotary_positional_embeddings=True,
        transformer_use_learned_positional_embeddings=False,
        transformer_temporal_compression_ratio=4,
        transformer_spatial_interpolation_scale=1.875,
        transformer_temporal_interpolation_scale=1.0,
        transformer_sample_height=300, transformer_sample_width=300,
        transformer_sample_frames=81,
        num_inference_steps=CSTEPS, num_train_timesteps=1000, seed=7,
        timestep_spacing="trailing", beta_schedule="scaled_linear",
        scheduler_beta_start=0.00085, scheduler_beta_end=0.012,
        scheduler_snr_shift_scale=1.0, scheduler_rescale_betas_zero_snr=True,
        scheduler_set_alpha_to_one=True, scheduler_prediction_type="v_prediction",
        steps_offset=0, target_shape=(1, CFL, 16, CHL, CWL), guidance_scale=6.0,
        height=CHL * 8, width=CWL * 8,
        vae_scale_factor_spatial=8,
        transformer_sample_height_runtime=CHL, transformer_sample_width_runtime=CWL,
    )
    sd_np = init_random_cog_state_dict(a, seed=4, scale=0.05)
    sd = rh.to_torch_sd(sd_np)
    pre_w = CogvideoxPreWeights(cfg)
    tr_w = CogvideoxTransformerWeights({"num_layers": a.num_layers})
    post_w = CogvideoxPostWeights(cfg)
    for wmod in (pre_w, tr_w, post_w):
        wmod.load_weights(dict(sd))
    pre_i, tr_i, post_i = (CogvideoxPreInfer(cfg), CogvideoxTransformerInfer(cfg),
                           CogvideoxPostInfer(cfg))

    from diffusers.models.embeddings import get_3d_rotary_pos_embed  # _diffusers_stub

    fc, fs = get_3d_rotary_pos_embed(
        embed_dim=a.head_dim, crops_coords=None,
        grid_size=(CHL // a.patch_size, CWL // a.patch_size),
        temporal_size=(CFL + a.patch_size_t - 1) // a.patch_size_t,
        grid_type="slice", max_size=(CHL // a.patch_size, CWL // a.patch_size))

    sched_ref = CogvideoxXDPMScheduler(cfg)
    sched_ref.prepare(image_encoder_output=None)
    sched_ref.image_rotary_emb = (fc, fs)
    tr_i.set_scheduler(sched_ref)
    lat0 = sched_ref.latents.float().numpy().copy()

    rng = np.random.default_rng(17)
    ctx = rng.standard_normal((CTEXT, 24), dtype=np.float32) * 0.5
    ratio = cfg["num_train_timesteps"] // CSTEPS
    gen_probe = torch.Generator()
    noises = []
    with torch.no_grad():
        for i in range(CSTEPS):
            sched_ref.step_index = i
            lat = sched_ref.latents.to(torch.bfloat16)  # BaseScheduler.step_pre cast
            t = sched_ref.timesteps[i].reshape(1).float()
            # reference forward operates on (F, C, H, W)
            hs, ehs, emb, shapes = pre_i.infer(pre_w, lat[0], t,
                                               torch.from_numpy(ctx).to(torch.bfloat16))
            hs, ehs = tr_i.infer(tr_w, hs, ehs, emb)
            noise_pred = post_i.infer(post_w, hs, ehs, emb, shapes)
            sched_ref.noise_pred = noise_pred[None]
            pre_state = sched_ref.generator.get_state()
            sched_ref.step_post()
            # replay the generator stream to capture the draw the reference
            # consumed (scheduler.py:259-270: second draw on the 2nd-order branch)
            gen_probe.set_state(pre_state)
            n1 = torch.randn(tuple(cfg["target_shape"]), generator=gen_probe,
                             dtype=torch.bfloat16)
            if i > 0 and (int(sched_ref.timesteps[i]) - ratio) >= 0:
                n1 = torch.randn(tuple(cfg["target_shape"]), generator=gen_probe,
                                 dtype=torch.bfloat16)
            noises.append(n1.float().numpy())
    ref_lat = sched_ref.latents.float().numpy()  # (1, F, C, H, W)

    from lightx2v.models.video_encoders.hf.cogvideox.autoencoder_ks_cogvidex import (
        AutoencoderKLCogVideoX)

    from lightx2v_tpu.vae.cogvideox_vae import (CogVAEConfig, cog_vae_decode,
                                                init_random_cog_vae_state_dict,
                                                load_cog_vae_params)

    vcfg = CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        latent_channels=16, norm_num_groups=4)
    vsd = init_random_cog_vae_state_dict(vcfg, seed=8, scale=0.3)
    ref_vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3,
        block_out_channels=vcfg.block_out_channels,
        latent_channels=vcfg.latent_channels,
        layers_per_block=vcfg.layers_per_block,
        norm_num_groups=vcfg.norm_num_groups,
        temporal_compression_ratio=2 ** vcfg.temporal_compress_level,
        sample_height=32, sample_width=32,
        use_quant_conv=False, use_post_quant_conv=False)
    ref_vae.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in vsd.items()},
                            strict=True)
    ref_vae.eval()
    with torch.no_grad():
        ref_frames = ref_vae.decode(
            torch.from_numpy(ref_lat.transpose(0, 2, 1, 3, 4))).sample.numpy()
    ref_frames = ref_frames.transpose(0, 2, 3, 4, 1)

    # ours
    import jax.numpy as jnp

    from lightx2v_tpu.models.cogvideox.model import build_cog_rope, cog_forward, load_cog_params
    from lightx2v_tpu.schedulers.cogvideox import CogvideoxXDPMScheduler as OurXDPM

    params = load_cog_params(sd_np, a)
    cos, sin = build_cog_rope(a, (CFL + 1) // 2, CHL // 2, CWL // 2)
    ours = OurXDPM(rh.Cfg(dict(cfg)))
    np.testing.assert_array_equal(ours._ts_int, sched_ref.timesteps.cpu().numpy())
    state = ours.prepare((1, CFL, 16, CHL, CWL), seed=7)
    state["latents"] = jnp.asarray(lat0)
    for i in range(CSTEPS):
        lat_b = state["latents"].astype(jnp.bfloat16)
        # ours operates on (B, C, F, H, W)
        pred = cog_forward(params, jnp.transpose(lat_b, (0, 2, 1, 3, 4)),
                           jnp.asarray([float(sched_ref.timesteps[i])]),
                           jnp.asarray(ctx)[None], jnp.asarray(cos), jnp.asarray(sin),
                           a, attn_type="xla")
        pred = jnp.transpose(pred, (0, 2, 1, 3, 4))  # back to (B, F, C, H, W)
        state = ours.step_post(state, pred, noise=jnp.asarray(noises[i]))
    z = jnp.transpose(state["latents"].astype(jnp.float32), (0, 1, 3, 4, 2))  # (B,F,H,W,C)
    got_frames = np.asarray(cog_vae_decode(load_cog_vae_params(vsd, vcfg), z, vcfg,
                                           scale=False), np.float32)

    assert got_frames.shape == ref_frames.shape
    p = psnr_db(ref_frames, got_frames)
    print(f"cog frame PSNR {p:.2f} dB")
    assert p >= 35.0, f"Cog frame PSNR vs reference pipeline = {p:.1f} dB"
