"""CogVideoX DiT + XDPM scheduler equivalence against the REFERENCE.

Runs the reference's own CogvideoxPreInfer / CogvideoxTransformerInfer /
CogvideoxPostInfer (lightx2v/models/networks/cogvideox/infer/*) on CPU at
a tiny config (the reference is fully config-driven here — no size
patching needed) with the SAME synthetic state dict our loader consumes.

The reference's rope comes from ``diffusers.get_3d_rotary_pos_embed``
(not installed here) via the faithful public-API stand-in in
``_diffusers_stub``; the transformer applies it with the reference's own
``apply_rotary_emb`` (transformer_infer.py:5-45), so the interleave/split
convention is still exercised end-to-end by reference code.

Also pins the XDPM scheduler trajectory (reference
schedulers/cogvideox/scheduler.py:180-270) including its
generator-driven stochastic noise, via a shared torch noise stream.
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


FL, HL, WL = 2, 8, 8     # latent frames (p_t multiple), height, width
TEXT_LEN = 5


def tiny_arch():
    from lightx2v_tpu.models.cogvideox.model import CogArch

    return CogArch(num_layers=2, num_heads=2, head_dim=32, text_len=TEXT_LEN,
                   text_dim=24, in_channels=16, out_channels=16,
                   patch_size=2, patch_size_t=2, time_embed_dim=32)


def ref_cfg():
    a = tiny_arch()
    return rh.Cfg(
        transformer_num_layers=a.num_layers,
        transformer_num_attention_heads=a.num_heads,
        transformer_attention_head_dim=a.head_dim,
        patch_size=a.patch_size,
        patch_size_t=a.patch_size_t,
        text_len=a.text_len,
        use_rotary_positional_embeddings=True,
        transformer_use_learned_positional_embeddings=False,
        transformer_temporal_compression_ratio=4,
        transformer_spatial_interpolation_scale=1.875,
        transformer_temporal_interpolation_scale=1.0,
        transformer_sample_height=300, transformer_sample_width=300,
        transformer_sample_frames=81,
    )


@pytest.fixture(scope="module")
def tiny_sd():
    from lightx2v_tpu.models.cogvideox.model import init_random_cog_state_dict

    return init_random_cog_state_dict(tiny_arch(), seed=4, scale=0.05)


def _inputs(seed=17):
    rng = np.random.default_rng(seed)
    lat = rng.standard_normal((FL, 16, HL, WL), dtype=np.float32)  # (F, C, H, W) ref layout
    ctx = rng.standard_normal((TEXT_LEN, 24), dtype=np.float32) * 0.5
    return lat, ctx


def _ref_rope():
    """What the reference scheduler computes for CogVideoX 1.5
    (scheduler.py:170-186: grid_type="slice", base frames = ceil(F/p_t))."""
    rh.install()
    from diffusers.models.embeddings import get_3d_rotary_pos_embed

    a = tiny_arch()
    return get_3d_rotary_pos_embed(
        embed_dim=a.head_dim, crops_coords=None,
        grid_size=(HL // a.patch_size, WL // a.patch_size),
        temporal_size=(FL + a.patch_size_t - 1) // a.patch_size_t,
        grid_type="slice",
        max_size=(HL // a.patch_size, WL // a.patch_size))


def test_rope_matches_reference():
    from lightx2v_tpu.models.cogvideox.model import build_cog_rope

    a = tiny_arch()
    fc, fs = _ref_rope()
    cos, sin = build_cog_rope(a, (FL + 1) // 2, HL // 2, WL // 2)
    np.testing.assert_allclose(np.repeat(cos, 2, axis=1), fc.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.repeat(sin, 2, axis=1), fs.numpy(), atol=1e-5)


def test_forward_matches_reference(tiny_sd):
    rh.install()
    import torch

    from lightx2v.models.networks.cogvideox.infer.post_infer import CogvideoxPostInfer
    from lightx2v.models.networks.cogvideox.infer.pre_infer import CogvideoxPreInfer
    from lightx2v.models.networks.cogvideox.infer.transformer_infer import CogvideoxTransformerInfer
    from lightx2v.models.networks.cogvideox.weights.post_weights import CogvideoxPostWeights
    from lightx2v.models.networks.cogvideox.weights.pre_weights import CogvideoxPreWeights
    from lightx2v.models.networks.cogvideox.weights.transformers_weights import CogvideoxTransformerWeights

    a = tiny_arch()
    cfg = ref_cfg()
    sd = rh.RecordingDict(rh.to_torch_sd(tiny_sd))
    pre_w = CogvideoxPreWeights(cfg)
    tr_w = CogvideoxTransformerWeights({"num_layers": a.num_layers})
    post_w = CogvideoxPostWeights(cfg)
    pre_w.load_weights(sd)
    tr_w.load_weights(sd)
    post_w.load_weights(sd)

    pre_i = CogvideoxPreInfer(cfg)
    tr_i = CogvideoxTransformerInfer(cfg)
    post_i = CogvideoxPostInfer(cfg)

    fc, fs = _ref_rope()

    class _Sched:
        pass

    sched = _Sched()
    sched.image_rotary_emb = (fc, fs)
    tr_i.set_scheduler(sched)

    lat, ctx = _inputs()
    t = torch.tensor([500.0])
    with torch.no_grad():
        hs, ehs, emb, shapes = pre_i.infer(
            pre_w, torch.from_numpy(lat).to(torch.bfloat16), t,
            torch.from_numpy(ctx).to(torch.bfloat16))
        hs, ehs = tr_i.infer(tr_w, hs, ehs, emb)
        ref = post_i.infer(post_w, hs, ehs, emb, shapes).float().numpy()

    # two-sided key coverage while we're here
    assert sd.requested == set(tiny_sd.keys()), (
        f"missing: {sorted(sd.requested - set(tiny_sd))[:5]}; "
        f"extra: {sorted(set(tiny_sd) - sd.requested)[:5]}")

    # ours
    import jax.numpy as jnp

    from lightx2v_tpu.models.cogvideox.model import build_cog_rope, cog_forward, load_cog_params

    params = load_cog_params(tiny_sd, a)
    cos, sin = build_cog_rope(a, (FL + 1) // 2, HL // 2, WL // 2)
    out = cog_forward(
        params, jnp.asarray(lat.transpose(1, 0, 2, 3))[None].astype(jnp.bfloat16),
        jnp.asarray([500.0]), jnp.asarray(ctx)[None],
        jnp.asarray(cos), jnp.asarray(sin), a, attn_type="xla")
    got = np.asarray(out[0], np.float32).transpose(1, 0, 2, 3)  # -> (F, C, H, W)
    assert got.shape == ref.shape
    s = snr_db(ref, got)
    assert s > 30.0, f"cog forward SNR vs reference = {s:.1f} dB"


def test_xdpm_trajectory_matches_reference(tiny_sd):
    """Scheduler math incl. the stochastic DPM noise terms: identical
    synthetic v-predictions + identical torch noise stream through both
    implementations."""
    rh.install()
    import torch

    from lightx2v.models.schedulers.cogvideox.scheduler import CogvideoxXDPMScheduler

    shape = (1, FL, 16, HL, WL)
    n = 6
    cfg = rh.Cfg(
        num_inference_steps=n, num_train_timesteps=1000, seed=7,
        timestep_spacing="trailing", beta_schedule="scaled_linear",
        scheduler_beta_start=0.00085, scheduler_beta_end=0.012,
        scheduler_snr_shift_scale=1.0, scheduler_rescale_betas_zero_snr=True,
        scheduler_set_alpha_to_one=True, scheduler_prediction_type="v_prediction",
        steps_offset=0, target_shape=shape, guidance_scale=6.0,
        height=HL * 8, width=WL * 8,
        vae_scale_factor_spatial=8, patch_size=2, patch_size_t=2,
        transformer_sample_height=HL, transformer_sample_width=WL,
        transformer_attention_head_dim=32,
        use_rotary_positional_embeddings=True,
    )
    sched_ref = CogvideoxXDPMScheduler(cfg)
    sched_ref.prepare(image_encoder_output=None)
    lat0 = sched_ref.latents.float().numpy().copy()
    rng = np.random.default_rng(3)
    preds = [rng.standard_normal(shape).astype(np.float32) for _ in range(n)]
    # capture the exact generator-driven noise the reference consumes by
    # replaying its stream (same generator state advance order)
    noises = []
    gen_probe = torch.Generator()
    ratio = cfg["num_train_timesteps"] // n
    for i in range(n):
        sched_ref.step_index = i
        sched_ref.noise_pred = torch.from_numpy(preds[i]).to(torch.bfloat16)
        pre_state = sched_ref.generator.get_state()
        sched_ref.step_post()
        # the reference draws once on the first-order branch, twice on the
        # second-order branch and uses the SECOND draw there
        # (scheduler.py:259-270); replay its stream and pick the used one
        gen_probe.set_state(pre_state)
        lat_dtype = torch.bfloat16
        n1 = torch.randn(shape, generator=gen_probe, dtype=lat_dtype)
        use_second = i > 0 and (int(sched_ref.timesteps[i]) - ratio) >= 0
        if use_second:
            n1 = torch.randn(shape, generator=gen_probe, dtype=lat_dtype)
        noises.append(n1.float().numpy())
    ref_final = sched_ref.latents.float().numpy()

    import jax.numpy as jnp

    from lightx2v_tpu.schedulers.cogvideox import CogvideoxXDPMScheduler as OurXDPM

    ours = OurXDPM(rh.Cfg(dict(cfg)))
    np.testing.assert_array_equal(ours._ts_int, sched_ref.timesteps.cpu().numpy())
    state = ours.prepare(shape, seed=7)
    state["latents"] = jnp.asarray(lat0)
    for i in range(n):
        state = ours.step_post(state, jnp.asarray(preds[i]), noise=jnp.asarray(noises[i]))
    got = np.asarray(state["latents"], np.float32)
    s = snr_db(ref_final, got)
    assert s > 25.0, f"XDPM trajectory SNR vs reference = {s:.1f} dB"
