"""Diffusion-forcing matrix math + CausVid / SkyReels e2e smoke tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.infer import build_parser, init_runner
from lightx2v_tpu.schedulers.df import generate_timestep_matrix
from lightx2v_tpu.utils.config import set_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")


class TestTimestepMatrix:
    def test_sync_mode_full_denoise(self):
        """ar_step=0: every row advances all frames together."""
        tmpl = np.array([900, 600, 300], np.int64)
        sm, um, vi = generate_timestep_matrix(4, 4, tmpl, ar_step=0)
        assert sm.shape == (3, 4)
        # row i = tmpl[i] for every frame
        np.testing.assert_array_equal(sm[0], [900] * 4)
        np.testing.assert_array_equal(sm[2], [300] * 4)
        assert um.all()
        assert vi == [(0, 4)] * 3

    def test_prefix_frames_skipped(self):
        tmpl = np.array([900, 600, 300], np.int64)
        sm, um, vi = generate_timestep_matrix(4, 4, tmpl, num_pre_ready=2)
        # prefix frames never update
        assert not um[:, :2].any()
        assert um[:, 2:].all()

    def test_ar_mode_staggered(self):
        tmpl = np.arange(999, 0, -100, dtype=np.int64)  # 10 steps
        sm, um, vi = generate_timestep_matrix(6, 6, tmpl, ar_step=2)
        # later frames start denoising later
        first_active = [np.argmax(um[:, i]) for i in range(6)]
        assert first_active == sorted(first_active)
        assert first_active[1] > first_active[0]
        # every frame eventually completes all steps
        assert (um.sum(0) == len(tmpl)).all()

    def test_causal_block_size(self):
        tmpl = np.array([900, 600], np.int64)
        sm, um, vi = generate_timestep_matrix(4, 4, tmpl, casual_block_size=2)
        assert sm.shape[1] == 4
        np.testing.assert_array_equal(sm[:, 0], sm[:, 1])


def _run(model_cls, extra_cfg=None):
    args = build_parser().parse_args([
        "--model_cls", model_cls, "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a spinning top",
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    if extra_cfg:
        config.update(extra_cfg)
    runner = init_runner(config)
    return runner.run_pipeline(save_video=False)


def test_causvid_pipeline():
    frames = _run("wan2.1_causvid", {
        "num_frames": 3, "num_frame_per_block": 1, "num_blocks": 3,
        "num_fragments": 2,
        "denoising_step_list": [999, 500, 100],
    })
    # 3 + 1*(3-1) = 5 latent frames -> (5-1)*4+1 = 17 video frames
    assert frames.shape == (17, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_skyreels_df_pipeline_single_segment():
    frames = _run("wan2.1_skyreels_v2_df", {
        "infer_steps": 3, "ar_step": 0, "addnoise_condition": 0,
        "base_num_frames": 9, "overlap_history": 0,
    })
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_skyreels_df_pipeline_two_segments():
    frames = _run("wan2.1_skyreels_v2_df", {
        "infer_steps": 2, "ar_step": 0, "addnoise_condition": 20,
        "target_video_length": 13, "base_num_frames": 9, "overlap_history": 5,
    })
    # total latent frames 4: segment1 = 3 latent (9 px frames), overlap 2
    assert frames.shape[0] >= 9
    assert np.isfinite(frames).all()


def test_audio_pipeline(tmp_path):
    import wave

    # tiny 1-second wav
    wav_path = str(tmp_path / "a.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        t = np.linspace(0, 1, 16000)
        w.writeframes((np.sin(2 * np.pi * 220 * t) * 20000).astype(np.int16).tobytes())

    args = build_parser().parse_args([
        "--model_cls", "wan2.1_audio", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a person talking",
        "--audio_path", wav_path,
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    runner = init_runner(config)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_audio_encoder_envelope_and_interp(tmp_path):
    """encoders/audio.py: wav reading, envelope fallback shape, and 50Hz->
    frame-grid time resampling."""
    import wave

    from lightx2v_tpu.encoders.audio import AudioEncoder, _interp_time, read_wav, resample_linear

    wav_path = str(tmp_path / "b.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(2)  # stereo -> mono mixdown path
        w.setsampwidth(2)
        w.setframerate(22050)
        t = np.linspace(0, 0.5, 11025)
        s = (np.sin(2 * np.pi * 440 * t) * 15000).astype(np.int16)
        w.writeframes(np.stack([s, s], -1).tobytes())

    waveform, sr = read_wav(wav_path)
    assert sr == 22050 and waveform.ndim == 1
    res = resample_linear(waveform, sr, 16000)
    assert abs(len(res) - 8000) <= 1

    enc = AudioEncoder(None)  # no checkpoint -> envelope fallback
    feats = enc.infer(wav_path, num_frames=9, fps=16.0)
    assert feats.shape == (1, 9, 1024)
    assert np.isfinite(feats).all() and feats.max() > 0

    # time interpolation: constant rows stay constant, endpoints preserved
    seq = np.stack([np.full(4, i, np.float32) for i in range(5)])  # (5, 4)
    out = _interp_time(seq, 9)
    assert out.shape == (9, 4)
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[-1], 4.0)
    np.testing.assert_allclose(out[4], 2.0)


def test_audio_adapter_checkpoint_loader(tmp_path):
    """load_audio_adapter maps reference key names (audio_adapter.py:216-260)
    into the pytree; the adapter forward runs with a real time embedding
    and audio_pe."""
    import jax
    import jax.numpy as jnp

    from lightx2v_tpu.models.wan.audio_adapter import (
        audio_projection, audio_time_embedding, load_audio_adapter, perceiver_ca,
    )

    rng = np.random.default_rng(0)
    dim, kv_dim, feat, ntok, n_ca = 64, 16, 40, 4, 2
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    sd = {}
    mlp_dims = [(feat * 5, 32), (32, 32), (32, ntok * kv_dim)]
    for idx, (i, o) in zip((0, 2, 4), mlp_dims):
        sd[f"audio_proj.mlp.{idx}.weight"] = r(o, i)
        sd[f"audio_proj.mlp.{idx}.bias"] = r(o)
    sd["audio_proj.norm.weight"] = np.ones(kv_dim, np.float32)
    sd["audio_proj.norm.bias"] = np.zeros(kv_dim, np.float32)
    sd["audio_pe"] = r(4 * ntok, kv_dim)
    for i in range(n_ca):
        sd[f"ca.{i}.norm_kv.weight"] = np.ones(kv_dim, np.float32)
        sd[f"ca.{i}.norm_kv.bias"] = np.zeros(kv_dim, np.float32)
        sd[f"ca.{i}.to_q.weight"] = r(dim, dim)
        sd[f"ca.{i}.to_q.bias"] = r(dim)
        sd[f"ca.{i}.to_kv.weight"] = r(2 * dim, kv_dim)
        sd[f"ca.{i}.to_kv.bias"] = r(2 * dim)
        sd[f"ca.{i}.to_out.weight"] = r(dim, dim)
        sd[f"ca.{i}.to_out.bias"] = r(dim)
        sd[f"ca.{i}.shift_scale_gate"] = r(1, 3, dim)
    freq = 32
    sd["time_embedding.time_embedder.linear_1.weight"] = r(dim, freq)
    sd["time_embedding.time_embedder.linear_1.bias"] = r(dim)
    sd["time_embedding.time_embedder.linear_2.weight"] = r(dim, dim)
    sd["time_embedding.time_embedder.linear_2.bias"] = r(dim)
    sd["time_embedding.time_proj.weight"] = r(3 * dim, dim)
    sd["time_embedding.time_proj.bias"] = r(3 * dim)

    p = load_audio_adapter(sd, interval=1, heads=4)
    assert p["num_tokens"] == ntok
    assert p["ca_blocks"]["to_q"]["w"].shape == (n_ca, dim, dim)
    assert "audio_pe" in p["proj"] and "time_embedding" in p

    t_emb = audio_time_embedding(p["time_embedding"], jnp.asarray([500.0]), freq_dim=freq)
    assert t_emb.shape == (1, 3, dim)

    feats = jnp.asarray(rng.standard_normal((1, 9, feat)), jnp.float32)
    tokens = audio_projection(p["proj"], feats, latent_frames=3, num_tokens=ntok)
    assert tokens.shape == (1, 3, 4 * ntok, kv_dim)

    ca0 = jax.tree_util.tree_map(lambda a: a[0], p["ca_blocks"])
    lat = jnp.asarray(rng.standard_normal((1, 3, 8, dim)), jnp.bfloat16)
    delta = perceiver_ca(ca0, tokens, lat, t_emb, heads=4)
    assert delta.shape == (1, 3, 8, dim)
    assert np.isfinite(np.asarray(delta, np.float32)).all()


def test_audio_runner_with_checkpoint_adapter(tmp_path):
    """Full pipeline with a non-synthetic adapter loaded from a .pth file
    (synthetic DiT weights, real loader path via audio_adapter_path)."""
    import wave

    import torch

    wav_path = str(tmp_path / "c.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        t = np.linspace(0, 1, 16000)
        w.writeframes((np.sin(2 * np.pi * 330 * t) * 18000).astype(np.int16).tobytes())

    # build a reference-keyed checkpoint sized for the synthetic arch
    # (dim=384, heads=6, feat 1024, kv_dim 768 like the real adapter)
    rng = np.random.default_rng(1)
    dim, kv_dim, feat, ntok = 384, 768, 1024, 4
    r = lambda *s: torch.from_numpy((rng.standard_normal(s) * 0.02).astype(np.float32))
    sd = {}
    for idx, (i, o) in zip((0, 2, 4), [(feat * 5, 1024), (1024, 1024), (1024, ntok * kv_dim)]):
        sd[f"audio_proj.mlp.{idx}.weight"] = r(o, i)
        sd[f"audio_proj.mlp.{idx}.bias"] = r(o)
    sd["audio_proj.norm.weight"] = torch.ones(kv_dim)
    sd["audio_proj.norm.bias"] = torch.zeros(kv_dim)
    sd["audio_pe"] = r(4 * ntok, kv_dim)
    for i in range(30):  # synthetic arch has <=30 layers; extra blocks unused
        sd[f"ca.{i}.norm_kv.weight"] = torch.ones(kv_dim)
        sd[f"ca.{i}.norm_kv.bias"] = torch.zeros(kv_dim)
        sd[f"ca.{i}.to_q.weight"] = r(dim, dim)
        sd[f"ca.{i}.to_q.bias"] = r(dim)
        sd[f"ca.{i}.to_kv.weight"] = r(2 * dim, kv_dim)
        sd[f"ca.{i}.to_kv.bias"] = r(2 * dim)
        sd[f"ca.{i}.to_out.weight"] = r(dim, dim)
        sd[f"ca.{i}.to_out.bias"] = r(dim)
        sd[f"ca.{i}.shift_scale_gate"] = r(1, 3, dim)
    sd["time_embedding.time_embedder.linear_1.weight"] = r(dim, 256)
    sd["time_embedding.time_embedder.linear_1.bias"] = r(dim)
    sd["time_embedding.time_embedder.linear_2.weight"] = r(dim, dim)
    sd["time_embedding.time_embedder.linear_2.bias"] = r(dim)
    sd["time_embedding.time_proj.weight"] = r(3 * dim, dim)
    sd["time_embedding.time_proj.bias"] = r(3 * dim)
    ckpt = str(tmp_path / "audio_adapter.pth")
    torch.save(sd, ckpt)

    args = build_parser().parse_args([
        "--model_cls", "wan2.1_audio", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a person talking",
        "--audio_path", wav_path,
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    runner = init_runner(config)
    # swap in the checkpoint-loaded adapter (synthetic DiT weights stay)
    from lightx2v_tpu.models.wan.audio_adapter import load_audio_adapter

    loaded = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    runner.audio_adapter = load_audio_adapter(loaded, interval=1, heads=6)
    frames = runner.run_pipeline(save_video=False)
    assert frames.shape == (9, 64, 96, 3)
    assert np.isfinite(frames).all()


def test_audio_multisegment_pipeline(tmp_path):
    """Long-form audio generation: video_duration > one segment splits into
    5-frame-overlap windows with prev-latent conditioning (in_dim = 2z+4)
    and stitches video + audio (reference wan_audio_runner.py:440-583)."""
    import wave

    wav_path = str(tmp_path / "long.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        t = np.linspace(0, 2, 32000)
        w.writeframes((np.sin(2 * np.pi * 220 * t) * 18000).astype(np.int16).tobytes())

    args = build_parser().parse_args([
        "--model_cls", "wan2.1_audio", "--task", "t2v",
        "--config_json", CFG,
        "--prompt", "a person talking for a while",
        "--audio_path", wav_path,
        "--synthetic_weights",
    ])
    config = set_config(args)
    config["enable_cfg"] = False
    config["in_dim"] = 36  # 16 latent + 16 prev-latent + 4 mask channels
    config["video_duration"] = 1.0  # 16 frames at 16 fps > 9/segment
    config["save_video_path"] = str(tmp_path / "long.mp4")
    runner = init_runner(config)
    frames = runner.run_pipeline()
    # 3 segments: 9 + 4 + min tail; stitched length >= expected-ish
    assert frames.shape[1:] == (64, 96, 3)
    assert frames.shape[0] >= 13
    assert np.isfinite(frames).all()
    assert (tmp_path / "long.mp4").is_file()
    # a/v muxed into one MP4 container (utils/media.mux_mp4_pcm): ISO BMFF
    # with a sowt PCM16 audio track carrying > 0.5 s of audio
    import struct

    raw = (tmp_path / "long.av.mp4").read_bytes()
    assert raw[4:8] == b"ftyp" and b"moov" in raw and b"sowt" in raw
    # the audio stsz full box (constant sample size 2) records n_samples
    i = raw.index(b"sowt")
    j = raw.index(b"stsz", i)
    _ver_flags, sz, n_samples = struct.unpack(">III", raw[j + 4:j + 16])
    assert sz == 2 and n_samples > 8000
