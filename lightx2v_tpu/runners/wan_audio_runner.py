"""Audio-driven video runner (reference: lightx2v/models/runners/wan/
wan_audio_runner.py:299-594).

Audio features (wav2vec-class) are projected to per-latent-frame token
groups and injected into the Wan DiT by per-block Perceiver cross
attention (audio_adapter.py); denoising uses the fixed-timestep
flow-match Euler scheduler (reference wan/audio/scheduler.py). The
conditioning image path follows the i2v recipe.

Audio features come from encoders/audio.py (HF wav2vec-class model when
``audio_encoder_path``/``model_path`` is configured, waveform-envelope
fallback otherwise). Multi-segment generation with previous-latent
conditioning is implemented below (see run_dit's segment loop); the audio
track is muxed with the video into a single MP4 container (MJPEG + sowt
PCM16, utils/media.mux_mp4_pcm — the no-ffmpeg analog of the reference's
ffmpeg mp4 mux; RIFF-AVI fallback via ``mux_container: "avi"``).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.audio_adapter import audio_projection, init_random_audio_adapter, perceiver_ca
from ..models.wan.model import wan_pre_process, wan_post_process, wan_block
from ..models.wan.pipeline import rope_for_shape
from ..ops.attention import attention
from ..ops.linear import resolve_mm
from ..schedulers.euler import FlowMatchEulerScheduler
from ..utils.logging_utils import logger
from ..utils.registry import RUNNER_REGISTER
from .wan_runner import WanRunner


def load_wav_envelope(path: str, num_frames: int, feat_dim: int = 1024, fps: float = 16.0) -> np.ndarray:
    """Frame-aligned stand-in features (moved to encoders/audio.py)."""
    from ..encoders.audio import envelope_features, read_wav

    waveform, sr = read_wav(path)
    return envelope_features(waveform, sr, num_frames, fps=fps, feat_dim=feat_dim)


@RUNNER_REGISTER.register("wan2.1_audio")
class WanAudioRunner(WanRunner):
    scheduler_cls = FlowMatchEulerScheduler

    def init_scheduler(self):
        self.config.setdefault("sample_shift", 5.0)
        return self.scheduler_cls(self.config)

    def load_transformer(self):
        params = super().load_transformer()
        kv_dim = 768
        if self.config.get("synthetic_weights"):
            self.audio_adapter = init_random_audio_adapter(
                dim=self.arch.dim, kv_dim=kv_dim, num_layers=self.arch.num_layers,
                interval=int(self.config.get("audio_adapter_interval", 1)),
                heads=self.arch.num_heads, seed=7)
        else:
            from ..models.wan.audio_adapter import load_audio_adapter

            path = self.config.get("audio_adapter_path") or os.path.join(
                self.config["model_path"], "audio_adapter.safetensors")
            if path.endswith((".pt", ".pth", ".tar")):
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
            else:
                from ..utils.safetensors_io import load_safetensors

                sd = load_safetensors(path)
            self.audio_adapter = load_audio_adapter(
                sd, interval=int(self.config.get("audio_adapter_interval", 1)),
                heads=self.arch.num_heads)
        return params

    def run_input_encoder(self) -> Dict[str, Any]:
        out = super().run_input_encoder()
        frames = int(self.config.get("target_video_length", 81))
        audio_path = self.config.get("audio_path")
        if audio_path and os.path.exists(audio_path):
            from ..encoders.audio import AudioEncoder

            enc_path = None
            if not self.config.get("synthetic_weights"):
                enc_path = self.config.get("audio_encoder_path") or self.config.get("model_path")
            if not hasattr(self, "_audio_encoder"):
                self._audio_encoder = AudioEncoder(enc_path)
            feats = self._audio_encoder.infer(
                audio_path, frames, fps=float(self.config.get("fps", 16.0)))
        else:
            rng = np.random.default_rng(5)
            feats = rng.standard_normal((1, frames, 1024)).astype(np.float32) * 0.1
        out["audio_encoder_output"] = jnp.asarray(feats)
        return out

    def run_dit(self, encoder_out: Dict[str, Any]):
        cfg = self.config
        arch = self.arch
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        state = scheduler.prepare(target_shape, int(cfg.get("seed", 42)))
        # previous-segment conditioning (reference wan_audio_runner.py:529-541):
        # y = [4ch pixel-frame mask | prev latents], concatenated on channels
        prev = encoder_out.get("previmg_encoder_output")
        y_cond = None if prev is None else jnp.concatenate(
            [prev["prev_mask"], prev["prev_latents"]], axis=0)
        z_dim, lat_f, lat_h, lat_w = target_shape
        if y_cond is None and arch.in_dim == 2 * z_dim + 4:
            # conditioning-capable model without a previous segment: zero
            # mask + zero latents (the reference's idx==0 branch)
            y_cond = jnp.zeros((z_dim + 4, lat_f, lat_h, lat_w), jnp.float32)
        rope_cos, rope_sin, seq_len = rope_for_shape(arch, target_shape)
        _, lat_f, lat_h, lat_w = target_shape
        pt, ph, pw = arch.patch_size
        tokens_per_frame = (lat_h // ph) * (lat_w // pw)
        gf = lat_f // pt

        adapter = self.audio_adapter
        attn = cfg.get("attention_impl") or cfg.get("self_attn_1_type", "flash_attn3")
        mm_fn = resolve_mm(self.mm_type)
        self_fn = partial(attention, attn)
        cross_fn = partial(attention, attn)
        interval = int(adapter["interval"])
        num_tokens = int(adapter["num_tokens"])
        heads = int(adapter["heads"])
        adapter_arrays = {"ca_blocks": adapter["ca_blocks"], "proj": adapter["proj"]}
        has_temb = "time_embedding" in adapter
        if has_temb:
            adapter_arrays["time_embedding"] = adapter["time_embedding"]
        n_inject = adapter["ca_blocks"]["to_q"]["w"].shape[0]
        weight = float(cfg.get("audio_adapter_weight", 1.0))
        teo = encoder_out["text_encoder_output"]
        audio_feats = encoder_out["audio_encoder_output"]
        n_steps = scheduler.num_steps()

        @jax.jit
        def denoise(params, adapter_p, st, ctx, feats, y):
            audio_tokens = audio_projection(adapter_p["proj"], feats, gf, num_tokens=num_tokens)

            def body(s, _):
                lat, t = scheduler.step_pre(s)
                x, embed, embed0, ctx_e, ctx_img, grid, s_tokens = wan_pre_process(
                    params, lat[None], t[None].astype(jnp.float32), ctx, arch,
                    y=None if y is None else y[None], seq_len=seq_len)
                # adapter adaLN source: real TimeEmbedding when the checkpoint
                # has one (audio_adapter.py:193-211), neutral zeros otherwise
                if has_temb:
                    from ..models.wan.audio_adapter import audio_time_embedding

                    t_emb = audio_time_embedding(adapter_p["time_embedding"],
                                                 t[None].astype(jnp.float32))
                else:
                    t_emb = jnp.zeros((1, 3, arch.dim), jnp.float32)

                def blk(carry, layer):
                    xc = carry
                    block, li = layer
                    xc = wan_block(block, xc, embed0, ctx_e, ctx_img, rope_cos, rope_sin,
                                   arch, mm_fn, self_fn, cross_fn)
                    # audio injection every `interval` blocks
                    inject = (li % interval == 0) & ((li // interval) < n_inject)
                    ca_idx = jnp.minimum(li // interval, n_inject - 1)
                    ca_p = jax.tree_util.tree_map(lambda a: a[ca_idx], adapter_p["ca_blocks"])
                    lat_grouped = xc[:, : gf * tokens_per_frame].reshape(
                        xc.shape[0], gf, tokens_per_frame, arch.dim)
                    delta = perceiver_ca(ca_p, audio_tokens, lat_grouped, t_emb, heads=heads)
                    delta = delta.reshape(xc.shape[0], gf * tokens_per_frame, arch.dim)
                    delta = jnp.pad(delta, ((0, 0), (0, xc.shape[1] - delta.shape[1]), (0, 0)))
                    xc = jnp.where(inject, xc + weight * delta.astype(xc.dtype), xc)
                    return xc, None

                x, _ = jax.lax.scan(blk, x, (params["blocks"], jnp.arange(arch.num_layers)))
                pred = wan_post_process(params, x, embed, grid, s_tokens, arch)[0]
                return scheduler.step_post(s, pred), None

            s, _ = jax.lax.scan(body, st, None, length=n_steps)
            return s

        state = denoise(self.model, adapter_arrays, state, teo["context"], audio_feats, y_cond)
        return state["latents"]

    # ------------- multi-segment generation -------------
    def _build_prev_cond(self, prev_frames_px: np.ndarray, idx: int,
                         max_frames: int) -> Optional[Dict[str, jnp.ndarray]]:
        """Noise+mask-augment the last 5 frames of the previous segment,
        VAE-encode them into a zero video, and build the 4-channel
        pixel-frame mask (reference wan_audio_runner.py:39-74, 425-437,
        492-541; the reference's ``prev_mask[:, prev_len:] = 0`` leaves the
        mask all-zero — here the conditioned prefix is marked 1, which is
        the evident intent)."""
        z_dim = int(self.config.get("target_shape", (16,))[0]) if self.config.get("target_shape") else 16
        if self.arch.in_dim != 2 * z_dim + 4 or self.config.get("tiny_vae"):
            return None  # model has no conditioning channels (or no encoder)
        from ..vae.wan_vae import vae_encode

        prev_f = 5
        h = int(self.config.get("target_height", 480))
        w = int(self.config.get("target_width", 832))
        full = np.zeros((max_frames, h, w, 3), np.float32)
        cond_frames = 0
        if prev_frames_px is not None:  # segment 0 conditions on zeros
            last = prev_frames_px[-prev_f:].astype(np.float32)  # (5,H,W,3) [-1,1]
            rnd = np.random.RandomState(42 + idx)
            sigma = float(np.exp(rnd.normal(-3.0, 0.5)))
            last = last + rnd.randn(*last.shape).astype(np.float32) * sigma
            keep = (rnd.rand(*last.shape[1:3]) > 0.1).astype(np.float32)
            full[:prev_f] = last * keep[None, :, :, None]
            cond_frames = prev_f
        scale = not self.config.get("synthetic_weights")
        z = vae_encode(self.vae, jnp.asarray(full)[None], self.vae_cfg, scale=scale)
        prev_latents = jnp.transpose(z[0], (3, 0, 1, 2))  # (z, lat_f, h', w')
        lat_f, lh, lw = prev_latents.shape[1:]

        frames_n = (lat_f - 1) * 4 + 1
        m = np.zeros((frames_n, lh, lw), np.float32)
        m[:cond_frames] = 1.0
        # wan mask rearrange: frame 0 repeated 4x, then groups of 4
        m = np.concatenate([np.repeat(m[:1], 4, axis=0), m[1:]], axis=0)
        m = m.reshape(lat_f, 4, lh, lw).transpose(1, 0, 2, 3)  # (4, lat_f, h', w')
        return {"prev_latents": prev_latents, "prev_mask": jnp.asarray(m)}

    def run_pipeline(self, save_video: bool = True):
        """Segmented long-form generation when ``video_duration`` exceeds one
        segment (reference wan_audio_runner.py:440-583): 81-frame windows
        with a 5-frame conditioned overlap; per-segment audio windows are
        stitched and muxed with the frames into one .mp4 container
        (see _mux_av; the reference muxes mp4+AAC with ffmpeg)."""
        cfg = self.config
        fps = float(cfg.get("target_fps", cfg.get("fps", 16)))
        max_frames = int(cfg.get("target_video_length", 81))
        audio_path = cfg.get("audio_path")
        duration = cfg.get("video_duration")
        if not duration or not audio_path or not os.path.exists(audio_path):
            return super().run_pipeline(save_video)
        from ..encoders.audio import AudioEncoder, read_wav

        waveform, sr = read_wav(audio_path)
        audio_frames = int(len(waveform) / sr * fps)
        expected = min(max(1, int(float(duration) * fps)), audio_frames)
        if expected <= max_frames:
            frames = super().run_pipeline(save_video)
            if save_video and frames is not None:
                self._mux_av(frames, waveform[: round(len(frames) * sr / fps)], sr)
            return frames

        prev_f = 5
        interval_num = max(int((expected - max_frames) / (max_frames - prev_f)) + 1, 1)
        res_frames = expected - interval_num * (max_frames - prev_f)
        if res_frames > prev_f:
            interval_num += 1
        logger.info(f"audio multi-segment: {expected} frames -> {interval_num} segments")

        encoder_out = super(WanAudioRunner, self).run_input_encoder()  # text only path below
        if not hasattr(self, "_audio_encoder"):
            enc_path = None
            if not cfg.get("synthetic_weights"):
                enc_path = cfg.get("audio_encoder_path") or cfg.get("model_path")
            self._audio_encoder = AudioEncoder(enc_path)

        base_seed = int(cfg.get("seed", 42))
        segments, audio_slices = [], []
        prev_video = None
        for idx in range(interval_num):
            start = idx * (max_frames - prev_f)
            a0, a1 = round(start * sr / fps), round((start + max_frames + 1) * sr / fps)
            seg_wave = waveform[a0:a1]
            feats = self._audio_encoder.infer_array(seg_wave, sr, max_frames, fps=fps)
            encoder_out["audio_encoder_output"] = jnp.asarray(feats)
            encoder_out["previmg_encoder_output"] = self._build_prev_cond(
                prev_video if idx > 0 else None, idx, max_frames)
            cfg["seed"] = base_seed + idx
            latents = self.run_dit(encoder_out)
            frames = self.run_vae_decoder(latents)  # (F, H, W, 3) in [-1,1]
            prev_video = frames
            keep = frames[prev_f:] if idx > 0 else frames
            if idx == interval_num - 1 and res_frames > prev_f:
                keep = keep[: max(res_frames - (prev_f if idx > 0 else 0), 1)]
            segments.append(keep)
            s0 = 0 if idx == 0 else round((prev_f + 1) * sr / fps)
            audio_slices.append(seg_wave[s0 : s0 + round(len(keep) * sr / fps)])
        cfg["seed"] = base_seed

        video = np.concatenate(segments, axis=0)
        if save_video:
            save_path = cfg.get("save_video_path", "./output.mp4")
            self.save_video(video, save_path)
            self._mux_av(video, np.concatenate(audio_slices), sr)
        return video

    def _mux_av(self, video: np.ndarray, audio: np.ndarray, sr: int) -> str:
        """Single-container a/v mux into MP4 (deliverable parity with the
        reference's ffmpeg mux, wan_audio_runner.py:560-575): pure-python
        ISO BMFF with MJPEG video + sowt PCM16 audio tracks. RIFF-AVI
        kept as a fallback knob (``mux_container: "avi"``)."""
        from ..utils.media import mux_avi_pcm, mux_mp4_pcm

        cfg = self.config
        save_path = cfg.get("save_video_path", "./output.mp4")
        mux_fps = int(cfg.get("target_fps", cfg.get("fps", 16)))
        if cfg.get("mux_container", "mp4") == "avi":
            out = mux_avi_pcm(video, audio, sr,
                              os.path.splitext(save_path)[0] + ".avi", fps=mux_fps)
        else:
            out = mux_mp4_pcm(video, audio, sr,
                              os.path.splitext(save_path)[0] + ".av.mp4", fps=mux_fps)
        logger.info(f"saved muxed a/v container to {out}")
        return out
