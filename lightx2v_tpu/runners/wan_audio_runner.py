"""Audio-driven video runner (reference: lightx2v/models/runners/wan/
wan_audio_runner.py:299-594).

Audio features (wav2vec-class) are projected to per-latent-frame token
groups and injected into the Wan DiT by per-block Perceiver cross
attention (audio_adapter.py); denoising uses the fixed-timestep
flow-match Euler scheduler (reference wan/audio/scheduler.py). The
conditioning image path follows the i2v recipe.

Audio features come from encoders/audio.py (HF wav2vec-class model when
``audio_encoder_path``/``model_path`` is configured, waveform-envelope
fallback otherwise). Gaps vs the reference (tracked): multi-segment
generation with previous-latent conditioning and audio/video muxing.
"""

from __future__ import annotations

import math
import os
import wave
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
        def denoise(params, adapter_p, st, ctx, feats):
            audio_tokens = audio_projection(adapter_p["proj"], feats, gf, num_tokens=num_tokens)

            def body(s, _):
                lat, t = scheduler.step_pre(s)
                x, embed, embed0, ctx_e, ctx_img, grid, s_tokens = wan_pre_process(
                    params, lat[None], t[None].astype(jnp.float32), ctx, arch, seq_len=seq_len)
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

        state = denoise(self.model, adapter_arrays, state, teo["context"], audio_feats)
        return state["latents"]
