"""CogVideoX runner (reference: lightx2v/models/runners/cogvideox/
cogvidex_runner.py:15-81): T5-v1.1-xxl context -> 42-layer joint DiT ->
XDPM scheduler (v-prediction, zero-terminal-SNR) -> CogVideoX VAE decode.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cogvideox.model import (
    CogArch,
    build_cog_rope,
    cog_forward,
    init_random_cog_state_dict,
    load_cog_params,
)
from ..schedulers.cogvideox import CogvideoxXDPMScheduler
from ..utils.registry import RUNNER_REGISTER
from ..vae.cogvideox_vae import (
    CogVAEConfig,
    cog_vae_decode,
    init_random_cog_vae_state_dict,
    load_cog_vae_params,
)
from .base_runner import DefaultRunner


@RUNNER_REGISTER.register("cogvideox")
class CogvideoxRunner(DefaultRunner):
    def load_transformer(self):
        if self.config.get("synthetic_weights"):
            # head_dim must split by the (1/4, 3/8, 3/8) rope rule into even dims
            self.arch = CogArch(num_layers=2, num_heads=4, head_dim=32, text_len=16,
                                text_dim=32, time_embed_dim=64)
            return load_cog_params(init_random_cog_state_dict(self.arch, seed=0, scale=0.05), self.arch)
        self.arch = CogArch(
            num_layers=int(self.config.get("transformer_num_layers", 42)),
            num_heads=int(self.config.get("transformer_num_attention_heads", 48)),
            head_dim=int(self.config.get("transformer_attention_head_dim", 64)),
            text_len=int(self.config.get("text_len", 226)),
        )
        from ..utils.safetensors_io import load_sharded

        return load_cog_params(load_sharded(os.path.join(self.config["model_path"], "transformer")), self.arch)

    def load_text_encoder(self):
        if self.config.get("synthetic_weights"):
            return None
        from ..encoders.t5 import T5Config, T5EncoderModel

        # T5 v1.1 xxl: shared relative position bias (first layer's table)
        cfg = T5Config(vocab_size=32128, dim=4096, dim_attn=4096, dim_ffn=10240,
                       num_heads=64, num_layers=24, shared_pos=True)
        return T5EncoderModel(int(self.config.get("text_len", 226)),
                              checkpoint_path=os.path.join(self.config["model_path"], "text_encoder"),
                              tokenizer_path=os.path.join(self.config["model_path"], "tokenizer"), cfg=cfg)

    def load_vae(self):
        if self.config.get("synthetic_weights"):
            cfg = CogVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                               latent_channels=16, norm_num_groups=4)
            self.vae_cfg = cfg
            return load_cog_vae_params(init_random_cog_vae_state_dict(cfg, seed=2), cfg)
        self.vae_cfg = CogVAEConfig()
        from ..utils.safetensors_io import load_sharded

        sd = load_sharded(os.path.join(self.config["model_path"], "vae"))
        return load_cog_vae_params(sd, self.vae_cfg)

    def set_target_shape(self):
        cfg = self.config
        frames = int(cfg.get("target_video_length", 81))
        h = int(cfg.get("target_height", cfg.get("height", 768)))
        w = int(cfg.get("target_width", cfg.get("width", 1360)))
        lat_f = (frames - 1) // 4 + 1
        self.config["target_shape"] = (16, lat_f, h // 8, w // 8)
        return self.config["target_shape"]

    def init_scheduler(self):
        return CogvideoxXDPMScheduler(self.config)

    def run_input_encoder(self) -> Dict[str, Any]:
        prompt = self.config.get("prompt", "")
        if self.config.get("synthetic_weights"):
            rng = np.random.default_rng(abs(hash(prompt)) % 2**31)
            ctx = jnp.asarray(rng.standard_normal((1, self.arch.text_len, self.arch.text_dim)) * 0.2, jnp.float32)
            neg = jnp.asarray(rng.standard_normal((1, self.arch.text_len, self.arch.text_dim)) * 0.2, jnp.float32)
        else:
            ctx = self.text_encoder.infer([prompt])
            neg = self.text_encoder.infer([self.config.get("negative_prompt", "")])
        return {"text_encoder_output": {"context": ctx, "context_null": neg},
                "image_encoder_output": None}

    def run_dit(self, encoder_out: Dict[str, Any]):
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        state = scheduler.prepare(target_shape, int(self.config.get("seed", 42)))

        arch = self.arch
        _, lat_f, lat_h, lat_w = target_shape
        p, p_t = arch.patch_size, arch.patch_size_t
        gf = (lat_f + p_t - 1) // p_t
        cos, sin = build_cog_rope(arch, gf, lat_h // p, lat_w // p)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        attn = self.config.get("attention_impl") or self.config.get("attention_type", "flash_attn3")
        mesh = None
        if self.config.get("mesh_shape"):
            # ulysses SP over the joint [text; video] stream
            # (models/cogvideox/sharded.py)
            from ..parallel.mesh import build_mesh

            mesh = build_mesh(dict(self.config["mesh_shape"]),
                              devices=self._mesh_devices())
        enable_cfg = bool(self.config.get("enable_cfg", True))
        guide = float(self.config.get("guidance_scale", self.config.get("sample_guide_scale", 6.0)))
        teo = encoder_out["text_encoder_output"]
        n_steps = scheduler.num_steps()

        @jax.jit
        def denoise(params, st, ctx, ctx_null):
            def fwd(lat_b, tb, c):
                if mesh is not None:
                    from ..models.cogvideox.sharded import cog_forward_sharded

                    return cog_forward_sharded(params, lat_b, tb, c, cos, sin,
                                               arch, mesh, attn_type=attn)
                return cog_forward(params, lat_b, tb, c, cos, sin, arch, attn_type=attn)

            def body(s, _):
                lat, t = scheduler.step_pre(s)
                lat_b, tb = lat[None], t[None].astype(jnp.float32)
                if enable_cfg:
                    out = fwd(jnp.concatenate([lat_b, lat_b]),
                              jnp.concatenate([tb, tb]),
                              jnp.concatenate([ctx, ctx_null]))
                    pred = out[1] + guide * (out[0] - out[1])
                else:
                    pred = fwd(lat_b, tb, ctx)[0]
                return scheduler.step_post(s, pred), None

            s, _ = jax.lax.scan(body, st, None, length=n_steps)
            return s

        state = denoise(self.model, state, teo["context"], teo["context_null"])
        return state["latents"]

    def run_vae_decoder(self, latents) -> np.ndarray:
        z = jnp.transpose(latents, (1, 2, 3, 0))[None]
        scale = not self.config.get("synthetic_weights")
        # frame-batched conv-cache decode — the reference's own decode
        # loop (num_latent_frames_batch_size=2, autoencoder_ks_cogvidex.py
        # _decode) — bounds peak HBM at one chunk's activations; measured
        # on v5e: whole-clip tile programs OOM at 23 GB at 480P
        fb = int(self.config.get("vae_frame_batch", 2))
        if self.config.get("use_tiling_vae") or max(z.shape[2], z.shape[3]) > 32:
            # reference enables tiling past tile_sample_min (256 px = 32
            # latent); each tile runs its own conv-cache frame loop
            from ..vae.cogvideox_vae import cog_vae_decode_tiled

            frames = cog_vae_decode_tiled(self.vae, z, self.vae_cfg, scale=scale,
                       frame_batch=fb)
        elif z.shape[1] > fb:
            from ..vae.cogvideox_vae import cog_vae_decode_chunked

            frames = cog_vae_decode_chunked(self.vae, z, self.vae_cfg, scale=scale,
                       frame_batch=fb)
        else:
            frames = cog_vae_decode(self.vae, z, self.vae_cfg, scale=scale)
        return np.clip(np.asarray(frames[0], np.float32), -1.0, 1.0)
