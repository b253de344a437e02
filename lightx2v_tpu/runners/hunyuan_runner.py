"""HunyuanVideo runner (reference: lightx2v/models/runners/hunyuan_runner.py).

t2v: Llama text encoder (hidden states) + CLIP-L pooled text vector ->
MMDiT with embedded guidance -> flow-match Euler -> causal 3D VAE decode.
i2v: token_replace conditioning with the first frame's latents pinned
(reference hunyuan scheduler prepare_latents/step_post :247-266).

Text encoders use HF transformers when checkpoints are present
(``llava-llama-3-8b`` hidden states, ``clip-vit-large`` pooled) and a
synthetic stand-in otherwise. The Hunyuan-specific diffusers-style causal
VAE is approximated by the shared causal-3D VAE in synthetic mode
(real-checkpoint support tracked as a gap).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hunyuan.config import HunyuanArch
from ..models.hunyuan.model import build_hunyuan_rope, hunyuan_forward, riflex_k_for
from ..models.hunyuan.weights import init_random_hunyuan_state_dict, load_hunyuan_from_path, load_hunyuan_params
from ..schedulers.euler import FlowMatchEulerScheduler
from ..utils.registry import RUNNER_REGISTER
from ..vae.hunyuan_vae import (
    HunyuanVAEConfig,
    hunyuan_vae_decode,
    init_random_hunyuan_vae_state_dict,
    load_hunyuan_vae_from_path,
    load_hunyuan_vae_params,
)
from .base_runner import DefaultRunner


@RUNNER_REGISTER.register("hunyuan")
class HunyuanRunner(DefaultRunner):
    def load_transformer(self):
        if self.config.get("synthetic_weights"):
            self.arch = HunyuanArch(
                hidden_size=96, heads_num=4, double_blocks=2, single_blocks=2,
                mlp_hidden_dim=192, in_channels=16, out_channels=16,
                text_states_dim=32, text_states_dim_2=16,
                rope_dim_list=(4, 10, 10), task=self.config.get("task", "t2v"),
            )
            return load_hunyuan_params(init_random_hunyuan_state_dict(self.arch, seed=0, scale=0.05), self.arch)
        self.arch = HunyuanArch(task=self.config.get("task", "t2v"))
        ckpt = os.path.join(self.config["model_path"], "hunyuan-video-t2v-720p", "transformers",
                            "mp_rank_00_model_states.pt")
        return load_hunyuan_from_path(ckpt, self.arch)

    def load_text_encoder(self):
        # text_encoder_path overrides even in synthetic mode (tiny-HF e2e
        # tests drive the REAL encoder path against a synthetic DiT/VAE)
        base = self.config.get("text_encoder_path")
        if base is None:
            if self.config.get("synthetic_weights"):
                return None  # synthetic states generated in run_input_encoder
            base = self.config["model_path"]
        from ..encoders.hf_text import TextEncoderHFLlamaModel, TextEncoderHFClipModel

        kw = {}
        if self.config.get("text_encoder_crop_start") is not None:
            kw["crop_start"] = int(self.config["text_encoder_crop_start"])
        return {
            "llama": TextEncoderHFLlamaModel(os.path.join(base, "text_encoder"), "cpu", **kw),
            "clip": TextEncoderHFClipModel(os.path.join(base, "text_encoder_2"), "cpu"),
        }

    def load_vae(self):
        if self.config.get("synthetic_weights"):
            cfg = HunyuanVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                                   latent_channels=16, norm_num_groups=4)
            self.vae_cfg = cfg
            return load_hunyuan_vae_params(init_random_hunyuan_vae_state_dict(cfg, seed=2), cfg)
        self.vae_cfg = HunyuanVAEConfig()
        return load_hunyuan_vae_from_path(
            os.path.join(self.config["model_path"], "hunyuan-video-t2v-720p", "vae", "pytorch_model.pt"),
            self.vae_cfg)

    def set_target_shape(self):
        cfg = self.config
        frames = int(cfg.get("target_video_length", 85))
        h, w = int(cfg.get("target_height", 720)), int(cfg.get("target_width", 1280))
        lat_f = (frames - 1) // 4 + 1
        self.config["target_shape"] = (16, lat_f, h // 8, w // 8)
        return self.config["target_shape"]

    def init_scheduler(self):
        cfg = self.config
        cfg.setdefault("sample_shift", 7.0)
        return FlowMatchEulerScheduler(cfg)

    def run_input_encoder(self) -> Dict[str, Any]:
        prompt = self.config.get("prompt", "")
        if self.config.get("synthetic_weights") and self.text_encoder is None:
            rng = np.random.default_rng(abs(hash(prompt)) % 2**31)
            Lt = int(self.config.get("text_len", 32))
            states = jnp.asarray(rng.standard_normal((1, Lt, self.arch.text_states_dim)) * 0.2, jnp.float32)
            mask = np.zeros((1, Lt), np.int32)
            mask[0, : max(2, min(Lt, len(prompt.split()) + 2))] = 1
            pooled = jnp.asarray(rng.standard_normal((1, self.arch.text_states_dim_2)) * 0.2, jnp.float32)
        else:
            states, mask = self.text_encoder["llama"].infer([prompt], self.config)
            pooled = self.text_encoder["clip"].infer([prompt], self.config)
            states, mask, pooled = jnp.asarray(states), np.asarray(mask), jnp.asarray(pooled)
        return {
            "text_encoder_output": {
                "text_encoder_1_text_states": states,
                "text_encoder_1_attention_mask": jnp.asarray(mask),
                "text_encoder_2_text_states": pooled,
            },
            "image_encoder_output": None,
        }

    def run_dit(self, encoder_out: Dict[str, Any]):
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        state = scheduler.prepare(target_shape, int(self.config.get("seed", 42)))

        teo = encoder_out["text_encoder_output"]
        arch = self.arch
        _, lat_f, lat_h, lat_w = target_shape
        pt, ph, pw = arch.patch_size
        frames = int(self.config.get("target_video_length", 85))
        k = riflex_k_for(frames) if self.config.get("task") == "i2v" else None
        cos, sin = build_hunyuan_rope(arch, lat_f // pt, lat_h // ph, lat_w // pw,
                                      riflex_k=k, l_test=lat_f if k else None)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        guidance = jnp.asarray([float(self.config.get("embedded_guidance_scale", 6.0)) * 1000.0], jnp.float32)
        attn = self.config.get("attention_impl") or self.config.get("attention_type", "flash_attn3")
        token_replace = self.config.get("task") == "i2v"

        mesh = None
        if self.config.get("mesh_shape") and not token_replace:
            # ulysses SP over the concatenated img+txt stream
            # (models/hunyuan/sharded.py; reference parallelize_hunyuan).
            # i2v token_replace needs global token indices — resident path.
            from ..parallel.mesh import build_mesh

            mesh = build_mesh(dict(self.config["mesh_shape"]),
                              devices=self._mesh_devices())

        n_steps = scheduler.num_steps()

        # TeaCache for Hunyuan (reference hunyuan/infer/feature_caching/):
        # the decision metric is the time embedding; the whole double+single
        # stack skips via the cached flow-pred residual on the LATENT (the
        # model has no exposed pre/post split here, so the residual is taken
        # on the prediction — equivalent skip semantics)
        use_tea = self.config.get("feature_caching") == "Tea"
        if use_tea:
            from ..caching.teacache import TeaCacheConfig, init_tea_state, tea_decide

            import dataclasses

            tea_cfg = dataclasses.replace(TeaCacheConfig.from_config(self.config), use_ret_steps=False)

        @jax.jit
        def denoise(params, st, states, mask, pooled):
            def fwd(lat_b, t):
                if mesh is not None:
                    from ..models.hunyuan.sharded import hunyuan_forward_sharded

                    return hunyuan_forward_sharded(
                        params, lat_b, t, states, mask, pooled,
                        cos, sin, arch, mesh, guidance=guidance, attn_type=attn,
                    )
                return hunyuan_forward(
                    params, lat_b, t, states, mask, pooled,
                    cos, sin, arch, guidance=guidance, attn_type=attn,
                    token_replace=token_replace,
                )

            if use_tea:
                c, lat_f_, lh, lw = target_shape
                cache0 = init_tea_state((1, c, lat_f_, lh, lw), (1, 256), dtype=jnp.float32)

                def body(carry, _):
                    s, cache = carry
                    lat_b, t = scheduler.step_pre(s)
                    # metric: the timestep embedding (vec); cheap recompute
                    from ..models.hunyuan.model import _timestep_embedding

                    temb = _timestep_embedding(t[None])
                    should, cache = tea_decide(cache, temb, None, s["step_index"], tea_cfg)

                    def compute(op):
                        cc = dict(op)
                        pred = fwd(lat_b[None], t[None].astype(jnp.float32))
                        cc["prev_residual"] = pred.astype(cc["prev_residual"].dtype)
                        return pred, cc

                    def skip(op):
                        return op["prev_residual"].astype(jnp.float32), dict(op)

                    pred, cache = jax.lax.cond(should, compute, skip, cache)
                    return (scheduler.step_post(s, pred[0]), cache), None

                (s, _), _ = jax.lax.scan(body, (st, cache0), None, length=n_steps)
                return s

            def body(s, _):
                lat_b, t = scheduler.step_pre(s)
                pred = fwd(lat_b[None], t[None].astype(jnp.float32))[0]
                return scheduler.step_post(s, pred), None

            s, _ = jax.lax.scan(body, st, None, length=n_steps)
            return s

        state = denoise(self.model, state,
                        teo["text_encoder_1_text_states"],
                        teo["text_encoder_1_attention_mask"],
                        teo["text_encoder_2_text_states"])
        return state["latents"]

    def run_vae_decoder(self, latents) -> np.ndarray:
        z = jnp.transpose(latents, (1, 2, 3, 0))[None]
        scale = not self.config.get("synthetic_weights")
        if self.config.get("use_tiling_vae") or z.shape[1] > 16:
            # reference AutoencoderKLCausal3D enables temporal tiling past
            # 16 latent frames (64 output frames) and spatial past 32
            # latent px; whole-clip 720P decode does not fit HBM
            from ..vae.hunyuan_vae import hunyuan_vae_decode_tiled

            frames = hunyuan_vae_decode_tiled(self.vae, z, self.vae_cfg, scale=scale,
                       tile_jit=True)
        else:
            frames = hunyuan_vae_decode(self.vae, z, self.vae_cfg, scale=scale)
        return np.clip(np.asarray(frames[0], np.float32), -1.0, 1.0)
