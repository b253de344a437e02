"""SkyReels-V2 diffusion-forcing runner (reference:
lightx2v/models/runners/wan/wan_skyreels_v2_df_runner.py:67-132).

Long video = segments; each segment denoises with the per-frame timestep
matrix (prefix frames from the previous segment are VAE-re-encoded and
pinned with light re-noising). Within a segment every DF iteration is one
jitted step: per-token timesteps feed the DiT (2D-timestep path of
wan_forward), the vectorized per-frame UniPC applies masked updates.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.model import wan_forward
from ..models.wan.pipeline import rope_for_shape
from ..schedulers.df import WanSkyreelsV2DFScheduler
from ..utils.logging_utils import logger
from ..utils.registry import RUNNER_REGISTER
from ..vae.wan_vae import vae_encode
from .wan_runner import WanRunner


@RUNNER_REGISTER.register("wan2.1_skyreels_v2_df")
class WanSkyreelsV2DFRunner(WanRunner):
    scheduler_cls = WanSkyreelsV2DFScheduler

    def init_scheduler(self):
        return self.scheduler_cls(self.config)

    def run_dit(self, encoder_out: Dict[str, Any]):
        cfg = self.config
        arch = self.arch
        target_shape = self.set_target_shape()
        c, total_lat_f, lat_h, lat_w = target_shape

        base_frames = int(cfg.get("base_num_frames", cfg.get("target_video_length", 97)))
        base_lat_f = (base_frames - 1) // 4 + 1
        overlap = int(cfg.get("overlap_history", 17))
        overlap_lat = (overlap - 1) // 4 + 1 if overlap else 0
        ar_step = int(cfg.get("ar_step", 0))
        cbs = int(cfg.get("causal_block_size", 1))
        addnoise = float(cfg.get("addnoise_condition", 20))

        teo = encoder_out["text_encoder_output"]
        context, context_null = teo["context"], teo["context_null"]

        # number of segments (reference :67-77)
        if total_lat_f <= base_lat_f:
            n_iter = 1
        else:
            n_iter = 1 + int(np.ceil((total_lat_f - base_lat_f) / max(base_lat_f - overlap_lat, 1)))

        pt, ph, pw = arch.patch_size
        tokens_per_frame = (lat_h // ph) * (lat_w // pw)
        attn = cfg.get("attention_impl") or cfg.get("self_attn_1_type", "flash_attn3")
        enable_cfg = bool(cfg.get("enable_cfg", True))
        guide = float(cfg.get("sample_guide_scale", 6.0))

        out_latents = None
        prefix = None
        seed = int(cfg.get("seed", 42))

        for seg in range(n_iter):
            seg_lat_f = base_lat_f
            seg_shape = (c, seg_lat_f, lat_h, lat_w)
            scheduler = self.init_scheduler()
            self.scheduler = scheduler
            scheduler.addnoise_condition = addnoise if prefix is not None else 0
            num_pre = overlap_lat if prefix is not None else 0
            state = scheduler.prepare_df(
                seg_shape, seed + seg, num_pre_ready=num_pre, ar_step=ar_step,
                casual_block_size=cbs, prefix_latents=prefix)

            rope_cos, rope_sin, seq_len = rope_for_shape(arch, seg_shape)
            step_matrix = jnp.asarray(scheduler.step_matrix)
            update_mask = jnp.asarray(scheduler.update_mask)

            @jax.jit
            def df_step(params, st, row_t, mask_row, ctx, ctx_null):
                st, lat, t_frames = scheduler.df_step_pre(st, row_t)
                # per-token timesteps (reference pre_infer.py:80-87 broadcasts
                # the per-frame embeddings over the spatial grid)
                t_tok = jnp.repeat(t_frames, tokens_per_frame)[None]  # (1, S)
                lat_b = lat[None]
                if enable_cfg:
                    lat2 = jnp.concatenate([lat_b, lat_b], 0)
                    t2 = jnp.concatenate([t_tok, t_tok], 0)
                    ctx2 = jnp.concatenate([ctx, ctx_null], 0)
                    out = wan_forward(params, lat2, t2, ctx2, rope_cos, rope_sin, arch,
                                      self_attn_type=attn, cross_attn_type=attn)
                    pred = out[1] + guide * (out[0] - out[1])
                else:
                    pred = wan_forward(params, lat_b, t_tok, ctx, rope_cos, rope_sin, arch,
                                       self_attn_type=attn, cross_attn_type=attn)[0]
                return scheduler.df_step_post(st, pred, mask_row, st["step_index"])

            for row in range(scheduler.n_rows):
                state = df_step(self.model, state, step_matrix[row], update_mask[row],
                                context, context_null)
            seg_latents = state["latents"]

            if out_latents is None:
                out_latents = seg_latents
            else:
                out_latents = jnp.concatenate([out_latents, seg_latents[:, overlap_lat:]], axis=1)

            if seg < n_iter - 1:
                # re-encode the segment tail through the VAE as the next
                # segment's prefix (reference :88-103)
                tail = out_latents[:, -overlap_lat:]
                frames = self.run_vae_decoder(tail)  # (T, H, W, 3)
                z = vae_encode(self.vae, jnp.asarray(frames)[None], self.vae_cfg,
                               scale=not self.config.get("synthetic_weights"))
                prefix = jnp.transpose(z[0], (3, 0, 1, 2))
            logger.info(f"DF segment {seg + 1}/{n_iter} done")

        return out_latents
