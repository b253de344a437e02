"""CausVid autoregressive runner (reference:
lightx2v/models/runners/wan/wan_causvid_runner.py:60-130).

Long video = fragments x AR frame-blocks. Per block: reset the distilled
scheduler, run 3-9 denoise steps with the block's tokens attending the
KV cache of all previous blocks in the window; between fragments the cache
is re-anchored by one forward over the last block's final latents at the
final timestep. One jitted block-denoise function serves all positions
(kv_start/kv_len are traced scalars).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.causvid import causvid_forward, init_kv_cache, precompute_cross_kv
from ..models.wan.model import text_embeddings
from ..ops.linear import resolve_mm
from ..ops.rope import build_wan_rope_grid
from ..schedulers.step_distill import WanStepDistillScheduler
from ..utils.logging_utils import logger
from ..utils.registry import RUNNER_REGISTER
from .wan_runner import WanRunner


@RUNNER_REGISTER.register("wan2.1_causvid")
class WanCausVidRunner(WanRunner):
    scheduler_cls = WanStepDistillScheduler

    def init_scheduler(self):
        if "denoising_step_list" not in self.config:
            self.config["denoising_step_list"] = [999, 934, 862, 756, 603, 410, 250, 140, 74]
        self.config["infer_steps"] = len(self.config["denoising_step_list"])
        return self.scheduler_cls(self.config)

    def run_dit(self, encoder_out: Dict[str, Any]):
        cfg = self.config
        arch = self.arch
        st, sh, sw = cfg.get("vae_stride", (4, 8, 8))
        h, w = int(cfg.get("target_height", 480)), int(cfg.get("target_width", 832))
        lat_h, lat_w = h // sh, w // sw
        pt, ph, pw = arch.patch_size
        frame_seq = (lat_h // ph) * (lat_w // pw)

        num_frames = int(cfg.get("num_frames", 21))          # window (latent frames)
        fpb = int(cfg.get("num_frame_per_block", 7))
        num_blocks = int(cfg.get("num_blocks", num_frames // fpb))
        num_fragments = int(cfg.get("num_fragments", 1))

        target_blk = (16, fpb, lat_h, lat_w)
        cfg["target_shape"] = target_blk
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        scheduler.prepare(target_blk, int(cfg.get("seed", 42)))
        n_steps = scheduler.num_steps()

        mm_fn = resolve_mm("Default")
        teo = encoder_out["text_encoder_output"]
        ctx_embedded = text_embeddings(self.model, teo["context"], mm_fn)
        cross_kv = precompute_cross_kv(self.model, ctx_embedded, arch)

        kv_size = num_frames * frame_seq
        kv_cache = init_kv_cache(arch, kv_size)
        attn = cfg.get("attention_impl") or cfg.get("self_attn_1_type", "flash_attn3")
        timesteps = jnp.asarray(scheduler.timesteps)

        # rope tables per start_frame position (static shapes; values differ)
        gf = fpb // pt
        rope_tabs = {
            sfr: tuple(map(jnp.asarray, build_wan_rope_grid(
                arch.head_dim, gf, lat_h // ph, lat_w // pw, start_frame=sfr)))
            for sfr in range(0, num_frames, fpb)
        }

        fwd = partial(causvid_forward, arch=arch,
                      mm_type=self.mm_type, attn_type=attn)

        @jax.jit
        def block_denoise(params, state, kv_cache, cross_kv, cos, sin, kv_start, kv_len):
            def body(carry, _):
                st, cache = carry
                lat, t = scheduler.step_pre(st)
                pred, cache = fwd(params, lat[None], t[None].astype(jnp.float32),
                                  cache, cross_kv, cos, sin, kv_start, kv_len)
                st = scheduler.step_post(st, pred[0])
                return (st, cache), None

            (state, kv_cache), _ = jax.lax.scan(body, (state, kv_cache), None, length=n_steps)
            return state, kv_cache

        @jax.jit
        def recompute_kv(params, latents, kv_cache, cross_kv, cos, sin, kv_start, kv_len):
            t_last = timesteps[-1]
            _, kv_cache = fwd(params, latents[None].astype(jnp.bfloat16),
                              t_last[None].astype(jnp.float32),
                              kv_cache, cross_kv, cos, sin, kv_start, kv_len)
            return kv_cache

        total_blocks = num_blocks + (num_fragments - 1) * (num_blocks - 1)
        out_blocks = []
        rng = jax.random.PRNGKey(int(cfg.get("seed", 42)))
        last_block_latents = None

        for frag in range(num_fragments):
            kv_start, kv_end = 0, fpb * frame_seq
            if frag > 0:
                logger.info(f"fragment {frag + 1}/{num_fragments}: re-anchoring kv cache")
                kv_cache = init_kv_cache(arch, kv_size)
                kv_cache = recompute_kv(self.model, last_block_latents, kv_cache, cross_kv,
                                        *rope_tabs[0], jnp.asarray(kv_start), jnp.asarray(kv_end))
                kv_start, kv_end = kv_end, kv_end + fpb * frame_seq

            blocks_this = num_blocks - (1 if frag > 0 else 0)
            for b in range(blocks_this):
                rng, sub = jax.random.split(rng)
                state = scheduler.prepare(target_blk, int(cfg.get("seed", 42)))
                state["latents"] = jax.random.normal(sub, target_blk, jnp.float32)
                start_frame = (kv_start // frame_seq)
                cos, sin = rope_tabs[start_frame]
                state, kv_cache = block_denoise(
                    self.model, state, kv_cache, cross_kv, cos, sin,
                    jnp.asarray(kv_start), jnp.asarray(kv_end))
                out_blocks.append(state["latents"])
                last_block_latents = state["latents"]
                kv_start, kv_end = kv_end, kv_end + fpb * frame_seq
                logger.info(f"fragment {frag + 1}: block {b + 1}/{blocks_this} done")

        return jnp.concatenate(out_blocks, axis=1)  # (C, total_frames, H, W)
